"""Local replica of the driver's DuckDB-oracle comparison.

The driver (per __spark_entry__ contract) compares row count, schema
(column names), and an order-insensitive value hash. We replicate that
strictly: sort columns by name, canonicalize every value to a string,
sort rows, compare exactly. Exact string equality is a superset of any
reasonable hash comparison, so passing here maximizes the chance of
passing the driver's gate.
"""

from __future__ import annotations

import math
import struct
from typing import Any

import duckdb
import numpy as np
import pandas as pd

DRIVER_TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    try:
        for name in DRIVER_TABLE_NAMES:
            # boundary-value tests plant partial sf dirs; register only
            # the tables that exist (Spark writes dir-shaped parquet, so
            # glob the part files)
            if os.path.exists(f"{sf_dir}/{name}.parquet"):
                pat = f"{sf_dir}/{name}.parquet"
                if os.path.isdir(pat):
                    pat += "/*.parquet"
                con.execute(
                    f"CREATE VIEW {name} AS "
                    f"SELECT * FROM read_parquet('{pat}')"
                )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon(v: Any) -> str:
    """Bit-level canonical form.

    Round-2 lesson (VERDICT.md): the driver's hash distinguishes both
    -0.0 from +0.0 and BIGINT from DOUBLE, so the local sweep must be at
    least that strict. Floats canonicalize to their IEEE-754 bit pattern
    (so -0.0 != +0.0) and integers keep an ``i:`` tag (so 900 != 900.0).
    """
    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return "f:" + struct.pack(">d", f).hex()
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    sub = df[cols]
    rows = sorted(
        tuple(_canon(v) for v in row) for row in sub.itertuples(index=False, name=None)
    )
    return cols, rows


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols, s_rows = canonical_rows(spark_pdf)
    o_cols, o_rows = canonical_rows(oracle_pdf)
    if s_cols != o_cols:
        problems.append(f"column mismatch: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")
    diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
    if diffs:
        problems.append(
            f"{len(diffs)} differing rows; first: spark={diffs[0][0]} oracle={diffs[0][1]} "
            f"(cols {s_cols})"
        )
    return problems
