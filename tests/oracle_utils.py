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
from typing import Any

import duckdb
import pandas as pd

DRIVER_TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for name in DRIVER_TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 3.0 == 3 regardless of int/double typing
        return repr(v)
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
