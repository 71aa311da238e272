"""Build a 10x-tiled scaling-probe dataset (~sf1) from sf0.1 parquet.

Round-14 VERDICT item 7: at sf0.1 every headline query is fixed-cost
bound (8-core vs 32-core ratios ~1), so the 100 TB scale argument
rested on plan shape alone. This tool materializes a 10x corpus under
/tmp (NEVER under /root/testdata, which is read-only driver data) so a
one-off 8-vs-32-core probe can show compute-bound queries actually
scaling. The probe dataset is DIAGNOSTIC ONLY: it is not an oracle
input, not a bench input, and nothing in the engine reads it except a
probe run pointed at it via SPARK_GRAFT_SF_DIR.

Tiling preserves the star schema's join semantics: replica r shifts
every key by r * span(key) so foreign keys stay consistent within a
replica and never collide across replicas. Distributions (dates,
prices, text, vectors) are the sf0.1 ones, repeated — fine for a
scaling probe whose only output is wall-clock ratios.

Usage: python tools/make_probe_sf1.py [/tmp/probe_sf1]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
REPLICAS = 10

#: per-table key columns that must be offset per replica (FK-consistent:
#: the same logical key gets the same offset everywhere it appears).
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # region/nation: tiny dims, copied once (replicas share them)
    "region": [],
    "nation": [],
}

#: key-span registry: one span per LOGICAL key so l_orderkey and
#: o_orderkey shift identically.
_LOGICAL = {
    "c_custkey": "custkey", "o_custkey": "custkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "l_partkey": "partkey", "p_partkey": "partkey",
    "l_suppkey": "suppkey", "s_suppkey": "suppkey",
    "event_id": "event_id", "doc_id": "doc_id", "vec_id": "vec_id",
}


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_sf1")
    out.mkdir(parents=True, exist_ok=True)
    spans: dict[str, int] = {}
    tables: dict[str, pa.Table] = {}
    for name in KEYED:
        t = pq.read_table(SRC / f"{name}.parquet")
        tables[name] = t
        for col in KEYED[name]:
            mx = pc.max(t[col]).as_py() or 0
            lk = _LOGICAL[col]
            spans[lk] = max(spans.get(lk, 0), int(mx) + 1)
    for name, t in tables.items():
        if not KEYED[name]:
            pq.write_table(t, out / f"{name}.parquet")
            print(f"{name}: copied once ({t.num_rows} rows)")
            continue
        parts = []
        for r in range(REPLICAS):
            cols = []
            for field in t.schema.names:
                arr = t[field]
                if field in KEYED[name] and r:
                    off = r * spans[_LOGICAL[field]]
                    arr = pc.add(arr, pa.scalar(off, type=arr.type))
                cols.append(arr)
            parts.append(pa.table(dict(zip(t.schema.names, cols))))
        big = pa.concat_tables(parts)
        pq.write_table(big, out / f"{name}.parquet")
        print(f"{name}: {t.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    main()
