"""Query registry: name -> (Spark callable, DuckDB oracle SQL).

Contract (driver, see /root/repo/__spark_entry__.py):
- the callable takes ``(spark, sf_dir)`` and returns a DataFrame;
- the oracle SQL must be ANSI SQL DuckDB can run over the same parquet
  tables, producing the SAME column names (the comparison sorts columns
  by name, then hashes order-insensitive values);
- queries whose semantics are not SQL-expressible (streaming state,
  iterative kernels, external services) register ``oracle=None`` and get
  a rows-only check.

Determinism rules every query here follows:
- every float output column is explicitly ROUNDed (same digits both
  sides) so partial-aggregation order cannot flip a hash bit;
- every LIMIT / row_number sits on a total order (unique tiebreaker
  column included) so top-k picks are unique.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    doc: str


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query. Use as ``@query("q_x", oracle="SELECT ...")``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle,
                                doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    from . import load_all

    load_all()
    return dict(_REGISTRY)


def get(name: str) -> Query:
    return all_queries()[name]
