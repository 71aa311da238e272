"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`telescope_data_pipeline_spark.queries` — the registry is
the single source of truth; ``queries()`` and ``oracle_sql()`` are projections
of it, so a query and its oracle can never drift apart.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from telescope_data_pipeline_spark.queries import get

    return get("q_flagship").fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from telescope_data_pipeline_spark.queries import all_queries

    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from telescope_data_pipeline_spark.queries import all_queries

    return {name: q.oracle for name, q in all_queries().items()
            if q.oracle is not None}
