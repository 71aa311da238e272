"""Batch sources for the driver's parquet tables.

Reads are plain ``spark.read.parquet`` — declarative scans that Catalyst
can push filters and column pruning into (check ``PushedFilters`` /
``ReadSchema`` in the physical plan). At 100 TB these would be
partitioned/ bucketed datasets; the API surface is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import DRIVER_TABLES


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: Session confs the driver tables need to read correctly. These are set
#: here (not only in session.get_spark) because the driver contract hands
#: queries an arbitrary caller-built SparkSession: events.ts is parquet
#: TIMESTAMP(NANOS) which Spark refuses without nanosAsLong, ms-unit
#: columns become TIMESTAMP_NTZ unless inference is disabled, and
#: timestamp arithmetic must be UTC to match the DuckDB oracle. All three
#: are runtime session confs, so conf.set works on a live session.
_READ_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def ensure_read_confs(spark: SparkSession) -> None:
    """Apply the parquet-read confs to a session we didn't build."""
    for k, v in _READ_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf on some builds
            pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table. Schema comes from the parquet footer (no
    inference pass); ``schemas.DRIVER_TABLES`` documents the expected shape.
    """
    if name not in DRIVER_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {sorted(DRIVER_TABLES)}")
    ensure_read_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    # events.ts is parquet TIMESTAMP(NANOS) — read as long ns (see session
    # config) and converted losslessly: every driver value is a whole µs.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] | None = None) -> None:
    """Register each driver table as a temp view so SQL-form queries can
    reference them by name (same Catalyst plan as the DataFrame form)."""
    for name in names or tuple(DRIVER_TABLES):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
