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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table. Schema comes from the parquet footer (no
    inference pass); ``schemas.DRIVER_TABLES`` documents the expected shape.
    """
    if name not in DRIVER_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {sorted(DRIVER_TABLES)}")
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
