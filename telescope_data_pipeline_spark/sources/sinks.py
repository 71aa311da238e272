"""Batch sinks (reference p_io.py: CSV / FITS / TXT per image set).

- Light-curve CSV sink: the reference's 13-column results file
  (header at p_io.py:105, rows at p_io.py:107-118) — a header'd CSV
  write with the positive-flux predicate applied declaratively.
- Partitioned parquet: the at-rest format for catalog/light-curve data
  at scale — partitioned by (band) so band-filtered reads prune whole
  directories (partition pruning shows as PartitionFilters in the scan).
- Diagnostics TXT: the stats block (p_io.py:121-154) is an aggregation
  query (queries/aggregates.py::q_diag_stats); writing it as text is a
  one-line ``.write.text`` of the formatted rows, shown in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import LIGHTCURVE

LIGHTCURVE_COLUMNS = [f.name for f in LIGHTCURVE.fields]


def write_lightcurve_csv(lightcurve: DataFrame, path: str) -> None:
    """Reference CSV sink semantics: fixed column order, header row,
    only positive-flux rows (p_io.py:107)."""
    (lightcurve
     .filter(F.col("flux") > 0)
     .select(*LIGHTCURVE_COLUMNS)
     .write.mode("overwrite").option("header", True).csv(path))


def read_lightcurve_csv(spark: SparkSession, path: str) -> DataFrame:
    """Round-trip scan with the declared schema (glob scan ≡ UNION ALL of
    per-epoch files, walkthrough cell 5)."""
    return spark.read.option("header", True).schema(LIGHTCURVE).csv(path)


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Partitioned parquet at-rest layout; reads filtered on the
    partition columns prune directories instead of scanning."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
