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


def write_diagnostics_txt(
    detections: DataFrame,
    psf_stars: DataFrame,
    photometry: DataFrame,
    fwhm_table: DataFrame,
    path: str,
) -> None:
    """Per-epoch diagnostics TXT (reference p_io.py:121-154 ``write_txt``:
    star counts, min/max/median of peaks and fitted fluxes, FWHM). The
    stats are ONE relational aggregation over the three stages joined on
    epoch_id — partial aggs map-side, one small shuffle — and the text
    rendering is a formatted projection written with ``.write.text``;
    the per-stage wall timers of the reference are Spark metrics (event
    log / UI), not hand-rolled counters."""
    det = detections.groupBy("epoch_id").agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.round(F.min("peak"), 4).alias("peak_min"),
        F.round(F.max("peak"), 4).alias("peak_max"),
        F.round(F.median("peak"), 4).alias("peak_med"))
    psf = psf_stars.groupBy("epoch_id").agg(F.count(F.lit(1)).alias("n_psf"))
    phot = photometry.groupBy("epoch_id").agg(
        F.count(F.lit(1)).alias("n_results"),
        F.round(F.min("flux_fit"), 4).alias("flux_min"),
        F.round(F.max("flux_fit"), 4).alias("flux_max"),
        F.round(F.median("flux_fit"), 4).alias("flux_med"))
    fw = fwhm_table.groupBy("epoch_id").agg(
        F.round(F.avg("fwhm"), 4).alias("mean_fwhm"))
    stats = (det.join(psf, "epoch_id", "left")
             .join(phot, "epoch_id", "left")
             .join(fw, "epoch_id", "left"))
    line = F.concat_ws(
        "", F.lit("epoch "), F.col("epoch_id").cast("string"),
        F.lit(": sources="), F.col("n_sources").cast("string"),
        F.lit(" psf_stars="), F.coalesce(F.col("n_psf"), F.lit(0)).cast("string"),
        F.lit(" results="), F.coalesce(F.col("n_results"), F.lit(0)).cast("string"),
        F.lit(" peak[min,max,med]=["), F.col("peak_min").cast("string"),
        F.lit(","), F.col("peak_max").cast("string"),
        F.lit(","), F.col("peak_med").cast("string"),
        F.lit("] flux[min,max,med]=["), F.col("flux_min").cast("string"),
        F.lit(","), F.col("flux_max").cast("string"),
        F.lit(","), F.col("flux_med").cast("string"),
        F.lit("] fwhm="), F.col("mean_fwhm").cast("string"))
    stats.select(line.alias("value")).write.mode("overwrite").text(path)


def compact_parquet(spark: SparkSession, path: str,
                    target_file_mb: int = 128) -> int:
    """Small-files compaction (table maintenance): rewrite a parquet
    dataset into size-targeted files and atomically swap directories.
    The small-files problem is a first-order cost at 100 TB — a scan of
    100k tiny files pays listing + open overhead per file and starves
    the scheduler; nightly compaction keeps file count ~ bytes/target.

    Returns the new file count. The rewrite is a repartition to
    ceil(bytes/target) — a full shuffle, so run it per-partition-dir in
    production (partition-scoped compaction) rather than table-wide.
    """
    import math
    import os
    import shutil
    from urllib.parse import unquote, urlparse

    df = spark.read.parquet(path)
    # inputFiles() returns URIs (file:/..., %xx-escaped) — decode before
    # touching the local filesystem; naive 'file:' stripping breaks on
    # spaces and percent-encoded characters.
    files = [unquote(urlparse(f).path) for f in df.inputFiles()]
    total = sum(os.path.getsize(f) for f in files)
    n_target = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + ".compact.tmp"
    df.repartition(n_target).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".compact.old"
    # Crash-safe swap order: the .old backup is deleted only after the
    # new directory is verified readable at the live path, so every
    # intermediate state leaves a recoverable copy of the data (either
    # the live path or .old exists with full contents).
    shutil.move(path, old)
    try:
        shutil.move(tmp, path)
        spark.read.parquet(path).schema  # verify readable before dropping backup
    except Exception:
        # Roll back: restore the original directory at the live path.
        if not os.path.exists(path):
            shutil.move(old, path)
        raise
    shutil.rmtree(old)
    return n_target


def write_avro(df: DataFrame, path: str) -> None:
    """Avro sink — environment-gated: Avro has been an EXTERNAL Spark
    module since 2.4 (org.apache.spark:spark-avro), and this sandbox
    ships pyspark without it (and without network to fetch it), so the
    call raises the module's own clean AnalysisException here. The
    code path is the production one: on any cluster with spark-avro on
    the classpath it round-trips (tests/test_sources_sinks.py runs the
    round-trip when the module resolves, else pins the clean error)."""
    df.write.mode("overwrite").format("avro").save(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (see :func:`write_avro` for the environment gate)."""
    return spark.read.format("avro").load(path)
