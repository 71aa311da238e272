"""Bucketed table layout: the shuffle-elimination story, made real.

Every join-heavy docstring in this engine says "at 100 TB, bucket the
fact tables on the join key so repeated joins co-locate with zero
shuffle". This module is that claim as code: write a DataFrame as a
bucketed+sorted table, and a subsequent equi-join (or groupBy) on the
bucket key plans WITHOUT an Exchange on the bucketed side — Spark's
scan reports the hash partitioning as an output property and Catalyst
drops the shuffle. ``tests/test_bucketing.py`` asserts exactly that on
the physical plan.

Mechanics that matter at scale:

- both sides must be bucketed with the SAME bucket count on the SAME
  key, or only the matching side skips its Exchange;
- ``sortBy`` on the bucket key additionally removes the Sort below a
  SortMergeJoin — the join becomes a pure zip of pre-sorted buckets;
- bucket pruning: an equality filter on the bucket key scans 1/n of
  the files;
- the table must be read back via ``spark.table`` (the catalog carries
  the bucket spec; ``spark.read.parquet`` on the same path loses it).

This is Spark's native equivalent of the reference's implicit
"per-epoch file grouping" (core.py walks files grouped by epochid —
its whole layout strategy); here the layout is declared once and every
downstream join benefits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   path: str | None = None, sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet
    table registered in the session catalog. ``path`` makes it an
    external table (tests point this at a tmp dir); bucket metadata
    lives in the catalog either way."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH THE CATALOG — the only route that
    preserves the bucket spec (and therefore the shuffle-free plan)."""
    return spark.table(table)
