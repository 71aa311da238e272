"""Streaming materialized-view maintenance: the q_mv_maintenance
pattern kept live by a stream.

The batch operator (queries/retrieval.py::q_mv_maintenance) proves the
algebra: an aggregate with ADDITIVE partial states (count, exact
DECIMAL sum) is updated by merging the delta's partials — history is
never re-scanned. This module runs that merge inside
``foreachBatch``, so the view stays current as order files arrive.

Exactly-once without a transactional table format (same discipline as
streaming/ingest.py, but for aggregate state):

- each micro-batch writes a NEW snapshot directory ``snap-<batchId>``
  (never in place — concurrent readers of the previous snapshot stay
  consistent, cf. compact_ingest_state);
- the merge base is the latest snapshot with id < batchId. On
  crash-replay Spark re-delivers the same batchId with the same files
  (file source + checkpoint), so the rewrite is a bit-identical
  overwrite — idempotent, hence exactly-once end to end;
- sums are DECIMAL(18,2): merge order cannot change a cent (the
  flagship's exact-DECIMAL rule).

Scale: per batch the job aggregates only the delta (map-side combine)
and merges |keys| rows — view-update cost is independent of history
size. Snapshot GC (dropping snap-* older than the last K) is a
directory delete, listed here as the operational companion to
compact_ingest_state's checkpoint reset.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: orders-table schema for the file-source stream.
ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType()),
    T.StructField("o_custkey", T.LongType()),
    T.StructField("o_orderstatus", T.StringType()),
    T.StructField("o_totalprice", T.DoubleType()),
    T.StructField("o_orderdate", T.TimestampType()),
    T.StructField("o_orderpriority", T.StringType()),
])

_SNAP_PREFIX = "snap-"

#: view schema: (o_orderpriority, yr) -> (n_orders, total DECIMAL(18,2))
_MV_SCHEMA = ("o_orderpriority string, yr int, "
              "n_orders bigint, total decimal(18,2)")


def partial_agg(df: DataFrame) -> DataFrame:
    """The view's partial-state aggregation — shared verbatim by the
    batch operator, the per-batch delta, and the parity oracle."""
    return (df.groupBy(
                "o_orderpriority",
                F.year("o_orderdate").cast("int").alias("yr"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("decimal(18,2)").alias("total")))


def _snapshots(mv_dir: str) -> list[int]:
    if not os.path.isdir(mv_dir):
        return []
    return sorted(int(d[len(_SNAP_PREFIX):])
                  for d in os.listdir(mv_dir) if d.startswith(_SNAP_PREFIX))


def read_mv(spark: SparkSession, mv_dir: str,
            before: int | None = None) -> DataFrame:
    """Latest view snapshot (optionally: latest with id < ``before``,
    the replay-safe merge base). Empty view if none exists."""
    snaps = _snapshots(mv_dir)
    if before is not None:
        snaps = [s for s in snaps if s < before]
    if not snaps:
        return spark.createDataFrame([], _MV_SCHEMA)
    return spark.read.parquet(
        os.path.join(mv_dir, f"{_SNAP_PREFIX}{snaps[-1]}"))


def mv_update_batch(spark: SparkSession, batch: DataFrame, batch_id: int,
                    mv_dir: str) -> str:
    """One foreachBatch tick: merge the delta's partial aggregates into
    the view and publish snapshot ``snap-<batch_id>``. Idempotent: the
    merge base ignores snapshots >= batch_id, so a crash-replay of the
    same batch rewrites the same snapshot from the same inputs."""
    base = read_mv(spark, mv_dir, before=batch_id)
    merged = (base.unionByName(partial_agg(batch))
              .groupBy("o_orderpriority", "yr")
              .agg(F.sum("n_orders").alias("n_orders"),
                   F.sum("total").cast("decimal(18,2)").alias("total")))
    snap = os.path.join(mv_dir, f"{_SNAP_PREFIX}{batch_id}")
    tmp = snap + ".inprogress"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(snap, ignore_errors=True)
    os.rename(tmp, snap)  # atomic publish: readers never see a partial snapshot
    return snap


def maintain_orders_mv(spark: SparkSession, orders_dir: str, mv_dir: str,
                       checkpoint_dir: str, max_files_per_trigger: int = 1):
    """Wire the stream: order files -> per-batch partial agg -> snapshot
    merge. Returns the StreamingQuery (caller picks the trigger, e.g.
    ``availableNow`` in tests, processingTime in production)."""
    stream = (spark.readStream
              .schema(ORDERS)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(orders_dir))

    def _tick(batch: DataFrame, batch_id: int) -> None:
        mv_update_batch(spark, batch, batch_id, mv_dir)

    return (stream.writeStream
            .foreachBatch(_tick)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
