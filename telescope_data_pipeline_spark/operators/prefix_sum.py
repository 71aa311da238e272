"""Distributed prefix sum (cumulative aggregate over a global order).

A window with ``orderBy`` and no ``partitionBy`` is a scale trap: Spark
moves EVERY row into one partition to evaluate it (the plan shows a
single-partition Exchange), so the classic running-total query stops
scaling at exactly the moment it matters. The scalable form is the
textbook two-phase scan, expressed here with DataFrame ops only:

1. range-partition by the order key (``repartitionByRange`` guarantees
   partition *i*'s keys all precede partition *i+1*'s) and sort within
   partitions — this is the same exchange a global ``orderBy`` performs,
   parallel by construction;
2. aggregate one subtotal per partition (tiny: ≤ num_partitions rows),
   prefix-sum those on the driver, and broadcast the per-partition
   offsets back;
3. a partition-LOCAL window (partitionBy the partition id) adds the
   local running sum to the partition's offset.

Cost: one range exchange + one ≤n-row collect + one map-side join —
versus the single-partition window's "ship 100 TB to one task".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .cache_slot import CacheSlot

__all__ = ["distributed_prefix_sum"]

#: Bounded cache: one range-partitioned table per session, not one per
#: invocation (round-3 ADVICE — the cache() below was never unpersisted).
_SLOT = CacheSlot()

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOATING = (T.FloatType, T.DoubleType)


def distributed_prefix_sum(df: DataFrame, order_col: str, value_col: str,
                           out_col: str = "cum",
                           num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = cumulative sum of ``value_col`` over the global
    ``order_col`` order (inclusive of the current row), computed without
    ever concentrating the data on one task.

    ``order_col`` must be unique (it defines the total order; ties would
    make "the previous row" ambiguous under any engine).
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # Offset type follows the value column: integral columns accumulate
    # into long, float/double into double (a hardcoded `long` schema made
    # createDataFrame reject float subtotals — round-3 ADVICE).
    vt = df.schema[value_col].dataType
    if isinstance(vt, _INTEGRAL):
        off_type, zero = "long", 0
    elif isinstance(vt, _FLOATING):
        off_type, zero = "double", 0.0
    else:
        raise TypeError(
            f"distributed_prefix_sum: value column {value_col!r} has type "
            f"{vt.simpleString()}; only integral and float/double columns "
            f"are supported (cast decimals explicitly to pick a semantics)")
    kt = df.schema[order_col].dataType
    if isinstance(kt, _INTEGRAL):
        # Fast path for integral order keys: bucket on an EXPLICIT range
        # id computed from min/max instead of repartitionByRange. This
        # (a) replaces the range-partitioner's sampling pass — which
        # re-executes the child plan (e.g. tokenization) just to sketch
        # boundaries — with one column-pruned min/max scan, and (b)
        # makes the partition id a deterministic function of the key,
        # so correctness no longer leans on spark_partition_id being
        # stable across jobs (the cache below is then purely a
        # recompute-avoidance optimization). Skewed key DENSITY skews
        # bucket sizes, not correctness; pass num_partitions to widen.
        lohi = df.select(F.min(order_col).alias("lo"),
                         F.max(order_col).alias("hi")).first()
        if lohi["lo"] is None:  # empty input: keep schema, zero rows
            return df.withColumn(out_col, F.lit(None).cast(off_type))
        lo, span = int(lohi["lo"]), int(lohi["hi"]) - int(lohi["lo"]) + 1
        n_eff = max(1, min(n, span))
        pid = F.floor((F.col(order_col) - F.lit(lo)).cast("double")
                      * n_eff / span).cast("int")
        ranged = df.withColumn("_pid", pid).repartition(n_eff, "_pid")
    else:
        ranged = (df.repartitionByRange(n, F.col(order_col))
                  .sortWithinPartitions(order_col)
                  .withColumn("_pid", F.spark_partition_id()))
    # Two passes must see identical partitioning; cache so the second
    # pass replays stored blocks (on the generic path
    # spark_partition_id is otherwise free to differ between jobs; on
    # the explicit-bucket path the cache only avoids recompute). The
    # subtotal collect below is the first action over `ranged`, so it
    # materializes every cached partition itself — a separate count()
    # would just add a job. Single-slot ownership bounds storage across
    # repeated invocations.
    ranged = _SLOT.own(ranged)
    subtotals = (ranged.groupBy("_pid")
                 .agg(F.sum(value_col).alias("_s"))
                 .orderBy("_pid").collect())
    offsets, acc = [], zero
    for r in subtotals:
        offsets.append((r["_pid"], acc))
        acc += r["_s"] or zero
    off = spark.createDataFrame(offsets, schema=f"_pid int, _off {off_type}")
    local = (W.partitionBy("_pid").orderBy(order_col)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (ranged.join(F.broadcast(off), "_pid")
            .withColumn(out_col, F.sum(value_col).over(local) + F.col("_off"))
            .drop("_pid", "_off"))
