"""Explicit, deterministic range-bucket ids for order-preserving shards.

The two-phase operators (``prefix_sum``, ``packing``) need the corpus
split into shards whose key ranges are disjoint and ordered — shard i's
keys all precede shard i+1's. ``repartitionByRange`` provides that but
with two costs this helper avoids:

- its boundary SAMPLING pass re-executes the child plan (for packing
  inputs that means re-tokenizing the corpus just to sketch ranges);
- the shard identity is ``spark_partition_id()``, a property of one
  physical execution — recomputation (cache eviction, stage retry
  lineage replay) may reassign it, and an offset table collected under
  the old assignment then joins against the wrong shards. A bucket id
  computed FROM THE KEY cannot drift.

Supported key types: integral, date, timestamp — every realistic
global-order key (row ids, event time). Other types raise; cast or
derive a numeric key first. NULL keys raise AT RUNTIME inside the
expression (a NULL has no position in a total order, and silently
routing it to a shard would corrupt every later shard's offset).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["range_bucket_id", "SUPPORTED_KEY_TYPES"]

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
SUPPORTED_KEY_TYPES = "integral, date, or timestamp"


def _as_long(col: Column, dt: T.DataType) -> Column:
    if isinstance(dt, _INTEGRAL):
        return col.cast("long")
    if isinstance(dt, T.DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("long")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col)
    raise TypeError(
        f"range_bucket_id: order key of type {dt.simpleString()} is not "
        f"supported ({SUPPORTED_KEY_TYPES}); cast or derive a numeric key")


def range_bucket_id(df: DataFrame, order_col: str,
                    num_buckets: int) -> tuple[Column, int]:
    """Return ``(pid_column, n_effective)``: a deterministic bucket id in
    ``[0, n_effective)`` that is monotone in ``order_col``.

    One column-pruned min/max scan fixes the bounds; the id is
    ``floor((key - lo) * n / span)`` evaluated in DOUBLE — long
    arithmetic would overflow for full-range keys (e.g. 64-bit hashes,
    where hi - lo exceeds int64). The double rounding keeps the mapping
    monotone (long→double conversion is monotone); a final clamp
    absorbs the one-off edge where rounding lands exactly on n.
    """
    dt = df.schema[order_col].dataType
    key = _as_long(F.col(order_col), dt)
    lohi = df.select(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
    if lohi["lo"] is None:
        return F.lit(0), 0  # empty input (callers short-circuit on 0)
    lo_long, hi_long = int(lohi["lo"]), int(lohi["hi"])
    span = float(hi_long) - float(lo_long) + 1.0
    n_eff = max(1, min(num_buckets, hi_long - lo_long + 1))
    raw = F.floor((key.cast("double") - float(lo_long)) * n_eff / span) \
        .cast("int")
    bounded = F.least(F.lit(n_eff - 1), F.greatest(F.lit(0), raw))
    err = F.raise_error(F.concat(
        F.lit(f"range_bucket_id: NULL {order_col} has no position in a "
              "total order — filter or impute NULL keys first")))
    pid = F.when(F.col(order_col).isNotNull(), bounded) \
        .otherwise(err.cast("int"))
    return pid, n_eff


def bucketed_prefix_bases(df, order_col: str, num_buckets: int,
                          measure, slot, zero):
    """Shared two-phase scaffold for prefix_sum / rank: bucket ``df`` by
    ``order_col`` (explicit range id), cache via ``slot``, aggregate
    ``measure`` per bucket, prefix-fold the ≤ n results driver-side from
    ``zero``, and return ``(bucketed_df, base_df | None)`` where base_df
    has (_pid int, _base <type of zero>). ``None`` base means empty
    input. Keeping the machinery in ONE place means the CacheSlot
    ownership, empty-input short-circuit, and NULL-key raise semantics
    cannot drift between the operators that share it."""
    spark = df.sparkSession
    pid, n_eff = range_bucket_id(df, order_col, num_buckets)
    if n_eff == 0:
        return None, None
    bucketed = slot.own(df.withColumn("_pid", pid)
                        .repartition(n_eff, "_pid"))
    rows = (bucketed.groupBy("_pid").agg(measure.alias("_m"))
            .orderBy("_pid").collect())
    bases, acc = [], zero
    for r in rows:
        bases.append((r["_pid"], acc))
        acc += r["_m"] if r["_m"] is not None else zero
    base_type = "long" if isinstance(zero, int) else "double"
    base = spark.createDataFrame(bases, schema=f"_pid int, _base {base_type}")
    return bucketed, base
