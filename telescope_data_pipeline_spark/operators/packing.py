"""No-straddle greedy sequence packing over range shards.

``prefix_sum``-based packing (queries/llm.py::q_pack_sequences) lets a
document straddle a window boundary — right for streaming-concat
pretraining batches. Instruction-tuning / eval batches need the other
semantics: a document NEVER splits; if it doesn't fit in the open
window, it starts a new one (greedy first-fit in corpus order).

Greedy packing is sequential — every placement depends on the running
window fill, and the dependency genuinely cascades (an earlier boundary
shift can ripple through every later window), so there is no exact
bounded-state parallel composition. The design that scales is the one
real distributed batch assembly uses: **shard alignment**. Range-
partition the corpus on the order key, pack each shard greedily from a
fresh window, and offset shard-local window indices by the cumulative
window counts (an exact, tiny driver-side fold over ≤ num_partitions
integers). The price is an average of half a window of padding per
SHARD BOUNDARY — at 100 TB with 10k shards and a 512-token budget,
about 2.6M padding tokens against ~25B packed ones (0.01%), bought
with embarrassing parallelism and a deterministic layout for a pinned
shard count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .cache_slot import CacheSlot
from .range_bucket import range_bucket_id

__all__ = ["pack_greedy"]

#: Bounded cache: one placed table per session, not one per invocation
#: (round-3 ADVICE — the cache() below was never unpersisted). The
#: bucket id is a pure function of the key, so eviction can only cost
#: recompute, never a shard-identity drift.
_SLOT = CacheSlot()


def pack_greedy(df: DataFrame, order_col: str, len_col: str,
                budget: int = 512,
                num_partitions: int | None = None) -> DataFrame:
    """Assign each row a ``(win, off)`` placement: greedy no-straddle
    packing of ``len_col``-sized items into ``budget``-sized windows,
    in ``order_col`` order within each range shard, with globally
    contiguous window indices. Deterministic for a fixed
    ``num_partitions`` (pin it for reproducible layouts). Rows with
    ``len_col > budget`` fail loudly executor-side — chunk oversized
    documents first (``q_doc_chunks``); a NULL length packs as an
    empty item (an undecodable doc contributes nothing to a window).

    Shards on the EXPLICIT range bucket of ``operators.range_bucket``
    (one column-pruned min/max scan; the shard id is a deterministic
    function of the key and each applyInPandas group is exactly one
    shard; NULL keys raise). Supported key types: integral, date,
    timestamp — cast or derive a numeric key for anything else.

    Returns ``order_col``, ``len_col``, ``win`` (global window index,
    long), ``off`` (offset inside the window, long).
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism

    local_schema = T.StructType([
        T.StructField("_pid", T.IntegerType()),
        T.StructField(order_col, df.schema[order_col].dataType),
        T.StructField(len_col, df.schema[len_col].dataType),
        T.StructField("win_local", T.LongType()),
        T.StructField("off", T.LongType()),
    ])

    def _pack_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        win, off, wins, offs = 0, 0, [], []
        for ln in pdf[len_col]:
            ln = 0 if pd.isna(ln) else int(ln)
            if ln > budget:
                raise ValueError(
                    f"pack_greedy: item of length {ln} exceeds the "
                    f"window budget {budget} — chunk it first")
            if off + ln > budget:
                win, off = win + 1, 0
            wins.append(win)
            offs.append(off)
            off += ln
        out = pdf[[order_col, len_col]].copy()
        out.insert(0, "_pid", int(pdf["_pid"].iloc[0]) if len(pdf) else 0)
        out["win_local"] = pd.Series(wins, index=pdf.index, dtype="int64")
        out["off"] = pd.Series(offs, index=pdf.index, dtype="int64")
        return out

    sel = df.select(order_col, len_col)
    pid, n_eff = range_bucket_id(sel, order_col, n)
    if n_eff == 0:  # empty input: keep output schema
        return spark.createDataFrame(
            [], schema=T.StructType(local_schema.fields[1:3] + [
                T.StructField("win", T.LongType()),
                T.StructField("off", T.LongType())]))
    placed = (sel.withColumn("_pid", pid)
              .groupBy("_pid")
              .applyInPandas(lambda pdf: _pack_frame(pdf),
                             schema=local_schema))

    # The counts collect below is the first action over the cached
    # table, so it materializes every partition itself; the final join
    # then replays stored blocks. Single-slot ownership bounds storage.
    placed = _SLOT.own(placed)

    # Exact driver fold: cumulative window counts over ≤ n shard
    # summaries give each shard's global window base.
    counts = (placed.groupBy("_pid")
              .agg((F.max("win_local") + 1).alias("win_count"))
              .orderBy("_pid").collect())
    bases, acc = [], 0
    for r in counts:
        bases.append((r["_pid"], acc))
        acc += r["win_count"]
    base = spark.createDataFrame(bases, schema="_pid int, w_base long")

    return (placed.join(F.broadcast(base), "_pid")
            .select(order_col, len_col,
                    (F.col("w_base") + F.col("win_local")).alias("win"),
                    "off"))
