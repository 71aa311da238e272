"""Structured Streaming surface (SURVEY.md §2.9).

The reference processes image sets strictly in arrival order
(psf_phot.py:44) and fans each set out to four sinks (psf_phot.py:91-94)
— a batch rendering of what is naturally a stream. Here the same
semantics run as real micro-batch jobs:

- event-time windowed aggregation with watermarked late-data handling,
- session windows (the bursts-of-3 grouping, README.md:7),
- stateful exact dedup keyed on event_id (re-runs overwrite per set
  name in the reference — idempotence via state),
- ``foreachBatch`` multi-sink (the 4-sink pattern).

Every aggregation here is the streaming twin of an oracle-checked batch
query in queries/streaming_batch.py — batch and micro-batch produce
identical results for the same input, which is what the tests assert
(drain with trigger=availableNow, compare against the batch plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import EVENTS


def read_event_stream(spark, events_dir: str, max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over parquet chunk files with the EVENTS schema.

    ``maxFilesPerTrigger`` paces micro-batches so multi-batch state
    (watermarks, dedup) is actually exercised; at production scale the
    same code points at a Kafka source — only this reader changes.
    """
    return (
        spark.readStream
        .schema(EVENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )


def windowed_counts(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Tumbling 1-hour counts per event type with late-data watermark —
    streaming twin of q_stream_tumbling."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "event_type", "n", "total")
    )


def sessionized(stream: DataFrame, gap: str = "5 minutes",
                watermark: str = "30 minutes") -> DataFrame:
    """Session windows per user — streaming twin of q_stream_session."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events", "total")
    )


def deduplicated(stream: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Stateful exact dedup on event_id within the watermark horizon —
    the streaming form of q_dedup_exact's keep-first semantics."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_multi_sink(stream: DataFrame, out_dir: str, checkpoint_dir: str):
    """foreachBatch multi-sink: each micro-batch fans out to FOUR sinks —
    parquet (raw rows), CSV (per-type summary), TXT (stats line), and a
    PDF diagnostics page — the reference's four-sinks-per-set pattern
    (psf_phot.py:91-94: FITS/CSV/TXT/PDF per image set; here the batch
    is the set). Aggregations stay DataFrame-side; only the bounded
    render payload (a 20x24 occupancy grid, one stats row) is collected.
    Returns the started query."""

    def write_all(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()  # four consumers, one materialization
        try:
            _write_all_sinks(batch_df, batch_id, out_dir)
        finally:
            # unpersist unconditionally: a failing sink must not leak the
            # cached micro-batch for the stream's lifetime (round-3 ADVICE)
            batch_df.unpersist()

    return (
        stream.writeStream
        .foreachBatch(write_all)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _write_all_sinks(batch_df: DataFrame, batch_id: int, out_dir: str) -> None:
    batch_df.write.mode("append").parquet(f"{out_dir}/raw")
    (batch_df.groupBy("event_type")
     .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
     .withColumn("batch_id", F.lit(batch_id))
     .write.mode("append").option("header", True).csv(f"{out_dir}/summary"))
    # TXT diagnostics line (reference write_txt analog, p_io.py:121-154)
    (batch_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
        F.round(F.median("value"), 4).alias("vmed"))
     .select(F.concat_ws(
         "", F.lit(f"batch {batch_id}: n="), F.col("n").cast("string"),
         F.lit(" value[min,max,med]=["), F.col("vmin").cast("string"),
         F.lit(","), F.col("vmax").cast("string"),
         F.lit(","), F.col("vmed").cast("string"), F.lit("]"))
         .alias("value"))
     .write.mode("append").text(f"{out_dir}/diag_txt"))
    # PDF diagnostics page: hour-of-day x value-bucket occupancy
    # heatmap, computed relationally (<= 480 cells collected)
    import numpy as np

    from ..sources.pdf import MiniPdf, zscale_stretch

    cells = (batch_df
             .select(F.hour("ts").alias("h"),
                     F.least(F.lit(19), F.floor(F.col("value") / 50)
                             .cast("int")).alias("vb"))
             .groupBy("h", "vb").count().collect())
    grid = np.zeros((20, 24))
    for r in cells:
        if r["h"] is not None and r["vb"] is not None and r["vb"] >= 0:
            grid[r["vb"], r["h"]] = r["count"]
    pdf = MiniPdf()
    pdf.new_page()
    pdf.text(54, 738, f"micro-batch {batch_id}: event occupancy "
                      "(x: hour of day, y: value bucket)", size=12)
    u8, vmin, vmax = zscale_stretch(grid)
    pdf.image(u8, 54, 300, 480, 400)
    pdf.rect(54, 300, 480, 400)
    pdf.colorbar(546, 300, 14, 400, vmin, vmax)
    pdf.write(f"{out_dir}/diag_batch_{batch_id}.pdf")


def purchase_error_join(stream: DataFrame, within: str = "24 hours",
                        watermark: str = "48 hours") -> DataFrame:
    """Stream-stream inner join with event-time bounds: each purchase
    joined to errors by the same user within ``within`` AFTER the
    purchase. Both sides are watermarked so the join state is bounded —
    the correlation query (did the pipeline error right after an event?)
    that batch mode answers with a band join (q_join_range's shape)."""
    purchases = (stream.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts"))
                 .withWatermark("p_ts", watermark))
    errors = (stream.filter(F.col("event_type") == "error")
              .select(F.col("user_id").alias("e_user"),
                      F.col("event_id").alias("error_id"),
                      F.col("ts").alias("e_ts"))
              .withWatermark("e_ts", watermark))
    return purchases.join(
        errors,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {within}")),
    ).select("p_user", "purchase_id", "error_id", "p_ts", "e_ts")


def run_upsert_sink(stream: DataFrame, target_dir: str, checkpoint_dir: str):
    """foreachBatch MERGE-upsert sink: each micro-batch reduces to one
    latest-value row per user (max event time wins) and upserts into the
    parquet target — the streaming twin of q_merge_upsert. The merge is
    a full-outer join taking whichever side carries the newer event
    time, so replayed batches are idempotent (same rows -> same table).

    The target is re-read each batch and the merged result
    localCheckpoint()-ed before the overwrite (a plain parquet dir can't
    be overwritten while it is a scan input); at production scale the
    same foreachBatch body calls a Delta/Iceberg MERGE INTO and the
    table layer handles atomicity. Returns the started query."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        latest = (batch_df.groupBy("user_id")
                  .agg(F.max_by("value", "ts").alias("value"),
                       F.max("ts").alias("ts")))
        try:
            tgt = spark.read.parquet(target_dir)
        except Exception:  # first batch: nothing to merge yet
            latest.write.mode("overwrite").parquet(target_dir)
            return
        src = latest.select(F.col("user_id").alias("s_user"),
                            F.col("value").alias("s_value"),
                            F.col("ts").alias("s_ts"))
        merged = (tgt.join(src, tgt.user_id == src.s_user, "full_outer")
                  .select(
                      F.coalesce("user_id", "s_user").alias("user_id"),
                      F.when(F.col("s_ts").isNotNull()
                             & (F.col("ts").isNull()
                                | (F.col("s_ts") >= F.col("ts"))),
                             F.col("s_value"))
                       .otherwise(F.col("value")).alias("value"),
                      F.greatest(
                          F.coalesce("ts", "s_ts"),
                          F.coalesce("s_ts", "ts")).alias("ts"))
                  .localCheckpoint())
        merged.write.mode("overwrite").parquet(target_dir)

    return (
        stream.writeStream
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def trending_terms(stream: DataFrame, watermark: str = "30 minutes",
                   min_count: int = 5) -> DataFrame:
    """Trending terms: flatMap (per-event token explode of ``props``)
    feeding an event-time sliding-window count — the one streaming
    shape the window family above doesn't cover: state is keyed by a
    value MANUFACTURED per input row (term), not by an input column,
    so one event updates many windows-x-keys.

    Scale: the explode is map-side (no shuffle added before the
    windowed agg's own exchange); sliding windows (1 h every 30 min)
    mean each term instance lands in 2 windows — state size is
    |terms x open windows|, bounded by the watermark closing windows.
    The ``min_count`` floor cuts the long tail BEFORE results leave
    the state store. Batch twin for parity: the same expression over a
    static read (see test_trending_terms_match_batch)."""
    terms = (stream
             .select("ts", F.explode(F.split(F.lower("props"),
                                             r"[^a-z0-9]+")).alias("term"))
             .filter(F.col("term") != ""))
    return (terms.withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "term")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_count)
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), "term", "n"))


def purchase_error_join_outer(stream: DataFrame, within: str = "24 hours",
                              watermark: str = "48 hours") -> DataFrame:
    """LEFT-OUTER watermarked stream-stream join: every purchase emits —
    matched rows as soon as the error arrives, unmatched rows
    null-padded once the watermark proves no error can still come
    (state for a purchase expires at p_ts + within + watermark delay).
    The attribution-with-negatives query: "which purchases did NOT
    error within 24 h" needs outer semantics, and in streaming that
    answer is only correct once event time has provably passed the
    bound — which is exactly what the watermark encodes.

    Same bounded-state story as the inner form (purchase_error_join):
    both sides watermarked, the join condition carries the time band so
    Spark can evict state. Unmatched rows surface on a LATER
    micro-batch than their data (watermark must advance past the
    bound) — the test drives this with a checkpoint-restart and a
    watermark-advancing sentinel batch."""
    purchases = (stream.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts"))
                 .withWatermark("p_ts", watermark))
    errors = (stream.filter(F.col("event_type") == "error")
              .select(F.col("user_id").alias("e_user"),
                      F.col("event_id").alias("error_id"),
                      F.col("ts").alias("e_ts"))
              .withWatermark("e_ts", watermark))
    return purchases.join(
        errors,
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {within}")),
        "left_outer",
    ).select("p_user", "purchase_id", "error_id", "p_ts", "e_ts")
