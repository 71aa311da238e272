"""Continuous corpus ingestion: the training-data operators as a stream.

The batch pipeline's quality gate (functions/text.py::quality_verdict)
and incremental dedup (q_dedup_incremental's shape) are stateless /
keyed operators, so the SAME expressions run under Structured
Streaming unchanged — this module wires them into the continuous
ingestion job a production corpus actually runs: new document files
land, get gated, deduped within the stream AND against the stored
corpus digest index, and append to the corpus sink.

Scale notes: the gate is map-only (no state); stream-internal dedup is
keyed state on 16-byte digests, and that state is CHECKPOINTED — it
survives availableNow restarts (tests prove a later run still drops a
re-crawl of earlier content). Unbounded, that state grows by one entry
per distinct digest forever; both bounding strategies are implemented
here:

- **watermark-bounded dedup**: pass ``event_time_col`` + ``watermark``
  to :func:`ingest_documents` and the stream uses
  ``dropDuplicatesWithinWatermark`` — state for digests older than the
  watermark is dropped automatically. Right when the source carries an
  event time and re-crawls cluster in time.
- **periodic compaction**: :func:`compact_ingest_state` folds every
  accepted digest into a NEW corpus-index snapshot and removes the
  checkpoint. The next stream starts with EMPTY dedup state yet still
  rejects all previously-ingested content, because rejection moved
  from ephemeral stream state into the durable index — the index makes
  the pipeline idempotent, so a checkpoint reset is safe (a fresh
  file-source listing re-reads old files, whose content the anti-join
  now drops; in production pair this with source-file retention).

The corpus-index join is stream-static. NOTE on refresh semantics:
Spark re-EXECUTES the static side per micro-batch, but a
parquet-backed DataFrame pins its file LISTING when created —
appending new index files after stream start is not seen
(``tests/test_streaming.py`` pins this behavior). To pick up a
refreshed index, either restart the stream on the index-refresh
schedule (:func:`load_corpus_index` resolves the newest snapshot at
call time), or back the index with a table format whose snapshot
resolves per query (Delta/Iceberg).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import quality_verdict

#: documents-table schema (FIXTURES.md A) for the file-source stream.
DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

_SNAP_PREFIX = "snap-"


def read_document_stream(spark: SparkSession, docs_dir: str,
                         max_files_per_trigger: int = 4,
                         schema: T.StructType = DOCUMENTS) -> DataFrame:
    """File-source stream of document parquet chunks; at production
    scale the same code points at Kafka — only this reader changes.
    ``schema`` is overridable for sources that carry extra columns
    (e.g. a crawl timestamp for watermark-bounded dedup)."""
    return (spark.readStream
            .schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(docs_dir))


def ingest_documents(stream: DataFrame,
                     corpus_digests: DataFrame,
                     event_time_col: str | None = None,
                     watermark: str | None = None) -> DataFrame:
    """Gate → digest → stream-internal dedup → anti-join the corpus
    index. Returns the append-mode stream of accepted documents with
    their digest (write it to the corpus AND to the digest index).

    ``corpus_digests``: static DataFrame with a ``digest`` column (the
    stored index of everything already ingested).

    ``event_time_col`` + ``watermark`` (e.g. ``("crawl_ts", "24
    hours")``): bound the dedup state via
    ``dropDuplicatesWithinWatermark`` — digests older than the
    watermark are evicted from state, so memory is proportional to the
    watermark window, not corpus history. Without them the dedup is
    exact-forever (explicit unbounded fallback); pair THAT form with
    :func:`compact_ingest_state` on a schedule.
    """
    if (event_time_col is None) != (watermark is None):
        raise ValueError(
            "event_time_col and watermark must be given together")
    gated = (stream
             .withColumn("verdict", quality_verdict(F.col("text")))
             .filter(F.col("verdict") == "keep")
             .drop("verdict"))
    digested = gated.withColumn(
        "digest", F.md5(F.substring("text", 1, 30)))  # prod: sha2(text,256)
    if event_time_col is not None:
        deduped = (digested
                   .withWatermark(event_time_col, watermark)
                   .dropDuplicatesWithinWatermark(["digest"]))
    else:
        deduped = digested.dropDuplicates(["digest"])
    return deduped.join(corpus_digests, "digest", "left_anti")


def _snapshots(index_dir: str) -> list[str]:
    """Complete snapshots only, oldest->newest. A directory is complete
    when it carries Spark's ``_SUCCESS`` marker — a crash mid-write
    leaves a partial dir without one, and treating a partial snapshot
    as authoritative would silently drop index rows (the older complete
    snapshot is still on disk and must win). Writers below also stage
    under a non-matching temp name and rename into place, so this guard
    is the object-store belt to the POSIX-rename braces."""
    if not os.path.isdir(index_dir):
        return []
    return sorted(
        (d for d in os.listdir(index_dir)
         if d.startswith(_SNAP_PREFIX)
         and os.path.exists(os.path.join(index_dir, d, "_SUCCESS"))),
        key=lambda d: int(d[len(_SNAP_PREFIX):]))


def _publish_snapshot(write, index_dir: str, nxt: int) -> str:
    """Stage a snapshot write under ``_tmp-snap-<n>`` (a name
    :func:`_snapshots` never matches) and atomically rename it to
    ``snap-<n>``. A crash during the write leaves only the temp dir —
    readers and a retried compaction keep resolving the newest COMPLETE
    snapshot; the retry clears the leftover temp first."""
    tmp = os.path.join(index_dir, f"_tmp-{_SNAP_PREFIX}{nxt}")
    final = os.path.join(index_dir, f"{_SNAP_PREFIX}{nxt}")
    shutil.rmtree(tmp, ignore_errors=True)  # crashed earlier attempt
    write(tmp)
    # A partial snap-<n> dir without _SUCCESS (left by a pre-upgrade
    # crash that wrote the final name directly) would make the rename
    # fail: _snapshots() skips it when computing nxt, so the collision
    # never clears itself. A COMPLETE dir at the target is a retry of
    # an already-published snapshot and must never be destroyed.
    if os.path.isdir(final):
        if os.path.exists(os.path.join(final, "_SUCCESS")):
            raise FileExistsError(
                f"complete snapshot already published at {final}")
        shutil.rmtree(final)
    os.rename(tmp, final)
    return final


def load_corpus_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """Resolve the NEWEST index snapshot at call time. Restarting the
    ingestion stream with a fresh call picks up snapshots written since
    the last start — the rebuild-on-schedule refresh path for the
    stream-static join (a parquet DataFrame pins its listing, so an
    in-flight stream never sees them)."""
    snaps = _snapshots(index_dir)
    if not snaps:
        return spark.createDataFrame([], "digest string")
    return spark.read.parquet(os.path.join(index_dir, snaps[-1]))


def compact_ingest_state(spark: SparkSession, accepted_dir: str,
                         index_dir: str, checkpoint_dir: str) -> str:
    """Compact the ingestion stream's dedup state into the corpus index.

    Reads the ``digest`` column of everything the stream accepted so
    far (``accepted_dir``, the stream's parquet sink), unions it with
    the current index snapshot, writes a NEW snapshot under
    ``index_dir`` (never overwriting in place — a concurrent reader of
    the old snapshot stays consistent), and removes ``checkpoint_dir``.

    Call this with the stream STOPPED. The next
    :func:`read_document_stream` → :func:`ingest_documents` run starts
    from a fresh checkpoint: empty dedup state (bounded memory again),
    full re-listing of source files, and every previously-accepted
    content digest rejected by the index anti-join instead of by state.
    Returns the new snapshot path. Scale: the compaction job itself is
    one distinct-union of 16-byte digests — linear shuffle in index
    size, no text moves.
    """
    digests = spark.read.parquet(accepted_dir).select("digest")
    merged = load_corpus_index(spark, index_dir).select("digest") \
        .unionByName(digests).distinct()
    snaps = _snapshots(index_dir)
    nxt = (int(snaps[-1][len(_SNAP_PREFIX):]) + 1) if snaps else 0
    new_snap = _publish_snapshot(
        lambda tmp: merged.write.mode("overwrite").parquet(tmp),
        index_dir, nxt)
    shutil.rmtree(checkpoint_dir, ignore_errors=True)
    return new_snap


# ---------------------------------------------------------------------------
# Near-duplicate (MinHash-LSH) streaming ingestion
# ---------------------------------------------------------------------------

#: pruning buckets for the compacted band-index snapshot layout
_BAND_BUCKETS = 64


def _band_rows(sh: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, band_idx, band_hash, bucket) LSH band rows for shingled
    docs — the batch operator's own signature fold and band projection,
    plus the pruning bucket the compacted index is laid out by."""
    from ..operators.dedup import band_rows, minhash_signatures

    return (band_rows(minhash_signatures(sh, num_hashes=num_hashes),
                      num_hashes=num_hashes, bands=bands)
            .withColumn("bucket",
                        F.pmod(F.col("band_hash"),
                               F.lit(_BAND_BUCKETS)).cast("int")))


def load_band_index(spark: SparkSession, band_dir: str,
                    buckets: list[int] | None = None) -> DataFrame:
    """(band_idx, band_hash) rows accepted so far: the newest compacted
    snapshot plus every per-batch delta written since. Resolved at CALL
    time — inside foreachBatch this runs per micro-batch, so unlike the
    stream-static join (pinned file listing) every batch sees the bands
    appended by earlier batches.

    ``buckets`` prunes the SNAPSHOT read to the listed layout buckets
    (the snapshot is partitionBy("bucket"), so the filter is an
    I/O-level PartitionFilter — only matching directories are read);
    per-batch deltas are small by construction (bounded by acceptances
    since the last compaction) and are read in full."""
    empty = spark.createDataFrame([], "band_idx int, band_hash long")
    if not os.path.isdir(band_dir):
        return empty
    parts = [empty]
    snaps = _snapshots(band_dir)
    if snaps:
        snap = spark.read.parquet(os.path.join(band_dir, snaps[-1]))
        if buckets is not None:
            snap = snap.filter(F.col("bucket").isin(buckets))
        parts.append(snap.select("band_idx", "band_hash"))
    batches = [d for d in os.listdir(band_dir) if d.startswith("batch-")]
    if batches:
        parts.append(
            spark.read.parquet(*[os.path.join(band_dir, d) for d in batches])
            .select("band_idx", "band_hash"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_band_index(spark: SparkSession, band_dir: str) -> str | None:
    """Fold the per-batch band deltas into a NEW compacted snapshot.

    Mirrors :func:`compact_ingest_state`'s contract (call with the
    stream STOPPED): distinct-unions the newest snapshot with every
    ``batch-*`` delta, writes ``snap-<n+1>`` partitioned by the
    ``bucket`` layout column (so per-batch lookups prune to the
    buckets the incoming docs actually hash into), then removes the
    absorbed deltas and older snapshots. Crash-safety covers the whole
    window: the snapshot is staged under a temp name and renamed into
    place (:func:`_publish_snapshot`), so a crash DURING the write
    leaves no partial ``snap-*`` dir for readers to mistake for the
    index, and a crash between rename and delta deletion leaves
    leftover deltas that merely duplicate rows already in the snapshot
    — harmless for the semi-join and re-deduplicated next compaction.

    This is what bounds :func:`ingest_documents_neardup`'s per-batch
    cost: without it the delta LIST grows with every accepting batch
    forever; with it each batch reads one bucketed snapshot (pruned to
    the batch's buckets) plus the bounded post-compaction deltas.
    Returns the new snapshot path (None when there is nothing to do).
    """
    if not os.path.isdir(band_dir):
        return None
    batches = [d for d in os.listdir(band_dir) if d.startswith("batch-")]
    snaps = _snapshots(band_dir)
    if not batches and len(snaps) <= 1:
        return None
    merged = (load_band_index(spark, band_dir)
              .withColumn("bucket",
                          F.pmod(F.col("band_hash"),
                                 F.lit(_BAND_BUCKETS)).cast("int"))
              .distinct())
    nxt = (int(snaps[-1][len(_SNAP_PREFIX):]) + 1) if snaps else 0
    # repartition on the layout column: one writer per bucket dir, not
    # n_tasks files per dir (the coalesce(1) trap — see verify notes)
    new_snap = _publish_snapshot(
        lambda tmp: (merged.repartition(F.col("bucket"))
                     .write.mode("overwrite")
                     .partitionBy("bucket").parquet(tmp)),
        band_dir, nxt)
    for d in batches:
        shutil.rmtree(os.path.join(band_dir, d), ignore_errors=True)
    for s in snaps:
        shutil.rmtree(os.path.join(band_dir, s), ignore_errors=True)
    return new_snap


def ingest_documents_neardup(
    spark: SparkSession,
    docs_dir: str,
    accepted_dir: str,
    band_dir: str,
    checkpoint_dir: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_files_per_trigger: int = 1,
):
    """Continuous NEAR-duplicate-free corpus ingestion: the MinHash-LSH
    dedup family under Structured Streaming via ``foreachBatch``.

    Exact-digest streaming dedup (:func:`ingest_documents`) misses
    re-crawls with boilerplate edits; this job drops them. Per
    micro-batch (a batch computation — LSH banding needs self- and
    index-joins that pure streaming operators can't express):

    1. quality gate (map-only, same expression as the batch pipeline);
    2. shingle + MinHash + band hashes (zero-shuffle per-row folds);
    3. docs sharing ANY band with the accepted-corpus band index are
       dropped — the index stores small band rows, never text, and is
       resolved each batch (so earlier batches' acceptances are seen,
       unlike a pinned stream-static join). Per-batch cost is BOUNDED:
       the read is the newest compacted snapshot PRUNED to the buckets
       this batch's bands hash into (PartitionFilters on the
       partitionBy("bucket") layout) plus the deltas written since the
       last :func:`compact_band_index` — run that on the exact-dedup
       compaction schedule to keep the delta list short;
    4. within-batch candidates verify by exact Jaccard on shingles
       (keep the smallest doc_id of each near-dup pair);
    5. accepted docs append under ``accepted_dir/batch-<id>`` and their
       band rows under ``band_dir/batch-<id>``.

    Exactly-once: both writes are per-batch directories created with
    mode("error") behind an existence check KEYED ON THE LAST artifact
    (band_path): a replayed batch with out_path committed but
    band_path missing rebuilds the bands from the committed parquet
    before skipping, so a crash between the two writes can never
    silently un-index accepted content — the mv.py idempotent-merge
    pattern plus the round-6 advisor's partial-commit repair.

    Precision note: an index hit is dropped WITHOUT Jaccard
    verification (the index keeps bands only — at 100 TB shingle
    arrays stay out of state by design; with r = num_hashes/bands = 4
    rows per band a collision implies high estimated similarity).
    Raise r for stricter precision, or persist shingle digests
    alongside the index if exact verification against history is
    required.

    Returns the started StreamingQuery (availableNow trigger).
    """
    from ..operators.dedup import shingle

    if num_hashes % bands:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")

    stream = read_document_stream(spark, docs_dir,
                                  max_files_per_trigger=max_files_per_trigger)

    def _tick(batch: DataFrame, batch_id: int) -> None:
        out_path = os.path.join(accepted_dir, f"batch-{batch_id}")
        band_path = os.path.join(band_dir, f"batch-{batch_id}")
        # replay guard keyed on the LAST artifact written: out_path
        # alone would let a crash between the two writes permanently
        # lose the accepted docs' bands (all their future near-dups
        # would then be admitted) — the round-6 advisor finding
        if os.path.exists(band_path):  # fully committed: skip
            return
        if os.path.exists(out_path):
            # crash landed between the accepted write and the band
            # write: rebuild the band rows from the COMMITTED accepted
            # parquet (deterministic fold of the same text), commit
            # them, and the replayed batch is whole again
            committed = spark.read.parquet(out_path)
            (_band_rows(shingle(committed, "doc_id", "text", n=shingle_n),
                        num_hashes, bands)
             .select("band_idx", "band_hash", "bucket")
             .write.mode("error").parquet(band_path))
            return
        gated = (batch
                 .withColumn("verdict", quality_verdict(F.col("text")))
                 .filter(F.col("verdict") == "keep")
                 .drop("verdict"))
        sh = shingle(gated, "doc_id", "text", n=shingle_n)
        banded = _band_rows(sh, num_hashes, bands)
        # drop docs near-duplicating the accepted corpus (band index
        # hit); the index read prunes the compacted snapshot to the
        # buckets THIS batch's bands hash into (bounded collect: the
        # distinct bucket list is <= _BAND_BUCKETS ints)
        touched = [r["bucket"] for r in
                   banded.select("bucket").distinct().collect()]
        idx = load_band_index(spark, band_dir, buckets=touched)
        hit = (banded.join(idx, ["band_idx", "band_hash"], "left_semi")
               .select(F.col("id").alias("doc_id")).distinct())
        survivors = gated.join(hit, "doc_id", "left_anti")
        # within-batch near-dups: LSH candidates + exact-Jaccard verify,
        # keep the smallest doc_id of each verified pair
        ssh = sh.join(hit.withColumnRenamed("doc_id", "id"), "id",
                      "left_anti")
        sbands = banded.join(hit.withColumnRenamed("doc_id", "id"), "id",
                             "left_anti")
        a = sbands.select(F.col("id").alias("id_a"), "band_idx", "band_hash")
        b = sbands.select(F.col("id").alias("id_b"), "band_idx", "band_hash")
        cand = (a.join(b, ["band_idx", "band_hash"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct())
        sa = ssh.select(F.col("id").alias("id_a"),
                        F.col("shingles").alias("sh_a"))
        sb = ssh.select(F.col("id").alias("id_b"),
                        F.col("shingles").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        dups = (cand.join(sa, "id_a").join(sb, "id_b")
                .filter(inter.cast("double") / union >= threshold)
                .select(F.col("id_b").alias("doc_id")).distinct())
        accepted = survivors.join(dups, "doc_id", "left_anti")
        accepted.write.mode("error").parquet(out_path)
        # bands of the accepted docs only — rejected docs must not
        # poison the index against their own originals
        (banded.join(accepted.select(F.col("doc_id").alias("id")), "id")
         .select("band_idx", "band_hash", "bucket")
         .write.mode("error").parquet(band_path))

    return (stream.writeStream
            .foreachBatch(_tick)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
