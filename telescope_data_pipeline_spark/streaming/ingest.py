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
    if not os.path.isdir(index_dir):
        return []
    return sorted(
        (d for d in os.listdir(index_dir) if d.startswith(_SNAP_PREFIX)),
        key=lambda d: int(d[len(_SNAP_PREFIX):]))


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
    new_snap = os.path.join(index_dir, f"{_SNAP_PREFIX}{nxt}")
    merged.write.mode("error").parquet(new_snap)
    shutil.rmtree(checkpoint_dir, ignore_errors=True)
    return new_snap
