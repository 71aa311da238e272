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
re-crawl of earlier content), which also means it grows by one entry
per distinct digest forever unless bounded: give dropDuplicates a
watermarked event-time column when the source provides one, or
periodically compact the digest state into the corpus index and reset
the checkpoint; the corpus-index join
is stream-static. NOTE on refresh semantics: Spark re-EXECUTES the
static side per micro-batch, but a parquet-backed DataFrame pins its
file LISTING when created — appending new index files after stream
start is not seen. To pick up a refreshed index without a restart,
back it with a table format whose snapshot resolves per query (Delta/
Iceberg), or rebuild the stream on the index-refresh schedule.
"""

from __future__ import annotations

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


def read_document_stream(spark: SparkSession, docs_dir: str,
                         max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream of document parquet chunks; at production
    scale the same code points at Kafka — only this reader changes."""
    return (spark.readStream
            .schema(DOCUMENTS)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(docs_dir))


def ingest_documents(stream: DataFrame,
                     corpus_digests: DataFrame) -> DataFrame:
    """Gate → digest → stream-internal dedup → anti-join the corpus
    index. Returns the append-mode stream of accepted documents with
    their digest (write it to the corpus AND to the digest index).

    ``corpus_digests``: static DataFrame with a ``digest`` column (the
    stored index of everything already ingested).
    """
    gated = (stream
             .withColumn("verdict", quality_verdict(F.col("text")))
             .filter(F.col("verdict") == "keep")
             .drop("verdict"))
    digested = gated.withColumn(
        "digest", F.md5(F.substring("text", 1, 30)))  # prod: sha2(text,256)
    deduped = digested.dropDuplicates(["digest"])
    return deduped.join(corpus_digests, "digest", "left_anti")
