"""Persisted IVF index: build once, probe with partition pruning.

``ivf_topk`` (operators/similarity.py) re-assigns the corpus to cells
on every query run — right for one-shot jobs, wrong for the serve-many-
queries pattern where the corpus is static and probes arrive forever.
This module persists the cell assignment as a parquet layout
PARTITIONED BY the cell id, so a probe with ``nprobe`` cells reads ONLY
those directories — Spark's partition pruning turns the ANN cell filter
into an I/O-level skip (the plan's ``PartitionFilters`` carries the
cell predicate; at 100 TB a 16-of-1024-cell probe touches 1.6% of the
bytes before a single row deserializes).

The centroid matrix rides inside the index directory under
``_centroids`` (underscore-prefixed paths are invisible to Spark's
data-file listing, the same convention as ``_SUCCESS``), so the index
is one self-contained artifact.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import _cell_assigner, cosine

__all__ = ["ivf_index_write", "ivf_index_probe"]


def ivf_index_write(corpus: DataFrame, path: str, centroids: np.ndarray,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Assign every vector to its nearest centroid and write the corpus
    partitioned by the cell id (one directory per cell), plus the
    centroid matrix under ``<path>/_centroids``."""
    assigner = _cell_assigner(centroids, 1)
    (corpus.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).alias("vec"),
                   F.element_at(assigner(F.col(vec_col)), 1).alias("cell"))
     .write.partitionBy("cell").mode("overwrite").parquet(path))
    spark = corpus.sparkSession
    cents = [(int(i), [float(x) for x in row])
             for i, row in enumerate(np.asarray(centroids, dtype=np.float64))]
    (spark.createDataFrame(cents, "cid int, cvec array<double>")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(path, "_centroids")))


def ivf_index_probe(spark: SparkSession, path: str, query_vec,
                    nprobe: int = 4, k: int = 5,
                    exclude_id: int | None = None) -> DataFrame:
    """Top-k cosine neighbors of ``query_vec`` reading only the
    ``nprobe`` nearest cells of the persisted index. The cell choice is
    a driver-side argsort over the (bounded) centroid matrix; the scan
    then partition-prunes to those directories and the final top-k is a
    TakeOrderedAndProject. ``nprobe >= n_centroids`` degrades to exact
    search over the full index."""
    cents = np.asarray(
        [r["cvec"] for r in
         spark.read.parquet(os.path.join(path, "_centroids"))
         .orderBy("cid").collect()], dtype=np.float64)
    qv = np.asarray(list(query_vec), dtype=np.float64)
    d2 = ((cents - qv[None, :]) ** 2).sum(axis=1)
    cells = [int(c) for c in np.argsort(d2, kind="stable")[:nprobe]]

    df = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    if exclude_id is not None:
        df = df.filter(F.col("vec_id") != exclude_id)
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    scored = df.select("vec_id",
                       F.round(cosine("vec", qlit), 6).alias("cosine"))
    return (scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
            .select(F.col("vec_id").alias("cand_id"), "cosine"))
