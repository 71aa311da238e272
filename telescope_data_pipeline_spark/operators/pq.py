"""Product quantization (PQ) for embedding columns, Spark-first.

PQ is the standard memory-compression layer under large-scale ANN
(Jegou et al. 2011, "Product Quantization for Nearest Neighbor
Search"): split a D-dim vector into ``m`` subspaces, vector-quantize
each against a k-entry codebook, and answer queries with asymmetric
distance computation (ADC) — a per-subspace lookup table built once per
query, so scoring a vector costs m table lookups instead of D floats.

Spark shape (the IVF/k-means assigner generalized per subspace):

- codebooks are a k·m-row table, always broadcast;
- encoding is ONE equi-join on the subspace id (vectors exploded to m
  rows each, each row carrying only its D/m-slice) + one
  map-side-combined argmin groupBy — shuffle volume is |n|·m code ids,
  never vectors;
- ADC scoring joins the (vec, sub, code) table with the k·m query
  lookup table (broadcast) and sums m small doubles per vector.

Determinism follows operators/kmeans.py: every distance is rounded to
6 digits before it acts as an argmin key, with the centroid id as
tiebreak, so cross-engine float fold order can never flip a code.

Reference parity: no counterpart in the reference (core.py has no
vector search); this extends the similarity family
(operators/similarity.py) with its compressed-domain member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pq_codebooks", "pq_encode", "adc_lookup", "adc_score"]


def _sub_d2(a_col, b_col) -> "F.Column":
    """Rounded squared-L2 between two subvector array columns (JVM
    zip_with + left fold, no Python)."""
    return F.round(
        F.aggregate(
            F.zip_with(a_col, b_col,
                       lambda x, y: (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double"))),
            F.lit(0.0), lambda acc, v: acc + v),
        6)


def _explode_subspaces(e: DataFrame, m: int, sub_dim: int,
                       id_col: str, vec_col: str,
                       out_id: str) -> DataFrame:
    """|n| rows -> |n|·m rows of (id, sub, D/m-dim slice)."""
    sub = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub")
    return e.select(F.col(id_col).alias(out_id), sub, F.col(vec_col)) \
            .select(out_id, "sub",
                    F.slice(vec_col, F.col("sub") * sub_dim + 1,
                            F.lit(sub_dim)).alias("svec"))


def pq_codebooks(e: DataFrame, k: int = 8, m: int = 4, dim: int = 64,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Deterministic first-k codebooks: the first k vectors' subvectors,
    one k-row codebook per subspace (k·m rows total — driver-free, the
    same init rule as q_kmeans_step; production trains each codebook
    with operators/kmeans.kmeans_iterate on the subvector column)."""
    first_k = e.filter(F.col(id_col) < k)
    return (_explode_subspaces(first_k, m, dim // m, id_col, vec_col, "cid")
            .withColumnRenamed("svec", "cvec"))


def pq_encode(e: DataFrame, codebooks: DataFrame, m: int = 4,
              dim: int = 64, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode every vector: (vec, sub) -> nearest codebook entry.
    Returns |n|·m rows (id, sub, code, d2). One broadcast equi-join on
    sub + one (id, sub) argmin groupBy."""
    ev = _explode_subspaces(e, m, dim // m, id_col, vec_col, id_col)
    pairs = ev.join(F.broadcast(codebooks), "sub")
    key = F.struct(_sub_d2("svec", "cvec").alias("d2"), F.col("cid"))
    return (pairs.groupBy(id_col, "sub")
            .agg(F.min_by("cid", key).alias("code"),
                 F.min(key["d2"]).alias("d2")))


def adc_lookup(query: DataFrame, codebooks: DataFrame, m: int = 4,
               dim: int = 64, vec_col: str = "embedding") -> DataFrame:
    """The per-query ADC table: (sub, cid, qd2) — k·m rows, built from
    ONE query row, always broadcast."""
    qv = _explode_subspaces(query, m, dim // m,
                            query.columns[0], vec_col, "_qid")
    return (qv.join(F.broadcast(codebooks), "sub")
            .select("sub", "cid", _sub_d2("svec", "cvec").alias("qd2")))


def adc_score(encoded: DataFrame, lookup: DataFrame,
              id_col: str = "vec_id") -> DataFrame:
    """Approximate squared distance per vector: sum of m lookups.
    (id, codes-string, adc_d2) — the codes string is the engine-neutral
    compact form of the m-byte PQ code."""
    j = encoded.join(F.broadcast(lookup),
                     (encoded["sub"] == lookup["sub"])
                     & (encoded["code"] == lookup["cid"])) \
               .select(encoded[id_col], encoded["sub"],
                       encoded["code"], lookup["qd2"])
    return (j.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.struct("sub", "code"))),
                         lambda s: s["code"].cast("string")),
                     ",").alias("codes"),
                 F.round(F.sum("qd2"), 6).alias("adc_d2")))
