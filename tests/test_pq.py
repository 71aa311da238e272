"""Product quantization goldens: planted truths the oracle can't see
(the oracle pins values; these pin the *semantics* of the compression)."""

from pyspark.sql import functions as F

from telescope_data_pipeline_spark.operators.pq import (
    adc_lookup,
    adc_score,
    pq_codebooks,
    pq_encode,
)
from telescope_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def test_codebook_vectors_encode_to_themselves(spark):
    """Vectors 0..7 ARE the codebook, so each must encode to its own
    cid in every subspace with distance exactly 0 — the PQ identity
    property (self-distance is the unique argmin; cid tiebreak only
    matters for exact duplicates)."""
    e = load_table(spark, SF, "embeddings")
    cb = pq_codebooks(e, k=8, m=4, dim=64)
    enc = pq_encode(e.filter(F.col("vec_id") < 8), cb, m=4, dim=64)
    rows = enc.collect()
    assert len(rows) == 8 * 4
    for r in rows:
        assert r["code"] == r["vec_id"], r
        assert r["d2"] == 0.0, r


def test_adc_is_exact_for_codebook_query(spark):
    """For the query vec 0 (a codebook member), ADC(vec 0) must be 0 and
    every ADC distance must be non-negative."""
    e = load_table(spark, SF, "embeddings")
    cb = pq_codebooks(e, k=8, m=4, dim=64)
    enc = pq_encode(e, cb, m=4, dim=64)
    lut = adc_lookup(e.filter(F.col("vec_id") == 0), cb, m=4, dim=64)
    scored = {r["vec_id"]: r for r in adc_score(enc, lut).collect()}
    assert scored[0]["adc_d2"] == 0.0
    assert scored[0]["codes"] == "0,0,0,0"
    assert all(r["adc_d2"] >= 0.0 for r in scored.values())
    assert len(scored) == 500


def test_adc_orders_like_exact_distance(spark):
    """Compression sanity: among the codebook vectors themselves (whose
    ADC is exact by construction), ADC ranking equals exact-distance
    ranking to the query."""
    from telescope_data_pipeline_spark.operators.kmeans import assign_clusters  # noqa: F401

    e = load_table(spark, SF, "embeddings")
    cb = pq_codebooks(e, k=8, m=4, dim=64)
    first8 = e.filter(F.col("vec_id") < 8)
    enc = pq_encode(e, cb, m=4, dim=64)
    lut = adc_lookup(e.filter(F.col("vec_id") == 0), cb, m=4, dim=64)
    adc = {r["vec_id"]: r["adc_d2"] for r in adc_score(enc, lut).collect()
           if r["vec_id"] < 8}
    d2 = F.aggregate(
        F.zip_with("embedding", "qvec",
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, v: acc + v)
    q = first8.crossJoin(
        F.broadcast(e.filter(F.col("vec_id") == 0)
                    .select(F.col("embedding").alias("qvec"))))
    exact = {r["vec_id"]: r["d"] for r in
             q.select("vec_id", d2.alias("d")).collect()}
    rank_adc = sorted(adc, key=lambda v: (adc[v], v))
    rank_exact = sorted(exact, key=lambda v: (round(exact[v], 6), v))
    assert rank_adc == rank_exact
