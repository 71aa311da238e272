"""Approximate aggregates stay within their advertised error of the
exact forms — the accuracy contract behind the 100 TB swaps."""

from __future__ import annotations

from pyspark.sql import functions as F

from telescope_data_pipeline_spark.queries import get
from telescope_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def test_approx_aggregates_within_error(spark):
    approx = {r.l_returnflag: r for r in get("q_agg_approx").fn(spark, SF).collect()}
    exact = {r.l_returnflag: r for r in (
        load_table(spark, SF, "lineitem").groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("orders"),
             F.median("l_extendedprice").alias("med"))
    ).collect()}
    for k, e in exact.items():
        a = approx[k]
        assert abs(a.approx_orders - e.orders) / e.orders < 0.05
        assert abs(a.approx_median - e.med) / e.med < 0.01
        assert a.approx_q1 <= a.approx_median <= a.approx_q3


def test_stratified_sample_deterministic_and_proportional(spark):
    r1 = {r.lang: r.n_sampled for r in get("q_sample_stratified").fn(spark, SF).collect()}
    r2 = {r.lang: r.n_sampled for r in get("q_sample_stratified").fn(spark, SF).collect()}
    assert r1 == r2  # seeded: stable across runs
    totals = {r.lang: r.n for r in (
        load_table(spark, SF, "documents").groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))).collect()}
    # en heavily kept, zh heavily cut (Bernoulli sampling: loose bounds)
    assert r1["en"] / totals["en"] > 0.75
    assert r1["zh"] / totals["zh"] < 0.45
