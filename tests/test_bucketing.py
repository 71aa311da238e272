"""Bucketed-layout proofs: the '100 TB: bucket the fact table' claim
asserted on physical plans, not just written in docstrings."""

from pyspark.sql import functions as F

from telescope_data_pipeline_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)
from telescope_data_pipeline_spark.plans.audit import physical_plan
from telescope_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def _final(plan: str) -> str:
    return plan.split("== Initial Plan ==")[0]


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """orders JOIN lineitem on orderkey, both bucketed by the key with
    the same count: zero Exchange in the plan — the co-located join
    every join docstring promises."""
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    try:
        write_bucketed(o, "b_orders", "o_orderkey", 8,
                       path=str(tmp_path / "b_orders"))
        write_bucketed(li, "b_lineitem", "l_orderkey", 8,
                       path=str(tmp_path / "b_lineitem"))
        # Force the join strategy the bucket layout serves (a broadcast
        # would trivially have no exchange and prove nothing) — the
        # hint must ride a join INPUT, not the joined result.
        j = read_bucketed(spark, "b_orders").hint("merge").join(
            read_bucketed(spark, "b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"))
        j.collect()
        plan = _final(physical_plan(j))
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path):
    """groupBy on the bucket key reuses the layout: no Exchange."""
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    try:
        write_bucketed(li, "b_li_agg", "l_orderkey", 8,
                       path=str(tmp_path / "b_li_agg"))
        agg = (read_bucketed(spark, "b_li_agg")
               .groupBy("l_orderkey")
               .agg(F.sum("l_quantity").alias("q")))
        agg.collect()
        plan = _final(physical_plan(agg))
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")


def test_bucketed_join_matches_unbucketed_results(spark, tmp_path):
    """Layout must never change semantics: bucketed join == plain join."""
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    expected = (o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
                .groupBy().agg(F.count(F.lit(1)), F.sum("l_quantity"))
                .collect())
    try:
        write_bucketed(o, "b_o2", "o_orderkey", 8, path=str(tmp_path / "o2"))
        write_bucketed(li, "b_l2", "l_orderkey", 8, path=str(tmp_path / "l2"))
        got = (read_bucketed(spark, "b_o2")
               .join(read_bucketed(spark, "b_l2"),
                     F.col("o_orderkey") == F.col("l_orderkey"))
               .groupBy().agg(F.count(F.lit(1)), F.sum("l_quantity"))
               .collect())
        assert got == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_o2")
        spark.sql("DROP TABLE IF EXISTS b_l2")
