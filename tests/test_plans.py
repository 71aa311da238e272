"""Scale-critical physical-plan properties, asserted not eyeballed.

These are the checks the 100 TB design note demands (SURVEY.md §4):
a plan that silently regresses to a cartesian product or an unpruned
scan is a correctness-of-scale bug even when row-level results match.
"""

from __future__ import annotations

from telescope_data_pipeline_spark.plans.audit import (
    assert_plan,
    has_codegen,
    pushed_filters,
    read_schemas,
)
from telescope_data_pipeline_spark.queries import get

SF = "/root/testdata/sf0.01"


def test_flagship_broadcasts_dim_and_pushes_filters(spark):
    df = get("q_flagship").fn(spark, SF)
    df.collect()  # AQE finalizes (and annotates codegen) on execution of
    # THIS df's QueryExecution — count() would spawn a different one
    assert_plan(df, contains=("BroadcastHashJoin",), absent=("CartesianProduct",))
    assert has_codegen(df)
    pushed = " | ".join(pushed_filters(df))
    assert "l_shipdate" in pushed and "o_orderdate" in pushed


def test_projection_prunes_scan_columns(spark):
    df = get("q_project").fn(spark, SF)
    schemas = read_schemas(df)
    assert schemas, "no parquet scan found"
    # 11-column lineitem must be read as only the 5 referenced columns.
    cols = schemas[0].split(",")
    assert len(cols) <= 5, f"scan reads too much: {schemas[0]}"


def test_topk_plans_take_ordered(spark):
    assert_plan(get("q_topk").fn(spark, SF), contains=("TakeOrderedAndProject",))


def test_nn_join_never_cartesian(spark):
    """The grid-bucketed NN join must plan as an equi-join on cell keys —
    if it degrades to a cartesian/BNL join the 100 TB story is dead."""
    assert_plan(get("q_join_nn").fn(spark, SF),
                absent=("CartesianProduct", "BroadcastNestedLoopJoin"))


def test_minhash_candidates_equi_join(spark):
    from telescope_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle,
    )
    from telescope_data_pipeline_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    cand = lsh_candidate_pairs(minhash_signatures(shingle(docs, "doc_id", "text")))
    assert_plan(cand, absent=("CartesianProduct", "BroadcastNestedLoopJoin"))


def test_broadcast_join_no_fact_shuffle(spark):
    """Dim joins broadcast; the only Exchange in the plan belongs to the
    final aggregation, not the joins."""
    df = get("q_join_broadcast").fn(spark, SF)
    assert_plan(df, contains=("BroadcastHashJoin",))
    from telescope_data_pipeline_spark.plans.audit import physical_plan

    plan = physical_plan(df)
    # hashpartitioning exchanges: exactly the one feeding the groupBy.
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 1, f"fact table shuffled for a dim join:\n{plan}"


def test_sigclip_single_shuffle(spark):
    """The unrolled 3-iteration clip must reuse one hash partitioning —
    every window iteration sees its requirement already satisfied."""
    from telescope_data_pipeline_spark.operators.sigma_clip import sigma_clip
    from telescope_data_pipeline_spark.plans.audit import physical_plan
    from telescope_data_pipeline_spark.sources import load_table

    kept = sigma_clip(load_table(spark, SF, "events"), ["event_type"], "value")
    plan = physical_plan(kept)
    assert plan.count("Exchange hashpartitioning") == 1, plan
