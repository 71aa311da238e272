"""Streaming materialized-view maintenance: parity with full
recompute, incremental growth, and replay idempotence."""

import os

from pyspark.sql import functions as F

from telescope_data_pipeline_spark.sources import load_table
from telescope_data_pipeline_spark.streaming.mv import (
    maintain_orders_mv,
    mv_update_batch,
    partial_agg,
    read_mv,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted((r["o_orderpriority"], r["yr"], r["n_orders"],
                   str(r["total"])) for r in df.collect())


def _write_chunks(spark, out_dir, n_chunks=3):
    """Split the toy orders table into n deterministic parquet files."""
    o = load_table(spark, SF, "orders")
    for i in range(n_chunks):
        (o.filter(F.col("o_orderkey") % n_chunks == i)
         .coalesce(1)
         .write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"chunk={i}")))
    return o


def test_mv_matches_full_recompute_and_grows_incrementally(spark, tmp_path):
    src = str(tmp_path / "orders_in")
    mv = str(tmp_path / "mv")
    cp = str(tmp_path / "cp")
    full = _write_chunks(spark, src, n_chunks=3)

    q = maintain_orders_mv(spark, src, mv, cp, max_files_per_trigger=1)
    q.awaitTermination(120)

    # one snapshot per micro-batch, each a superset merge of the last
    snaps = sorted(d for d in os.listdir(mv) if d.startswith("snap-"))
    assert len(snaps) == 3, snaps
    # final view == full recompute (exact DECIMAL: not approximately —
    # identically)
    assert _rows(read_mv(spark, mv)) == _rows(partial_agg(full))


def test_mv_restart_picks_up_new_files_only(spark, tmp_path):
    src = str(tmp_path / "orders_in")
    mv = str(tmp_path / "mv")
    cp = str(tmp_path / "cp")
    full = _write_chunks(spark, src, n_chunks=2)

    q = maintain_orders_mv(spark, src, mv, cp)
    q.awaitTermination(120)
    n_snaps_before = len(os.listdir(mv))

    # a late chunk arrives; restart from the SAME checkpoint
    late = full.filter(F.col("o_orderkey") % 1000 == 7)
    late.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "chunk=late"))
    q2 = maintain_orders_mv(spark, src, mv, cp)
    q2.awaitTermination(120)

    # exactly one new batch ran (old files not re-delivered), and the
    # view equals recompute over ALL delivered rows
    assert len(os.listdir(mv)) == n_snaps_before + 1
    expected = partial_agg(full.unionByName(late))
    assert _rows(read_mv(spark, mv)) == _rows(expected)


def test_mv_batch_replay_is_idempotent(spark, tmp_path):
    mv = str(tmp_path / "mv")
    o = load_table(spark, SF, "orders")
    b0 = o.filter(F.col("o_orderkey") % 2 == 0)
    b1 = o.filter(F.col("o_orderkey") % 2 == 1)

    mv_update_batch(spark, b0, 0, mv)
    mv_update_batch(spark, b1, 1, mv)
    after_once = _rows(read_mv(spark, mv))
    # crash-replay: batch 1 is delivered again — same id, same rows
    mv_update_batch(spark, b1, 1, mv)
    assert _rows(read_mv(spark, mv)) == after_once
    # and the replayed snapshot merged from snap-0, not from itself
    assert _rows(read_mv(spark, mv)) == _rows(partial_agg(o))
