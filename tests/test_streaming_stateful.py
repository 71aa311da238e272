"""applyInPandasWithState: running per-key moments across micro-batches
equal the single-pass batch statistics (merge-order invariance)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from telescope_data_pipeline_spark.sources import load_table
from telescope_data_pipeline_spark.streaming.jobs import read_event_stream
from telescope_data_pipeline_spark.streaming.stateful import running_stats

SF = "/root/testdata/sf0.001"


def test_running_stats_converge_to_batch(spark):
    d = tempfile.mkdtemp(prefix="state_")
    load_table(spark, SF, "events").repartition(8).write.mode("overwrite").parquet(d)
    stream = read_event_stream(spark, d, max_files_per_trigger=2)  # ≥4 batches
    q = (running_stats(stream)
         .writeStream.format("memory").queryName("rs").outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 3  # state really crossed batches

    # latest emitted row per key == batch-mode ground truth
    latest = spark.sql("""
        SELECT user_id, count, mean, std FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY count DESC) rn
          FROM rs) WHERE rn = 1
    """).toPandas().set_index("user_id")
    want = (spark.read.parquet(d).groupBy("user_id")
            .agg(F.count("value").alias("count"), F.avg("value").alias("mean"),
                 F.stddev_samp("value").alias("std"))
            ).toPandas().set_index("user_id")
    assert set(latest.index) == set(want.index)
    for uid in want.index:
        assert latest.loc[uid, "count"] == want.loc[uid, "count"]
        assert abs(latest.loc[uid, "mean"] - want.loc[uid, "mean"]) < 1e-9
        assert abs(latest.loc[uid, "std"] - want.loc[uid, "std"]) < 1e-9
