"""Small-file compaction (operators/compaction.py): file-count math,
content preservation, snapshot-swap isolation."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from telescope_data_pipeline_spark.operators.compaction import (
    compact_dir,
    resolve_latest,
    write_sized,
)
from telescope_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def _files(path: str) -> list[str]:
    return [f for f in glob.glob(os.path.join(path, "*.parquet"))]


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "small")
    # simulate a streaming sink's droppings: 40 tiny files
    load_table(spark, SF, "events").repartition(40) \
        .write.parquet(src)
    assert len(_files(src)) == 40

    base = str(tmp_path / "compacted")
    snap = compact_dir(spark, src, base, target_bytes=1 << 40)  # one file
    assert len(_files(snap)) == 1
    assert resolve_latest(base) == snap

    before = spark.read.parquet(src)
    after = spark.read.parquet(snap)
    assert after.count() == before.count()
    a = before.agg(F.sum(F.hash("event_id", "value")).alias("h")).first()["h"]
    b = after.agg(F.sum(F.hash("event_id", "value")).alias("h")).first()["h"]
    assert a == b  # order-insensitive content equality


def test_compaction_snapshot_swap_keeps_old_readable(spark, tmp_path):
    src = str(tmp_path / "src")
    load_table(spark, SF, "region").repartition(4).write.parquet(src)
    base = str(tmp_path / "out")
    s0 = compact_dir(spark, src, base)
    old = spark.read.parquet(s0)
    n0 = old.count()
    s1 = compact_dir(spark, src, base)  # a second run: NEW snapshot dir
    assert s1 != s0 and resolve_latest(base) == s1
    assert old.count() == n0  # the old snapshot is untouched


def test_write_sized_file_count_math(spark, tmp_path):
    df = load_table(spark, SF, "events").repartition(32)
    out = str(tmp_path / "sized")
    n = write_sized(df, out, input_bytes=300, target_bytes=100)
    assert n == 3 and len(_files(out)) == 3
    tiny = write_sized(df.limit(5), str(tmp_path / "one"), input_bytes=10,
                       target_bytes=1 << 30)
    assert tiny == 1
