"""Python DataSource API (Spark 4) FITS source: batch rows equal the
binaryFile+mapInPandas scan, corrupt files drop, and the streaming
reader discovers new files exactly once across restarts."""

from __future__ import annotations

import tempfile

import numpy as np

from telescope_data_pipeline_spark.sources.fits import (
    scan_fits_dir,
    write_fake_fits,
)
from telescope_data_pipeline_spark.sources.fits_datasource import (
    register_fits_datasource,
)


def _make_dir(n: int, start: int = 0) -> str:
    d = tempfile.mkdtemp(prefix="fitsds_")
    _add_files(d, n, start)
    return d


def _add_files(d: str, n: int, start: int) -> None:
    rng = np.random.default_rng(100 + start)
    for i in range(start, start + n):
        px = rng.normal(50, 5, size=(8, 10)).astype(np.float32)
        write_fake_fits(
            f"{d}/part-{i:05d}.fits", px,
            {"FILTER": "r", "AIRMASS": f"{1.1 + i / 10:.2f}",
             "DATE-OBS": f"2024-01-{(i % 27) + 1:02d}T00:00:00",
             "EXPTIME": "30.0", "SITEID": "obs1"})


def test_fits_datasource_batch_matches_scan(spark):
    d = _make_dir(6)
    register_fits_datasource(spark)
    got = (spark.read.format("fits").load(d)
           .toPandas().sort_values("filename").reset_index(drop=True))
    want = (scan_fits_dir(spark, d)
            .toPandas().sort_values("filename").reset_index(drop=True))
    assert list(got["filename"]) == list(want["filename"])
    for col in ("epoch_id", "band", "width", "height", "airmass",
                "exptime", "site_id"):
        assert list(got[col]) == list(want[col]), col
    for a, b in zip(got["pixels"], want["pixels"]):
        assert np.allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(got["header"], want["header"]):
        assert dict(a) == dict(b)
    # one input partition per file: the image is the parallelism unit
    assert (spark.read.format("fits").load(d)
            .rdd.getNumPartitions() == 6)


def test_fits_datasource_drops_corrupt_file(spark):
    d = _make_dir(3)
    with open(f"{d}/part-zzzzz.fits", "wb") as f:
        f.write(b"garbage that is neither FITS nor the fake container")
    register_fits_datasource(spark)
    got = spark.read.format("fits").load(d)
    assert got.count() == 3  # dropped, never fatal


def test_fits_datasource_stream_exactly_once(spark):
    """New files (sorted-name contract) are discovered across separate
    availableNow runs sharing a checkpoint; offsets replay exactly —
    no duplicates, no gaps."""
    d = _make_dir(3)
    register_fits_datasource(spark)
    ckpt = tempfile.mkdtemp(prefix="fitsds_ckpt_")
    out = tempfile.mkdtemp(prefix="fitsds_out_")

    def drain() -> None:
        q = (spark.readStream.format("fits").load(d)
             .select("filename", "width", "height", "airmass")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)

    drain()
    first = spark.read.parquet(out)
    assert first.count() == 3

    _add_files(d, 2, start=3)  # names sort after the first batch
    drain()
    rows = spark.read.parquet(out).toPandas()
    assert len(rows) == 5
    assert rows["filename"].is_unique  # exactly once
    assert sorted(rows["filename"]) == [
        f"part-{i:05d}.fits" for i in range(5)]


def test_fits_stream_reader_warns_on_late_out_of_order_arrival():
    """A file arriving with a name at or before the current offset can
    never be read under the sorted-name contract; the reader must warn
    loudly instead of losing it mutely (round-11 ADVICE item 1). The
    warning is best-effort within one driver lifetime: the first read
    after construction has no baseline and must NOT warn."""
    import warnings

    from telescope_data_pipeline_spark.sources.fits_datasource import (
        _FitsStreamReader,
    )

    d = _make_dir(0)
    _add_files(d, 2, start=5)  # part-00005, part-00006
    reader = _FitsStreamReader({"path": d})
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # first read: baseline, no warn
        rows, off = reader.read(reader.initialOffset())
    assert len(rows) == 2 and off == {"upto": "part-00006.fits"}

    _add_files(d, 1, start=1)  # part-00001 sorts BEFORE the offset
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rows, off2 = reader.read(off)
    assert rows == [] and off2 == off  # contract: never read
    assert any("part-00001.fits" in str(w.message) for w in caught)

    # already-warned file must not re-warn (it is in the seen baseline)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rows, _ = reader.read(off2)
    assert rows == []


def test_fits_datasource_drops_file_with_malformed_header_value():
    """A structurally-decodable FITS whose AIRMASS does not parse as a
    float is dropped like any undecodable file, never fatal (round-11
    ADVICE item 2: coercion must sit inside the try)."""
    from telescope_data_pipeline_spark.sources.fits_datasource import (
        _decode_file,
    )

    d = _make_dir(1)
    rng = np.random.default_rng(7)
    write_fake_fits(
        f"{d}/part-bad00.fits",
        rng.normal(50, 5, size=(8, 10)).astype(np.float32),
        {"FILTER": "r", "AIRMASS": "not-a-number",
         "DATE-OBS": "2024-01-01T00:00:00", "EXPTIME": "30.0"})
    assert _decode_file(d, "part-bad00.fits") is None
    assert _decode_file(d, "part-00000.fits") is not None
