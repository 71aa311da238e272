"""ZIP/TAR archive source: codec goldens, bomb caps, whole-file drop,
partition-per-file batch reads, exactly-once streaming restart, fuzz."""

from __future__ import annotations

import io
import os
import tarfile
import tempfile
import zipfile

import pytest

from telescope_data_pipeline_spark.sources.archive import (
    parse_archive_bytes,
    register_archive_datasource,
    write_zip_bytes,
)


def _tar_gz_bytes(members, mtime=1704067200) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as t:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            info.mtime = mtime
            t.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def test_zip_roundtrip_and_determinism():
    members = [("a/x.txt", b"hello"), ("b.bin", bytes(range(64)))]
    blob = write_zip_bytes(members)
    assert blob == write_zip_bytes(members)  # byte-stable export
    rows = parse_archive_bytes(blob, "f.zip")
    assert [(r[1], r[5]) for r in rows] == members
    assert all(r[2] == "zip" and r[0] == "f.zip" for r in rows)
    assert [r[3] for r in rows] == [5, 64]
    assert all(str(r[4]) == "2024-01-01 00:00:00" for r in rows)


def test_tar_roundtrip_all_compressions():
    members = [("doc-1.txt", b"alpha"), ("d/doc-2.txt", b"beta" * 10)]
    for mode, ext in (("w", ".tar"), ("w:gz", ".tar.gz"),
                      ("w:bz2", ".tar.bz2"), ("w:xz", ".tar.xz")):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode=mode) as t:
            for name, payload in members:
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                info.mtime = 1704067200
                t.addfile(info, io.BytesIO(payload))
        rows = parse_archive_bytes(buf.getvalue(), "f" + ext)
        assert [(r[1], r[5]) for r in rows] == members
        assert all(r[2] == "tar" for r in rows)
        assert all(str(r[4]) == "2024-01-01 00:00:00" for r in rows)


def test_directories_skipped_and_garbage_raises():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("dir/", b"")
        z.writestr("dir/file.txt", b"content")
    rows = parse_archive_bytes(buf.getvalue(), "z")
    assert [r[1] for r in rows] == ["dir/file.txt"]
    with pytest.raises(ValueError):
        parse_archive_bytes(b"not an archive at all", "g")
    with pytest.raises(ValueError):
        parse_archive_bytes(b"PK\x03\x04" + b"\x00" * 40, "g.zip")


def test_member_cap_blocks_zip_bomb():
    """A member CLAIMING more than the cap is rejected BEFORE any
    allocation (stdlib readers then bound the actual read at that
    declared size, and flag CRC/length mismatches as BadZipFile); a
    compliant member under the cap decodes normally."""
    big = write_zip_bytes([("big.bin", b"\x00" * 4096)])
    with pytest.raises(ValueError):
        parse_archive_bytes(big, "b.zip", max_member_bytes=1024)
    rows = parse_archive_bytes(big, "b.zip", max_member_bytes=8192)
    assert rows[0][3] == 4096
    tar_big = _tar_gz_bytes([("big.bin", b"\x00" * 4096)])
    with pytest.raises(ValueError):
        parse_archive_bytes(tar_big, "b.tgz", max_member_bytes=1024)


def test_encrypted_zip_member_drops_whole_file():
    # a stored entry flagged encrypted (bit 0 of the GP flags): zipfile
    # raises RuntimeError on read -> ValueError per the drop contract.
    # zipfile reads flags from the CENTRAL directory entry, so patch it
    # there (offset +8 past the PK\x01\x02 signature).
    blob = bytearray(write_zip_bytes([("x.txt", b"secret")]))
    cd = blob.find(b"PK\x01\x02")
    assert cd > 0
    blob[cd + 8] |= 1
    with pytest.raises(ValueError):
        parse_archive_bytes(bytes(blob), "enc.zip")


def test_archive_datasource_batch_mixed_dir(spark):
    d = tempfile.mkdtemp(prefix="archds_")
    with open(f"{d}/a-docs.zip", "wb") as f:
        f.write(write_zip_bytes([("m1.txt", b"one"), ("m2.txt", b"two")]))
    with open(f"{d}/b-docs.tar.gz", "wb") as f:
        f.write(_tar_gz_bytes([("m3.txt", b"three")]))
    with open(f"{d}/c-broken.zip", "wb") as f:
        f.write(b"PK\x03\x04 nope")
    register_archive_datasource(spark)
    df = spark.read.format("archive").load(d)
    rows = df.toPandas().sort_values("member").reset_index(drop=True)
    # corrupt archive dropped whole (never fatal); 2 + 1 good members
    assert list(rows["member"]) == ["m1.txt", "m2.txt", "m3.txt"]
    assert list(rows["fmt"]) == ["zip", "zip", "tar"]
    assert [bytes(p) for p in rows["payload"]] == [b"one", b"two", b"three"]
    # one input partition per archive: central dirs / tars cannot split
    assert df.rdd.getNumPartitions() == 3


def test_archive_datasource_stream_exactly_once(spark):
    d = tempfile.mkdtemp(prefix="archds_stream_")
    with open(f"{d}/part-0.zip", "wb") as f:
        f.write(write_zip_bytes([("a.txt", b"a"), ("b.txt", b"b")]))
    register_archive_datasource(spark)
    ckpt = tempfile.mkdtemp(prefix="archds_ckpt_")
    out = tempfile.mkdtemp(prefix="archds_out_")

    def drain() -> None:
        q = (spark.readStream.format("archive").load(d)
             .select("filename", "member", "size")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)

    drain()
    assert spark.read.parquet(out).count() == 2
    with open(f"{d}/part-1.tar.gz", "wb") as f:
        f.write(_tar_gz_bytes([("c.txt", b"c")]))
    drain()
    rows = spark.read.parquet(out).toPandas()
    assert len(rows) == 3
    assert rows["member"].is_unique  # exactly once, no replay dupes


def test_archive_parser_fuzz_never_hangs_or_crashes():
    """Arbitrary bytes and mutated valid archives either parse or raise
    ValueError — never hang, never leak another exception type (the
    whole-file-drop contract depends on the exception surface)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    blobs = [
        write_zip_bytes([("x.txt", b"payload"), ("y.txt", b"q" * 50)]),
        _tar_gz_bytes([("x.txt", b"payload")]),
    ]

    @given(st.integers(0, 1), st.integers(0, 4095), st.integers(0, 255))
    @settings(max_examples=300, deadline=None)
    def fuzz_mutate(which, pos, val):
        blob = bytearray(blobs[which])
        blob[pos % len(blob)] = val
        try:
            out = parse_archive_bytes(bytes(blob), "f")
            assert isinstance(out, list)
        except ValueError:
            pass

    fuzz_mutate()

    @given(st.binary(max_size=300))
    @settings(max_examples=300, deadline=None)
    def fuzz_raw(data):
        for prefix in (b"", b"PK\x03\x04", b"\x1f\x8b"):
            try:
                out = parse_archive_bytes(prefix + data, "f")
                assert isinstance(out, list)
            except ValueError:
                pass

    fuzz_raw()
