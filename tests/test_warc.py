"""WARC source/sink: codec round-trip goldens (plain + per-record
gzip, the Common Crawl layout), HTTP envelope promotion, whole-file
corrupt drop, and the streaming reader's exactly-once discovery across
restarts — the same contract suite as the FITS DataSource."""

from __future__ import annotations

import tempfile
from datetime import datetime

from telescope_data_pipeline_spark.sources.warc import (
    parse_warc_bytes,
    register_warc_datasource,
    write_warc_bytes,
)


def _records(start: int = 0, n: int = 4) -> list[dict]:
    out = []
    for i in range(start, start + n):
        out.append({
            "record_id": f"<urn:uuid:rec-{i:04d}>",
            "warc_type": "response",
            "target_uri": f"http://example.org/page/{i}",
            "warc_date": f"2024-02-{(i % 27) + 1:02d}T12:00:00Z",
            "http_status": 200 if i % 3 else 404,
            "http_content_type": "text/html; charset=utf-8",
            "body": f"<html>doc {i} é 中文</html>".encode(),
        })
    return out


def _write(d: str, name: str, recs: list[dict], gz: bool) -> None:
    with open(f"{d}/{name}", "wb") as f:
        f.write(write_warc_bytes(recs, gzip_per_record=gz))


def test_warc_codec_roundtrip_plain_and_gzip_identical():
    recs = _records() + [{
        "record_id": "<urn:uuid:meta-1>",
        "warc_type": "warcinfo",
        "content_type": "application/warc-fields",
        "body": b"software: telescope-data-pipeline-spark\r\n",
    }]
    plain = parse_warc_bytes(write_warc_bytes(recs, False), "p.warc")
    gzipped = parse_warc_bytes(write_warc_bytes(recs, True), "g.warc.gz")
    assert len(plain) == len(gzipped) == 5
    for a, b in zip(plain, gzipped):
        assert a[1:] == b[1:]  # identical except filename
    # HTTP envelope promoted on responses; raw block on warcinfo
    r0 = plain[0]
    assert r0[2] == "response" and r0[7] == 404
    assert r0[8] == "text/html; charset=utf-8"
    assert r0[9] == "<html>doc 0 é 中文</html>".encode()
    assert r0[4] == datetime(2024, 2, 1, 12, 0, 0)
    meta = plain[4]
    assert meta[2] == "warcinfo" and meta[7] is None
    assert meta[9] == b"software: telescope-data-pipeline-spark\r\n"
    # the gzip form really is multi-member (one member per record)
    blob = write_warc_bytes(recs, True)
    assert blob.count(b"\x1f\x8b\x08") >= 5


def test_warc_truncated_and_garbage_raise():
    import pytest

    good = write_warc_bytes(_records(n=2), False)
    with pytest.raises(ValueError):
        parse_warc_bytes(good[:-40], "t.warc")  # truncated block
    with pytest.raises(ValueError):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n", "x.warc")


def test_warc_datasource_batch_reads_mixed_dir(spark):
    d = tempfile.mkdtemp(prefix="warcds_")
    _write(d, "part-00000.warc", _records(0, 3), gz=False)
    _write(d, "part-00001.warc.gz", _records(3, 2), gz=True)
    with open(f"{d}/part-00002.warc", "wb") as f:
        f.write(b"garbage, not a warc record at all")
    register_warc_datasource(spark)
    df = spark.read.format("warc").load(d)
    rows = df.toPandas().sort_values("record_id").reset_index(drop=True)
    # corrupt file dropped whole (never fatal); 3 + 2 good records
    assert len(rows) == 5
    assert list(rows["record_id"]) == [
        f"<urn:uuid:rec-{i:04d}>" for i in range(5)]
    assert set(rows["http_status"]) == {200, 404}
    assert all(rows["content_length"] > 0)
    # one input partition per file: gzip members cannot split
    assert df.rdd.getNumPartitions() == 3


def test_warc_datasource_stream_exactly_once(spark):
    d = tempfile.mkdtemp(prefix="warcds_stream_")
    _write(d, "part-00000.warc", _records(0, 2), gz=False)
    _write(d, "part-00001.warc.gz", _records(2, 2), gz=True)
    register_warc_datasource(spark)
    ckpt = tempfile.mkdtemp(prefix="warcds_ckpt_")
    out = tempfile.mkdtemp(prefix="warcds_out_")

    def drain() -> None:
        q = (spark.readStream.format("warc").load(d)
             .select("filename", "record_id", "http_status")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)

    drain()
    assert spark.read.parquet(out).count() == 4
    _write(d, "part-00002.warc", _records(4, 3), gz=False)
    drain()
    rows = spark.read.parquet(out).toPandas()
    assert len(rows) == 7
    assert rows["record_id"].is_unique  # exactly once, no replay dupes


def test_warc_codec_edge_cases():
    """Adversarial edges: zero-length body, envelope without a body
    separator (raw block kept), malformed WARC-Date (None, record
    survives), non-numeric HTTP status token (None), bad gzip magic
    (OSError -> whole-file drop path)."""
    import pytest

    r = parse_warc_bytes(write_warc_bytes(
        [{"record_id": "<a>", "warc_type": "resource", "body": b""}]), "z")
    assert len(r) == 1 and r[0][9] == b"" and r[0][6] == 0

    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Type: application/http\r\n"
           b"Content-Length: 15\r\n\r\nHTTP/1.1 200 OK\r\n\r\n")
    r = parse_warc_bytes(raw, "x")
    assert r[0][7] is None and r[0][9] == b"HTTP/1.1 200 OK"

    raw2 = write_warc_bytes([{"record_id": "<b>", "warc_type": "resource",
                              "warc_date": "not-a-date", "body": b"x"}])
    r = parse_warc_bytes(raw2, "d")
    assert r[0][4] is None and r[0][9] == b"x"

    raw3 = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Type: application/http\r\n"
            b"Content-Length: 21\r\n\r\nHTTP/1.1 ABC OK\r\n\r\nxy\r\n\r\n")
    assert parse_warc_bytes(raw3, "s")[0][7] is None

    with pytest.raises(OSError):
        parse_warc_bytes(b"\x1f\x8b" + b"junkjunk", "g")


def test_warc_parser_fuzz_never_hangs_or_crashes():
    """Property fuzz: arbitrary bytes either parse to records or raise
    ValueError/OSError — never hang, never raise anything else (the
    whole-file-drop contract depends on the exception surface), and a
    VALID prefix followed by garbage raises rather than silently
    truncating."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.binary(max_size=400))
    @settings(max_examples=300, deadline=None)
    def fuzz(data):
        try:
            out = parse_warc_bytes(data, "f")
            assert isinstance(out, list)
        except (ValueError, OSError):
            pass

    fuzz()

    @given(st.binary(min_size=1, max_size=60))
    @settings(max_examples=100, deadline=None)
    def fuzz_tail(tail):
        good = write_warc_bytes(_records(n=1), False)
        try:
            out = parse_warc_bytes(good + b"X" + tail, "t")
            # parse may only succeed if the tail happens to be a
            # record boundary continuation — it must NEVER drop the
            # valid first record silently
            assert len(out) >= 1
        except (ValueError, OSError):
            pass

    fuzz_tail()
