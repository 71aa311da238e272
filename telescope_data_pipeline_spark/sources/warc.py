"""WARC (Web ARChive, ISO 28500) as a first-class Spark data source.

WARC is THE bulk web-crawl interchange format (Common Crawl publishes
its entire corpus as ``.warc.gz``), which makes it the canonical 100 TB
ingestion source for an LLM training-data pipeline. This module gives
the engine:

- ``parse_warc_bytes`` / ``write_warc_bytes`` — a pure-Python,
  spec-derived record codec (plain and per-record-gzip members, the
  Common Crawl layout; stdlib ``gzip`` transparently concatenates
  members);
- a registered Spark 4 Python DataSource::

      register_warc_datasource(spark)
      spark.read.format("warc").load("/crawl/segment")        # batch
      spark.readStream.format("warc").load("/crawl/segment")  # stream

  with ONE input partition per file — a gzip member stream cannot be
  split, so the file is the parallelism unit, exactly how Common Crawl
  shards are consumed (a segment directory holds ~thousands of ~1 GB
  files; executors take whole files);
- the same sorted-filename streaming-offset contract as the FITS
  source (fits_datasource.py): offsets are the highest filename read,
  replay is exact, late out-of-order names are warned about within a
  driver lifetime.

``http_status`` / ``http_content_type`` / ``payload`` are promoted
from the HTTP envelope of ``response`` records (the part an extraction
pipeline actually wants); non-HTTP records carry their raw block.

Failure-path rule (SURVEY.md §7 #6): an undecodable FILE is dropped
(production: quarantined), never fatal — the whole-file drop contract,
matching the FITS source. Record-level resync is deliberately not
attempted: a truncated member in a crawl shard means the shard is bad.
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator, Sequence
from datetime import datetime, timezone

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

__all__ = [
    "WARC_RECORD",
    "WarcDataSource",
    "parse_warc_bytes",
    "register_warc_datasource",
    "write_warc_bytes",
]

WARC_RECORD = T.StructType([
    T.StructField("filename", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.TimestampType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("http_content_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])

_CRLF = b"\r\n"


def _parse_date(s: str | None):
    if not s:
        return None
    try:
        d = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    if d.tzinfo is not None:  # store naive UTC (session tz independent)
        d = d.astimezone(timezone.utc).replace(tzinfo=None)
    return d


def parse_warc_bytes(data: bytes, filename: str = "") -> list[tuple]:
    """Parse one WARC file (plain or gzip, incl. concatenated members)
    into WARC_RECORD tuples. Raises ValueError on malformed input —
    callers apply the whole-file-drop rule."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # multi-member per RFC 1952
    out: list[tuple] = []
    pos = 0
    n = len(data)
    while pos < n:
        while data[pos:pos + 2] == _CRLF:  # inter-record blank lines
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC/ version line at {pos}")
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header")
        lines = data[pos:hdr_end].split(_CRLF)
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/invalid Content-Length") from None
        body_start = hdr_end + 4
        if body_start + length > n:
            raise ValueError("truncated record block")
        block = data[body_start:body_start + length]
        pos = body_start + length

        warc_type = headers.get("warc-type")
        content_type = headers.get("content-type")
        http_status = http_ct = None
        payload = block
        if (warc_type == "response" and content_type
                and content_type.startswith("application/http")):
            sep = block.find(_CRLF + _CRLF)
            if sep >= 0:
                head = block[:sep].split(_CRLF)
                status_parts = head[0].decode("utf-8", "replace").split()
                if len(status_parts) >= 2 and status_parts[1].isdigit():
                    http_status = int(status_parts[1])
                for line in head[1:]:
                    k, _, v = line.decode("utf-8", "replace").partition(":")
                    if k.strip().lower() == "content-type":
                        http_ct = v.strip()
                payload = block[sep + 4:]
        out.append((
            filename,
            headers.get("warc-record-id"),
            warc_type,
            headers.get("warc-target-uri"),
            _parse_date(headers.get("warc-date")),
            content_type,
            length,
            http_status,
            http_ct,
            payload,
        ))
    return out


def write_warc_bytes(records: list[dict], gzip_per_record: bool = False,
                     ) -> bytes:
    """Serialize records to WARC bytes — the export SINK (corpus ->
    crawl-interchange format) and the test fixture generator. Each
    record dict: ``record_id``, ``warc_type`` ('response' builds an
    HTTP envelope from ``http_status``/``http_content_type``),
    ``target_uri``, ``warc_date`` (ISO string), ``body`` (bytes).
    ``gzip_per_record=True`` writes one gzip member per record — the
    Common Crawl layout that keeps records individually seekable."""
    out = io.BytesIO()
    for r in records:
        body = r.get("body", b"")
        if r.get("warc_type") == "response":
            status = int(r.get("http_status", 200))
            ct = r.get("http_content_type", "text/html")
            envelope = (f"HTTP/1.1 {status} OK\r\n"
                        f"Content-Type: {ct}\r\n"
                        f"Content-Length: {len(body)}\r\n\r\n"
                        ).encode() + body
            block, rec_ct = envelope, "application/http; msgtype=response"
        else:
            block, rec_ct = body, r.get("content_type", "text/plain")
        head = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {r.get('warc_type', 'resource')}\r\n".encode()
            + f"WARC-Record-ID: {r.get('record_id', '')}\r\n".encode()
            + (f"WARC-Target-URI: {r['target_uri']}\r\n".encode()
               if r.get("target_uri") else b"")
            + (f"WARC-Date: {r['warc_date']}\r\n".encode()
               if r.get("warc_date") else b"")
            + f"Content-Type: {rec_ct}\r\n".encode()
            + f"Content-Length: {len(block)}\r\n\r\n".encode()
        )
        member = head + block + _CRLF + _CRLF
        out.write(gzip.compress(member, mtime=0) if gzip_per_record
                  else member)
    return out.getvalue()


def _list_warc(path: str) -> list[str]:
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    return sorted(n for n in names
                  if n.endswith(".warc") or n.endswith(".warc.gz"))


def _decode_file(path: str, filename: str) -> list[tuple]:
    """All rows of one file, or [] for an undecodable file (whole-file
    drop, never fatal)."""
    try:
        with open(os.path.join(path, filename), "rb") as f:
            return parse_warc_bytes(f.read(), filename)
    except (ValueError, OSError):
        return []


class _WarcBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path: "
                             ".format('warc').load('/dir')")

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per FILE: a gzip member stream cannot split
        return [InputPartition(n) for n in _list_warc(self.path)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from _decode_file(self.path, partition.value)


class _WarcStreamReader(SimpleDataSourceStreamReader):
    """Sorted-filename offsets — the fits_datasource.py contract."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path: "
                             ".format('warc').load('/dir')")
        self._seen: set[str] | None = None

    def initialOffset(self) -> dict:
        return {"upto": ""}

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        listing = _list_warc(self.path)
        if self._seen is not None:
            late = [n for n in listing
                    if n <= start["upto"] and n not in self._seen]
            if late:
                import warnings
                warnings.warn(
                    "warc stream: %d file(s) arrived with names at or "
                    "before the current offset %r and will NOT be read "
                    "(sorted-name contract): %s"
                    % (len(late), start["upto"], ", ".join(late[:5])),
                    stacklevel=2)
        self._seen = set(listing)
        names = [n for n in listing if n > start["upto"]]
        end = {"upto": names[-1]} if names else dict(start)
        return self._rows(names), end  # a LIST — offsets pickle rows

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        names = [n for n in _list_warc(self.path)
                 if start["upto"] < n <= end["upto"]]
        return self._rows(names)

    def _rows(self, names: list[str]) -> list[tuple]:
        out: list[tuple] = []
        for n in names:
            out.extend(_decode_file(self.path, n))
        return out


class WarcDataSource(DataSource):
    """``spark.read.format("warc")`` — batch and streaming."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_RECORD

    def reader(self, schema) -> _WarcBatchReader:
        return _WarcBatchReader(self.options)

    def simpleStreamReader(self, schema) -> _WarcStreamReader:
        return _WarcStreamReader(self.options)


def register_warc_datasource(spark) -> None:
    spark.dataSource.register(WarcDataSource)
