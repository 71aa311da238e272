"""ZIP / TAR archives as a first-class Spark data source.

Bulk document drops arrive as archives at least as often as they arrive
as parquet: arXiv source dumps (``.tar.gz`` of per-paper directories),
Project Gutenberg mirrors (``.zip`` per book), enterprise data handoffs
(zip-of-CSVs), scraped-site exports. This module gives the engine:

- ``parse_archive_bytes`` — a pure-stdlib (zipfile/tarfile) member
  decoder producing ARCHIVE_MEMBER tuples, with a per-member
  decompressed-size cap enforced BEFORE the read (zip bombs are the
  decode-bomb problem of multimodal.py in archive form: a 42 KB zip
  can claim petabytes);
- ``write_zip_bytes`` — the deterministic export twin (fixed member
  order and timestamps, so shard bytes are reproducible);
- a registered Spark 4 Python DataSource::

      register_archive_datasource(spark)
      spark.read.format("archive").load("/drop/dir")        # batch
      spark.readStream.format("archive").load("/drop/dir")  # stream

  with ONE input partition per archive file (central directories and
  tar streams do not split; the file is the parallelism unit), and the
  same sorted-filename streaming-offset contract as the WARC and FITS
  sources (warc.py, fits_datasource.py): offsets are the highest
  filename read, replay is exact, late out-of-order names are warned
  about within a driver lifetime.

Failure-path rule (SURVEY.md §7 #6): an undecodable FILE is dropped
(production: quarantined), never fatal — the whole-file drop contract.
A single member whose claimed decompressed size exceeds the cap, or
whose stored bytes are encrypted/corrupt, also drops the whole file:
a tampered member means the archive is bad, the WARC shard rule.

Reference parity: the reference pipeline ingests a directory drop of
FITS files (telescope-data-pipeline p_io.py:19-40); archives are the
same drop pattern with an envelope around it.
"""

from __future__ import annotations

import io
import lzma
import os
import struct
import tarfile
import zipfile
import zlib
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
    "ARCHIVE_MEMBER",
    "ArchiveDataSource",
    "parse_archive_bytes",
    "register_archive_datasource",
    "write_zip_bytes",
]

ARCHIVE_MEMBER = T.StructType([
    T.StructField("filename", T.StringType()),   # archive file name
    T.StructField("member", T.StringType()),     # path inside the archive
    T.StructField("fmt", T.StringType()),        # 'zip' | 'tar'
    T.StructField("size", T.LongType()),         # decompressed bytes
    T.StructField("mtime", T.TimestampType()),   # member timestamp (UTC)
    T.StructField("payload", T.BinaryType()),
])

#: Default per-member decompressed-size cap (option "max_member_bytes").
_MAX_MEMBER_BYTES = 64 * 1024 * 1024

_EXTS = (".zip", ".tar", ".tar.gz", ".tgz", ".tar.bz2", ".tar.xz")


def parse_archive_bytes(data: bytes, filename: str = "",
                        max_member_bytes: int = _MAX_MEMBER_BYTES,
                        ) -> list[tuple]:
    """Decode one archive into ARCHIVE_MEMBER tuples (directories
    skipped). Raises ValueError on anything malformed, encrypted, or
    over the member cap — callers apply the whole-file-drop rule."""
    # stdlib zipfile/tarfile raise a ZOO of exception types on
    # adversarial bytes (hypothesis-found: zlib.error from mutated
    # deflate streams, struct.error and IndexError from truncated
    # headers/extra fields, LZMAError from xz, UnicodeError from
    # filename decoding, OverflowError from absurd header ints) — the
    # whole-file-drop contract normalizes every one to ValueError.
    _DROP = (ValueError, RuntimeError, NotImplementedError, OSError,
             EOFError, IndexError, KeyError, OverflowError, UnicodeError,
             zlib.error, struct.error, lzma.LZMAError,
             zipfile.BadZipFile, tarfile.TarError)
    if data[:4] == b"PK\x03\x04" or data[:4] == b"PK\x05\x06":
        try:
            return _parse_zip(data, filename, max_member_bytes)
        except _DROP as e:
            raise ValueError(f"undecodable zip: {e}") from e
    try:
        return _parse_tar(data, filename, max_member_bytes)
    except _DROP as e:
        raise ValueError(f"not a readable archive: {e}") from e


def _utc_naive(epoch: float) -> datetime:
    return datetime.fromtimestamp(float(epoch), tz=timezone.utc) \
        .replace(tzinfo=None)


def _zip_dt(dt: tuple) -> datetime:
    """DOS date_time -> datetime; writers that zero the date field are
    legal (the DOS epoch), so an unrepresentable tuple falls back to
    1980-01-01 instead of dropping the whole file."""
    try:
        return datetime(*dt)
    except ValueError:
        return datetime(1980, 1, 1)


def _parse_zip(data: bytes, filename: str, cap: int) -> list[tuple]:
    out: list[tuple] = []
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        for info in z.infolist():
            if info.is_dir():
                continue
            if info.file_size > cap:
                raise ValueError(
                    f"zip member {info.filename!r} claims "
                    f"{info.file_size} bytes, over the {cap}-byte cap")
            with z.open(info) as f:
                # ZipExtFile truncates at the header-declared size we
                # just capped, and raises BadZipFile on a CRC/length
                # mismatch — no post-read re-check is reachable
                payload = f.read()
            out.append((filename, info.filename, "zip", len(payload),
                        _zip_dt(info.date_time), payload))
    return out


def _parse_tar(data: bytes, filename: str, cap: int) -> list[tuple]:
    out: list[tuple] = []
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as t:
        for info in t:
            if not info.isfile():
                continue
            if info.size > cap:
                raise ValueError(
                    f"tar member {info.name!r} claims {info.size} "
                    f"bytes, over the {cap}-byte cap")
            # extractfile is bounded by the header size we just capped
            f = t.extractfile(info)
            payload = f.read() if f is not None else b""
            out.append((filename, info.name, "tar", len(payload),
                        _utc_naive(info.mtime), payload))
    return out


def write_zip_bytes(members: list[tuple[str, bytes]],
                    date_time: tuple = (2024, 1, 1, 0, 0, 0)) -> bytes:
    """Deterministic zip writer (the export twin): fixed member
    timestamps and insertion order, deflate compression — the same
    input always produces the same shard bytes, the property every
    export sink here guarantees (sinks.py)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, payload in members:
            info = zipfile.ZipInfo(name, date_time=date_time)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, payload)
    return buf.getvalue()


def _list_archives(path: str) -> list[str]:
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return []
    return sorted(n for n in names if n.endswith(_EXTS))


def _decode_file(path: str, filename: str, cap: int) -> list[tuple]:
    """All member rows of one archive, or [] for an undecodable file
    (whole-file drop, never fatal)."""
    try:
        with open(os.path.join(path, filename), "rb") as f:
            return parse_archive_bytes(f.read(), filename,
                                       max_member_bytes=cap)
    except (ValueError, OSError):
        return []


def _cap_from(options) -> int:
    try:
        return int(options.get("max_member_bytes", _MAX_MEMBER_BYTES))
    except (TypeError, ValueError):
        return _MAX_MEMBER_BYTES


class _ArchiveBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        self.cap = _cap_from(options)
        if not self.path:
            raise ValueError("archive source requires a path: "
                             ".format('archive').load('/dir')")

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per FILE: central directories / tar streams
        # cannot split; executors take whole archives
        return [InputPartition(n) for n in _list_archives(self.path)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from _decode_file(self.path, partition.value, self.cap)


class _ArchiveStreamReader(SimpleDataSourceStreamReader):
    """Sorted-filename offsets — the warc.py / fits_datasource.py
    contract (exact replay; late out-of-order names warned about
    within a driver lifetime, then skipped)."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        self.cap = _cap_from(options)
        if not self.path:
            raise ValueError("archive source requires a path: "
                             ".format('archive').load('/dir')")
        self._seen: set[str] | None = None

    def initialOffset(self) -> dict:
        return {"upto": ""}

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        listing = _list_archives(self.path)
        if self._seen is not None:
            late = [n for n in listing
                    if n <= start["upto"] and n not in self._seen]
            if late:
                import warnings
                warnings.warn(
                    "archive stream: %d file(s) arrived with names at "
                    "or before the current offset %r and will NOT be "
                    "read (sorted-name contract): %s"
                    % (len(late), start["upto"], ", ".join(late[:5])),
                    stacklevel=2)
        self._seen = set(listing)
        names = [n for n in listing if n > start["upto"]]
        end = {"upto": names[-1]} if names else dict(start)
        return self._rows(names), end  # a LIST — offsets pickle rows

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        names = [n for n in _list_archives(self.path)
                 if start["upto"] < n <= end["upto"]]
        return self._rows(names)

    def _rows(self, names: list[str]) -> list[tuple]:
        out: list[tuple] = []
        for n in names:
            out.extend(_decode_file(self.path, n, self.cap))
        return out


class ArchiveDataSource(DataSource):
    """``spark.read.format("archive")`` — batch and streaming."""

    @classmethod
    def name(cls) -> str:
        return "archive"

    def schema(self):
        return ARCHIVE_MEMBER

    def reader(self, schema) -> _ArchiveBatchReader:
        return _ArchiveBatchReader(self.options)

    def simpleStreamReader(self, schema) -> _ArchiveStreamReader:
        return _ArchiveStreamReader(self.options)


def register_archive_datasource(spark) -> None:
    spark.dataSource.register(ArchiveDataSource)
