"""FITS image source: binary-file scan + Arrow-batched decode.

Reference: ``import_images`` (core.py:18-50) opens each FITS file with
astropy and pulls HDU-1 pixels + header. Spark-first form: a
``binaryFile`` scan (path/length/bytes rows, splittable listing,
predicate pushdown on path/modificationTime) followed by a
``mapInPandas`` decode into schemas.IMAGE.

astropy is not in this container, so the byte-level FITS parse is
stubbed behind ``_decode_fits``; the stub understands the minimal
header-card + big-endian float payload layout written by
``write_fake_fits`` below, keeping the scan→decode→IMAGE plumbing fully
real and testable. Swapping in astropy changes only ``_decode_fits``.
"""

from __future__ import annotations

import io
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import IMAGE

_MAGIC = b"TDPS-FAKE-FITS-1"


def write_fake_fits(path: str, pixels: np.ndarray, header: dict[str, str]) -> None:
    """Minimal deterministic stand-in container: magic, header cards
    (key=value lines), then big-endian float32 pixels."""
    with open(path, "wb") as f:
        f.write(_MAGIC + b"\n")
        f.write(struct.pack(">II", *pixels.shape))
        cards = "\n".join(f"{k}={v}" for k, v in sorted(header.items()))
        card_bytes = cards.encode()
        f.write(struct.pack(">I", len(card_bytes)))
        f.write(card_bytes)
        f.write(pixels.astype(">f4").tobytes())


def _decode_fits(content: bytes) -> tuple[np.ndarray, dict[str, str]]:
    """STUB decoder (real deployment: astropy.io.fits.open)."""
    buf = io.BytesIO(content)
    if buf.readline().strip() != _MAGIC:
        raise ValueError("not a TDPS fake FITS file")
    h, w = struct.unpack(">II", buf.read(8))
    (card_len,) = struct.unpack(">I", buf.read(4))
    header = dict(line.split("=", 1)
                  for line in buf.read(card_len).decode().splitlines())
    pixels = np.frombuffer(buf.read(h * w * 4), dtype=">f4").reshape(h, w)
    return pixels, header


def scan_fits_dir(spark: SparkSession, path: str,
                  manifest: DataFrame | None = None) -> DataFrame:
    """binaryFile scan → decode → schemas.IMAGE rows.

    ``manifest`` (schemas.MANIFEST: filename → epoch_id, the reference's
    CSV at psf_phot.py:41) assigns grouping keys via a broadcast join on
    the basename; without it epoch_id = -1.
    """
    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.fits")
           .load(path)
           .select(F.element_at(F.split("path", "/"), -1).alias("filename"),
                   "content"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["filename"], pdf["content"]):
                try:
                    px, hdr = _decode_fits(bytes(content))
                except (ValueError, struct.error):
                    # Failure-path rule (SURVEY.md §7 #6): an undecodable
                    # file is dropped, never fatal — at 100 TB one corrupt
                    # object must not kill the job. (Production: route to
                    # a quarantine sink instead of dropping.)
                    continue
                rows.append({
                    "filename": fname, "epoch_id": -1,
                    "band": hdr.get("FILTER"),
                    "width": px.shape[1], "height": px.shape[0],
                    "pixels": px.astype(np.float32).ravel(),
                    "airmass": float(hdr["AIRMASS"]) if "AIRMASS" in hdr else None,
                    "date_obs": pd.to_datetime(hdr.get("DATE-OBS")),
                    "exptime": float(hdr["EXPTIME"]) if "EXPTIME" in hdr else None,
                    "site_id": hdr.get("SITEID"),
                    "header": hdr,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE.fields])

    decoded = raw.mapInPandas(decode, schema=IMAGE)
    if manifest is not None:
        decoded = (decoded.drop("epoch_id")
                   .join(F.broadcast(manifest), on="filename", how="left")
                   .select(*[f.name for f in IMAGE.fields]))
    return decoded
