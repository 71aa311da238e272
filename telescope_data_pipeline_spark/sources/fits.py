"""FITS image source: binary-file scan + Arrow-batched decode.

Reference: ``import_images`` (core.py:18-50) opens each FITS file with
astropy and pulls HDU-1 pixels + header. Spark-first form: a
``binaryFile`` scan (path/length/bytes rows, splittable listing,
predicate pushdown on path/modificationTime) followed by a
``mapInPandas`` decode into schemas.IMAGE.

``_decode_fits`` dispatches to astropy when installed (real FITS
files), falling back to the minimal header-card + big-endian float
container written by ``write_fake_fits`` below — astropy is absent in
the dev container, so tests exercise the fake path; the scan→decode→
IMAGE plumbing is identical either way.
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

try:  # pragma: no cover - exercised only where astropy is installed
    from astropy.io import fits as _astropy_fits
except ImportError:
    _astropy_fits = None


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
    """Decode FITS bytes to ``(2-D pixels, header dict)``.

    Real standard-conformant files ("SIMPLE  =" magic, reference
    core.py:18-50 reads them with astropy) go through astropy when it
    is installed; the fake container written by :func:`write_fake_fits`
    always parses via the byte-level stub. A real FITS file in an
    environment without astropy raises, and the scan's failure-path
    rule drops (production: quarantines) the file.
    """
    if _astropy_fits is not None and content[:6] == b"SIMPLE":
        with _astropy_fits.open(io.BytesIO(content)) as hdul:
            hdu = next((h for h in hdul
                        if h.data is not None and h.data.ndim == 2), None)
            if hdu is None:
                raise ValueError("no 2-D image HDU")
            header = {k: str(v) for k, v in hdu.header.items()
                      if k not in ("HISTORY", "COMMENT", "")}
            return np.asarray(hdu.data, dtype=np.float32), header
    if _astropy_fits is None and content[:6] == b"SIMPLE":
        raise ValueError("real FITS file but astropy is not installed")
    buf = io.BytesIO(content)
    if buf.readline().strip() != _MAGIC:
        raise ValueError("not a TDPS fake FITS file")
    h, w = struct.unpack(">II", buf.read(8))
    (card_len,) = struct.unpack(">I", buf.read(4))
    header = dict(line.split("=", 1)
                  for line in buf.read(card_len).decode().splitlines())
    pixels = np.frombuffer(buf.read(h * w * 4), dtype=">f4").reshape(h, w)
    return pixels, header


FITS_SINK_SCHEMA = (
    "epoch_id int, path string, n_bytes long, n_cards int, "
    "avg_airmass double, bjd double"
)


def write_stacked_fits(
    images: DataFrame,
    stacked: DataFrame,
    wcs: DataFrame,
    out_dir: str,
    target_ra: float = 150.0,
    target_dec: float = 2.0,
) -> DataFrame:
    """FITS sink with WCS-merged header (reference p_io.py:19-62
    ``write_fits``): one file per epoch holding the stacked pixels and a
    header assembled as

    - base: the header of the epoch's first image (reference
      ``im_headers[0]``);
    - overlay: every WCS key EXCEPT HISTORY/COMMENT (p_io.py:40-42);
    - AIRMASS: mean over the epoch's images (p_io.py:43-47);
    - BJD: barycentric correction of the mean mid-exposure JD
      (p_io.py:48-56, via :func:`..operators.external.barycentric_jd`).

    The per-epoch aggregation (mean airmass, mean mid-exposure JD, first
    header) is relational — Catalyst plans it with map-side partial aggs
    — and only the final dict overlay + file write run in the Arrow
    kernel, one row per EPOCH, so the sink parallelizes across epochs
    and the Python crossing is negligible. Returns the lazy manifest of
    written files; materialize to execute the writes.
    """
    import os

    from ..operators.external import barycentric_jd

    # mid-exposure JD: unix epoch -> JD offset, + exptime/2 in days
    jd_mid = (F.unix_timestamp("date_obs") / 86400.0 + 2440587.5
              + F.col("exptime") / 2.0 / 86400.0)
    hdr = images.groupBy("epoch_id").agg(
        F.avg("airmass").alias("avg_airmass"),
        F.avg(jd_mid).alias("jd_mid"),
        F.min_by("header", "filename").alias("base_header"),
    )
    hdr = hdr.withColumn(
        "bjd", barycentric_jd("jd_mid", F.lit(target_ra), F.lit(target_dec)))
    rows = (stacked.select("epoch_id", "width", "height", "pixels")
            .join(hdr, "epoch_id")
            .join(F.broadcast(wcs.filter(F.col("solved"))
                              .select("epoch_id", "crval_ra", "crval_dec",
                                      "pix_scale")),
                  "epoch_id", "left"))

    def write_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                wcs_cards = {}
                if r.crval_ra is not None and not pd.isna(r.crval_ra):
                    # a real solver returns a full header; HISTORY/COMMENT
                    # are dropped here exactly as p_io.py:40-42 does
                    wcs_cards = {"CRVAL1": r.crval_ra, "CRVAL2": r.crval_dec,
                                 "CDELT1": r.pix_scale, "CDELT2": r.pix_scale,
                                 "HISTORY": "solved", "COMMENT": "solved"}
                merged = dict(r.base_header or {})
                merged.update({k: str(v) for k, v in wcs_cards.items()
                               if k not in ("HISTORY", "COMMENT")})
                merged["AIRMASS"] = str(r.avg_airmass)
                merged["BJD"] = str(r.bjd)
                px = np.asarray(r.pixels, dtype=np.float32) \
                    .reshape(int(r.height), int(r.width))
                path = os.path.join(out_dir, f"stacked_e{int(r.epoch_id)}.fits")
                write_fake_fits(path, px, merged)
                out.append({"epoch_id": int(r.epoch_id), "path": path,
                            "n_bytes": os.path.getsize(path),
                            "n_cards": len(merged),
                            "avg_airmass": float(r.avg_airmass),
                            "bjd": float(r.bjd)})
            yield pd.DataFrame(
                out, columns=["epoch_id", "path", "n_bytes", "n_cards",
                              "avg_airmass", "bjd"])

    return rows.mapInPandas(write_kernel, schema=FITS_SINK_SCHEMA)


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
