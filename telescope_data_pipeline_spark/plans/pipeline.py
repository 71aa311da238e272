"""The end-to-end photometry pipeline as one lazily-composed plan.

Reference lifecycle (psf_phot.py:9-98, traced in SURVEY.md §3.1):
manifest scan → per-epoch loop → FWHM → align+stack → detect → mask →
photometry → sinks. Here each stage is a DataFrame-in/DataFrame-out
operator, composed lazily and planned by Catalyst at action time; the
sequential per-epoch loop becomes task parallelism across epochs —
the single biggest structural speedup over the reference (SURVEY.md §4).

Failure-path semantics: the reference's branchy per-set fallbacks
(psf_phot.py:53-98) are expressed by operators yielding empty/NULL
results for degenerate groups, so one bad epoch never kills the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.images import (
    align_and_stack,
    detect_stars,
    estimate_shifts,
    measure_fwhm,
)
from ..operators.photometry import psf_photometry, select_psf_stars


def run_photometry_pipeline(images: DataFrame, size: int = 128) -> dict[str, DataFrame]:
    """images (schemas.IMAGE) → {fwhm, detections, shifts, stacked,
    stacked_detections, psf_stars, photometry} DataFrames.

    Every returned DataFrame is lazy; materializing ``photometry`` pulls
    the whole chain through one Catalyst plan. Stages reused twice
    (detections feed both shift estimation and the final catalog) should
    be ``.cache()``-ed by the caller when materializing more than one
    output."""
    fwhm = measure_fwhm(images)
    detections = detect_stars(images)
    shifts = estimate_shifts(detections)
    stacked = align_and_stack(images, shifts)

    stacked_images = stacked.select(
        F.lit("stacked").alias("filename"), "epoch_id",
        F.lit(None).cast("string").alias("band"),
        "width", "height", "pixels",
        F.lit(None).cast("double").alias("airmass"),
        F.lit(None).cast("timestamp").alias("date_obs"),
        F.lit(None).cast("double").alias("exptime"),
        F.lit(None).cast("string").alias("site_id"),
        F.lit(None).cast("map<string,string>").alias("header"),
    )
    stacked_detections = detect_stars(stacked_images)

    mean_fwhm = 4.5  # fallback for epochs with no FWHM measurement
    psf_stars = select_psf_stars(stacked_detections, width=size, height=size,
                                 fwhm=mean_fwhm, border=16, trim=2,
                                 fwhm_table=fwhm)
    photometry = psf_photometry(stacked, stacked_detections, psf_stars,
                                fwhm=mean_fwhm)
    return {
        "fwhm": fwhm,
        "detections": detections,
        "shifts": shifts,
        "stacked": stacked,
        "stacked_detections": stacked_detections,
        "psf_stars": psf_stars,
        "photometry": photometry,
    }
