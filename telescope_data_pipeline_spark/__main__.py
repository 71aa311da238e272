"""Runnable pipeline entry point — the reference's ``psf_phot.py`` as a
Spark job.

    python -m telescope_data_pipeline_spark \
        --images  DIR            # directory of *.fits files
        --manifest CSV           # (filename, epoch_id) rows, no header
        --out     DIR            # sink root (csv/ fits/ pdf/ txt/)
        [--size 128]             # image side used for PSF-star framing

Mirrors the reference lifecycle (psf_phot.py:9-98): manifest scan →
FITS decode → FWHM → align+stack → detect → PSF-star mask → photometry
→ WCS solve → four sinks (CSV results, FITS stacked+WCS header, PDF
diagnostics, TXT run statistics). The reference loops epochs
sequentially in one process; here every stage is a DataFrame plan and
epochs are task-parallel. One corrupt FITS file is dropped by the
scan's failure path instead of killing the run.
"""

from __future__ import annotations

import argparse
import os


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="telescope_data_pipeline_spark",
                                description=__doc__)
    p.add_argument("--images", required=True, help="directory of FITS files")
    p.add_argument("--manifest", required=True,
                   help="CSV of filename,epoch_id (reference psf_phot.py:41)")
    p.add_argument("--out", required=True, help="output directory root")
    p.add_argument("--size", type=int, default=128)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from .operators.external import solve_wcs
    from .plans.pipeline import run_photometry_pipeline
    from .session import get_spark
    from .sources.fits import scan_fits_dir, write_stacked_fits
    from .sources.pdf import write_diagnostics_pdf
    from .sources.sinks import write_diagnostics_txt
    from .sources.tables import ensure_read_confs

    spark = get_spark("telescope-pipeline")
    ensure_read_confs(spark)

    manifest = (spark.read.schema("filename string, epoch_id int")
                .csv(args.manifest))
    images = scan_fits_dir(spark, args.images, manifest).cache()

    stages = run_photometry_pipeline(images, size=args.size)
    # Pin every stage consumed by more than one sink (pipeline.py
    # docstring): stacked feeds FITS+PDF+photometry, stacked_detections
    # feeds WCS + the TXT stats + the photometry plan, photometry feeds
    # three sinks.
    stacked = stages["stacked"].cache()
    stacked_detections = stages["stacked_detections"].cache()
    photometry = stages["photometry"].cache()
    wcs = solve_wcs(stacked_detections)

    for d in ("csv", "fits", "pdf", "txt"):
        os.makedirs(os.path.join(args.out, d), exist_ok=True)

    # 1. CSV results, one directory per epoch (reference p_io.py:103-119).
    # repartition BY the partition column: one file per epoch dir without
    # collapsing the whole computation onto one task (coalesce(1) would
    # serialize the first materialization of the cached photometry plan).
    (photometry.repartition("epoch_id").write.mode("overwrite")
     .option("header", True)
     .partitionBy("epoch_id").csv(os.path.join(args.out, "csv")))
    # 2. FITS stacked image + WCS-merged header (p_io.py:19-62)
    n_fits = write_stacked_fits(images, stacked, wcs,
                                os.path.join(args.out, "fits")).count()
    # 3. PDF diagnostics (p_io.py:63-101) — one heatmap per stacked epoch
    stacked_named = stacked.withColumn(
        "filename", F.concat(F.lit("stacked_e"),
                             F.col("epoch_id").cast("string")))
    n_pages = write_diagnostics_pdf(
        os.path.join(args.out, "pdf", "diagnostics.pdf"),
        images=stacked_named)
    # 4. TXT run statistics (p_io.py:121-154)
    write_diagnostics_txt(stacked_detections, stages["psf_stars"],
                          photometry, stages["fwhm"],
                          os.path.join(args.out, "txt", "stats.txt"))

    n_phot = photometry.count()
    n_epochs = stacked.select("epoch_id").distinct().count()
    print(f"pipeline done: {n_epochs} epochs, {n_phot} photometry rows, "
          f"{n_fits} FITS files, {n_pages} PDF pages -> {args.out}")


if __name__ == "__main__":
    main()
