"""PSF-star selection and PSF photometry (reference core.py:281-484).

The selection mask (core.py:281-342 ``image_mask``) is pure DataFrame
ops — border/saturation predicates, a grid-bucketed crowding self-join
used as an anti-join, and a window-based brightness trim. No UDF: every
step is Catalyst-visible, so predicate pushdown and AQE still apply.

The numeric kernels (empirical PSF build, core.py:384-414; iterative
photometry, core.py:416-452) are grouped applyInPandas per epoch:
cutouts → normalized median PSF → per-star linear least-squares flux
with iterative neighbor subtraction (the curve_fit/LevMar-free
formulation; exact for the planted-Gaussian fixtures).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .images import SATURATION


def select_psf_stars(
    detections: DataFrame,
    width: int,
    height: int,
    fwhm: float,
    border: int = 16,
    crowd_mult: float = 5.0,
    trim: int = 5,
    fwhm_table: DataFrame | None = None,
) -> DataFrame:
    """The reference's masking rules as one declarative plan:

    1. border predicate (core.py:309-310): ≥ ``border`` px from edges;
    2. saturation predicate (core.py:79): peak < 50k;
    3. crowding rejection (core.py:317-330): no other star within
       ``crowd_mult * fwhm`` — grid-bucketed self-join → anti-join
       (the O(n²) loop becomes a linear equi-join);
    4. brightness trim (core.py:338-340): drop the ``trim`` brightest
       and faintest when more than 2*trim remain, per epoch.

    ``fwhm_table`` (epoch_id, fwhm rows, e.g. from measure_fwhm) makes
    the crowding radius PER-EPOCH via a broadcast join — the reference
    recomputes fwhm per image set (psf_phot.py:49) and so does this
    plan; the scalar ``fwhm`` is the fallback for epochs with no
    measurement. Cell ids use the epoch's own radius, so the self-join
    stays a pure (epoch, cell) equi-join.
    """
    d = detections.filter(
        (F.col("xcentroid") > border) & (F.col("xcentroid") < width - 1 - border)
        & (F.col("ycentroid") > border) & (F.col("ycentroid") < height - 1 - border)
        & (F.col("peak") < SATURATION)
    )
    if fwhm_table is not None:
        per_epoch = (fwhm_table.filter(F.col("fwhm").isNotNull())
                     .groupBy("epoch_id")
                     .agg(F.avg("fwhm").alias("__fwhm")))
        d = (d.join(F.broadcast(per_epoch), "epoch_id", "left")
             .withColumn("__fwhm", F.coalesce("__fwhm", F.lit(float(fwhm)))))
    else:
        d = d.withColumn("__fwhm", F.lit(float(fwhm)))

    # Crowding: pairs within radius via cell-bucketed self-join. The
    # radius (and so the cell size) is an epoch-level column; both join
    # sides derive cells from the same epoch's radius.
    radius = F.col("__fwhm") * crowd_mult
    cell = lambda c: F.floor(c / radius).cast("long")  # noqa: E731
    left = d.select("epoch_id", "filename", "id",
                    F.col("xcentroid").alias("lx"), F.col("ycentroid").alias("ly"),
                    radius.alias("lrad"),
                    cell(F.col("xcentroid")).alias("cx"),
                    cell(F.col("ycentroid")).alias("cy"))
    offs = [(a, b) for a in (-1, 0, 1) for b in (-1, 0, 1)]
    right = (d.select("epoch_id", "filename",
                      F.col("id").alias("rid"),
                      F.col("xcentroid").alias("rx"), F.col("ycentroid").alias("ry"),
                      cell(F.col("xcentroid")).alias("bcx"),
                      cell(F.col("ycentroid")).alias("bcy"))
             .withColumn("o", F.explode(F.array(*[
                 F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
                 for a, b in offs])))
             .select("epoch_id", "filename", "rid", "rx", "ry",
                     (F.col("bcx") + F.col("o.a")).alias("cx"),
                     (F.col("bcy") + F.col("o.b")).alias("cy")))
    crowded = (
        left.join(right, on=["epoch_id", "filename", "cx", "cy"])
        .filter((F.col("id") != F.col("rid"))
                & (F.sqrt(F.pow(F.col("lx") - F.col("rx"), 2)
                          + F.pow(F.col("ly") - F.col("ry"), 2))
                   <= F.col("lrad")))
        .select("epoch_id", "filename", "id").distinct()
    )
    isolated = d.join(crowded, on=["epoch_id", "filename", "id"], how="left_anti")

    part = W.partitionBy("epoch_id", "filename")
    ranked = isolated.select(
        "*",
        F.row_number().over(part.orderBy(F.desc("flux"), F.asc("id"))).alias("rn"),
        F.count(F.lit(1)).over(part).alias("cnt"),
    )
    return (
        ranked.filter((F.col("cnt") <= 2 * trim)
                      | ((F.col("rn") > trim) & (F.col("rn") <= F.col("cnt") - trim)))
        .select("epoch_id", "filename",
                F.col("xcentroid").alias("x"), F.col("ycentroid").alias("y"),
                "flux", "id", "peak")
    )


def _sigma_clipped_median(data: np.ndarray, sigma: float = 3.0,
                          maxiters: int = 5) -> float:
    """Median after iterative sigma clipping around the median (the
    sigma_clipped_stats(annulus_data) step of reference core.py:371-372)."""
    d = np.asarray(data, dtype=np.float64).ravel()
    d = d[np.isfinite(d)]
    for _ in range(maxiters):
        if d.size == 0:
            return 0.0
        med, std = np.median(d), np.std(d)
        keep = np.abs(d - med) <= sigma * std
        if keep.all():
            break
        d = d[keep]
    return float(np.median(d)) if d.size else 0.0


def local_background_subtract(
    img: np.ndarray,
    positions: list[tuple[float, float]],
    fwhm: float,
    r_in: float = 20.0,
    r_out: float = 30.0,
) -> tuple[np.ndarray, list[float]]:
    """Local annulus background subtraction (reference core.py:344-382
    ``bkg_sub``): for each star, the sigma-clipped median of the pixels
    whose centers fall in the ring ``r_in <= d < r_out`` is subtracted
    from a square box of side ``5 * fwhm`` centered on the star.

    Matches the reference's sequential semantics: stars are processed in
    order on ONE mutating work image, so a later star's annulus sees the
    earlier subtractions. Returns (subtracted image copy, per-star
    background list aligned with ``positions``); an empty annulus (star
    at the frame corner) contributes background 0 — the caller may fall
    back to a global median.
    """
    h, w = img.shape
    out = img.astype(np.float64, copy=True)
    yy, xx = np.mgrid[0:h, 0:w]
    half = 5.0 * fwhm / 2.0
    bkgs: list[float] = []
    for x, y in positions:
        d2 = (xx - x) ** 2 + (yy - y) ** 2
        ring = (d2 >= r_in * r_in) & (d2 < r_out * r_out)
        vals = out[ring]
        bkg = _sigma_clipped_median(vals) if vals.size else 0.0
        bkgs.append(bkg)
        ix, iy = int(round(x)), int(round(y))
        r0, r1 = max(0, int(np.floor(iy - half)) + 1), min(h, int(np.ceil(iy + half)))
        c0, c1 = max(0, int(np.floor(ix - half)) + 1), min(w, int(np.ceil(ix + half)))
        out[r0:r1, c0:c1] -= bkg
    return out, bkgs


PHOT_SCHEMA = T.StructType([
    T.StructField("epoch_id", T.IntegerType(), False),
    T.StructField("id", T.LongType(), False),
    T.StructField("x_0", T.DoubleType(), True),
    T.StructField("x_fit", T.DoubleType(), True),
    T.StructField("y_0", T.DoubleType(), True),
    T.StructField("y_fit", T.DoubleType(), True),
    T.StructField("flux_fit", T.DoubleType(), True),
    T.StructField("flux_unc", T.DoubleType(), True),
    T.StructField("iter_detected", T.IntegerType(), False),
    T.StructField("bkg_local", T.DoubleType(), True),
    T.StructField("resid_rms", T.DoubleType(), True),
])


def _epsf_fine_grid(refs: list[tuple[np.ndarray, float, float]],
                    ch: int, oversampling: int) -> np.ndarray:
    """Accumulate max-normalized reference cutouts on an oversampled
    grid, each placed at its SUB-PIXEL center (the EPSFBuilder essence
    at oversampling=2, reference core.py:411): coarse pixel (r, c) of a
    star centered at (ch+dx, ch+dy) scatters to the fine cell nearest
    offset (c-ch-dx, r-ch-dy). Cells covered by no reference fall back
    to the native-resolution median expanded — sub-pixel structure is
    refined where data exists, never invented."""
    P = 2 * ch + 1
    Pf = oversampling * P
    half = (Pf - 1) / 2.0
    stack = np.full((len(refs), Pf, Pf), np.nan)
    for k, (cut, dx, dy) in enumerate(refs):
        fr = np.rint((np.arange(P) - ch - dy) * oversampling + half)
        fc = np.rint((np.arange(P) - ch - dx) * oversampling + half)
        ok_r = (fr >= 0) & (fr < Pf)
        ok_c = (fc >= 0) & (fc < Pf)
        stack[k][np.ix_(fr[ok_r].astype(int), fc[ok_c].astype(int))] = \
            cut[np.ix_(ok_r, ok_c)]
    with np.errstate(all="ignore"):
        fine = np.nanmedian(stack, axis=0)
    coarse = np.median(np.stack([c for c, _, _ in refs]), axis=0)
    fallback = np.repeat(np.repeat(coarse, oversampling, axis=0),
                         oversampling, axis=1)
    fine = np.where(np.isnan(fine), fallback, fine)
    return np.clip(fine, 0, None)


def _sample_epsf(fine: np.ndarray, ch: int, oversampling: int,
                 dx: float, dy: float) -> np.ndarray:
    """Evaluate the oversampled PSF model at a star's sub-pixel offset:
    coarse pixel (r, c) reads the fine cell nearest (c-ch-dx, r-ch-dy).
    Returns a sum-normalized P x P basis for the linear flux fit."""
    P = 2 * ch + 1
    Pf = fine.shape[0]
    half = (Pf - 1) / 2.0
    fr = np.clip(np.rint((np.arange(P) - ch - dy) * oversampling + half),
                 0, Pf - 1).astype(int)
    fc = np.clip(np.rint((np.arange(P) - ch - dx) * oversampling + half),
                 0, Pf - 1).astype(int)
    psf = fine[np.ix_(fr, fc)].astype(np.float64)
    s = psf.sum()
    return psf / s if s > 0 else psf


def psf_photometry(
    stacked: DataFrame,
    detections: DataFrame,
    psf_stars: DataFrame,
    cut_half: int = 8,
    n_iters: int = 5,
    fwhm: float = 4.5,
    oversampling: int = 1,
) -> DataFrame:
    """Empirical-PSF photometry per epoch (grouped applyInPandas).

    Background: per-star LOCAL annulus subtraction (core.py:344-382) on
    the work image before PSF build and fitting, with a global-median
    fallback for the frame at large (stars whose annulus is empty keep
    the global level). PSF model: median of background-subtracted,
    peak-normalized cutouts of the selected PSF stars (the EPSFBuilder
    essence, core.py:384-414); ``oversampling=2`` accumulates the
    cutouts on a sub-pixel-aligned 2x grid and evaluates the model at
    each fitted star's own sub-pixel offset (the reference's
    ``EPSFBuilder(oversampling=2)`` fidelity, core.py:411 — the
    blended-pair golden tightens from 15% to 10% under it), while the
    default 1 keeps the native-resolution path.

    Fitting follows the reference's IterativelySubtractedPSFPhotometry
    configuration (core.py:440-449): ``niters=5`` rounds, with stars
    first grouped DAOGroup-style (core.py:440, ``DAOGroup(2*fwhm)``) —
    connected components under pairwise separation <= 2*fwhm. Isolated
    stars get the closed-form single-source fit flux = argmin
    ||cut - f·PSF||²; blended groups get ONE simultaneous linear
    least-squares solve over the union of their cutout footprints (the
    design matrix has one shifted-PSF column per member), with a
    deterministic active-set retreat on non-positive fluxes — the
    LevMar-free equivalent of fitting the compound model. Each round
    subtracts fitted models from the work image so later (fainter)
    rounds fit on neighbor-cleaned pixels (core.py:447's iterative
    subtraction). Returns PHOT_SCHEMA rows; x_fit/y_fit from moment
    recentroid of the neighbor-subtracted cutout; bkg_local/resid_rms
    are the per-star diagnostics the reference's residual sink consumes
    (core.py:454-484)."""
    stk = stacked.select("epoch_id", "width", "height", "pixels")
    dets = detections.select("epoch_id", "id", "xcentroid", "ycentroid", "flux") \
                     .withColumnRenamed("flux", "flux_0")
    stars = psf_stars.select("epoch_id",
                             F.col("x").alias("px"), F.col("y").alias("py"))
    merged = (stk.join(dets.groupBy("epoch_id").agg(
                  F.collect_list(F.struct("id", "xcentroid", "ycentroid", "flux_0"))
                   .alias("stars")), "epoch_id")
              .join(stars.groupBy("epoch_id").agg(
                  F.collect_list(F.struct("px", "py")).alias("psf_refs")),
                  "epoch_id"))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        row = pdf.iloc[0]
        w, h = int(row["width"]), int(row["height"])
        img = np.asarray(row["pixels"], dtype=np.float64).reshape(h, w)
        # Global median levels the frame; the per-star annulus pass then
        # removes the LOCAL deviation (gradients, nebulosity) around each
        # star, composing to the reference's local annulus level.
        sky = float(np.median(img))
        positions = [(s["xcentroid"], s["ycentroid"]) for s in row["stars"]]
        sub, bkg_delta = local_background_subtract(img - sky, positions,
                                                   fwhm=fwhm)
        bkg_by_id = {s["id"]: sky + b
                     for s, b in zip(row["stars"], bkg_delta)}
        ch = cut_half

        def cutout(arr, x, y):
            ix, iy = int(round(x)), int(round(y))
            if ix - ch < 0 or iy - ch < 0 or ix + ch + 1 > w or iy + ch + 1 > h:
                return None, ix, iy
            return arr[iy - ch: iy + ch + 1, ix - ch: ix + ch + 1], ix, iy

        # Empirical PSF: median of normalized reference-star cutouts —
        # at native resolution (oversampling=1, the default) or on a
        # sub-pixel-aligned oversampled grid (oversampling=2 mirrors
        # the reference's EPSFBuilder(oversampling=2), core.py:411).
        refs = []
        for r in row["psf_refs"]:
            cut, ix, iy = cutout(sub, r["px"], r["py"])
            if cut is not None and cut.max() > 0:
                refs.append((cut / cut.max(),
                             float(r["px"]) - ix, float(r["py"]) - iy))
        if not refs:
            return pd.DataFrame(columns=[f.name for f in PHOT_SCHEMA])
        psf = np.median(np.stack([c for c, _, _ in refs]), axis=0)
        psf = np.clip(psf, 0, None)
        psf /= psf.sum()
        fine = (_epsf_fine_grid(refs, ch, oversampling)
                if oversampling > 1 else None)

        def psf_of(s, ix, iy):
            """Per-star PSF basis (sum-normalized) + its self-overlap:
            the shared native model, or the oversampled model sampled
            at the star's sub-pixel offset."""
            if fine is None:
                return psf, denom
            pj = _sample_epsf(fine, ch, oversampling,
                              float(s["xcentroid"]) - ix,
                              float(s["ycentroid"]) - iy)
            return pj, float((pj * pj).sum())

        stars = sorted(row["stars"], key=lambda s: -(s["flux_0"] or 0))
        denom = float((psf * psf).sum())
        P = 2 * ch + 1

        def recentroid(cut, ix, iy, s):
            cc = np.clip(cut, 0, None)
            tot = cc.sum()
            yy, xx = np.mgrid[iy - ch: iy + ch + 1, ix - ch: ix + ch + 1]
            xfit = float((xx * cc).sum() / tot) if tot > 0 else s["xcentroid"]
            yfit = float((yy * cc).sum() / tot) if tot > 0 else s["ycentroid"]
            return xfit, yfit

        def emit(s, xfit, yfit, fhat, resid, it, dnm):
            return {"id": s["id"], "x_0": s["xcentroid"], "x_fit": xfit,
                    "y_0": s["ycentroid"], "y_fit": yfit,
                    "flux_fit": fhat,
                    "flux_unc": float(np.sqrt(
                        np.clip((resid ** 2).sum(), 0, None) / dnm)),
                    "iter_detected": it,
                    "bkg_local": bkg_by_id.get(s["id"], sky),
                    "resid_rms": float(np.sqrt((resid ** 2).mean()))}

        def components(members):
            """DAOGroup(2*fwhm) semantics (core.py:440): connected
            components under pairwise separation <= 2*fwhm."""
            crit = 2.0 * fwhm
            parent = list(range(len(members)))

            def find(i):
                while parent[i] != i:
                    parent[i] = parent[parent[i]]
                    i = parent[i]
                return i

            for i in range(len(members)):
                xi, yi = members[i][0]["xcentroid"], members[i][0]["ycentroid"]
                for j in range(i + 1, len(members)):
                    xj, yj = members[j][0]["xcentroid"], members[j][0]["ycentroid"]
                    if (xi - xj) ** 2 + (yi - yj) ** 2 <= crit * crit:
                        parent[find(i)] = find(j)
            groups: dict[int, list] = {}
            for i, m in enumerate(members):
                groups.setdefault(find(i), []).append(m)
            return list(groups.values())

        def fit_group(work, grp, it, out):
            """Simultaneous linear LSQ over the union of the group's
            cutout footprints: one shifted-PSF design column per member
            (the DAOGroup compound-model fit, core.py:440). Non-positive
            fluxes retreat from the active set deterministically and
            stay unfit this round (a later round retries them on the
            neighbor-subtracted image)."""
            y0 = min(iy for _, _, iy in grp) - ch
            y1 = max(iy for _, _, iy in grp) + ch + 1
            x0 = min(ix for _, ix, _ in grp) - ch
            x1 = max(ix for _, ix, _ in grp) + ch + 1
            cols = np.zeros((len(grp), y1 - y0, x1 - x0))
            mask = np.zeros((y1 - y0, x1 - x0), dtype=bool)
            dnms = []
            for j, (s, ix, iy) in enumerate(grp):
                pj, dj = psf_of(s, ix, iy)
                dnms.append(dj)
                sy, sx = iy - ch - y0, ix - ch - x0
                cols[j, sy:sy + P, sx:sx + P] = pj
                mask[sy:sy + P, sx:sx + P] = True
            box = work[y0:y1, x0:x1]
            b = box[mask]
            A = cols[:, mask].T  # (n_pix, k)
            active = list(range(len(grp)))
            flux = np.zeros(len(grp))
            while active:
                f, *_ = np.linalg.lstsq(A[:, active], b, rcond=None)
                if (f > 0).all():
                    for i, v in zip(active, f):
                        flux[i] = float(v)
                    break
                active = [i for i, v in zip(active, f) if v > 0]
            if not active:
                return
            model = np.tensordot(flux, cols, axes=1)
            resid_box = box - model
            work[y0:y1, x0:x1][mask] = resid_box[mask]
            for j in active:
                s, ix, iy = grp[j]
                sy, sx = iy - ch - y0, ix - ch - x0
                resid = resid_box[sy:sy + P, sx:sx + P]
                # recentroid on the star's OWN model + local residual —
                # i.e. the cutout with the other members subtracted
                own = resid + cols[j, sy:sy + P, sx:sx + P] * flux[j]
                xfit, yfit = recentroid(own, ix, iy, s)
                out.append(emit(s, xfit, yfit, float(flux[j]), resid, it,
                                dnms[j]))

        work = sub.copy()
        out = []
        for it in range(n_iters):
            done = {o["id"] for o in out}
            todo = []
            for s in stars:
                if s["id"] in done:
                    continue
                cut, ix, iy = cutout(work, s["xcentroid"], s["ycentroid"])
                if cut is not None:
                    todo.append((s, ix, iy))
            # brightest-first over groups (group brightness = brightest member)
            groups = sorted(components(todo),
                            key=lambda g: -max((m[0]["flux_0"] or 0) for m in g))
            for grp in groups:
                if len(grp) > 1:
                    fit_group(work, grp, it, out)
                    continue
                s, ix, iy = grp[0]
                cut = work[iy - ch: iy + ch + 1, ix - ch: ix + ch + 1]
                pj, dj = psf_of(s, ix, iy)
                fhat = float((cut * pj).sum() / dj)
                if fhat <= 0:
                    continue
                # recentroid on the neighbor-subtracted cutout
                xfit, yfit = recentroid(cut, ix, iy, s)
                resid = cut - fhat * pj
                work[iy - ch: iy + ch + 1, ix - ch: ix + ch + 1] = resid
                out.append(emit(s, xfit, yfit, fhat, resid, it, dj))
        res = pd.DataFrame(out)
        res["epoch_id"] = int(row["epoch_id"])
        return res[[f.name for f in PHOT_SCHEMA]]

    return merged.groupBy("epoch_id").applyInPandas(kernel, schema=PHOT_SCHEMA)
