"""Light-curve time-series kernels (reference walkthrough cells 9-16).

Phase folding is a pure column expression (queries/scalars.py). The
Lomb-Scargle periodogram — the walkthrough's period-recovery step
(cells 13-14, via astropy.timeseries.LombScargle) — is implemented here
directly from the Scargle (1982) normalized form with the Horne &
Baliunas normalization (public formulas), as a grouped applyInPandas:
each (group) light curve fits in one task; parallelism is across
targets/bands, matching the per-image-set independence of the batch
pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def lomb_scargle_power(t: np.ndarray, y: np.ndarray,
                       freqs: np.ndarray) -> np.ndarray:
    """Normalized Lomb-Scargle periodogram P(f) for unevenly sampled y(t).

    P(f) = 1/(2σ²) · [ (Σ ŷ cos ω(t-τ))² / Σ cos² ω(t-τ)
                     + (Σ ŷ sin ω(t-τ))² / Σ sin² ω(t-τ) ]
    with tan(2ωτ) = Σ sin 2ωt / Σ cos 2ωt  (Scargle 1982, eq. 10).
    """
    y = y - y.mean()
    var = y.var(ddof=1)
    if var <= 0:
        return np.zeros_like(freqs)
    power = np.empty_like(freqs)
    for i, f in enumerate(freqs):
        w = 2 * np.pi * f
        tau = np.arctan2(np.sum(np.sin(2 * w * t)),
                         np.sum(np.cos(2 * w * t))) / (2 * w)
        c = np.cos(w * (t - tau))
        s = np.sin(w * (t - tau))
        power[i] = ((y @ c) ** 2 / (c @ c) + (y @ s) ** 2 / (s @ s)) / (2 * var)
    return power


PGRAM_SCHEMA = T.StructType([
    T.StructField("group_key", T.StringType(), False),
    T.StructField("frequency", T.DoubleType(), False),
    T.StructField("power", T.DoubleType(), False),
])


def periodogram(
    df: DataFrame,
    group_col: str,
    t_col: str,
    y_col: str,
    min_freq: float,
    max_freq: float,
    n_freqs: int = 2000,
) -> DataFrame:
    """Grouped Lomb-Scargle: (group, t, y) rows → (group, freq, power)
    rows. One group = one task; the frequency grid is a plan constant so
    results are deterministic."""
    freqs = np.linspace(min_freq, max_freq, n_freqs)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        t = pdf[t_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        keep = np.isfinite(t) & np.isfinite(y)
        if keep.sum() < 3:
            return pd.DataFrame(columns=[f.name for f in PGRAM_SCHEMA])
        p = lomb_scargle_power(t[keep], y[keep], freqs)
        return pd.DataFrame({
            "group_key": str(pdf[group_col].iloc[0]),
            "frequency": freqs,
            "power": p,
        })

    return df.select(group_col, t_col, y_col) \
             .groupBy(group_col).applyInPandas(kernel, schema=PGRAM_SCHEMA)


def make_synthetic_lightcurve(
    spark, n_epochs: int = 150, period_days: float = 3.7,
    t0: float = 2460000.0, amp: float = 0.3, noise: float = 0.05,
    seed: int = 11,
) -> DataFrame:
    """FIXTURES.md §B6: sinusoidal light curve + noise across epochs,
    with a few outlier epochs for the trimming ops."""
    rng = np.random.default_rng(seed)
    t = t0 + np.sort(rng.uniform(0, 60, n_epochs))
    mag = 12.0 + amp * np.sin(2 * np.pi * (t - t0) / period_days)
    mag += rng.normal(0, noise, n_epochs)
    mag[::47] += 1.5  # outlier epochs (walkthrough cell 10 trims these)
    rows = [(("V"), float(tt), float(mm)) for tt, mm in zip(t, mag)]
    return spark.createDataFrame(rows, "band string, bjd double, mag double")
