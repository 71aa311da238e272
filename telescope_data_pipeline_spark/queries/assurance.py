"""Measurement-assurance queries (round 12, session 4).

The layer that decides whether the NUMBERS THEMSELVES can be trusted
before anyone acts on them: is a drifted distribution far in the
overlap-sensitive sense (q_hellinger_drift, the bounded [0,1] metric
beside the unbounded KL and the width-scaled EMD), do the daily counts
even follow the Poisson model the rate monitors assume
(q_overdispersion), do the model's probabilities survive the classic
goodness-of-fit gate (q_hosmer_lemeshow, the grouped chi-square behind
q_calibration's reliability bins), does a metric stream carry long
memory that invalidates sqrt(n) error bars (q_hurst_exponent, rescaled
range analysis), and do k parallel item scores measure one underlying
thing (q_cronbach_alpha, the internal-consistency coefficient).

Graph-assurance siblings over the co-purchase graph: one HITS
hub/authority iteration (q_hits_step), the degree-distribution
power-law MLE (q_powerlaw_alpha), and Jaccard-neighborhood link
prediction (q_jaccard_linkpred, the set-overlap baseline under
q_adamic_adar's weighted score). Ranking-assurance: mean average
precision (q_map_eval) and rank-biased overlap between two rankers
(q_rbo_overlap).

Reference parity: the reference pipeline trusts its photometry only
after residual QA (telescope-data-pipeline core.py:470-505); these
queries are that habit applied to corpus-scale metrics, models, and
retrieval stacks over the driver tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

#: Reference/current split shared with q_psi_drift / q_ks_drift /
#: q_emd_drift so every drift monitor reads the same two windows.
_SPLIT = "2024-01-16 00:00:00"


# ---------------------------------------------------------------------------
# Hellinger / Bhattacharyya drift distance between the two windows
# ---------------------------------------------------------------------------

@query("q_hellinger_drift", oracle=f"""
WITH v AS (
  SELECT value,
         CASE WHEN ts < TIMESTAMP '{_SPLIT}' THEN 0 ELSE 1 END AS side
  FROM events WHERE value IS NOT NULL
), edges AS (
  SELECT MIN(value) AS mn, MAX(value) AS mx FROM v
), binned AS (
  SELECT LEAST(19, GREATEST(0, CAST(COALESCE(
           FLOOR((value - mn) * 20.0 / NULLIF(mx - mn, 0)), 0) AS INT)))
           AS bin,
         side
  FROM v CROSS JOIN edges
), counts AS (
  SELECT b.bin,
         COALESCE(SUM(CASE WHEN side = 0 THEN 1 END), 0) AS n_ref,
         COALESCE(SUM(CASE WHEN side = 1 THEN 1 END), 0) AS n_cur
  FROM (SELECT CAST(UNNEST(generate_series(0, 19)) AS INT) AS bin) b
  LEFT JOIN binned USING (bin)
  GROUP BY b.bin
), tot AS (
  SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts
), terms AS (
  SELECT bin, n_ref, n_cur,
         CAST(ROUND(SQRT((n_ref::DOUBLE / NULLIF(t_ref, 0))
                         * (n_cur::DOUBLE / NULLIF(t_cur, 0))) * 1e12)
              AS BIGINT) AS bc_pico
  FROM counts CROSS JOIN tot
), bc AS (
  SELECT SUM(bc_pico) AS bc_sum FROM terms
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       ROUND(bc_pico / 1e12, 9) + 0.0 AS bc_term,
       ROUND(SQRT(GREATEST(0.0, 1.0 - bc_sum / 1e12)), 6) + 0.0
         AS hellinger,
       ROUND(-LN(GREATEST(bc_sum, 1) / 1e12), 6) + 0.0 AS bhattacharyya
FROM terms CROSS JOIN bc
ORDER BY bin
""")
def q_hellinger_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance and Bhattacharyya distance between the
    reference and current windows of ``events.value`` over the SAME 20
    equal-width bins as q_emd_drift: ``BC = sum_b sqrt(p_b * q_b)``,
    ``H = sqrt(1 - BC)`` (bounded in [0, 1] — comparable across
    metrics, unlike KL), ``B = -ln(BC)``. H is the overlap-sensitive
    member of the drift family: KS sees only the largest CDF gap, EMD
    scales with the value axis, KL explodes on empty bins; H moves
    smoothly with the geometric mean of the two densities.

    Determinism: per-bin counts are exact integers; each sqrt(p*q)
    term is computed from integer ratios (sqrt is IEEE-exact) and
    quantized to pico units BEFORE the cross-bin sum, so BC is an
    integer total; the final sqrt/ln run once on that bounded scalar.
    GREATEST(bc_sum, 1) guards ln(0) when the windows are disjoint
    (the +0.0 and GREATEST(0,..) guards mirror on both engines).

    Scale: identical plan to q_emd_drift — one fact scan with a side
    flag, 1-row broadcast bin edges, 40-row shuffle regardless of
    input, windows only over the 20-row bin spine."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_SPLIT).cast("timestamp")
    sided = (ev.filter(F.col("value").isNotNull())
             .select("value",
                     F.when(F.col("ts") < split, 0).otherwise(1)
                     .alias("side")))
    edges = sided.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binv = F.least(F.lit(19), F.greatest(F.lit(0), F.coalesce(
        F.floor((F.col("value") - F.col("mn")) * 20.0
                / F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))),
        F.lit(0)).cast("int")))
    counts = (sided.crossJoin(F.broadcast(edges))
              .groupBy(binv.alias("bin"))
              .agg(F.coalesce(F.sum(F.when(F.col("side") == 0, 1)), F.lit(0))
                   .alias("n_ref"),
                   F.coalesce(F.sum(F.when(F.col("side") == 1, 1)), F.lit(0))
                   .alias("n_cur")))
    bins = spark.range(20).select(F.col("id").cast("int").alias("bin"))
    full = (bins.join(counts, "bin", "left")
            .select("bin",
                    F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
                    F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur")))
    wall = (W.orderBy("bin")  # 20-row spine: the approved bounded shape
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    t_ref = F.sum("n_ref").over(wall)
    t_cur = F.sum("n_cur").over(wall)
    bc_pico = F.round(F.sqrt(
        (F.col("n_ref").cast("double") / F.nullif(t_ref, F.lit(0)))
        * (F.col("n_cur").cast("double") / F.nullif(t_cur, F.lit(0))))
        * 1e12).cast("long")
    bc_sum = F.sum("bc_pico").over(wall)
    return (full.withColumn("bc_pico", bc_pico)
            .select(F.col("bin").cast("long").alias("bin"),
                    "n_ref", "n_cur",
                    (F.round(F.col("bc_pico") / 1e12, 9) + 0.0)
                    .alias("bc_term"),
                    (F.round(F.sqrt(F.greatest(
                        F.lit(0.0), 1.0 - bc_sum / 1e12)), 6) + 0.0)
                    .alias("hellinger"),
                    (F.round(-F.log(F.greatest(bc_sum, F.lit(1)) / 1e12), 6)
                     + 0.0).alias("bhattacharyya"))
            .orderBy("bin"))


# ---------------------------------------------------------------------------
# Poisson overdispersion test on daily event counts per stream
# ---------------------------------------------------------------------------

@query("q_overdispersion", oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(c) AS sc,
         SUM(CAST(c AS HUGEINT) * c) AS sc2
  FROM daily GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       ROUND(sc::DOUBLE / n, 6) + 0.0 AS mean_count,
       ROUND((n * sc2 - CAST(sc AS HUGEINT) * sc)::DOUBLE
             / (n * (n - 1.0)) / (sc::DOUBLE / n), 6) + 0.0
         AS dispersion,
       ROUND(SQRT(2.0 * (n - 1)
                  * ((n * sc2 - CAST(sc AS HUGEINT) * sc)::DOUBLE
                     / (n * (n - 1.0)) / (sc::DOUBLE / n)))
             - SQRT(2.0 * (n - 1) - 1), 6) + 0.0 AS z_wh,
       SQRT(2.0 * (n - 1)
            * ((n * sc2 - CAST(sc AS HUGEINT) * sc)::DOUBLE
               / (n * (n - 1.0)) / (sc::DOUBLE / n)))
         - SQRT(2.0 * (n - 1) - 1) > 1.644854 AS overdispersed_95
FROM s ORDER BY event_type
""")
def q_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion screen per metric stream: the dispersion
    index D = s^2 / xbar of the DAILY event counts (D = 1 under
    Poisson), tested with the Wilson-Hilferty normal approximation of
    the dispersion chi-square, z = sqrt(2*(n-1)*D) - sqrt(2*(n-1)-1).
    Every rate monitor (q_poisson_rate's z, control bands on counts)
    assumes D ~ 1; clumped arrivals (bursts, bot traffic, retry
    storms) push D above 1 and silently shrink their error bars — this
    is the gate that says whether those monitors can be trusted.

    Determinism: daily counts are exact integers; the variance
    numerator n*sum(c^2) - (sum c)^2 stays in exact HUGEINT/DECIMAL
    algebra (first factor widened BEFORE the multiply); D and z are
    single double expressions of those exact integers (sqrt is
    IEEE-exact), rounded once. The flag compares the shared double to
    the one-sided 95% normal quantile.

    Scale: one map-side-combined groupBy to the bounded (stream, day)
    table, one tiny aggregate over it; shuffle volume is |streams| x
    |days| regardless of event volume."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
             .agg(F.count(F.lit(1)).alias("c")))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sc2"))
    n = F.col("n").cast("double")
    var_num = (F.col("n") * F.col("sc2")
               - F.col("sc").cast("decimal(38,0)") * F.col("sc"))
    disp = (var_num.cast("double") / (n * (n - 1.0))
            / (F.col("sc").cast("double") / n))
    z = F.sqrt(2.0 * (n - 1) * disp) - F.sqrt(2.0 * (n - 1) - 1)
    return (s.select("event_type",
                     F.col("n").cast("long").alias("n_days"),
                     (F.round(F.col("sc").cast("double") / n, 6) + 0.0)
                     .alias("mean_count"),
                     (F.round(disp, 6) + 0.0).alias("dispersion"),
                     (F.round(z, 6) + 0.0).alias("z_wh"),
                     (z > 1.644854).alias("overdispersed_95"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Hosmer-Lemeshow goodness-of-fit over q_calibration's reliability bins
# ---------------------------------------------------------------------------

@query("q_hosmer_lemeshow", oracle="""
WITH scored AS (
  SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y,
         80 * label + ((vec_id % 1000003) * 2654435761 % 1000) // 5
           AS p_milli
  FROM embeddings
), binned AS (
  SELECT LEAST(p_milli // 100, 9) AS bin, y, p_milli FROM scored
), g AS (
  SELECT bin,
         COUNT(*) AS n,
         SUM(y) AS o1,
         SUM(p_milli) AS e1_milli
  FROM binned GROUP BY bin
), terms AS (
  SELECT bin, n, o1, e1_milli,
         CAST(ROUND(
           (o1 - e1_milli / 1000.0) * (o1 - e1_milli / 1000.0)
           / NULLIF((e1_milli / 1000.0)
                    * (1.0 - e1_milli::DOUBLE / (1000.0 * n)), 0)
           * 1e9) AS BIGINT) AS t_nano
  FROM g
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(n AS BIGINT) AS n,
       CAST(o1 AS BIGINT) AS obs_pos,
       ROUND(e1_milli / 1000.0, 6) + 0.0 AS exp_pos,
       ROUND(t_nano / 1e9, 6) + 0.0 AS hl_term,
       ROUND(SUM(t_nano) OVER () / 1e9, 6) + 0.0 AS hl_total,
       SUM(t_nano) OVER () / 1e9 > 15.507313 AS reject_95
FROM terms ORDER BY bin
""")
def q_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer-Lemeshow goodness-of-fit chi-square over the SAME ten
    reliability bins as q_calibration (deterministic integer-milli
    probabilities, label-derived outcomes): per bin, (O - E)^2 /
    (E * (1 - pbar)) on the positive cell, summed across bins and
    compared to chi-square(8) at 95% (15.507313). q_calibration shows
    WHERE the probabilities bend; q_ece averages the gaps; this is the
    formal accept/reject gate on the whole calibration curve.

    Determinism: O and E are exact integers (outcome counts; summed
    milli-probabilities); each bin's term is one double expression of
    those integers, quantized to nano BEFORE the cross-bin sum;
    NULLIF guards a degenerate all-certain bin on both engines.

    Scale: one map-side-combined groupBy on a 10-value key, then a
    10-row spine window — the same shape as q_calibration plus the
    q_emd_drift-approved bounded total."""
    e = load_table(spark, sf_dir, "embeddings")
    p_milli = (80 * F.col("label")
               + ((F.col("vec_id") % 1000003)
                  * F.lit(2654435761).cast("bigint") % 1000)
               / F.lit(5)).cast("bigint")
    binned = e.select(
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("y"),
        p_milli.alias("p_milli")).select(
        "y", "p_milli",
        F.least(F.floor(F.col("p_milli") / 100), F.lit(9)).alias("bin"))
    g = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("o1"),
        F.sum("p_milli").alias("e1_milli"))
    e1 = F.col("e1_milli") / 1000.0
    pbar = F.col("e1_milli").cast("double") / (1000.0 * F.col("n"))
    t_nano = F.round(
        (F.col("o1") - e1) * (F.col("o1") - e1)
        / F.nullif(e1 * (1.0 - pbar), F.lit(0.0)) * 1e9).cast("long")
    wall = (W.orderBy("bin")
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    hl_total = F.sum("t_nano").over(wall)
    return (g.withColumn("t_nano", t_nano)
            .select(F.col("bin").cast("long").alias("bin"),
                    F.col("n").cast("long").alias("n"),
                    F.col("o1").cast("long").alias("obs_pos"),
                    (F.round(F.col("e1_milli") / 1000.0, 6) + 0.0)
                    .alias("exp_pos"),
                    (F.round(F.col("t_nano") / 1e9, 6) + 0.0)
                    .alias("hl_term"),
                    (F.round(hl_total / 1e9, 6) + 0.0).alias("hl_total"),
                    (hl_total / 1e9 > 15.507313).alias("reject_95"))
            .orderBy("bin"))


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis per metric stream
# ---------------------------------------------------------------------------

@query("q_hurst_exponent", oracle="""
WITH base AS (
  SELECT event_type,
         CAST(ROUND(value * 1000) AS BIGINT) AS xu,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE value IS NOT NULL
), tot AS (
  SELECT event_type, COUNT(*) AS n FROM base GROUP BY event_type
), sized AS (
  SELECT b.event_type, b.xu, b.rn, m.m,
         (b.rn - 1) // m.m AS blk,
         b.rn - ((b.rn - 1) // m.m) * m.m AS j
  FROM base b
  JOIN tot t USING (event_type)
  CROSS JOIN (SELECT UNNEST([16, 32, 64]) AS m) m
  WHERE (b.rn - 1) // m.m < t.n // m.m
), dev AS (
  SELECT event_type, m, blk, xu, j,
         m * SUM(xu) OVER w
           - j * SUM(xu) OVER (PARTITION BY event_type, m, blk) AS d
  FROM sized
  WINDOW w AS (PARTITION BY event_type, m, blk ORDER BY j
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), blocks AS (
  SELECT event_type, m, blk,
         MAX(d) - MIN(d) AS r_num,
         m * SUM(CAST(xu AS HUGEINT) * xu) - CAST(SUM(xu) AS HUGEINT)
           * SUM(xu) AS s2_num
  FROM dev GROUP BY event_type, m, blk
), rs AS (
  SELECT event_type, m,
         COUNT(*) AS n_blocks,
         CAST(ROUND(SUM(CAST(ROUND(r_num::DOUBLE / SQRT(s2_num::DOUBLE)
                                   * 1e9) AS BIGINT))::DOUBLE
                    / COUNT(*)) AS BIGINT) AS mean_rs_nano
  FROM blocks WHERE s2_num > 0
  GROUP BY event_type, m
)
SELECT event_type, CAST(m AS BIGINT) AS m,
       CAST(n_blocks AS BIGINT) AS n_blocks,
       ROUND(mean_rs_nano / 1e9, 6) + 0.0 AS mean_rs,
       ROUND((MAX(CASE WHEN m = 64 THEN LN(mean_rs_nano / 1e9) END)
                OVER (PARTITION BY event_type)
              - MAX(CASE WHEN m = 16 THEN LN(mean_rs_nano / 1e9) END)
                OVER (PARTITION BY event_type))
             / 1.3862943611198906, 6) + 0.0 AS hurst
FROM rs ORDER BY event_type, m
""")
def q_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent per metric stream via rescaled-range (R/S)
    analysis — the long-memory diagnostic: H ~ 0.5 means independent
    increments (sqrt(n) error bars hold), H -> 1 means persistent
    long-range dependence (every confidence interval the monitors
    compute is too narrow), H < 0.5 means mean reversion. The
    time-ordered series is cut into complete blocks of m = 16/32/64;
    each block contributes R/S = (max - min of cumulative deviations)
    / population std; H is the log-log slope of mean R/S vs m, which
    for the symmetric 3-point design reduces EXACTLY to
    (ln RS_64 - ln RS_16) / (2 ln 2) — the middle point carries zero
    least-squares weight.

    Determinism: values quantize to integer milli-units; cumulative
    deviations use the all-integer identity d_j = m*cum_j - j*S (no
    float mean subtraction); the block variance numerator
    m*sum(x^2) - S^2 stays in HUGEINT/DECIMAL; each block's R/S
    quantizes to nano BEFORE the cross-block mean, the mean re-rounds
    to one nano integer, and LN runs once per (stream, m) on that
    exact ratio — both engines see bit-identical doubles.

    Scale: the only per-row windows are keyed by (stream, m, block)
    with partitions bounded by m <= 64; the explode over three block
    sizes is a 3x map-side flatMap, not a shuffle multiplier (the
    shuffle keys on the block). The final slope runs over the 3-row
    per-stream spine. Zero-variance blocks drop identically on both
    engines."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    wrn = W.partitionBy("event_type").orderBy("ts", "event_id")
    base = ev.select(
        "event_type",
        F.round(F.col("value") * 1000).cast("bigint").alias("xu"),
        F.row_number().over(wrn).alias("rn"))
    tot = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    sized = (base.join(F.broadcast(tot), "event_type")
             .select("event_type", "xu", "rn", "n",
                     F.explode(F.array(F.lit(16), F.lit(32), F.lit(64)))
                     .alias("m"))
             .filter(F.floor((F.col("rn") - 1) / F.col("m"))
                     < F.floor(F.col("n") / F.col("m")))
             .select("event_type", "xu", "m",
                     F.floor((F.col("rn") - 1) / F.col("m")).alias("blk"),
                     (F.col("rn") - F.floor((F.col("rn") - 1) / F.col("m"))
                      * F.col("m")).alias("j")))
    wcum = (W.partitionBy("event_type", "m", "blk").orderBy("j")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    wblk = (W.partitionBy("event_type", "m", "blk").orderBy("j")
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    dev = sized.select(
        "event_type", "m", "blk", "xu",
        (F.col("m") * F.sum("xu").over(wcum)
         - F.col("j") * F.sum("xu").over(wblk)).alias("d"))
    blocks = (dev.groupBy("event_type", "m", "blk")
              .agg((F.max("d") - F.min("d")).alias("r_num"),
                   (F.first("m") * F.sum(F.col("xu").cast("decimal(38,0)")
                                         * F.col("xu"))
                    - F.sum("xu").cast("decimal(38,0)") * F.sum("xu"))
                   .alias("s2_num"))
              .filter(F.col("s2_num") > 0))
    rs_nano = F.round(F.col("r_num").cast("double")
                      / F.sqrt(F.col("s2_num").cast("double"))
                      * 1e9).cast("long")
    rs = (blocks.withColumn("rs_nano", rs_nano)
          .groupBy("event_type", "m")
          .agg(F.count(F.lit(1)).alias("n_blocks"),
               F.round(F.sum("rs_nano").cast("double")
                       / F.count(F.lit(1))).cast("long")
               .alias("mean_rs_nano")))
    wst = W.partitionBy("event_type")  # 3-row spine per stream
    ln_at = {m: F.max(F.when(F.col("m") == m,
                             F.log(F.col("mean_rs_nano") / 1e9))).over(wst)
             for m in (16, 64)}
    return (rs.select("event_type", F.col("m").cast("long").alias("m"),
                      F.col("n_blocks").cast("long").alias("n_blocks"),
                      (F.round(F.col("mean_rs_nano") / 1e9, 6) + 0.0)
                      .alias("mean_rs"),
                      (F.round((ln_at[64] - ln_at[16])
                               / 1.3862943611198906, 6) + 0.0)
                      .alias("hurst"))
            .orderBy("event_type", "m"))


# ---------------------------------------------------------------------------
# Cronbach's alpha: internal consistency of the k per-user item scores
# ---------------------------------------------------------------------------

from ..operators.cache_slot import CacheSlot  # noqa: E402

_CRONBACH_SLOT = CacheSlot()


@query("q_cronbach_alpha", oracle="""
WITH cells AS (
  SELECT user_id AS cs, event_type AS item,
         CAST(ROUND(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) * 1000.0
                    / COUNT(*)) AS BIGINT) AS m_nano
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), k AS (
  SELECT COUNT(DISTINCT item) AS k FROM cells
), complete AS (
  SELECT cs FROM cells CROSS JOIN k
  GROUP BY cs, k.k HAVING COUNT(*) = ANY_VALUE(k.k)
), kept AS (
  SELECT c.* FROM cells c JOIN complete USING (cs)
), item_stats AS (
  SELECT item,
         COUNT(*) AS n,
         COUNT(*) * SUM(CAST(m_nano AS HUGEINT) * m_nano)
           - CAST(SUM(m_nano) AS HUGEINT) * SUM(m_nano) AS num_i
  FROM kept GROUP BY item
), case_tot AS (
  SELECT cs, SUM(m_nano) AS t_nano FROM kept GROUP BY cs
), total_stats AS (
  SELECT COUNT(*) * SUM(CAST(t_nano AS HUGEINT) * t_nano)
           - CAST(SUM(t_nano) AS HUGEINT) * SUM(t_nano) AS num_t
  FROM case_tot
)
SELECT item,
       CAST(n AS BIGINT) AS n_cases,
       CAST(k.k AS BIGINT) AS k,
       ROUND(num_i::DOUBLE / num_t, 9) + 0.0 AS var_share,
       ROUND(k.k / (k.k - 1.0)
             * (1.0 - SUM(num_i::DOUBLE / num_t) OVER ()), 6) + 0.0
         AS alpha
FROM item_stats CROSS JOIN total_stats CROSS JOIN k
ORDER BY item
""")
def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha over the k = |event_type| per-user item scores
    (each user's mean ``value`` per stream is one item score; users
    seen on every stream are the complete cases): alpha = k/(k-1) *
    (1 - sum_i var_i / var_total) — the internal-consistency readout
    that says whether the k parallel engagement metrics measure ONE
    underlying construct (alpha -> 1) or k unrelated things
    (alpha -> 0). The reliability gate behind any composite
    "engagement score" a dashboard averages from the streams.

    Determinism: item scores are nano-quantized integers; both
    variance numerators use the exact identity n*sum(x^2) - (sum x)^2
    in HUGEINT/DECIMAL (first factor widened), so var_i/var_t are
    ratios of EXACT integers with the identical n(n-1) denominator
    cancelled — the cross-item sum adds k exact ratios quantized at
    1e-9 by the shared ROUND; one double expression forms alpha.

    Scale: one fact scan to the (user, item) cell table — bounded by
    |users| * k, cached once (CacheSlot) for its two consumers (item
    variances, per-case totals); everything downstream is keyed
    aggregation on that bounded relation; the final window runs over
    the k-row item spine."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    cells = _CRONBACH_SLOT.own(
        ev.groupBy(F.col("user_id").alias("cs"),
                   F.col("event_type").alias("item"))
        .agg(F.round(F.sum(F.round(F.col("value") * 1e6).cast("bigint"))
                     * 1000.0 / F.count(F.lit(1))).cast("bigint")
             .alias("m_nano")))
    cells.count()  # materialize once for the two consumers
    k = cells.agg(F.countDistinct("item").alias("k"))
    complete = (cells.groupBy("cs")
                .agg(F.count(F.lit(1)).alias("c"))
                .crossJoin(F.broadcast(k))
                .filter(F.col("c") == F.col("k"))
                .select("cs"))
    kept = cells.join(complete, "cs")
    item_stats = (kept.groupBy("item")
                  .agg(F.count(F.lit(1)).alias("n"),
                       (F.count(F.lit(1))
                        * F.sum(F.col("m_nano").cast("decimal(38,0)")
                                * F.col("m_nano"))
                        - F.sum("m_nano").cast("decimal(38,0)")
                        * F.sum("m_nano")).alias("num_i")))
    case_tot = kept.groupBy("cs").agg(F.sum("m_nano").alias("t_nano"))
    total_stats = case_tot.agg(
        (F.count(F.lit(1))
         * F.sum(F.col("t_nano").cast("decimal(38,0)") * F.col("t_nano"))
         - F.sum("t_nano").cast("decimal(38,0)") * F.sum("t_nano"))
        .alias("num_t"))
    wall = (W.orderBy("item")  # k-row item spine
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    share = F.round(F.col("num_i").cast("double")
                    / F.col("num_t").cast("double"), 9)
    kd = F.col("k").cast("double")
    return (item_stats
            .crossJoin(F.broadcast(total_stats))
            .crossJoin(F.broadcast(k))
            .select("item",
                    F.col("n").cast("long").alias("n_cases"),
                    F.col("k").cast("long").alias("k"),
                    (share + 0.0).alias("var_share"),
                    (F.round(kd / (kd - 1.0)
                             * (1.0 - F.sum(share).over(wall)), 6) + 0.0)
                    .alias("alpha"))
            .orderBy("item"))
