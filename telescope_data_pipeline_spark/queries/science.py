"""Round-9 experimentation, labeling-QA, and embedding-ops queries:
CUPED variance reduction, Mann-Whitney rank test, Cohen's kappa,
Benford first-digit audit, inter-arrival burstiness, rolling median,
hard-negative mining, int8 embedding quantization audit, label-centroid
similarity, and ARI readability.

These close the remaining experimentation-and-data-QA gaps a
training-data platform runs beside its dedup/quality/drift gates:
variance-reduced A/B readouts (CUPED), a nonparametric location test
(Mann-Whitney beside Welch's t), annotation agreement (kappa), fraud/
integrity auditing (Benford), temporal clumpiness (burstiness), robust
smoothing (rolling median), contrastive-training data prep (hard
negatives), embedding storage planning (int8 audit), class-geometry
audits (centroid similarity), and a classic readability quality signal
(ARI). Every query follows the registry determinism contract
(registry.py module docstring); float folds use the nano-unit integer
quantization recipe so partial-aggregation order cannot flip a hash bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.tables import load_table
from .registry import query

_TOK = r"\s+"
_SPLIT = "2024-01-16 00:00:00"


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B readout
# ---------------------------------------------------------------------------

@query("q_cuped", oracle=f"""
WITH pu AS (
  SELECT user_id, user_id % 2 AS arm,
         COALESCE(SUM(CASE WHEN ts <  TIMESTAMP '{_SPLIT}'
                           THEN CAST(ROUND(value * 100) AS BIGINT) END), 0)
           AS x,
         COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{_SPLIT}'
                           THEN CAST(ROUND(value * 100) AS BIGINT) END), 0)
           AS y
  FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL
  GROUP BY user_id
), g AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM pu
), th AS (
  SELECT n, sx, sy,
         (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
           / NULLIF(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE, 0)
           AS theta,
         (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
           * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
           / NULLIF((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE), 0)
           AS rho2
  FROM g
), a AS (
  SELECT arm, COUNT(*) AS n_arm, SUM(x) AS sxa, SUM(y) AS sya FROM pu
  GROUP BY arm
)
SELECT CAST(a.arm AS BIGINT) AS arm, CAST(n_arm AS BIGINT) AS n_users,
       ROUND(sya::DOUBLE / n_arm / 100.0, 6) + 0.0 AS mean_y,
       ROUND((sya::DOUBLE / n_arm
              - th.theta * (sxa::DOUBLE / n_arm - th.sx::DOUBLE / th.n))
             / 100.0, 6) + 0.0 AS mean_y_cuped,
       ROUND(th.theta, 6) + 0.0 AS theta,
       ROUND(th.rho2 * 100.0, 4) + 0.0 AS var_reduction_pct
FROM a CROSS JOIN th
""")
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): per-arm post-period
    purchase means adjusted by the pre-period covariate — Y' = Y -
    theta*(X - mean(X)), theta = cov(X,Y)/var(X) — the standard trick
    that cuts A/B metric variance by the pre/post correlation rho^2
    (reported as var_reduction_pct). Completes the experimentation
    family: q_ab_ttest judges, q_ab_power plans, this SHARPENS.

    Determinism: per-user X/Y are exact centi-unit integer sums; theta
    and rho^2 come from the five integer sufficient statistics via an
    IDENTICAL double expression tree on both engines (the
    q_grouped_regression recipe); zero pre-period variance NULLIFs to
    undefined rather than ANSI-crashing.

    Scale: one map-side-combined groupBy onto users, one 1-row pooled
    statistic (broadcast), one 2-row arm aggregate — the covariate
    never needs a second pass over the fact table."""
    split = F.lit(_SPLIT).cast("timestamp")
    centi = F.round(F.col("value") * 100).cast("long")
    pu = (load_table(spark, sf_dir, "events")
          .filter((F.col("event_type") == "purchase")
                  & F.col("user_id").isNotNull())
          .groupBy("user_id")
          .agg(F.coalesce(F.sum(F.when(F.col("ts") < split, centi)),
                          F.lit(0)).alias("x"),
               F.coalesce(F.sum(F.when(F.col("ts") >= split, centi)),
                          F.lit(0)).alias("y"))
          .select("user_id", (F.col("user_id") % 2).alias("arm"), "x", "y"))
    g = pu.agg(F.count(F.lit(1)).alias("n"),
               F.sum("x").alias("sx"), F.sum("y").alias("sy"),
               F.sum(F.col("x") * F.col("y")).alias("sxy"),
               F.sum(F.col("x") * F.col("x")).alias("sxx"),
               F.sum(F.col("y") * F.col("y")).alias("syy"))
    n, sx, sy, sxy, sxx, syy = (F.col(c).cast("double")
                                for c in ("n", "sx", "sy", "sxy", "sxx",
                                          "syy"))
    th = g.select(
        "n", "sx",
        ((n * sxy - sx * sy)
         / F.nullif(n * sxx - sx * sx, F.lit(0.0))).alias("theta"),
        ((n * sxy - sx * sy) * (n * sxy - sx * sy)
         / F.nullif((n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0.0)))
        .alias("rho2"))
    a = pu.groupBy("arm").agg(F.count(F.lit(1)).alias("n_arm"),
                              F.sum("x").alias("sxa"),
                              F.sum("y").alias("sya"))
    return (a.crossJoin(F.broadcast(th))
            .select(F.col("arm").cast("long").alias("arm"),
                    F.col("n_arm").cast("long").alias("n_users"),
                    (F.round(F.col("sya").cast("double") / F.col("n_arm")
                             / 100.0, 6) + 0.0).alias("mean_y"),
                    (F.round((F.col("sya").cast("double") / F.col("n_arm")
                              - F.col("theta")
                              * (F.col("sxa").cast("double") / F.col("n_arm")
                                 - F.col("sx").cast("double") / F.col("n")))
                             / 100.0, 6) + 0.0).alias("mean_y_cuped"),
                    (F.round("theta", 6) + 0.0).alias("theta"),
                    (F.round(F.col("rho2") * 100.0, 4) + 0.0)
                    .alias("var_reduction_pct")))


# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test per series
# ---------------------------------------------------------------------------

@query("q_mann_whitney", oracle="""
WITH s AS (
  SELECT event_type, value, user_id % 2 AS grp
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
), c AS (
  SELECT event_type, value,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c_a,
         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c_b,
         COUNT(*) AS c
  FROM s GROUP BY event_type, value
), r AS (
  SELECT event_type, c_a, c_b, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY value
                      ROWS UNBOUNDED PRECEDING) - c AS cum_before
  FROM c
), agg AS (
  SELECT event_type,
         SUM(c_a) AS n_a, SUM(c_b) AS n_b,
         SUM(c_a * (2 * cum_before + c + 1)) AS r2a,
         SUM(c * c * c - c) AS ties
  FROM r GROUP BY event_type
)
SELECT event_type, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND((r2a - n_a * (n_a + 1))::DOUBLE / 2.0, 1) + 0.0 AS u_stat,
       ROUND(((r2a - n_a * (n_a + 1))::DOUBLE - n_a::DOUBLE * n_b::DOUBLE)
             / (2.0 * SQRT(NULLIF(
                 n_a::DOUBLE * n_b::DOUBLE / 12.0
                 * ((n_a::DOUBLE + n_b::DOUBLE + 1.0)
                    - ties::DOUBLE
                      / NULLIF((n_a::DOUBLE + n_b::DOUBLE)
                               * (n_a::DOUBLE + n_b::DOUBLE - 1.0), 0)),
                 0))), 6) + 0.0 AS z
FROM agg
""")
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test per series (cohorts by user parity,
    as q_ab_ttest/q_ks_drift): the NONPARAMETRIC location test that
    stays valid when the metric is skewed or heavy-tailed and Welch's
    t is not — U from tie-averaged ranks, z via the tie-corrected
    normal approximation. The trio: t (means), MW (ranks), KS (whole
    distribution).

    Determinism: ranks never materialize per row — the empirical rank
    algebra runs on DISTINCT pooled values (the q_ks_drift jump-point
    recipe): 2*avg_rank = 2*cum_before + c + 1 is an exact integer, so
    2*R_a, 2*U and the tie term sum(c^3 - c) are all order-free BIGINT
    sums; the z expression is one identical double tree both sides,
    NULLIF-guarded for empty cohorts and single-row series.

    Scale: one shuffle on (type, value), one type-partitioned window
    over distinct values, one 5-row final aggregate — |distinct| per
    type, never |rows|, same as the KS plan."""
    s = (load_table(spark, sf_dir, "events")
         .filter(F.col("value").isNotNull() & F.col("user_id").isNotNull())
         .select("event_type", "value", (F.col("user_id") % 2).alias("grp")))
    c = s.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c_b"),
        F.count(F.lit(1)).alias("c"))
    w = (W.partitionBy("event_type").orderBy("value")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    r = c.withColumn("cum_before", F.sum("c").over(w) - F.col("c"))
    agg = r.groupBy("event_type").agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b"),
        F.sum(F.col("c_a") * (2 * F.col("cum_before") + F.col("c") + 1))
        .alias("r2a"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .alias("ties"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    u2 = (F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1)).cast("double")
    var = (na * nb / 12.0
           * ((na + nb + 1.0)
              - F.col("ties").cast("double")
              / F.nullif((na + nb) * (na + nb - 1.0), F.lit(0.0))))
    return agg.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (F.round(u2 / 2.0, 1) + 0.0).alias("u_stat"),
        (F.round((u2 - na * nb) / (2.0 * F.sqrt(F.nullif(var, F.lit(0.0)))),
                 6) + 0.0).alias("z"))


# ---------------------------------------------------------------------------
# Cohen's kappa inter-annotator agreement
# ---------------------------------------------------------------------------

@query("q_cohens_kappa", oracle="""
WITH ab AS (
  SELECT label AS a,
         CASE WHEN CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 2))
                        AS BIGINT) % 100 < 20
              THEN (label + 3) % 10 ELSE label END AS b
  FROM embeddings
), m AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree
  FROM ab
), ra AS (SELECT a, COUNT(*) AS ca FROM ab GROUP BY a),
cb AS (SELECT b, COUNT(*) AS cbn FROM ab GROUP BY b),
p AS (SELECT SUM(ra.ca * cb.cbn) AS pe_num FROM ra JOIN cb ON ra.a = cb.b)
SELECT CAST(n AS BIGINT) AS n,
       ROUND(agree * 1.0 / n, 6) + 0.0 AS po,
       ROUND(pe_num * 1.0 / (n * n), 6) + 0.0 AS pe,
       ROUND((n * agree - pe_num) * 1.0 / NULLIF(n * n - pe_num, 0), 6)
         + 0.0 AS kappa
FROM m CROSS JOIN p
""")
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa chance-corrected agreement between two annotators —
    the labeling-QA staple (raw percent agreement over-credits frequent
    classes; kappa subtracts the marginal-product chance rate). The
    demo's second annotator is a content-addressed 20% label
    perturbation (md5 of vec_id — reproducible on both engines), the
    q_mlm_mask seeding recipe; production points the two columns at
    real annotator outputs.

    Determinism: kappa = (n*agree - sum_k row_k*col_k)/(n^2 - sum_k
    row_k*col_k) is a single division of exact BIGINT sums — no float
    accumulation at all; rounded once at 6. The all-one-class corpus
    (pe = 1, kappa undefined) NULLIFs to NULL.

    Scale: one map-side-combined pass builds n/agree, two 10-row
    marginal aggregates join on the class key — the confusion matrix
    itself never materializes beyond its 10x10 marginals."""
    flip = (F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2),
                   16, 10).cast("long") % 100 < 20)
    ab = (load_table(spark, sf_dir, "embeddings")
          .select(F.col("label").alias("a"),
                  F.when(flip, (F.col("label") + 3) % 10)
                  .otherwise(F.col("label")).alias("b")))
    m = ab.agg(F.count(F.lit(1)).alias("n"),
               F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
               .alias("agree"))
    ra = ab.groupBy("a").agg(F.count(F.lit(1)).alias("ca"))
    cb = ab.groupBy("b").agg(F.count(F.lit(1)).alias("cbn"))
    p = (ra.join(cb, ra.a == cb.b)
         .agg(F.sum(F.col("ca") * F.col("cbn")).alias("pe_num")))
    return (m.crossJoin(F.broadcast(p))
            .select(F.col("n").cast("long").alias("n"),
                    (F.round(F.col("agree") / F.col("n"), 6) + 0.0)
                    .alias("po"),
                    (F.round(F.col("pe_num") / (F.col("n") * F.col("n")), 6)
                     + 0.0).alias("pe"),
                    (F.round((F.col("n") * F.col("agree") - F.col("pe_num"))
                             / F.nullif(F.col("n") * F.col("n")
                                        - F.col("pe_num"), F.lit(0)), 6)
                     + 0.0).alias("kappa")))


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

@query("q_benford", oracle="""
WITH v AS (
  SELECT CAST(substr(CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR),
                     1, 1) AS INT) AS digit
  FROM events
  WHERE value IS NOT NULL AND CAST(ROUND(value * 100) AS BIGINT) >= 1
), d AS (
  SELECT b.digit, COALESCE(cnt, 0) AS n_d
  FROM (SELECT CAST(UNNEST(generate_series(1, 9)) AS INT) AS digit) b
  LEFT JOIN (SELECT digit, COUNT(*) AS cnt FROM v GROUP BY digit) c
  USING (digit)
), t AS (
  SELECT digit, n_d, SUM(n_d) OVER () AS n,
         LN(1.0 + 1.0 / digit) / LN(10.0) AS p
  FROM d
), terms AS (
  SELECT digit, n_d, n, p,
         CAST(ROUND((n_d - n * p) * (n_d - n * p) / NULLIF(n * p, 0) * 1e9)
              AS BIGINT) AS t_nano
  FROM t
)
SELECT digit, CAST(n_d AS BIGINT) AS n_obs,
       ROUND(n_d * 100.0 / NULLIF(n, 0), 4) + 0.0 AS obs_pct,
       ROUND(p * 100.0, 4) + 0.0 AS exp_pct,
       ROUND(SUM(t_nano) OVER () / 1e9, 6) + 0.0 AS chi2_total
FROM terms
""")
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of the value column: observed vs
    expected log10(1 + 1/d) digit shares plus the chi-square distance —
    the forensic-accounting integrity screen (organic multiplicative
    quantities follow Benford; fabricated or unit-mangled batches do
    not). Complements q_dq_rules (schema contracts) with a
    DISTRIBUTIONAL contract.

    Determinism: the first digit comes from the INTEGER centi-unit's
    decimal string (both engines print integers identically — never
    floor(log10(double)) whose edge cases differ); chi-square terms are
    nano-quantized before the order-free sum; the no-positive-values
    corpus NULLIFs instead of dividing by zero.

    Scale: map-only digit extraction, one 9-cell map-side-combined
    count, a 9-row spine join and windows over 9 rows — shuffle volume
    is constant regardless of input."""
    vc = F.round(F.col("value") * 100).cast("long")
    v = (load_table(spark, sf_dir, "events")
         .filter(F.col("value").isNotNull())
         .select(vc.alias("vc"))
         .filter(F.col("vc") >= 1)
         .select(F.substring(F.col("vc").cast("string"), 1, 1)
                 .cast("int").alias("digit")))
    cnt = v.groupBy("digit").agg(F.count(F.lit(1)).alias("cnt"))
    bins = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    d = (bins.join(cnt, "digit", "left")
         .select("digit", F.coalesce("cnt", F.lit(0)).alias("n_d")))
    wall = W.partitionBy().orderBy("digit").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing)
    p = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    t = (d.withColumn("n", F.sum("n_d").over(wall))
         .withColumn("p", p))
    t_nano = F.round((F.col("n_d") - F.col("n") * F.col("p"))
                     * (F.col("n_d") - F.col("n") * F.col("p"))
                     / F.nullif(F.col("n") * F.col("p"), F.lit(0.0))
                     * 1e9).cast("long")
    return (t.withColumn("t_nano", t_nano)
            .select("digit", F.col("n_d").cast("long").alias("n_obs"),
                    (F.round(F.col("n_d") * 100.0
                             / F.nullif(F.col("n"), F.lit(0)), 4) + 0.0)
                    .alias("obs_pct"),
                    (F.round(F.col("p") * 100.0, 4) + 0.0).alias("exp_pct"),
                    (F.round(F.sum("t_nano").over(wall) / 1e9, 6) + 0.0)
                    .alias("chi2_total")))


# ---------------------------------------------------------------------------
# Inter-arrival burstiness per user
# ---------------------------------------------------------------------------

@query("q_burstiness", oracle="""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS t,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS pt
  FROM events WHERE user_id IS NOT NULL
), g AS (
  SELECT user_id, t - pt AS gap FROM o WHERE pt IS NOT NULL
), s AS (
  SELECT user_id, COUNT(*) AS n, SUM(gap) AS s,
         SUM(CAST(gap AS HUGEINT) * gap) AS ss
  FROM g GROUP BY user_id
  HAVING COUNT(*) >= 2
)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
       ROUND(s::DOUBLE / n / 1e6, 3) + 0.0 AS mean_gap_s,
       ROUND((SQRT(n::DOUBLE * ss::DOUBLE - s::DOUBLE * s::DOUBLE)
              - s::DOUBLE)
             / NULLIF(SQRT(n::DOUBLE * ss::DOUBLE - s::DOUBLE * s::DOUBLE)
                      + s::DOUBLE, 0), 6) + 0.0 AS burstiness
FROM s
""")
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness per user (Goh & Barabasi 2008): B =
    (sigma - mu)/(sigma + mu) over event gaps — B near -1 is periodic
    (a cron pretending to be a person), near 0 Poisson-random, near +1
    bursty (organic humans). The bot/organic separator beside
    q_sessionize (which segments) and q_acf (which probes periodicity
    per series, not per user).

    Determinism: gaps are exact microsecond integers on a (ts,
    event_id) total order; B reduces to (sqrt(n*ss - s^2) - s)/
    (sqrt(n*ss - s^2) + s) — the n cancels — so both engines evaluate
    one double tree over three integer sums (gap^2 products ride
    DECIMAL(38,0)/HUGEINT, the q_acf rule). All-zero gaps (every event
    same-timestamp) NULLIF to undefined.

    Scale: one user-partitioned window for the lag, one map-side-
    combined groupBy carrying (n, s, ss) — mergeable sufficient
    statistics, so the same counters maintain incrementally."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull()))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select("user_id", F.unix_micros("ts").alias("t"),
                  F.lag(F.unix_micros("ts")).over(w).alias("pt"))
    g = (o.filter(F.col("pt").isNotNull())
         .select("user_id", (F.col("t") - F.col("pt")).alias("gap")))
    s = (g.groupBy("user_id")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("gap").alias("s"),
              F.sum(F.col("gap").cast("decimal(38,0)") * F.col("gap"))
              .alias("ss"))
         .filter(F.col("n") >= 2))
    nd, sd = F.col("n").cast("double"), F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    root = F.sqrt(nd * ssd - sd * sd)
    return s.select(
        "user_id", F.col("n").cast("long").alias("n_gaps"),
        (F.round(sd / F.col("n") / 1e6, 3) + 0.0).alias("mean_gap_s"),
        (F.round((root - sd) / F.nullif(root + sd, F.lit(0.0)), 6) + 0.0)
        .alias("burstiness"))


# ---------------------------------------------------------------------------
# Rolling median smoother per series
# ---------------------------------------------------------------------------

@query("q_rolling_median", oracle="""
SELECT event_id, event_type,
       ROUND(MEDIAN(value) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             6) + 0.0 AS med5
FROM events
""")
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 5-event median per series — the ROBUST smoother beside
    the mean-based family (q_window_rolling averages, q_ewma/q_holt
    smooth exponentially): a single spike moves a rolling mean by
    spike/5 but leaves the rolling median untouched, which is why
    sensor and metric pipelines median-filter BEFORE thresholding
    (q_anomaly_mad's windowed twin).

    Determinism: the median of <= 5 doubles is an order statistic
    (even-count frames average the two middles — one identical IEEE
    op), invariant to tie order among equal values; rounded at 6.

    Scale: one series-partitioned window with a bounded 5-row frame —
    O(1) state per row, no whole-partition buffering (Spark's median()
    aggregate rejects window frames, so the frame is materialized as 4
    lags + an in-row array sort of <= 5 elements: same cost shape, and
    NULL values drop from the array exactly as MEDIAN ignores them).
    Long per-series partitions follow the q_acf stitch note."""
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    vals = F.array(F.col("value"), *[F.lag("value", i).over(w)
                                     for i in range(1, 5)])
    arr = F.array_sort(F.filter(vals, lambda x: x.isNotNull()))
    n = F.size(arr)
    lo = F.floor((n + 1) / 2).cast("int")
    hi = F.floor(n / 2).cast("int") + 1
    med = F.when(n == 0, F.lit(None).cast("double")).otherwise(
        (F.element_at(arr, lo) + F.element_at(arr, hi)) / 2.0)
    return (load_table(spark, sf_dir, "events")
            .select("event_id", "event_type", "ts", "value")
            .withColumn("med5", F.round(med, 6) + 0.0)
            .select("event_id", "event_type", "med5"))


# ---------------------------------------------------------------------------
# Hard-negative mining for contrastive training
# ---------------------------------------------------------------------------

@query("q_hard_negatives", oracle="""
WITH norms AS (
  SELECT vec_id, SUM(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, UNNEST(embedding) AS e FROM embeddings)
  GROUP BY vec_id
), pairs AS (
  SELECT q.vec_id AS anchor_id, q.label AS anchor_label,
         c.vec_id AS neg_id,
         CAST(UNNEST(q.embedding) AS DOUBLE) AS qe,
         CAST(UNNEST(c.embedding) AS DOUBLE) AS ce
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < 20 AND q.label <> c.label
), dots AS (
  SELECT anchor_id, anchor_label, neg_id, SUM(qe * ce) AS dot
  FROM pairs GROUP BY 1, 2, 3
), scored AS (
  SELECT anchor_id, anchor_label, neg_id,
         ROUND(dot / SQRT(NULLIF(nq.nrm * nc.nrm, 0)), 9) AS cos9
  FROM dots
  JOIN norms nq ON nq.vec_id = anchor_id
  JOIN norms nc ON nc.vec_id = neg_id
), ranked AS (
  SELECT anchor_id, anchor_label, neg_id, cos9,
         ROW_NUMBER() OVER (PARTITION BY anchor_id
                            ORDER BY cos9 DESC, neg_id) AS rn
  FROM scored
)
SELECT anchor_id, CAST(anchor_label AS INT) AS anchor_label, neg_id,
       rn AS rank, ROUND(cos9, 6) + 0.0 AS cosine
FROM ranked WHERE rn <= 3
""")
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-3 most-similar vectors with a DIFFERENT label — the examples a
    triplet/InfoNCE loss learns most from (random negatives quickly
    become trivial; hard ones keep the gradient alive). Pairs with
    q_negative_sample (which draws the RANDOM negatives) and feeds
    q_label_knn_noise's audit.

    Determinism: cosines rounded to 9 digits BEFORE ranking with
    neg_id tiebreaks (the q_weighted_sample rule); zero-norm vectors
    NULLIF to NULL and sort last.

    Scale: the demo scores 20 anchors against the corpus via a
    broadcast of the bounded anchor side (the q_sim_topk exactness-
    anchor shape) — the BOUNDED 20-row side is the broadcast build
    side, the unbounded corpus streams (round-9 ADVICE: broadcasting
    the corpus would OOM at scale); the production path generates
    candidates with the LSH/IVF bucketers (operators/similarity.py)
    and applies the same different-label filter bucket-locally."""
    e = load_table(spark, sf_dir, "embeddings", spread=True)
    norm = F.aggregate(F.col("embedding"), F.lit(0.0),
                       lambda acc, x: acc + x.cast("double") * x.cast("double"))
    wn = e.select("vec_id", "label", "embedding", norm.alias("nrm"))
    q = (wn.filter(F.col("vec_id") < 20)
         .select(F.col("vec_id").alias("anchor_id"),
                 F.col("label").alias("anchor_label"),
                 F.col("embedding").alias("qv"), F.col("nrm").alias("qn")))
    c = wn.select(F.col("vec_id").alias("neg_id"),
                  F.col("label").alias("neg_label"),
                  F.col("embedding").alias("cv"), F.col("nrm").alias("cn"))
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (c.join(F.broadcast(q),
                     F.col("anchor_label") != F.col("neg_label"))
              .withColumn("cos9", F.round(
                  dot / F.sqrt(F.nullif(F.col("qn") * F.col("cn"),
                                        F.lit(0.0))), 9)))
    w = W.partitionBy("anchor_id").orderBy(F.desc("cos9"), F.asc("neg_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("anchor_id",
                    F.col("anchor_label").cast("int").alias("anchor_label"),
                    "neg_id", F.col("rn").alias("rank"),
                    (F.round("cos9", 6) + 0.0).alias("cosine")))


# ---------------------------------------------------------------------------
# int8 embedding quantization audit
# ---------------------------------------------------------------------------

@query("q_embed_int8", oracle="""
WITH x AS (
  SELECT vec_id, label, CAST(e AS DOUBLE) AS xe
  FROM (SELECT vec_id, label, UNNEST(embedding) AS e FROM embeddings)
), sc AS (
  SELECT MAX(ABS(xe)) / 127.0 AS s FROM x
), qx AS (
  SELECT vec_id, label, xe,
         LEAST(127, GREATEST(-127,
             CAST(FLOOR(xe / NULLIF(sc.s, 0) + 0.5) AS BIGINT))) * sc.s
           AS xr,
         CASE WHEN ABS(FLOOR(xe / NULLIF(sc.s, 0) + 0.5)) > 127
              THEN 1 ELSE 0 END AS clipped
  FROM x CROSS JOIN sc
), pv AS (
  SELECT vec_id, label,
         SUM(CAST(ROUND(xe * xr * 1e9) AS BIGINT)) AS dot_n,
         SUM(CAST(ROUND(xe * xe * 1e9) AS BIGINT)) AS na_n,
         SUM(CAST(ROUND(xr * xr * 1e9) AS BIGINT)) AS nb_n,
         SUM(CAST(ROUND((xe - xr) * (xe - xr) * 1e12) AS BIGINT)) AS se_p,
         SUM(clipped) AS n_clip,
         COUNT(*) AS dim
  FROM qx GROUP BY vec_id, label
), pc AS (
  SELECT label,
         CAST(ROUND(dot_n / SQRT(NULLIF(na_n::DOUBLE * nb_n::DOUBLE, 0))
                    * 1e9) AS BIGINT) AS cos_n,
         se_p, n_clip, dim
  FROM pv
)
SELECT CAST(label AS INT) AS label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(SUM(cos_n) / 1e9 / COUNT(*), 6) + 0.0 AS avg_cosine,
       ROUND(SUM(se_p) / 1e12 / SUM(dim), 9) + 0.0 AS mse,
       CAST(SUM(n_clip) AS BIGINT) AS n_clipped
FROM pc GROUP BY label
""")
def q_embed_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar-quantization audit: quantize every
    embedding element with the corpus-wide scale max|x|/127, then
    report per label the reconstruction cosine, the per-element MSE,
    and the clip count — the storage-planning readout for shipping a
    vector index at 1/4 the bytes (beside q_pq_adc, which audits the
    much lossier product quantizer). avg_cosine >= 0.999 is the usual
    'safe to ship int8' bar.

    Determinism: q = floor(x/s + 0.5) clamped (floor is engine-
    identical, never ROUND-half ties); per-vector cosine/MSE folds are
    nano/pico-quantized integer sums (order-free), the per-vector
    cosine re-quantizes to nano before the per-label average so the
    outer mean is an exact integer division. All-zero corpus NULLIFs.

    Scale: one global max (1-row broadcast), then map-only explode +
    two map-side-combined groupBys (onto vectors, then onto 10
    labels) — the audit never shuffles the vectors themselves."""
    e = load_table(spark, sf_dir, "embeddings", spread=True)
    x = e.select("vec_id", "label",
                 F.explode("embedding").alias("e0")) \
         .select("vec_id", "label", F.col("e0").cast("double").alias("xe"))
    sc = x.agg((F.max(F.abs("xe")) / 127.0).alias("s"))
    qraw = F.floor(F.col("xe") / F.nullif(F.col("s"), F.lit(0.0)) + 0.5)
    qx = (x.crossJoin(F.broadcast(sc))
          .select("vec_id", "label", "xe",
                  (F.least(F.lit(127), F.greatest(F.lit(-127),
                   qraw.cast("long"))) * F.col("s")).alias("xr"),
                  F.when(F.abs(qraw) > 127, 1).otherwise(0).alias("clipped")))
    pv = qx.groupBy("vec_id", "label").agg(
        F.sum(F.round(F.col("xe") * F.col("xr") * 1e9).cast("long"))
        .alias("dot_n"),
        F.sum(F.round(F.col("xe") * F.col("xe") * 1e9).cast("long"))
        .alias("na_n"),
        F.sum(F.round(F.col("xr") * F.col("xr") * 1e9).cast("long"))
        .alias("nb_n"),
        F.sum(F.round((F.col("xe") - F.col("xr"))
                      * (F.col("xe") - F.col("xr")) * 1e12).cast("long"))
        .alias("se_p"),
        F.sum("clipped").alias("n_clip"),
        F.count(F.lit(1)).alias("dim"))
    cos_n = F.round(
        F.col("dot_n") / F.sqrt(F.nullif(
            F.col("na_n").cast("double") * F.col("nb_n").cast("double"),
            F.lit(0.0))) * 1e9).cast("long")
    pc = pv.select("label", cos_n.alias("cos_n"), "se_p", "n_clip", "dim")
    return (pc.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum("cos_n").alias("sc_n"), F.sum("se_p").alias("sse_p"),
                 F.sum("dim").alias("sdim"), F.sum("n_clip").alias("nclip"))
            .select(F.col("label").cast("int").alias("label"),
                    F.col("n_vecs").cast("long").alias("n_vecs"),
                    (F.round(F.col("sc_n") / 1e9 / F.col("n_vecs"), 6) + 0.0)
                    .alias("avg_cosine"),
                    (F.round(F.col("sse_p") / 1e12 / F.col("sdim"), 9) + 0.0)
                    .alias("mse"),
                    F.col("nclip").cast("long").alias("n_clipped")))


# ---------------------------------------------------------------------------
# Label-centroid pairwise similarity (class-geometry audit)
# ---------------------------------------------------------------------------

@query("q_centroid_sim", oracle="""
WITH x AS (
  SELECT label, CAST(t.j AS BIGINT) AS j,
         embedding[CAST(t.j AS BIGINT)]::DOUBLE AS xj
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(j)
), cell AS (
  SELECT label, j, SUM(CAST(ROUND(xj * 1e9) AS BIGINT)) AS s_n,
         COUNT(*) AS n
  FROM x GROUP BY label, j
), cen AS (
  SELECT label, j, s_n::DOUBLE / 1e9 / n AS c FROM cell
), dots AS (
  SELECT a.label AS label_a, b.label AS label_b,
         SUM(CAST(ROUND(a.c * b.c * 1e9) AS BIGINT)) AS dot_n
  FROM cen a JOIN cen b ON a.j = b.j AND a.label < b.label
  GROUP BY 1, 2
), nrm AS (
  SELECT label, SUM(CAST(ROUND(c * c * 1e9) AS BIGINT)) AS n_n
  FROM cen GROUP BY label
)
SELECT label_a, label_b,
       ROUND(dot_n / SQRT(NULLIF(na.n_n::DOUBLE * nb.n_n::DOUBLE, 0)), 6)
         + 0.0 AS cosine
FROM dots
JOIN nrm na ON na.label = label_a
JOIN nrm nb ON nb.label = label_b
""")
def q_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label embedding CENTROIDS — the
    class-geometry audit (two classes whose centroids sit at cosine
    0.98 will confuse any classifier; a curation pass should merge or
    re-label them). The corpus-level companion to q_label_knn_noise's
    per-point audit and q_semdedup's cluster pruning.

    Determinism: per-(label, dim) sums nano-quantize before the
    order-free integer fold; centroid dots and norms re-quantize the
    64-term folds the same way; one guarded division at the end.

    Scale: the full-data pass is ONE map-side-combined groupBy onto
    |labels| x d cells (explode is in-row); everything after operates
    on the 640-cell table — the 45-pair self-join is metadata-sized.
    At 100 TB this is the cheapest class-overlap signal there is."""
    e = load_table(spark, sf_dir, "embeddings", spread=True)
    x = (e.select("label", F.posexplode("embedding").alias("j0", "xj"))
         .select("label", (F.col("j0") + 1).cast("long").alias("j"),
                 F.col("xj").cast("double").alias("xj")))
    cell = x.groupBy("label", "j").agg(
        F.sum(F.round(F.col("xj") * 1e9).cast("long")).alias("s_n"),
        F.count(F.lit(1)).alias("n"))
    cen = cell.select("label", "j",
                      (F.col("s_n").cast("double") / 1e9 / F.col("n"))
                      .alias("c"))
    a = cen.select(F.col("label").alias("label_a"), "j",
                   F.col("c").alias("ca"))
    b = cen.select(F.col("label").alias("label_b"), "j",
                   F.col("c").alias("cb"))
    dots = (a.join(b, ["j"]).filter(F.col("label_a") < F.col("label_b"))
            .groupBy("label_a", "label_b")
            .agg(F.sum(F.round(F.col("ca") * F.col("cb") * 1e9)
                       .cast("long")).alias("dot_n")))
    nrm = cen.groupBy("label").agg(
        F.sum(F.round(F.col("c") * F.col("c") * 1e9).cast("long"))
        .alias("n_n"))
    na = nrm.select(F.col("label").alias("label_a"), F.col("n_n").alias("na"))
    nb = nrm.select(F.col("label").alias("label_b"), F.col("n_n").alias("nb"))
    return (dots.join(F.broadcast(na), "label_a")
            .join(F.broadcast(nb), "label_b")
            .select("label_a", "label_b",
                    (F.round(F.col("dot_n")
                             / F.sqrt(F.nullif(
                                 F.col("na").cast("double")
                                 * F.col("nb").cast("double"),
                                 F.lit(0.0))), 6) + 0.0).alias("cosine")))


# ---------------------------------------------------------------------------
# ARI readability score per document
# ---------------------------------------------------------------------------

@query("q_readability_ari", oracle=r"""
WITH m AS (
  SELECT doc_id,
         LENGTH(REGEXP_REPLACE(text, '[^!-~]', '', 'g')) AS n_chars,
         len(list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x != '')) AS n_words,
         GREATEST(1, len(string_split_regex(text, '[.!?]+')) - 1)
           AS n_sents
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sents AS BIGINT) AS n_sents,
       CAST(ROUND((471 * n_chars * n_sents + 50 * n_words * n_words
                   - 2143 * n_words * n_sents) * 100.0
                  / NULLIF(n_words * n_sents, 0)) AS BIGINT) / 10000.0
         + 0.0 AS ari
FROM m
""")
def q_readability_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automated Readability Index per document: 4.71*(chars/words) +
    0.5*(words/sentences) - 21.43 — the readability formula that needs
    NO syllable dictionary (chars and word/sentence boundaries only),
    which is what makes it computable engine-side at corpus scale. A
    quality-mix signal beside q_doc_quality's ratio gates: a crawl
    whose ARI distribution lurches toward 25+ is ingesting code dumps
    and tables, not prose.

    Determinism: all three counts are exact integers from identical
    regex semantics both engines (split counts, not float heuristics);
    the character count is ASCII-printable ([!-~]) because JVM
    string length counts UTF-16 units while DuckDB counts code points
    — a non-BMP emoji would differ by 1 — and ARI's coefficients were
    fit on ASCII prose anyway. The score itself is an EXACT RATIONAL:
    ari = (471*nc*ns + 50*nw^2 - 2143*nw*ns) / (100*nw*ns), so both
    engines perform ONE identical integer-numerator division and round
    in integer space (a two-term float fold rounded at 4 landed on a
    half boundary in the sf corpus and split the engines by an ulp).
    Empty-token docs NULLIF (ARI undefined on zero words, never a
    crash).

    Scale: map-only — three regexp passes per row, zero shuffle; the
    same gate-at-the-scan shape as the rest of the text-quality
    family."""
    d = (load_table(spark, sf_dir, "documents", spread=True)
         .filter(F.col("text").isNotNull()))
    n_chars = F.length(F.regexp_replace("text", r"[^!-~]", ""))
    n_words = F.size(F.filter(F.split(F.lower("text"), _TOK),
                              lambda x: x != ""))
    n_sents = F.greatest(F.lit(1), F.size(F.split("text", r"[.!?]+")) - 1)
    m = d.select("doc_id", n_chars.alias("n_chars"), n_words.alias("n_words"),
                 n_sents.alias("n_sents"))
    # The counts come back int32 (F.length/F.size); the numerator terms
    # overflow 2^31 on realistic documents (50*nw^2 alone at ~6,600
    # words), which under Spark 4 ANSI mode is an ARITHMETIC_OVERFLOW
    # crash — and DuckDB's LENGTH/len are BIGINT, so the engines would
    # diverge before crashing. Widen to long BEFORE any arithmetic
    # (round-9 ADVICE, high).
    nc, nw, ns = [F.col(c).cast("long")
                  for c in ("n_chars", "n_words", "n_sents")]
    ari = (F.round((471 * nc * ns + 50 * nw * nw - 2143 * nw * ns) * 100.0
                   / F.nullif(nw * ns, F.lit(0))).cast("long")
           / 10000.0 + 0.0)
    return m.select(
        "doc_id", F.col("n_words").cast("long").alias("n_words"),
        F.col("n_sents").cast("long").alias("n_sents"), ari.alias("ari"))
