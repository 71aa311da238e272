"""Second-order diagnostics & release gates (round 12, session 3).

The checks a pipeline runs AFTER the first-order monitors pass: is the
residual autocorrelation structure clean enough to trust the control
bands (q_ljung_box, the portmanteau test that closes the q_acf/q_pacf/
q_durbin_watson family), does one operational series actually carry
predictive information about another (q_granger, the causality probe
behind every "orders lead shipments" dashboard claim), is a privacy
release's sensitive-attribute distribution close enough to the global
one inside every equivalence class (q_tcloseness, completing the
k-anonymity -> l-diversity -> t-closeness trio), what does the metric's
full density actually look like (q_kde_curve — a kernel density curve,
not just moments), which embedding rows sit in low-density regions
(q_knn_outlier, the multivariate complement to the univariate IQR/MAD
screens), and how unequal is the corpus under an explicit inequality-
aversion parameter (q_atkinson, the welfare-theoretic index next to
Gini/Theil/MLD).

Reference parity: the reference pipeline's per-campaign residual QA
(telescope-data-pipeline core.py:470-505 inspects fit residuals before
accepting a photometry solution) generalized to corpus-scale release
diagnostics over the driver tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test (lags 1-3) per metric stream
# ---------------------------------------------------------------------------

@query("q_ljung_box", oracle="""
WITH base AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * 1000000) AS BIGINT) AS xu
  FROM events WHERE value IS NOT NULL
), tot AS (
  SELECT event_type, COUNT(*) AS n, SUM(xu) AS s
  FROM base GROUP BY event_type
), dev AS (
  SELECT b.event_type, t.n,
         CAST(t.n AS HUGEINT) * b.xu - t.s AS d,
         LAG(CAST(t.n AS HUGEINT) * b.xu - t.s, 1) OVER w AS d1,
         LAG(CAST(t.n AS HUGEINT) * b.xu - t.s, 2) OVER w AS d2,
         LAG(CAST(t.n AS HUGEINT) * b.xu - t.s, 3) OVER w AS d3
  FROM base b JOIN tot t USING (event_type)
  WINDOW w AS (PARTITION BY b.event_type ORDER BY b.ts, b.event_id)
), r AS (
  SELECT event_type, CAST(n AS BIGINT) AS n,
         ROUND(SUM(d * d1)::DOUBLE / NULLIF(SUM(d * d), 0) * 1e12)
           / 1e12 AS r1,
         ROUND(SUM(d * d2)::DOUBLE / NULLIF(SUM(d * d), 0) * 1e12)
           / 1e12 AS r2,
         ROUND(SUM(d * d3)::DOUBLE / NULLIF(SUM(d * d), 0) * 1e12)
           / 1e12 AS r3
  FROM dev GROUP BY event_type, n
), q AS (
  SELECT event_type, n,
         n * (n + 2.0) * (r1 * r1 / (n - 1)) AS q1,
         n * (n + 2.0) * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)) AS q2,
         n * (n + 2.0) * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)
                          + r3 * r3 / (n - 3)) AS q3
  FROM r
)
SELECT event_type, n,
       ROUND(q1, 6) + 0.0 AS lb_q1,
       ROUND(q2, 6) + 0.0 AS lb_q2,
       ROUND(q3, 6) + 0.0 AS lb_q3,
       q3 > 7.814728 AS reject_95
FROM q ORDER BY event_type
""")
def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test per metric stream: Q_m = n(n+2) *
    sum_{k<=m} r_k^2/(n-k) at m = 1..3 — the OMNIBUS serial-dependence
    test that closes the q_acf (per-lag estimate) / q_pacf (AR order) /
    q_durbin_watson (lag-1 only) family: one number saying whether the
    first three autocorrelations are JOINTLY zero, which is the
    precondition for treating control-band excursions as independent
    evidence. reject_95 compares Q_3 to the chi-square(3) 95% critical
    value 7.814728.

    Determinism: the r_k ratios reuse q_acf's exact-integer deviation
    algebra (d = n*x - sum over micro-unit ints, HUGEINT/DECIMAL
    products) and quantize to 1e-12 before entering the Q polynomial,
    so both engines run the identical double tree; the boolean compares
    that shared double to a literal.

    Scale: identical plan shape to q_acf — per-series totals broadcast
    back, one keyed lag window, one final aggregate; 5 output rows."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    base = ev.select(
        "event_type", "ts", "event_id",
        F.round(F.col("value") * 1e6).cast("bigint").alias("xu"))
    tot = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("xu").alias("s"))
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    d = (F.col("n").cast("decimal(38,0)") * F.col("xu")
         - F.col("s"))  # widen FIRST: n*xu wraps int64 past ~9e18
    dev = (base.join(F.broadcast(tot), "event_type")
           .select("event_type", "ts", "event_id", "n", d.alias("d"))
           .select("event_type", "n", "d",
                   F.lag("d", 1).over(w).alias("d1"),
                   F.lag("d", 2).over(w).alias("d2"),
                   F.lag("d", 3).over(w).alias("d3")))
    den = F.sum(F.col("d") * F.col("d"))

    def rr(lagcol: str):
        return (F.round(F.sum(F.col("d") * F.col(lagcol)).cast("double")
                        / F.nullif(den.cast("double"), F.lit(0.0))
                        * 1e12) / 1e12)

    r = (dev.groupBy("event_type", "n")
         .agg(rr("d1").alias("r1"), rr("d2").alias("r2"),
              rr("d3").alias("r3")))
    n = F.col("n").cast("double")
    t1 = F.col("r1") * F.col("r1") / (n - 1)
    t2 = F.col("r2") * F.col("r2") / (n - 2)
    t3 = F.col("r3") * F.col("r3") / (n - 3)
    scale = n * (n + 2.0)
    return (r.select(
        "event_type", F.col("n").cast("long").alias("n"),
        (F.round(scale * t1, 6) + 0.0).alias("lb_q1"),
        (F.round(scale * (t1 + t2), 6) + 0.0).alias("lb_q2"),
        (F.round(scale * (t1 + t2 + t3), 6) + 0.0).alias("lb_q3"),
        (scale * (t1 + t2 + t3) > 7.814728).alias("reject_95"))
        .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Granger causality (lag 1) between daily ordered and shipped revenue
# ---------------------------------------------------------------------------

@query("q_granger", oracle="""
WITH a AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x
  FROM orders GROUP BY 1
), b AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
           AS day,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS y
  FROM lineitem GROUP BY 1
), j AS (
  SELECT a.day, a.x, b.y,
         LAG(a.x) OVER (ORDER BY a.day) AS xl,
         LAG(b.y) OVER (ORDER BY a.day) AS yl,
         a.day - LAG(a.day) OVER (ORDER BY a.day) AS gap
  FROM a JOIN b USING (day)
), c AS (
  SELECT * FROM j WHERE xl IS NOT NULL AND gap = 1
), s AS (
  SELECT COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(xl) AS sxl, SUM(yl) AS syl,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy,
         SUM(CAST(xl AS HUGEINT) * xl) AS sxlxl,
         SUM(CAST(yl AS HUGEINT) * yl) AS sylyl,
         SUM(CAST(x AS HUGEINT) * xl) AS sxxl,
         SUM(CAST(x AS HUGEINT) * yl) AS sxyl,
         SUM(CAST(y AS HUGEINT) * xl) AS syxl,
         SUM(CAST(y AS HUGEINT) * yl) AS syyl,
         SUM(CAST(xl AS HUGEINT) * yl) AS sxlyl
  FROM c
), m AS (
  SELECT n,
         n * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS cxx,
         n * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS cyy,
         n * sxlxl::DOUBLE - sxl::DOUBLE * sxl::DOUBLE AS c11,
         n * sylyl::DOUBLE - syl::DOUBLE * syl::DOUBLE AS c22,
         n * sxlyl::DOUBLE - sxl::DOUBLE * syl::DOUBLE AS c12,
         n * sxxl::DOUBLE - sx::DOUBLE * sxl::DOUBLE AS cx1,
         n * sxyl::DOUBLE - sx::DOUBLE * syl::DOUBLE AS cx2,
         n * syxl::DOUBLE - sy::DOUBLE * sxl::DOUBLE AS cy1,
         n * syyl::DOUBLE - sy::DOUBLE * syl::DOUBLE AS cy2
  FROM s
), f AS (
  SELECT n, cxx, cyy,
         -- y on (yl) vs y on (yl, xl): does ordered (x) cause shipped (y)?
         cyy - cy2 * cy2 / NULLIF(c22, 0) AS rss_r_y,
         cyy - (cy2 * c11 - cy1 * c12) / NULLIF(c11 * c22 - c12 * c12, 0)
                 * cy2
             - (cy1 * c22 - cy2 * c12) / NULLIF(c11 * c22 - c12 * c12, 0)
                 * cy1 AS rss_u_y,
         -- x on (xl) vs x on (xl, yl): does shipped (y) cause ordered (x)?
         cxx - cx1 * cx1 / NULLIF(c11, 0) AS rss_r_x,
         cxx - (cx1 * c22 - cx2 * c12) / NULLIF(c11 * c22 - c12 * c12, 0)
                 * cx1
             - (cx2 * c11 - cx1 * c12) / NULLIF(c11 * c22 - c12 * c12, 0)
                 * cx2 AS rss_u_x
  FROM m
)
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND((rss_r_y - rss_u_y) * (n - 3) / NULLIF(rss_u_y, 0), 6)
         + 0.0 AS f_orders_cause_shipped,
       ROUND((rss_r_x - rss_u_x) * (n - 3) / NULLIF(rss_u_x, 0), 6)
         + 0.0 AS f_shipped_cause_orders,
       ROUND(1 - rss_u_y / NULLIF(cyy, 0), 6) + 0.0 AS r2_shipped,
       ROUND(1 - rss_u_x / NULLIF(cxx, 0), 6) + 0.0 AS r2_orders
FROM f
""")
def q_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality F-tests between the daily ORDERED and
    daily SHIPPED revenue series, both directions at once: does adding
    yesterday's orders to yesterday's shipments improve today's
    shipment prediction (F_orders->shipped), and vice versa — the
    causality layer above q_ccf_lags (correlation at lag k says the
    series co-move; Granger asks whether the lag carries INCREMENTAL
    information). F = (RSS_restricted - RSS_unrestricted)*(n-3)/RSS_u
    with closed-form 2-regressor OLS from centered cross-moments.

    Determinism: both daily series are exact centi-unit integer sums;
    consecutive-day pairs come from ONE lag window over the bounded
    daily table (gap days drop on both sides via the day-difference
    guard); the 13 sufficient statistics are exact HUGEINT/DECIMAL
    sums; every F and R^2 comes out of one shared double tree with
    NULLIF guards for constant series.

    Scale: each fact stream collapses to its calendar-bounded daily
    table (~2.4k rows regardless of fact size) via map-side-combined
    groupBys; the single unpartitioned lag window runs over that
    bounded table (the approved q_lorenz_points shape); output is one
    row."""
    epoch = F.lit("1970-01-01")
    a = (load_table(spark, sf_dir, "orders")
         .groupBy(F.datediff(F.to_date("o_orderdate"), F.to_date(epoch))
                  .cast("long").alias("day"))
         .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
              .alias("x")))
    b = (load_table(spark, sf_dir, "lineitem")
         .groupBy(F.datediff(F.to_date("l_shipdate"), F.to_date(epoch))
                  .cast("long").alias("day"))
         .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
              .alias("y")))
    w = W.orderBy("day")  # bounded daily table (~2.4k rows)
    j = (a.join(b, "day")
         .select("day", "x", "y",
                 F.lag("x").over(w).alias("xl"),
                 F.lag("y").over(w).alias("yl"),
                 (F.col("day") - F.lag("day").over(w)).alias("gap")))
    c = j.filter(F.col("xl").isNotNull() & (F.col("gap") == 1))
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    s = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum("xl").alias("sxl"), F.sum("yl").alias("syl"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
        F.sum(dec("xl") * F.col("xl")).alias("sxlxl"),
        F.sum(dec("yl") * F.col("yl")).alias("sylyl"),
        F.sum(dec("x") * F.col("xl")).alias("sxxl"),
        F.sum(dec("x") * F.col("yl")).alias("sxyl"),
        F.sum(dec("y") * F.col("xl")).alias("syxl"),
        F.sum(dec("y") * F.col("yl")).alias("syyl"),
        F.sum(dec("xl") * F.col("yl")).alias("sxlyl"))
    n = F.col("n").cast("double")
    dd = lambda col: F.col(col).cast("double")  # noqa: E731
    cxx = n * dd("sxx") - dd("sx") * dd("sx")
    cyy = n * dd("syy") - dd("sy") * dd("sy")
    c11 = n * dd("sxlxl") - dd("sxl") * dd("sxl")
    c22 = n * dd("sylyl") - dd("syl") * dd("syl")
    c12 = n * dd("sxlyl") - dd("sxl") * dd("syl")
    cx1 = n * dd("sxxl") - dd("sx") * dd("sxl")
    cx2 = n * dd("sxyl") - dd("sx") * dd("syl")
    cy1 = n * dd("syxl") - dd("sy") * dd("sxl")
    cy2 = n * dd("syyl") - dd("sy") * dd("syl")
    det = F.nullif(c11 * c22 - c12 * c12, F.lit(0.0))
    # unrestricted coefficients (numerators over the shared determinant)
    by1 = (cy1 * c22 - cy2 * c12) / det   # y_t on x_{t-1} given y_{t-1}
    by2 = (cy2 * c11 - cy1 * c12) / det   # y_t on y_{t-1}
    bx1 = (cx1 * c22 - cx2 * c12) / det   # x_t on x_{t-1}
    bx2 = (cx2 * c11 - cx1 * c12) / det   # x_t on y_{t-1} given x_{t-1}
    rss_r_y = cyy - cy2 * cy2 / F.nullif(c22, F.lit(0.0))
    rss_u_y = cyy - by2 * cy2 - by1 * cy1
    rss_r_x = cxx - cx1 * cx1 / F.nullif(c11, F.lit(0.0))
    rss_u_x = cxx - bx1 * cx1 - bx2 * cx2
    return s.select(
        F.col("n").cast("long").alias("n_days"),
        (F.round((rss_r_y - rss_u_y) * (n - 3)
                 / F.nullif(rss_u_y, F.lit(0.0)), 6) + 0.0)
        .alias("f_orders_cause_shipped"),
        (F.round((rss_r_x - rss_u_x) * (n - 3)
                 / F.nullif(rss_u_x, F.lit(0.0)), 6) + 0.0)
        .alias("f_shipped_cause_orders"),
        (F.round(1 - rss_u_y / F.nullif(cyy, F.lit(0.0)), 6) + 0.0)
        .alias("r2_shipped"),
        (F.round(1 - rss_u_x / F.nullif(cxx, F.lit(0.0)), 6) + 0.0)
        .alias("r2_orders"))


# ---------------------------------------------------------------------------
# t-closeness release audit (completes k-anonymity -> l-diversity -> t)
# ---------------------------------------------------------------------------

@query("q_tcloseness", oracle="""
WITH j AS (
  SELECT c_nationkey, c_mktsegment,
         CASE o_orderpriority
           WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
           WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
           ELSE 5 END AS pr
  FROM customer JOIN orders ON o_custkey = c_custkey
), g AS (
  SELECT pr, COUNT(*) AS gq FROM j GROUP BY pr
), gt AS (
  SELECT SUM(gq) AS gn FROM g
), cls AS (
  SELECT c_nationkey, c_mktsegment, pr, COUNT(*) AS cq
  FROM j GROUP BY 1, 2, 3
), spine AS (
  SELECT DISTINCT c_nationkey, c_mktsegment, s.pr
  FROM cls CROSS JOIN (SELECT UNNEST(generate_series(1, 5)) AS pr) s
), full_t AS (
  SELECT sp.c_nationkey, sp.c_mktsegment, sp.pr,
         COALESCE(cls.cq, 0) AS cq, g.gq, gt.gn
  FROM spine sp
  LEFT JOIN cls USING (c_nationkey, c_mktsegment, pr)
  JOIN g ON g.pr = sp.pr CROSS JOIN gt
), cum AS (
  SELECT c_nationkey, c_mktsegment, pr, cq, gq, gn,
         SUM(cq) OVER w AS ccum, SUM(gq) OVER w AS gcum,
         SUM(cq) OVER (PARTITION BY c_nationkey, c_mktsegment) AS cn
  FROM full_t
  WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment ORDER BY pr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), terms AS (
  SELECT c_nationkey, c_mktsegment, cn,
         CAST(ROUND(ABS(ccum::DOUBLE / NULLIF(cn, 0)
                        - gcum::DOUBLE / NULLIF(gn, 0)) * 1e9) AS BIGINT)
           AS d_nano
  FROM cum
)
SELECT c_nationkey, c_mktsegment, CAST(cn AS BIGINT) AS n,
       ROUND(SUM(d_nano) / 4.0 / 1e9, 6) + 0.0 AS t_emd,
       SUM(d_nano) / 4.0 / 1e9 > 0.2 AS breach_02
FROM terms GROUP BY 1, 2, 3
ORDER BY c_nationkey, c_mktsegment
""")
def q_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit of the (nation, segment) release against the
    ORDINAL sensitive attribute order priority — the final member of
    the privacy-release trio (q_kanonymity: classes big enough;
    q_ldiversity: sensitive values diverse enough; t-closeness:
    sensitive DISTRIBUTION inside each class no farther than t from
    the global one, which blocks the skewness attack l-diversity
    misses). Distance is the ordered-EMD from the t-closeness paper:
    t = (1/(m-1)) * sum_i |CDF_class(i) - CDF_global(i)| over the
    m = 5 ordered priorities; breach_02 flags classes past t = 0.2.

    Determinism: class and global counts are integers; CDFs are
    integer sums over the per-class 5-row priority spine; each |CDF
    gap| quantizes to nano units BEFORE the cross-level sum
    (quantize-before-sum); one division by (m-1) at the end.

    Scale: one fact-join scan feeds both the class cells and the
    (broadcast) 5-row global distribution; the spine join and the
    cumulative windows are KEYED by class (bounded 5-row frames);
    shuffle volume is |classes| * 5 regardless of input size."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority")
    pr = (F.when(F.col("o_orderpriority") == "1-URGENT", 1)
          .when(F.col("o_orderpriority") == "2-HIGH", 2)
          .when(F.col("o_orderpriority") == "3-MEDIUM", 3)
          .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 4)
          .otherwise(5))
    # plain equi-join: customer is released-data scale, so the join
    # strategy is AQE's call (broadcast at demo SFs, shuffle at 100 TB)
    j = (orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
         .select("c_nationkey", "c_mktsegment", pr.alias("pr")))
    g = j.groupBy("pr").agg(F.count(F.lit(1)).alias("gq"))
    gt = g.agg(F.sum("gq").alias("gn"))
    cls = (j.groupBy("c_nationkey", "c_mktsegment", "pr")
           .agg(F.count(F.lit(1)).alias("cq")))
    classes = cls.select("c_nationkey", "c_mktsegment").distinct()
    spine = classes.crossJoin(
        F.broadcast(spark.range(1, 6)
                    .select(F.col("id").cast("int").alias("pr"))))
    full = (spine.join(cls, ["c_nationkey", "c_mktsegment", "pr"], "left")
            .join(F.broadcast(g), "pr")
            .crossJoin(F.broadcast(gt))
            .select("c_nationkey", "c_mktsegment", "pr",
                    F.coalesce("cq", F.lit(0)).alias("cq"), "gq", "gn"))
    wcum = (W.partitionBy("c_nationkey", "c_mktsegment").orderBy("pr")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    wall = (W.partitionBy("c_nationkey", "c_mktsegment").orderBy("pr")
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    d_nano = F.round(F.abs(
        F.sum("cq").over(wcum).cast("double")
        / F.nullif(F.sum("cq").over(wall), F.lit(0))
        - F.sum("gq").over(wcum).cast("double")
        / F.nullif(F.col("gn"), F.lit(0))) * 1e9).cast("long")
    terms = (full
             .withColumn("cn", F.sum("cq").over(wall))
             .withColumn("d_nano", d_nano))
    t_emd = F.sum("d_nano") / 4.0 / 1e9
    return (terms.groupBy("c_nationkey", "c_mktsegment",
                          F.col("cn").cast("long").alias("n"))
            .agg((F.round(t_emd, 6) + 0.0).alias("t_emd"),
                 (t_emd > 0.2).alias("breach_02"))
            .orderBy("c_nationkey", "c_mktsegment"))


# ---------------------------------------------------------------------------
# Kernel density curve (biweight kernel — no transcendentals)
# ---------------------------------------------------------------------------

@query("q_kde_curve", oracle="""
WITH v AS (
  SELECT value AS x FROM events WHERE value IS NOT NULL
), edges AS (
  SELECT MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS n FROM v
), grid AS (
  SELECT CAST(UNNEST(generate_series(0, 20)) AS BIGINT) AS i
), pts AS (
  SELECT i, mn + (mx - mn) * i / 20.0 AS g,
         (mx - mn) / 8.0 AS h, n
  FROM grid CROSS JOIN edges
), terms AS (
  SELECT i, g, h, n,
         CAST(ROUND(CASE WHEN ABS(x - g) < h
                         THEN 0.9375 * (1 - ((x - g) / h) * ((x - g) / h))
                                     * (1 - ((x - g) / h) * ((x - g) / h))
                         ELSE 0 END * 1e9) AS BIGINT) AS k_nano
  FROM pts JOIN v ON TRUE
)
SELECT i AS grid_i, ROUND(g, 6) + 0.0 AS x_grid,
       ROUND(SUM(k_nano) / 1e9 / NULLIF(n * h, 0), 9) + 0.0 AS density
FROM terms GROUP BY i, g, h, n
ORDER BY grid_i
""")
def q_kde_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel density estimate of the metric distribution on a 21-point
    grid — the full-density view that completes the distribution-shape
    family (q_agg_percentile: a few quantiles; q_qq_points: two arms
    against each other; KDE: the curve itself, what a metrics dashboard
    actually plots). Biweight (quartic) kernel
    K(u) = 15/16 (1-u^2)^2 on |u| < 1, bandwidth h = range/8.

    Determinism: the kernel is PURE ARITHMETIC — deliberately chosen
    over the Gaussian so no transcendental function sits in the per-row
    path (exp's last-ulp is libm-dependent; polynomial trees over
    identical doubles are bit-identical on both engines); each kernel
    term quantizes to nano units BEFORE the order-free per-point sum;
    grid and bandwidth ride a 1-row broadcast.

    Scale: map-only 21x expansion of the fact scan with map-side
    combine into 21 cells — shuffle volume is 21 rows regardless of
    input; no window, no sort anywhere."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select(F.col("value").alias("x")))
    edges = ev.agg(F.min("x").alias("mn"), F.max("x").alias("mx"),
                   F.count(F.lit(1)).alias("n"))
    grid = spark.range(21).select(F.col("id").alias("i"))
    g = F.col("mn") + (F.col("mx") - F.col("mn")) * F.col("i") / 20.0
    h = (F.col("mx") - F.col("mn")) / 8.0
    u = (F.col("x") - F.col("g")) / F.col("h")
    k_nano = F.round(
        F.when(F.abs(F.col("x") - F.col("g")) < F.col("h"),
               0.9375 * (1 - u * u) * (1 - u * u))
        .otherwise(0.0) * 1e9).cast("long")
    pts = (grid.crossJoin(F.broadcast(edges))
           .select("i", g.alias("g"), h.alias("h"), "n"))
    terms = (ev.crossJoin(F.broadcast(pts))
             .select("i", "g", "h", "n", k_nano.alias("k_nano")))
    return (terms.groupBy("i", "g", "h", "n")
            .agg(F.sum("k_nano").alias("s_nano"))
            .select(F.col("i").alias("grid_i"),
                    (F.round("g", 6) + 0.0).alias("x_grid"),
                    (F.round(F.col("s_nano") / 1e9
                             / F.nullif(F.col("n") * F.col("h"),
                                        F.lit(0.0)), 9) + 0.0)
                    .alias("density"))
            .orderBy("grid_i"))


# ---------------------------------------------------------------------------
# kNN-distance outlier score over embeddings (multivariate anomaly)
# ---------------------------------------------------------------------------

@query("q_knn_outlier", oracle="""
WITH e AS (
  SELECT vec_id, embedding FROM embeddings WHERE label < 5
), norms AS (
  SELECT vec_id, SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, UNNEST(embedding) AS x FROM e)
  GROUP BY vec_id
), dots AS (
  SELECT id_a, id_b, SUM(ea * eb) AS dot
  FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(UNNEST(a.embedding) AS DOUBLE) AS ea,
               CAST(UNNEST(b.embedding) AS DOUBLE) AS eb
        FROM e a JOIN e b ON a.vec_id <> b.vec_id)
  GROUP BY 1, 2
), scored AS (
  SELECT id_a, id_b,
         ROUND(dot / NULLIF(SQRT(na.nrm * nb.nrm), 0), 9) AS cos9
  FROM dots
  JOIN norms na ON na.vec_id = id_a
  JOIN norms nb ON nb.vec_id = id_b
), third AS (
  SELECT id_a, cos9 FROM (
    SELECT id_a, cos9,
           ROW_NUMBER() OVER (PARTITION BY id_a
                              ORDER BY cos9 DESC, id_b) AS rn
    FROM scored) WHERE rn = 3
)
SELECT id_a AS vec_id,
       ROUND(1 - cos9, 6) + 0.0 AS knn3_dist
FROM third
ORDER BY ROUND(1 - cos9, 6) DESC, id_a
LIMIT 20
""")
def q_knn_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-distance outlier scores over the embedding space: each
    vector's cosine distance to its 3rd nearest neighbor, top 20 —
    the MULTIVARIATE anomaly screen next to the univariate q_outlier_iqr
    / q_anomaly_mad (a point can be unremarkable per-coordinate yet sit
    alone in embedding space; the k-th-NN distance is the classic
    density-based score). Label slice < 5 bounds the demo population.

    Determinism: both argsorts rank the 9-digit-rounded cosine with id
    tiebreaks (registry contract — last-ulp fold-order differences
    can't flip the 3rd-NN pick or the top-20 cut); zero-norm guards on
    both sides.

    Scale: this demo is the exactness baseline (broadcast self-cross
    within the slice, JVM zip_with/aggregate dot — no UDF). The
    production path generates candidates with the banded hyperplane
    LSH (operators/similarity.py, q_dedup_embed_lsh's plan) and takes
    the k-th best BUCKET-LOCAL distance — a lower bound that agrees
    with the exact score for every non-isolated point at recall
    measured by tests/test_similarity.py."""
    e = (load_table(spark, sf_dir, "embeddings", spread=True)
         .filter(F.col("label") < 5))
    norm = F.aggregate(F.col("embedding"), F.lit(0.0),
                       lambda acc, x: acc + x.cast("double") * x.cast("double"))
    wn = e.select("vec_id", "embedding", norm.alias("nrm"))
    a = wn.select(F.col("vec_id").alias("id_a"),
                  F.col("embedding").alias("va"), F.col("nrm").alias("na"))
    b = wn.select(F.col("vec_id").alias("id_b"),
                  F.col("embedding").alias("vb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (a.join(F.broadcast(b), F.col("id_a") != F.col("id_b"))
              .select("id_a", "id_b",
                      F.round(dot / F.nullif(
                          F.sqrt(F.col("na") * F.col("nb")), F.lit(0.0)), 9)
                      .alias("cos9")))
    w = W.partitionBy("id_a").orderBy(F.desc("cos9"), F.asc("id_b"))
    third = (scored.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 3))
    return (third
            .select(F.col("id_a").alias("vec_id"),
                    (F.round(1 - F.col("cos9"), 6) + 0.0)
                    .alias("knn3_dist"))
            .orderBy(F.desc("knn3_dist"), F.asc("vec_id"))
            .limit(20))


# ---------------------------------------------------------------------------
# Atkinson inequality indices per language (eps = 1 and eps = 2)
# ---------------------------------------------------------------------------

@query("q_atkinson", oracle="""
WITH d AS (
  SELECT lang, n_chars AS x, COUNT(*) AS c
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
  GROUP BY 1, 2
)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       ROUND(1 - EXP(SUM(c * CAST(ROUND(LN(x), 9) AS DECIMAL(38,9)))::DOUBLE
                     / SUM(c))
               / (SUM(x * c)::DOUBLE / SUM(c)), 6) + 0.0 AS atkinson_1,
       ROUND(1 - (SUM(c)::DOUBLE
                  / SUM(c * CAST(ROUND(1.0 / x * 1e15) AS DECIMAL(38,0)))
                  * 1e15)
               / (SUM(x * c)::DOUBLE / SUM(c)), 6) + 0.0 AS atkinson_2
FROM d GROUP BY lang ORDER BY lang
""")
def q_atkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality indices of document length per language at
    inequality-aversion eps = 1 (A1 = 1 - geometric/arithmetic mean)
    and eps = 2 (A2 = 1 - harmonic/arithmetic mean) — the WELFARE-
    parameterized member of the inequality family next to
    q_gini_by_group (rank-based) and q_theil_index (decomposable):
    Atkinson states directly what fraction of total length could be
    discarded if it were equally distributed, under an explicit
    aversion choice — the data-card row for "how much of this corpus
    is a few giant documents".

    Determinism: the order-exposed sums — sum(ln x), sum(1/x) — are
    computed per DISTINCT value, rounded to fixed decimals, widened to
    DECIMAL and multiplied by exact integer counts (the q_theil_index
    scheme); the single exp() per group evaluates both engines' libm
    on an identical double (one value per group, rounded at 6 digits);
    A2 is pure arithmetic.

    Scale: distinct (lang, n_chars) pairs bound the shuffle; decimal
    sums cannot overflow at any corpus size."""
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0))
         .groupBy("lang", F.col("n_chars").alias("x"))
         .agg(F.count(F.lit(1)).alias("c")))
    lnx = (F.col("c") * F.round(F.log(F.col("x")), 9)
           .cast("decimal(38,9)"))
    invx = (F.col("c") * F.round(1.0 / F.col("x") * 1e15)
            .cast("decimal(38,0)"))
    n = F.sum("c")
    mean = F.sum(F.col("x") * F.col("c")).cast("double") / n
    geo = F.exp(F.sum(lnx).cast("double") / n)
    harm = n.cast("double") / F.sum(invx).cast("double") * 1e15
    return (d.groupBy("lang")
            .agg(n.cast("long").alias("n_docs"),
                 (F.round(1 - geo / mean, 6) + 0.0).alias("atkinson_1"),
                 (F.round(1 - harm / mean, 6) + 0.0).alias("atkinson_2"))
            .orderBy("lang"))
