"""Aggregation family (SURVEY.md §2.4): count/mean/median/distinct/
group-by/rollup/multi-stat diagnostics/sigma-clip.

All are partial+final (map-side combine) under Catalyst — the shuffle
carries one row per group, not per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sigma_clip import sigma_clipped_stats, unrolled_oracle_sql
from ..sources import load_table
from .registry import query


@query("q_agg_count", oracle="""
SELECT l_returnflag,
       COUNT(*)                  AS n_rows,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_returnflag
""")
def q_agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) + grouped COUNT DISTINCT (reference: len(sources) /
    len(results) guards, p_io.py:139-140, psf_phot.py:78)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.countDistinct("l_suppkey").alias("n_suppliers"),
             F.countDistinct("l_orderkey").alias("n_orders"))
    )


@query("q_agg_mean", oracle="""
SELECT event_type,
       ROUND(AVG(value), 6) AS avg_value,
       COUNT(*)             AS n
FROM events
GROUP BY event_type
""")
def q_agg_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple grouped mean (reference: average airmass over the set's
    images, p_io.py:43-47; mean mid-exposure JD, p_io.py:53)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"),
             F.count(F.lit(1)).alias("n"))
    )


@query("q_agg_median", oracle="""
SELECT l_returnflag,
       ROUND(MEDIAN(l_quantity), 4)      AS med_qty,
       ROUND(MEDIAN(l_extendedprice), 4) AS med_price
FROM lineitem
GROUP BY l_returnflag
""")
def q_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped median (reference: median shift offsets core.py:203-206,
    per-pixel median combine core.py:240). Exact `median` (interpolated),
    not percentile_approx — the approx sketch would not hash-match an
    oracle; at 100 TB swap to percentile_approx where a 1e-4 relative
    error is acceptable."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.median("l_quantity"), 4).alias("med_qty"),
             F.round(F.median("l_extendedprice"), 4).alias("med_price"))
    )


@query("q_agg_groupby", oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                          AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                     AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)  AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       ROUND(AVG(l_quantity), 6)                          AS avg_qty,
       ROUND(AVG(l_extendedprice), 6)                     AS avg_price,
       ROUND(AVG(l_discount), 6)                          AS avg_disc,
       COUNT(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical grouped-pipeline aggregation (TPC-H Q1 shape) —
    reference analog: the whole per-image-set pipeline is one GROUP BY
    epochid application (psf_phot.py:44-45)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query("q_agg_distinct", oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""")
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (reference: unique star ids / enumerated epoch
    ids, psf_phot.py:44)."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query("q_agg_rollup", oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*)                  AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (absent in the reference; engine
    completeness per SURVEY.md §2.4)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count(F.lit(1)).alias("n"))
    )


@query("q_agg_cube", oracle="""
SELECT o_orderstatus, o_orderpriority,
       ROUND(SUM(o_totalprice), 2) AS total,
       COUNT(*)                    AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all 4 grouping sets in one pass."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"),
             F.count(F.lit(1)).alias("n"))
    )


@query("q_diag_stats", oracle="""
SELECT l_returnflag,
       COUNT(*)                          AS n,
       ROUND(MIN(l_quantity), 2)         AS min_qty,
       ROUND(MAX(l_quantity), 2)         AS max_qty,
       ROUND(MEDIAN(l_quantity), 4)      AS med_qty,
       ROUND(MIN(l_extendedprice), 2)    AS min_price,
       ROUND(MAX(l_extendedprice), 2)    AS max_price,
       ROUND(STDDEV_SAMP(l_extendedprice), 6) AS std_price
FROM lineitem
GROUP BY l_returnflag
""")
def q_diag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-statistic diagnostics block — the TXT sink's counts and
    min/max/median sanity stats (p_io.py:139-143) as one multi-agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_quantity"), 2).alias("min_qty"),
            F.round(F.max("l_quantity"), 2).alias("max_qty"),
            F.round(F.median("l_quantity"), 4).alias("med_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.stddev_samp("l_extendedprice"), 6).alias("std_price"),
        )
    )


@query("q_agg_sigclip",
       oracle=unrolled_oracle_sql("events", ["event_type"], "value",
                                  sigma=2.0, iters=3))
def q_agg_sigclip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sigma-clipped mean/std (sigma=2, 3 iterations) per group — the
    reference's workhorse robust statistic (core.py:70 et al.), as the
    iterative agg+broadcast-join loop in operators/sigma_clip.py; the
    oracle is the identical computation unrolled into CTEs."""
    events = load_table(spark, sf_dir, "events")
    return sigma_clipped_stats(events, ["event_type"], "value",
                               sigma=2.0, iters=3)


@query("q_pivot", oracle="""
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
FROM lineitem
GROUP BY l_returnflag
""")
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): explicit value list so the plan is a
    single pass — without it Spark needs an extra distinct-values job."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (li.groupBy("l_returnflag")
         .pivot("l_linestatus", ["O", "F"])
         .agg(F.round(F.sum("l_quantity"), 2)))
    return p.select("l_returnflag", F.col("O").alias("qty_O"),
                    F.col("F").alias("qty_F"))


@query("q_agg_stats2", oracle="""
SELECT l_returnflag,
       ROUND(CORR(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS qty_price_cov,
       ROUND(VAR_SAMP(l_quantity), 6)                    AS qty_var
FROM lineitem
GROUP BY l_returnflag
""")
def q_agg_stats2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics: correlation / sample covariance / variance —
    the color-analysis statistics of the walkthrough (cells 15-16) in
    aggregate form."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
             F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_cov"),
             F.round(F.var_samp("l_quantity"), 6).alias("qty_var"))
    )


@query("q_agg_collect", oracle="""
SELECT l_returnflag,
       array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses_csv,
       LEN(list(DISTINCT l_linestatus))                             AS n_statuses
FROM lineitem
GROUP BY l_returnflag
""")
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set aggregation (array-valued result, sorted for
    determinism) — the grouped list materialization a per-epoch manifest
    build needs (filenames per epoch, psf_phot.py:45)."""
    li = load_table(spark, sf_dir, "lineitem")
    statuses = F.array_sort(F.collect_set("l_linestatus"))
    # scalar outputs only: array-typed result columns canonicalize
    # differently across engines' pandas bridges (same reason dates
    # cross as strings)
    return (
        li.groupBy("l_returnflag")
        .agg(F.array_join(statuses, ",").alias("statuses_csv"),
             F.size(statuses).alias("n_statuses"))
    )


@query("q_grouping_sets", oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""")
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither pure rollup nor cube): per-flag,
    per-status, and grand total in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@query("q_quantile_sketch")  # rows-only: the sketch is not SQL-expressible
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-approximate quantiles (p10/p50/p90/p99 of event value)
    via the mergeable rank-summary sketch
    (operators/quantile_sketch.py) — the quantile member of the
    sketch triad beside q_hll_union (distinct) and q_cms_count
    (frequency), and the one-pass alternative to the exact paths
    (q_agg_percentile's sort-based percentile, q_median_twopass's
    two coordinated scans). Content-hash sharding makes the estimate
    partitioning-independent; tests/test_stats_sketches.py pins the
    eps*n rank-error guarantee against exact percentiles.

    Eager by design (the merge is a bounded driver fold, like
    q_median_twopass); no DuckDB oracle because the kept-point set is
    the sketch's own construction — the golden bounds ARE the
    contract."""
    from ..operators.quantile_sketch import approx_quantiles

    e = load_table(spark, sf_dir, "events")
    probs = [0.1, 0.5, 0.9, 0.99]
    # empty input -> [] -> schema-correct empty result (boundary
    # contract: registered queries never crash on zero-row tables)
    est = approx_quantiles(e, "value", probs, eps=0.01)
    return spark.createDataFrame(
        [(p, round(v, 6)) for p, v in zip(probs, est)],
        "prob double, est double")


@query("q_quantile_sketch_pinned", oracle="""
WITH vals AS (
  SELECT CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL
), ent AS (
  SELECT v, COUNT(*) AS w,
         ABS(CAST(FLOOR(v * 1000000.0) AS BIGINT)) % 8 AS shard
  FROM vals GROUP BY v
), c AS (
  SELECT v, w, shard,
         SUM(w) OVER (PARTITION BY shard ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(w) OVER (PARTITION BY shard) AS wt
  FROM ent
), s AS (
  SELECT *, GREATEST(1, CAST(CEIL(wt * 0.005) AS BIGINT)) AS step FROM c
), k0 AS (
  SELECT shard, v, cum FROM s
  WHERE FLOOR((cum - w) / step) < FLOOR(cum / step) OR cum = wt
), kept AS (
  SELECT shard, v, cum,
         cum - COALESCE(LAG(cum) OVER (PARTITION BY shard ORDER BY v), 0)
           AS g
  FROM k0
), m AS (
  SELECT v, shard,
         SUM(g) OVER (ORDER BY v, shard
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS gcum,
         SUM(g) OVER () AS t
  FROM kept
), hits AS (
  SELECT p.prob, m.v,
         ROW_NUMBER() OVER (PARTITION BY p.prob ORDER BY m.v, m.shard)
           AS rn
  FROM (SELECT UNNEST([0.1, 0.5, 0.9, 0.99]) AS prob) p
  JOIN m ON m.gcum >= p.prob * m.t
)
SELECT CAST(prob AS DOUBLE) AS prob, ROUND(v, 6) + 0.0 AS est
FROM hits WHERE rn = 1
""")
def q_quantile_sketch_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-pinned quantile-summary construction the oracle can
    REPLAY — the hash-checked twin of q_quantile_sketch, promoted the
    way q_hll_union pinned HLL registers (fixed shard function,
    deterministic kept-point rule, exact integer cumulative ranks).

    Construction (identical SQL-expressible algebra on both engines):
    duplicates collapse to exact (value, weight) entries; each entry is
    sharded by an engine-agnostic integer hash
    ``abs(floor(v * 1e6)) % 8``; within a shard the kept points are the
    first entries crossing each multiple of ``step = ceil(W_s * eps/2)``
    (eps = 0.01) plus the shard maximum — gap weights therefore sum to
    EXACT cumulative ranks, and the merged cumulative walk answers each
    probability within eps*n ranks, the same guarantee the streaming
    operator (operators/quantile_sketch.py) gives with O(1/eps) state.

    Determinism: every intermediate is integer (counts, cumulative
    weights, steps) or a single fixed double expression evaluated
    identically by both engines; the kept-point selection and the
    final first-crossing pick are total-ordered by (v, shard).

    Scale note: this form is the bounded ORACLE ANCHOR (windows over
    per-shard distinct values — fine at oracle scale, and the merged
    walk touches only the O(n_shards/eps) kept points); the production
    path at 100 TB is the streaming operator, whose per-shard state is
    capped and whose sort spills JVM-side. Same anchor/production
    split as q_dedup_minhash_md5 vs the xxhash64 MinHash."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    ent = (e.select(F.col("value").cast("double").alias("v"))
           .filter(F.col("v").isNotNull())
           .groupBy("v").agg(F.count(F.lit(1)).alias("w"))
           .withColumn("shard",
                       F.abs(F.floor(F.col("v") * 1000000.0)
                             .cast("bigint")) % 8))
    ws = Window.partitionBy("shard").orderBy("v")
    c = ent.select(
        "v", "w", "shard",
        F.sum("w").over(ws.rowsBetween(Window.unboundedPreceding,
                                       Window.currentRow)).alias("cum"),
        F.sum("w").over(Window.partitionBy("shard")).alias("wt"))
    s = c.withColumn(
        "step", F.greatest(F.lit(1).cast("bigint"),
                           F.ceil(F.col("wt") * 0.005).cast("bigint")))
    k0 = s.filter(
        (F.floor((F.col("cum") - F.col("w")) / F.col("step"))
         < F.floor(F.col("cum") / F.col("step")))
        | (F.col("cum") == F.col("wt"))).select("shard", "v", "cum")
    kept = k0.select(
        "shard", "v",
        (F.col("cum") - F.coalesce(F.lag("cum").over(ws), F.lit(0)))
        .alias("g"))
    wm = (Window.orderBy("v", "shard")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    m = kept.select(
        "v", "shard",
        F.sum("g").over(wm).alias("gcum"),
        F.sum("g").over(Window.partitionBy()).alias("t"))
    probs = spark.createDataFrame(
        [(0.1,), (0.5,), (0.9,), (0.99,)], "prob double")
    hits = (m.join(F.broadcast(probs),
                   F.col("gcum") >= F.col("prob") * F.col("t"))
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("prob").orderBy("v", "shard"))))
    return (hits.filter(F.col("rn") == 1)
            .select(F.col("prob").cast("double").alias("prob"),
                    (F.round("v", 6) + 0.0).alias("est")))
