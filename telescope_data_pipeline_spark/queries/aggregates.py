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
    est = approx_quantiles(e, "value", probs, eps=0.01)
    return spark.createDataFrame(
        [(p, round(v, 6)) for p, v in zip(probs, est)],
        "prob double, est double")
