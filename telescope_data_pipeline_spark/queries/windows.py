"""Window functions (SURVEY.md §2.5): trim, top-k per group, lag/lead,
rolling frames, rank family.

Every window here sits on a TOTAL order (unique tiebreaker column in the
ORDER BY) so rank-based picks are deterministic and hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


@query("q_window_trim", oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         COUNT(*)    OVER (PARTITION BY o_orderpriority)            AS cnt
  FROM orders
)
SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS totalprice
FROM ranked
WHERE cnt <= 10 OR (rn > 5 AND rn <= cnt - 5)
""")
def q_window_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head+tail trim per group: drop the 5 largest and 5 smallest rows
    when the group has more than 10.

    Reference: core.py:338-340 — sort PSF candidates by flux desc, then
    ``remove_rows([-5..4])`` only if more than 10 remain. One ranked
    window + one count window, no self-join.
    """
    o = load_table(spark, sf_dir, "orders")
    part = W.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority", "o_orderkey", "o_totalprice",
        F.row_number().over(
            part.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))).alias("rn"),
        F.count(F.lit(1)).over(part).alias("cnt"),
    )
    return (
        ranked.filter((F.col("cnt") <= 10)
                      | ((F.col("rn") > 5) & (F.col("rn") <= F.col("cnt") - 5)))
        .select("o_orderpriority", "o_orderkey",
                F.round("o_totalprice", 2).alias("totalprice"))
    )


@query("q_topk_per_group", oracle="""
SELECT c_custkey, o_orderkey, rn AS rank, ROUND(o_totalprice, 2) AS totalprice
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
""")
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group by rank — the reference's per-star argmin
    (core.py:171) generalized: rank-k selection within each partition.
    AQE plans the rank filter before any downstream join."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey",
                F.col("rn").alias("rank"),
                F.round("o_totalprice", 2).alias("totalprice"))
    )


@query("q_window_lag", oracle="""
SELECT event_id,
       ROUND(value - LAG(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), 2) AS delta,
       LEAD(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)             AS next_type
FROM events
""")
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over event time per user — the ordered-series delta the
    walkthrough's light-curve analysis implies (SURVEY.md §2.5; cell 10)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query("q_window_rolling", oracle="""
SELECT event_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS roll_avg,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_sum
FROM events
""")
def q_window_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling mean (5-row frame) + running sum — rolling light-curve
    smoothing (SURVEY.md §2.5, walkthrough cell 10)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.round(F.avg("value").over(w.rowsBetween(-4, 0)), 6).alias("roll_avg"),
        F.round(F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)), 2)
         .alias("cum_sum"),
    )


@query("q_window_rank", oracle="""
SELECT c_custkey,
       c_nationkey,
       RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
       DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk,
       NTILE(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
""")
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile — analytic ranking family over a total
    order (unique c_custkey tiebreak keeps ntile deterministic)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey", "c_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query("q_window_firstlast", oracle="""
SELECT event_id,
       FIRST_VALUE(value) OVER w AS first_val,
       LAST_VALUE(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS last_val,
       ROUND(value - FIRST_VALUE(value) OVER w, 2) AS drift
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def q_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value frames — session-anchored drift per user.
    last_value needs the full-partition frame (the default frame stops at
    CURRENT ROW — a classic window-semantics trap, handled identically in
    both engines here)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return e.select(
        "event_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(full).alias("last_val"),
        F.round(F.col("value") - F.first("value").over(w), 2).alias("drift"),
    )


@query("q_window_range", oracle="""
SELECT event_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY EPOCH(ts)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY EPOCH(ts)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS sum_last_hour
FROM events
""")
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per-user trailing-hour
    count/sum — the rolling event-time statistic where tied/irregular
    timestamps make ROWS frames wrong."""
    e = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy(F.col("ts").cast("double"))
         .rangeBetween(-3600, 0))
    return e.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("sum_last_hour"),
    )
