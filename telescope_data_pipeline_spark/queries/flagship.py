"""Flagship query: per-group photometry-summary analog on the driver tables.

Shape mirrors the reference's per-image-set diagnostics — counts and robust
stats over grouped detections (reference p_io.py:139-143 over the group loop
psf_phot.py:44) — expressed as one declarative plan over
lineitem ⋈ orders ⋈ customer: scan → filter → join → group agg → sort.

Scale notes: the two joins are on the natural keys; Catalyst plans
lineitem⋈orders as a shuffle join on orderkey and customer as a broadcast
(150·sf rows ≪ threshold). Filters on l_shipdate / o_orderdate are pushed
into the parquet scans. Aggregation is partial (map-side) then final —
the only full shuffle carries ~|groups| rows.

Determinism: every monetary/quantity aggregate runs in DECIMAL
(2- and 4-digit scales match the data's intrinsic precision), so sums
and averages are EXACT and independent of partial-aggregation merge
order — which is what lets the fact scan spread across cores
(load_table(spread=True)) without exposing float addition order to the
oracle hash. The q_agg_salted precedent, promoted to the flagship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                                                       AS sum_disc_price,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        / COUNT(*), 6)                                 AS avg_qty,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        / COUNT(*), 6)                                 AS avg_order_price,
  COUNT(*)                                             AS n_rows,
  COUNT(DISTINCT c_custkey)                            AS n_custs
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  AND o_orderdate >= TIMESTAMP '1995-06-01'
GROUP BY l_returnflag, l_linestatus
"""


@query("q_flagship", oracle=_ORACLE)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scan → filter → join×2 → groupBy agg → sort in one Catalyst plan."""
    lineitem = load_table(spark, sf_dir, "lineitem", spread=True)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = price * (1 - F.col("l_discount").cast("decimal(18,2)"))
    total = F.col("o_totalprice").cast("decimal(18,2)")
    n = F.count(F.lit(1))
    return (
        lineitem
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .join(orders.filter(F.col("o_orderdate") >= F.lit("1995-06-01").cast("timestamp")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.round(F.sum(qty).cast("double") / n, 6).alias("avg_qty"),
            F.round(F.sum(total).cast("double") / n, 6).alias("avg_order_price"),
            n.alias("n_rows"),
            F.countDistinct("c_custkey").alias("n_custs"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query("q_shipping_priority", oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       CAST(o_orderdate AS VARCHAR) AS orderdate_s,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""")
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): the three-way
    customer ⋈ orders ⋈ lineitem with selective filters on BOTH date
    columns and the market segment, revenue per order, top-10 — the
    classic join-ordering workload. Catalyst broadcasts the filtered
    customer dim, the segment and date filters push into all three
    scans, and the top-10 on (revenue desc, orderkey) plans
    TakeOrderedAndProject (per-partition heaps, no global sort).

    Determinism: revenue is an EXACT DECIMAL(38,4) sum cast to double
    once (the flagship rule), and the LIMIT sits on a total order with
    the orderkey tiebreak. Timestamps stringify on both sides (DATE
    canonicalization differs between engines)."""
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_mktsegment") == "BUILDING"))
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") < "1995-03-15"))
    li = (load_table(spark, sf_dir, "lineitem", spread=True)
          .filter(F.col("l_shipdate") > "1995-03-15"))
    rev = F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(18,2)")))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(rev.cast("double").alias("revenue"))
            .select("l_orderkey", "revenue",
                    F.col("o_orderdate").cast("string").alias("orderdate_s"),
                    "o_orderpriority")
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10))


# ---------------------------------------------------------------------------
# Small-quantity-order revenue (TPC-H Q17 shape): correlated scalar
# subquery decorrelated into an aggregate + join
# ---------------------------------------------------------------------------

@query("q_small_order_revenue", oracle="""
WITH pf AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#2' AND p_size <= 15
), th AS (
  SELECT l.l_partkey,
         SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) AS qc,
         COUNT(*) AS n
  FROM lineitem l JOIN pf ON l.l_partkey = pf.p_partkey
  GROUP BY l.l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
       ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
             / 100.0 / 7.0, 4) + 0.0 AS avg_yearly
FROM lineitem l
JOIN th ON l.l_partkey = th.l_partkey
WHERE CAST(ROUND(l.l_quantity * 100) AS BIGINT) * th.n * 5 < th.qc
""")
def q_small_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue locked up in unusually small orders —
    lineitems of the filtered part set whose quantity is below 20% of
    that part's average order quantity. The reference workload's
    "correlated scalar subquery" pattern (avg per part, compared
    per row), hand-decorrelated the way Catalyst rewrites it: one
    per-part aggregate, joined back to the fact rows.

    Determinism: quantities are quantized to integer centi-units, so
    the 20%-of-average test is pure integer arithmetic
    (q*100 * n * 5 < sum_q*100 — no float threshold whose last ulp
    could flip a boundary row); revenue sums integer cents.

    Scale: the part filter broadcasts into BOTH lineitem passes
    (predicate reaches the scans), the per-part aggregate is
    map-side combined, and the threshold join is an equi-join on
    l_partkey — the two fact passes share the pushed part filter, so
    each reads only qualifying rows. At 100 TB the second pass can be
    eliminated by a windowed form; the two-scan form keeps every sum
    map-side combined."""
    p = (load_table(spark, sf_dir, "part")
         .filter((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 15))
         .select("p_partkey"))
    li = load_table(spark, sf_dir, "lineitem")
    qc = F.round(F.col("l_quantity") * 100).cast("bigint")
    th = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
          .groupBy("l_partkey")
          .agg(F.sum(qc).alias("qc"), F.count(F.lit(1)).alias("n")))
    fact = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .select("l_partkey", qc.alias("q100"),
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                    .alias("price_c")))
    return (fact.join(th, "l_partkey")
            .filter(F.col("q100") * F.col("n") * 5 < F.col("qc"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_small"),
                 (F.round(F.sum("price_c") / 100.0 / 7.0, 4) + 0.0)
                 .alias("avg_yearly")))


# ---------------------------------------------------------------------------
# Sole-late-supplier blame (TPC-H Q21 shape): EXISTS + NOT EXISTS
# decorrelated into one per-order aggregate
# ---------------------------------------------------------------------------

@query("q_late_supplier", oracle="""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
  FROM l GROUP BY 1
), blamed AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM l JOIN per_order p ON p.l_orderkey = l.l_orderkey
  WHERE l.late AND p.n_supp >= 2 AND p.n_late_supp = 1
)
SELECT l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
FROM blamed GROUP BY 1
ORDER BY numwait DESC, suppkey LIMIT 20
""")
def q_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier orders (shipped > 90 days after the order date
    while every co-supplier shipped on time) — the textbook
    EXISTS(other supplier) + NOT EXISTS(other late supplier)
    correlated pair. Hand-decorrelated PAST what Catalyst would do
    with the EXISTS form: both existence tests collapse into ONE
    per-order aggregate (distinct suppliers, distinct late
    suppliers), so the fact table is shuffled once on orderkey
    instead of twice more for the semi- and anti-join legs.

    Determinism: integer counts; the top-20 cut is a total order
    (numwait desc, suppkey).

    Scale: one orderkey-partitioned aggregate (map-side partial on
    the distincts), the blame filter re-joins per-order flags to the
    already-partitioned lateness rows, then a suppkey groupBy and a
    TakeOrdered top-20. No self-join of lineitem against itself
    anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    l = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
         .select("l_orderkey", "l_suppkey",
                 (F.col("l_shipdate")
                  > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
                 .alias("late")))
    per_order = (l.groupBy("l_orderkey")
                 .agg(F.count_distinct("l_suppkey").alias("n_supp"),
                      F.count_distinct(F.when(F.col("late"), F.col("l_suppkey")))
                      .alias("n_late_supp")))
    blamed = (l.filter(F.col("late"))
              .join(per_order, "l_orderkey")
              .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
              .select("l_orderkey", "l_suppkey").distinct())
    return (blamed.groupBy(F.col("l_suppkey").alias("suppkey"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "suppkey").limit(20))
