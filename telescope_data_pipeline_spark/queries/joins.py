"""Join family (SURVEY.md §2.3): inner/left/semi/anti/broadcast/range/NN.

The reference's three join patterns are spatial theta-joins written as
loops (core.py:148-177 NN match, core.py:317-330 crowding self-join,
walkthrough cell 7 cone search) plus one broadcast key lookup
(p_io.py:11-16). They decompose into the equi/semi/anti/window forms
demoed here; the NN form uses the grid-bucketed operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.nn_join import nn_join
from ..sources import load_table
from .registry import query


@query("q_join_inner", oracle="""
SELECT l_orderkey, l_linenumber, o_custkey,
       ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND l_quantity > 45
""")
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join on the fact keys (shuffle hash/sort-merge at scale;
    both scans keep their pushed filters below the join)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey", "l_linenumber", "o_custkey",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
             .alias("net_price"),
        )
    )


@query("q_join_left", oracle="""
SELECT o_orderpriority,
       COUNT(*)            AS n_orders,
       COUNT(l.l_orderkey) AS n_big_lines
FROM orders o
LEFT JOIN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49) l
  ON o.o_orderkey = l.l_orderkey
GROUP BY o_orderpriority
""")
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join — null rows for unmatched, then counted.

    Reference: the NN match table initialized to NaN for unmatched stars
    (core.py:166) — null-preserving outer semantics. COUNT(col) vs
    COUNT(*) shows the null behavior.
    """
    o = load_table(spark, sf_dir, "orders")
    big = (load_table(spark, sf_dir, "lineitem")
           .filter(F.col("l_quantity") > 49).select("l_orderkey"))
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.count("l_orderkey").alias("n_big_lines"))
    )


@query("q_join_semi", oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""")
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) — reference analog: 'star has a neighbor
    within threshold' membership test inside the crowding mask
    (core.py:317-330)."""
    c = load_table(spark, sf_dir, "customer")
    urgent = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT"))
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@query("q_join_anti", oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""")
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — reference analog: removing the
    crowding-rejected id set, stars_tbl.remove_rows(d) at core.py:337."""
    c = load_table(spark, sf_dir, "customer")
    urgent = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"))
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@query("q_join_broadcast", oracle="""
SELECT r_name,
       COUNT(*)                 AS n_customers,
       ROUND(AVG(c_acctbal), 6) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""")
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join through two dimension tables.

    Reference: the ephemeris-constant lookup merged into every output row
    (p_io.py:11-16, obj_data.py:18-23) — the canonical tiny-dim broadcast.
    Both dims are broadcast; the fact table never shuffles for the join.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"))
    )


@query("q_join_range", oracle="""
SELECT c_custkey, s_suppkey, ROUND(c_acctbal - s_acctbal, 2) AS bal_gap
FROM customer JOIN supplier
  ON c_acctbal BETWEEN s_acctbal - 50 AND s_acctbal + 50
""")
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (interval) theta-join — the cone-search analog
    (walkthrough.ipynb cell 7: rows within a radius of a target position).

    Written as the declarative BETWEEN predicate; at driver scales Catalyst
    runs it as BroadcastNestedLoopJoin with the 10·sf-row supplier side
    broadcast. The 100 TB path for large-large band joins is the bucketed
    rewrite in operators.nn_join (same grid trick, band predicate refine).
    """
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.join(s, (c.c_acctbal >= s.s_acctbal - 50) & (c.c_acctbal <= s.s_acctbal + 50))
        .select("c_custkey", "s_suppkey",
                F.round(F.col("c_acctbal") - F.col("s_acctbal"), 2).alias("bal_gap"))
    )


@query("q_join_nn", oracle="""
WITH cand AS (
  SELECT c_custkey, s_suppkey, ABS(c_acctbal - s_acctbal) AS d,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY ABS(c_acctbal - s_acctbal), s_suppkey) AS rn
  FROM customer, supplier
  WHERE ABS(c_acctbal - s_acctbal) < 100
)
SELECT c.c_custkey, cand.s_suppkey, ROUND(cand.d, 2) AS dist
FROM customer c
LEFT JOIN cand ON c.c_custkey = cand.c_custkey AND cand.rn = 1
""")
def q_join_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor left-outer join via the grid-bucketed operator.

    Reference semantics: core.py:148-177 — closest counterpart within a
    cutoff, null when none. The oracle is the naive cross-join + window
    form; the Spark plan is the linear-cost bucketed equi-join
    (operators/nn_join.py), proving the rewrite is semantics-preserving.
    """
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    out = nn_join(
        left=c, right=s,
        left_keys=["c_custkey"],
        coords=[("c_acctbal", "s_acctbal")],
        max_dist=100.0,
        right_cols=["s_suppkey"],
    )
    return out.select("c_custkey", "s_suppkey", F.round("dist", 2).alias("dist"))


@query("q_join_full", oracle="""
SELECT n.n_name,
       COUNT(DISTINCT c.c_custkey) AS n_customers,
       COUNT(DISTINCT s.s_suppkey) AS n_suppliers
FROM (SELECT * FROM customer WHERE c_acctbal > 9500) c
FULL OUTER JOIN (SELECT * FROM supplier WHERE s_acctbal > 9500) s
  ON c.c_nationkey = s.s_nationkey
FULL OUTER JOIN nation n
  ON n.n_nationkey = COALESCE(c.c_nationkey, s.s_nationkey)
GROUP BY n.n_name
""")
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — null-preserving on BOTH sides (the union of the
    reference's unmatched-row semantics, core.py:166, in each direction)."""
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_acctbal") > 9500))
    s = (load_table(spark, sf_dir, "supplier")
         .filter(F.col("s_acctbal") > 9500))
    n = load_table(spark, sf_dir, "nation")
    cs = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return (
        cs.join(n, n.n_nationkey == F.coalesce(c.c_nationkey, s.s_nationkey),
                "full_outer")
        .groupBy("n_name")
        .agg(F.countDistinct("c_custkey").alias("n_customers"),
             F.countDistinct("s_suppkey").alias("n_suppliers"))
    )


@query("q_join_cross", oracle="""
SELECT r.r_name, p.bucket, COUNT(*) AS n
FROM region r
CROSS JOIN (SELECT DISTINCT p_size % 5 AS bucket FROM part) p
JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, p.bucket
""")
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit small-dims CROSS JOIN (dimension grid construction) —
    the one legitimate use of a cross product: both sides tiny and the
    product itself is the desired output."""
    r = load_table(spark, sf_dir, "region")
    p = (load_table(spark, sf_dir, "part")
         .select((F.col("p_size") % 5).alias("bucket")).distinct())
    n = load_table(spark, sf_dir, "nation")
    return (
        r.crossJoin(p)
        .join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("q_join_nn2d", oracle="""
WITH pts_a AS (
  SELECT c_custkey AS id, c_acctbal AS x, CAST(c_custkey % 97 AS DOUBLE) * 100 AS y
  FROM customer
), pts_b AS (
  SELECT s_suppkey AS id, s_acctbal AS x, CAST(s_suppkey % 97 AS DOUBLE) * 100 AS y
  FROM supplier
), cand AS (
  SELECT a.id AS id_a, b.id AS id_b,
         SQRT(POW(a.x - b.x, 2) + POW(a.y - b.y, 2)) AS d,
         ROW_NUMBER() OVER (PARTITION BY a.id
                            ORDER BY SQRT(POW(a.x - b.x, 2) + POW(a.y - b.y, 2)),
                                     b.id) AS rn
  FROM pts_a a CROSS JOIN pts_b b
  WHERE SQRT(POW(a.x - b.x, 2) + POW(a.y - b.y, 2)) < 500
)
SELECT p.id AS c_custkey, cand.id_b AS s_suppkey, ROUND(cand.d, 2) AS dist
FROM pts_a p LEFT JOIN cand ON p.id = cand.id_a AND cand.rn = 1
""")
def q_join_nn2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D nearest-neighbor left-outer join — the reference's actual
    star-matching semantics (core.py:148-177: Euclidean distance in the
    image plane, cutoff, closest-only, null when unmatched), via the
    d-dimensional grid-bucketed operator (9 neighbor cells searched).
    Derived (x, y) point sets from the driver tables; the oracle is the
    naive cross join + window."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"),
        F.col("c_acctbal").alias("ax"),
        (F.col("c_custkey") % 97).cast("double").alias("ay0"))
    c = c.withColumn("ay", F.col("ay0") * 100).drop("ay0")
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey"),
        F.col("s_acctbal").alias("bx"),
        (F.col("s_suppkey") % 97).cast("double").alias("by0"))
    s = s.withColumn("by", F.col("by0") * 100).drop("by0")
    out = nn_join(
        left=c, right=s,
        left_keys=["c_custkey"],
        coords=[("ax", "bx"), ("ay", "by")],
        max_dist=500.0,
        right_cols=["s_suppkey"],
    )
    return out.select("c_custkey", "s_suppkey", F.round("dist", 2).alias("dist"))


@query("q_join_asof", oracle="""
WITH c AS (
  SELECT event_id, user_id, ts, value AS click_value
  FROM events WHERE event_type = 'click'
), v AS (
  SELECT user_id, ts, MAX(value) AS view_value
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id,
       ROUND(c.click_value, 6) AS click_value,
       ROUND(v.view_value, 6) AS view_value,
       ROUND(EPOCH(v.ts), 6) AS asof_epoch
FROM c ASOF LEFT JOIN v
  ON c.user_id = v.user_id AND c.ts >= v.ts
""")
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join: each click event picks up the most
    recent prior view by the same user (operators/asof.py). The naive
    form is a range join; the operator's union + ignorenulls-last window
    is ONE shuffle on user_id, linear in |events| — the plan that
    survives 100 TB. DuckDB's native ASOF JOIN is the oracle, proving
    the rewrite exact. Views are pre-aggregated per (user, ts) so the
    carried row is deterministic."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts",
                      F.col("value").alias("click_value")))
    views = (ev.filter(F.col("event_type") == "view")
             .groupBy("user_id", "ts")
             .agg(F.max("value").alias("view_value")))
    out = asof_join(clicks, views, keys=["user_id"],
                    left_ts="ts", right_ts="ts",
                    right_cols=["view_value"])
    return out.select(
        "event_id", "user_id",
        F.round("click_value", 6).alias("click_value"),
        F.round("view_value", 6).alias("view_value"),
        F.round(F.col("asof_ts").cast("double"), 6).alias("asof_epoch"))


@query("q_join_knn", oracle="""
WITH a AS (
  SELECT c_custkey, c_acctbal AS ax,
         CAST(c_custkey % 97 AS DOUBLE) * 100 AS ay
  FROM customer
), b AS (
  SELECT s_suppkey, s_acctbal AS bx,
         CAST(s_suppkey % 97 AS DOUBLE) * 100 AS by
  FROM supplier
), scored AS (
  SELECT a.c_custkey, b.s_suppkey,
         SQRT(POW(a.ax - b.bx, 2) + POW(a.ay - b.by, 2)) AS d,
         ROW_NUMBER() OVER (PARTITION BY a.c_custkey
                            ORDER BY SQRT(POW(a.ax - b.bx, 2)
                                          + POW(a.ay - b.by, 2)),
                                     b.s_suppkey) AS rn
  FROM a JOIN b ON SQRT(POW(a.ax - b.bx, 2) + POW(a.ay - b.by, 2)) < 500
)
SELECT a.c_custkey, s.s_suppkey, ROUND(s.d, 2) AS dist, s.rn AS rank
FROM a LEFT JOIN (SELECT * FROM scored WHERE rn <= 3) s
  ON a.c_custkey = s.c_custkey
""")
def q_join_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join (k=3): each point keeps its 3 nearest neighbors within
    the cutoff, ranked — the general form of the reference's top-1 NN
    match, same grid-bucketed linear plan (cell equi-join + window
    rank <= k), oracle = naive distance join + window."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("ax"),
        ((F.col("c_custkey") % 97).cast("double") * 100).alias("ay"))
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_acctbal").alias("bx"),
        ((F.col("s_suppkey") % 97).cast("double") * 100).alias("by"))
    out = nn_join(c, s, left_keys=["c_custkey"],
                  coords=[("ax", "bx"), ("ay", "by")],
                  max_dist=500.0, right_cols=["s_suppkey"], k=3)
    return out.select("c_custkey", "s_suppkey",
                      F.round("dist", 2).alias("dist"), "rank")


@query("q_join_interval", oracle="""
WITH e AS (
  SELECT event_id AS err_id, epoch_us(ts) AS es,
         epoch_us(ts) + 1200000000 AS ee
  FROM events WHERE event_type = 'error' AND event_id < 5000
), p AS (
  SELECT event_id AS purch_id, epoch_us(ts) AS ps,
         epoch_us(ts) + 1800000000 AS pe
  FROM events WHERE event_type = 'purchase' AND event_id < 5000
)
SELECT err_id, purch_id, LEAST(ee, pe) - GREATEST(es, ps) AS overlap_us
FROM e JOIN p ON es <= pe AND ps <= ee
""")
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join (operators/interval_join.py): every error
    window [ts, ts+20min] paired with every purchase session
    [ts, ts+30min] it overlaps — incident attribution, the temporal
    join neither an equi-join nor an as-of join expresses (as-of keeps
    ONE most-recent match; this keeps ALL overlapping pairs).

    The oracle is the direct theta join (bounded by the event_id
    slice); the Spark plan is the bucketed rewrite — explode intervals
    into covered 20-minute chunks, hash equi-join on the chunk id,
    emit each pair only in the canonical bucket of max(starts) (dedup
    by construction, no second shuffle), exact-predicate refine. Cost
    is linear in exploded size; the plan contains no nested loop
    (tests/test_plans.py). Overlap is reported in exact integer
    microseconds — no float anywhere."""
    from ..operators.interval_join import interval_overlap_join

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    us = F.unix_micros("ts")
    e = (ev.filter(F.col("event_type") == "error")
         .select(F.col("event_id").alias("err_id"), us.alias("es"),
                 (us + 1_200_000_000).alias("ee")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purch_id"), us.alias("ps"),
                 (us + 1_800_000_000).alias("pe")))
    out = interval_overlap_join(e, p, "es", "ee", "ps", "pe",
                                bucket_width=1_200_000_000)
    return out.select(
        "err_id", "purch_id",
        (F.least("ee", "pe") - F.greatest("es", "ps")).alias("overlap_us"))
