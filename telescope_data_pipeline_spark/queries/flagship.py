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
  ROUND(SUM(l_quantity), 2)                            AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                       AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)    AS sum_disc_price,
  ROUND(AVG(l_quantity), 6)                            AS avg_qty,
  ROUND(AVG(o_totalprice), 6)                          AS avg_order_price,
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
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    return (
        lineitem
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .join(orders.filter(F.col("o_orderdate") >= F.lit("1995-06-01").cast("timestamp")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_order_price"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("c_custkey").alias("n_custs"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
