"""Set operations (SURVEY.md §2.7): UNION ALL / INTERSECT / EXCEPT."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


@query("q_union_all", oracle="""
SELECT src, COUNT(*) AS n, ROUND(SUM(totalprice), 2) AS total
FROM (
  SELECT 'open'  AS src, o_totalprice AS totalprice FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT 'final' AS src, o_totalprice AS totalprice FROM orders WHERE o_orderstatus = 'F'
)
GROUP BY src
""")
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of tagged sub-scans then aggregate — the walkthrough's
    ``cat *.csv`` union of per-epoch result files (cell 5). In Spark a
    multi-file glob scan IS a union; here the explicit unionByName form."""
    o = load_table(spark, sf_dir, "orders")
    open_ = (o.filter(F.col("o_orderstatus") == "O")
             .select(F.lit("open").alias("src"), F.col("o_totalprice").alias("totalprice")))
    final = (o.filter(F.col("o_orderstatus") == "F")
             .select(F.lit("final").alias("src"), F.col("o_totalprice").alias("totalprice")))
    return (
        open_.unionByName(final)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("totalprice"), 2).alias("total"))
    )


@query("q_intersect", oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""")
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — nations having both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query("q_except", oracle="""
SELECT o_orderkey AS okey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT l_orderkey AS okey FROM lineitem WHERE l_quantity > 40
""")
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — the reference's remove-rejected-rows pattern
    (core.py:337 ``remove_rows``) as a set difference: open orders whose
    lineitems never exceed 40 units."""
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "O")
         .select(F.col("o_orderkey").alias("okey")))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_quantity") > 40)
          .select(F.col("l_orderkey").alias("okey")))
    return o.subtract(li)  # EXCEPT DISTINCT semantics


@query("q_union_distinct", oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
UNION
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
""")
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + dedup in one declarative step."""
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_acctbal") > 9000)
         .select(F.col("c_nationkey").alias("nationkey")))
    s = (load_table(spark, sf_dir, "supplier")
         .filter(F.col("s_acctbal") > 5000)
         .select(F.col("s_nationkey").alias("nationkey")))
    return c.unionByName(s).distinct()
