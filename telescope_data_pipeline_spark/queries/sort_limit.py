"""Sorts / limits / top-k (SURVEY.md §2.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query


@query("q_sort", oracle="""
SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
FROM supplier
ORDER BY s_acctbal DESC, s_suppkey
""")
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort descending (reference: results sorted brightest-first,
    core.py:338 / core.py:478 / psf_phot.py:86). At scale this is a
    range-partitioned sort; AQE sizes the ranges."""
    return (
        load_table(spark, sf_dir, "supplier")
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


@query("q_topk", oracle="""
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 30
""")
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT k — Spark plans TakeOrderedAndProject (per-
    partition top-k then merge, never a full sort). Reference: the
    top-30 brightest stars sent to the WCS solver (core.py:514).
    Unique o_orderkey tiebreak keeps the pick deterministic."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(30)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )
