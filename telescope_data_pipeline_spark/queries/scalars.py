"""Scalar functions (SURVEY.md §2.8): math / rounding / string / date /
array — all built-in pyspark.sql.functions (JVM-side, codegen'd; no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# Phase-fold constants (reference walkthrough cells 11-12: phase =
# ((t - t0) % P) / P). Seconds-scale stand-ins for the driver's events.ts.
_T0 = 1704067200.0          # 2024-01-01T00:00:00Z epoch seconds
_PERIOD = 86400.0 * 7       # one-week fold period


@query("q_scalar_math", oracle=f"""
SELECT event_id,
       ROUND(-2.5 * LOG10(value), 6) + 0.0                 AS mag,
       ROUND(1.08574 * SQRT(value) / value, 6) + 0.0       AS mag_err,
       ROUND(SQRT(POW(value - 100, 2) + POW(value - 200, 2)), 6) + 0.0 AS dist,
       ROUND(FMOD(EPOCH(ts) - {_T0}, {_PERIOD}) / {_PERIOD}, 6) + 0.0  AS phase
FROM events
WHERE value > 0
""")
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Photometry math as expressions: magnitude ``-2.5*log10(flux)``
    (p_io.py:111), error propagation ``1.08574*err/flux`` (p_io.py:112),
    Euclidean distance (core.py:170), phase fold ``((t-t0) % P)/P``
    (walkthrough cells 11-12). All whole-stage-codegen'd."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    v = F.col("value")
    secs = F.col("ts").cast("double")  # fractional epoch seconds
    # `+ 0.0` normalizes IEEE signed zero: DuckDB's -2.5*LOG10(1.0) is
    # -0.0 while Spark's round() yields +0.0; -0.0 + 0.0 == +0.0 on both
    # engines, so the bit-level hash agrees (round-2 parity lesson).
    return e.select(
        "event_id",
        (F.round(-2.5 * F.log10(v), 6) + 0.0).alias("mag"),
        (F.round(1.08574 * F.sqrt(v) / v, 6) + 0.0).alias("mag_err"),
        (F.round(F.sqrt(F.pow(v - 100, 2) + F.pow(v - 200, 2)), 6) + 0.0).alias("dist"),
        (F.round(((secs - _T0) % _PERIOD) / _PERIOD, 6) + 0.0).alias("phase"),
    )


@query("q_scalar_round", oracle="""
SELECT p_partkey,
       ROUND(p_retailprice, 0)                         AS rounded,
       CAST(CEIL(p_retailprice) AS BIGINT)             AS ceiled,
       CAST(FLOOR(p_retailprice) AS BIGINT)            AS floored,
       CAST(TRUNC(p_retailprice) AS BIGINT)            AS as_int,
       CAST(CEIL(p_retailprice) AS BIGINT) // 2 * 2 + 1 AS round_to_odd
FROM part
""")
def q_scalar_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding family incl. the reference's round-to-odd cutout size
    ``ceil(f)//2*2+1`` (core.py:374, core.py:443-446)."""
    p = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(price, 0).alias("rounded"),
        F.ceil(price).alias("ceiled"),
        F.floor(price).alias("floored"),
        price.cast("bigint").alias("as_int"),
        (F.floor(F.ceil(price) / 2) * 2 + 1).cast("bigint").alias("round_to_odd"),
    )


@query("q_scalar_string", oracle="""
SELECT p_partkey,
       SUBSTR(p_name, 1, 10)                    AS name_prefix,
       UPPER(p_brand)                           AS brand_uc,
       LENGTH(p_name)                           AS name_len,
       CONCAT(p_brand, ':', p_type)             AS brand_type,
       REGEXP_EXTRACT(p_type, '(\\w+)$', 1)     AS type_last_word,
       CAST(p_size AS VARCHAR)                  AS size_str
FROM part
WHERE p_name LIKE '%red%'
""")
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: substring (the 22-char set-name slice,
    psf_phot.py:48), concat (path building core.py:42-43), LIKE,
    regexp_extract, cast-to-string (CSV row assembly p_io.py:117-118)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.upper("p_brand").alias("brand_uc"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_type", r"(\w+)$", 1).alias("type_last_word"),
        F.col("p_size").cast("string").alias("size_str"),
    )


@query("q_scalar_date", oracle="""
SELECT o_orderkey,
       YEAR(o_orderdate)                               AS yr,
       MONTH(o_orderdate)                              AS mo,
       DATE_TRUNC('month', o_orderdate)                AS month_start,
       DATE_DIFF('day', DATE '1995-01-01', o_orderdate) AS days_since,
       ROUND(EPOCH(o_orderdate) / 86400.0 + 2440587.5, 6) AS jd
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
""")
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp family incl. the ISO→Julian-date conversion the reference
    does via astropy Time (p_io.py:48-53): jd = unix/86400 + 2440587.5."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.round(d.cast("double") / 86400.0 + 2440587.5, 6).alias("jd"),
    )


@query("q_array_ops", oracle="""
SELECT vec_id,
       LEN(embedding)                                           AS dim,
       -- + 0.0 normalizes -0.0 (a head/vec sum can round to zero from
       -- below: DuckDB ROUND preserves the sign bit, Spark's doesn't —
       -- found at sf0.001 where vec 241's head slice does exactly that)
       ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 4) + 0.0  AS vec_sum,
       ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) + 0.0 AS norm_sq,
       ROUND(LIST_SUM(LIST_TRANSFORM(embedding[1:4], x -> CAST(x AS DOUBLE))), 4) + 0.0 AS head_sum
FROM embeddings
""")
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array expressions over the embedding column: size, fold-sum,
    self-dot (norm²), slice — the reference's image-as-array ops
    (core.py:81-88, core.py:376-380) in their relational form. Uses
    ``aggregate``/``transform``/``slice`` higher-order functions, all
    JVM-side (no Python crossing)."""
    e = load_table(spark, sf_dir, "embeddings")
    arr = F.col("embedding")
    dsum = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    dnorm = F.aggregate(arr, F.lit(0.0),
                        lambda acc, x: acc + x.cast("double") * x.cast("double"))
    dhead = F.aggregate(F.slice(arr, 1, 4), F.lit(0.0),
                        lambda acc, x: acc + x.cast("double"))
    return e.select(
        "vec_id",
        F.size(arr).alias("dim"),
        (F.round(dsum, 4) + 0.0).alias("vec_sum"),
        (F.round(dnorm, 4) + 0.0).alias("norm_sq"),
        (F.round(dhead, 4) + 0.0).alias("head_sum"),
    )


@query("q_scalar_null", oracle="""
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
       ROUND(GREATEST(c_acctbal, 0.0), 2)                  AS pos_bal,
       ROUND(LEAST(c_acctbal, 1000.0), 2)                  AS capped_bal,
       CASE WHEN NULLIF(c_acctbal, 0.0) IS NULL THEN 1 ELSE 0 END AS was_zero
FROM customer
""")
def q_scalar_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling family: coalesce / nullif / greatest / least /
    is-null — the engine's replacement for the reference's NaN sentinels
    (SURVEY.md §1 null semantics)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
                   F.lit("OTHER")).alias("seg"),
        F.round(F.greatest(F.col("c_acctbal"), F.lit(0.0)), 2).alias("pos_bal"),
        F.round(F.least(F.col("c_acctbal"), F.lit(1000.0)), 2).alias("capped_bal"),
        F.when(F.nullif(F.col("c_acctbal"), F.lit(0.0)).isNull(), 1)
         .otherwise(0).alias("was_zero"),
    )


@query("q_scalar_string2", oracle="""
SELECT p_partkey,
       LPAD(CAST(p_size AS VARCHAR), 4, '0')   AS size_padded,
       REPLACE(p_type, ' ', '_')               AS type_snake,
       SPLIT_PART(p_name, ' ', 1)              AS first_word,
       TRIM('  ' || p_brand || ' ')            AS brand_trimmed,
       REVERSE(p_brand)                        AS brand_rev
FROM part
WHERE p_partkey < 500
""")
def q_scalar_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string batch: pad / replace / split_part / trim / reverse."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trimmed"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


@query("q_scalar_date2", oracle="""
SELECT o_orderkey,
       CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3mo,
       CAST(last_day(o_orderdate) AS VARCHAR)                        AS month_end,
       QUARTER(o_orderdate)        AS qtr,
       ISODOW(o_orderdate)         AS iso_dow
FROM orders
WHERE o_orderkey < 2000
""")
def q_scalar_date2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date batch: add_months / last_day / quarter / ISO weekday.
    Weekday numbering differs across engines (Spark dayofweek is
    1=Sunday, DuckDB dayofweek is 0=Sunday) — ISO day-of-week
    (1=Monday) is the portable form: Spark ``weekday()+1`` = ISODOW."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        # date-typed outputs cross engines as strings: Spark DATE and
        # DuckDB DATE canonicalize differently through pandas
        F.add_months(d, 3).cast("string").alias("plus3mo"),
        F.last_day(d).cast("string").alias("month_end"),
        F.quarter(d).alias("qtr"),
        (F.weekday(d) + 1).alias("iso_dow"),
    )


@query("q_posexplode", oracle="""
SELECT doc_id,
       CAST(UNNEST(range(len(string_split_regex(text, '\\s+')))) AS INT) AS pos,
       UNNEST(string_split_regex(text, '\\s+'))                          AS tok
FROM documents
WHERE doc_id < 10
""")
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (lateral UNNEST WITH ORDINALITY): one token row
    per position — the UDTF row-explosion shape (detection emits N rows
    per image, core.py:116-146) in its pure relational form."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", r"\s+")).alias("pos", "tok"),
    )


@query("q_scalar_bits", oracle="""
SELECT p_partkey,
       p_partkey & 255                   AS low_byte,
       p_partkey | 4096                  AS with_flag,
       xor(p_partkey, 1365)              AS xored,
       p_partkey << 2                    AS shifted_up,
       p_partkey >> 3                    AS shifted_down,
       bit_count(p_partkey)              AS popcount
FROM part
""")
def q_scalar_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family (and/or/xor/shifts/popcount) — the
    primitives under the SimHash banding and cell-id packing operators,
    demoed standalone."""
    p = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        "p_partkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(1365)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted_up"),
        F.shiftright(k, 3).alias("shifted_down"),
        F.bit_count(k).alias("popcount"))
