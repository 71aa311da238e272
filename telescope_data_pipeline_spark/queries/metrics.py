"""Round-10 second batch: evaluation-metric and corpus-health readouts
— recall/precision@k, expected calibration error, covariate balance
(SMD), Cochran-Armitage trend test, behavioral entropy, Lorenz curve
points, vocabulary Jaccard drift, naive-forecast MAPE/RMSE, and
first-seen novelty rate.

These complete metric families started earlier: q_ndcg_mrr gains the
set-based recall/precision@k twins, q_calibration's per-bin gaps roll
up into the single-number ECE/MCE headline, q_cuped/q_did gain the
pre-experiment balance check every A/B readout should gate on,
q_chi_square/q_info_gain gain the ORDERED-dose trend test,
q_burstiness gains the type-mix entropy sibling, q_gini_concentration
gains its graphical Lorenz form, q_kl_drift/q_js_drift gain set-level
vocabulary drift, q_holt_forecast/q_ewma gain an accuracy scorecard,
and q_dedup_incremental gains the novelty-rate monitoring readout.

Determinism contract as everywhere (registry.py): integer sufficient
statistics (centi/nano quantization before any SUM), identical double
expression trees on both engines, NULLIF-guarded denominators,
integer-with-id-tiebreak ordering keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.cache_slot import CacheSlot
from ..sources.tables import load_table
from .registry import query

_TOK = r"\s+"

#: q_perplexity's corpus vocabulary (token -> count). Uncached, the
#: totals branch and the scoring join would each re-run the corpus
#: explode+groupBy — three full text passes instead of the minimum two
#: (build model, score corpus). One bounded slot, |V| rows.
_VOCAB_SLOT = CacheSlot()


# ---------------------------------------------------------------------------
# Recall@10 / Precision@10 per query group
# ---------------------------------------------------------------------------

@query("q_recall_at_k", oracle="""
WITH base AS (
  SELECT vec_id % 20 AS qid, vec_id,
         ROUND(CAST(embedding[1] AS DOUBLE), 6) AS score,
         CASE WHEN label >= 7 THEN 1 ELSE 0 END AS rel
  FROM embeddings
), ranked AS (
  SELECT qid, rel,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id)
           AS rk
  FROM base
)
SELECT qid, CAST(SUM(rel) AS BIGINT) AS n_rel,
       CAST(SUM(CASE WHEN rk <= 10 THEN rel ELSE 0 END) AS BIGINT)
         AS hits_at_10,
       ROUND(SUM(CASE WHEN rk <= 10 THEN rel ELSE 0 END)::DOUBLE
             / NULLIF(SUM(rel), 0), 6) + 0.0 AS recall_at_10,
       ROUND(SUM(CASE WHEN rk <= 10 THEN rel ELSE 0 END) / 10.0, 6)
         + 0.0 AS precision_at_10
FROM ranked GROUP BY qid
""")
def q_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 and Precision@10 per query group — the SET-based
    retrieval metrics beside q_ndcg_mrr's rank-weighted ones (recall
    answers "did the candidate generator even surface the relevant
    docs", the first gate of any two-stage retrieval stack; NDCG then
    grades their ordering). Same demo framing as q_ndcg_mrr: 20 query
    groups, first-component score, binary relevance label >= 7.

    Determinism: the score is rounded to 6 BEFORE ranking with a
    vec_id tiebreak (q_ndcg_mrr's recipe); hits and relevants are
    exact integer conditional sums; zero-relevant groups NULLIF
    recall to undefined.

    Scale: one window per query group (one exchange on qid), one
    map-side-combined groupBy — identical shape to q_ndcg_mrr."""
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        (F.col("vec_id") % 20).alias("qid"), "vec_id",
        F.round(F.element_at("embedding", 1).cast("double"), 6)
        .alias("score"),
        F.when(F.col("label") >= 7, 1).otherwise(0).alias("rel"))
    rk = F.row_number().over(
        W.partitionBy("qid").orderBy(F.desc("score"), "vec_id"))
    ranked = base.select("qid", "rel", rk.alias("rk"))
    hits = F.sum(F.when(F.col("rk") <= 10, F.col("rel")).otherwise(0))
    return ranked.groupBy("qid").agg(
        F.sum("rel").cast("long").alias("n_rel"),
        hits.cast("long").alias("hits_at_10"),
        (F.round(hits.cast("double")
                 / F.nullif(F.sum("rel"), F.lit(0)), 6) + 0.0)
        .alias("recall_at_10"),
        (F.round(hits / 10.0, 6) + 0.0).alias("precision_at_10"))


# ---------------------------------------------------------------------------
# Expected / maximum calibration error headline
# ---------------------------------------------------------------------------

@query("q_ece", oracle="""
WITH scored AS (
  SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y,
         80 * label + ((vec_id % 1000003) * 2654435761 % 1000) // 5
           AS p_milli
  FROM embeddings
), b AS (
  SELECT LEAST(p_milli // 100, 9) AS bin, COUNT(*) AS n,
         SUM(p_milli) AS sp, SUM(y) AS sy
  FROM scored GROUP BY 1
), tot AS (
  SELECT SUM(n) AS big_n FROM b
)
SELECT CAST(MAX(big_n) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       ROUND(SUM(ABS(sp::DOUBLE / 1000 - sy)) / MAX(big_n), 6) + 0.0
         AS ece,
       ROUND(MAX(ABS(sp::DOUBLE / 1000 - sy) / n), 6) + 0.0 AS mce
FROM b CROSS JOIN tot
""")
def q_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected and maximum calibration error — the single-number
    headline over q_calibration's reliability bins (ECE = the
    bin-mass-weighted mean |confidence - accuracy| gap, MCE = the
    worst bin): the quantity model cards report and deployment gates
    threshold on. Same deterministic integer-milliunit scorer and
    10-bin layout as q_calibration.

    Determinism: the probability exists only as an integer milliunit;
    each bin's |sum_p/1000 - sum_y| is computed from two exact integer
    sums; ECE's weighted mean telescopes to SUM(|gap_b|)/N — one
    division, no per-bin float ratios folding.

    Scale: one map-side-combined 10-key groupBy, then a 10-row
    aggregate. Nothing wider than 10 rows after the first pass."""
    e = load_table(spark, sf_dir, "embeddings")
    p_milli = (80 * F.col("label")
               + ((F.col("vec_id") % 1000003)
                  * F.lit(2654435761).cast("bigint") % 1000)
               / F.lit(5)).cast("bigint")
    scored = e.select(
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("y"),
        p_milli.alias("p_milli"))
    b = (scored
         .groupBy(F.least(F.floor(F.col("p_milli") / 100), F.lit(9))
                  .alias("bin"))
         .agg(F.count(F.lit(1)).alias("n"), F.sum("p_milli").alias("sp"),
              F.sum("y").alias("sy")))
    tot = b.agg(F.sum("n").alias("big_n"))
    gap = F.abs(F.col("sp").cast("double") / 1000 - F.col("sy"))
    return (b.crossJoin(F.broadcast(tot))
            .agg(F.max("big_n").cast("long").alias("n"),
                 F.count(F.lit(1)).cast("long").alias("n_bins"),
                 (F.round(F.sum(gap) / F.max("big_n"), 6) + 0.0)
                 .alias("ece"),
                 (F.round(F.max(gap / F.col("n")), 6) + 0.0).alias("mce")))


# ---------------------------------------------------------------------------
# Covariate balance: standardized mean difference per covariate
# ---------------------------------------------------------------------------

@query("q_smd_balance", oracle=f"""
WITH pu AS (
  SELECT user_id, user_id % 2 AS arm,
         COALESCE(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(ROUND(value * 100) AS BIGINT) END), 0)
           AS x_spend,
         COUNT(*) AS x_events
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
), long_form AS (
  SELECT arm, 'spend_centi' AS covariate, x_spend AS v FROM pu
  UNION ALL
  SELECT arm, 'n_events', x_events FROM pu
), s AS (
  SELECT covariate, arm, COUNT(*) AS n, SUM(v) AS sx, SUM(v * v) AS sxx
  FROM long_form GROUP BY 1, 2
), wide AS (
  SELECT covariate,
         MAX(CASE WHEN arm = 0 THEN sx::DOUBLE / n END) AS m0,
         MAX(CASE WHEN arm = 1 THEN sx::DOUBLE / n END) AS m1,
         MAX(CASE WHEN arm = 0 THEN
             (sxx::DOUBLE - sx::DOUBLE * sx / n) / NULLIF(n - 1, 0) END)
           AS v0,
         MAX(CASE WHEN arm = 1 THEN
             (sxx::DOUBLE - sx::DOUBLE * sx / n) / NULLIF(n - 1, 0) END)
           AS v1
  FROM s GROUP BY covariate
)
SELECT covariate,
       ROUND(m0, 6) + 0.0 AS mean_ctrl,
       ROUND(m1, 6) + 0.0 AS mean_treat,
       ROUND((m1 - m0) / NULLIF(SQRT((v0 + v1) / 2), 0), 6) + 0.0 AS smd
FROM wide ORDER BY covariate
""")
def q_smd_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-experiment covariate balance: the standardized mean
    difference (Cohen's d with pooled SD) between arms for each
    pre-treatment covariate — the check every A/B readout should gate
    on BEFORE trusting q_ab_ttest / q_cuped / q_did (|SMD| > 0.1 means
    the randomization is suspect and the effect estimate inherits the
    imbalance). Demo covariates: per-user purchase spend and event
    count.

    Determinism: per-user covariates are exact centi/integer sums; the
    per-(covariate, arm) sufficient statistics are exact BIGINT sums;
    means/variances/SMD come out of one identical double tree with
    NULLIF guards for singleton or constant arms.

    Scale: one groupBy onto users, a 2x-explode into covariate long
    form, one map-side-combined (covariate, arm) aggregate — the wide
    fact table is read once regardless of covariate count."""
    pu = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id").isNotNull())
          .groupBy("user_id")
          .agg(F.coalesce(
              F.sum(F.when(F.col("event_type") == "purchase",
                           F.round(F.col("value") * 100).cast("long"))),
              F.lit(0)).alias("x_spend"),
              F.count(F.lit(1)).alias("x_events"))
          .select((F.col("user_id") % 2).alias("arm"), "x_spend",
                  "x_events"))
    long_form = pu.select(
        "arm",
        F.explode(F.array(
            F.struct(F.lit("spend_centi").alias("covariate"),
                     F.col("x_spend").alias("v")),
            F.struct(F.lit("n_events").alias("covariate"),
                     F.col("x_events").alias("v")))).alias("kv")
    ).select("arm", F.col("kv.covariate").alias("covariate"),
             F.col("kv.v").alias("v"))
    s = long_form.groupBy("covariate", "arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sx"),
        F.sum(F.col("v") * F.col("v")).alias("sxx"))
    var = ((F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
           / F.nullif(F.col("n") - 1, F.lit(0)))
    mean = F.col("sx").cast("double") / F.col("n")
    wide = s.groupBy("covariate").agg(
        F.max(F.when(F.col("arm") == 0, mean)).alias("m0"),
        F.max(F.when(F.col("arm") == 1, mean)).alias("m1"),
        F.max(F.when(F.col("arm") == 0, var)).alias("v0"),
        F.max(F.when(F.col("arm") == 1, var)).alias("v1"))
    return (wide.select(
        "covariate",
        (F.round("m0", 6) + 0.0).alias("mean_ctrl"),
        (F.round("m1", 6) + 0.0).alias("mean_treat"),
        (F.round((F.col("m1") - F.col("m0"))
                 / F.nullif(F.sqrt((F.col("v0") + F.col("v1")) / 2),
                            F.lit(0.0)), 6) + 0.0).alias("smd"))
        .orderBy("covariate"))


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test over ordered doses
# ---------------------------------------------------------------------------

@query("q_trend_test", oracle="""
WITH lab AS (
  SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS dose,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), g AS (
  SELECT dose, COUNT(*) AS n, SUM(y) AS r FROM lab GROUP BY dose
), s AS (
  SELECT SUM(n) AS big_n, SUM(r) AS big_r,
         SUM(dose * r) AS srd, SUM(dose * n) AS snd,
         SUM(dose * dose * n) AS sddn
  FROM g
)
SELECT CAST(big_n AS BIGINT) AS n, CAST(big_r AS BIGINT) AS n_pos,
       ROUND(srd - big_r::DOUBLE * snd / big_n, 6) + 0.0 AS t_stat,
       ROUND((srd - big_r::DOUBLE * snd / big_n)
             / NULLIF(SQRT((big_r::DOUBLE / big_n)
                           * (1 - big_r::DOUBLE / big_n)
                           * (sddn - snd::DOUBLE * snd / big_n)), 0),
             6) + 0.0 AS z
FROM s
""")
def q_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: is the failure rate MONOTONE in an
    ordered dose (priority tier 1..5)? The ordered sibling of
    q_chi_square — chi-square spends its power on any deviation,
    CA concentrates it on the linear trend, which is the actual
    question for tiered features (priority, quality band, price
    bucket). T = sum(s_i r_i) - R/N sum(s_i n_i); Var under H0 =
    p(1-p)(sum(s_i^2 n_i) - (sum s_i n_i)^2/N).

    Determinism: doses, counts and all five sufficient statistics are
    exact integer sums from ONE grouped pass; z is one identical
    double expression, degenerate tables (all-failure, single dose)
    NULLIF to undefined.

    Scale: one map-side-combined 5-key groupBy, then a 1-row
    aggregate."""
    lab = (load_table(spark, sf_dir, "orders")
           .select(F.substring("o_orderpriority", 1, 1).cast("long")
                   .alias("dose"),
                   F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
                   .alias("y")))
    g = lab.groupBy("dose").agg(F.count(F.lit(1)).alias("n"),
                                F.sum("y").alias("r"))
    s = g.agg(F.sum("n").alias("big_n"), F.sum("r").alias("big_r"),
              F.sum(F.col("dose") * F.col("r")).alias("srd"),
              F.sum(F.col("dose") * F.col("n")).alias("snd"),
              F.sum(F.col("dose") * F.col("dose") * F.col("n"))
              .alias("sddn"))
    big_n, big_r = F.col("big_n"), F.col("big_r")
    p = big_r.cast("double") / big_n
    t = F.col("srd") - big_r.cast("double") * F.col("snd") / big_n
    var = p * (1 - p) * (F.col("sddn")
                         - F.col("snd").cast("double") * F.col("snd")
                         / big_n)
    return s.select(
        big_n.cast("long").alias("n"), big_r.cast("long").alias("n_pos"),
        (F.round(t, 6) + 0.0).alias("t_stat"),
        (F.round(t / F.nullif(F.sqrt(var), F.lit(0.0)), 6) + 0.0)
        .alias("z"))


# ---------------------------------------------------------------------------
# Behavioral entropy per user cohort
# ---------------------------------------------------------------------------

@query("q_session_entropy", oracle="""
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS k FROM events
  WHERE user_id IS NOT NULL GROUP BY 1, 2
), per_user AS (
  SELECT user_id, SUM(k) AS n,
         SUM(CAST(ROUND(-1.0 * k * LN(k) * 1e9) AS BIGINT)) AS sklnk_nano
  FROM c GROUP BY user_id
), ent AS (
  SELECT user_id % 4 AS cohort, n,
         CAST(ROUND((LN(n) + sklnk_nano / 1e9 / n) * 1e6) AS BIGINT) AS e_u
  FROM per_user
)
SELECT CAST(cohort AS BIGINT) AS cohort,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(SUM(e_u)::DOUBLE / 1e6 / COUNT(*), 6) + 0.0
         AS mean_entropy,
       ROUND(MAX(e_u) / 1e6, 6) + 0.0 AS max_entropy
FROM ent GROUP BY cohort ORDER BY cohort
""")
def q_session_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity: Shannon entropy of each user's event-type
    mix (H = ln n - sum(k ln k)/n over type counts k), aggregated per
    cohort — the type-MIX sibling of q_burstiness's timing statistic:
    together they answer "do these users do varied things, at varied
    times?", the two axes bot-detection and engagement scoring screen
    first.

    Determinism: type counts are exact integers; each -k*ln(k) TERM is
    quantized to integer nano-nats before ANY sum (quantize-before-sum
    — a float SUM whose partial-aggregation order the engine may pick
    would make the later *1e6 rounding order-dependent at a .5
    boundary), so per-user entropy and the cohort means are ratios of
    exact integer sums (entropy of a 5-type mix is <= ln 5, well
    inside nano resolution).

    Scale: two map-side-combined groupBys ((user, type), then user) and
    a 4-key cohort aggregate — no windows, no joins."""
    c = (load_table(spark, sf_dir, "events")
         .filter(F.col("user_id").isNotNull())
         .groupBy("user_id", "event_type")
         .agg(F.count(F.lit(1)).alias("k")))
    per_user = c.groupBy("user_id").agg(
        F.sum("k").alias("n"),
        F.sum(F.round(-1.0 * F.col("k") * F.log("k") * 1e9).cast("long"))
        .alias("sklnk_nano"))
    ent = per_user.select(
        (F.col("user_id") % 4).alias("cohort"), "n",
        F.round((F.log("n") + F.col("sklnk_nano") / 1e9 / F.col("n")) * 1e6)
        .cast("long").alias("e_u"))
    return (ent.groupBy(F.col("cohort").cast("long").alias("cohort"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                 (F.round(F.sum("e_u").cast("double") / 1e6
                          / F.count(F.lit(1)), 6) + 0.0)
                 .alias("mean_entropy"),
                 (F.round(F.max("e_u") / 1e6, 6) + 0.0)
                 .alias("max_entropy"))
            .orderBy("cohort"))


# ---------------------------------------------------------------------------
# Lorenz curve points (corpus concentration, graphical form)
# ---------------------------------------------------------------------------

@query("q_lorenz_points", oracle="""
WITH ranked AS (
  SELECT n_chars,
         NTILE(10) OVER (ORDER BY n_chars, doc_id) AS decile
  FROM documents
), d AS (
  SELECT decile, COUNT(*) AS n_docs, SUM(n_chars) AS chars
  FROM ranked GROUP BY decile
), tot AS (
  SELECT SUM(chars) AS total_chars FROM d
)
SELECT decile, CAST(n_docs AS BIGINT) AS n_docs,
       ROUND(SUM(chars) OVER (ORDER BY decile
                              ROWS UNBOUNDED PRECEDING)::DOUBLE
             / NULLIF(total_chars, 0), 6) + 0.0 AS cum_char_share
FROM d CROSS JOIN tot ORDER BY decile
""")
def q_lorenz_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of corpus size concentration: documents sorted by
    length, cumulative character share at each population decile — the
    graphical form of q_gini_concentration (Gini = 1 - 2 * area under
    this curve): "the shortest 50% of documents hold only X% of the
    corpus" is the sentence a data card prints.

    Determinism: the tile comes from exact integer arithmetic on the
    global position under the (n_chars, doc_id) total order — the
    identical assignment NTILE makes; decile character sums are exact
    integers; cumulative shares are ratios of exact integer sums
    through one ordered 10-row window.

    Scale: rank-by-size is inherently global, but never single-task —
    positions come from operators/rank.py::distributed_row_number
    (range-bucket by n_chars, per-bucket counts prefix-folded on the
    driver, local per-bucket windows: the q_epoch_shuffle /
    q_median_twopass two-pass shape), then the exact NTILE arithmetic
    maps position -> tile. Everything after the decile aggregate runs
    on 10 rows (the only SinglePartition exchange is that 10-row
    cumulative window). Round-10 VERDICT item 1: the previous demo
    shipped the banned global-ntile collapse this replaces."""
    from ..operators.rank import lazy_row_number

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    # Distributed NTILE: global 0-based position via the two-pass
    # bucket-base rank — r13: the fully-LAZY form (zero driver actions,
    # zero caches; the rank feeds one consumer, so the old CacheSlot
    # materialization job bought nothing) — then the exact integer
    # NTILE arithmetic: with q = N DIV 10 and r = N % 10, the first r
    # tiles hold q+1 rows. No data row crosses a SinglePartition
    # exchange (the bases window runs over <= num_buckets rows).
    ranked = lazy_row_number(
        d, order_cols=["n_chars", "doc_id"], bucket_key="n_chars",
        out_col="pos")
    # N = the corpus row count, as a 1-row broadcast straight off the
    # base scan (max(pos)+1 over the LAZY rank would re-derive the
    # whole rank subtree for a number the count already is).
    tot_n = d.agg(F.count(F.lit(1)).alias("n_total"))
    ranked = ranked.crossJoin(F.broadcast(tot_n)).selectExpr(
        "n_chars",
        """CASE WHEN pos < (n_total % 10) * (n_total DIV 10 + 1)
                THEN pos DIV (n_total DIV 10 + 1)
                ELSE (n_total % 10)
                     + (pos - (n_total % 10) * (n_total DIV 10 + 1))
                       DIV GREATEST(n_total DIV 10, 1)
           END + 1 AS decile""")
    dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars"))
    tot = dec.agg(F.sum("chars").alias("total_chars"))
    cum = F.sum("chars").over(
        W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0))
    return (dec.crossJoin(F.broadcast(tot))
            .select("decile", F.col("n_docs").cast("long").alias("n_docs"),
                    (F.round(cum.cast("double")
                             / F.nullif(F.col("total_chars"), F.lit(0)), 6)
                     + 0.0).alias("cum_char_share"))
            .orderBy("decile"))


# ---------------------------------------------------------------------------
# Vocabulary Jaccard drift between snapshots
# ---------------------------------------------------------------------------

@query("q_jaccard_drift", oracle=r"""
WITH toks AS (
  SELECT DISTINCT doc_id % 2 AS snap,
         UNNEST(string_split_regex(text, '\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), per_tok AS (
  SELECT tok, MAX(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS in_b
  FROM toks GROUP BY tok
)
SELECT CAST(SUM(in_a) AS BIGINT) AS vocab_a,
       CAST(SUM(in_b) AS BIGINT) AS vocab_b,
       CAST(SUM(in_a * in_b) AS BIGINT) AS vocab_common,
       ROUND(SUM(in_a * in_b)::DOUBLE / NULLIF(COUNT(*), 0), 6) + 0.0
         AS jaccard
FROM per_tok
""")
def q_jaccard_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard overlap between two corpus snapshots — the
    SET-level drift monitor beside the distributional ones (q_kl_drift
    / q_js_drift / q_psi_drift watch how MASS shifts across known
    categories; this watches whether the vocabulary itself churned,
    which is what a tokenizer-refresh decision needs). Each row of
    per_tok is one vocabulary member with membership flags; |A∪B| is
    the row count.

    Determinism: pure integer set algebra — distinct membership, flag
    maxes, one ratio.

    Scale: explode → DISTINCT (snap, tok) → one groupBy on the token
    (the vocabulary shuffle, paid once); output is a single row. The
    same shape at any corpus size because only distinct tokens survive
    the first aggregate."""
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()))
    toks = (d.select((F.col("doc_id") % 2).alias("snap"),
                     F.explode(F.split("text", _TOK)).alias("tok"))
            .distinct())
    per_tok = toks.groupBy("tok").agg(
        F.max(F.when(F.col("snap") == 0, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("snap") == 1, 1).otherwise(0)).alias("in_b"))
    return per_tok.agg(
        F.sum("in_a").cast("long").alias("vocab_a"),
        F.sum("in_b").cast("long").alias("vocab_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long")
        .alias("vocab_common"),
        (F.round(F.sum(F.col("in_a") * F.col("in_b")).cast("double")
                 / F.nullif(F.count(F.lit(1)), F.lit(0)), 6) + 0.0)
        .alias("jaccard"))


# ---------------------------------------------------------------------------
# Naive-forecast accuracy scorecard (MAPE / RMSE)
# ---------------------------------------------------------------------------

@query("q_forecast_accuracy", oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS actual_centi
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), scored AS (
  SELECT event_type, actual_centi,
         LAG(actual_centi) OVER (PARTITION BY event_type ORDER BY day)
           AS pred_centi
  FROM daily
), e AS (
  SELECT event_type,
         actual_centi - pred_centi AS err,
         CASE WHEN actual_centi != 0
              THEN CAST(ROUND(ABS(actual_centi - pred_centi)::DOUBLE
                              / ABS(actual_centi) * 1e9) AS BIGINT)
         END AS ape_nano
  FROM scored WHERE pred_centi IS NOT NULL
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(SUM(ape_nano)::DOUBLE / 1e9
             / NULLIF(COUNT(ape_nano), 0) * 100, 6) + 0.0 AS mape_pct,
       ROUND(SQRT(SUM(err * err)::DOUBLE / COUNT(*)) / 100, 6) + 0.0
         AS rmse
FROM e GROUP BY event_type ORDER BY event_type
""")
def q_forecast_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast accuracy scorecard: MAPE and RMSE of the naive lag-1
    forecast on daily value totals per stream — the BASELINE every
    q_ewma / q_holt_forecast / q_seasonal_baseline model must beat
    before deploying (a model that loses to "tomorrow equals today"
    is negative value; this query is the scorecard that says so).

    Determinism: daily totals are exact centi-integer sums; errors
    are integer differences, so the RMSE sum is an exact BIGINT; each
    day's percentage error is quantized to integer nano before the
    MAPE mean (zero-actual days are excluded from MAPE on both
    engines, counted in n_days).

    Scale: one (type, day) groupBy, one lag window per stream key,
    one grouped aggregate — the q_ewma shape with an integer error
    fold."""
    daily = (load_table(spark, sf_dir, "events")
             .filter(F.col("value").isNotNull())
             .groupBy("event_type", F.col("ts").cast("date").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("long"))
                  .alias("actual_centi")))
    pred = F.lag("actual_centi").over(
        W.partitionBy("event_type").orderBy("day"))
    scored = daily.select("event_type", "actual_centi",
                          pred.alias("pred_centi")) \
                  .filter(F.col("pred_centi").isNotNull())
    err = F.col("actual_centi") - F.col("pred_centi")
    ape_nano = F.when(
        F.col("actual_centi") != 0,
        F.round(F.abs(err).cast("double") / F.abs(F.col("actual_centi"))
                * 1e9).cast("long"))
    e = scored.select("event_type", err.alias("err"),
                      ape_nano.alias("ape_nano"))
    return (e.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                 (F.round(F.sum("ape_nano").cast("double") / 1e9
                          / F.nullif(F.count("ape_nano"), F.lit(0)) * 100,
                          6) + 0.0).alias("mape_pct"),
                 (F.round(F.sqrt(F.sum(F.col("err") * F.col("err"))
                                 .cast("double") / F.count(F.lit(1)))
                          / 100, 6) + 0.0).alias("rmse"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# First-seen novelty rate per crawl batch
# ---------------------------------------------------------------------------

@query("q_novelty_rate", oracle="""
WITH batches AS (
  SELECT doc_id % 4 AS batch, MD5(text) AS digest FROM documents
  WHERE text IS NOT NULL
), first_seen AS (
  SELECT digest, MIN(batch) AS first_batch FROM batches GROUP BY digest
), scored AS (
  SELECT b.batch, CASE WHEN f.first_batch = b.batch THEN 1 ELSE 0 END
           AS novel
  FROM batches b JOIN first_seen f USING (digest)
)
SELECT CAST(batch AS BIGINT) AS batch,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(novel) AS BIGINT) AS n_novel,
       ROUND(SUM(novel)::DOUBLE / COUNT(*), 6) + 0.0 AS novelty_rate
FROM scored GROUP BY batch ORDER BY batch
""")
def q_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen novelty rate per crawl batch: what fraction of each
    batch's documents had never appeared in an EARLIER batch — the
    monitoring readout on top of q_dedup_incremental (the dedup
    REMOVES repeats; this tracks whether a source is drying up — a
    crawl whose novelty decays to zero is re-fetching the same web).
    Demo batches: doc_id % 4 as four ordered crawls.

    Determinism: md5 digests and integer batch mins — pure integer/
    digest algebra, no floats before the final ratio.

    Scale: digests shuffle (16 bytes), never text (the q_decontaminate
    rule); one digest groupBy for first-seen, one digest-keyed join
    back, one 4-key aggregate. At production scale first_seen is the
    persisted dedup index and the join is incremental, not a rescan."""
    b = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select((F.col("doc_id") % 4).alias("batch"),
                 F.md5("text").alias("digest")))
    first_seen = b.groupBy("digest").agg(F.min("batch").alias("first_batch"))
    scored = (b.join(first_seen, "digest")
              .select("batch",
                      F.when(F.col("first_batch") == F.col("batch"), 1)
                      .otherwise(0).alias("novel")))
    return (scored.groupBy(F.col("batch").cast("long").alias("batch"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("novel").cast("long").alias("n_novel"),
                 (F.round(F.sum("novel").cast("double")
                          / F.count(F.lit(1)), 6) + 0.0)
                 .alias("novelty_rate"))
            .orderBy("batch"))


# ---------------------------------------------------------------------------
# Inverse-propensity off-policy value estimate (IPS / SNIPS)
# ---------------------------------------------------------------------------

@query("q_ips_offpolicy", oracle="""
WITH logged AS (
  SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS r_centi,
         -- logged stochastic policy: propensity of the taken action,
         -- deterministic integer hash in [0.2, 0.8) milliunits
         -- pre-mod the id before the multiply (the q_ece construction):
         -- id * 2654435761 would overflow BIGINT for ids over ~3.5e9
         200 + ((event_id % 1000003) * 2654435761 % 1000003) % 600
           AS p_milli,
         -- target policy takes the SAME action iff hash2 >= 300
         CASE WHEN ((event_id % 1000003) * 40503 % 1000003) % 1000 >= 300
              THEN 1 ELSE 0 END AS pi_takes
  FROM events
  WHERE event_type = 'click' AND value IS NOT NULL
), w AS (
  SELECT r_centi,
         -- clipped importance weight in integer micro-units:
         -- min(1/p, 10) when the target policy takes the action
         CASE WHEN pi_takes = 1
              THEN LEAST(CAST(ROUND(1e9 / p_milli) AS BIGINT), 10000000)
              ELSE 0 END AS w_micro
  FROM logged
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(w_micro * r_centi)::DOUBLE / 1e6 / 100 / COUNT(*), 6)
         + 0.0 AS ips_value,
       ROUND(SUM(w_micro * r_centi)::DOUBLE / 100
             / NULLIF(SUM(w_micro), 0), 6) + 0.0 AS snips_value,
       ROUND(SUM(w_micro)::DOUBLE / 1e6 / COUNT(*), 6) + 0.0
         AS mean_weight
FROM w
""")
def q_ips_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation: the clipped inverse-propensity (IPS) and
    self-normalized (SNIPS) value estimates of a TARGET policy from
    logs collected under a DIFFERENT logging policy — how ranking and
    recommendation changes are evaluated without an online experiment
    (the counterfactual sibling of q_ab_ttest: no second arm needed,
    the propensities reweight history). Demo: hash-derived logged
    propensities in [0.2, 0.8), a hash-thresholded target policy,
    click value as reward, weights clipped at 10 (the standard
    variance/bias trade).

    Determinism: propensities and the policy indicator are pure
    integer hashes; each weight is quantized to integer micro-units
    BEFORE multiplying the centi-unit reward, so both estimator sums
    are exact BIGINTs; SNIPS' weight-sum denominator NULLIFs when the
    policies never overlap.

    Scale: one map-only projection and a 1-row aggregate — nothing
    shuffles but partial sums."""
    e = (load_table(spark, sf_dir, "events")
         .filter((F.col("event_type") == "click")
                 & F.col("value").isNotNull()))
    p_milli = (200 + ((F.col("event_id") % 1000003)
                      * F.lit(2654435761).cast("bigint")
                      % 1000003) % 600)
    pi_takes = F.when(
        ((F.col("event_id") % 1000003) * 40503 % 1000003) % 1000 >= 300,
        1).otherwise(0)
    w_micro = F.when(
        pi_takes == 1,
        F.least(F.round(1e9 / p_milli).cast("long"),
                F.lit(10000000).cast("long"))).otherwise(F.lit(0))
    logged = e.select(
        F.round(F.col("value") * 100).cast("long").alias("r_centi"),
        w_micro.alias("w_micro"))
    return logged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.round(F.sum(F.col("w_micro") * F.col("r_centi")).cast("double")
                 / 1e6 / 100 / F.count(F.lit(1)), 6) + 0.0)
        .alias("ips_value"),
        (F.round(F.sum(F.col("w_micro") * F.col("r_centi")).cast("double")
                 / 100 / F.nullif(F.sum("w_micro"), F.lit(0)), 6) + 0.0)
        .alias("snips_value"),
        (F.round(F.sum("w_micro").cast("double") / 1e6
                 / F.count(F.lit(1)), 6) + 0.0).alias("mean_weight"))


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration per language
# ---------------------------------------------------------------------------

@query("q_hhi", oracle="""
WITH c AS (
  SELECT lang, source, COUNT(*) AS k FROM documents GROUP BY 1, 2
), tot AS (
  SELECT lang, SUM(k) AS n, COUNT(*) AS n_sources FROM c GROUP BY lang
)
SELECT c.lang, CAST(MAX(tot.n) AS BIGINT) AS n_docs,
       CAST(MAX(tot.n_sources) AS BIGINT) AS n_sources,
       ROUND(SUM(k::DOUBLE * k) / (MAX(tot.n)::DOUBLE * MAX(tot.n))
             * 10000, 6) + 0.0 AS hhi,
       ROUND((SUM(k::DOUBLE * k) / (MAX(tot.n)::DOUBLE * MAX(tot.n))
              - 1.0 / MAX(tot.n_sources))
             / NULLIF(1 - 1.0 / MAX(tot.n_sources), 0), 6) + 0.0
         AS hhi_normalized
FROM c JOIN tot USING (lang)
GROUP BY c.lang ORDER BY c.lang
""")
def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman source concentration per language — the
    antitrust-style index (sum of squared shares, scaled to the 0-10000
    convention) beside q_gini_concentration and q_lorenz_points: HHI is
    the one that decomposes per segment cheaply, so per-language
    monopoly-source risk screens in a single pass. The normalized form
    rescales to [0,1] against the equal-share floor 1/n_sources.

    Determinism: (lang, source) counts are exact integers; sum(k^2) is
    an exact BIGINT; both indices are single identical double
    expressions with the one-source degenerate case NULLIFed.

    Scale: one map-side-combined (lang, source) groupBy, a |cells|-row
    rollup — the q_kl_drift footprint."""
    c = (load_table(spark, sf_dir, "documents")
         .groupBy("lang", "source").agg(F.count(F.lit(1)).alias("k")))
    tot = c.groupBy("lang").agg(F.sum("k").alias("n"),
                                F.count(F.lit(1)).alias("n_sources"))
    j = c.join(tot, "lang")
    sum_k2 = F.sum(F.col("k").cast("double") * F.col("k"))
    n = F.max("n").cast("double")
    ns = F.max("n_sources")
    raw = sum_k2 / (n * n)
    return (j.groupBy("lang")
            .agg(F.max("n").cast("long").alias("n_docs"),
                 F.max("n_sources").cast("long").alias("n_sources"),
                 (F.round(raw * 10000, 6) + 0.0).alias("hhi"),
                 (F.round((raw - 1.0 / ns)
                          / F.nullif(1 - 1.0 / ns, F.lit(0.0)), 6) + 0.0)
                 .alias("hhi_normalized"))
            .orderBy("lang"))


# ---------------------------------------------------------------------------
# Top-k token-set overlap between snapshots
# ---------------------------------------------------------------------------

@query("q_topk_overlap", oracle=r"""
WITH toks AS (
  SELECT doc_id % 2 AS snap,
         UNNEST(string_split_regex(text, '\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), counts AS (
  SELECT snap, tok, COUNT(*) AS k FROM toks GROUP BY 1, 2
), ranked AS (
  SELECT snap, tok,
         ROW_NUMBER() OVER (PARTITION BY snap ORDER BY k DESC, tok) AS rk
  FROM counts
), top AS (
  SELECT snap, tok FROM ranked WHERE rk <= 100
), flags AS (
  SELECT tok, MAX(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS in_b
  FROM top GROUP BY tok
)
SELECT CAST(SUM(in_a) AS BIGINT) AS k_a,
       CAST(SUM(in_b) AS BIGINT) AS k_b,
       CAST(SUM(in_a * in_b) AS BIGINT) AS k_common,
       ROUND(SUM(in_a * in_b)::DOUBLE
             / NULLIF(LEAST(SUM(in_a), SUM(in_b)), 0), 6) + 0.0
         AS overlap_at_k
FROM flags
""")
def q_topk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 token-set overlap between corpus snapshots — the
    HEAD-of-distribution drift check beside q_jaccard_drift's full-
    vocabulary one: the head tokens drive tokenizer merges and
    stop-word lists, so "did the top-100 change?" catches the drifts
    that matter for preprocessing even when full-vocabulary Jaccard
    barely moves. Overlap-at-k = |A∩B| / min(|A|,|B|).

    Determinism: per-snapshot ranking is integer count DESC with the
    token string tiebreak (total order); membership flags and the
    overlap are pure integer set algebra.

    Scale: one (snap, tok) groupBy, one 2-partition window over the
    COUNT table (bounded: |vocab| rows), then 200-row set algebra."""
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()))
    counts = (d.select((F.col("doc_id") % 2).alias("snap"),
                       F.explode(F.split("text", _TOK)).alias("tok"))
              .groupBy("snap", "tok").agg(F.count(F.lit(1)).alias("k")))
    rk = F.row_number().over(
        W.partitionBy("snap").orderBy(F.desc("k"), "tok"))
    top = counts.withColumn("rk", rk).filter(F.col("rk") <= 100)
    flags = top.groupBy("tok").agg(
        F.max(F.when(F.col("snap") == 0, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("snap") == 1, 1).otherwise(0)).alias("in_b"))
    both = F.sum(F.col("in_a") * F.col("in_b"))
    return flags.agg(
        F.sum("in_a").cast("long").alias("k_a"),
        F.sum("in_b").cast("long").alias("k_b"),
        both.cast("long").alias("k_common"),
        (F.round(both.cast("double")
                 / F.nullif(F.least(F.sum("in_a"), F.sum("in_b")),
                            F.lit(0)), 6) + 0.0).alias("overlap_at_k"))


# ---------------------------------------------------------------------------
# Corpus perplexity per source under the corpus unigram LM
# ---------------------------------------------------------------------------

@query("q_perplexity", oracle=r"""
WITH toks AS (
  SELECT source, UNNEST(string_split_regex(text, '\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), vocab AS (
  SELECT tok, COUNT(*) AS k FROM toks GROUP BY tok
), tot AS (
  SELECT SUM(k) AS big_n, COUNT(*) AS v FROM vocab
), scored AS (
  SELECT t.source,
         CAST(ROUND(LN((vo.k + 1.0) / (tt.big_n + tt.v)) * 1e9) AS BIGINT)
           AS lp_nano
  FROM toks t JOIN vocab vo USING (tok) CROSS JOIN tot tt
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(-SUM(lp_nano)::DOUBLE / 1e9 / COUNT(*), 6) + 0.0
         AS cross_entropy,
       ROUND(EXP(-SUM(lp_nano)::DOUBLE / 1e9 / COUNT(*)), 6) + 0.0
         AS perplexity
FROM scored GROUP BY source ORDER BY source
""")
def q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus perplexity under the add-one-smoothed corpus
    unigram LM — the single-number quality headline on top of
    q_unigram_logprob's per-document scores (a source whose perplexity
    spikes against the corpus model is off-distribution: boilerplate,
    spam, or another language; the cheapest LM-based source screen
    before any neural scorer).

    Determinism: vocabulary counts and totals are exact integers;
    each token's log-probability is quantized to integer nano-nats
    BEFORE the per-source sum, so cross-entropy is a ratio of exact
    integers and perplexity one EXP on identical doubles.

    Scale: the vocabulary groupBy is paid once (the q_token_topk
    shuffle); scoring is an AQE-brokered join of tokens against the
    vocabulary (broadcast while it fits) with a 1-row totals
    broadcast; output is |sources| rows."""
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()))
    toks = d.select("source", F.explode(F.split("text", _TOK)).alias("tok"))
    # Cached: the totals aggregate and the scoring join both consume
    # the vocabulary — one materialization instead of two corpus
    # explodes (round-10 repeated-subtree audit; the q_pagerank |V|
    # pattern would not help here because BOTH consumers need the full
    # |V|-row relation, not a scalar).
    vocab = _VOCAB_SLOT.own(
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("k")))
    tot = vocab.agg(F.sum("k").alias("big_n"), F.count(F.lit(1)).alias("v"))
    scored = (toks.join(vocab, "tok").crossJoin(F.broadcast(tot))
              .select("source",
                      F.round(F.log((F.col("k") + 1.0)
                                    / (F.col("big_n") + F.col("v"))) * 1e9)
                      .cast("long").alias("lp_nano")))
    ce = -F.sum("lp_nano").cast("double") / 1e9 / F.count(F.lit(1))
    return (scored.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 (F.round(ce, 6) + 0.0).alias("cross_entropy"),
                 (F.round(F.exp(ce), 6) + 0.0).alias("perplexity"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# Lexical diversity: type-token ratio + hapax fraction per source
# ---------------------------------------------------------------------------

@query("q_ttr_hapax", oracle=r"""
WITH toks AS (
  SELECT source, UNNEST(string_split_regex(text, '\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
), tc AS (
  SELECT source, tok, COUNT(*) AS k FROM toks GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(k) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       ROUND(COUNT(*)::DOUBLE / NULLIF(SUM(k), 0), 6) + 0.0 AS ttr,
       ROUND(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END)::DOUBLE
             / NULLIF(COUNT(*), 0), 6) + 0.0 AS hapax_frac
FROM tc GROUP BY source ORDER BY source
""")
def q_ttr_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: type-token ratio and the hapax-
    legomenon fraction (share of vocabulary appearing exactly once) —
    the classic template-detection signals beside q_char_entropy and
    q_ngram_repetition: machine-generated or boilerplate-heavy sources
    show collapsed TTR and hapax rates while looking normal to
    length/punctuation heuristics.

    Determinism: per-(source, token) counts are exact integers; both
    ratios are single integer divisions, NULLIF-guarded for empty
    sources.

    Scale: one (source, token) map-side-combined groupBy, then a
    |sources|-key rollup over the count table — the q_token_topk
    vocabulary shuffle, reused."""
    tc = (load_table(spark, sf_dir, "documents")
          .filter(F.col("text").isNotNull())
          .select("source", F.explode(F.split("text", _TOK)).alias("tok"))
          .groupBy("source", "tok").agg(F.count(F.lit(1)).alias("k")))
    hapax = F.sum(F.when(F.col("k") == 1, 1).otherwise(0))
    return (tc.groupBy("source")
            .agg(F.sum("k").cast("long").alias("n_tokens"),
                 F.count(F.lit(1)).cast("long").alias("n_types"),
                 hapax.cast("long").alias("n_hapax"),
                 (F.round(F.count(F.lit(1)).cast("double")
                          / F.nullif(F.sum("k"), F.lit(0)), 6) + 0.0)
                 .alias("ttr"),
                 (F.round(hapax.cast("double")
                          / F.nullif(F.count(F.lit(1)), F.lit(0)), 6)
                  + 0.0).alias("hapax_frac"))
            .orderBy("source"))


# ---------------------------------------------------------------------------
# IQR-fence outlier audit per stream
# ---------------------------------------------------------------------------

@query("q_outlier_iqr", oracle="""
WITH q AS (
  SELECT event_type,
         PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY value) AS q1,
         PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY value) AS q3,
         COUNT(value) AS n
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(MAX(q.n) AS BIGINT) AS n,
       ROUND(MAX(q.q1), 6) + 0.0 AS q1,
       ROUND(MAX(q.q3), 6) + 0.0 AS q3,
       CAST(SUM(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                       OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(SUM(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                        OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                      THEN 1 ELSE 0 END)::DOUBLE / NULLIF(MAX(q.n), 0),
             6) + 0.0 AS outlier_rate
FROM events e JOIN q USING (event_type)
WHERE e.value IS NOT NULL
GROUP BY e.event_type ORDER BY e.event_type
""")
def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR-fence outlier audit per stream: count and rate of
    values outside [Q1 - 1.5*IQR, Q3 + 1.5*IQR] — the third robust
    outlier gate beside q_anomaly_mad (median/MAD) and q_winsorize
    (percentile clamp): the IQR fence is the box-plot rule dashboards
    and data-quality suites quote, distribution-free and resistant to
    the outliers it hunts.

    Determinism: exact interpolated quartiles (Spark percentile ==
    PERCENTILE_CONT, the q_agg_percentile anchor); the fence test is
    evaluated per row against the per-group quartiles identically on
    both engines; counts are exact integers.

    Scale: the quartile pass needs per-group sorted values (exact form
    — the correctness anchor; at 100 TB swap in approx_percentile's
    mergeable t-digest), then one broadcast-sized |groups|-row join
    back onto the stream for the fence count."""
    ev = load_table(spark, sf_dir, "events")
    q = (ev.groupBy("event_type")
         .agg(F.percentile("value", F.lit(0.25)).alias("q1"),
              F.percentile("value", F.lit(0.75)).alias("q3"),
              F.count("value").alias("n")))
    iqr = F.col("q3") - F.col("q1")
    is_out = ((F.col("value") < F.col("q1") - 1.5 * iqr)
              | (F.col("value") > F.col("q3") + 1.5 * iqr))
    return (ev.filter(F.col("value").isNotNull())
            .join(F.broadcast(q), "event_type")
            .groupBy("event_type")
            .agg(F.max("n").cast("long").alias("n"),
                 (F.round(F.max("q1"), 6) + 0.0).alias("q1"),
                 (F.round(F.max("q3"), 6) + 0.0).alias("q3"),
                 F.sum(F.when(is_out, 1).otherwise(0)).cast("long")
                 .alias("n_outliers"),
                 (F.round(F.sum(F.when(is_out, 1).otherwise(0))
                          .cast("double")
                          / F.nullif(F.max("n"), F.lit(0)), 6) + 0.0)
                 .alias("outlier_rate"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Compression-ratio quality signal (zlib, executor-side)
# ---------------------------------------------------------------------------

@query("q_compress_ratio")  # rows-only: DuckDB has no zlib — golden-tested
def q_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) for
    a deterministic 1/10 keyed sample — the Gopher/FineWeb-style
    redundancy signal: highly compressible text is repetitive
    boilerplate, near-incompressible text is noise/binary spill; both
    tails get filtered before training. ROWS-ONLY by nature (no zlib
    in the oracle engine); pinned by golden tests on planted
    repetitive / random / empty corpora (test_training_data_ops.py)
    and by the cross-engine-free determinism of zlib level 6 on
    identical bytes.

    Scale: map-only Arrow batches (mapInPandas) — compression runs
    executor-side on each partition's documents, no shuffle at all;
    the sample filter prunes before the Python stage."""
    from collections.abc import Iterator

    import pandas as pd

    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()
                 & (F.col("doc_id") % 10 == 0))
         .select("doc_id", "source", "text"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            n_raw = raw.str.len().astype("int64")
            n_comp = raw.map(lambda b: len(zlib.compress(b, 6))) \
                .astype("int64")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_raw": n_raw,
                "n_compressed": n_comp,
                "ratio": (n_comp / n_raw.clip(lower=1)).round(6),
            })

    return d.mapInPandas(
        kernel,
        schema=("doc_id long, source string, n_raw long, "
                "n_compressed long, ratio double"))


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard
# ---------------------------------------------------------------------------

@query("q_nelson_aalen", oracle="""
WITH per_user AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
           AS tp
  FROM events GROUP BY user_id
), horizon AS (
  SELECT MAX(CAST(ts AS DATE)) AS tmax FROM events
), durs AS (
  SELECT CASE WHEN tp IS NOT NULL THEN date_diff('day', t0, tp)
              ELSE date_diff('day', t0, tmax) END AS d_days,
         (tp IS NOT NULL) AS is_event
  FROM per_user CROSS JOIN horizon
), tbl AS (
  SELECT d_days,
         COUNT(*) FILTER (WHERE is_event) AS d,
         COUNT(*) FILTER (WHERE NOT is_event) AS c
  FROM durs GROUP BY d_days
), curve AS (
  SELECT d_days, d, c,
         (SELECT COUNT(*) FROM durs) - COALESCE(SUM(d + c) OVER (
            ORDER BY d_days ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING), 0) AS n_risk
  FROM tbl
), terms AS (
  SELECT d_days, d, c, n_risk,
         CAST(ROUND(d::DOUBLE / n_risk * 1000000000) AS BIGINT) AS h_nano,
         CAST(ROUND(d::DOUBLE / (n_risk::DOUBLE * n_risk) * 1000000000)
              AS BIGINT) AS v_nano
  FROM curve
)
SELECT CAST(d_days AS BIGINT) AS d_days,
       CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d_events,
       ROUND(SUM(h_nano) OVER w / 1e9, 6) + 0.0 AS cum_hazard,
       ROUND(SUM(v_nano) OVER w / 1e9, 6) + 0.0 AS hazard_var
FROM terms
WINDOW w AS (ORDER BY d_days ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
""")
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard for time-to-first-purchase —
    Kaplan-Meier's additive sibling: H(t) = sum over event days of
    d_i/n_i with variance sum d_i/n_i^2 (Klein-Moeschberger form).
    The hazard view is what rate-comparison and churn-model
    diagnostics plot (a straight line means constant hazard); KM's
    product form answers "what fraction survive", this answers "how
    intense is the risk". Same censoring construction as
    q_kaplan_meier.

    Determinism: d and n_risk are exact integers from the shared
    duration table; each increment d/n (and d/n^2) is quantized to
    integer nano-units BEFORE the cumulative window sum — order-free,
    the q_kaplan_meier recipe with a sum instead of a log-product.

    Scale: identical to q_kaplan_meier — user aggregate, 1-row horizon
    broadcast, cumulative windows over the BOUNDED distinct-lag
    table."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (ev.groupBy("user_id")
                .agg(F.min(F.col("ts").cast("date")).alias("t0"),
                     F.min(F.when(F.col("event_type") == "purchase",
                                  F.col("ts").cast("date"))).alias("tp")))
    horizon = ev.agg(F.max(F.col("ts").cast("date")).alias("tmax"))
    durs = (per_user.crossJoin(F.broadcast(horizon))
            .select(F.when(F.col("tp").isNotNull(),
                           F.datediff("tp", "t0"))
                    .otherwise(F.datediff("tmax", "t0")).alias("d_days"),
                    F.col("tp").isNotNull().alias("is_event")))
    tbl = (durs.groupBy("d_days")
           .agg(F.count(F.when(F.col("is_event"), 1)).alias("d"),
                F.count(F.when(~F.col("is_event"), 1)).alias("c")))
    total = durs.agg(F.count(F.lit(1)).alias("n_total"))
    w_prev = W.orderBy("d_days").rowsBetween(W.unboundedPreceding, -1)
    curve = (tbl.crossJoin(F.broadcast(total))
             .withColumn("n_risk",
                         F.col("n_total")
                         - F.coalesce(F.sum(F.col("d") + F.col("c"))
                                      .over(w_prev), F.lit(0))))
    terms = curve.select(
        "d_days", "d", "n_risk",
        F.round(F.col("d").cast("double") / F.col("n_risk") * 1e9)
        .cast("long").alias("h_nano"),
        F.round(F.col("d").cast("double")
                / (F.col("n_risk").cast("double") * F.col("n_risk")) * 1e9)
        .cast("long").alias("v_nano"))
    w_cum = W.orderBy("d_days").rowsBetween(W.unboundedPreceding, 0)
    return terms.select(
        F.col("d_days").cast("long").alias("d_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_events"),
        (F.round(F.sum("h_nano").over(w_cum) / 1e9, 6) + 0.0)
        .alias("cum_hazard"),
        (F.round(F.sum("v_nano").over(w_cum) / 1e9, 6) + 0.0)
        .alias("hazard_var"))


# ---------------------------------------------------------------------------
# Krippendorff's alpha (nominal, 3 raters)
# ---------------------------------------------------------------------------

@query("q_krippendorff", oracle=r"""
WITH feats AS (
  SELECT doc_id,
         CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 400 THEN 1
              ELSE 2 END AS r_chars,
         CASE WHEN len(string_split_regex(text, '\s+')) < 40 THEN 0
              WHEN len(string_split_regex(text, '\s+')) < 80 THEN 1
              ELSE 2 END AS r_words,
         CASE WHEN GREATEST(len(string_split_regex(text, '[.!?]+')) - 1, 1)
                   < 3 THEN 0
              WHEN GREATEST(len(string_split_regex(text, '[.!?]+')) - 1, 1)
                   < 6 THEN 1
              ELSE 2 END AS r_sents
  FROM documents WHERE text IS NOT NULL
), long_form AS (
  SELECT doc_id, r_chars AS cat FROM feats
  UNION ALL SELECT doc_id, r_words FROM feats
  UNION ALL SELECT doc_id, r_sents FROM feats
), cell AS (
  SELECT doc_id, cat, COUNT(*) AS nij FROM long_form GROUP BY 1, 2
), per_item AS (
  SELECT doc_id, SUM(nij * nij) AS s2 FROM cell GROUP BY doc_id
), marg AS (
  SELECT cat, SUM(nij) AS nc FROM cell GROUP BY cat
), agg AS (
  SELECT (SELECT COUNT(*) FROM per_item) AS n_items,
         (SELECT SUM(s2) FROM per_item) AS ss2,
         (SELECT SUM(nc * nc) FROM marg) AS snc2
)
SELECT CAST(n_items AS BIGINT) AS n_items,
       ROUND((9.0 * n_items - ss2) / 2, 6) + 0.0 AS d_observed,
       ROUND((9.0 * n_items * n_items - snc2)
             / NULLIF(3.0 * n_items - 1, 0) / 3, 6) + 0.0 AS d_expected,
       ROUND(1 - ((9.0 * n_items - ss2) / 2)
                 / NULLIF((9.0 * n_items * n_items - snc2)
                          / NULLIF(3.0 * n_items - 1, 0) / 3, 0),
             6) + 0.0 AS alpha
FROM agg
""")
def q_krippendorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal data, 3 raters) — the agreement
    coefficient that, unlike q_cohens_kappa (2 raters) and
    q_fleiss_kappa (chance from rater-pooled marginals), is built on
    COINCIDENCE counts and generalizes to missing ratings and other
    metrics; alpha is what annotation-quality literature reports.
    Same three length-proxy raters as q_fleiss_kappa, so the two
    coefficients are directly comparable on this corpus.

    Math (m = 3 raters everywhere): observed disagreement
    Do = sum_i (m^2 - sum_c n_ic^2) / (m - 1) = (9N - SS2)/2;
    coincidence marginals n_c equal the category totals C_c with
    n = 3N, so expected disagreement
    De = (n^2 - sum_c C_c^2)/(n - 1) scaled by 1/3 to match Do's
    per-item normalization; alpha = 1 - Do/De.

    Determinism: SS2 and the marginal squares are exact integer sums;
    alpha is one identical double expression, degenerate corpora
    (single category -> De = 0) NULLIF to undefined.

    Scale: identical to q_fleiss_kappa — explode to 3N rows, two
    map-side-combined groupBys, scalar output."""
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()))
    n_words = F.size(F.split("text", _TOK))
    n_sents = F.greatest(F.size(F.split("text", r"[.!?]+")) - 1, F.lit(1))
    bucket = (lambda c, lo, hi: F.when(c < lo, 0).when(c < hi, 1)
              .otherwise(2))
    long_form = d.select(
        "doc_id",
        F.explode(F.array(
            bucket(F.col("n_chars"), 200, 400),
            bucket(n_words, 40, 80),
            bucket(n_sents, 3, 6))).alias("cat"))
    cell = long_form.groupBy("doc_id", "cat").agg(
        F.count(F.lit(1)).alias("nij"))
    per_item = cell.groupBy("doc_id").agg(
        F.sum(F.col("nij") * F.col("nij")).alias("s2"))
    marg = cell.groupBy("cat").agg(F.sum("nij").alias("nc"))
    agg = (per_item.agg(F.count(F.lit(1)).alias("n_items"),
                        F.sum("s2").alias("ss2"))
           .crossJoin(F.broadcast(
               marg.agg(F.sum(F.col("nc") * F.col("nc")).alias("snc2")))))
    n = F.col("n_items").cast("double")
    do = (9.0 * n - F.col("ss2")) / 2
    de = ((9.0 * n * n - F.col("snc2"))
          / F.nullif(3.0 * n - 1, F.lit(0.0)) / 3)
    return agg.select(
        F.col("n_items").cast("long").alias("n_items"),
        (F.round(do, 6) + 0.0).alias("d_observed"),
        (F.round(de, 6) + 0.0).alias("d_expected"),
        (F.round(1 - do / F.nullif(de, F.lit(0.0)), 6) + 0.0)
        .alias("alpha"))


# ---------------------------------------------------------------------------
# Centroid silhouette per label
# ---------------------------------------------------------------------------

@query("q_silhouette", oracle="""
WITH dims AS (
  -- DuckDB v1.0 has no WITH ORDINALITY; parallel UNNESTs zip
  SELECT vec_id, label, UNNEST(embedding) AS x,
         UNNEST(range(1, len(embedding) + 1)) AS i
  FROM embeddings
), cent AS (
  SELECT label AS clabel, i,
         SUM(CAST(ROUND(x * 1e9) AS BIGINT))::DOUBLE / COUNT(*) / 1e9
           AS c
  FROM dims GROUP BY 1, 2
), dist AS (
  SELECT d.vec_id, d.label, ct.clabel,
         SUM(CAST(ROUND((d.x - ct.c) * (d.x - ct.c) * 1e9) AS BIGINT))
           AS d2_nano
  FROM dims d JOIN cent ct USING (i)
  GROUP BY 1, 2, 3
), ab AS (
  SELECT vec_id, label,
         MAX(CASE WHEN clabel = label THEN d2_nano END) AS a2,
         MIN(CASE WHEN clabel != label THEN d2_nano END) AS b2
  FROM dist GROUP BY 1, 2
), s AS (
  SELECT label,
         CAST(ROUND((SQRT(b2 / 1e9) - SQRT(a2 / 1e9))
                    / NULLIF(GREATEST(SQRT(a2 / 1e9), SQRT(b2 / 1e9)), 0)
                    * 1e6) AS BIGINT) AS s_micro
  FROM ab
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(s_micro)::DOUBLE / 1e6 / COUNT(*), 6) + 0.0
         AS mean_silhouette
FROM s GROUP BY label ORDER BY label
""")
def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based silhouette per label: s = (b - a)/max(a, b) with
    a = distance to the OWN label centroid and b = distance to the
    nearest OTHER centroid — the clustering-quality readout over the
    embedding space (the simplified silhouette: O(n * k) centroid
    distances instead of the classic O(n^2) pairwise form, which is
    the only silhouette anyone runs at corpus scale). Completes the
    class-geometry family: q_centroid_sim measures centroid-PAIR
    angles, q_label_knn_noise audits points, this scores SEPARATION
    per class.

    Determinism: centroid coordinates are ratios of nano-quantized
    integer dim sums (exact); every squared-distance is a per-dim
    nano-quantized integer sum (order-free); per-point silhouettes are
    micro-quantized before the class mean, and the b-argmin is an
    integer comparison.

    Scale: one explode to n x d cells, a (label, dim) centroid groupBy
    (k x d rows, broadcast), one n x k distance aggregate — vectors
    never pairwise-join; the n^2 form is exactly what this query
    exists to avoid."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("i", "x"))
    cent = (dims.groupBy(F.col("label").alias("clabel"), "i")
            .agg((F.sum(F.round(F.col("x") * 1e9).cast("long"))
                  .cast("double") / F.count(F.lit(1)) / 1e9).alias("c")))
    diff = F.col("x") - F.col("c")
    dist = (dims.join(F.broadcast(cent), "i")
            .groupBy("vec_id", "label", "clabel")
            .agg(F.sum(F.round(diff * diff * 1e9).cast("long"))
                 .alias("d2_nano")))
    ab = (dist.groupBy("vec_id", "label")
          .agg(F.max(F.when(F.col("clabel") == F.col("label"),
                            F.col("d2_nano"))).alias("a2"),
               F.min(F.when(F.col("clabel") != F.col("label"),
                            F.col("d2_nano"))).alias("b2")))
    a = F.sqrt(F.col("a2") / 1e9)
    b = F.sqrt(F.col("b2") / 1e9)
    s = ab.select(
        "label",
        F.round((b - a) / F.nullif(F.greatest(a, b), F.lit(0.0)) * 1e6)
        .cast("long").alias("s_micro"))
    return (s.groupBy(F.col("label").cast("long").alias("label"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 (F.round(F.sum("s_micro").cast("double") / 1e6
                          / F.count(F.lit(1)), 6) + 0.0)
                 .alias("mean_silhouette"))
            .orderBy("label"))


# ---------------------------------------------------------------------------
# Mann-Kendall trend test per stream
# ---------------------------------------------------------------------------

@query("q_mann_kendall", oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(ROUND(SUM(CAST(ROUND(value * 1000000) AS BIGINT))::DOUBLE
                    / COUNT(*)) AS BIGINT) AS mu
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type,
         CASE WHEN b.mu > a.mu THEN 1 WHEN b.mu < a.mu THEN -1
              ELSE 0 END AS sgn
  FROM daily a JOIN daily b ON b.event_type = a.event_type
                           AND b.day > a.day
), ties AS (
  SELECT event_type, SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT event_type, mu, COUNT(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY event_type
), s AS (
  SELECT p.event_type, SUM(p.sgn) AS s_stat,
         (SELECT COUNT(*) FROM daily d
          WHERE d.event_type = p.event_type) AS n
  FROM pairs p GROUP BY p.event_type
)
SELECT s.event_type, CAST(n AS BIGINT) AS n_days,
       CAST(s_stat AS BIGINT) AS s_stat,
       ROUND((s_stat - CASE WHEN s_stat > 0 THEN 1
                            WHEN s_stat < 0 THEN -1 ELSE 0 END)
             / NULLIF(SQRT((n::DOUBLE * (n - 1) * (2 * n + 5)
                            - t.tie_term) / 18), 0), 6) + 0.0 AS z
FROM s JOIN ties t USING (event_type)
ORDER BY s.event_type
""")
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per stream: S = sum of sign(x_j - x_i)
    over all day pairs i < j of the daily-mean series, with the
    tie-corrected normal approximation and continuity correction —
    the nonparametric IS-there-a-trend test that pairs with
    q_theilsen's HOW-big slope estimator (the two are the standard
    monotonic-trend kit: MK decides, Theil-Sen quantifies), robust
    where q_grouped_regression's least squares is outlier-bent.

    Determinism: daily means are integer micro-units (the q_ewma
    recipe); S and the tie term are exact integer sums; z is one
    identical double tree, constant series (var = 0) NULLIF to
    undefined.

    Scale: the pairwise sign sum runs over the BOUNDED daily table
    (days^2 per stream, not rows^2 — the q_theilsen argument), keyed
    on the stream so the self-join is an equi-join."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.round(F.sum(F.round(F.col("value") * 1e6)
                                .cast("bigint")).cast("double")
                          / F.count(F.lit(1))).cast("bigint").alias("mu")))
    a = daily.select("event_type", F.col("day").alias("da"),
                     F.col("mu").alias("ma"))
    b = daily.select("event_type", F.col("day").alias("db"),
                     F.col("mu").alias("mb"))
    pairs = (a.join(b, "event_type").filter(F.col("db") > F.col("da"))
             .select("event_type",
                     F.when(F.col("mb") > F.col("ma"), 1)
                     .when(F.col("mb") < F.col("ma"), -1).otherwise(0)
                     .alias("sgn")))
    s = pairs.groupBy("event_type").agg(F.sum("sgn").alias("s_stat"))
    n_tbl = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (daily.groupBy("event_type", "mu")
            .agg(F.count(F.lit(1)).alias("t"))
            .groupBy("event_type")
            .agg(F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
                 .alias("tie_term")))
    j = s.join(n_tbl, "event_type").join(ties, "event_type")
    n = F.col("n").cast("double")
    cc = F.when(F.col("s_stat") > 0, 1).when(F.col("s_stat") < 0, -1) \
          .otherwise(0)
    var = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")) / 18
    return (j.select("event_type", F.col("n").cast("long").alias("n_days"),
                     F.col("s_stat").cast("long").alias("s_stat"),
                     (F.round((F.col("s_stat") - cc)
                              / F.nullif(F.sqrt(var), F.lit(0.0)), 6)
                      + 0.0).alias("z"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test per stream
# ---------------------------------------------------------------------------

@query("q_runs_test", oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(ROUND(SUM(CAST(ROUND(value * 1000000) AS BIGINT))::DOUBLE
                    / COUNT(*)) AS BIGINT) AS mu
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), med AS (
  SELECT event_type,
         PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY mu) AS m
  FROM daily GROUP BY event_type
), signs AS (
  SELECT d.event_type, d.day,
         CASE WHEN d.mu > med.m THEN 1 ELSE 0 END AS up
  FROM daily d JOIN med USING (event_type)
  WHERE d.mu != med.m
), runs AS (
  SELECT event_type, up,
         CASE WHEN LAG(up) OVER (PARTITION BY event_type ORDER BY day)
                   IS DISTINCT FROM up THEN 1 ELSE 0 END AS new_run
  FROM signs
), agg AS (
  SELECT event_type, SUM(new_run) AS r,
         SUM(up) AS n1, SUM(1 - up) AS n2
  FROM runs GROUP BY event_type
)
SELECT event_type, CAST(n1 AS BIGINT) AS n_above,
       CAST(n2 AS BIGINT) AS n_below, CAST(r AS BIGINT) AS n_runs,
       ROUND((r - (2.0 * n1 * n2 / NULLIF(n1 + n2, 0) + 1))
             / NULLIF(SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                           / (NULLIF((n1 + n2)::DOUBLE, 0)
                              * NULLIF((n1 + n2)::DOUBLE, 0)
                              * NULLIF(n1 + n2 - 1, 0))), 0),
             6) + 0.0 AS z
FROM agg ORDER BY event_type
""")
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per stream: is the daily-mean series
    RANDOM around its median, or does it clump (too few runs =
    autocorrelated/regime-y, too many = oscillating)? The randomness
    gate that complements q_mann_kendall (monotone trend) and q_acf
    (linear autocorrelation) — a series can pass both and still fail
    runs. Median-split signs, median-equal days dropped (the standard
    treatment), z from the exact run-count moments.

    Determinism: daily means are integer micro-units; the median is
    exact interpolated (engine-identical); signs, run starts (LAG IS
    DISTINCT FROM), and counts are integers; z is one identical
    double tree with every denominator NULLIF-guarded.

    Scale: the lag window and aggregates run over the BOUNDED daily
    table, keyed per stream."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.round(F.sum(F.round(F.col("value") * 1e6)
                                .cast("bigint")).cast("double")
                          / F.count(F.lit(1))).cast("bigint").alias("mu")))
    med = daily.groupBy("event_type").agg(
        F.percentile("mu", F.lit(0.5)).alias("m"))
    signs = (daily.join(med, "event_type")
             .filter(F.col("mu") != F.col("m"))
             .select("event_type", "day",
                     F.when(F.col("mu") > F.col("m"), 1).otherwise(0)
                     .alias("up")))
    lag = F.lag("up").over(W.partitionBy("event_type").orderBy("day"))
    runs = signs.select(
        "event_type", "up",
        F.when(~lag.eqNullSafe(F.col("up")), 1).otherwise(0)
        .alias("new_run"))
    agg = runs.groupBy("event_type").agg(
        F.sum("new_run").alias("r"), F.sum("up").alias("n1"),
        F.sum(1 - F.col("up")).alias("n2"))
    n1, n2, r = (F.col(c).cast("double") for c in ("n1", "n2", "r"))
    n = n1 + n2
    mean_r = 2.0 * n1 * n2 / F.nullif(n1 + n2, F.lit(0.0)) + 1
    var_r = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
             / (F.nullif(n, F.lit(0.0)) * F.nullif(n, F.lit(0.0))
                * F.nullif(n1 + n2 - 1, F.lit(0.0))))
    return (agg.select("event_type",
                       F.col("n1").cast("long").alias("n_above"),
                       F.col("n2").cast("long").alias("n_below"),
                       F.col("r").cast("long").alias("n_runs"),
                       (F.round((r - mean_r)
                                / F.nullif(F.sqrt(var_r), F.lit(0.0)), 6)
                        + 0.0).alias("z"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Kruskal-Wallis k-group rank test per stream
# ---------------------------------------------------------------------------

@query("q_kruskal_wallis", oracle="""
WITH s AS (
  SELECT event_type, value, user_id % 4 AS grp
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
), c AS (
  SELECT event_type, value,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS c2,
         SUM(CASE WHEN grp = 3 THEN 1 ELSE 0 END) AS c3,
         COUNT(*) AS c
  FROM s GROUP BY event_type, value
), r AS (
  SELECT event_type, c0, c1, c2, c3, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY value
                      ROWS UNBOUNDED PRECEDING) - c AS cum_before
  FROM c
), agg AS (
  SELECT event_type,
         SUM(c0) AS n0, SUM(c1) AS n1, SUM(c2) AS n2, SUM(c3) AS n3,
         SUM(c0 * (2 * cum_before + c + 1)) AS r20,
         SUM(c1 * (2 * cum_before + c + 1)) AS r21,
         SUM(c2 * (2 * cum_before + c + 1)) AS r22,
         SUM(c3 * (2 * cum_before + c + 1)) AS r23,
         SUM(c * c * c - c) AS ties,
         SUM(c) AS n
  FROM r GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND((12.0 / (n::DOUBLE * (n + 1))
              * ((r20 / 2.0) * (r20 / 2.0) / NULLIF(n0, 0)
                 + (r21 / 2.0) * (r21 / 2.0) / NULLIF(n1, 0)
                 + (r22 / 2.0) * (r22 / 2.0) / NULLIF(n2, 0)
                 + (r23 / 2.0) * (r23 / 2.0) / NULLIF(n3, 0))
              - 3.0 * (n + 1))
             / NULLIF(1.0 - ties::DOUBLE
                      / NULLIF(n::DOUBLE * n * n - n, 0), 0),
             6) + 0.0 AS h_stat
FROM agg ORDER BY event_type
""")
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H per stream across FOUR user cohorts — the
    k-group generalization of q_mann_whitney (which compares exactly
    two): the one-way ANOVA on ranks that a multi-variant experiment
    readout runs when the metric is skewed. Tie-corrected H; compare
    to chi-square with k-1 degrees of freedom.

    Determinism: the q_mann_whitney distinct-value rank algebra — per
    (type, value) cohort counts, 2*avg_rank = 2*cum_before + c + 1 as
    an exact integer, so every doubled rank sum R2_g and the tie term
    are order-free BIGINT sums; H is one identical double tree with
    NULLIF guards for empty cohorts and constant series.

    Scale: one shuffle on (type, value), one type-keyed window over
    DISTINCT values (bounded by the value grid, never |rows|), one
    |types|-row aggregate."""
    s = (load_table(spark, sf_dir, "events")
         .filter(F.col("value").isNotNull() & F.col("user_id").isNotNull())
         .select("event_type", "value", (F.col("user_id") % 4).alias("grp")))
    gc = [F.sum(F.when(F.col("grp") == g, 1).otherwise(0)).alias(f"c{g}")
          for g in range(4)]
    c = s.groupBy("event_type", "value").agg(
        *gc, F.count(F.lit(1)).alias("c"))
    w = (W.partitionBy("event_type").orderBy("value")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    r = c.withColumn("cum_before", F.sum("c").over(w) - F.col("c"))
    r2 = 2 * F.col("cum_before") + F.col("c") + 1
    agg = r.groupBy("event_type").agg(
        *[F.sum(F.col(f"c{g}")).alias(f"n{g}") for g in range(4)],
        *[F.sum(F.col(f"c{g}") * r2).alias(f"r2{g}") for g in range(4)],
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .alias("ties"),
        F.sum("c").alias("n"))
    n = F.col("n").cast("double")
    rank_term = sum(
        ((F.col(f"r2{g}") / 2.0) * (F.col(f"r2{g}") / 2.0)
         / F.nullif(F.col(f"n{g}"), F.lit(0)))
        for g in range(4))
    h = ((12.0 / (n * (n + 1)) * rank_term - 3.0 * (n + 1))
         / F.nullif(1.0 - F.col("ties").cast("double")
                    / F.nullif(n * n * n - n, F.lit(0.0)), F.lit(0.0)))
    return (agg.select("event_type", F.col("n").cast("long").alias("n"),
                       (F.round(h, 6) + 0.0).alias("h_stat"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# Brown-Forsythe variance-equality test across streams
# ---------------------------------------------------------------------------

@query("q_brown_forsythe", oracle="""
WITH med AS (
  SELECT event_type,
         PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value) AS m
  FROM events WHERE value IS NOT NULL GROUP BY event_type
), z AS (
  SELECT e.event_type,
         CAST(ROUND(ABS(e.value - med.m) * 1e3) AS BIGINT) AS z_milli
  FROM events e JOIN med USING (event_type)
  WHERE e.value IS NOT NULL
), g AS (
  SELECT event_type, COUNT(*) AS n_g, SUM(z_milli) AS sz,
         SUM(z_milli * z_milli) AS szz
  FROM z GROUP BY event_type
), tot AS (
  SELECT SUM(n_g) AS n, COUNT(*) AS k, SUM(sz) AS sz_all FROM g
)
SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(k) AS BIGINT) AS k_groups,
       ROUND((SUM(n_g * (sz::DOUBLE / n_g / 1e3
                         - sz_all::DOUBLE / n / 1e3)
                  * (sz::DOUBLE / n_g / 1e3
                     - sz_all::DOUBLE / n / 1e3))
              / NULLIF(MAX(k) - 1, 0))
             / NULLIF((SUM((szz::DOUBLE
                            - sz::DOUBLE * sz / n_g) / 1e6)
                       / NULLIF(MAX(n) - MAX(k), 0)), 0),
             6) + 0.0 AS f_stat
FROM g CROSS JOIN tot
""")
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-equality test across streams: one-way
    ANOVA F on |x - group MEDIAN| — the robust Levene variant that
    gates every pooled-variance procedure (q_ab_ttest's equal-variance
    flavor, ANOVA itself): if spreads differ, compare medians/ranks
    instead. Median centering (not mean) keeps the test honest under
    the same skew it is hunting.

    Determinism: group medians are exact interpolated percentiles
    (engine-identical); each |x - m| is quantized to integer
    MILLI-units — coarse enough that the sum of squares stays inside
    BIGINT at any scale factor (nano overflowed at sf0.001 already:
    (5e11)^2 per row), fine enough for a 2-decimal metric — so all
    group sums and sums-of-squares are exact BIGINTs; F is one
    identical double tree, single-group and zero-within-variance
    inputs NULLIF to undefined.

    Scale: one percentile pass, one broadcast of the |groups|-row
    median table back onto the stream, one conditional-aggregate pass
    — the q_outlier_iqr shape with an F readout."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull()))
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("m"))
    z = (ev.join(F.broadcast(med), "event_type")
         .select("event_type",
                 F.round(F.abs(F.col("value") - F.col("m")) * 1e3)
                 .cast("long").alias("z_milli")))
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("z_milli").alias("sz"),
        F.sum(F.col("z_milli") * F.col("z_milli")).alias("szz"))
    tot = g.agg(F.sum("n_g").alias("n"), F.count(F.lit(1)).alias("k"),
                F.sum("sz").alias("sz_all"))
    j = g.crossJoin(F.broadcast(tot))
    mean_g = F.col("sz").cast("double") / F.col("n_g") / 1e3
    mean_all = F.col("sz_all").cast("double") / F.col("n") / 1e3
    between = (F.sum(F.col("n_g") * (mean_g - mean_all)
                     * (mean_g - mean_all))
               / F.nullif(F.max("k") - 1, F.lit(0)))
    within = (F.sum((F.col("szz").cast("double")
                     - F.col("sz").cast("double") * F.col("sz")
                     / F.col("n_g")) / 1e6)
              / F.nullif(F.max("n") - F.max("k"), F.lit(0)))
    return j.agg(
        F.max("n").cast("long").alias("n"),
        F.max("k").cast("long").alias("k_groups"),
        (F.round(between / F.nullif(within, F.lit(0.0)), 6) + 0.0)
        .alias("f_stat"))
