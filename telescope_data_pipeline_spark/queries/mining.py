"""Round-8 mining & scoring queries: drift (PSI), association rules,
link prediction (Adamic-Adar), empirical-Bayes rate shrinkage, WOE/IV
feature scoring, the feature-hashing trick, mutual-NN linkage, and
Theil-Sen robust trends.

These extend the engine's analytics surface with the classic
data-science / feature-engineering operators a training-data platform
runs next to its dedup and quality gates. Every query follows the
registry determinism contract (registry.py module docstring); the
float-SUM ones use the nano-unit integer quantization recipe (sum
BIGINTs, divide once) so partial-aggregation order can't flip a hash
bit at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.tables import load_table
from ..session import stock_coalesce_floor
from .registry import query

_TOK = r"\s+"


# ---------------------------------------------------------------------------
# Distribution drift: Population Stability Index
# ---------------------------------------------------------------------------

@query("q_psi_drift", oracle="""
WITH ref AS (
  SELECT value FROM events WHERE ts <  TIMESTAMP '2024-01-16 00:00:00'
), cur AS (
  SELECT value FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
), edges AS (
  SELECT MIN(value) AS mn, MAX(value) AS mx FROM ref
), binned AS (
  SELECT LEAST(9, GREATEST(0, CAST(COALESCE(
           FLOOR((value - mn) * 10.0 / NULLIF(mx - mn, 0)), 0) AS INT)))
           AS bin,
         side
  FROM (SELECT value, 0 AS side FROM ref
        UNION ALL SELECT value, 1 AS side FROM cur)
  CROSS JOIN edges
), counts AS (
  SELECT b.bin,
         COALESCE(SUM(CASE WHEN side = 0 THEN 1 END), 0) AS n_ref,
         COALESCE(SUM(CASE WHEN side = 1 THEN 1 END), 0) AS n_cur
  FROM (SELECT CAST(UNNEST(generate_series(0, 9)) AS INT) AS bin) b
  LEFT JOIN binned USING (bin)
  GROUP BY b.bin
), probs AS (
  SELECT bin, n_ref, n_cur,
         (n_ref + 0.5) / (SUM(n_ref) OVER () + 5.0) AS p_ref,
         (n_cur + 0.5) / (SUM(n_cur) OVER () + 5.0) AS p_cur
  FROM counts
), terms AS (
  SELECT bin, n_ref, n_cur,
         CAST(ROUND((p_cur - p_ref) * LN(p_cur / p_ref) * 1e9) AS BIGINT)
           AS t_nano
  FROM probs
)
SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       ROUND(t_nano / 1e9, 6) + 0.0 AS psi_term,
       ROUND(SUM(t_nano) OVER () / 1e9, 6) + 0.0 AS psi_total
FROM terms
""")
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two time windows of the
    `events.value` score — the industry-standard drift monitor next to
    the engine's KS (q_ks_drift) and KL (q_kl_drift) tests: 10
    equal-width bins over the REFERENCE window's range, 0.5-per-bin
    Laplace smoothing so an empty bin contributes a finite term, and
    PSI = sum (p_cur - p_ref) * ln(p_cur / p_ref).

    Spark shape: one scan computes both windows (a side flag, not two
    jobs), the bin edges are a 1-row broadcast scalar, and per-bin
    counts partial-aggregate map-side — shuffle volume is 20 rows
    regardless of input size. The total is an integer nano-unit sum of
    per-bin terms (order-free), not a float fold.
    """
    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    sided = ev.select("value",
                      F.when(F.col("ts") < split, 0).otherwise(1)
                      .alias("side"))
    edges = (sided.filter(F.col("side") == 0)
             .agg(F.min("value").alias("mn"), F.max("value").alias("mx")))
    # NULLIF + COALESCE guard: a reference window holding a single
    # distinct value (mx == mn) or an empty reference window (mn/mx
    # NULL) bins everything to 0 instead of raising ANSI DIVIDE_BY_ZERO
    # — the edge-corpus contract.
    binv = F.least(F.lit(9), F.greatest(F.lit(0), F.coalesce(
        F.floor((F.col("value") - F.col("mn")) * 10.0
                / F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))),
        F.lit(0)).cast("int")))
    counts = (sided.crossJoin(F.broadcast(edges))
              .groupBy(binv.alias("bin"))
              .agg(F.coalesce(F.sum(F.when(F.col("side") == 0, 1)), F.lit(0))
                   .alias("n_ref"),
                   F.coalesce(F.sum(F.when(F.col("side") == 1, 1)), F.lit(0))
                   .alias("n_cur")))
    bins = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    full = (bins.join(counts, "bin", "left")
            .select("bin",
                    F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
                    F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur")))
    wall = W.partitionBy().orderBy("bin").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing)
    p_ref = (F.col("n_ref") + 0.5) / (F.sum("n_ref").over(wall) + 5.0)
    p_cur = (F.col("n_cur") + 0.5) / (F.sum("n_cur").over(wall) + 5.0)
    t_nano = F.round((p_cur - p_ref) * F.log(p_cur / p_ref) * 1e9) \
        .cast("long")
    return (full.withColumn("t_nano", t_nano)
            .select("bin", "n_ref", "n_cur",
                    (F.round(F.col("t_nano") / 1e9, 6) + 0.0)
                    .alias("psi_term"),
                    (F.round(F.sum("t_nano").over(wall) / 1e9, 6) + 0.0)
                    .alias("psi_total")))


# ---------------------------------------------------------------------------
# Association rules (market basket on brand co-occurrence)
# ---------------------------------------------------------------------------

@query("q_assoc_rules", oracle="""
WITH ob AS (
  SELECT DISTINCT l_orderkey AS ok, p_brand AS b
  FROM lineitem JOIN part ON p_partkey = l_partkey
), n AS (
  SELECT COUNT(DISTINCT ok) AS n_orders FROM ob
), bc AS (
  SELECT b, COUNT(*) AS c FROM ob GROUP BY b
), pairs AS (
  SELECT a.b AS ante, c.b AS cons, COUNT(*) AS n_both
  FROM ob a JOIN ob c ON a.ok = c.ok AND a.b < c.b
  GROUP BY 1, 2
)
SELECT ante, cons, CAST(n_both AS BIGINT) AS n_both,
       ROUND(n_both * 1.0 / n_orders, 6) + 0.0            AS support,
       ROUND(n_both * 1.0 / ca.c, 6) + 0.0                AS confidence,
       ROUND(n_both * 1.0 * n_orders / (ca.c * cb.c), 6) + 0.0 AS lift
FROM pairs
JOIN bc ca ON ca.b = ante
JOIN bc cb ON cb.b = cons
CROSS JOIN n
WHERE n_both >= 20
ORDER BY lift DESC, ante, cons
LIMIT 50
""")
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise association rules (Apriori level 2) over brand baskets:
    for brand pairs co-occurring in >= 20 orders, support, directional
    confidence, and lift — the market-basket mining classic, top 50 by
    lift with a full (ante, cons) tiebreak.

    Spark shape: the basket relation is DISTINCT(order, brand) — one
    shuffle — then a self-join keyed on the order key, so the shuffle
    co-locates each basket and pair generation is local and bounded by
    (basket size choose 2), never |orders|^2. The 25-row brand-count
    dim and the 1-row total broadcast. All ratios are divisions of
    exact integer counts: deterministic at any parallelism.
    """
    # r14 (guide SS2.3/SS1.2): this query is a chain of bounded
    # aggregates/windows over mid-size shuffles with no output-
    # expanding join, so the engine's 64 KB AQE coalesce floor only
    # buys per-stage task overhead here; run it on the stock-floor
    # child session (interleaved min3 A/B in OPTIMIZATION_r14.md).
    spark = stock_coalesce_floor(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    ob = (li.join(pt, pt.p_partkey == li.l_partkey)
          .select(F.col("l_orderkey").alias("ok"),
                  F.col("p_brand").alias("b"))
          .distinct())
    n = ob.agg(F.countDistinct("ok").alias("n_orders"))
    bc = ob.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    a, c = ob.alias("a"), ob.alias("c")
    pairs = (a.join(c, (F.col("a.ok") == F.col("c.ok"))
                    & (F.col("a.b") < F.col("c.b")))
             .groupBy(F.col("a.b").alias("ante"), F.col("c.b").alias("cons"))
             .agg(F.count(F.lit(1)).alias("n_both"))
             .filter(F.col("n_both") >= 20))
    ca = bc.select(F.col("b").alias("ante"), F.col("c").alias("ca"))
    cb = bc.select(F.col("b").alias("cons"), F.col("c").alias("cb"))
    return (pairs.join(F.broadcast(ca), "ante")
            .join(F.broadcast(cb), "cons")
            .crossJoin(F.broadcast(n))
            .select("ante", "cons", F.col("n_both").cast("long").alias("n_both"),
                    (F.round(F.col("n_both") / F.col("n_orders"), 6) + 0.0)
                    .alias("support"),
                    (F.round(F.col("n_both") / F.col("ca"), 6) + 0.0)
                    .alias("confidence"),
                    (F.round(F.col("n_both") * F.col("n_orders")
                             / (F.col("ca") * F.col("cb")), 6) + 0.0)
                    .alias("lift"))
            .orderBy(F.desc("lift"), "ante", "cons")
            .limit(50))


# ---------------------------------------------------------------------------
# Link prediction: Adamic-Adar on the customer/part bipartite graph
# ---------------------------------------------------------------------------

@query("q_adamic_adar", oracle="""
WITH buyers AS (
  SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), deg AS (
  SELECT pk, COUNT(*) AS d FROM buyers GROUP BY pk
  HAVING COUNT(*) BETWEEN 2 AND 40
), w AS (
  SELECT pk, CAST(ROUND(1e9 / LN(d) ) AS BIGINT) AS w_nano FROM deg
), pairs AS (
  SELECT a.ck AS ck_a, b.ck AS ck_b,
         COUNT(*) AS n_shared, SUM(w_nano) AS s_nano
  FROM buyers a
  JOIN buyers b ON a.pk = b.pk AND a.ck < b.ck
  JOIN w ON w.pk = a.pk
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
)
SELECT ck_a, ck_b, CAST(n_shared AS BIGINT) AS n_shared,
       ROUND(s_nano / 1e9, 6) + 0.0 AS aa_score
FROM pairs
ORDER BY s_nano DESC, ck_a, ck_b
LIMIT 100
""")
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the customer<->part bipartite
    graph: score candidate customer pairs by sum over co-purchased
    parts of 1/ln(part degree) — the inverse-log weighting that
    downweights popular parts. Top 100 by score, >= 2 shared parts.

    Scale: JOIN-FREE pair generation (round-9 VERDICT weak item: the
    former pk-keyed self-join recomputed the orders-join-lineitem base
    once per plan branch — four times). Because the degree cap (<= 40
    buyers) bounds every surviving part's buyer list, the common-
    neighbor pairs are expanded MAP-SIDE from a per-part collected
    array with higher-order functions — the base relation is scanned
    exactly once (plan-pinned) and no self-join exists to duplicate
    it. The collection is a salted two-level aggregate
    (groupBy(pk, ck % 256) then merge), so a 10M-degree hub part never
    builds one giant list on one task: each salt group holds
    degree/256 ids during partial collect and the merged cap keeps 41
    per salt, after which the d > 40 filter discards the hub — the
    same hub-removal every production link predictor applies, since a
    hub contributes ~0 weight per pair while emitting deg^2 of them.
    Per-part weights are pre-quantized to integer nano-units so the
    pair score is a BIGINT sum — order-free — and the top-100 ORDER BY
    runs on the integer, making rank ties impossible to flip.
    """
    pairs = (adamic_adar_candidate_pairs(spark, sf_dir)
             .groupBy("ck_a", "ck_b")
             .agg(F.count(F.lit(1)).alias("n_shared"),
                  F.sum("w_nano").alias("s_nano"))
             .filter(F.col("n_shared") >= 2))
    return (pairs
            .orderBy(F.desc("s_nano"), "ck_a", "ck_b")
            .limit(100)
            .select("ck_a", "ck_b",
                    F.col("n_shared").cast("long").alias("n_shared"),
                    (F.round(F.col("s_nano") / 1e9, 6) + 0.0)
                    .alias("aa_score")))


def adamic_adar_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Adamic-Adar candidate stream ``(ck_a, ck_b, w_nano)`` — one
    row per (customer pair, shared part) BEFORE the pair aggregation.
    Factored out so bench.py can publish the candidate-pair count as a
    diagnostic (round-9 VERDICT item 1: make the wall time
    attributable to pair volume, the q_dedup_embed_lsh precedent).

    Construction (see q_adamic_adar's docstring for the scale
    rationale): one scan builds the distinct (customer, part) edge
    list; a salted two-level aggregate collects each part's sorted
    buyer array with its exact degree (partial lists capped at 41 per
    salt — a >40-degree hub is discarded by the cap filter without
    ever materializing its full list in one place); pairs then expand
    MAP-SIDE from the bounded array via transform/slice — no self-join
    recomputes the base, no hub can reach the deg^2 blowup (round-8
    ADVICE: prune before pair generation, Catalyst won't reorder it
    for us)."""
    grouped = adamic_adar_capped_arrays(spark, sf_dir)
    w_nano = F.round(F.lit(1e9) / F.log("d")).cast("long")
    return (aa_pairs(grouped.select(w_nano.alias("w_nano"), "cks"),
                     "w_nano")
            .select("ck_a", "ck_b", "w_nano"))


def adamic_adar_capped_arrays(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The hub-pruned per-part buyer arrays ``(pk, d, cks)`` the pair
    expansion runs over — one fact scan. Factored out (round 12) so
    q_jaccard_linkpred derives its customer degrees from the SAME
    relation instead of a second pipeline over the base tables."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    buyers = (od.join(li, li.l_orderkey == od.o_orderkey)
              .select(F.col("o_custkey").alias("ck"),
                      F.col("l_partkey").alias("pk"))
              .distinct())
    # Degree-first hub pruning (r13, guide §2.3/§2.5 — replaces the
    # old salted two-level capped collect): per-part degree is a
    # map-side-combined COUNT (hub-safe: a 10M-buyer part reduces to
    # one count row per task, no list ever materializes), the 2..40
    # band filters BEFORE any collection, and the join back guarantees
    # every surviving group's collect_list holds <= 40 elements — so
    # no aggregation buffer anywhere can exceed the cap, for
    # arbitrarily hot keys. The old salt scheme built ~|edges| tiny
    # partial lists at sf0.1 (groups ~= rows: 500k collect_list +
    # array_sort calls across two aggregate levels, measured ~55% of
    # the query's executor time) to bound what this shape simply never
    # builds. min(d) is exact (d is constant per pk), keeping the
    # groupBy keyed on pk alone so the aggregation can reuse the
    # join's pk clustering instead of adding an exchange.
    # Both join branches descend from the identical buyers subtree, so
    # the distinct (ck, pk) exchange materializes ONCE at runtime and
    # the second branch reads it as ReusedExchange (probed on the
    # final adaptive plan: isFinalPlan=true, ReusedExchange present —
    # the INITIAL plan prints two subtrees, which is why the plan test
    # asserts on the post-execution plan).
    deg = (buyers.groupBy("pk").agg(F.count(F.lit(1)).alias("d"))
           .filter((F.col("d") >= 2) & (F.col("d") <= 40)))
    return (buyers.join(deg, "pk")
            .groupBy("pk")
            .agg(F.min("d").alias("d"),
                 F.array_sort(F.collect_list("ck")).alias("cks")))


def aa_pairs(arrays: DataFrame, *carry: str) -> DataFrame:
    """Map-side (ck_a < ck_b) pair expansion over the sorted ``cks``
    buyer arrays (shared by q_adamic_adar and q_jaccard_linkpred):
    posexplode picks ck_a, a second explode over the array's tail past
    it picks ck_b. Two chained codegen'd Generates — r13 replacement
    for the old single-explode over a flatten(transform(transform(..)))
    struct array, which built every row's full pair list through
    INTERPRETED lambda evaluation before the generator could stream it
    (measured ~25% of q_adamic_adar's wall at sf0.1). Same pairs in the
    same per-row order; ``carry`` columns ride along unchanged."""
    return (arrays
            .select(*carry, F.posexplode("cks").alias("i", "ck_a"), "cks")
            .select(*carry, "ck_a",
                    F.explode(F.slice("cks", F.col("i") + 2,
                                      F.size("cks"))).alias("ck_b")))


# ---------------------------------------------------------------------------
# Empirical-Bayes rate shrinkage
# ---------------------------------------------------------------------------

@query("q_rate_shrinkage", oracle="""
WITH uv AS (
  SELECT user_id,
         COALESCE(SUM(CASE WHEN event_type = 'view'  THEN 1 END), 0) AS views,
         COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS clicks
  FROM events
  WHERE event_type IN ('view', 'click')
  GROUP BY user_id
), g AS (
  SELECT SUM(clicks) * 1.0 / NULLIF(SUM(views), 0) AS p0 FROM uv
)
SELECT user_id, CAST(views AS BIGINT) AS views,
       CAST(clicks AS BIGINT) AS clicks,
       ROUND(clicks * 1.0 / views, 6) + 0.0 AS raw_rate,
       ROUND((clicks + 20.0 * p0) / (views + 20.0), 6) + 0.0 AS shrunk_rate
FROM uv CROSS JOIN g
WHERE views > 0
""")
def q_rate_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user click-through rate: each
    user's clicks/views is pulled toward the global rate with 20
    pseudo-views — (clicks + m*p0) / (views + m) — the standard fix for
    small-sample rates that would otherwise dominate any ranking (a
    1/1 user is not a 100% clicker). Same conditional-aggregation
    shape as q_color_index: ONE shuffle builds both counters, the
    global prior is a 1-row broadcast scalar, and every output is a
    division of exact integers plus one scalar — deterministic at any
    parallelism.
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("view", "click")))
    uv = (ev.groupBy("user_id")
          .agg(F.coalesce(F.sum(F.when(F.col("event_type") == "view", 1)),
                          F.lit(0)).alias("views"),
               F.coalesce(F.sum(F.when(F.col("event_type") == "click", 1)),
                          F.lit(0)).alias("clicks")))
    # NULLIF guard: an edge corpus with clicks but zero views must not
    # raise ANSI DIVIDE_BY_ZERO (the views > 0 filter below then empties
    # the output anyway, so p0=NULL is never observable on real rows).
    g = uv.agg((F.sum("clicks")
                / F.nullif(F.sum("views"), F.lit(0))).alias("p0"))
    return (uv.crossJoin(F.broadcast(g))
            .filter(F.col("views") > 0)
            .select("user_id", F.col("views").cast("long").alias("views"),
                    F.col("clicks").cast("long").alias("clicks"),
                    (F.round(F.col("clicks") / F.col("views"), 6) + 0.0)
                    .alias("raw_rate"),
                    (F.round((F.col("clicks") + 20.0 * F.col("p0"))
                             / (F.col("views") + 20.0), 6) + 0.0)
                    .alias("shrunk_rate")))


# ---------------------------------------------------------------------------
# Weight of evidence / information value
# ---------------------------------------------------------------------------

@query("q_woe_iv", oracle="""
WITH seg AS (
  SELECT c_mktsegment AS segment,
         COALESCE(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 END), 0) AS n_good,
         COALESCE(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                           THEN 1 END), 0) AS n_bad
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1
), tot AS (
  SELECT SUM(n_good) AS g_tot, SUM(n_bad) AS b_tot FROM seg
), terms AS (
  SELECT segment, n_good, n_bad,
         LN((n_good * 1.0 / g_tot) / (n_bad * 1.0 / b_tot)) AS woe,
         CAST(ROUND((n_good * 1.0 / g_tot - n_bad * 1.0 / b_tot)
                    * LN((n_good * 1.0 / g_tot) / (n_bad * 1.0 / b_tot))
                    * 1e9) AS BIGINT) AS iv_nano
  FROM seg CROSS JOIN tot
)
SELECT segment, CAST(n_good AS BIGINT) AS n_good,
       CAST(n_bad AS BIGINT) AS n_bad,
       ROUND(woe, 6) + 0.0 AS woe,
       ROUND(iv_nano / 1e9, 6) + 0.0 AS iv_term,
       ROUND(SUM(iv_nano) OVER () / 1e9, 6) + 0.0 AS iv_total
FROM terms
""")
def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of Evidence and Information Value of the market segment
    as a predictor of urgent orders — the credit-scoring feature-
    screening classic: WOE_i = ln((good_i/G)/(bad_i/B)) per category,
    IV = sum (good_i/G - bad_i/B) * WOE_i (IV > 0.02 means the feature
    carries signal). One join, one 5-group aggregation, a 1-row total;
    the IV total sums integer nano-units so the 5-term fold is
    order-free. At 100 TB the join shuffles on the customer key unless
    AQE broadcasts the dimension — same shape as the flagship.
    """
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    good = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    seg = (od.join(cu, cu.c_custkey == od.o_custkey)
           .groupBy(F.col("c_mktsegment").alias("segment"))
           .agg(F.coalesce(F.sum(F.when(good, 1)), F.lit(0)).alias("n_good"),
                F.coalesce(F.sum(F.when(~good, 1)), F.lit(0)).alias("n_bad")))
    tot = seg.agg(F.sum("n_good").alias("g_tot"), F.sum("n_bad").alias("b_tot"))
    pg = F.col("n_good") / F.col("g_tot")
    pb = F.col("n_bad") / F.col("b_tot")
    woe = F.log(pg / pb)
    terms = (seg.crossJoin(F.broadcast(tot))
             .withColumn("woe_raw", woe)
             .withColumn("iv_nano",
                         F.round((pg - pb) * F.col("woe_raw") * 1e9)
                         .cast("long")))
    wall = W.partitionBy().orderBy("segment").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing)
    return terms.select(
        "segment", F.col("n_good").cast("long").alias("n_good"),
        F.col("n_bad").cast("long").alias("n_bad"),
        (F.round("woe_raw", 6) + 0.0).alias("woe"),
        (F.round(F.col("iv_nano") / 1e9, 6) + 0.0).alias("iv_term"),
        (F.round(F.sum("iv_nano").over(wall) / 1e9, 6) + 0.0)
        .alias("iv_total"))


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick)
# ---------------------------------------------------------------------------

@query("q_feature_hashing", oracle=r"""
WITH toks AS (
  SELECT doc_id, UNNEST(list_filter(string_split_regex(lower(text), '\s+'),
                                    x -> x != '')) AS tok
  FROM documents
), hashed AS (
  SELECT tok,
         CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % 64 AS bucket,
         CASE WHEN CAST(('0x' || substr(md5(tok), 5, 1)) AS BIGINT) < 8
              THEN 1 ELSE -1 END AS sign,
         COUNT(*) AS tf
  FROM toks
  GROUP BY tok
)
SELECT bucket, CAST(SUM(sign * tf) AS BIGINT) AS feat_sum,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_terms
FROM hashed
GROUP BY bucket
""")
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): project an unbounded
    vocabulary into 64 fixed feature buckets with a signed hash (sign
    from an independent digest nibble, so collisions cancel in
    expectation instead of biasing upward). Output is the corpus-level
    hashed feature vector: per bucket, the signed term-frequency sum.

    This is how a 100 TB corpus gets a fixed-width feature matrix with
    no vocabulary build, no dictionary broadcast, and no OOV handling:
    the map side hashes tokens as they stream, the reduce side is a
    64-group integer aggregation — one shuffle of 64 rows per task.
    All-integer output: bit-stable under any partitioning. md5-derived
    bucket and sign are engine-portable (the q_fingerprint_md5 recipe).
    """
    d = load_table(spark, sf_dir, "documents", spread=True)
    toks = (d.select(F.explode(
        F.filter(F.split(F.lower("text"), _TOK), lambda x: x != ""))
        .alias("tok")))
    per_term = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    bucket = F.pmod(F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10)
                    .cast("long"), F.lit(64))
    sign = F.when(F.conv(F.substring(F.md5("tok"), 5, 1), 16, 10)
                  .cast("long") < 8, 1).otherwise(-1)
    return (per_term
            .select(bucket.alias("bucket"), sign.alias("sign"), "tf")
            .groupBy("bucket")
            .agg(F.sum(F.col("sign") * F.col("tf")).cast("long")
                 .alias("feat_sum"),
                 F.sum("tf").cast("long").alias("n_tokens"),
                 F.count(F.lit(1)).cast("long").alias("n_terms")))


# ---------------------------------------------------------------------------
# Mutual nearest neighbors (reciprocal-best-match linkage)
# ---------------------------------------------------------------------------

@query("q_mutual_nn", oracle="""
WITH a AS (
  SELECT vec_id, embedding FROM embeddings WHERE label < 5
), b AS (
  SELECT vec_id, embedding FROM embeddings WHERE label >= 5
), norms AS (
  SELECT vec_id, SUM(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, UNNEST(embedding) AS e FROM embeddings)
  GROUP BY vec_id
), dots AS (
  SELECT id_a, id_b, SUM(qe * ce) AS dot
  FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(UNNEST(a.embedding) AS DOUBLE) AS qe,
               CAST(UNNEST(b.embedding) AS DOUBLE) AS ce
        FROM a CROSS JOIN b)
  GROUP BY 1, 2
), scored AS (
  SELECT id_a, id_b,
         ROUND(dot / SQRT(na.nrm * nb.nrm), 9) AS cos9
  FROM dots
  JOIN norms na ON na.vec_id = id_a
  JOIN norms nb ON nb.vec_id = id_b
), best_ab AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b,
           ROW_NUMBER() OVER (PARTITION BY id_a
                              ORDER BY cos9 DESC, id_b) AS rn
    FROM scored) WHERE rn = 1
), best_ba AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b,
           ROW_NUMBER() OVER (PARTITION BY id_b
                              ORDER BY cos9 DESC, id_a) AS rn
    FROM scored) WHERE rn = 1
)
SELECT f.id_a, f.id_b, ROUND(s.cos9, 6) + 0.0 AS cosine
FROM best_ab f
JOIN best_ba r ON r.id_a = f.id_a AND r.id_b = f.id_b
JOIN scored s ON s.id_a = f.id_a AND s.id_b = f.id_b
""")
def q_mutual_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual nearest neighbors between two embedding sets (labels 0-4
    vs 5-9): keep pairs (a, b) where b is a's cosine-NN AND a is b's —
    the reciprocal-best-match criterion used for cross-corpus record
    linkage and translation-pair mining (a one-directional NN has no
    precision guarantee; mutuality is the standard filter).

    Both argmax directions come from ONE scored pair relation (computed
    once, the dot as a JVM zip_with/aggregate fold — no UDF), ranked by
    the 9-digit-rounded cosine with id tiebreaks so last-ulp fold-order
    differences can't flip a pick (registry contract). Scale: the
    cross-score here is the exactness baseline; the production path
    generates candidates with the LSH/IVF bucketers
    (operators/similarity.py) and applies the same mutual filter to
    bucket-local scored pairs.
    """
    e = load_table(spark, sf_dir, "embeddings", spread=True)
    norm = F.aggregate(F.col("embedding"), F.lit(0.0),
                       lambda acc, x: acc + x.cast("double") * x.cast("double"))
    wn = e.select("vec_id", "label", "embedding", norm.alias("nrm"))
    a = (wn.filter(F.col("label") < 5)
         .select(F.col("vec_id").alias("id_a"),
                 F.col("embedding").alias("va"), F.col("nrm").alias("na")))
    b = (wn.filter(F.col("label") >= 5)
         .select(F.col("vec_id").alias("id_b"),
                 F.col("embedding").alias("vb"), F.col("nrm").alias("nb")))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (a.join(F.broadcast(b))
              .select("id_a", "id_b",
                      F.round(dot / F.sqrt(F.col("na") * F.col("nb")), 9)
                      .alias("cos9")))
    w_ab = W.partitionBy("id_a").orderBy(F.desc("cos9"), F.asc("id_b"))
    w_ba = W.partitionBy("id_b").orderBy(F.desc("cos9"), F.asc("id_a"))
    both = (scored
            .withColumn("rn_ab", F.row_number().over(w_ab))
            .withColumn("rn_ba", F.row_number().over(w_ba)))
    return (both.filter((F.col("rn_ab") == 1) & (F.col("rn_ba") == 1))
            .select("id_a", "id_b",
                    (F.round("cos9", 6) + 0.0).alias("cosine")))


# ---------------------------------------------------------------------------
# Theil-Sen robust trend per user
# ---------------------------------------------------------------------------

@query("q_theilsen", oracle="""
WITH pe AS (
  SELECT user_id, epoch_us(ts) AS t, value AS v
  FROM events WHERE event_type = 'purchase'
), sized AS (
  SELECT user_id FROM pe GROUP BY user_id
  HAVING COUNT(*) BETWEEN 5 AND 50
), slopes AS (
  SELECT a.user_id,
         (b.v - a.v) / ((b.t - a.t) / 86400000000.0) AS slope
  FROM pe a
  JOIN pe b ON a.user_id = b.user_id AND b.t > a.t
  JOIN sized s ON s.user_id = a.user_id
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(MEDIAN(slope), 6) + 0.0 AS slope_per_day
FROM slopes
GROUP BY user_id
""")
def q_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend: per user, the MEDIAN of all pairwise
    slopes of purchase value over time — the estimator that tolerates
    ~29% outliers where the OLS fit (q_grouped_regression) is dragged
    by a single bad point. Slope unit: value per day.

    Scale guards: the pair join is keyed on the group (user), so the
    shuffle co-locates each user's points and the O(n^2) pair blowup is
    per-group; the 5..50 observation band caps it at ~1225 pairs/user —
    on a real workload the cap is a windowed-subsample of large groups,
    same contract as q_adamic_adar's hub cap. Strictly-increasing time
    pairs (b.t > a.t) avoid zero-gap division and count each pair once.
    Each slope is one exact division (microsecond integer gap — the
    q_sessionize recipe, never second-floored casts), and MEDIAN is an
    order statistic — deterministic under any partitioning.
    """
    pe = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_type") == "purchase")
          .select("user_id", F.unix_micros("ts").alias("t"),
                  F.col("value").alias("v")))
    sized = (pe.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_obs"))
             .filter(F.col("n_obs").between(5, 50))
             .select("user_id"))
    # Semi-join the size band BEFORE the pair join: a user with
    # thousands of purchases must be dropped before the O(n^2) pair
    # generation, not after (round-8 ADVICE item) — this is what makes
    # the documented ~1225 pairs/user cap a property of the PLAN.
    pe_sized = pe.join(sized, "user_id", "left_semi")
    a = pe_sized.select("user_id", F.col("t").alias("ta"),
                        F.col("v").alias("va"))
    b = pe_sized.select("user_id", F.col("t").alias("tb"),
                        F.col("v").alias("vb"))
    slopes = (a.join(b, ["user_id"]).filter(F.col("tb") > F.col("ta"))
              .select("user_id",
                      ((F.col("vb") - F.col("va"))
                       / ((F.col("tb") - F.col("ta")) / 86400000000.0))
                      .alias("slope")))
    return (slopes.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 (F.round(F.median("slope"), 6) + 0.0)
                 .alias("slope_per_day")))
