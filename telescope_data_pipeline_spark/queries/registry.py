"""Query registry: name -> (Spark callable, DuckDB oracle SQL).

Contract (driver, see /root/repo/__spark_entry__.py):
- the callable takes ``(spark, sf_dir)`` and returns a DataFrame;
- the oracle SQL must be ANSI SQL DuckDB can run over the same parquet
  tables, producing the SAME column names (the comparison sorts columns
  by name, then hashes order-insensitive values);
- queries whose semantics are not SQL-expressible (streaming state,
  iterative kernels, external services) register ``oracle=None`` and get
  a rows-only check.

Determinism rules every query here follows:
- every float output column is explicitly ROUNDed (same digits both
  sides) so partial-aggregation order cannot flip a hash bit;
- every LIMIT / row_number sits on a total order (unique tiebreaker
  column included) so top-k picks are unique;
- every rounded float column whose value can reach zero from below is
  normalized with ``+ 0.0`` on BOTH sides: Spark's round() never emits
  IEEE -0.0 but DuckDB's ROUND preserves it, and the driver hashes
  bit-level (round-2 q_scalar_math failure);
- integer-returning functions must agree in output type with DuckDB's
  signature: Spark CEIL/FLOOR return BIGINT where DuckDB returns
  DOUBLE — CAST the oracle side (round-2 q_scalar_round failure).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    doc: str


_REGISTRY: dict[str, Query] = {}

#: The driver's correctness gate checks queries in ``queries()`` dict
#: order and stops after the first 50 entries. Round-12 rotation (the
#: registry's established scheme; group sizes sum to the 50-entry gate
#: EXACTLY): this round's window is the STALE-ATTESTATION DRAIN the
#: round-11 VERDICT item 1 asks for — 51 oracle-green queries were
#: last driver-checked at r5 or earlier; with only a small (c) batch
#: this round, 34 of them get fresh driver evidence now and the
#: remaining 17 rotate in r13. The window serves
#: (a) re-verification of queries whose Spark code OR oracle SQL
#: changed this round (q_gwet_ac1 pre-mod hash guard, round-11 ADVICE
#: item 3 — same output values, changed expression) — 1 entry;
#: (b) fresh rows-only attestation for the 11 media/ANN queries so
#: they never age past ~3 rounds (round-11 VERDICT item 5) — 11
#: entries;
#: (c) first-time evidence for operators NEW in round 12 — 26 entries
#: (4 from the first session + 6 monitoring/governance queries + the
#: Hilbert layout key, Matryoshka truncation eval, isotonic
#: calibration, trending terms, Simpson diversity, Cochran-Armitage
#: trend, Mantel-Haenszel pooled OR, the WARC crawl source, the HTML
#: WET extraction, and the 6 session-3 diagnostics/release-gate
#: queries: Ljung-Box, Granger, t-closeness, KDE curve, kNN outlier,
#: Atkinson — plus the archive ZIP/TAR source);
#: (d) stale-attestation drain in the spill's promised order (the
#: 8 round-4 leftovers, then the round-5 cohort alphabetically) — 12
#: entries (the drain slots the new cohorts displaced move to the
#: spill HEAD, keeping the promised alphabetical order for r13).
#: DELIBERATE TRADE: first-time evidence for the 26 new r12 operators
#: outranks re-attesting queries the local tri-scale sweep re-proves
#: every session; the remaining ~39 stale entries fit in the r13
#: window (a small r13 (c) cohort leaves 35+ drain slots), completing
#: the backlog over r13-r14.
#: The local tri-scale (sf0.001/0.01/0.1) oracle sweep still covers
#: all registered queries per session.
#: ROUND-13 QUEUE: the 35 session-4 queries
#: (q_hellinger_drift, q_overdispersion, q_hosmer_lemeshow,
#: q_hurst_exponent, q_cronbach_alpha, q_hits_step, q_powerlaw_alpha,
#: q_jaccard_linkpred, q_map_eval, q_rbo_overlap,
#: q_energy_distance, q_embedding_drift) and the 6 classic
#: relational shapes (q_min_cost_supplier, q_priority_pipeline,
#: q_order_count_dist, q_important_stock, q_large_volume_cust,
#: q_sales_opportunity) and q_ab_srm, q_theils_u2, q_sax_symbols,
#: q_mix_temperature, plus the rows-only q_media_exif (joins the
#: media cadence rotation) and q_top_supplier,
#: q_supplier_variety, q_newey_west, q_gumbel_fit,
#: q_volume_shipping, q_shapley_attribution, q_ratio_delta,
#: q_holt_winters, q_cohort_ltv, q_rmst, q_bland_altman,
#: q_rmst_arms are NOT in this
#: round's window (it was already balanced at exactly 50 with the
#: drain slots the round-11 VERDICT item 1 asked for); they are all
#: tri-scale oracle-proven locally and belong at the HEAD of r13's
#: group (c), before the r13 drain tail below.
PRIORITY: tuple[str, ...] = (
    # (a) changed in round 12 — 1
    "q_gwet_ac1",
    # (b) rows-only media/ANN cadence rotation (VERDICT r11 item 5) — 11
    "q_ensemble_lightcurve", "q_dedup_simhash", "q_media_features",
    "q_scan_fits", "q_agg_approx", "q_media_audio", "q_media_resize",
    "q_quantile_sketch", "q_media_phash", "q_dedup_embed_lsh",
    "q_pipeline_residuals",
    # (c) first-time evidence: operators new in round 12 — 26
    # (19 from sessions 1-2 + the 6 session-3 diagnostics/release-gate
    # queries + the archive source, which displace the last 7 drain
    # slots to the spill HEAD — the same documented trade as the
    # session-2 cohort)
    "q_media_webp_lossy", "q_gini_by_group", "q_parquet_profile",
    "q_vocab_growth", "q_emd_drift", "q_chao1", "q_theil_index",
    "q_ldiversity", "q_mood_median", "q_ccf_lags", "q_hilbert_key",
    "q_matryoshka_recall", "q_isotonic_calibration", "q_trending_terms",
    "q_simpson_diversity", "q_cochran_armitage", "q_mantel_haenszel",
    "q_scan_warc", "q_html_extract",
    "q_ljung_box", "q_granger", "q_tcloseness", "q_kde_curve",
    "q_knn_outlier", "q_atkinson", "q_scan_archive",
    # (d) stale-attestation drain — 12 (sum = 50 exactly)
    "q_scalar_null", "q_scan_orc", "q_sql_api", "q_subquery_scalar",
    "q_window_firstlast", "q_window_ntile", "q_window_range",
    "q_window_rank",
    "q_agg_percentile", "q_agg_salted", "q_annulus_background",
    "q_bm25",
    # spill (past the 50-entry gate; the r13 drain tail, alphabetical)
    "q_cluster_components", "q_data_card", "q_decontaminate",
    "q_dedup_bloom", "q_dedup_canonical", "q_dedup_exact",
    "q_dedup_incremental",
    "q_dedup_minhash_md5", "q_dedup_simhash_md5",
    "q_dup_spans", "q_epoch_shuffle",
    "q_filter_eq", "q_fingerprint_md5", "q_flagship",
    "q_join_asof", "q_join_broadcast",
    "q_join_inner", "q_join_knn", "q_join_nn", "q_join_salted",
    "q_kmeans_step", "q_length_batches",
    "q_line_dedup", "q_mix_corpus", "q_mix_token_budget",
    "q_ngram_jaccard", "q_pack_sequences", "q_quality_gate",
    "q_quality_percentile", "q_scd2", "q_sim_bucketed",
    "q_split_assign", "q_split_stratified", "q_stream_session",
    "q_stream_tumbling", "q_tfidf", "q_unigram_logprob", "q_union_all",
    "q_weighted_sample",
)


def _order_key(item: tuple[int, Query]) -> tuple[int, int, int]:
    reg_index, q = item
    try:
        return (0, PRIORITY.index(q.name), 0)
    except ValueError:
        return (1, 0 if q.oracle is not None else 1, reg_index)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query. Use as ``@query("q_x", oracle="SELECT ...")``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle,
                                doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    from . import load_all

    load_all()
    unknown = [n for n in PRIORITY if n not in _REGISTRY]
    if unknown:  # a typo here would silently drop a query from the gate
        raise ValueError(f"PRIORITY names not in registry: {unknown}")
    ordered = sorted(enumerate(_REGISTRY.values()), key=_order_key)
    return {q.name: q for _, q in ordered}


def get(name: str) -> Query:
    return all_queries()[name]
