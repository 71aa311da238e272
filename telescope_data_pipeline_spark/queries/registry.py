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
#: order and stops after the first 50 entries. Round-10 rotation (the
#: registry's established scheme): the window serves
#: (a) re-verification of queries whose Spark code OR oracle SQL
#: changed this round (q_readability_ari long-cast, q_hard_negatives
#: broadcast-side flip, q_adamic_adar join-free rewrite — a changed
#: query's old green is stale evidence),
#: (b) fresh rows-only attestation for the r1/r2-era cohort (round-9
#: VERDICT item 3: last driver-checked eight refactor-rounds ago,
#: their operators — similarity.py, dedup.py, multimodal.py — have
#: been touched repeatedly since),
#: (c) first-time evidence for operators NEW in round 10 (names
#: appended as they land, each with its oracle), and
#: (d) rolling regression backfill with the oldest-green oracle
#: cohort, now the round-4 then round-5 sets (VERDICT r9 item 7).
#: The local sf0.01+sf0.1 oracle sweep still covers all 296 queries
#: per session.
PRIORITY: tuple[str, ...] = (
    # (a) changed in round 10
    "q_readability_ari", "q_hard_negatives", "q_adamic_adar",
    # (b) stale rows-only cohort, last attested r1/r2 (the ten names
    # from VERDICT r9 item 3; the remaining r1/r2 stragglers —
    # q_dedup_simhash, q_ensemble_lightcurve, q_media_features,
    # q_scan_fits — rotate next round so the r4 oracle backfill below
    # stays inside the 50-query window)
    "q_wcs_solve", "q_sim_ann", "q_sim_ivf", "q_dedup_near",
    "q_dedup_clusters", "q_fingerprint", "q_periodogram",
    "q_pipeline_detect", "q_pipeline_photometry", "q_media_frames",
    # (c) first-time evidence: operators new in round 10
    "q_spearman", "q_cramers_v", "q_mcc", "q_js_drift",
    "q_target_encode", "q_fleiss_kappa", "q_did", "q_bayes_ab",
    "q_keyword_tfidf", "q_assortativity", "q_info_gain", "q_sprt",
    "q_recall_at_k", "q_ece", "q_smd_balance", "q_trend_test",
    "q_session_entropy", "q_lorenz_points", "q_jaccard_drift",
    "q_forecast_accuracy", "q_novelty_rate", "q_ips_offpolicy",
    "q_hhi", "q_topk_overlap", "q_perplexity", "q_ttr_hapax",
    "q_outlier_iqr", "q_compress_ratio", "q_nelson_aalen",
    "q_krippendorff", "q_silhouette", "q_media_probe",
    "q_mann_kendall", "q_runs_test", "q_kruskal_wallis",
    "q_brown_forsythe",
    # (d1) oldest-green oracle backfill: last driver-checked in r4.
    # The 32 round-10 group-(c) entries fill most of the 50-cap, so
    # only the head of this cohort makes the window — first-time
    # evidence for new operators outranks re-attesting locally-green
    # r4 queries; the remainder rotates next round.
    "q_join_cross", "q_join_full", "q_join_left", "q_join_nn2d",
    "q_scalar_null", "q_scan_orc", "q_sql_api", "q_subquery_scalar",
    "q_window_firstlast", "q_window_ntile", "q_window_range",
    "q_window_rank",
    # (d2) next-oldest backfill: last driver-checked in r5 (the rest
    # of the r5 cohort rotates in next round; entries past the 50-cap
    # spill harmlessly out of the window)
    "q_agg_approx", "q_agg_percentile", "q_agg_salted",
    "q_annulus_background", "q_bm25", "q_cluster_components",
    "q_data_card", "q_decontaminate", "q_dedup_bloom",
    "q_dedup_canonical", "q_dedup_exact", "q_dedup_incremental",
    "q_dedup_minhash_md5", "q_dedup_simhash_md5", "q_dup_spans",
    "q_epoch_shuffle", "q_filter_eq", "q_fingerprint_md5",
    "q_flagship", "q_join_asof", "q_join_broadcast", "q_join_inner",
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
