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
#: order and stops after the first 50 entries. Round-13 rotation (the
#: registry's established scheme; group sizes sum to the 50-entry gate
#: EXACTLY): this round's window is the ATTESTATION-GAP ZEROING the
#: round-12 VERDICT item 1 mandates — "the 35 never-sampled first
#: ... the r5-stale drain with whatever remains. Add no more than a
#: handful of new queries this round." The window serves
#: (a) first-ever driver evidence for the 35 registered queries that
#: have never been driver-sampled (the r12 session-4 cohort: 34
#: oracle-backed + the rows-only q_media_exif) — 35 entries, the
#: exact ROUND-13 QUEUE promised in the r12 registry comment;
#: (b) stale-attestation drain in the spill's promised alphabetical
#: order — 15 entries (q_cluster_components .. q_join_asof), cutting
#: the r5-stale backlog from 39 to 24 (sum = 50 exactly).
#: DELIBERATE TRADE: per the r12 VERDICT, NO new-surface slots this
#: round — any query added in r13 joins the r14 queue instead. The
#: remaining 24 r5-stale entries (spill below, alphabetical) complete
#: the backlog in r14: a 24-slot drain + up to 26 slots for r13/r14
#: additions and cadence rotation zeroes all pre-r6 staleness.
#: ROUND-14 QUEUE (first-time driver evidence, group (c) head): the 5
#: r13 additions — q_kendall_tau, q_benjamini_hochberg,
#: q_krippendorff_alpha, q_conformal_interval, q_weibull_fit — all
#: tri-scale oracle-proven locally at registration time; they sit
#: past the 50-entry gate this round by construction (non-PRIORITY
#: oracle-backed entries order after the PRIORITY block).
#: The local tri-scale (sf0.001/0.01/0.1) oracle sweep still covers
#: all registered queries per session.
PRIORITY: tuple[str, ...] = (
    # (a) never driver-sampled (r12 session-4 cohort) — 35
    "q_hellinger_drift", "q_overdispersion", "q_hosmer_lemeshow",
    "q_hurst_exponent", "q_cronbach_alpha", "q_hits_step",
    "q_powerlaw_alpha", "q_jaccard_linkpred", "q_map_eval",
    "q_rbo_overlap", "q_energy_distance", "q_embedding_drift",
    "q_ab_srm", "q_theils_u2", "q_sax_symbols", "q_mix_temperature",
    "q_newey_west", "q_gumbel_fit", "q_shapley_attribution",
    "q_ratio_delta", "q_holt_winters", "q_cohort_ltv", "q_rmst",
    "q_bland_altman", "q_rmst_arms", "q_min_cost_supplier",
    "q_priority_pipeline", "q_order_count_dist", "q_important_stock",
    "q_large_volume_cust", "q_sales_opportunity", "q_top_supplier",
    "q_supplier_variety", "q_volume_shipping", "q_media_exif",
    # (b) r5-stale drain, promised alphabetical order — 15
    # (sum = 50 exactly)
    "q_cluster_components", "q_data_card", "q_decontaminate",
    "q_dedup_bloom", "q_dedup_canonical", "q_dedup_exact",
    "q_dedup_incremental", "q_dedup_minhash_md5", "q_dedup_simhash_md5",
    "q_dup_spans", "q_epoch_shuffle", "q_filter_eq",
    "q_fingerprint_md5", "q_flagship", "q_join_asof",
    # spill (past the 50-entry gate; the r14 drain, alphabetical) — 24
    "q_join_broadcast",
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
