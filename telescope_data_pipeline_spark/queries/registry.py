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
#: order and stops after the first 50 entries. Round-4 rotation: the
#: goal is rolling two-round coverage — every oracle query green in
#: r3 ∪ r4. Round 3's window verified 49 queries (all green); this
#: window carries the 51 queries whose newest driver-green row is r1/r2
#: plus the one new round-4 query (q_mix_corpus_hash) = 52 candidates
#: for 50 slots. Two r2-green, trivial, family-covered queries sit out
#: (q_union_all — setops covered by q_intersect/q_except in-window;
#: q_filter_eq — filters covered by q_filter_threshold/q_map_filter);
#: both also pass the local sf0.01+sf0.1 sweep this round. Order:
#: never-verified first, then oldest evidence (r1 greens), then r2.
#: Everything else follows in registration order — oracle queries
#: before rows-only demos — so a larger window still checks the
#: strongest evidence first.
#:
#: ROUND-5 ROTATION NOTE: twelve oracle queries registered late in
#: round 4 have no driver-green row yet (locally sweep-verified at
#: sf0.01+0.1): q_scd2, q_fingerprint_md5, q_dup_spans, q_bm25,
#: q_dedup_incremental, q_quality_gate, q_dedup_minhash_md5,
#: q_epoch_shuffle, q_length_batches, q_weighted_sample,
#: q_dedup_simhash_md5, q_data_card —
#: front-load them next round, plus the two round-4 sit-outs
#: (q_union_all, q_filter_eq), then backfill r3-green representatives
#: for regression visibility.
PRIORITY: tuple[str, ...] = (
    # (a) first-time evidence: new round-4 scale-safe corpus mixer
    "q_mix_corpus_hash",
    # (b) last green in r1 — aggregates, joins, LLM text ops
    "q_agg_count", "q_agg_median", "q_agg_distinct", "q_agg_rollup",
    "q_agg_cube", "q_diag_stats", "q_pivot", "q_agg_stats2",
    "q_agg_collect", "q_grouping_sets",
    "q_join_left", "q_join_semi", "q_join_anti", "q_join_range",
    "q_join_full", "q_join_cross", "q_join_nn2d",
    "q_dedup_tokenset", "q_sim_topk", "q_text_stats", "q_doc_quality",
    "q_lang_id", "q_token_topk", "q_dedup_embed", "q_dedup_apply",
    "q_token_bpe",
    # (c) last green in r2 — analysis, relational, scalars, setops,
    # windows, streaming-batch
    "q_events_funnel", "q_merge_upsert", "q_gap_fill", "q_window_ntile",
    "q_doc_repetition",
    "q_filter_threshold", "q_map_filter", "q_subquery_scalar",
    "q_sql_api", "q_scan_orc",
    "q_scalar_string", "q_scalar_date", "q_array_ops", "q_scalar_null",
    "q_intersect", "q_except", "q_topk", "q_stream_sliding",
    "q_window_lag", "q_window_rolling", "q_window_rank",
    "q_window_firstlast", "q_window_range",
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
