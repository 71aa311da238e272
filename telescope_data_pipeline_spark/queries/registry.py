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
#: order and stops after the first 50 entries. Round-3 rotation: the 16
#: oracle queries with no green row across rounds 1-2 (2 round-2 hash
#: failures now fixed + 14 that never fit inside a window) come first,
#: then a representative spread of previously-green queries from every
#: family so regressions stay visible, then one rows-only §2.10 demo
#: (q_pipeline_residuals) to close its evidence gap — exactly 50.
#: Everything else follows in registration order — oracle queries before
#: rows-only demos — so a larger window still checks the strongest
#: evidence first.
PRIORITY: tuple[str, ...] = (
    # (a) never driver-verified: 2 round-2 parity fixes first, then the
    # 14 queries that sat at positions 51+ in rounds 1-2
    "q_scalar_math", "q_scalar_round",
    "q_tfidf", "q_cluster_components", "q_histogram", "q_cohort_retention",
    "q_zscore", "q_phase_fold", "q_join_knn", "q_partition_overwrite",
    "q_scan_json", "q_scalar_string2", "q_scalar_date2", "q_posexplode",
    "q_union_distinct", "q_scalar_bits",
    # (a2) new round-3 queries needing first-time evidence
    "q_split_assign", "q_pack_sequences", "q_doc_chunks",
    "q_unigram_logprob", "q_mix_corpus",
    # (b) previously-green representatives, one-or-more per family
    # (SURVEY §2.1-2.9 + LLM ops) — keeps regression visibility while
    # the demoted greens rotate back in future rounds (q_map_filter,
    # q_window_ntile, q_intersect rotated out this round to make room
    # for (a2); each is multiply covered by its family's remaining
    # representatives and has green rows from rounds 1-2)
    "q_project", "q_filter_range", "q_case_when",
    "q_json_extract", "q_scan_csv",
    "q_join_nn", "q_join_inner", "q_join_broadcast", "q_join_asof",
    "q_join_salted",
    "q_flagship", "q_agg_mean", "q_agg_sigclip", "q_agg_groupby",
    "q_agg_percentile", "q_agg_salted",
    "q_window_trim", "q_topk_per_group",
    "q_sort",
    "q_stream_tumbling", "q_stream_session",
    "q_dedup_exact", "q_ngram_jaccard", "q_sim_bucketed", "q_text_redact",
    "q_decontaminate",
    "q_annulus_background", "q_color_index",
    # (c) §2.10 residual-diagnostics demo, rows-only (VERDICT r2 item 4)
    "q_pipeline_residuals",
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
