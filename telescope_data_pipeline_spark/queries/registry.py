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
  column included) so top-k picks are unique.
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
#: order and (round 1) stopped after the first 50 entries, leaving 37
#: registered queries with no correctness evidence. This list front-loads
#: the window with (a) every oracle query that fell outside the round-1
#: window, (b) the four round-1 failures now fixed, (c) new round-2
#: oracle queries, then (d) a representative slice of the already-green
#: families. Everything else follows in registration order — oracle
#: queries before rows-only demos — so a larger window still checks the
#: strongest evidence first.
PRIORITY: tuple[str, ...] = (
    # (a) outside the round-1 window: relational / scalar / set-op /
    # sort / batch-streaming / window surface (SURVEY §2.2, §2.5-2.9)
    "q_project", "q_filter_range", "q_filter_threshold", "q_filter_eq",
    "q_case_when", "q_map_filter", "q_json_extract", "q_scan_csv",
    "q_subquery_scalar", "q_sql_api",
    "q_scalar_math", "q_scalar_round", "q_scalar_string", "q_scalar_date",
    "q_array_ops", "q_scalar_null",
    "q_union_all", "q_intersect", "q_except",
    "q_sort", "q_topk",
    "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
    "q_window_trim", "q_topk_per_group", "q_window_lag", "q_window_rolling",
    "q_window_rank", "q_window_firstlast", "q_window_range",
    # (b) round-1 failures, fixed in round 2
    "q_agg_mean", "q_agg_sigclip", "q_media_features", "q_scan_fits",
    # (c) new round-2 oracle queries
    "q_color_index", "q_sim_bucketed", "q_annulus_background",
    "q_join_asof", "q_doc_repetition", "q_scan_orc", "q_text_redact",
    "q_agg_salted", "q_join_salted", "q_events_funnel", "q_decontaminate",
    "q_merge_upsert", "q_gap_fill", "q_agg_percentile", "q_window_ntile",
    "q_partition_overwrite",
    # (d) near-duplicate variants demoted from (a) to fit the 50-entry
    # window (their families are already evidenced above), then
    # representatives of round-1-green families
    "q_scan_json", "q_scalar_string2", "q_scalar_date2", "q_posexplode",
    "q_union_distinct",
    "q_flagship", "q_join_nn", "q_agg_groupby", "q_dedup_exact",
    "q_dedup_apply", "q_sim_topk", "q_text_stats",
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
    ordered = sorted(enumerate(_REGISTRY.values()), key=_order_key)
    return {q.name: q for _, q in ordered}


def get(name: str) -> Query:
    return all_queries()[name]
