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
#: order and stops after the first 50 entries. Round-8 rotation:
#: round 7 cleared the first-time-evidence backlog down to 4 (the
#: queries group (c) parked past round 7's window); they lead now, so
#: after this round EVERY registered query has appeared in a
#: CORRECTNESS file. Group (b) holds operators NEW in round 8 (names
#: appended as they land, each with its oracle). Group (c) backfills
#: the remaining ~25 slots with the oldest-oracle-green queries —
#: everything whose last driver check was round 3 (the r1/r2-only
#: stragglers are all rows-only checks, which re-verify nothing the
#: local sweep doesn't) — for rolling regression visibility. The local
#: sf0.01+sf0.1 oracle sweep still covers all 200+ queries per session.
PRIORITY: tuple[str, ...] = (
    # (a) first-time evidence: never in any CORRECTNESS file (r1-r7)
    "q_table_diff", "q_gini_concentration", "q_skipgram_counts",
    "q_pca_power_step",
    # (b) first-time evidence: operators new in round 8
    # (appended as they land)
    "q_psi_drift", "q_assoc_rules", "q_adamic_adar", "q_rate_shrinkage",
    "q_woe_iv", "q_feature_hashing", "q_mutual_nn", "q_theilsen",
    # (c) oldest-green regression backfill: last driver-checked in r3
    "q_scalar_math", "q_scalar_round", "q_scan_csv", "q_color_index",
    "q_partition_overwrite", "q_phase_fold", "q_histogram",
    "q_cohort_retention", "q_zscore", "q_text_redact", "q_doc_chunks",
    "q_project", "q_filter_range", "q_case_when", "q_json_extract",
    "q_scan_json", "q_scalar_string2", "q_scalar_date2", "q_posexplode",
    "q_scalar_bits", "q_union_distinct", "q_sort", "q_window_trim",
    "q_topk_per_group", "q_pipeline_residuals",
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
