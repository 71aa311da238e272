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
#: order and stops after the first 50 entries. Round-5 rotation
#: (executing the plan the round-4 window left behind): front-load
#: everything with NO driver evidence yet — the seven queries new this
#: round, the twelve oracle queries registered late in round 4, the two
#: deliberate round-4 sit-outs, and the four rows-only queries that
#: have never held a driver slot (one new this round) — then backfill 25 round-3-green
#: representatives (every operator family) for rolling regression
#: visibility. The 24 remaining r3-green queries (scalar/filter/scan
#: family plus four family-covered sit-outs, all re-verified by the
#: local sf0.01+sf0.1 sweep every session) rotate back in round 6.
#:
#: ROUND-6 ROTATION NOTE: backfill these r3-green sit-outs first:
#: q_case_when, q_cohort_retention, q_color_index, q_filter_range,
#: q_histogram, q_json_extract, q_partition_overwrite, q_phase_fold,
#: q_posexplode, q_project, q_scalar_bits, q_scalar_date2,
#: q_scalar_math, q_scalar_round, q_scalar_string2, q_scan_csv,
#: q_scan_json, q_sort, q_union_distinct, q_text_redact, q_doc_chunks,
#: q_zscore, q_topk_per_group, q_window_trim — plus the eight
#: retrieval.py queries registered after the r5 window was frozen
#: (q_inverted_index, q_sparse_cosine, q_sample_reservoir,
#: q_zorder_key, q_pagerank, q_mv_maintenance, q_char_entropy,
#: q_anomaly_mad, q_pq_adc, q_cdc_apply, q_triangle_count,
#: q_fuzzy_join, q_ohlc_bars, q_grouped_regression, q_setsim_join,
#: q_scd2_asof, q_chi_square, q_quantile_norm, q_bfs_levels,
#: q_negative_sample, q_random_projection, q_bigram_pmi,
#: q_profile_table, q_ivf_probe, q_unpivot, q_skyline,
#: q_join_nullsafe, q_oov_rate, q_ngram_repetition,
#: q_median_twopass) — then rotate r4-green representatives.
PRIORITY: tuple[str, ...] = (
    # (a) first-time evidence: new round-5 corpus operators
    "q_line_dedup", "q_quality_percentile", "q_mix_token_budget",
    "q_split_stratified", "q_dedup_canonical", "q_dedup_bloom",
    "q_kmeans_step",
    # (b) first-time evidence: round-4 registrations that missed the
    # r4 window (locally sweep-verified at sf0.01+0.1 since)
    "q_scd2", "q_fingerprint_md5", "q_dup_spans", "q_bm25",
    "q_dedup_incremental", "q_quality_gate", "q_dedup_minhash_md5",
    "q_epoch_shuffle", "q_length_batches", "q_weighted_sample",
    "q_dedup_simhash_md5", "q_data_card",
    # (c) the two round-4 sit-outs (newest green: r2)
    "q_union_all", "q_filter_eq",
    # (d) rows-only queries that have never run under the driver
    "q_agg_approx", "q_media_audio", "q_pack_greedy", "q_media_resize",
    # (e) r3-green backfill: one-plus representative per family —
    # flagship/aggs, joins, photometry, similarity/dedup, packing/
    # mixing, text ops, streaming-batch, windows
    "q_flagship", "q_agg_groupby", "q_agg_sigclip", "q_agg_mean",
    "q_agg_percentile", "q_agg_salted",
    "q_join_inner", "q_join_broadcast", "q_join_nn", "q_join_knn",
    "q_join_asof", "q_join_salted",
    "q_annulus_background", "q_sim_bucketed", "q_ngram_jaccard",
    "q_dedup_exact", "q_cluster_components",
    "q_pack_sequences", "q_mix_corpus", "q_split_assign",
    "q_unigram_logprob", "q_tfidf", "q_decontaminate",
    "q_stream_tumbling", "q_stream_session",
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
