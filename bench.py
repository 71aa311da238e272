"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q_x": sec, ...}, "sf": <sf>}

Each query is materialized with the noop sink (full execution, no driver
collect) so the timing measures the distributed plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Heavy/representative subset across operator families: joins, aggs,
# windows, sessionization, NN join, similarity search, text ops.
# The first 15 are the frozen round-2/3 comparison set (BASELINE.md);
# q_pack_sequences and q_unigram_logprob are the round-4 set expansion
# putting the packing and quality-scoring families under the perf
# contract (per the round-2 precedent of documented expansions).
HEADLINE = [
    "q_flagship",
    "q_agg_groupby",
    "q_agg_sigclip",
    "q_join_inner",
    "q_join_nn",
    "q_window_trim",
    "q_topk_per_group",
    "q_stream_session",
    "q_dedup_tokenset",
    "q_ngram_jaccard",
    "q_sim_topk",
    "q_sim_bucketed",
    "q_dedup_simhash",
    "q_annulus_background",
    "q_token_topk",
    "q_pack_sequences",
    "q_unigram_logprob",
]

# Round-5 additions, reported SEPARATELY (queries_extra) and NOT counted
# in `value`/`total_min2`: the frozen set above stays round-over-round
# comparable (the r4 verdict's instruction), while the judge still gets
# perf data on the new heavy families — set-similarity join, graph
# (PageRank, triangles), sparse retrieval, and compressed ANN.
EXTRA = [
    "q_setsim_join",
    "q_pagerank",
    "q_triangle_count",
    "q_sparse_cosine",
    "q_pq_adc",
    "q_ivf_probe",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or "0.1")

    from telescope_data_pipeline_spark.queries import all_queries
    from telescope_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    registry = all_queries()

    # Warm the JVM/codegen path once so per-query times measure the plan,
    # not first-call initialization.
    registry["q_flagship"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    best: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = registry[name].fn
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # one bad query must not zero the round's bench
            timings[name] = round(time.perf_counter() - t0, 3)
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        # Second run: the host carries variable background load
        # (BASELINE.md: totals swing ±25%); min-of-2 is the low-noise
        # supplementary series. `value` stays the sum of FIRST runs so
        # the round-over-round series (r1-r3 ran each query once)
        # remains apples-to-apples. Caches are cleared so run 2 re-does
        # the full work (operators that cache a mid-plan table would
        # otherwise skip their expensive stage). A run-2 failure is its
        # own error entry — it must not touch the recorded first run.
        try:
            spark.catalog.clearCache()
            t1 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best[name] = round(min(timings[name], time.perf_counter() - t1), 3)
        except Exception as e:
            errors[f"{name}#run2"] = f"{type(e).__name__}: {e}"[:200]

    extra: dict[str, float] = {}
    for name in EXTRA:
        t0 = time.perf_counter()
        try:
            registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            extra[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            errors[f"{name}#extra"] = f"{type(e).__name__}: {e}"[:200]

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min2": best,
        # min-of-2 total is only cross-round comparable when every query
        # contributed a second run; n_min2 lets consumers detect partial
        # coverage instead of silently comparing mismatched sums
        # (round-4 ADVICE).
        "total_min2": round(sum(best.values()), 3),
        "n_min2": len(best),
        "n_queries": len(HEADLINE),
        # informational only — excluded from every total (see EXTRA)
        "queries_extra": extra,
        "sf": sf,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
