"""One-off scaling probe (r13 VERDICT item 7): time the 17 headline
queries + the top-10 extras at the 10x tiled probe corpus
(tools/make_probe_sf1.py), at $SPARK_GRAFT_CPUS cores, min-of-2
noop-sink runs, and append a `scaling_probe` record to BENCHLOG.jsonl.

At sf0.1 every headline 8-vs-32-core ratio is ~1 (fixed-cost bound);
this probe exists to show which queries become compute-bound once the
input is 10x, i.e. that the plans actually parallelize. Run it twice:

  SPARK_GRAFT_CPUS=32 python tools/scaling_probe.py
  SPARK_GRAFT_CPUS=8  python tools/scaling_probe.py

This is DIAGNOSTIC tooling, not bench.py: it never touches the bench
contract, reads only the /tmp probe corpus, and computes everything
from that corpus per run (no caching across runs).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PROBE_DIR = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/probe_sf1")
EXTRAS_TOP10 = [
    "q_spearman", "q_pagerank", "q_triangle_count", "q_dedup_embed_lsh",
    "q_jaccard_linkpred", "q_assoc_rules", "q_hits_step",
    "q_assortativity", "q_clustering_coeff", "q_kcore",
]


def main() -> None:
    import bench
    from telescope_data_pipeline_spark.queries import all_queries
    from telescope_data_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name=f"scaling_probe_c{cpus}")
    registry = all_queries()
    registry["q_flagship"].fn(spark, PROBE_DIR) \
        .write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name in bench.HEADLINE + EXTRAS_TOP10:
        runs = []
        for i in range(2):
            if i:
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.perf_counter()
            try:
                registry[name].fn(spark, PROBE_DIR) \
                    .write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            except Exception as e:
                out[f"{name}#err"] = str(e)[:120]
                break
        if runs:
            out[name] = round(min(runs), 3)
        print(name, out.get(name), flush=True)

    rec = {
        "metric": "scaling_probe", "unit": "sec", "cpus": int(cpus),
        "probe_dir": PROBE_DIR, "scale": "10x sf0.1 tiled",
        "queries_min2": out,
        "wall_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    line = json.dumps(rec)
    print(line)
    with open(Path(__file__).resolve().parent.parent / "BENCHLOG.jsonl",
              "a", encoding="utf-8") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
