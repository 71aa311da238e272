"""Stage-level attribution profiler for round-13 optimization work.

Runs a registered query once (noop sink) in a UI-enabled session and
prints every stage's wall duration, executor run time, task count, and
shuffle read/write bytes from the Spark UI REST API — the guide §1.1
empirical loop without a browser. Usage:

  python tools/stageprof.py q_dedup_embed_lsh [q_other ...]
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from telescope_data_pipeline_spark.queries import all_queries
    from telescope_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="stageprof",
                      extra_conf={"spark.ui.enabled": "true"})
    registry = all_queries()
    registry["q_flagship"].fn(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.loads(r.read())

    for name in sys.argv[1:]:
        spark.catalog.clearCache()
        seen = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(name)
        registry[name].fn(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        spark.sparkContext.setJobDescription(None)
        new = [s for s in stages() if s["stageId"] not in seen]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        total_run = sum(s.get("executorRunTime") or 0 for s in new)
        print(f"\n=== {name}: {len(new)} stages, "
              f"executorRunTime total {total_run} ms")
        for s in new[:14]:
            first = (s.get("firstTaskLaunchedTime") or "")[11:23]
            print(f"  run={s.get('executorRunTime', 0):>7}ms "
                  f"tasks={s.get('numCompleteTasks', 0):>3} "
                  f"in={s.get('inputBytes', 0):>11} "
                  f"sr={s.get('shuffleReadBytes', 0):>10} "
                  f"sw={s.get('shuffleWriteBytes', 0):>10} "
                  f"t0={first} {s.get('name', '')[:70]}")


if __name__ == "__main__":
    main()
