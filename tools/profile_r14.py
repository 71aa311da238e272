"""Round-14 optimization profiler: time a subset of registered queries
(min-of-N noop-sink runs, cleared cache between runs) and dump plans to
plans/r14/. Usage:

  python tools/profile_r14.py q_flagship q_join_nn ...        # time
  python tools/profile_r14.py --explain before q_flagship     # initial plan
  python tools/profile_r14.py --explain-exec after q_flagship # EXECUTED plan
  python tools/profile_r14.py --headline                      # frozen 17

--explain-exec runs the query through the noop sink first and dumps the
post-execution adaptive plan (isFinalPlan=true), which is the only form
that can evidence ReusedExchange / AQE stage-dedup claims (r13 VERDICT
item 10: pre-execution dumps cannot show runtime reuse).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain_tag = None
    explain_exec = False
    if "--explain" in args:
        i = args.index("--explain")
        explain_tag = args[i + 1]
        del args[i:i + 2]
    if "--explain-exec" in args:
        i = args.index("--explain-exec")
        explain_tag = args[i + 1]
        explain_exec = True
        del args[i:i + 2]
    runs_n = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs_n = int(args[i + 1])
        del args[i:i + 2]
    if "--headline" in args:
        import bench
        args.remove("--headline")
        args = bench.HEADLINE + args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from telescope_data_pipeline_spark.queries import all_queries
    from telescope_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="profile_r14")
    registry = all_queries()
    # Warm codegen/JVM once (same protocol as bench.py).
    registry["q_flagship"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name in args:
        fn = registry[name].fn
        if explain_tag:
            df = fn(spark, sf_dir)
            pdir = Path(__file__).resolve().parent.parent / "plans" / "r14"
            pdir.mkdir(parents=True, exist_ok=True)
            if explain_exec:
                # collect() — NOT a noop write, which runs a DIFFERENT
                # QueryExecution (verify-skill lesson): only after an
                # action on THIS DataFrame does executedPlan() print
                # isFinalPlan=true with runtime joins, AQEShuffleReads
                # and ReusedExchange resolved.
                df.collect()
                txt = df._jdf.queryExecution().executedPlan().toString()
            else:
                mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
                    .fromString("formatted")
                txt = df._jdf.queryExecution().explainString(mode)
            (pdir / f"{name}_{explain_tag}.txt").write_text(txt)
            print(f"{name}: plan -> plans/r14/{name}_{explain_tag}.txt",
                  flush=True)
            continue
        runs = []
        cons = []
        for i in range(runs_n):
            if i:
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            runs.append(t2 - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(min(runs), 3)
        print(f"{name}: min={min(runs):.3f} construct={min(cons):.3f} "
              f"runs={[round(r,3) for r in runs]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
