"""SparkSession construction for the engine.

One place to set every scale-relevant knob. Local mode is the test bed;
the same builder (minus local master) is what a 1000-executor cluster
deployment would use — AQE, Arrow, and UTC semantics are identical.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Shuffle partitions: match local cores while testing. On a real cluster
#: this is overridden (or left to AQE coalescing) — AQE is enabled so the
#: initial number only caps parallelism, it does not fix it.
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "telescope_data_pipeline_spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or get) the SparkSession with the engine's standard config.

    Settings and why they matter at 100 TB:

    - AQE on (+ coalesce + skew join): runtime re-planning fixes the two
      failure modes a static plan has at scale — thousands of tiny
      post-shuffle partitions, and skewed join keys.
    - Arrow on: every pandas UDF crosses JVM<->Python in columnar batches
      instead of pickled rows.
    - UTC session timezone: timestamp semantics must not depend on the
      executor host's locale.
    - autoBroadcastJoinThreshold raised to 64 MB: dimension tables
      (region/nation/ephemeris) should never shuffle.
    - maxPartitionBytes 128 MB: parquet scan split size — keeps scan tasks
      uniform regardless of input file layout.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesce floor (r13, guide §2.5): with parallelismFirst
        # (default true) the coalesce target is max(bytes/parallelism,
        # minPartitionSize). The 1 MB default floor collapses any
        # sub-1MB shuffle to ONE partition — fatal for joins whose
        # OUTPUT expands far beyond their input bytes (q_semdedup's
        # cluster self-join: 569 KB in, 2.2M pairs out, measured 5.2 s
        # on a single task; 64 KB floor → 32 tasks, query 4.5 s → 1.7 s).
        # At cluster scale bytes/parallelism >> 1 MB, so the floor only
        # ever binds on compute-dense small shuffles — exactly where it
        # must not serialize. Env-tunable for deployments that prefer
        # the stock floor.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64KB"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # Driver parquet uses pandas-style timestamps: ns-unit (events.ts)
        # and ms-unit (orders.o_orderdate). Read ns as long (converted to
        # micros in sources.load_table — every value is a whole µs) and
        # keep ltz TimestampType everywhere so UTC arithmetic matches the
        # DuckDB oracle's naive-timestamp semantics.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stock_coalesce_floor(spark: SparkSession) -> SparkSession:
    """A child session (shared SparkContext, isolated SQLConf) running
    Spark's STOCK 1 MB AQE coalesce floor instead of the engine's 64 KB
    default.

    The 64 KB floor exists for output-expanding joins (see get_spark):
    a sub-MB shuffle that fans out into millions of pair rows must not
    collapse to one task. Its cost is the flip side: a many-stage query
    over mid-size (1-10 MB) shuffles gets 32 tasks per stage where 5
    would do, and pays task-scheduling overhead once per stage — the
    r13/r14 interleaved A/B measured q_spearman 4.4 s under the 64 KB
    floor vs 2.5-3.2 s at stock (same session, same host), while the
    expansion-join wins (q_semdedup 1.7 s, q_adamic_adar) stay intact
    on the parent. Queries whose plans are long chains of bounded
    aggregates/windows — and never expansion joins — opt into the stock
    floor HERE, scoped to their own plan, instead of flipping the
    session default that the expansion family depends on.

    At cluster scale bytes/parallelism >> 1 MB so neither floor ever
    binds — this is a local/small-shuffle trade only, which is why it
    is safe to decide per query shape. ``newSession()`` inherits every
    builder conf (verified: shuffle.partitions, broadcast threshold,
    timezone, Arrow, nanosAsLong all carry over); only the floor is
    overridden. The child shares the parent's SparkContext, catalog and
    cache manager, so CacheSlot pins and ``clearCache`` behave
    identically.
    """
    child = getattr(spark, "_tdp_stock_floor_session", None)
    if child is None:
        child = spark.newSession()
        child.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_STOCK_FLOOR", "1MB"))
        spark._tdp_stock_floor_session = child
    return child
