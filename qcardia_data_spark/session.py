"""SparkSession factory with scale-ready defaults.

Configured for correctness parity with the DuckDB oracle (UTC session
timezone, exact percentiles available) and for 100 TB-scale execution
(AQE on, skew-join handling, partition coalescing, Arrow for pandas UDFs).
On a real cluster the same settings hold; only master/shuffle-partition
counts change (driver passes them via env).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for scale: every one of these is what you would set on a
#: 1000-executor cluster, not just local[32].
_SCALE_DEFAULTS = {
    # Adaptive execution: runtime re-planning, skew-join splitting, and
    # post-shuffle partition coalescing. Non-negotiable at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas UDFs / toPandas (the only sanctioned
    # Python<->JVM data path in this engine).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Oracle parity: DuckDB timestamps are naive; pin the session to UTC so
    # window/time_bucket arithmetic agrees bit-for-bit.
    "spark.sql.session.timeZone": "UTC",
    # Parquet: keep pushdown + vectorized reader explicit (defaults, pinned).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Partition sizing: 128 MiB scan splits is the right default for object
    # stores; AQE advisory target keeps post-shuffle partitions healthy.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
    # Broadcast threshold: dims (region/nation/customer at small SF, any
    # <64 MiB table) should broadcast rather than shuffle.
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
    # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos timestamp,
    # so read as long and convert explicitly in the catalog (micros, trunc).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "qcardia-data-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured — on a real cluster you simply do
    not pass ``master`` and spark-submit supplies it.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps all cores busy
        # without tiny-partition overhead. Clusters override via extra_conf.
        shuffle_partitions = max(cpus, 8)

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_SCALE_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
