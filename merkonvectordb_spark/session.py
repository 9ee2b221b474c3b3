"""SparkSession bootstrap tuned for both local testing and cluster scale.

Local runs are ``local[$SPARK_GRAFT_CPUS]`` (default all cores) — one JVM,
N executor threads.  The config below is chosen so the *same* logical plans
scale to a 1000-executor cluster: AQE re-plans shuffles at runtime
(coalescing small partitions, splitting skewed ones), shuffle partition
count is a hint not a hard-code, and Arrow is on for the few pandas_udf
paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "merkonvectordb_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism.  All settings are
    plan-shaping (AQE, broadcast threshold, Arrow) rather than
    local-mode-specific, so operator code written against this session
    behaves identically on a real cluster.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is parquet TIMESTAMP(NANOS): read as LONG nanos
        # (normalized to a micros TIMESTAMP in schema.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 32 MB broadcast threshold: dimension tables (region/nation/part/
        # supplier at any realistic SF) and query-vector sets broadcast,
        # fact-fact joins still shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # parquet scan parallelism: 128 MB splits is the cluster default;
        # keep it explicit so bench numbers are reproducible.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate silently ignores builder configs when a session already
    # exists in the JVM (e.g. the driver harness made one first).  The confs
    # below are runtime-settable and correctness-critical (timestamp
    # rendering must be UTC for oracle hash parity), so assert them here.
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("WARN")
    return spark
