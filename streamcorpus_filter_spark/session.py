"""SparkSession factory with scale-appropriate defaults.

Tuned for the sandbox (local[N], 32 cores) but every conf is the one we
would set on a 1000-executor cluster too: AQE on (coalesce + skew-join),
Arrow batches sized for large text rows, UTC session TZ so the DuckDB
oracle comparison is stable (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "streamcorpus-filter-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # local[N] -> N concurrent tasks; shuffle partitions ~ cores for local,
    # would be ~2-3x total cores on a real cluster (AQE coalesces down).
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # web-page rows are fat (html binary + text); keep Arrow batches
        # bounded so Python workers stay within memory at 100TB-scale row
        # sizes. 4096 (~8 MB of pages) A/B-beat 2048 by ~15% at local[32]
        # (fewer fence crossings per task) and was never worse at low N;
        # 8192 regressed (cache pressure in the whole-batch kernels).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
