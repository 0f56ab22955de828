"""SparkSession factory tuned for the KG-construction workload.

Defaults mirror what we would ship to a 1000-executor cluster via
``spark-submit --py-files``: AQE on (runtime re-plan + skew-join
splitting), Arrow on (every Python touchpoint is a vectorized pandas
UDF), shuffle partitions sized to the parallelism level.  In the
sandbox we run ``local[N]`` and treat N as the executor count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "graphgen_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-oriented defaults.

    AQE coalesces small shuffle partitions and splits skewed ones at
    runtime, so ``shuffle_partitions`` is an upper bound, not a tuning
    knob we must get exactly right per stage.
    """
    cpus = DEFAULT_CPUS
    if master is None:
        master = f"local[{cpus}]"
    elif master.startswith("local[") and master != "local[*]":
        cpus = int(master[len("local[") : -1])
    if shuffle_partitions is None:
        # 2x the core count: enough granularity for AQE to rebalance
        # without drowning tiny stages in task overhead.
        shuffle_partitions = max(cpus * 2, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
