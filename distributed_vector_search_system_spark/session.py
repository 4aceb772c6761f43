"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads),
but every conf here is chosen to also make sense on a 1000-executor
cluster: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), broadcast threshold generous enough for dimension tables
and query sets, Arrow enabled for the pandas-UDF hot paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "dvss-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    On a real cluster, drop ``master`` and let the cluster manager decide;
    ``spark.sql.shuffle.partitions`` should then be ~2-3x total cores (or
    left to AQE coalescing with a high initial value).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime partition coalescing + skew-join handling — the
        # Spark-native replacement for the reference's dynamic OpenMP
        # scheduling (shard_manager.cc:48 `schedule(dynamic)`).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas_udf / mapInPandas kernels (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Query sets / dimension tables are small: broadcast generously.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
