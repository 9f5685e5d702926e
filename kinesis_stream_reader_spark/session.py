"""SparkSession construction with scale-oriented defaults.

The engine is designed for a multi-executor cluster reading ~100 TB;
locally it runs ``local[$SPARK_GRAFT_CPUS]``. All tuning lives here so
tests, bench and the driver share one profile.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The driver's synthetic parquet writes TIMESTAMP(NANOS), which Spark
# rejects at schema inference unless this legacy conf is set. We read the
# nano-epoch longs and convert explicitly in sources.tables.
NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "kinesis_stream_reader_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    AQE is on (runtime coalescing + skew-join splitting), shuffle
    partitions sized to the local core count (a cluster deployment would
    size this to 2-3x total cores), Arrow enabled for the few pandas-UDF
    operators (KPL protobuf decode, multimodal stubs).
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config(NANOS_CONF, "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/ksr_warehouse")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_confs(spark: SparkSession) -> SparkSession:
    """Set runtime-settable confs the engine needs on a session we did not
    build (the correctness driver passes its own SparkSession)."""
    runtime_confs = (
        (NANOS_CONF, "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.shuffle.partitions", str(default_parallelism())),
    )
    for key, value in runtime_confs:
        try:
            spark.conf.set(key, value)
        except Exception:
            pass
    return spark
