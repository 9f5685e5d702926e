"""SparkSession construction with scale-oriented defaults.

The engine is designed for a multi-executor cluster reading ~100 TB;
locally it runs ``local[$SPARK_GRAFT_CPUS]``. All tuning lives here so
tests, bench and the driver share one profile.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession
from .scratch import scratch

# The driver's synthetic parquet writes TIMESTAMP(NANOS), which Spark
# rejects at schema inference unless this legacy conf is set. We read the
# nano-epoch longs and convert explicitly in sources.tables.
NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _ensure_protobuf() -> bool:
    """Best-effort `google.protobuf` for transformWithStateInPandas.

    The TWS Python worker speaks a protobuf state-server protocol
    (pyspark.sql.streaming.proto), but this container ships no protobuf
    wheel and installs are disallowed. The google-cloud-sdk on the image
    bundles a modern pure-Python protobuf (6.32) under its appengine
    platform dir; putting that on sys.path AND PYTHONPATH (so local-mode
    Python workers, which inherit the JVM's env, resolve it too) makes
    the whole TWS path executable. The one-minor-version gencode gap
    (pyspark's pb2 files are 6.33) is waived with protobuf's own
    documented escape hatch. Everything is gated: absent the SDK dir
    this is a no-op and TWS tests skip as before.

    Must run BEFORE the JVM starts for the env to reach workers — hence
    module import time, not first use."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    gae = "/usr/lib/google-cloud-sdk/platform/google_appengine"
    if not os.path.isdir(os.path.join(gae, "google", "protobuf")):
        return False
    if gae not in sys.path:
        sys.path.append(gae)
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if gae not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join(p for p in [gae, *parts] if p)
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


HAVE_PROTOBUF = _ensure_protobuf()

# Large numpy buffers (GEMM outputs, argpartition scratch in the kNN /
# media kernels) default to mmap'd allocations that glibc returns to the
# OS on free — on this sandbox's VM, re-faulting those pages costs
# ~45 MB/s (measured: a 200 MB astype = 9 s cold, 0.06 s warm). Raising
# the mmap/trim thresholds keeps big allocations on the reusable heap,
# so a long-lived Python worker pays the fault cost once, not per task.
# Must be in the environment BEFORE the JVM forks workers.
for _var in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
    os.environ.setdefault(_var, "1073741824")

# transformWithStateInPandas needs a state store with multiple column
# families — only RocksDB (bundled with Spark 4) supports that; the
# HDFS-backed default rejects it at task start.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


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
        .config("spark.sql.warehouse.dir", scratch("ksr_warehouse"))
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
