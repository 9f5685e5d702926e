"""Batch sources over the driver's parquet fixtures.

The reference's only source is a Kinesis stream scan
(kinesisReader/index.js:11-48); for batch/correctness work the engine
reads the driver's parquet tables instead — the same "swap the source,
keep the pipeline" seam the reference's own tests use
(app/server/test/index.js:12-18). The production streaming source lives
in sources/kinesis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_timestamps(df: DataFrame, name: str = "events") -> DataFrame:
    """Give every operator plain `timestamp` (LTZ) columns regardless of
    how the fixture writer annotated them.

    Two fixture generations exist: TIMESTAMP(NANOS) files that Spark only
    reads as nano-epoch longs (legacy conf, `ts` only), and
    TIMESTAMP(MICROS, isAdjustedToUTC=false) files that Spark reads as
    TIMESTAMP_NTZ. The session timezone is pinned to UTC (session.py), so
    the NTZ->LTZ cast is wall-clock-preserving and DuckDB oracles (which
    see naive microsecond timestamps either way) agree.
    """
    for col, dtype in df.dtypes:
        if name == "events" and col == "ts" and dtype == "bigint":
            # nanos -> microsecond timestamp. Integer `div`, not `/`:
            # nano-epoch values exceed 2^53 and would lose precision
            # through a double.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    Plain ``spark.read.parquet`` so Catalyst gets predicate pushdown,
    column pruning and row-group min/max skipping on everything
    downstream (the timestamp cast is a projection; scan-level pruning
    and row-group skipping on the underlying column still apply).
    """
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return normalize_timestamps(df, name)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")
