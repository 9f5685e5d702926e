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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    Plain ``spark.read.parquet`` so Catalyst gets predicate pushdown,
    column pruning and row-group min/max skipping on everything
    downstream. ``events`` is special-cased: its ``ts`` column is
    TIMESTAMP(NANOS) in the file, which Spark only reads as a nano-epoch
    long (legacy conf) — convert to a real timestamp here so every
    operator sees `event_time: timestamp`.
    """
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos -> microsecond timestamp (DuckDB reads the same file at
        # microsecond precision, so oracles agree).
        # integer `div`, not `/`: nano-epoch values exceed 2^53 and would
        # lose precision through a double.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")
