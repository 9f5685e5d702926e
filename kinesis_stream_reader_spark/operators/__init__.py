"""Operator package. Shared micro-helpers only — operators live in the
submodules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def tiny_df(spark, rows, schema: str) -> DataFrame:
    """Small driver-held relation as ONE partition (round 13, guide
    §1.2 fixed overhead): ``createDataFrame(list)`` parallelizes into
    defaultParallelism slices, and every downstream action pays one
    Python-worker round-trip per slice (32 on local[32]) for a
    few-hundred-row constant table — measured 0.65 s vs 0.43 s warm
    (3.2 s vs 0.4 s cold) for a 16-row parquet write. One slice is the
    right layout for a table that is always broadcast, collected, or
    written as one constants file; row order (list order) and values
    are identical to the multi-slice default.

    Empty input builds over the zero-partition emptyRDD so executing
    the relation schedules no Python tasks at all."""
    if not rows:
        return spark.createDataFrame(spark.sparkContext.emptyRDD(), schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
