"""Partition-pruning proof: a type-partitioned layout must prune
non-matching partitions at planning time (PartitionFilters), the
file-layout twin of the bucketing test."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from kinesis_stream_reader_spark.scratch import scratch
from kinesis_stream_reader_spark.sources.tables import load_events

PART_DIR = scratch("ksr_partitioned_events")


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir):
    shutil.rmtree(PART_DIR, ignore_errors=True)
    load_events(spark, sf_dir).write.partitionBy("event_type").parquet(PART_DIR)
    return spark.read.parquet(PART_DIR)


def test_partition_filter_prunes_directories(spark, partitioned_events):
    import contextlib
    import io

    df = partitioned_events.filter(F.col("event_type") == "click").select("event_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].splitlines()[0]


def test_partitioned_read_matches_plain_filter(spark, sf_dir, partitioned_events):
    pruned = partitioned_events.filter(F.col("event_type") == "click").count()
    plain = load_events(spark, sf_dir).filter(F.col("event_type") == "click").count()
    assert pruned == plain


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling: a pathologically skewed key (97% of one
    side) must be detected and split at runtime — the executed plan
    marks the SortMergeJoin with isSkew=true partitions."""
    from pyspark.sql import functions as F

    big = spark.range(0, 400_000).select(
        F.when(F.col("id") % 100 < 97, F.lit(7)).otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    other = spark.range(0, 400_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("p2")
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # enough partitions that the median stays tiny next to the hot one,
    # and disable coalescing so skew detection sees raw partition sizes
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    # the join feeds a single-partition agg exchange, which makes the
    # default skew rule decline (it refuses to risk an extra shuffle);
    # force documents that the runtime split is available and correct
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try:
        joined = big.join(other, "k").agg(F.count("*").alias("n"))
        n = joined.collect()[0].n
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    # correctness: each big row matches other rows sharing its key
    assert n == 160_000_000
    assert "skew=true" in plan, plan[:2000]


def test_dynamic_partition_pruning_in_plan(spark, sf_dir):
    """The DPP query's fact scan must carry a dynamicpruning partition
    filter injected from the dimension side."""
    from kinesis_stream_reader_spark.registry import QUERIES

    df = QUERIES["join_dynamic_partition_pruning"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    rows = {r.event_type: r.n for r in df.collect()}
    assert set(rows) == {"click", "purchase"}
