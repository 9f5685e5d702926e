"""Partition-pruning proof: a type-partitioned layout must prune
non-matching partitions at planning time (PartitionFilters), the
file-layout twin of the bucketing test."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from kinesis_stream_reader_spark.sources.tables import load_events

PART_DIR = "/tmp/ksr_partitioned_events"


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
