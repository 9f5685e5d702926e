"""Bucketed-table co-location: prove that pre-bucketing both join sides
on the join key removes the shuffle entirely — the storage-layout lever
the 100 TB design relies on for repeated fact-to-fact joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_stream_reader_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    import shutil

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # the in-memory catalog forgets tables across sessions but the
        # warehouse dir persists; saveAsTable refuses orphaned locations
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    return spark.table("b_orders"), spark.table("b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    b_orders, b_lineitem = bucketed_tables
    joined = b_lineitem.join(b_orders, b_lineitem.l_orderkey == b_orders.o_orderkey)
    # disable broadcast so the join strategy decision is about shuffles,
    # then confirm zero Exchange operators: buckets line up
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    assert "Exchange hashpartitioning" not in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    b_orders, b_lineitem = bucketed_tables
    bucketed_count = (
        b_lineitem.join(b_orders, b_lineitem.l_orderkey == b_orders.o_orderkey)
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
        .collect()[0]
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    plain = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
        .collect()[0]
    )
    assert (bucketed_count.n, bucketed_count.s) == (plain.n, plain.s)
