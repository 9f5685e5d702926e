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


def test_bucketed_order_revenue_join_is_exchange_free(spark, sf_dir):
    """The queries() entry's join must plan with no Exchange on either
    side (bucket co-location), and its totals must match a plain join."""
    from kinesis_stream_reader_spark.operators.relational import (
        bucketed_order_revenue,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    out = bucketed_order_revenue(orders, lineitem)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the rollup's own exchange (on o_orderpriority) is expected; the
    # join keys must NOT be shuffled — buckets already align
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    got = {r.o_orderpriority: (r.n_lines, r.revenue) for r in out.collect()}
    expect = {
        r.o_orderpriority: (r.n_lines, r.revenue)
        for r in lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
        .collect()
    }
    assert got == expect
