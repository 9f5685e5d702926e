"""Relational operator unit tests: salted aggregation equivalence and
sketch-estimate tolerance."""

from __future__ import annotations

from kinesis_stream_reader_spark.operators import relational
from kinesis_stream_reader_spark.sources.tables import load_events, load_table


def test_salted_agg_equals_direct(spark, sf_dir):
    events = load_events(spark, sf_dir)
    direct = {
        (r.user_id, r.event_type): (r.n_events, r.sum_value)
        for r in relational.agg_count_by_key(events).collect()
    }
    salted = {
        (r.user_id, r.event_type): (r.n_events, r.sum_value)
        for r in relational.agg_count_by_key_salted(events).collect()
    }
    assert salted == direct


def test_approx_distinct_within_tolerance(spark, sf_dir):
    events = load_events(spark, sf_dir)
    exact = {
        r.event_type: r.n_users
        for r in relational.distinct_users_per_type(events).collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in relational.approx_distinct_users(events, rsd=0.02).collect()
    }
    for etype, n in exact.items():
        assert abs(approx[etype] - n) <= max(3, 0.1 * n)


def test_asof_join_respects_time_bound(spark, sf_dir):
    events = load_events(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    out = relational.join_asof_latest_order(events, orders)
    # joined back against orders: every matched order is at or before
    # the event time and belongs to the event's user
    from pyspark.sql import functions as F

    joined = (
        out.filter(F.col("asof_orderkey").isNotNull())
        .join(orders, out.asof_orderkey == orders.o_orderkey)
        .join(events.select("event_id", "ts"), "event_id")
    )
    bad = joined.filter(
        (F.col("o_custkey") != F.col("user_id"))
        | (F.col("o_orderdate").cast("timestamp") > F.col("ts"))
    )
    assert bad.count() == 0
    assert out.count() == events.count()  # left semantics: every event kept
