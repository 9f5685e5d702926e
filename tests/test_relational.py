"""Relational operator unit tests: salted aggregation equivalence and
sketch-estimate tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_semi_join_never_duplicates_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    out = relational.late_shipment_priorities(orders, lineitem)
    # semi-join: per-priority late count can never exceed the order count
    totals = {r.o_orderpriority: r.n for r in
              orders.groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()}
    for r in out.collect():
        assert 0 < r.n_late <= totals[r.o_orderpriority]


def test_large_volume_orders_all_above_threshold(spark, sf_dir):
    out = relational.large_volume_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        qty_threshold=150.0,
    ).collect()
    assert all(r.total_qty > 150.0 for r in out)
    prices = [r.o_totalprice for r in out]
    assert prices == sorted(prices, reverse=True)


def test_orders_above_customer_avg_filter(spark, sf_dir):
    out = relational.orders_above_customer_avg(load_table(spark, sf_dir, "orders"))
    bad = out.filter(
        F.col("o_totalprice") <= 1.5 * F.col("cust_sum") / F.col("n_orders")
    )
    assert bad.count() == 0


def test_window_ntile_buckets_balanced(spark, sf_dir):
    events = load_events(spark, sf_dir)
    out = relational.window_ntile_stats(events, buckets=4)
    sizes = (
        out.groupBy("event_type", "quartile").agg(F.count("*").alias("n"))
        .groupBy("event_type")
        .agg(F.max("n").alias("mx"), F.min("n").alias("mn"))
    )
    # ntile guarantee: bucket sizes differ by at most 1 within a partition
    assert sizes.filter(F.col("mx") - F.col("mn") > 1).count() == 0
    assert out.agg(F.max("cume_dist")).first()[0] == 1.0


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    events = load_events(spark, sf_dir)
    exact = {r.event_type: (r.p50, r.p95) for r in relational.agg_percentiles(events).collect()}
    approx = {r.event_type: (r.p50, r.p95) for r in relational.approx_percentiles(events).collect()}
    for etype, (p50, p95) in exact.items():
        a50, a95 = approx[etype]
        # percentile_approx error is bounded by rank, not value; at this
        # accuracy the value gap stays well within a few percent
        assert abs(a50 - p50) <= max(1.0, 0.05 * abs(p50))
        assert abs(a95 - p95) <= max(1.0, 0.05 * abs(p95))


def test_compact_latest_state_matches_window_form(spark, sf_dir):
    from pyspark.sql.window import Window

    events = load_events(spark, sf_dir)
    compact = {
        (r.user_id, r.event_type): (r.latest_event_id, r.latest_value)
        for r in relational.compact_latest_state(events).collect()
    }
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    windowed = {
        (r.user_id, r.event_type): (r.event_id, r.value)
        for r in events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert compact == windowed


def test_sliding_windows_double_count_tumbling(spark, sf_dir):
    events = load_events(spark, sf_dir)
    sliding_total = (
        relational.window_sliding_counts(events).agg(F.sum("n_events")).first()[0]
    )
    # width/slide = 2: every event is counted in exactly two windows
    assert sliding_total == 2 * events.count()
