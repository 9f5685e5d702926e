"""Round-4 Spark-4 SQL front-door surface: pipe syntax, SQL-defined
functions, session variables, state-store introspection."""

from pyspark.sql import functions as F

from kinesis_stream_reader_spark.registry import QUERIES
from kinesis_stream_reader_spark.sources.tables import load_events, load_table


def test_pipe_syntax_matches_ansi_form(spark, sf_dir):
    pipe = QUERIES["sql_pipe_syntax"](spark, sf_dir).collect()
    ansi = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "total_cents"
            ),
        )
        .orderBy("event_type")
        .collect()
    )
    assert [(r.event_type, r.n_events, r.total_cents) for r in pipe] == [
        (r.event_type, r.n_events, r.total_cents) for r in ansi
    ]


def test_sql_table_udf_installments_sum_to_order_total(spark, sf_dir):
    rows = QUERIES["sql_udf_table"](spark, sf_dir).collect()
    orders = {
        r.o_orderkey: int(r.o_totalprice * 100 + 0.5)
        for r in load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select("o_orderkey", "o_totalprice")
        .collect()
    }
    got: dict = {}
    for r in rows:
        got.setdefault(r.o_orderkey, []).append(r.amount_cents)
    assert set(got) == set(orders)
    for k, parts in got.items():
        assert len(parts) == 3
        assert sum(parts) == orders[k]  # floor split + remainder is exact


def test_state_store_snapshot_equals_batch_aggregate(spark, sf_dir):
    """The statestore reader must surface EXACTLY the aggregation's
    logical content — the round-trip proof of state persistence."""
    state = {
        r.event_type: (r.n_events, r.total_cents)
        for r in QUERIES["streaming_state_inspect"](spark, sf_dir).collect()
    }
    batch = {
        r.event_type: (r.n_events, r.total_cents)
        for r in load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "total_cents"
            ),
        )
        .collect()
    }
    assert state == batch


def test_session_variable_folds_to_pushable_literal(spark, sf_dir):
    """SET VAR then use: the variable must behave as a constant — the
    same rows as inlining the scalar subquery by hand."""
    out = QUERIES["sql_session_variables"](spark, sf_dir)
    assert out.count() >= 1
    # the variable value is the quantized mean purchase cents
    ev = load_events(spark, sf_dir)
    thr = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.floor(F.avg("value") * 100 + F.lit(0.5)).cast("long"))
        .first()[0]
    )
    manual = (
        ev.filter(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long") > thr)
        .groupBy("event_type")
        .count()
        .collect()
    )
    got = {r.event_type: r.n_above for r in out.collect()}
    assert got == {r.event_type: r["count"] for r in manual}
