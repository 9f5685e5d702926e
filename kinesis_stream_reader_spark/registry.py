"""Query registry: every implemented operator as a named (spark, sf_dir)
-> DataFrame callable, with a DuckDB oracle-SQL twin where the semantics
are ANSI-SQL-expressible.

This is the engine's public face for the correctness driver
(__spark_entry__.py re-exports it). Column names are aliased identically
on both sides — the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.events import flatten_ids, to_nested
from .operators.filters import (
    agent_id_predicate,
    agent_shift_id_predicate,
    contact_id_predicate,
    filter_records,
    server_name_predicate,
    tenant_id_predicate,
    with_data_relative_window,
)
from .plans.pipeline import records_plan, sink_json
from .sources.tables import load_events, load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Oracle building block: the flat->nested mapping of operators/events.py,
# re-stated as flat SQL (one CTE shared by every filter oracle). Keep in
# lockstep with operators/events.py.
# ---------------------------------------------------------------------------
NESTED_CTE = """
WITH nested AS (
  SELECT
    event_id,
    ts,
    CASE WHEN user_id % 7 <> 0 THEN user_id END AS tenant_id,
    CASE WHEN user_id % 5 <> 0 THEN user_id + 1000 END AS tenant_id_alt,
    'Server-' || event_type AS server_name,
    CASE WHEN event_type IN ('click','view','purchase') AND event_id % 3 <> 0
         THEN event_id % 500 END AS contact_id,
    CASE WHEN event_type IN ('click','view','purchase') AND event_id % 4 <> 0
         THEN event_id % 100 END AS contact_id_alt,
    CASE WHEN event_type IN ('signup','error') AND event_id % 3 <> 0
         THEN event_id % 50 END AS agent_shift_id,
    CASE WHEN event_type IN ('signup','error') AND event_id % 4 <> 0
         THEN event_id % 60 END AS agent_shift_id_alt,
    CASE WHEN event_type IN ('signup','error') AND user_id % 3 <> 0
         THEN user_id * 10 END AS agent_id,
    CASE WHEN event_type IN ('signup','error') AND user_id % 4 <> 0
         THEN user_id + 500 END AS agent_id_alt
  FROM events
)
"""

_FLAT_COLS = (
    "event_id, tenant_id, tenant_id_alt, server_name, contact_id, "
    "contact_id_alt, agent_shift_id, agent_shift_id_alt, agent_id, agent_id_alt"
)


def _nested_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return to_nested(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# §2.1 scan_stream — timestamped scan with the lookback window pushed down
# (reference: kinesisReader/index.js:11-48 + AT_TIMESTAMP bound :77-81)
# ---------------------------------------------------------------------------
@register(
    "scan_stream",
    NESTED_CTE
    + f"""
SELECT {_FLAT_COLS}
FROM nested
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 960 MINUTE
""",
)
def scan_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = _nested_events(spark, sf_dir)
    return flatten_ids(with_data_relative_window(nested, 960))


# ---------------------------------------------------------------------------
# §2.3 the five predicate filters (objectFilter/index.js:5-68)
# ---------------------------------------------------------------------------
@register(
    "filter_contact_id",
    NESTED_CTE
    + """
SELECT event_id, contact_id, contact_id_alt
FROM nested
WHERE contact_id = 42 OR contact_id_alt = 42
""",
)
def filter_contact_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _nested_events(spark, sf_dir).filter(contact_id_predicate("42"))
    return flatten_ids(df).select("event_id", "contact_id", "contact_id_alt")


@register(
    "filter_agent_id",
    NESTED_CTE
    + """
SELECT event_id, agent_id, agent_id_alt
FROM nested
WHERE agent_id = 130 OR agent_id_alt = 130
""",
)
def filter_agent_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _nested_events(spark, sf_dir).filter(agent_id_predicate("130"))
    return flatten_ids(df).select("event_id", "agent_id", "agent_id_alt")


@register(
    "filter_server_name",
    NESTED_CTE
    + """
SELECT event_id, server_name
FROM nested
WHERE lower(server_name) = lower('SERVER-CLICK')
""",
)
def filter_server_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    # case-insensitive match on purpose (objectFilter/index.js:37)
    df = _nested_events(spark, sf_dir).filter(server_name_predicate("SERVER-CLICK"))
    return flatten_ids(df).select("event_id", "server_name")


@register(
    "filter_tenant_id",
    NESTED_CTE
    + """
SELECT event_id, tenant_id, tenant_id_alt
FROM nested
WHERE tenant_id = 1003 OR tenant_id_alt = 1003
""",
)
def filter_tenant_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _nested_events(spark, sf_dir).filter(tenant_id_predicate("1003"))
    return flatten_ids(df).select("event_id", "tenant_id", "tenant_id_alt")


@register(
    "filter_agent_shift_id",
    NESTED_CTE
    + """
SELECT event_id, agent_shift_id, agent_shift_id_alt
FROM nested
WHERE agent_shift_id = 7 OR agent_shift_id_alt = 7
""",
)
def filter_agent_shift_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _nested_events(spark, sf_dir).filter(agent_shift_id_predicate("7"))
    return flatten_ids(df).select("event_id", "agent_shift_id", "agent_shift_id_alt")


@register(
    "filter_conjunction",
    NESTED_CTE
    + f"""
SELECT {_FLAT_COLS}
FROM nested
WHERE (tenant_id = 10 OR tenant_id_alt = 10)
  AND lower(server_name) = lower('server-SIGNUP')
  AND (agent_id = 100 OR agent_id_alt = 100)
""",
)
def filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dynamic AND composition (objectFilter/index.js:5-68)
    df = filter_records(
        _nested_events(spark, sf_dir),
        {"tenantId": "10", "serverName": "server-SIGNUP", "agentId": "100"},
    )
    return flatten_ids(df)


@register(
    "filter_nan_param",
    NESTED_CTE
    + """
SELECT event_id, contact_id, contact_id_alt
FROM nested
WHERE 1 = 0
""",
)
def filter_nan_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parseInt('abc') is NaN -> matches nothing (objectFilter/index.js:9)
    df = _nested_events(spark, sf_dir).filter(contact_id_predicate("abc"))
    return flatten_ids(df).select("event_id", "contact_id", "contact_id_alt")


@register(
    "filter_time_range",
    """
SELECT event_id, user_id, event_type
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 10 MINUTE
""",
)
def filter_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # default 10-minute lookback (app/server/index.js:28)
    df = load_events(spark, sf_dir).withColumnRenamed("ts", "event_time")
    return with_data_relative_window(df, None).select("event_id", "user_id", "event_type")


@register(
    "filter_time_range_clamped",
    """
SELECT event_id, user_id, event_type
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 960 MINUTE
""",
)
def filter_time_range_clamped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # duration=99999 silently clamps to 960 (app/server/index.js:31)
    df = load_events(spark, sf_dir).withColumnRenamed("ts", "event_time")
    return with_data_relative_window(df, "99999").select("event_id", "user_id", "event_type")


# ---------------------------------------------------------------------------
# Full reference pipeline: GET /records?streamname=S&duration=960&contactId=42
# (app/server/index.js:43-73)
# ---------------------------------------------------------------------------
@register(
    "records_pipeline",
    NESTED_CTE
    + f"""
SELECT {_FLAT_COLS}
FROM nested
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 960 MINUTE
  AND lower(server_name) = lower('SERVER-click')
""",
)
def records_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    nested = _nested_events(spark, sf_dir)
    out = records_plan(
        nested, {"streamname": "events", "duration": "960", "serverName": "SERVER-click"}
    )
    return flatten_ids(out)


# ---------------------------------------------------------------------------
# §2.2 json_parse — PERMISSIVE parse with corrupt-record fallback
# (kinesisReader/index.js:110-117)
# ---------------------------------------------------------------------------
@register(
    "json_parse",
    """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_events(spark, sf_dir)
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return df.select("event_id", parsed.getField("k").alias("k"))


# ---------------------------------------------------------------------------
# §2.1 sink_json — per-row JSON serialization (responses/index.js:26-37)
# ---------------------------------------------------------------------------
@register(
    "sink_json",
    """
SELECT to_json(struct_pack(event_id := event_id, event_type := event_type))::VARCHAR AS json
FROM events
""",
)
def sink_json_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_events(spark, sf_dir).select("event_id", "event_type")
    return sink_json(df)


# ---------------------------------------------------------------------------
# §2.2 deagg_explode — KPL de-aggregation (kinesisReader/index.js:120-176).
# The events table is packed into real KPL aggregated wire records
# (sources/raw.py), then decoded by the engine's deaggregator; the decode
# must reproduce the events table exactly, so the oracle is the identity.
# ---------------------------------------------------------------------------
@register(
    "deagg_explode",
    """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def deagg_explode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ingest import deagg_explode, json_parse
    from .sources.raw import kpl_raw_records

    # group_size matches raw.py's default (50 user records per KPL
    # aggregate, the realistic KPL shape) — and therefore the bench
    # warmup's packed-fixture cache
    raw = kpl_raw_records(spark, sf_dir)
    exploded = deagg_explode(raw)
    parsed = json_parse(exploded, schema="event_id BIGINT, k BIGINT")
    return parsed.select("event_id", "k")


# Every JSON scalar JavaScript treats as falsy, plus truthy/invalid
# controls. Expected survivors per path follow kinesisReader/index.js:
# the non-KPL `if (record)` gate (:173) drops falsy payloads; the KPL
# inner loop (:155-162) has no gate; invalid JSON survives BOTH paths
# because the {"INVALID JSON": raw} wrapper (:115) is truthy.
_QUIRK_PAYLOADS = [
    '{"k": 1}', "null", "0", "false", '""', "0.0", "not json", "[]", '"x"', "17",
]
_QUIRK_FALSY = {"null", "0", "false", '""', "0.0"}


@register(
    "deagg_passthrough_quirk",
    # static expected table: reference semantics derived by hand from
    # index.js:155-173 — KPL keeps all 10, passthrough keeps the 5
    # truthy/invalid ones
    """
WITH expected(path, payload) AS (
  VALUES
    ('kpl', '{"k": 1}'), ('kpl', 'null'), ('kpl', '0'), ('kpl', 'false'),
    ('kpl', '""'), ('kpl', '0.0'), ('kpl', 'not json'), ('kpl', '[]'),
    ('kpl', '"x"'), ('kpl', '17'),
    ('raw', '{"k": 1}'), ('raw', 'not json'), ('raw', '[]'), ('raw', '"x"'),
    ('raw', '17')
)
SELECT path, payload FROM expected
""",
)
def deagg_passthrough_quirk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ingest import deagg_explode, kpl_encode

    blobs = [("kpl", kpl_encode([p.encode() for p in _QUIRK_PAYLOADS]))] + [
        ("raw", p.encode()) for p in _QUIRK_PAYLOADS
    ]
    df = spark.createDataFrame(blobs, "path STRING, data BINARY")
    out = deagg_explode(df, reference_quirks=True)
    return out.select(
        "path", F.unbase64(F.col("payload_b64")).cast("string").alias("payload")
    )


def _ensure_pyds_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Recorded-wire shard files for the Python DataSource, fingerprinted
    like ksr_raw_cache: a regenerated events table can never be read
    against stale shard files. Registers the DataSource as a side
    effect. Shared by the batch reader, the wire writer, and the
    streaming reader queries."""
    import pandas as _pd

    from .sources.python_source import KinesisBackfillDataSource, write_shard_file
    from .sources.raw import kpl_raw_records, source_fingerprint

    spark.dataSource.register(KinesisBackfillDataSource)
    shard_dir = (
        f"/tmp/ksr_pyds/{sf_dir.strip('/').replace('/', '_')}"
        f"_{source_fingerprint(sf_dir)}"
    )
    if not os.path.isdir(shard_dir):
        os.makedirs(shard_dir, exist_ok=True)
        raw = kpl_raw_records(spark, sf_dir).withColumn(
            "shard", (F.col("agg_id") % 4).cast("int")
        )

        def dump(pdf: _pd.DataFrame) -> _pd.DataFrame:
            # executor-side shard-file write (local-mode shared /tmp;
            # a cluster would target shared storage)
            pdf = pdf.sort_values("agg_id")
            shard = int(pdf["shard"].iloc[0])
            write_shard_file(
                f"{shard_dir}/shard-{shard}.jsonl",
                [bytes(b) for b in pdf["data"]],
            )
            return _pd.DataFrame({"shard": [shard], "n": [len(pdf)]})

        raw.groupBy("shard").applyInPandas(dump, "shard INT, n INT").count()
    return shard_dir


@register(
    "source_python_backfill",
    # end-to-end through the Spark 4 Python DataSource: recorded-wire
    # shard files -> kinesis_backfill format (one partition per shard,
    # executor-side reads) -> KPL deagg -> JSON parse must reproduce
    # the events table exactly — the same identity oracle as
    # deagg_explode, now through the pluggable-source machinery
    """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def source_python_backfill_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ingest import deagg_explode, json_parse

    shard_dir = _ensure_pyds_fixture(spark, sf_dir)
    df = spark.read.format("kinesis_backfill").option("path", shard_dir).load()
    parsed = json_parse(
        deagg_explode(df), schema="event_id BIGINT, k BIGINT"
    )
    return parsed.select("event_id", "k")


# ---------------------------------------------------------------------------
# Relational extension surface (SURVEY.md §2.4-2.8: absent in the
# reference, built-in via Spark). operators/relational.py documents the
# per-operator scale strategy.
# ---------------------------------------------------------------------------
@register(
    "agg_count_by_key",
    """
SELECT user_id, event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY user_id, event_type
""",
)
def agg_count_by_key_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.agg_count_by_key(load_events(spark, sf_dir))


@register(
    "agg_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
)
def agg_pricing_summary_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.agg_pricing_summary(load_table(spark, sf_dir, "lineitem"))


@register(
    "join_enrich",
    """
SELECT r_name, n_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 4) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def join_enrich_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.join_enrich(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "join_filter_pushdown",
    """
SELECT p_brand, COUNT(*) AS n_lineitems, ROUND(SUM(l_extendedprice), 4) AS sum_price
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#13'
GROUP BY p_brand
""",
)
def join_filter_pushdown_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.join_filter_pushdown(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part"), "Brand#13"
    )


@register(
    "window_rank",
    """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
""",
)
def window_rank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.window_rank_orders(load_table(spark, sf_dir, "orders"), k=3)


@register(
    "top_k_customers",
    """
SELECT c_custkey, c_name, revenue FROM (
  SELECT o_custkey, ROUND(SUM(o_totalprice), 4) AS revenue FROM orders GROUP BY o_custkey
) JOIN customer ON o_custkey = c_custkey
ORDER BY revenue DESC, c_custkey
LIMIT 10
""",
)
def top_k_customers_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.top_k_customers(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer"), k=10
    )


@register(
    "set_except",
    """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
)
""",
)
def set_except_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.customers_without_orders(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register(
    "join_semi",
    """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
""",
)
def join_semi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.customers_with_orders(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register(
    "set_union",
    """
SELECT user_id AS uid FROM events
UNION
SELECT c_custkey AS uid FROM customer
""",
)
def set_union_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.union_user_ids(
        load_events(spark, sf_dir), load_table(spark, sf_dir, "customer")
    )


_RECURSIVE_REACH_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT user_id AS src, event_id % 500 AS dst FROM events
), reach AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
  UNION ALL
  SELECT e.dst AS node, r.depth + 1 AS depth
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.depth < 2
)
SELECT node, MIN(depth) AS min_depth
FROM reach GROUP BY node ORDER BY node
"""


@register("sql_recursive_reachability", _RECURSIVE_REACH_SQL)
def sql_recursive_reachability_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 recursive CTE (WITH RECURSIVE in spark.sql): 2-hop
    reachability from user 0 over the interaction graph — the
    DECLARATIVE twin of the driver-loop iterative kernels
    (dedup_components / pagerank_converged). Identical SQL text runs on
    both engines; depth-bounded UNION ALL recursion keeps the working
    set finite. At 100 TB the driver-loop form (localCheckpoint per
    round, explicit convergence) remains the default — the recursive
    CTE materializes every intermediate level inside one plan — but the
    surface now covers users who bring ANSI recursive SQL."""
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(_RECURSIVE_REACH_SQL)


@register(
    "sql_text_api",
    # the engine's SQL front end: the same Catalyst plan from SQL text
    """
SELECT s_name, COUNT(*) AS n_items, ROUND(SUM(l_extendedprice), 4) AS total
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
""",
)
def sql_text_api_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spark.sql over registered temp views — proves the DataFrame and
    # SQL front doors share one engine (identical Catalyst plan)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("ksr_lineitem")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("ksr_supplier")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS n_items, ROUND(SUM(l_extendedprice), 4) AS total
        FROM ksr_lineitem JOIN ksr_supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        """
    )


@register(
    "set_intersect",
    """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def set_intersect_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.active_in_both(load_events(spark, sf_dir))


@register(
    "sort_limit",
    """
SELECT event_id, user_id, event_type, value
FROM events ORDER BY value DESC, event_id LIMIT 100
""",
)
def sort_limit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.sort_limit_events(load_events(spark, sf_dir), n=100)


@register(
    "distinct_count",
    """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
)
def distinct_count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.distinct_users_per_type(load_events(spark, sf_dir))


@register(
    "rollup_counts",
    """
SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY ROLLUP (event_type)
""",
)
def rollup_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.rollup_counts(load_events(spark, sf_dir))


@register(
    "window_tumbling",
    """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events
FROM events GROUP BY 1, 2
""",
)
def window_tumbling_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.window_tumbling_counts(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Training-data pipeline extension surface: text analysis, dedup,
# similarity search (operators/text.py, dedup.py, similarity.py).
# ---------------------------------------------------------------------------
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_TOKS = "string_split_regex(trim(text), '\\s+')"
_GRAMS = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(" + _TOKS + ") - 2, 0)), "
    "i -> array_to_string((" + _TOKS + ")[i:i+2], ' ')))"
)


@register(
    "text_token_count",
    f"""
SELECT doc_id,
       len({_TOKS}) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
FROM documents
""",
)
def text_token_count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.text_token_count(load_table(spark, sf_dir, "documents"))


@register(
    "text_quality",
    f"""
SELECT doc_id,
       length(text) AS n_chars,
       len({_TOKS}) AS n_tokens,
       ROUND(length(text) / len({_TOKS}), 4) AS avg_token_len,
       ROUND(len(regexp_extract_all(text, '[^\\w\\s]')) / length(text), 4) AS punct_ratio,
       ROUND(len(list_filter({_TOKS}, t -> t IN ('the','a','of','and'))) / len({_TOKS}), 4)
         AS stopword_ratio
FROM documents
""",
)
def text_quality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.text_quality(load_table(spark, sf_dir, "documents"))


def _lang_score(markers: tuple[str, ...]) -> str:
    quoted = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_TOKS}, t -> t IN ({quoted})))"


def _lang_id_oracle() -> str:
    from .operators.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    scores = ", ".join(f"{_lang_score(LANG_MARKERS[lang])} AS s_{lang}" for lang in langs)
    greatest = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    first_max = "CASE " + " ".join(
        f"WHEN s_{lang} = {greatest} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
WITH scored AS (SELECT doc_id, lang, {scores} FROM documents)
SELECT doc_id, lang, {first_max} AS lang_pred, {greatest} AS marker_hits
FROM scored
"""


@register("text_lang_id", _lang_id_oracle())
def text_lang_id_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.text_lang_id(load_table(spark, sf_dir, "documents"))


@register(
    "text_fingerprint",
    f"""
SELECT doc_id, md5({_NORM}) AS fingerprint
FROM documents
""",
)
def text_fingerprint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.text_fingerprint(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_exact",
    f"""
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY md5({_NORM})) AS canonical_id,
       doc_id <> MIN(doc_id) OVER (PARTITION BY md5({_NORM})) AS is_dup
FROM documents
""",
)
def dedup_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.dedup_exact(load_table(spark, sf_dir, "documents")).drop("fingerprint")


@register(
    "dedup_ngram_jaccard",
    f"""
WITH g AS (SELECT doc_id, lang, source, {_GRAMS} AS grams FROM documents)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       ROUND(len(list_intersect(a.grams, b.grams))::DOUBLE
             / len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
FROM g a JOIN g b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.6
""",
)
def dedup_ngram_jaccard_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_lsh",
    # exact all-pairs oracle: valid because the 16x2 band scheme has
    # ~1-1e-7 recall at the 0.8 threshold (operators/dedup.py)
    f"""
WITH g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       ROUND(len(list_intersect(a.grams, b.grams))::DOUBLE
             / len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
""",
)
def dedup_minhash_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


def _simhash_oracle() -> str:
    from .operators.dedup import SIMHASH_BITS

    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    signature = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {2**b}::BIGINT ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS t FROM documents
), hashed AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(t), 1, 15)) AS UBIGINT)::BIGINT AS h FROM tok
), votes AS (
  SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
), sig AS (
  SELECT doc_id, {signature} AS simhash FROM votes
), blocked AS (
  SELECT s.doc_id, s.simhash, d.lang, d.source FROM sig s JOIN documents d USING (doc_id)
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM blocked a JOIN blocked b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
"""


@register("dedup_simhash", _simhash_oracle())
def dedup_simhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.simhash_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_groups",
    # connected components over the >=0.8 near-dup graph; oracle walks
    # the same graph with a recursive transitive-closure CTE
    f"""
WITH RECURSIVE g AS (
  SELECT doc_id, {_GRAMS} AS grams FROM documents
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
), edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id AS u, a_id AS v FROM pairs
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT d.doc_id,
       LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS component_id
FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
GROUP BY d.doc_id
""",
)
def dedup_groups_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    documents = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(documents, threshold=0.8)
    return dedup.dedup_components(documents, pairs)


@register(
    "dedup_substring_spans",
    # Lee et al. span-level duplication: per-position 8-token windows,
    # duplicated-window intervals merged per doc by the same
    # running-max interval-union the Spark side uses
    """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tl FROM documents
), posts AS (
  SELECT doc_id, i.i AS s, i.i + 8 AS e,
         array_to_string(tl[i.i + 1 : i.i + 8], ' ') AS gram
  FROM toks, LATERAL (SELECT UNNEST(range(greatest(len(tl) - 7, 0))) AS i) i
), dup AS (
  SELECT gram FROM posts GROUP BY gram HAVING COUNT(*) >= 2
), intervals AS (
  SELECT p.doc_id, p.s, p.e FROM posts p JOIN dup USING (gram)
), marked AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM intervals
), islands AS (
  SELECT doc_id, s, e,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s) AS island
  FROM marked
), cov AS (
  SELECT doc_id, SUM(covered) AS dup_tokens
  FROM (SELECT doc_id, island, MAX(e) - MIN(s) AS covered
        FROM islands GROUP BY doc_id, island)
  GROUP BY doc_id
)
SELECT t.doc_id, len(t.tl)::BIGINT AS n_tokens,
       COALESCE(c.dup_tokens, 0)::BIGINT AS dup_tokens,
       FLOOR(COALESCE(c.dup_tokens, 0) / len(t.tl) * 1e4 + 0.5) / 1e4 AS dup_frac
FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id
ORDER BY t.doc_id
""",
)
def dedup_substring_spans_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.substring_dedup_report(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_canonical",
    # the DEFAULT near-dup contract (doc -> canonical + is_dup): linear
    # output regardless of dup-group size; oracle = the same exact-pair
    # graph walked to components with a recursive CTE
    f"""
WITH RECURSIVE g AS (
  SELECT doc_id, {_GRAMS} AS grams FROM documents
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
), edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id AS u, a_id AS v FROM pairs
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT d.doc_id,
       LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS canonical_id,
       d.doc_id <> LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS is_dup
FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
GROUP BY d.doc_id
""",
)
def dedup_minhash_canonical_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.minhash_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_pairs_capped",
    # the bounded diagnostic view: at most 3 pairs per a_id (lowest
    # b_id first), turning the quadratic pair relation into <= 3N rows
    f"""
WITH g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         ROUND(len(list_intersect(a.grams, b.grams))::DOUBLE
               / len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
)
SELECT a_id, b_id, jaccard FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY b_id) AS rn
  FROM pairs
) WHERE rn <= 3
""",
)
def dedup_minhash_pairs_capped_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), max_pairs_per_doc=3
    )


@register(
    "dedup_containment_best",
    # the DEFAULT containment contract: one row per contained doc with
    # its best container (max containment, ties -> lowest container id)
    f"""
WITH g AS (SELECT doc_id, lang, source, {_GRAMS} AS grams FROM documents),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         ROUND(len(list_intersect(a.grams, b.grams))::DOUBLE / len(a.grams), 4)
           AS containment
  FROM g a JOIN g b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
  WHERE len(a.grams) > 0
    AND len(list_intersect(a.grams, b.grams))::DOUBLE / len(a.grams) >= 0.8
)
SELECT a_id AS doc_id, b_id AS container_id, containment FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id
                               ORDER BY containment DESC, b_id) AS rn
  FROM pairs
) WHERE rn = 1 ORDER BY doc_id
""",
)
def dedup_containment_best_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.containment_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_embedding_cosine",
    """
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) >= 0.4
""",
)
def dedup_embedding_cosine_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.4
    )


@register(
    "ann_bruteforce",
    """
SELECT b.vec_id,
       ROUND(list_cosine_similarity(b.embedding::DOUBLE[], q.embedding::DOUBLE[]), 3) AS cos_sim
FROM embeddings b, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
WHERE b.vec_id <> 0
ORDER BY cos_sim DESC, b.vec_id
LIMIT 10
""",
)
def ann_bruteforce_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.ann_bruteforce(load_table(spark, sf_dir, "embeddings"))


@register(
    "ann_lsh",
    # FULL mirror: the hyperplanes are md5-derived (similarity.lsh_planes),
    # so DuckDB rebuilds the identical plane matrix, buckets, hamming
    # probe, and exact-cosine rescoring. Sign decisions are robust to
    # summation-order ulp noise (a flip needs |dot| < ~1e-13).
    """
WITH planes AS (
  SELECT p, list(2 * (CAST(concat('0x', substr(md5('plane:' || p || ':' || d), 1, 15)) AS UBIGINT)
                      / 1152921504606846976.0) - 1 ORDER BY d) AS w
  FROM (SELECT UNNEST(range(16)) AS p), (SELECT UNNEST(range(64)) AS d)
  GROUP BY p
), vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), buckets AS (
  SELECT vec_id,
         SUM(CASE WHEN list_dot_product(v.v, pl.w) > 0
                  THEN CAST(1 AS BIGINT) << pl.p ELSE 0 END) AS bucket
  FROM vecs v, planes pl GROUP BY vec_id
), q AS (
  SELECT v.v AS qv, b.bucket AS qb FROM vecs v JOIN buckets b USING (vec_id)
  WHERE v.vec_id = 0
)
SELECT v.vec_id, ROUND(list_cosine_similarity(v.v, q.qv), 3) AS cos_sim
FROM vecs v JOIN buckets b ON v.vec_id = b.vec_id, q
WHERE v.vec_id <> 0 AND bit_count(xor(b.bucket, q.qb)) <= 6
ORDER BY cos_sim DESC, v.vec_id LIMIT 10
""",
)
def ann_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.ann_lsh(load_table(spark, sf_dir, "embeddings"))


@register(
    "ann_pq",
    # full PQ mirror: same deterministic codebooks (subvectors of the 8
    # lowest vec_ids), same milli-quantized L2 assignment (argmin via
    # the packed MIN(d*8+code) trick = Spark's min-struct ordering),
    # same exact-bigint ADC sums
    """
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), parts AS (
  SELECT vec_id, s.s AS sub_id, v[s.s * 16 + 1 : (s.s + 1) * 16] AS sv
  FROM vecs, (SELECT UNNEST(range(4)) AS s) s
), codes AS (
  SELECT sub_id AS c_sub, vec_id AS code_id, sv AS cv FROM parts WHERE vec_id < 8
), scored AS (
  SELECT p.vec_id, p.sub_id, c.code_id,
         CAST(FLOOR(list_sum(list_transform(range(1, 17),
                i -> (p.sv[i] - c.cv[i]) * (p.sv[i] - c.cv[i]))) * 1000 + 0.5)
              AS BIGINT) AS d_milli
  FROM parts p JOIN codes c ON p.sub_id = c.c_sub
), assign AS (
  SELECT vec_id, sub_id, MIN(d_milli * 8 + code_id) % 8 AS code
  FROM scored GROUP BY vec_id, sub_id
), lut AS (
  SELECT s.sub_id, s.code_id, s.d_milli AS q_milli
  FROM scored s WHERE s.vec_id = 0
)
SELECT a.vec_id, SUM(l.q_milli) / 1000 AS adc_dist
FROM assign a JOIN lut l ON a.sub_id = l.sub_id AND a.code = l.code_id
WHERE a.vec_id <> 0
GROUP BY a.vec_id
ORDER BY adc_dist, a.vec_id LIMIT 10
""",
)
def ann_pq_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.ann_pq(load_table(spark, sf_dir, "embeddings"))


@register(
    "agg_count_by_key_salted",
    # identical semantics to agg_count_by_key — salting is plan-internal
    """
SELECT user_id, event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY user_id, event_type
""",
)
def agg_count_by_key_salted_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.agg_count_by_key_salted(load_events(spark, sf_dir))


@register(
    "agg_approx_distinct",
    # the HLL estimate itself is engine-specific, so the driver-checked
    # contract is the BOUND: the sketch estimate must land within 5x
    # the requested rsd (0.02) of the exact count — the oracle supplies
    # the exact counts and asserts the bound holds for every group
    """
SELECT event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS exact_users, true AS within_tol
FROM events GROUP BY event_type
""",
)
def agg_approx_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    est = relational.approx_distinct_users(load_events(spark, sf_dir))
    exact = (
        load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_events",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.lit(5 * 0.02) * F.col("exact_users")
        ).alias("within_tol"),
    )


@register(
    "join_asof",
    """
WITH o1 AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey
FROM events e ASOF LEFT JOIN o1 o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
)
def join_asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.join_asof_latest_order(
        load_events(spark, sf_dir), load_table(spark, sf_dir, "orders")
    )


@register(
    "cube_counts",
    """
SELECT event_type, user_id % 10 AS user_bucket, COUNT(*) AS n_events
FROM events GROUP BY CUBE (event_type, user_id % 10)
""",
)
def cube_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.cube_counts(load_events(spark, sf_dir))


@register(
    "pivot_counts",
    """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS n_click,
       COUNT(*) FILTER (event_type = 'view') AS n_view,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (event_type = 'error') AS n_error
FROM events GROUP BY user_id
""",
)
def pivot_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.pivot_counts(load_events(spark, sf_dir))


@register(
    "agg_percentiles",
    """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.95), 4) AS p95
FROM events GROUP BY event_type
""",
)
def agg_percentiles_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.agg_percentiles(load_events(spark, sf_dir))


@register(
    "shipping_priority",
    """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def shipping_priority_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.shipping_priority(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


# ---------------------------------------------------------------------------
# Streaming surface (§2.10): the same plan executed as a Structured
# Streaming query with Trigger.AvailableNow (the reference's
# drain-until-caught-up loop), checked against the BATCH SQL oracle —
# stream/batch unification as a correctness statement.
# ---------------------------------------------------------------------------
@register(
    "streaming_windowed_counts",
    """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events
FROM events GROUP BY 1, 2
""",
)
def streaming_windowed_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    return jobs.run_available_now(
        jobs.windowed_counts(stream), "streaming_windowed_counts"
    )


# ---------------------------------------------------------------------------
# Multimodal columns: binary payload + metadata struct, Arrow-batched
# feature extraction (operators/multimodal.py; codecs stubbed, plumbing
# real). Oracle covers the SQL-expressible features; the byte-level fake
# features are pytest-verified (tests/test_multimodal.py).
# ---------------------------------------------------------------------------
@register(
    "multimodal_features",
    """
SELECT doc_id, 'image' AS kind, length(text) AS n_bytes
FROM documents
""",
)
def multimodal_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    media = multimodal.documents_as_media(load_table(spark, sf_dir, "documents"))
    return multimodal.extract_features(media).select("doc_id", "kind", "n_bytes")


@register(
    "streaming_dedup",
    # the stream is unioned with itself (at-least-once delivery sim);
    # watermark-bounded dedup must reduce it back to the exact table
    """
SELECT event_id, user_id, event_type FROM events
""",
)
def streaming_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    doubled = stream.union(stream)
    out = jobs.run_available_now(
        jobs.dedup_stream(doubled).select("event_id", "user_id", "event_type"),
        "streaming_dedup",
    )
    return out


@register(
    "tpch_q6",
    """
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # forecasting-revenue-change: pure scan + pushed range predicates +
    # single agg — the canonical pushdown benchmark
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


@register(
    "text_normalize",
    """
SELECT doc_id,
       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g') AS normalized
FROM documents
""",
)
def text_normalize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), "[^a-z0-9 ]", "").alias(
            "normalized"
        ),
    )


@register(
    "streaming_attribution",
    # watermarked stream-stream join vs the plain batch self-join
    """
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
""",
)
def streaming_attribution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    return jobs.run_available_now(
        jobs.attribution_join(stream), "streaming_attribution"
    )


@register(
    "streaming_sessionize",
    # The stateful operator emits a session when (a) a LATER event of
    # the same user closes it (30-min gap), or (b) its event-time
    # timeout fires: AvailableNow runs a trailing no-data batch whose
    # watermark is max(ts) - 2h, so a user's final open session is
    # emitted iff session_end + 30min < that terminal watermark.
    """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
), grouped AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
  FROM marked
), sess AS (
  SELECT user_id, sid,
         MIN(ts) AS start_ts, MAX(ts) AS end_ts, COUNT(*) AS n_events
  FROM grouped GROUP BY user_id, sid
), last AS (
  SELECT user_id, MAX(sid) AS max_sid FROM sess GROUP BY user_id
), wm AS (
  SELECT MAX(ts) - INTERVAL 2 HOUR AS w FROM events
)
SELECT sess.user_id,
       strftime(start_ts, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(end_ts, '%Y-%m-%d %H:%M:%S') AS session_end,
       n_events
FROM sess JOIN last ON sess.user_id = last.user_id, wm
WHERE sid < max_sid
   OR (sid = max_sid AND end_ts + INTERVAL 30 MINUTE < wm.w)
""",
)
def streaming_sessionize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs
    from .streaming.stateful import sessionize

    stream = jobs.stream_events(spark, sf_dir)
    # Python-stateful op: Arrow+pandas compute dominates, not state
    # commits — keep cluster-width partitions (see run_available_now)
    out = jobs.run_available_now(
        sessionize(stream), "streaming_sessionize", state_partitions=32
    )
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


@register(
    "streaming_sessionize_native",
    # JVM session_window in append mode: a session emits only once the
    # terminal watermark (max(ts) - 2h under AvailableNow) passes its
    # end (= last event + 30-min gap) — regardless of whether a later
    # event already closed it (unlike the Python-stateful demo, which
    # also emits on the next event's arrival).
    """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
), grouped AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
  FROM marked
), sess AS (
  SELECT user_id, sid,
         MIN(ts) AS start_ts, MAX(ts) + INTERVAL 30 MINUTE AS end_ts,
         COUNT(*) AS n_events
  FROM grouped GROUP BY user_id, sid
), wm AS (
  SELECT MAX(ts) - INTERVAL 2 HOUR AS w FROM events
)
SELECT user_id,
       strftime(start_ts, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(end_ts, '%Y-%m-%d %H:%M:%S') AS session_end,
       n_events
FROM sess, wm WHERE end_ts < wm.w
""",
)
def streaming_sessionize_native_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    return jobs.run_available_now(
        jobs.sessionize_native(stream), "streaming_sessionize_native", mode="append"
    )


@register(
    "window_session_builtin",
    # F.session_window's `end` is last_event + gap; mirror via lag/cumsum
    """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
), grouped AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
  FROM marked
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events
FROM grouped GROUP BY user_id, sid
""",
)
def window_session_builtin_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.window_session_builtin(load_events(spark, sf_dir))


@register(
    "agg_minmax_by",
    """
WITH ranked AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rmax,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rmin
  FROM events
)
SELECT event_type,
       MAX(CASE WHEN rmax = 1 THEN event_id END) AS top_event_id,
       MAX(CASE WHEN rmin = 1 THEN event_id END) AS bottom_event_id,
       ROUND(MAX(value), 4) AS max_value
FROM ranked GROUP BY event_type
""",
)
def agg_minmax_by_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.agg_minmax_by(load_events(spark, sf_dir))


@register(
    "agg_stats",
    """
SELECT event_type,
       ROUND(stddev_samp(value), 4) AS stddev_value,
       ROUND(var_samp(value), 4) AS var_value,
       ROUND(AVG(value), 4) AS avg_value
FROM events GROUP BY event_type
""",
)
def agg_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.agg_stats(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Flagship composition: end-to-end corpus curation (plans/curate.py) —
# quality gates -> language selection -> exact dedup -> near-dup
# canonicalization -> curated corpus. One oracle checks the whole
# composition.
# ---------------------------------------------------------------------------
@register(
    "curate_corpus",
    f"""
WITH RECURSIVE gated AS (
  SELECT doc_id, lang, text, len({_TOKS}) AS n_tokens
  FROM documents
  WHERE lang IN ('en', 'de')
    AND len({_TOKS}) >= 30
    AND len(list_filter({_TOKS}, t -> t IN ('the','a','of','and')))::DOUBLE
        / len({_TOKS}) <= 0.5
), exact AS (
  SELECT doc_id, lang, text, n_tokens,
         MIN(doc_id) OVER (PARTITION BY md5({_NORM})) AS canonical
  FROM gated
), survivors AS (
  SELECT doc_id, lang, text, n_tokens FROM exact WHERE doc_id = canonical
), g AS (
  SELECT doc_id, {_GRAMS} AS grams FROM survivors
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
), edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id AS u, a_id AS v FROM pairs
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT s.doc_id,
         LEAST(s.doc_id, COALESCE(MIN(r.v), s.doc_id)) AS component_id
  FROM survivors s LEFT JOIN reach r ON r.u = s.doc_id
  GROUP BY s.doc_id
)
SELECT s.doc_id, s.lang, s.n_tokens
FROM survivors s JOIN comp c ON s.doc_id = c.doc_id AND s.doc_id = c.component_id
""",
)
def curate_corpus_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.curate import curate_corpus

    return curate_corpus(load_table(spark, sf_dir, "documents"))


@register(
    "local_supplier_volume",
    """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def local_supplier_volume_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.local_supplier_volume(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "returned_items",
    """
SELECT c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS lost_revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
""",
)
def returned_items_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.returned_item_customers(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register(
    "promo_revenue",
    """
SELECT ROUND(
  100 * SUM(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-03-01'
""",
)
def promo_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.promo_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "join_range_bands",
    """
SELECT band, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM events
JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0),
             ('high', 150.0, 300.0), ('extreme', 300.0, 1000.0)) b(band, lo, hi)
  ON value >= lo AND value < hi
GROUP BY band
""",
)
def join_range_bands_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.join_range_bands(load_events(spark, sf_dir))


@register(
    "join_interval_bucketed",
    # oracle is the plain point-in-interval theta join; bucketing is
    # plan-internal
    """
SELECT e.event_id, e.user_id, COALESCE(c.cnt, 0) AS n_active_orders
FROM events e LEFT JOIN (
  SELECT e2.event_id, COUNT(*) AS cnt
  FROM events e2 JOIN orders o
    ON e2.user_id = o.o_custkey
   AND e2.ts >= o.o_orderdate::TIMESTAMP
   AND e2.ts < o.o_orderdate::TIMESTAMP + INTERVAL 30 DAY
  GROUP BY e2.event_id
) c ON e.event_id = c.event_id
ORDER BY e.event_id
""",
)
def join_interval_bucketed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.join_interval_bucketed(
        load_events(spark, sf_dir), load_table(spark, sf_dir, "orders")
    )


@register(
    "explode_tokens",
    f"""
SELECT tok, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
GROUP BY tok
HAVING COUNT(*) >= 100
""",
)
def explode_tokens_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.token_frequencies(load_table(spark, sf_dir, "documents"), min_total=100)


@register(
    "text_pii_scrub",
    # the fixture corpus contains no PII, so the query plants a
    # deterministic contact line per document and the operator must
    # scrub exactly it
    """
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           text || ' contact user' || doc_id || '@example.com or 555-'
                || lpad((doc_id % 10000)::VARCHAR, 4, '0'),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\\b555-[0-9]{4}\\b', '<PHONE>', 'g') AS text
FROM documents
""",
)
def text_pii_scrub_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    docs = load_table(spark, sf_dir, "documents")
    with_pii = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    )
    return text.pii_scrub(with_pii).select("doc_id", "text")


@register(
    "ann_ivf",
    """
WITH e AS (SELECT vec_id, label AS list_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
cent AS (
  SELECT list_id, array_agg(m ORDER BY i) AS c FROM (
    SELECT list_id, i, AVG(v[i]) AS m
    FROM e, generate_series(1, 64) AS t(i)
    GROUP BY list_id, i
  ) GROUP BY list_id
),
probe AS (
  SELECT list_id FROM cent, q
  ORDER BY list_cosine_similarity(c, qv) DESC, list_id LIMIT 2
)
SELECT e.vec_id, ROUND(list_cosine_similarity(e.v, qv), 3) AS cos_sim
FROM e JOIN probe USING (list_id), q
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id
LIMIT 10
""",
)
def ann_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.ann_ivf(load_table(spark, sf_dir, "embeddings"))


@register(
    "multimodal_frame_sample",
    # oracle covers the SQL-expressible frame count (stride-4 sampling
    # of the payload bytes); byte-level values are pytest-verified
    """
SELECT doc_id, 'image' AS kind,
       CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT) AS n_frames
FROM documents
""",
)
def multimodal_frame_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    media = multimodal.documents_as_media(load_table(spark, sf_dir, "documents"))
    return multimodal.sample_frames_features(media, every_n=4).select(
        "doc_id", "kind", "n_frames"
    )


@register(
    "streaming_records_pipeline",
    # the flagship reference query executed as a STREAM, checked against
    # the batch oracle — stream/batch unification on the parity surface
    # itself. (The AT_TIMESTAMP lower bound lives in the source options
    # in streaming mode, so no time predicate here.)
    NESTED_CTE
    + f"""
SELECT {_FLAT_COLS}
FROM nested
WHERE lower(server_name) = lower('SERVER-click')
""",
)
def streaming_records_pipeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    filtered = jobs.records_stream(stream, {"streamname": "events", "serverName": "SERVER-click"})
    out = jobs.run_available_now(filtered, "streaming_records_pipeline")
    return flatten_ids(out)


@register(
    "sink_parquet_partitioned",
    # round-trip identity: the partitioned columnar sink must preserve
    # every row (partition values come back from directory names)
    """
SELECT event_id, user_id, event_type FROM events
""",
)
def sink_parquet_partitioned_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink: the storage layout every downstream
    engine-scale deployment uses (hive-style event_type=... directories
    -> partition pruning on read). Written once per sf under /tmp, then
    read back so the oracle checks the full write->read round trip."""
    import os

    out_dir = f"/tmp/ksr_sink/{sf_dir.strip('/').replace('/', '_')}_events_by_type"
    events = load_events(spark, sf_dir).select("event_id", "user_id", "event_type")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out_dir)
    assert os.path.isdir(out_dir)
    return spark.read.parquet(out_dir).select("event_id", "user_id", "event_type")


@register(
    "window_running_total",
    """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
FROM events
""",
)
def window_running_total_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.window_running_total(load_events(spark, sf_dir))


@register(
    "window_lead_lag",
    """
SELECT event_id, user_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
""",
)
def window_lead_lag_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.window_lead_lag(load_events(spark, sf_dir))


@register(
    "multimodal_resize",
    # n_out is SQL-expressible (the fixture corpus has no empty docs at
    # any sf, but the CASE keeps the oracle honest); the positional
    # checksum pinning WHICH bytes were selected is pytest-verified
    """
SELECT doc_id, 'image' AS kind,
       CASE WHEN octet_length(encode(text)) > 0 THEN 128 ELSE 0 END AS n_out
FROM documents
""",
)
def multimodal_resize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    media = multimodal.documents_as_media(load_table(spark, sf_dir, "documents"))
    return multimodal.resize_features(media, target=128).select("doc_id", "kind", "n_out")


@register(
    "json_parse_corrupt",
    # the reference's signature corrupt-record fallback
    # (kinesisReader/index.js:113-116) as an oracle-checked query: odd
    # event payloads are deliberately corrupted; they must surface in
    # the "INVALID JSON" column with NULL parsed fields, never error
    """
SELECT event_id,
       CASE WHEN event_id % 2 = 0 THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k,
       CASE WHEN event_id % 2 <> 0 THEN 'CORRUPT ' || props END AS "INVALID JSON"
FROM events
""",
)
def json_parse_corrupt_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ingest import json_parse

    df = load_events(spark, sf_dir)
    payload_txt = F.when(F.col("event_id") % 2 == 0, F.col("props")).otherwise(
        F.concat(F.lit("CORRUPT "), F.col("props"))
    )
    with_payload = df.select(
        "event_id", F.base64(F.encode(payload_txt, "UTF-8")).alias("payload_b64")
    )
    return json_parse(with_payload, schema="k BIGINT")


@register(
    "grouping_sets_sql",
    # explicit GROUPING SETS (the general form behind rollup/cube),
    # through the SQL front door
    """
SELECT event_type, user_bucket, COUNT(*) AS n_events
FROM (SELECT event_type, user_id % 10 AS user_bucket FROM events)
GROUP BY GROUPING SETS ((event_type), (user_bucket), ())
""",
)
def grouping_sets_sql_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_events(spark, sf_dir).createOrReplaceTempView("ksr_events")
    return spark.sql(
        """
        SELECT event_type, user_bucket, COUNT(*) AS n_events
        FROM (SELECT event_type, user_id % 10 AS user_bucket FROM ksr_events)
        GROUP BY GROUPING SETS ((event_type), (user_bucket), ())
        """
    )


# The correctness driver samples queries() in dict order and may stop
# after the first ~50 entries, so never-driver-checked queries lead.
_PRIORITY = [
    # ROUND-5 ROTATION: the driver verifies the FIRST ~50 entries. Head =
    # the 23 late-pass additions (causal matching, SPRT, JL/feature
    # hashing, ER blocking, the WER/ROUGE/chrF eval triad, kappa, GIF
    # codec, ridge, streaming drift, markov eval, brier, DTW, harmonic,
    # matrix profile, PELT, removal-effect attribution), then the 14
    # early-round-5 additions (JPEG codec, soft dedup, readability,
    # Bradley-Terry, k-core, collation...), then the queries whose code
    # paths CHANGED this round (vertex-restricted dedup_components
    # callers, staged winnowing hashes, lazy-checkpoint driver loops),
    # then the rotation of previously-verified queries. Nothing dropped.
    "cem_att_estimate", "sprt_sequential_test", "embedding_random_projection",
    "feature_hashing_vectors", "er_sorted_neighborhood", "psm_att_matched",
    "cluster_purity_report", "graph_modularity_report", "wer_pairs_report",
    "stratified_kfold_assign", "rouge_l_pairs_report", "chrf_pairs_report",
    "cohens_kappa_report", "multimodal_gif_decode",
    "ridge_regression_closed_form", "streaming_drift_monitor",
    "markov_next_event_eval", "brier_decomposition",
    "dtw_timeseries_similarity", "harmonic_centrality",
    "matrix_profile_daily", "pelt_changepoints",
    "markov_attribution_removal", "multimodal_audio_hadamard",
    "ecod_outlier_scores", "lof_outlier_scores", "mcnemar_raters_test",
    "gains_lift_deciles", "model_ks_separation",
    "evt_pot_tail_report", "best_of_n_selection",
    "group_sequential_obf",
    "good_turing_unseen_mass", "capture_recapture_estimate",
    "heaps_law_fit",
    "multimodal_jpeg_decode", "multimodal_jpeg_phash_dedup",
    "dedup_downweight", "sql_collation_distinct",
    "readability_report", "code_prose_report", "bradley_terry_arena",
    "kcore_decomposition", "pivot_event_matrix", "transpose_lang_stats",
    "approx_topk_events", "pass_at_k_report", "gini_source_concentration",
    "dpo_pair_builder",
    "winnowing_fingerprints", "dedup_keep_best",
    "knn_graph_components", "dedup_minhash_canonical", "dedup_groups",
    # lazy-checkpoint loops changed this round — keep in the head-50
    "pagerank_converged", "kmeans_converged",
    "semdedup", "dedup_threshold_sweep", "curate_corpus",
    "multimodal_phash_dedup",
    "multimodal_video_decode", "tfidf_cosine_pairs", "surrogate_keys_dense",
    "bm25_retrieval", "ndcg_eval", "pca_power_iteration", "dataset_card",
    "mmr_rerank", "source_ablation_report", "grid_radius_join",
    "join_dynamic_partition_pruning", "item_item_recs", "attribution_models",
    "market_share", "waiting_suppliers", "feature_quantile_bins_exact",
    "log_parse_roundtrip", "streaming_windowed_distinct",
    "sql_recursive_reachability", "source_python_stream",
    "sink_python_datasource", "multimodal_phash_dedup", "expectations_check",
    "varint_delta_report", "cusum_changepoint", "assoc_rules",
    "kmv_intersection", "bootstrap_ci", "incremental_join_merge",
    "temporal_reachability", "training_matrix_pit",
    "join_runtime_bloom_filter", "streaming_kmin_sketch", "tpch_q6",
    "local_supplier_volume", "join_interval_bucketed",
    "join_bucketed_colocated", "join_salted_skew", "streaming_enrich",
    "scd2_from_changelog", "snapshot_diff", "drift_ks", "interval_coverage",
    "funnel_asof_chain", "table_checksum", "calibration_report",
    "k_anonymity_report", "pseudonymize_consistent", "sessionize_batch",
    "gap_fill_locf", "pack_sequences", "udtf_token_stats", "agg_udaf_median",
    "kmeans_step", "quality_model_score", "multimodal_image_decode",
    "multimodal_audio_decode", "ewma_smoothing", "ab_test_report",
    "cohort_retention", "forecast_backtest", "streaming_cms_cells",
    "window_session_dynamic_builtin", "multimodal_image_resize_decoded",
    "source_python_backfill", "dedup_minhash_pairs_capped", "text_normalize",
    "window_session_builtin", "agg_minmax_by", "agg_stats", "returned_items",
    "promo_revenue", "join_range_bands", "explode_tokens", "text_pii_scrub",
    "multimodal_frame_sample", "sink_parquet_partitioned",
    "window_running_total", "window_lead_lag", "multimodal_resize",
    "json_parse_corrupt", "grouping_sets_sql", "late_shipments",
    "large_volume_orders", "disjunctive_part_revenue",
    "orders_above_customer_avg", "window_ntile", "brand_supplier_counts",
    "vector_norms", "text_doc_frequency", "json_props_extract",
    "dedup_fuzzy_levenshtein", "agg_by_day", "join_outer_full",
    "unpivot_metrics", "split_train_test", "anomaly_zscore", "agg_mode",
    "embedding_centroids", "sink_csv_roundtrip", "sink_json_roundtrip",
    "agg_percentiles_approx", "multimodal_audio_chunks", "volume_shipping",
    "window_range_frame", "window_first_last", "text_extract_words",
    "compact_latest_state", "streaming_ingest_pipeline", "agg_collect_types",
    "monthly_revenue_growth", "window_sliding", "dormant_rich_customers",
    "user_event_timeline", "agg_correlation", "streaming_sliding",
    "sink_sorted_parquet", "funnel_counts", "order_priority_counts",
    "customer_order_distribution", "small_quantity_revenue",
    "priority_line_counts", "histogram_doc_lengths", "skew_profile",
    "rolling_active_users", "product_profit", "top_supplier_revenue",
    "sample_stratified", "chunk_documents", "ngram_top_k",
    "source_mixture_weights", "reservoir_per_key", "min_cost_supplier",
    "important_stock", "supplier_part_counts", "excess_inventory_suppliers",
    "text_repetition", "text_char_entropy", "vocab_coverage",
    "apply_mixture_weights", "quality_gate_report", "text_rolling_fingerprint",
    "set_except_all", "props_map_census", "top_k_per_group_agg",
    "json_variant_extract", "text_search_boolean", "embedding_quantize_int8",
    "text_lang_id_ngram", "ann_quantized", "boilerplate_ngram_flags",
    "hard_negative_mining", "profile_columns", "sink_orc_roundtrip",
    "ann_recall_report", "multimodal_binary_ingest", "sink_zorder_parquet",
    "incremental_agg_merge", "agg_hll_mergeable", "text_unigram_logprob",
    "bpe_pair_counts", "corpus_shuffle_shards", "tfidf_top_terms",
    "source_quality_report", "sample_weighted", "source_overlap_matrix",
    "dedup_containment", "multimodal_dedup", "schema_evolution_read",
    "sink_partition_overwrite", "sink_compact_small_files",
    "gap_fill_interpolate", "pareto_frontier", "streaming_bloom_bits",
    "anomaly_mad", "source_mixture_temperature", "join_shuffle_hash_hint",
    "drift_report", "bpe_encoded_vocab", "bigram_logprob",
    "minhash_estimate_report", "agg_boxplot", "obs_metrics",
    "html_extract_text", "phrase_search", "chi2_independence", "trend_lines",
    "acf_daily", "shortest_path_bounded", "l_diversity_report",
    "window_percent_rank", "pmi_collocations", "streaming_obs_metrics",
    "sequence_motifs", "streaming_ab_counts", "target_encode_loo",
    "funnel_negative", "gdpr_erasure_audit", "pipeline_from_spec",
    "backfill_stale_partitions", "late_arrival_histogram",
    "rolling_correlation", "rfm_segments", "kcore_bounded",
    "token_budget_allocation", "mutual_information", "benford_audit",
    "sql_parameterized", "quality_model_contributions", "bitmap_membership",
    "join_asof_nearest", "sequence_pattern_regex",
    "conversion_latency_histogram", "quarantine_split",
    "streaming_quarantine_counts", "tiered_billing_report", "uptime_report",
    "stock_ledger_dips", "cycle_time_report", "trimmed_mean_report",
    "weekday_seasonality_report", "abandoned_carts", "diversity_index_report",
    "price_elasticity_report", "text_readability",
    "degree_distribution_report", "rolling_median", "cohort_conversion_report",
    "partition_gini_report", "multimodal_audio_fingerprint", "sql_pipe_syntax",
    "sql_udf_scalar", "sql_udf_table", "sql_session_variables",
    "streaming_state_inspect", "mann_whitney_utest", "anova_oneway",
    "wilson_ci_report", "link_prediction_adamic_adar", "personalized_pagerank",
    "zipf_fit_report", "ttr_hapax_report", "term_burstiness",
    "paragraph_dedup_scrub", "multimodal_bmp_decode",
    "multimodal_image_histogram", "multimodal_audio_pitch",
    "holt_winters_seasonal", "bleu_pairs_report", "experiment_readout",
    "multimodal_keyframe_select", "dbscan_grid_clusters",
    "decay_weighted_activity", "skipgram_negative_table", "model_eval_auc",
    "multimodal_png_decode", "gopher_repetition_rules", "c4_quality_filters",
    "curriculum_shards", "ccnet_perplexity_buckets", "ann_ivfpq",
    "multimodal_scene_cuts", "tokenizer_fertility_report",
    "dedup_substring_scrub", "streaming_near_dedup", "doremi_reweight_step",
    "matryoshka_recall", "lang_id_confusion", "kcenter_init",
    "multimodal_audio_vad", "source_token_kl", "timeseries_topk_similar",
    "kmeans_converged", "bpe_train_merges", "window_session_dynamic",
    "nested_orders_roundtrip", "quantile_normalize", "knn_graph",
    "ngram_novelty_curve", "theil_sen_trend", "quantiles_merged_histograms",
    "split_semantic_leakage", "randomized_response_audit",
    "markov_transition_matrix", "als_implicit_step", "keyword_textrank",
    "twap_report", "rank_fusion_rrf", "link_prediction_jaccard",
    "conformal_coverage_report", "pr_curve_points", "kaplan_meier_survival",
    "t_closeness_report", "fdr_bh_correction", "cuped_adjustment",
    "join_lateral_topk", "holt_linear_smoothing", "mann_kendall_trend",
    "functional_dependency_audit", "referential_integrity_audit",
    "embedding_drift_report", "streaming_topk_windowed",
    "isotonic_calibration", "logrank_test", "jackknife_ratio_ci",
    "spearman_daily", "mrr_recall_eval", "welch_ttest", "kendall_tau_daily",
    "seasonal_decompose", "shapley_attribution", "srm_check",
    "power_mde_report", "hyperball_neighborhood", "seasonal_anomaly_flags",
    "pacf_daily", "kneser_ney_logprob", "ipw_treatment_effect", "did_estimate",
    "ucb_arm_ranking", "join_asof_forward", "window_cume_dist",
    "blocking_recall_report", "records_pipeline", "scan_stream",
    "filter_conjunction", "filter_time_range_clamped", "deagg_explode",
    "deagg_passthrough_quirk", "json_parse", "sink_json", "training_batches",
    "rag_retrieval", "dedup_containment_best", "dedup_substring_spans",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "corpus_decontaminate", "split_group_aware",
    "dsir_select", "streaming_windowed_counts", "streaming_sessionize_native",
    "streaming_sessionize", "streaming_attribution",
    "streaming_attribution_outer", "streaming_attribution_full",
    "streaming_attribution_semi", "streaming_attribution_right",
    "streaming_resume_exactly_once", "streaming_dedup",
    "streaming_asof_enrich", "streaming_upsert_compact",
    "streaming_records_pipeline", "ann_bruteforce", "ann_lsh", "ann_ivf",
    "ann_pq", "feature_quantile_bins", "pagerank_step", "pagerank_converged",
    "heavy_hitters_cms", "bloom_semi_filter", "graph_triangles",
    "graph_label_propagation", "ann_ivf_incremental", "join_asof_tolerance",
    "shipping_priority", "text_quality", "filter_contact_id",
    "filter_agent_id", "filter_server_name", "filter_tenant_id",
    "filter_agent_shift_id", "filter_nan_param", "filter_time_range",
    "agg_count_by_key", "agg_pricing_summary", "join_enrich",
    "join_filter_pushdown", "window_rank", "top_k_customers", "set_except",
    "join_semi", "set_union", "sql_text_api", "set_intersect", "sort_limit",
    "distinct_count", "rollup_counts", "window_tumbling", "text_token_count",
    "text_lang_id", "text_fingerprint", "agg_count_by_key_salted",
    "agg_approx_distinct", "join_asof", "cube_counts", "pivot_counts",
    "agg_percentiles", "multimodal_features", "cluster_silhouette",
]


def _ordered() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update((k, v) for k, v in QUERIES.items() if k not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered()


def oracle_sql() -> dict[str, str]:
    return {n: ORACLES[n] for n in _ordered() if n in ORACLES}


# ---------------------------------------------------------------------------
# TPC-H Q4/Q16/Q18/Q19 shapes + correlated-subquery decorrelation:
# the EXISTS / HAVING-subquery / disjunctive-predicate / distinct-agg
# join surface (operators/relational.py).
# ---------------------------------------------------------------------------
@register(
    "late_shipments",
    """
SELECT o_orderpriority, COUNT(*) AS n_late
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
""",
)
def late_shipments_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.late_shipment_priorities(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@register(
    "large_volume_orders",
    """
WITH big AS (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 4) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 150
)
SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
FROM orders JOIN big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def large_volume_orders_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.large_volume_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register(
    "disjunctive_part_revenue",
    """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def disjunctive_part_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.disjunctive_part_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "orders_above_customer_avg",
    # correlated scalar subquery form — the engine runs the decorrelated
    # window plan; identical semantics (mean over the correlation key).
    # Emits the exact decimal sum + count, not the quotient: a mean can
    # land on an exact 4-dp tie where half-up vs half-even rounding
    # legitimately differs between engines.
    """
SELECT o_orderkey, o_custkey, o_totalprice,
       ROUND((SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              FROM orders o2 WHERE o2.o_custkey = o1.o_custkey), 2) AS cust_sum,
       (SELECT COUNT(*) FROM orders o2
        WHERE o2.o_custkey = o1.o_custkey) AS n_orders
FROM orders o1
WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                   / COUNT(*) FROM orders o2
                            WHERE o2.o_custkey = o1.o_custkey)
""",
)
def orders_above_customer_avg_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.orders_above_customer_avg(load_table(spark, sf_dir, "orders"))


@register(
    "window_ntile",
    """
SELECT event_id, event_type,
       ntile(4)        OVER w AS quartile,
       ROUND(percent_rank() OVER w, 4) AS pct_rank,
       ROUND(cume_dist()    OVER w, 4) AS cume_dist
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
""",
)
def window_ntile_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.window_ntile_stats(load_events(spark, sf_dir))


@register(
    "brand_supplier_counts",
    """
SELECT p_brand, COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
GROUP BY p_brand
""",
)
def brand_supplier_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.brand_supplier_counts(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


# ---------------------------------------------------------------------------
# Higher-order array functions over the embedding column (similarity.py)
# ---------------------------------------------------------------------------
@register(
    "vector_norms",
    """
SELECT vec_id,
       len(embedding) AS dim,
       ROUND(sqrt(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS l2_norm,
       ROUND(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE)), 'sum'), 4) AS el_sum,
       ROUND(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE)), 'max'), 4) AS el_max
FROM embeddings
""",
)
def vector_norms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.vector_norms(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Corpus document frequency (text.py) — first pass of tf-idf / vocab build
# ---------------------------------------------------------------------------
@register(
    "text_doc_frequency",
    """
WITH toks AS (
  SELECT unnest(list_distinct(string_split(
           regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' '))) AS tok
  FROM documents
)
SELECT tok, COUNT(*) AS df
FROM toks WHERE tok <> ''
GROUP BY tok ORDER BY df DESC, tok LIMIT 20
""",
)
def text_doc_frequency_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.doc_frequency(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Typed extraction from the semi-structured props column (ingest.py)
# ---------------------------------------------------------------------------
@register(
    "json_props_extract",
    """
SELECT event_type,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
)
def json_props_extract_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ingest import parse_props

    return (
        parse_props(load_events(spark, sf_dir))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("prop_k"), 4).alias("avg_k"),
            F.count("*").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Edit-distance fuzzy dedup (operators/dedup.py) — char-level near-dups
# the token-set family misses
# ---------------------------------------------------------------------------
@register(
    "dedup_fuzzy_levenshtein",
    """
WITH p AS (
  SELECT doc_id, lang, source, substr(text, 1, 64) AS prefix FROM documents
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       levenshtein(a.prefix, b.prefix) AS edit_dist
FROM p a JOIN p b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= 10
""",
)
def dedup_fuzzy_levenshtein_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.fuzzy_levenshtein_pairs(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Calendar rollup — the date/time scalar-function surface
# ---------------------------------------------------------------------------
@register(
    "agg_by_day",
    # DuckDB dayofweek: 0=Sunday; Spark dayofweek: 1=Sunday — align +1
    """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(dayofweek(ts) + 1 AS INT) AS dow,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def agg_by_day_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.agg_by_day(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Stream-static dimension enrichment (streaming/jobs.py) — broadcast per
# micro-batch, no state store
# ---------------------------------------------------------------------------
@register(
    "streaming_enrich",
    """
SELECT event_id, user_id, c_mktsegment
FROM events JOIN customer ON user_id = c_custkey
""",
)
def streaming_enrich_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    enriched = jobs.static_enrich(stream, load_table(spark, sf_dir, "customer"))
    return jobs.run_available_now(enriched, "streaming_enrich")


# ---------------------------------------------------------------------------
# FULL OUTER join, UNPIVOT, and deterministic corpus splitting
# (operators/relational.py)
# ---------------------------------------------------------------------------
@register(
    "join_outer_full",
    """
WITH activity AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id)
SELECT COALESCE(user_id, c_custkey) AS uid,
       COALESCE(n_events, 0) AS n_events,
       c_acctbal IS NOT NULL AS is_customer
FROM activity FULL OUTER JOIN customer ON user_id = c_custkey
""",
)
def join_outer_full_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.user_activity_vs_customers(
        load_events(spark, sf_dir), load_table(spark, sf_dir, "customer")
    )


@register(
    "unpivot_metrics",
    # avg_disc is exact-decimal sum / count on both engines: double AVG
    # is summation-order-dependent at a 4-dp rounding boundary
    """
WITH wide AS (
  SELECT l_returnflag,
         ROUND(SUM(l_quantity), 4) AS sum_qty,
         ROUND(SUM(l_extendedprice), 4) AS sum_price,
         ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*), 4) AS avg_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS metric_value FROM wide
UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM wide
UNION ALL SELECT l_returnflag, 'avg_disc', avg_disc FROM wide
""",
)
def unpivot_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.unpivot_pricing(load_table(spark, sf_dir, "lineitem"))


@register(
    "split_train_test",
    """
SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
            THEN 'test' ELSE 'train' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
""",
)
def split_train_test_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.split_train_test(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Feature-normalization outliers, grouped mode, and centroid training
# kernels (operators/relational.py, similarity.py)
# ---------------------------------------------------------------------------
@register(
    "anomaly_zscore",
    """
WITH stats AS (
  SELECT event_type, AVG(value) AS mu, stddev_samp(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, ROUND((value - mu) / sigma, 4) AS zscore
FROM events e JOIN stats s ON e.event_type = s.event_type
ORDER BY abs((value - mu) / sigma) DESC, event_id
LIMIT 100
""",
)
def anomaly_zscore_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.anomaly_zscore(load_events(spark, sf_dir))


@register(
    "agg_mode",
    """
SELECT event_type, user_id FROM (
  SELECT event_type, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY COUNT(*) DESC, user_id) AS rn
  FROM events GROUP BY event_type, user_id
) WHERE rn = 1
""",
)
def agg_mode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.agg_mode_user(load_events(spark, sf_dir))


@register(
    "embedding_centroids",
    # DuckDB lacks WITH ORDINALITY / lateral posexplode — index the
    # array with a constant-bound generate_series instead (dim = 64)
    """
SELECT label, CAST(i AS INT) AS pos,
       ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 4) AS centroid_val
FROM embeddings, generate_series(1, 64) t(i)
GROUP BY label, i
""",
)
def embedding_centroids_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.label_centroids(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Multi-format source/sink round trips (the reference has NO file
# formats at all, SURVEY.md §2.1 — parquet/csv/json come free with
# spark.read/write; each is oracle-checked as a write->read identity)
# ---------------------------------------------------------------------------
def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    return f"/tmp/ksr_sink/{sf_dir.strip('/').replace('/', '_')}_events_{fmt}"


@register(
    "sink_csv_roundtrip",
    """
SELECT event_id, user_id, event_type, value FROM events
""",
)
def sink_csv_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink/source round trip with an explicit read schema (no
    inference pass — schema-on-read is declared, so the read is a
    single distributed scan; headerless files keep the format
    position-stable)."""
    out_dir = _roundtrip_dir(sf_dir, "csv")
    events = load_events(spark, sf_dir).select("event_id", "user_id", "event_type", "value")
    events.write.mode("overwrite").csv(out_dir)
    return spark.read.schema(
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
    ).csv(out_dir)


@register(
    "sink_json_roundtrip",
    """
SELECT event_id, user_id, event_type FROM events
""",
)
def sink_json_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink/source round trip with declared schema — the
    interchange format of the reference's own sink (responses/index.js)
    as a distributed file source instead of one HTTP body."""
    out_dir = _roundtrip_dir(sf_dir, "json")
    events = load_events(spark, sf_dir).select("event_id", "user_id", "event_type")
    events.write.mode("overwrite").json(out_dir)
    return spark.read.schema("event_id BIGINT, user_id BIGINT, event_type STRING").json(
        out_dir
    )


@register(
    "agg_percentiles_approx",
    # percentile_approx's GK sketch stores every value while the group
    # fits in `accuracy` (1e4 >= the ~2k-row oracle-scale groups), so
    # the estimates ARE the exact order statistics there and
    # quantile_disc is an exact twin; at 100 TB the same plan degrades
    # to bounded rank error instead of a per-group sort.
    """
SELECT event_type,
       ROUND(quantile_disc(value, 0.5), 4) AS p50,
       ROUND(quantile_disc(value, 0.95), 4) AS p95
FROM events GROUP BY event_type
""",
)
def agg_percentiles_approx_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.approx_percentiles(load_events(spark, sf_dir))


@register(
    "multimodal_audio_chunks",
    # DuckDB lacks WITH ORDINALITY — a bounded generate_series with an
    # n_chunks guard stands in for posexplode(sequence(...))
    """
WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents),
     c AS (SELECT doc_id, n_bytes,
                  CAST(ceil(n_bytes / 256.0) AS INT) AS n_chunks FROM m)
SELECT doc_id, 'audio' AS kind, CAST(i - 1 AS INT) AS chunk_idx,
       CAST((i - 1) * 256 AS BIGINT) AS "offset",
       CAST(least(256, n_bytes - (i - 1) * 256) AS INT) AS chunk_len
FROM c, generate_series(1, 100000) t(i)
WHERE i <= n_chunks
""",
)
def multimodal_audio_chunks_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    media = multimodal.documents_as_media(
        load_table(spark, sf_dir, "documents"), kind="audio"
    )
    return multimodal.audio_chunks(media)


@register(
    "volume_shipping",
    """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
) GROUP BY 1, 2, 3
""",
)
def volume_shipping_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.volume_shipping(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "window_range_frame",
    """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4)
         AS trailing_1h
FROM events
""",
)
def window_range_frame_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.window_trailing_1h(load_events(spark, sf_dir))


@register(
    "window_first_last",
    """
SELECT event_id, user_id,
       first_value(value) OVER w AS first_val,
       last_value(value)  OVER w AS last_val,
       nth_value(value, 2) OVER w AS second_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def window_first_last_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.window_first_last(load_events(spark, sf_dir))


@register(
    "text_extract_words",
    """
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z]{5,}')) AS BIGINT)
         AS n_long_words,
       CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z]{5,}'))) AS BIGINT)
         AS n_distinct_long_words
FROM documents
""",
)
def text_extract_words_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.extract_long_words(load_table(spark, sf_dir, "documents"))


@register(
    "compact_latest_state",
    """
SELECT user_id, event_type, event_id AS latest_event_id, value AS latest_value
FROM (
  SELECT user_id, event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def compact_latest_state_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.compact_latest_state(load_events(spark, sf_dir))


@register(
    "streaming_ingest_pipeline",
    # the doubled stream simulates at-least-once delivery; dedup must
    # collapse it back to the exact table before enrichment
    """
SELECT event_id, user_id, c_mktsegment
FROM events JOIN customer ON user_id = c_custkey
""",
)
def streaming_ingest_pipeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    doubled = stream.union(stream)
    out = jobs.ingest_pipeline(doubled, load_table(spark, sf_dir, "customer"))
    return jobs.run_available_now(out, "streaming_ingest_pipeline")


@register(
    "agg_collect_types",
    """
SELECT user_id,
       list_sort(list_distinct(array_agg(event_type))) AS types,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
""",
)
def agg_collect_types_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.agg_collect_types(load_events(spark, sf_dir))


@register(
    "monthly_revenue_growth",
    """
WITH monthly AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
         ROUND(SUM(o_totalprice), 4) AS revenue
  FROM orders GROUP BY 1
)
SELECT month, revenue,
       ROUND(100.0 * (revenue - lag(revenue) OVER (ORDER BY month))
             / lag(revenue) OVER (ORDER BY month), 4) AS mom_pct
FROM monthly
""",
)
def monthly_revenue_growth_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.monthly_revenue_growth(load_table(spark, sf_dir, "orders"))


@register(
    "window_sliding",
    # each event covers 2 windows (width 2h / slide 1h): the oracle
    # expands per-event coverage with an explicit 2-row offset join
    """
SELECT strftime(date_trunc('hour', ts) - INTERVAL (o.off) HOUR,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events
FROM events, (SELECT 0 AS off UNION ALL SELECT 1) o
GROUP BY 1, 2
""",
)
def window_sliding_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.window_sliding_counts(load_events(spark, sf_dir))


@register(
    "dormant_rich_customers",
    # TPC-H Q22 shape; the global-average threshold is exact-decimal
    # sum / count on both engines (see orders_above_customer_avg)
    """
SELECT c_mktsegment, COUNT(*) AS n_custs, ROUND(SUM(c_acctbal), 4) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                          / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY c_mktsegment
""",
)
def dormant_rich_customers_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.dormant_rich_customers(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register(
    "user_event_timeline",
    """
WITH ranked AS (
  SELECT user_id, epoch_us(ts) AS us, event_type, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id,
       string_agg(us || ':' || event_type, ',' ORDER BY rn) AS timeline
FROM ranked WHERE rn <= 5 GROUP BY user_id
""",
)
def user_event_timeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.user_event_timeline(load_events(spark, sf_dir))


@register(
    "agg_correlation",
    """
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_correlation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.agg_correlation(load_table(spark, sf_dir, "lineitem"))


@register(
    "streaming_sliding",
    # streaming twin of window_sliding: overlapping windows with
    # watermark-bounded state, checked against the batch expansion
    """
SELECT strftime(date_trunc('hour', ts) - INTERVAL (o.off) HOUR,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n_events
FROM events, (SELECT 0 AS off UNION ALL SELECT 1) o
GROUP BY 1, 2
""",
)
def streaming_sliding_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    return jobs.run_available_now(
        jobs.windowed_counts(stream, window="2 hours", slide="1 hour"),
        "streaming_sliding",
    )


@register(
    "sink_sorted_parquet",
    # ts emitted as epoch micros: raw timestamp columns hash-differ on
    # physical unit (nanos parquet vs micros Spark write)
    """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events
""",
)
def sink_sorted_parquet_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned, time-sorted parquet layout: repartitionByRange
    on ts + sortWithinPartitions before the write gives every output
    file a DISJOINT time range and monotone pages — so a time-predicate
    scan prunes whole files via parquet min/max stats instead of
    reading everything (tests/test_plans.py asserts the disjointness).
    This is the write-side lever that makes filter_time_range at 100 TB
    an O(matching files) scan."""
    out_dir = _roundtrip_dir(sf_dir, "sorted")
    events = load_events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    (
        events.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return spark.read.parquet(out_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )


@register(
    "funnel_counts",
    """
WITH c AS (SELECT user_id, MIN(ts) AS ct FROM events
           WHERE event_type = 'click' GROUP BY user_id),
     v AS (SELECT e.user_id, MIN(ts) AS vt FROM events e JOIN c ON e.user_id = c.user_id
           WHERE event_type = 'view' AND ts > ct AND ts <= ct + INTERVAL 24 HOUR
           GROUP BY e.user_id),
     p AS (SELECT e.user_id, MIN(ts) AS pt FROM events e JOIN v ON e.user_id = v.user_id
           WHERE event_type = 'purchase' AND ts > vt AND ts <= vt + INTERVAL 24 HOUR
           GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM c) AS n_click,
       (SELECT COUNT(*) FROM v) AS n_click_view,
       (SELECT COUNT(*) FROM p) AS n_click_view_purchase
""",
)
def funnel_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.funnel_counts(load_events(spark, sf_dir))


@register(
    "order_priority_counts",
    """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def order_priority_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.order_priority_counts(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@register(
    "market_share",
    """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,4)) END)
                  / SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
) t
GROUP BY o_year
ORDER BY o_year
""",
)
def market_share_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.market_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "customer_order_distribution",
    """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def customer_order_distribution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.customer_order_distribution(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register(
    "small_quantity_revenue",
    """
SELECT ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS DOUBLE), 4) AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
""",
)
def small_quantity_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.small_quantity_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "priority_line_counts",
    """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE EXTRACT(year FROM l_shipdate) = 1997
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def priority_line_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.priority_line_counts(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@register(
    "sessionize_batch",
    """
WITH flagged AS (
  SELECT user_id, ts, 
         CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       MAX(n_events) AS max_session_events,
       CAST(SUM(n_events) AS BIGINT) AS total_events
FROM per_session GROUP BY user_id ORDER BY user_id
""",
)
def sessionize_batch_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.sessionize_batch(load_events(spark, sf_dir))


@register(
    "histogram_doc_lengths",
    """
SELECT CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS bucket_lo,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY bucket_lo
ORDER BY bucket_lo
""",
)
def histogram_doc_lengths_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import histogram_doc_lengths

    return histogram_doc_lengths(load_table(spark, sf_dir, "documents"))


_DECON_GRAMS = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(" + _TOKS + ") - 4, 0)), "
    "i -> array_to_string((" + _TOKS + ")[i:i+4], ' ')))"
)


@register(
    "corpus_decontaminate",
    f"""
WITH g AS (
  SELECT doc_id, source, unnest({_DECON_GRAMS}) AS gram FROM documents
), bench AS (
  SELECT DISTINCT gram FROM g WHERE source = 'src0'
), bad AS (
  SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram) WHERE g.source <> 'src0'
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM bad) THEN 0 ELSE 1 END)
            AS BIGINT) AS n_kept
FROM documents WHERE source <> 'src0'
GROUP BY source ORDER BY source
""",
)
def corpus_decontaminate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.decontaminate(load_table(spark, sf_dir, "documents"))


@register(
    "pack_sequences",
    f"""
WITH sized AS (
  SELECT source, doc_id, len({_TOKS}) AS n_toks,
         CAST(FLOOR((SUM(len({_TOKS})) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - len({_TOKS})) / 512.0) AS BIGINT)
           AS bin_id
  FROM documents
)
SELECT source, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens
FROM sized GROUP BY source, bin_id ORDER BY source, bin_id
""",
)
def pack_sequences_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"))


@register(
    "skew_profile",
    """
SELECT user_id, n_events,
       ROUND(n_events / CAST(total AS DOUBLE), 6) AS share
FROM (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         SUM(COUNT(*)) OVER () AS total
  FROM events GROUP BY user_id
) t
ORDER BY n_events DESC, user_id
LIMIT 10
""",
)
def skew_profile_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.skew_profile(load_events(spark, sf_dir))


@register(
    "rolling_active_users",
    """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du)
SELECT strftime(d.day, '%Y-%m-%d') AS day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_users
FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY 1 ORDER BY 1
""",
)
def rolling_active_users_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.rolling_active_users(load_events(spark, sf_dir))


@register(
    "product_profit",
    """
SELECT nation, o_year, ROUND(CAST(SUM(amount) AS DOUBLE), 4) AS profit
FROM (
  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount)
              - p_retailprice * l_quantity AS DECIMAL(18,4)) AS amount
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
) t
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def product_profit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.product_profit(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "top_supplier_revenue",
    """
WITH revenue AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       ROUND(CAST(total_revenue AS DOUBLE), 4) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def top_supplier_revenue_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.top_supplier_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


@register(
    "sample_stratified",
    """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) AS BIGINT)
      < CASE lang WHEN 'en' THEN 16384 WHEN 'zh' THEN 32768 ELSE 65536 END
ORDER BY doc_id
""",
)
def sample_stratified_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.sample_stratified(load_table(spark, sf_dir, "documents"))


@register(
    "chunk_documents",
    r"""
WITH toks AS (
  SELECT doc_id, str_split_regex(trim(text), '\s+') AS t FROM documents
)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       CAST(len(t[i * 48 + 1 : least((i * 48) + 64, len(t))]) AS INT) AS n_tokens,
       array_to_string(t[i * 48 + 1 : least((i * 48) + 64, len(t))], ' ') AS chunk_text
FROM toks, generate_series(0, 4096) AS g(i)
WHERE i <= CEIL(GREATEST(len(t) - 64, 0) / 48.0)
ORDER BY doc_id, chunk_id
""",
)
def chunk_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.chunk_documents(load_table(spark, sf_dir, "documents"))


@register(
    "ngram_top_k",
    r"""
WITH toks AS (
  SELECT lang, str_split_regex(trim(text), '\s+') AS t FROM documents
),
bigrams AS (
  SELECT lang, t[i] || ' ' || t[i + 1] AS bigram
  FROM toks, generate_series(1, 4096) AS g(i)
  WHERE i <= len(t) - 1
),
counts AS (
  SELECT lang, bigram, COUNT(*) AS n FROM bigrams GROUP BY 1, 2
)
SELECT lang, bigram, n, CAST(rank AS INT) AS rank FROM (
  SELECT lang, bigram, n,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rank
  FROM counts
)
WHERE rank <= 5
ORDER BY lang, rank
""",
)
def ngram_top_k_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.ngram_top_k(load_table(spark, sf_dir, "documents"))


@register(
    "waiting_suppliers",
    """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_last
  FROM lineitem GROUP BY 1, 2
),
annotated AS (
  SELECT l_orderkey, l_suppkey, supp_last,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supps,
         MAX(supp_last) OVER (PARTITION BY l_orderkey) AS order_last
  FROM per_supp
),
with_ties AS (
  SELECT *,
         SUM(CASE WHEN supp_last = order_last THEN 1 ELSE 0 END)
           OVER (PARTITION BY l_orderkey) AS n_at_max
  FROM annotated
)
SELECT s_suppkey, s_name, numwait FROM (
  SELECT l_suppkey, COUNT(*) AS numwait
  FROM with_ties
  WHERE n_supps > 1 AND supp_last = order_last AND n_at_max = 1
  GROUP BY 1
) c JOIN supplier ON l_suppkey = s_suppkey
ORDER BY numwait DESC, s_suppkey
LIMIT 10
""",
)
def waiting_suppliers_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.waiting_suppliers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


@register(
    "source_mixture_weights",
    """
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY 1
)
SELECT source, n_docs, total_chars,
       ROUND(share, 6) AS share,
       ROUND(LEAST(1.0, target / share), 6) AS weight
FROM (
  SELECT *,
         CAST(total_chars AS DOUBLE) / SUM(total_chars) OVER () AS share,
         1.0 / COUNT(*) OVER () AS target
  FROM per_source
)
ORDER BY source
""",
)
def source_mixture_weights_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.source_mixture_weights(load_table(spark, sf_dir, "documents"))


@register(
    "reservoir_per_key",
    """
SELECT source, CAST(pick AS INT) AS pick, doc_id, lang, n_chars FROM (
  SELECT source, doc_id, lang, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS pick
  FROM documents
)
WHERE pick <= 5
ORDER BY source, pick
""",
)
def reservoir_per_key_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.reservoir_per_key(load_table(spark, sf_dir, "documents"))


@register(
    "min_cost_supplier",
    """
WITH region_suppliers AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), wanted_parts AS (
  SELECT p_partkey, p_brand, p_type FROM part
  WHERE p_size = 15 AND p_type LIKE '%ANDARD'
), costs AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
  FROM lineitem
  JOIN wanted_parts ON l_partkey = p_partkey
  JOIN region_suppliers ON l_suppkey = s_suppkey
  GROUP BY p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
)
SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(supply_cost AS DOUBLE) AS supply_cost
FROM costs c
WHERE supply_cost = (SELECT MIN(c2.supply_cost) FROM costs c2
                     WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def min_cost_supplier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.min_cost_supplier(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "important_stock",
    """
WITH per_part AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS part_value
  FROM lineitem
  JOIN (SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3') ns
    ON l_suppkey = s_suppkey
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM per_part
WHERE part_value > (SELECT SUM(part_value) / COUNT(*) FROM per_part) * 2.0
ORDER BY part_value DESC, l_partkey
""",
)
def important_stock_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.important_stock(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "supplier_part_counts",
    """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#4'
  AND p_type NOT LIKE 'SMALL%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def supplier_part_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.supplier_part_counts(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
    )


@register(
    "excess_inventory_suppliers",
    """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'blue%' AND EXTRACT(year FROM l_shipdate) = 1997
  GROUP BY l_partkey, l_suppkey
), dominant AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l_suppkey, supp_qty,
           SUM(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
    FROM shipped
  ) t
  WHERE supp_qty > 0.5 * part_qty
)
SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
""",
)
def excess_inventory_suppliers_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.excess_inventory_suppliers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "text_repetition",
    """
WITH per_word AS (
  SELECT doc_id, tok, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents)
  GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       ROUND(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) / CAST(SUM(cnt) AS DOUBLE), 4)
         AS dup_mass_ratio,
       ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 4) AS top_token_share,
       ROUND(COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 4) AS distinct_ratio
FROM per_word
GROUP BY doc_id
""",
)
def text_repetition_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.text_repetition(load_table(spark, sf_dir, "documents"))


@register(
    "text_char_entropy",
    """
WITH per_char AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
  WHERE ch <> ''
  GROUP BY doc_id, ch
)
SELECT doc_id,
       ROUND(LOG2(SUM(cnt)) - SUM(cnt * LOG2(cnt)) / SUM(cnt), 4) AS char_entropy,
       CAST(SUM(cnt) AS BIGINT) AS n_chars_counted
FROM per_char
GROUP BY doc_id
""",
)
def text_char_entropy_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.text_char_entropy(load_table(spark, sf_dir, "documents"))


@register(
    "vocab_coverage",
    """
WITH counts AS (
  SELECT tok, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents)
  GROUP BY tok
), top AS (
  SELECT tok, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS INT) AS rank
  FROM counts ORDER BY cnt DESC, tok LIMIT 50
)
SELECT rank, tok, cnt,
       ROUND(share, 6) AS share,
       ROUND(SUM(share) OVER (ORDER BY rank
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_share
FROM (SELECT *, cnt / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM counts) AS share FROM top)
ORDER BY rank
""",
)
def vocab_coverage_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.vocab_coverage(load_table(spark, sf_dir, "documents"))


@register(
    "apply_mixture_weights",
    """
WITH per_source AS (
  SELECT source, SUM(n_chars) AS total_chars FROM documents GROUP BY source
), weights AS (
  SELECT source,
         LEAST(1.0, (1.0 / COUNT(*) OVER ())
               / (total_chars / CAST(SUM(total_chars) OVER () AS DOUBLE))) AS weight
  FROM per_source
)
SELECT doc_id, d.source, lang, n_chars
FROM documents d JOIN weights w ON d.source = w.source
WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) AS BIGINT)
      < FLOOR(weight * 65536)
ORDER BY doc_id
""",
)
def apply_mixture_weights_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.apply_mixture_weights(load_table(spark, sf_dir, "documents"))


@register(
    "quality_gate_report",
    f"""
WITH g AS (
  SELECT n_chars >= 100 AS pass_len,
         (len(list_filter({_TOKS}, t -> t IN ('the','a','of','and')))
            / CAST(len({_TOKS}) AS DOUBLE)) >= 0.01 AS pass_stopword,
         (len(regexp_extract_all(text, '[^\\w\\s]'))
            / CAST(length(text) AS DOUBLE)) <= 0.2 AS pass_punct,
         (length(text) / CAST(len({_TOKS}) AS DOUBLE)) BETWEEN 3.0 AND 12.0
           AS pass_token_len
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(pass_len AS BIGINT)) AS BIGINT) AS pass_len,
       CAST(SUM(CAST(pass_stopword AS BIGINT)) AS BIGINT) AS pass_stopword,
       CAST(SUM(CAST(pass_punct AS BIGINT)) AS BIGINT) AS pass_punct,
       CAST(SUM(CAST(pass_token_len AS BIGINT)) AS BIGINT) AS pass_token_len,
       CAST(SUM(CAST(pass_len AND pass_stopword AND pass_punct AND pass_token_len
                AS BIGINT)) AS BIGINT) AS pass_all,
       ROUND(SUM(CAST(pass_len AND pass_stopword AND pass_punct AND pass_token_len
                 AS BIGINT)) / CAST(COUNT(*) AS DOUBLE), 4) AS retention
FROM g
""",
)
def quality_gate_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.quality_gate_report(load_table(spark, sf_dir, "documents"))


@register(
    "text_rolling_fingerprint",
    r"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ''),
             c -> CAST(ascii(c) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 2147483647) AS rolling_hash
FROM documents
""",
)
def text_rolling_fingerprint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.rolling_hash_fingerprint(load_table(spark, sf_dir, "documents"))


@register(
    "set_except_all",
    """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS surplus FROM (
  SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1995
  EXCEPT ALL
  SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996
) GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def set_except_all_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.priority_mix_shift(load_table(spark, sf_dir, "orders"))


@register(
    "props_map_census",
    """
WITH kv AS (
  SELECT unnest(json_keys(props)) AS prop_key,
         CAST(json_extract(props, '$.' || unnest(json_keys(props))) AS BIGINT) AS v
  FROM events
)
SELECT prop_key, CAST(COUNT(*) AS BIGINT) AS n, MIN(v) AS vmin, MAX(v) AS vmax,
       CAST(SUM(v) AS BIGINT) AS vsum
FROM kv GROUP BY prop_key
ORDER BY prop_key
""",
)
def props_map_census_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.props_map_stats(load_events(spark, sf_dir))


@register(
    "gap_fill_locf",
    """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n_events, SUM(value) AS sum_value
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM spans
)
SELECT g.user_id, strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
       ROUND(LAST_VALUE(h.sum_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled_value
FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
ORDER BY g.user_id, hour
""",
)
def gap_fill_locf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.gap_fill_locf(load_events(spark, sf_dir))


@register(
    "top_k_per_group_agg",
    """
SELECT event_type, CAST(rnk AS INT) AS rank, user_id, n_events
FROM (
  SELECT event_type, user_id, n_events,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY n_events DESC, user_id DESC) AS rnk
  FROM (SELECT event_type, user_id, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2)
)
WHERE rnk <= 3
ORDER BY event_type, rank
""",
)
def top_k_per_group_agg_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.top_k_per_group_agg(load_events(spark, sf_dir))


@register(
    "join_bucketed_colocated",
    """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def join_bucketed_colocated_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.bucketed_order_revenue(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@register(
    "streaming_upsert_compact",
    # after the foreachBatch drain, the maintained snapshot must equal
    # the batch change-log compaction over all events
    """
SELECT user_id, event_type, event_id AS latest_event_id, value AS latest_value
FROM (
  SELECT user_id, event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def streaming_upsert_compact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    return jobs.upsert_compact_available_now(jobs.stream_events(spark, sf_dir))


@register(
    "udtf_token_stats",
    # UDTF surface (§2.11: the reference exposes no user-extensible
    # functions; Spark 4 Python UDTFs are the engine's 1->N extension
    # point). Lateral-joined over documents via the SQL front door.
    """
SELECT doc_id, tok, CAST(length(tok) AS INT) AS tok_len
FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents)
WHERE length(tok) >= 6
ORDER BY doc_id, tok
""",
)
def udtf_token_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok: string, tok_len: int")
    class LongTokens:
        """Yield each whitespace token of length >= 6 with its length.

        A Python UDTF is the row-to-rows user extension surface — the
        engine twin of the reference's perRecordParse hook
        (kinesisReader/index.js:120,160,172), but 1->N and lateral-
        joinable from SQL. Arrow-batched; for anything expressible in
        column algebra prefer explode()+filter (explode_tokens) — this
        exists to pin the extension API, and the oracle proves the
        Python path agrees with the declarative one."""

        def eval(self, text: str):
            for tok in (text or "").split():
                if len(tok) >= 6:
                    yield tok, len(tok)

    spark.udtf.register("long_tokens", LongTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok, t.tok_len
        FROM udtf_docs d, LATERAL long_tokens(d.text) t
        ORDER BY d.doc_id, t.tok
        """
    )


@register(
    "json_variant_extract",
    """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(k) AS BIGINT) AS n_k_present,
       CAST(0 AS BIGINT) AS n_missing_path,
       MIN(k) AS k_min, MAX(k) AS k_max, CAST(SUM(k) AS BIGINT) AS k_sum
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
ORDER BY event_type
""",
)
def json_variant_extract_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import ingest

    return ingest.props_variant_stats(load_events(spark, sf_dir))


@register(
    "text_search_boolean",
    f"""
SELECT doc_id, lang, source FROM documents
WHERE list_contains({_TOKS}, 'spark')
  AND list_contains({_TOKS}, 'join')
  AND NOT list_contains({_TOKS}, 'slow')
ORDER BY doc_id
""",
)
def text_search_boolean_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.text_search_boolean(load_table(spark, sf_dir, "documents"))


@register(
    "embedding_quantize_int8",
    """
SELECT vec_id,
       ROUND(scale, 6) AS scale,
       list_transform(x, v -> CAST(round(v * 127.0 / scale) AS TINYINT)) AS q,
       ROUND(list_max(list_transform(x,
             v -> abs(v - round(v * 127.0 / scale) * scale / 127.0))), 6)
         AS max_recon_err
FROM (
  SELECT vec_id, x,
         GREATEST(list_max(list_transform(x, v -> abs(v))), 1e-30) AS scale
  FROM (SELECT vec_id,
               list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
        FROM embeddings)
)
ORDER BY vec_id
""",
)
def embedding_quantize_int8_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.embedding_quantize_int8(load_table(spark, sf_dir, "embeddings"))


@register(
    "kmeans_step",
    """
WITH vecs AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
  FROM embeddings
), seeds AS (
  SELECT vec_id AS cid, x AS c FROM vecs ORDER BY vec_id LIMIT 8
), dists AS (
  SELECT v.vec_id, s.cid, v.x,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(list_zip(v.x, s.c),
                            p -> (p[1] - p[2]) * (p[1] - p[2]))),
           (a, b) -> a + b) AS d2
  FROM vecs v CROSS JOIN seeds s
), assign AS (
  SELECT cid AS cluster_id, x FROM (
    SELECT vec_id, cid, x,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM dists
  ) WHERE rn = 1
)
SELECT cluster_id, CAST(pos AS INT) AS pos,
       ROUND(AVG(val), 4) AS centroid_val,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM (SELECT cluster_id, unnest(x) AS val, generate_subscripts(x, 1) AS pos
      FROM assign)
GROUP BY cluster_id, pos
ORDER BY cluster_id, pos
""",
)
def kmeans_step_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.kmeans_step(load_table(spark, sf_dir, "embeddings"))


@register(
    "text_lang_id_ngram",
    """
SELECT doc_id, lang,
       best.lang AS lang_pred,
       best.score AS ngram_hits
FROM (
  SELECT doc_id, lang,
         list_max([{'score': CAST((length(lower(text)) - length(replace(lower(text), 'ei', ''))) / 2 + (length(lower(text)) - length(replace(lower(text), 'ch', ''))) / 2 + (length(lower(text)) - length(replace(lower(text), 'de', ''))) / 2 + (length(lower(text)) - length(replace(lower(text), 'un', ''))) / 2 AS BIGINT), 'ord': 0, 'lang': 'de'},
         {'score': CAST((length(lower(text)) - length(replace(lower(text), 'th', ''))) / 2 + (length(lower(text)) - length(replace(lower(text), 'he', ''))) / 2 + (length(lower(text)) - length(replace(lower(text), 'an', ''))) / 2 + (length(lower(text)) - length(replace(lower(text), 'nd', ''))) / 2 AS BIGINT), 'ord': -1, 'lang': 'en'},
         {'score': CAST((length(lower(text)) - length(replace(lower(text), 'de', ''))) / 2 + (length(lower(text)) - length(replace(lower(text), 'la', ''))) / 2 + (length(lower(text)) - length(replace(lower(text), 'os', ''))) / 2 + (length(lower(text)) - length(replace(lower(text), 'el', ''))) / 2 AS BIGINT), 'ord': -2, 'lang': 'es'},
         {'score': CAST((length(lower(text)) - length(replace(lower(text), 'le', ''))) / 2 + (length(lower(text)) - length(replace(lower(text), 'es', ''))) / 2 + (length(lower(text)) - length(replace(lower(text), 'en', ''))) / 2 + (length(lower(text)) - length(replace(lower(text), 're', ''))) / 2 AS BIGINT), 'ord': -3, 'lang': 'fr'},
         {'score': CAST((length(lower(text)) - length(replace(lower(text), '的', ''))) / 1 + (length(lower(text)) - length(replace(lower(text), '了', ''))) / 1 + (length(lower(text)) - length(replace(lower(text), '是', ''))) / 1 + (length(lower(text)) - length(replace(lower(text), '我', ''))) / 1 AS BIGINT), 'ord': -4, 'lang': 'zh'}]) AS best
  FROM documents
)
""",
)
def text_lang_id_ngram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.text_lang_id_ngram(load_table(spark, sf_dir, "documents"))


@register(
    "split_group_aware",
    f"""
WITH RECURSIVE g AS (
  SELECT doc_id, {_GRAMS} AS grams FROM documents
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
), edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id AS u, a_id AS v FROM pairs
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT d.doc_id,
         LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS component_id
  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
  GROUP BY d.doc_id
)
SELECT d.doc_id, d.lang, d.source, c.component_id,
       CASE WHEN CAST(CAST('0x' || substr(md5(CAST(c.component_id AS VARCHAR)), 1, 4)
                 AS INTEGER) AS BIGINT) < {int(0.2 * 65536)}
            THEN 'test' ELSE 'train' END AS split
FROM documents d JOIN comp c ON d.doc_id = c.doc_id
ORDER BY d.doc_id
""",
)
def split_group_aware_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    documents = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(documents, threshold=0.8)
    return dedup.split_group_aware(documents, pairs)


@register(
    "ann_quantized",
    """
WITH store AS (
  SELECT vec_id, x,
         list_transform(x, v -> round(v * 127.0 / scale) * scale / 127.0) AS dq
  FROM (
    SELECT vec_id, x,
           GREATEST(list_max(list_transform(x, v -> abs(v))), 1e-30) AS scale
    FROM (SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
          FROM embeddings)
  )
)
SELECT b.vec_id,
       ROUND(list_cosine_similarity(b.dq, q.x), 3) AS cos_sim
FROM store b, (SELECT x FROM store WHERE vec_id = 0) q
WHERE b.vec_id <> 0
ORDER BY cos_sim DESC, b.vec_id
LIMIT 10
""",
)
def ann_quantized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.ann_quantized(load_table(spark, sf_dir, "embeddings"))


@register(
    "boilerplate_ngram_flags",
    f"""
WITH g AS (
  SELECT doc_id, unnest({_GRAMS}) AS gram FROM documents
), df AS (
  SELECT gram, COUNT(*) AS df FROM g GROUP BY gram
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
per_doc AS (
  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN df.df >= 0.02 * n.n_docs THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boiler
  FROM g JOIN df USING (gram), n
  GROUP BY g.doc_id
)
SELECT doc_id, n_grams, n_boiler,
       ROUND(n_boiler / CAST(n_grams AS DOUBLE), 4) AS boiler_frac,
       n_boiler >= 0.5 * n_grams AS is_boilerplate
FROM per_doc ORDER BY doc_id
""",
)
def boilerplate_ngram_flags_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.boilerplate_ngram_flags(load_table(spark, sf_dir, "documents"))


@register(
    "hard_negative_mining",
    """
SELECT query_id, query_label, vec_id AS neg_id, ROUND(sim, 3) AS cos_sim
FROM (
  SELECT q.vec_id AS query_id, q.label AS query_label, b.vec_id,
         ROUND(list_cosine_similarity(b.embedding::DOUBLE[],
                                      q.embedding::DOUBLE[]), 6) AS sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY ROUND(list_cosine_similarity(b.embedding::DOUBLE[],
                                                 q.embedding::DOUBLE[]), 6) DESC,
                    b.vec_id
         ) AS rn
  FROM embeddings b
  JOIN (SELECT * FROM embeddings WHERE vec_id < 16) q
    ON b.label <> q.label
)
WHERE rn = 1
ORDER BY query_id
""",
)
def hard_negative_mining_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.hard_negative_mining(load_table(spark, sf_dir, "embeddings"))


@register(
    "profile_columns",
    """
WITH one AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_id_nulls,
         COUNT(DISTINCT event_id) AS event_id_distinct,
         CAST(MIN(event_id) AS VARCHAR) AS event_id_min,
         CAST(MAX(event_id) AS VARCHAR) AS event_id_max,
         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls,
         COUNT(DISTINCT user_id) AS user_id_distinct,
         CAST(MIN(user_id) AS VARCHAR) AS user_id_min,
         CAST(MAX(user_id) AS VARCHAR) AS user_id_max,
         CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type_nulls,
         COUNT(DISTINCT event_type) AS event_type_distinct,
         CAST(MIN(event_type) AS VARCHAR) AS event_type_min,
         CAST(MAX(event_type) AS VARCHAR) AS event_type_max,
         CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
         COUNT(DISTINCT value) AS value_distinct,
         CAST(MIN(value) AS VARCHAR) AS value_min,
         CAST(MAX(value) AS VARCHAR) AS value_max
  FROM events
)
SELECT col_name, n_rows, n_nulls, n_distinct, min_str, max_str FROM (
  SELECT 'event_id' AS col_name, n AS n_rows, event_id_nulls AS n_nulls,
         event_id_distinct AS n_distinct, event_id_min AS min_str,
         event_id_max AS max_str FROM one
  UNION ALL
  SELECT 'user_id', n, user_id_nulls, user_id_distinct, user_id_min,
         user_id_max FROM one
  UNION ALL
  SELECT 'event_type', n, event_type_nulls, event_type_distinct,
         event_type_min, event_type_max FROM one
  UNION ALL
  SELECT 'value', n, value_nulls, value_distinct, value_min, value_max
  FROM one
)
ORDER BY col_name
""",
)
def profile_columns_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.profile_columns(load_events(spark, sf_dir))


@register(
    "sink_orc_roundtrip",
    """
SELECT event_id, user_id, event_type, value FROM events
""",
)
def sink_orc_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source round trip: the second columnar format the
    engine speaks natively (predicate pushdown + column pruning work
    the same as parquet; ORC carries built-in bloom-filter support
    per column via orc.bloom.filter.columns for point-lookup-heavy
    layouts)."""
    out_dir = _roundtrip_dir(sf_dir, "orc")
    events = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    events.write.mode("overwrite").orc(out_dir)
    return spark.read.schema(
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
    ).orc(out_dir)


@register(
    "ann_recall_report",
    """
WITH e AS (SELECT vec_id, label AS list_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
truth AS (
  SELECT e.vec_id FROM e, q WHERE e.vec_id <> 0
  ORDER BY ROUND(list_cosine_similarity(e.v, qv), 3) DESC, e.vec_id LIMIT 10
),
cent AS (
  SELECT list_id, array_agg(m ORDER BY i) AS c FROM (
    SELECT list_id, i, AVG(v[i]) AS m
    FROM e, generate_series(1, 64) AS t(i)
    GROUP BY list_id, i
  ) GROUP BY list_id
),
probe AS (
  SELECT list_id FROM cent, q
  ORDER BY list_cosine_similarity(c, qv) DESC, list_id LIMIT 2
),
approx AS (
  SELECT e.vec_id FROM e JOIN probe USING (list_id), q
  WHERE e.vec_id <> 0
  ORDER BY ROUND(list_cosine_similarity(e.v, qv), 3) DESC, e.vec_id LIMIT 10
)
SELECT CAST(10 AS INT) AS k, CAST(2 AS INT) AS nprobe,
       CAST(COUNT(*) AS BIGINT) AS n_overlap,
       ROUND(COUNT(*) / 10.0, 4) AS recall_at_k
FROM truth WHERE vec_id IN (SELECT vec_id FROM approx)
""",
)
def ann_recall_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.ann_recall_report(load_table(spark, sf_dir, "embeddings"))


@register(
    "dedup_keep_best",
    f"""
WITH RECURSIVE g AS (
  SELECT doc_id, {_GRAMS} AS grams FROM documents
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
), edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id AS u, a_id AS v FROM pairs
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT d.doc_id, d.n_chars,
         LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS component_id
  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
  GROUP BY d.doc_id, d.n_chars
), best AS (
  SELECT component_id, doc_id AS kept_doc_id FROM (
    SELECT component_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY component_id
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM comp
  ) WHERE rn = 1
)
SELECT c.doc_id, c.component_id, b.kept_doc_id,
       c.doc_id = b.kept_doc_id AS is_kept
FROM comp c JOIN best b USING (component_id)
ORDER BY c.doc_id
""",
)
def dedup_keep_best_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    documents = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(documents, threshold=0.8)
    return dedup.dedup_keep_best(documents, pairs)


@register(
    "multimodal_binary_ingest",
    # DuckDB reads the same files via read_blob; both engines report
    # (file_name, n_bytes, md5) per media object
    """
SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
       CAST(octet_length(content) AS BIGINT) AS n_bytes,
       md5(decode(content)) AS content_md5
FROM read_blob('/tmp/ksr_binfiles/*.bin')
ORDER BY file_name
""",
)
def multimodal_binary_ingest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-object ingestion via Spark's binaryFile source: each file
    lands as (path, modificationTime, length, content BINARY) — the
    standard first hop for image/audio corpora (decode then proceeds
    via the multimodal pandas-UDF operators). The fixture packs 50
    documents as .bin objects; a real deployment points the SAME
    reader at an object-store prefix with pathGlobFilter, and the
    scan parallelizes per file with no driver involvement."""
    import hashlib
    import os

    out = "/tmp/ksr_binfiles"
    os.makedirs(out, exist_ok=True)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .collect()  # 50-row fixture packing, not a data-path collect
    )
    for r in docs:
        with open(f"{out}/doc_{r.doc_id:05d}.bin", "wb") as fh:
            fh.write(r.text.encode("utf-8"))
    binf = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(out)
    return (
        binf.select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
            F.col("length").alias("n_bytes"),
            F.md5(F.col("content")).alias("content_md5"),
        )
        .orderBy("file_name")
    )


def _morton8(a, b):
    """Interleave the low 8 bits of two long columns into one Morton
    (Z-order) key — bit i of `a` lands at position 2i, bit i of `b` at
    2i+1. Pure shift/and column algebra, fully codegen (disjoint bit
    positions make addition == bitwise OR; Column.__or__ is boolean)."""
    code = F.lit(0).cast("long")
    for i in range(8):
        code = (
            code
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return code


def _rank_byte(col, lo, hi):
    """Min-max scale a long column into 0..255: Z-order interleaving
    only balances dimensions of EQUAL bit width, so each column is
    normalized to an 8-bit rank first (raw interleave lets the wider
    column dominate the high bits and degenerates to a single-key
    sort — caught by the two-dimensional narrowing test)."""
    span = F.greatest(hi - lo, F.lit(1))
    return ((col - lo) * 255 / span).cast("long")


@register(
    "sink_zorder_parquet",
    """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events
""",
)
def sink_zorder_parquet_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ordered parquet layout: range-partition + sort on the Morton
    interleave of (user_id, minute-bucketed ts), so per-file min/max
    stats are narrow on BOTH columns simultaneously — single-key
    sorting (sink_sorted_parquet) prunes only its own column, Z-order
    lets user-id point lookups AND time-range scans each skip most
    files of a 100 TB table (the Delta/Iceberg OPTIMIZE ZORDER
    technique, expressed with stock column algebra).
    tests/test_plans.py asserts the two-dimensional narrowing."""
    out_dir = _roundtrip_dir(sf_dir, "zorder")
    events = load_events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    minute = (F.unix_micros("ts") / 60_000_000).cast("long")
    bounds = events.agg(
        F.min("user_id").alias("u_lo"),
        F.max("user_id").alias("u_hi"),
        F.min(minute).alias("t_lo"),
        F.max(minute).alias("t_hi"),
    )
    keyed = events.join(F.broadcast(bounds)).withColumn(
        "_z",
        _morton8(
            _rank_byte(F.col("user_id"), F.col("u_lo"), F.col("u_hi")),
            _rank_byte(minute, F.col("t_lo"), F.col("t_hi")),
        ),
    ).drop("u_lo", "u_hi", "t_lo", "t_hi")
    (
        keyed.repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return spark.read.parquet(out_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )


@register(
    "streaming_attribution_outer",
    # LEFT OUTER stream-stream join: matched rows equal the batch
    # self-join; unmatched clicks emit (click_id, NULL) only once the
    # terminal watermark passes click_ts + 1h. The global watermark is
    # the MIN across the two input streams' watermark operators (each
    # sees only its own filtered rows), hence LEAST of the per-type
    # max timestamps minus the 2h delay
    """
WITH wm AS (
  SELECT LEAST(
           (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
           (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')
         ) - INTERVAL 2 HOUR AS w
),
matched AS (
  SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
  FROM events c JOIN events p
    ON c.user_id = p.user_id
   AND c.event_type = 'click' AND p.event_type = 'purchase'
   AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
),
unmatched AS (
  SELECT c.event_id AS click_id, CAST(NULL AS BIGINT) AS purchase_id,
         c.user_id
  FROM events c, wm
  WHERE c.event_type = 'click'
    AND c.ts + INTERVAL 1 HOUR < wm.w
    AND NOT EXISTS (
      SELECT 1 FROM events p
      WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    )
)
SELECT * FROM matched UNION ALL SELECT * FROM unmatched
""",
)
def streaming_attribution_outer_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    return jobs.run_available_now(
        jobs.attribution_join_outer(stream), "streaming_attribution_outer"
    )


@register(
    "streaming_attribution_semi",
    # LEFT SEMI: one row per converted click — matches emit on arrival,
    # so no watermark leg in the oracle
    """
SELECT DISTINCT c.event_id AS click_id, c.user_id
FROM events c
WHERE c.event_type = 'click'
  AND EXISTS (
    SELECT 1 FROM events p
    WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
      AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
  )
""",
)
def streaming_attribution_semi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    return jobs.run_available_now(
        jobs.attribution_join_semi(stream), "streaming_attribution_semi"
    )


@register(
    "streaming_windowed_distinct",
    """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
""",
)
def streaming_windowed_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    return jobs.run_available_now(
        jobs.windowed_distinct_users(stream), "streaming_windowed_distinct"
    )


# ---------------------------------------------------------------------------
# Derived-state maintenance: CDC diff, SCD2, incremental agg, mergeable
# sketches — the operations that keep 100 TB derived tables fresh without
# full recomputation. (Absent in the reference: its pipeline is stateless
# and re-reads the stream per request, index.js:43-73.)
# ---------------------------------------------------------------------------
@register(
    "snapshot_diff",
    """
WITH old AS (
  SELECT o_orderkey, o_totalprice AS price FROM orders WHERE o_orderkey % 10 <> 3
), new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1
              ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 10 <> 7
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       o.price AS old_price, n.price AS new_price
FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR o.price <> n.price
""",
)
def snapshot_diff_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    orders = load_table(spark, sf_dir, "orders")
    return relational.snapshot_diff(
        relational.snapshot_old(orders), relational.snapshot_new(orders)
    )


@register(
    "scd2_from_changelog",
    """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), changes AS (
  SELECT user_id, ts, event_id, event_type FROM ordered
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type AS state, epoch_us(ts) AS valid_from_us,
       epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us
FROM changes
""",
)
def scd2_from_changelog_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.scd2_from_changelog(load_events(spark, sf_dir))


@register(
    "incremental_agg_merge",
    # merged base+delta state must equal the full recompute — the oracle
    # IS the full recompute
    """
SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY event_type
""",
)
def incremental_agg_merge_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.incremental_agg_merge(load_events(spark, sf_dir))


@register(
    "agg_hll_mergeable",
    # same bound-contract as agg_approx_distinct: the merged
    # daily-sketch estimate must land within 10% of the exact distinct
    # count (Datasketches HLL at default lgK=12 has rsd ~1.6%; 10%
    # leaves headroom for the union of many daily sketches)
    """
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, true AS within_tol
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def agg_hll_mergeable_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    est = relational.hll_mergeable_distinct(load_events(spark, sf_dir))
    exact = (
        load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.lit(0.10) * F.col("exact_users")
            ).alias("within_tol"),
        )
        .orderBy("event_type")
    )


@register(
    "text_unigram_logprob",
    """
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents, LATERAL UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS t(tok)
  WHERE t.tok <> ''
), counts AS (
  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
), total AS (
  SELECT SUM(cnt) AS total FROM counts
)
SELECT toks.doc_id, COUNT(*) AS n_tokens,
       ROUND(AVG(LN(counts.cnt / total.total)), 6) AS avg_logprob
FROM toks JOIN counts USING (tok), total
GROUP BY toks.doc_id
ORDER BY toks.doc_id
""",
)
def text_unigram_logprob_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.unigram_logprob(load_table(spark, sf_dir, "documents"))


@register(
    "bpe_pair_counts",
    """
WITH words AS (
  SELECT t.w
  FROM documents, LATERAL UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS t(w)
  WHERE length(t.w) >= 2
), pairs AS (
  SELECT substring(w, i, 2) AS pair
  FROM words, LATERAL UNNEST(generate_series(1, length(w) - 1)) AS g(i)
)
SELECT pair, COUNT(*) AS cnt FROM pairs
GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50
""",
)
def bpe_pair_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.bpe_pair_counts(load_table(spark, sf_dir, "documents"))


@register(
    "semdedup",
    """
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), seeds AS (
  SELECT vec_id AS seed_id, v AS s FROM vecs WHERE vec_id < 8
), scored AS (
  SELECT vec_id, seed_id,
         FLOOR(list_cosine_similarity(v, s) * 1000 + 0.5) / 1000 AS sim
  FROM vecs, seeds
), best AS (
  SELECT vec_id, MAX(sim) AS best_sim FROM scored GROUP BY vec_id
), assign AS (
  SELECT s.vec_id, MIN(s.seed_id) AS cluster
  FROM scored s JOIN best b ON s.vec_id = b.vec_id AND s.sim = b.best_sim
  GROUP BY s.vec_id
), av AS (
  SELECT a.vec_id, a.cluster, v.v FROM assign a JOIN vecs v ON a.vec_id = v.vec_id
), pairs AS (
  SELECT x.vec_id AS a_id, y.vec_id AS b_id
  FROM av x JOIN av y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
  WHERE ROUND(list_cosine_similarity(x.v, y.v), 3) >= 0.4
)
SELECT vec_id, cluster, vec_id NOT IN (SELECT b_id FROM pairs) AS kept
FROM av ORDER BY vec_id
""",
)
def semdedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.semdedup(load_table(spark, sf_dir, "embeddings"))


@register(
    "corpus_shuffle_shards",
    """
SELECT doc_id, doc_id % 32 AS shard,
       ROW_NUMBER() OVER (
         PARTITION BY doc_id % 32
         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       ) AS position
FROM documents
""",
)
def corpus_shuffle_shards_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.corpus_shuffle_shards(load_table(spark, sf_dir, "documents"))


@register(
    "kmeans_converged",
    # full-loop recursive-CTE mirror (the pagerank_converged pattern):
    # milli-quantized vectors make distances/sums exact bigints, the
    # packed MIN argmin is deterministic, the re-quantized centroid is
    # one float op, and the stop (total within-cluster d2 unchanged, or
    # the max_iter cap) rides the carried total/prev columns
    """
WITH RECURSIVE vecs AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))
           AS xq
  FROM embeddings
), iters AS (
  SELECT 0 AS iter, vec_id AS cid, xq AS c,
         CAST(NULL AS BIGINT) AS n_members,
         CAST(NULL AS BIGINT) AS total_d2, CAST(NULL AS BIGINT) AS prev_d2
  FROM vecs WHERE vec_id < 8
  UNION ALL
  (
    WITH cur AS (
      SELECT * FROM iters
      WHERE iter < 5
        AND (total_d2 IS NULL OR prev_d2 IS NULL OR total_d2 <> prev_d2)
    ), packed AS (
      SELECT v.vec_id, v.xq,
             MIN(list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(list_zip(v.xq, c.c),
                                  p -> (p[1] - p[2]) * (p[1] - p[2]))),
                 (a, b) -> a + b) * 8 + c.cid) AS p
      FROM vecs v CROSS JOIN cur c
      GROUP BY v.vec_id, v.xq
    ), assign AS (
      SELECT vec_id, xq, p % 8 AS cluster_id, p // 8 AS d2min FROM packed
    ), tot AS (
      SELECT SUM(d2min) AS t FROM assign
    ), per_dim AS (
      SELECT cluster_id, pos,
             CAST(FLOOR(SUM(v) / COUNT(*) + 0.5) AS BIGINT) AS cm,
             COUNT(*) AS n
      FROM (SELECT cluster_id, unnest(xq) AS v, generate_subscripts(xq, 1) AS pos
            FROM assign)
      GROUP BY cluster_id, pos
    ), newc AS (
      SELECT cluster_id AS cid, list(cm ORDER BY pos) AS c, MAX(n) AS n_members
      FROM per_dim GROUP BY cluster_id
    )
    SELECT c0.iter + 1 AS iter, n.cid, n.c, n.n_members,
           t.t AS total_d2, c0.total_d2 AS prev_d2
    FROM newc n, tot t, (SELECT DISTINCT iter, total_d2 FROM cur) c0
  )
)
SELECT cid AS cluster_id, CAST(pos AS INT) AS pos, cm / 1000 AS centroid_val,
       n_members
FROM (
  SELECT cid, n_members, unnest(c) AS cm, generate_subscripts(c, 1) AS pos
  FROM iters WHERE iter = (SELECT MAX(iter) FROM iters)
)
ORDER BY cluster_id, pos
""",
)
def kmeans_converged_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.kmeans_converged(load_table(spark, sf_dir, "embeddings"))


@register(
    "quality_model_score",
    # same md5-derived weights, same integer-ratio features, same
    # left-associative dot product — bit-identical inference
    f"""
WITH f AS (
  SELECT doc_id,
         len({_TOKS})::DOUBLE AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         len(list_filter({_TOKS}, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
           AS n_stop,
         (length(text) - length(replace(text, '.', '')))::DOUBLE AS n_dots
  FROM documents
), wts AS (
  SELECT i.i AS i,
         2 * (CAST(concat('0x', substr(md5('qw:' || i.i), 1, 15)) AS UBIGINT)
              / 1152921504606846976.0) - 1 AS w
  FROM (SELECT UNNEST(range(5)) AS i) i
), z AS (
  SELECT f.doc_id,
         (SELECT w FROM wts WHERE i = 0) * (n_tokens / 100.0)
         + (SELECT w FROM wts WHERE i = 1) * (n_stop / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 2) * (n_chars / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 3) * (n_dots / (n_chars + 1.0))
         + (SELECT w FROM wts WHERE i = 4) AS z
  FROM f
)
SELECT doc_id, FLOOR(z * 1e4 + 0.5) / 1e4 AS logit, z > 0 AS keep
FROM z ORDER BY doc_id
""",
)
def quality_model_score_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.quality_model_score(load_table(spark, sf_dir, "documents"))


@register(
    "pagerank_step",
    """
WITH edges AS (
  SELECT DISTINCT user_id AS src, event_id % 500 AS dst FROM events
), outdeg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
)
SELECT e.dst,
       -- (1 - CAST(.85 AS DOUBLE)) in DOUBLE, not a 0.15 literal: the
       -- Spark side computes 1-damping in binary64 (0.15000000000000002)
       -- while a plain 0.15 literal parses one ulp lower — enough to
       -- flip the half-up floor at exact midpoints like 0.1765625
       FLOOR(((1 - CAST(0.85 AS DOUBLE))
              + CAST(0.85 AS DOUBLE) * (SUM(1000000000 // o.outdeg) / 1e9))
             * 1e6 + 0.5) / 1e6 AS rank
FROM edges e JOIN outdeg o ON e.src = o.src
GROUP BY e.dst ORDER BY e.dst
""",
)
def pagerank_step_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.pagerank_step(load_events(spark, sf_dir))


@register(
    "tfidf_top_terms",
    """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       LATERAL UNNEST(string_split(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' ')) AS t(term)
  WHERE t.term <> ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * LN(n.n_docs / df.df) AS score
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, tf, df, ROUND(score, 6) AS tfidf, rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
  FROM scored
)
WHERE rnk <= 3
ORDER BY doc_id, rnk
""",
)
def tfidf_top_terms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.tfidf_top_terms(load_table(spark, sf_dir, "documents"))


@register(
    "pagerank_converged",
    # recursive-CTE oracle for the full driver loop, including the
    # data-dependent stop: ranks are exact integer micro-units on both
    # sides (see pagerank_converged docstring), so every iteration is
    # bit-identical and the convergence delta is an exact bigint. The
    # stop mirrors Spark's batched check (delta inspected only at
    # checkpoint iterations 3, 6, 9, then the max_iter=10 cap).
    # NB: inside WITH RECURSIVE, DuckDB treats a bare UNION between CTE
    # branches as the recursion operator, so `nodes` dedups explicitly.
    """
WITH RECURSIVE edges AS (
  SELECT DISTINCT user_id AS src, event_id % 500 AS dst FROM events
), outdeg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
), nodes AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
), iters AS (
  SELECT node, CAST(1000000000 AS BIGINT) AS rank_u,
         CAST(NULL AS BIGINT) AS delta_u, 0 AS iter
  FROM nodes
  UNION ALL
  (
    WITH cur AS (
      SELECT * FROM iters
      WHERE iter < 10
        AND (delta_u IS NULL
             OR NOT (iter IN (3, 6, 9) AND delta_u < 1000000))
    ), inflow AS (
      SELECT e.dst AS node, SUM(c.rank_u // o.outdeg) AS inflow_u
      FROM cur c JOIN edges e ON c.node = e.src
      JOIN outdeg o ON e.src = o.src
      GROUP BY e.dst
    ), nxt AS (
      SELECT c.node,
             CAST(150000000
                  + FLOOR(CAST(0.85 AS DOUBLE) * COALESCE(i.inflow_u, 0) + 0.5)
                  AS BIGINT) AS rank_u,
             c.rank_u AS old_rank_u, c.iter + 1 AS iter
      FROM cur c LEFT JOIN inflow i ON c.node = i.node
    )
    SELECT node, rank_u,
           SUM(ABS(rank_u - old_rank_u)) OVER () AS delta_u, iter
    FROM nxt
  )
)
SELECT node, ((rank_u + 500) // 1000) / 1e6 AS rank
FROM iters WHERE iter = (SELECT MAX(iter) FROM iters)
ORDER BY node
""",
)
def pagerank_converged_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.pagerank_converged(load_events(spark, sf_dir))


@register(
    "source_quality_report",
    """
WITH flagged AS (
  SELECT source, lang,
         length(text) AS n_chars,
         length(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         COUNT(*) OVER (
           PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         ) > 1 AS is_dup
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(n_chars), 4) AS avg_chars,
       ROUND(AVG(CASE WHEN n_chars >= 100 THEN 1.0 ELSE 0.0 END), 4) AS len_retention,
       ROUND(AVG(CASE WHEN is_dup THEN 1.0 ELSE 0.0 END), 4) AS dup_rate
FROM flagged GROUP BY source ORDER BY source
""",
)
def source_quality_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.source_quality_report(load_table(spark, sf_dir, "documents"))


@register(
    "sample_weighted",
    """
SELECT doc_id, source, length(text) AS n_chars,
       ROUND(POW((doc_id * 2654435761) % 4294967296 / 4294967296.0,
                 1.0 / GREATEST(length(text), 1)), 6) AS es_key
FROM documents
ORDER BY es_key DESC, doc_id
LIMIT 100
""",
)
def sample_weighted_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.sample_weighted(load_table(spark, sf_dir, "documents"))


@register(
    "source_overlap_matrix",
    """
WITH by_src AS (
  SELECT md5(substring(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 64)) AS fp,
         source, COUNT(*) AS n_docs
  FROM documents GROUP BY 1, 2
)
SELECT a.source AS src_a, b.src_b,
       COUNT(DISTINCT a.fp) AS shared_fingerprints,
       CAST(SUM(a.n_docs) AS BIGINT) AS docs_duplicated
FROM by_src a JOIN (SELECT fp, source AS src_b FROM by_src) b ON a.fp = b.fp
WHERE a.source <> b.src_b
GROUP BY a.source, b.src_b
ORDER BY src_a, src_b
""",
)
def source_overlap_matrix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.source_overlap_matrix(load_table(spark, sf_dir, "documents"))


# The training-batch oracle wraps the (already registered) curate oracle
# as a nested CTE, then derives chunk token counts arithmetically:
# chunk i of an n-token doc holds LEAST(chunk, n - i*stride) tokens —
# exactly what slicing produces.
ORACLES["training_batches"] = f"""
WITH curated AS (
{ORACLES["curate_corpus"]}
), chunks AS (
  SELECT c.doc_id, g.i AS chunk_id,
         LEAST(64, c.n_tokens - g.i * 48) AS n_tok
  FROM curated c,
       LATERAL UNNEST(generate_series(0,
         CAST(CEIL(GREATEST(c.n_tokens - 64, 0) / 48.0) AS INT))) AS g(i)
), packed AS (
  SELECT doc_id % 16 AS shard, doc_id, chunk_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY doc_id % 16 ORDER BY doc_id, chunk_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM chunks
)
SELECT shard, CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS bin_id,
       COUNT(*) AS n_chunks, COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM packed GROUP BY 1, 2 ORDER BY shard, bin_id
"""


@register("training_batches")
def training_batches_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.training import training_batches

    return training_batches(load_table(spark, sf_dir, "documents"))


@register("dedup_containment")
def dedup_containment_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.ngram_containment_pairs(load_table(spark, sf_dir, "documents"))


ORACLES["dedup_containment"] = f"""
WITH g AS (SELECT doc_id, lang, source, {_GRAMS} AS grams FROM documents)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       ROUND(len(list_intersect(a.grams, b.grams))::DOUBLE / len(a.grams), 4)
         AS containment
FROM g a JOIN g b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id
WHERE len(a.grams) > 0
  AND len(list_intersect(a.grams, b.grams))::DOUBLE / len(a.grams) >= 0.8
"""


# --- REAL multimodal decode (PPM / WAV codecs, operators/multimodal.py):
# synthetic payloads are pure integer functions of doc_id, so the oracle
# recomputes the DECODED facts from the same formulas — the codec path
# (header grammar, pixel/sample extraction, resize/resample index maps)
# is what's under test.
@register(
    "multimodal_image_decode",
    """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, (doc_id * 7 + i.i) % 256 AS v
  FROM dims, LATERAL (SELECT UNNEST(range(w * h * 3)) AS i) i
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       3 AS channels, ROUND(AVG(v), 4) AS byte_mean
FROM px GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_image_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.image_decode_features(multimodal.synthetic_ppm_media(docs))


# PNG leg of the same decode contract: identical pixel formula (the two
# generators share one oracle), but the payload is a REAL PNG — stdlib
# zlib inflate + all five scanline-filter inversions + chunk CRC checks
# (multimodal.decode_png). The per-row filter cycles (doc_id + y) % 5,
# so a wrong Sub/Average/Paeth inversion shifts byte_mean and fails the
# value hash.
@register(
    "multimodal_png_decode",
    """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, (doc_id * 7 + i.i) % 256 AS v
  FROM dims, LATERAL (SELECT UNNEST(range(w * h * 3)) AS i) i
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       3 AS channels, ROUND(AVG(v), 4) AS byte_mean
FROM px GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_png_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.image_decode_features(multimodal.synthetic_png_media(docs))


@register(
    "multimodal_image_resize_decoded",
    # nearest-neighbor grid map mirrored in SQL: resized flat index j ->
    # original pixel ((y*h//4)*w + x*w//4)*3 + c
    """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h FROM documents
), cell AS (
  SELECT doc_id, j.j,
         ((((j.j // 3) // 4) * h // 4) * w + ((j.j // 3) % 4) * w // 4) * 3
           + j.j % 3 AS oi
  FROM dims, LATERAL (SELECT UNNEST(range(48)) AS j) j
)
SELECT doc_id, 4 AS out_w, 4 AS out_h,
       SUM((j + 1) * ((doc_id * 7 + oi) % 256))::BIGINT AS checksum
FROM cell GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_image_resize_decoded_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.image_resize_decoded(multimodal.synthetic_ppm_media(docs))


@register(
    "multimodal_audio_decode",
    """
WITH lens AS (
  SELECT doc_id, 64 + doc_id % 50 AS n FROM documents
), s AS (
  SELECT doc_id, n, ((doc_id * 13 + i.i * 31) % 65536) - 32768 AS v
  FROM lens, LATERAL (SELECT UNNEST(range(n)) AS i) i
)
SELECT doc_id, 8000 AS sample_rate, ANY_VALUE(n) AS n_samples,
       ANY_VALUE(n) * 2 AS n_resampled, SUM(v)::BIGINT AS sample_sum
FROM s GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_audio_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.audio_decode_features(multimodal.synthetic_wav_media(docs))


@register(
    "heavy_hitters_cms",
    # identical md5-derived CMS table + min-over-cells estimates
    """
WITH cells AS (
  SELECT r.r AS r,
         CAST(concat('0x', substr(md5('cms' || r.r || ':' || user_id), 1, 15))
              AS UBIGINT) % 256 AS c,
         COUNT(*) AS n
  FROM events, (SELECT UNNEST(range(4)) AS r) r
  GROUP BY 1, 2
), top AS (
  SELECT user_id, exact_n FROM (
    SELECT user_id, COUNT(*) AS exact_n,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS rk
    FROM events GROUP BY user_id
  ) WHERE rk <= 10
), probes AS (
  SELECT t.user_id, t.exact_n, r.r AS r,
         CAST(concat('0x', substr(md5('cms' || r.r || ':' || t.user_id), 1, 15))
              AS UBIGINT) % 256 AS c
  FROM top t, (SELECT UNNEST(range(4)) AS r) r
)
SELECT p.user_id, p.exact_n, MIN(ce.n) AS cms_n,
       MIN(ce.n) - p.exact_n AS overcount
FROM probes p JOIN cells ce ON p.r = ce.r AND p.c = ce.c
GROUP BY p.user_id, p.exact_n
ORDER BY p.exact_n DESC, p.user_id
""",
)
def heavy_hitters_cms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.heavy_hitters_cms(load_events(spark, sf_dir))


@register(
    "streaming_asof_enrich",
    # foreachBatch as-of against the static orders snapshot: per-batch
    # results == the global batch as-of join (the match depends only on
    # the event row + the static table), so the oracle is the batch
    # as-of oracle verbatim
    """
WITH o1 AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey
FROM events e ASOF LEFT JOIN o1 o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
)
def streaming_asof_enrich_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    out_dir = tempfile.mkdtemp(prefix="ksr_out_streaming_asof_enrich_")
    with tempfile.TemporaryDirectory() as checkpoint:
        jobs.asof_enrich_stream(stream, orders, out_dir, checkpoint)
    return spark.read.schema(
        "event_id BIGINT, user_id BIGINT, asof_orderkey BIGINT"
    ).parquet(out_dir)


@register(
    "streaming_cms_cells",
    # the same CMS table built incrementally on the stream: cell
    # counters are pure additive state, so complete-mode output after
    # the AvailableNow drain equals the batch table — the
    # sketch-on-stream story (any key's estimate = min over its d
    # cells, servable mid-stream at every trigger)
    """
SELECT r.r AS r,
       CAST(concat('0x', substr(md5('cms' || r.r || ':' || user_id), 1, 15))
            AS UBIGINT) % 256 AS c,
       COUNT(*) AS n
FROM events, (SELECT UNNEST(range(4)) AS r) r
GROUP BY 1, 2
""",
)
def streaming_cms_cells_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("r"),
                    F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(f"cms{i}:"),
                                        F.col("user_id").cast("string"),
                                    )
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("long"),
                        F.lit(256),
                    ).alias("c"),
                )
                for i in range(4)
            ]
        )
    )
    cells = (
        stream.select(probes.alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count("*").alias("n"))
    )
    return jobs.run_available_now(cells, "streaming_cms_cells")


@register(
    "join_salted_skew",
    # salting is plan-internal: semantics = the plain equi-join
    """
SELECT e.event_id, e.user_id, c.c_nationkey
FROM events e JOIN customer c ON e.user_id = c.c_custkey
ORDER BY e.event_id
""",
)
def join_salted_skew_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.join_salted_skew(
        load_events(spark, sf_dir), load_table(spark, sf_dir, "customer")
    )


@register(
    "feature_quantile_bins",
    # decile EDGES via quantile_disc (identical to Spark's GK sketch
    # when group size <= accuracy), then the same strictly-below edge
    # count assignment — no per-row window on either side
    """
WITH edges AS (
  SELECT event_type,
         quantile_disc(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges
  FROM events GROUP BY event_type
), binned AS (
  SELECT e.event_type, e.value,
         1 + len(list_filter(d.edges, x -> e.value > x)) AS bucket
  FROM events e JOIN edges d USING (event_type)
)
SELECT event_type, bucket, COUNT(*) AS n,
       ROUND(MIN(value), 6) AS lo, ROUND(MAX(value), 6) AS hi
FROM binned GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def feature_quantile_bins_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.feature_quantile_bins(load_events(spark, sf_dir))


@register(
    "feature_quantile_bins_exact",
    """
WITH binned AS (
  SELECT event_type, value,
         NTILE(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bucket
  FROM events
)
SELECT event_type, bucket, COUNT(*) AS n,
       ROUND(MIN(value), 6) AS lo, ROUND(MAX(value), 6) AS hi
FROM binned GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def feature_quantile_bins_exact_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.feature_quantile_bins_exact(load_events(spark, sf_dir))


@register(
    "ewma_smoothing",
    """
WITH win AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vals
  FROM events
)
SELECT user_id, event_id, ts_us,
       ROUND(
         list_sum(list_transform(generate_series(1, len(vals)),
                  i -> vals[i] * POW(0.5, len(vals) - i)))
         / ((1 - POW(0.5, len(vals))) / 0.5), 6) AS ewma
FROM win
""",
)
def ewma_smoothing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.ewma_smoothing(load_events(spark, sf_dir))


@register(
    "multimodal_dedup",
    """
WITH blobs AS (
  SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,
         md5(decode(content)) AS content_md5
  FROM read_blob('/tmp/ksr_binfiles_dup/*.bin')
)
SELECT content_md5, MIN(file_name) AS canonical_file,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM blobs GROUP BY content_md5 ORDER BY content_md5
""",
)
def multimodal_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of media objects by content hash — the first pass
    over any scraped image/audio corpus (identical bytes re-collected
    under different names/URLs). The shuffle carries (md5, file_name)
    pairs, never blob bytes: hashing happens scan-side per file. The
    fixture packs 50 objects whose payloads repeat every 30 ids, so
    real duplicate groups exist; a deployment points the same plan at
    an object-store prefix (near-dup then proceeds via perceptual
    hashes in the multimodal UDF family)."""
    import os

    out = "/tmp/ksr_binfiles_dup"
    os.makedirs(out, exist_ok=True)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .collect()  # 50-row fixture packing, not a data-path collect
    )
    by_id = {r.doc_id: r.text for r in docs}
    for doc_id in by_id:
        with open(f"{out}/obj_{doc_id:05d}.bin", "wb") as fh:
            fh.write(by_id[doc_id % 30].encode("utf-8"))
    binf = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(out)
    return (
        binf.select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
            F.md5(F.col("content")).alias("content_md5"),
        )
        .groupBy("content_md5")
        .agg(
            F.min("file_name").alias("canonical_file"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("content_md5")
    )


@register(
    "schema_evolution_read",
    # batch 1 lacks `value`, batch 2 carries it: the merged read fills
    # NULLs for the missing column — oracle restates the union
    """
SELECT event_id, event_type,
       CASE WHEN event_id % 2 = 1 THEN value END AS value
FROM events
""",
)
def schema_evolution_read_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on the storage layer: two parquet batches with
    DIFFERENT schemas (a column added between ingestion generations)
    read as one table via mergeSchema — the contract every long-lived
    100 TB dataset depends on (old files never rewritten when a column
    lands). Footer-level merge only: no data rewrite, missing columns
    surface as NULLs, pruning still applies per file."""
    out_dir = _roundtrip_dir(sf_dir, "evolve")
    events = load_events(spark, sf_dir)
    (
        events.filter(F.col("event_id") % 2 == 0)
        .select("event_id", "event_type")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/gen=1")
    )
    (
        events.filter(F.col("event_id") % 2 == 1)
        .select("event_id", "event_type", "value")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/gen=2")
    )
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{out_dir}/gen=1", f"{out_dir}/gen=2"
    )
    return merged.select("event_id", "event_type", "value")


@register(
    "sink_partition_overwrite",
    # after dynamically overwriting ONE day with reprocessed values,
    # the read-back must equal: untouched days + the reprocessed day
    """
SELECT event_id, CASE WHEN CAST(ts AS DATE) = DATE '2024-01-15'
                      THEN value * 2 ELSE value END AS value,
       CAST(CAST(ts AS DATE) AS VARCHAR) AS day
FROM events
""",
)
def sink_partition_overwrite_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: re-running one day of a
    date-partitioned table replaces ONLY that partition (INSERT
    OVERWRITE semantics with partitionOverwriteMode=dynamic) — the
    idempotent-backfill primitive of every partitioned 100 TB dataset;
    static overwrite would drop every other day."""
    out_dir = _roundtrip_dir(sf_dir, "dynover")
    events = load_events(spark, sf_dir).select(
        "event_id", "value", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    )
    events.write.mode("overwrite").partitionBy("day").parquet(out_dir)
    # reprocess one day (doubled values) and overwrite just its partition;
    # the mode is a per-write option, NOT a session conf — setting the
    # session-wide partitionOverwriteMode here would silently change the
    # semantics of every later partitioned overwrite on the shared session
    (
        events.filter(F.col("day") == "2024-01-15")
        .withColumn("value", F.col("value") * 2)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(out_dir)
    )
    return spark.read.parquet(out_dir).select("event_id", "value", "day")


@register(
    "streaming_attribution_full",
    # FULL OUTER stream-stream join: the left-outer oracle plus the
    # third leg — unmatched purchases emit (NULL, purchase_id) once the
    # terminal per-stream-min watermark passes the purchase time (the
    # youngest possibly-matching click is strictly older)
    """
WITH wm AS (
  SELECT LEAST(
           (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
           (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')
         ) - INTERVAL 2 HOUR AS w
),
matched AS (
  SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
  FROM events c JOIN events p
    ON c.user_id = p.user_id
   AND c.event_type = 'click' AND p.event_type = 'purchase'
   AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
),
unmatched_c AS (
  SELECT c.event_id AS click_id, CAST(NULL AS BIGINT) AS purchase_id,
         c.user_id
  FROM events c, wm
  WHERE c.event_type = 'click'
    AND c.ts + INTERVAL 1 HOUR < wm.w
    AND NOT EXISTS (
      SELECT 1 FROM events p
      WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    )
),
unmatched_p AS (
  SELECT CAST(NULL AS BIGINT) AS click_id, p.event_id AS purchase_id,
         p.user_id
  FROM events p, wm
  WHERE p.event_type = 'purchase'
    AND p.ts < wm.w
    AND NOT EXISTS (
      SELECT 1 FROM events c
      WHERE c.user_id = p.user_id AND c.event_type = 'click'
        AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    )
)
SELECT * FROM matched
UNION ALL SELECT * FROM unmatched_c
UNION ALL SELECT * FROM unmatched_p
""",
)
def streaming_attribution_full_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    return jobs.run_available_now(
        jobs.attribution_join_full(stream), "streaming_attribution_full"
    )


@register(
    "agg_udaf_median",
    """
SELECT event_type, ROUND(MEDIAN(value), 6) AS median_value
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def agg_udaf_median_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.agg_udaf_median(load_events(spark, sf_dir))


@register(
    "sink_compact_small_files",
    # compaction preserves content exactly — the oracle is the identity
    """
SELECT event_id, user_id, event_type, value FROM events
""",
)
def sink_compact_small_files_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: rewrite a fragmented table (here: 64
    tiny files, the classic streaming-sink residue) into
    target-byte-sized files computed from the actual input size — the
    maintenance pass that keeps scan task counts and parquet footer
    overhead sane on a 100 TB table. Row-count preservation is
    oracle-checked; the file-count collapse is pytest-asserted.
    Production twin: OPTIMIZE/rewriteDataFiles; expressed here with
    stock repartition + write."""
    frag_dir = _roundtrip_dir(sf_dir, "fragmented")
    compact_dir = _roundtrip_dir(sf_dir, "compacted")
    events = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    events.repartition(64).write.mode("overwrite").parquet(frag_dir)
    fragmented = spark.read.parquet(frag_dir)
    import os

    total_bytes = sum(
        e.stat().st_size for e in os.scandir(frag_dir) if e.name.endswith(".parquet")
    )
    target_files = max(1, round(total_bytes / (8 * 1024 * 1024)))  # ~8 MiB files
    fragmented.repartition(target_files).write.mode("overwrite").parquet(compact_dir)
    return spark.read.parquet(compact_dir)


@register(
    "join_asof_tolerance",
    """
WITH o1 AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id,
       CASE WHEN o.o_orderdate >= e.ts - INTERVAL 30 DAY
            THEN o.o_orderkey END AS near_orderkey
FROM events e ASOF LEFT JOIN o1 o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
)
def join_asof_tolerance_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.join_asof_tolerance(
        load_events(spark, sf_dir), load_table(spark, sf_dir, "orders")
    )


@register(
    "bloom_semi_filter",
    # identical md5-derived bit positions; Bloom's no-false-negative
    # contract is visible as a zero (false, true) cell
    """
WITH member AS (
  SELECT DISTINCT o_custkey AS key FROM orders
  WHERE o_orderdate >= DATE '2001-01-01'
),
bits AS (
  SELECT DISTINCT
    CAST(concat('0x', substr(md5('bloom' || i.i || ':' || key), 1, 15))
         AS UBIGINT) % 4096 AS bit
  FROM member, (SELECT UNNEST(range(3)) AS i) i
),
probes AS (
  SELECT c_custkey AS key,
         CAST(concat('0x', substr(md5('bloom' || i.i || ':' || c_custkey), 1, 15))
              AS UBIGINT) % 4096 AS bit
  FROM customer, (SELECT UNNEST(range(3)) AS i) i
),
hits AS (
  SELECT key FROM probes p
  WHERE EXISTS (SELECT 1 FROM bits b WHERE b.bit = p.bit)
  GROUP BY key HAVING COUNT(*) = 3
)
SELECT c.c_custkey IN (SELECT key FROM hits) AS bloom_hit,
       c.c_custkey IN (SELECT key FROM member) AS actual_member,
       COUNT(*) AS n_customers
FROM customer c GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def bloom_semi_filter_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.bloom_semi_filter(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


@register(
    "graph_triangles",
    # same degree-ordered orientation; every triangle counted once
    """
WITH raw AS (
  SELECT user_id % 200 AS p, event_id % 199 AS q FROM events
  WHERE user_id % 200 <> event_id % 199
),
edges AS (SELECT DISTINCT LEAST(p, q) AS u, GREATEST(p, q) AS v FROM raw),
deg AS (
  SELECT x, COUNT(*) AS deg FROM (
    SELECT u AS x FROM edges UNION ALL SELECT v AS x FROM edges
  ) GROUP BY x
),
ordered AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.u ELSE e.v END AS a,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.v ELSE e.u END AS b
  FROM edges e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
),
wedges AS (
  SELECT e1.a AS a, e1.b AS b1, e2.b AS b2
  FROM ordered e1 JOIN ordered e2 ON e1.a = e2.a AND e1.b < e2.b
),
und AS (
  SELECT a AS b1, b AS b2 FROM ordered
  UNION
  SELECT b AS b1, a AS b2 FROM ordered
),
tris AS (
  SELECT w.a, w.b1, w.b2 FROM wedges w
  WHERE EXISTS (SELECT 1 FROM und WHERE und.b1 = w.b1 AND und.b2 = w.b2)
),
pv AS (
  SELECT vertex, COUNT(*) AS n_triangles FROM (
    SELECT a AS vertex FROM tris
    UNION ALL SELECT b1 AS vertex FROM tris
    UNION ALL SELECT b2 AS vertex FROM tris
  ) GROUP BY vertex ORDER BY n_triangles DESC, vertex LIMIT 10
),
tot AS (SELECT CAST(-1 AS BIGINT) AS vertex, COUNT(*) AS n_triangles FROM tris)
SELECT vertex, n_triangles FROM (
  SELECT * FROM pv UNION ALL SELECT * FROM tot
) ORDER BY n_triangles DESC, vertex
""",
)
def graph_triangles_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.triangle_count(load_events(spark, sf_dir))


@register(
    "gap_fill_interpolate",
    # identical micro-unit lerp: DuckDB // and Spark DIV both truncate,
    # and every term is non-negative
    """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         CAST(FLOOR(SUM(value) * 1e6 + 0.5) AS BIGINT) AS v_u
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM spans
), g AS (
  SELECT g.user_id, g.hour, h.v_u,
    LAST_VALUE(CASE WHEN h.v_u IS NOT NULL THEN
        struct_pack(t := CAST(epoch(g.hour) AS BIGINT), v_u := h.v_u)
      END IGNORE NULLS) OVER (
      PARTITION BY g.user_id ORDER BY g.hour
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
    FIRST_VALUE(CASE WHEN h.v_u IS NOT NULL THEN
        struct_pack(t := CAST(epoch(g.hour) AS BIGINT), v_u := h.v_u)
      END IGNORE NULLS) OVER (
      PARTITION BY g.user_id ORDER BY g.hour
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next
  FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
)
SELECT user_id, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       v_u IS NOT NULL AS observed,
       (CASE WHEN v_u IS NOT NULL THEN v_u
             WHEN prev IS NOT NULL AND next IS NOT NULL THEN
               (prev.v_u * (next.t - CAST(epoch(hour) AS BIGINT))
                + next.v_u * (CAST(epoch(hour) AS BIGINT) - prev.t))
               // (next.t - prev.t)
        END) / 1e6 AS filled_value
FROM g ORDER BY user_id, hour
""",
)
def gap_fill_interpolate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.gap_fill_interpolate(load_events(spark, sf_dir))


@register(
    "pareto_frontier",
    # same cent-quantized running-max skyline over strictly-smaller sizes
    """
WITH q AS (
  SELECT p_partkey, p_size,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM part
), w AS (
  SELECT p_partkey, p_size, price_c,
         MAX(price_c) OVER (ORDER BY p_size
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_smaller
  FROM q
)
SELECT p_partkey, p_size, price_c / 100 AS p_retailprice
FROM w WHERE best_smaller IS NULL OR price_c > best_smaller
ORDER BY p_size, p_partkey
""",
)
def pareto_frontier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.pareto_frontier(load_table(spark, sf_dir, "part"))


@register(
    "dsir_select",
    # identical md5 bucket ids and exact integer importance ratios
    """
WITH toks AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5('dsir:' || tok), 1, 15))
              AS UBIGINT) % 256 AS b,
         lang
  FROM (
    SELECT doc_id, lang,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
census AS (
  SELECT b, COUNT(*) AS n_raw,
         COUNT(CASE WHEN lang = 'en' THEN 1 END) AS n_target
  FROM toks GROUP BY b
),
ratios AS (
  SELECT b, (n_target + 1) * 1000000 // (n_raw + 1) AS ratio_u FROM census
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(ratio_u) // COUNT(*) AS BIGINT) AS score_u
FROM toks JOIN ratios USING (b)
GROUP BY doc_id ORDER BY score_u DESC, doc_id LIMIT 50
""",
)
def dsir_select_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.dsir_importance(load_table(spark, sf_dir, "documents"))


@register(
    "streaming_bloom_bits",
    # Bloom built incrementally on the stream: the bit set is the
    # distinct (hash-index x bit) relation over distinct keys —
    # dropDuplicates handles the exact-distinct state, and the drained
    # complete-mode table equals the batch build; bit-set union across
    # shards/streams is the Bloom merge rule
    """
SELECT i.i AS r,
       CAST(concat('0x', substr(md5('sbloom' || i.i || ':' || key), 1, 15))
            AS UBIGINT) % 4096 AS bit,
       COUNT(*) AS n_keys
FROM (SELECT DISTINCT user_id AS key FROM events),
     (SELECT UNNEST(range(3)) AS i) i
GROUP BY 1, 2
""",
)
def streaming_bloom_bits_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("r"),
                    F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(f"sbloom{i}:"),
                                        F.col("user_id").cast("string"),
                                    )
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("long"),
                        F.lit(4096),
                    ).alias("bit"),
                )
                for i in range(3)
            ]
        )
    )
    bits = (
        stream.select("user_id")
        .dropDuplicates(["user_id"])
        .select(probes.alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bit").alias("bit"))
        .agg(F.count("*").alias("n_keys"))
    )
    return jobs.run_available_now(bits, "streaming_bloom_bits")


@register(
    "graph_label_propagation",
    # three synchronous LPA rounds unrolled as CTEs; argmax = most
    # frequent neighbor label, smallest label on ties
    """
WITH raw AS (
  SELECT user_id % 200 AS p, event_id % 199 AS q FROM events
  WHERE user_id % 200 <> event_id % 199
),
edges AS (SELECT DISTINCT LEAST(p, q) AS u, GREATEST(p, q) AS v FROM raw),
und AS (
  SELECT u AS src, v AS dst FROM edges
  UNION ALL SELECT v AS src, u AS dst FROM edges
),
l0 AS (SELECT DISTINCT src AS vertex, src AS label FROM und),
v1 AS (
  SELECT dst, label, COUNT(*) AS cnt FROM und JOIN l0 ON und.src = l0.vertex
  GROUP BY dst, label
),
l1 AS (
  SELECT dst AS vertex, label FROM v1
  QUALIFY ROW_NUMBER() OVER (PARTITION BY dst ORDER BY cnt DESC, label) = 1
),
v2 AS (
  SELECT dst, label, COUNT(*) AS cnt FROM und JOIN l1 ON und.src = l1.vertex
  GROUP BY dst, label
),
l2 AS (
  SELECT dst AS vertex, label FROM v2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY dst ORDER BY cnt DESC, label) = 1
),
v3 AS (
  SELECT dst, label, COUNT(*) AS cnt FROM und JOIN l2 ON und.src = l2.vertex
  GROUP BY dst, label
),
l3 AS (
  SELECT dst AS vertex, label FROM v3
  QUALIFY ROW_NUMBER() OVER (PARTITION BY dst ORDER BY cnt DESC, label) = 1
)
SELECT vertex, label FROM l3 ORDER BY vertex
""",
)
def graph_label_propagation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.label_propagation(load_events(spark, sf_dir))


@register(
    "anomaly_mad",
    # discrete medians (quantile_disc == percentile_approx at
    # degenerate accuracy) keep both engines on actual data values
    """
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med
  FROM events GROUP BY event_type
),
resid AS (
  SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_disc(adev, 0.5) AS mad FROM resid
  GROUP BY event_type
)
SELECT r.event_type, COUNT(*) AS n_events,
       COUNT(CASE WHEN r.adev > 3 * d.mad THEN 1 END) AS n_outliers,
       ROUND(MIN(r.med), 2) AS med, ROUND(MIN(d.mad), 2) AS mad,
       ROUND(MAX(CASE WHEN r.adev > 3 * d.mad THEN r.value END), 2)
         AS worst_value
FROM resid r JOIN mad d USING (event_type)
GROUP BY r.event_type ORDER BY r.event_type
""",
)
def anomaly_mad_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.anomaly_mad(load_events(spark, sf_dir))


@register(
    "rag_retrieval",
    # full mirror of the flagship RAG path: chunk arithmetic (the
    # chunk_documents oracle), md5 feature-hashed +-1 embeddings, and
    # exact integer dot-product ranking
    r"""
WITH toks AS (
  SELECT doc_id, str_split_regex(trim(text), '\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_id,
         t[i * 48 + 1 : least((i * 48) + 64, len(t))] AS ct
  FROM toks, generate_series(0, 4096) AS g(i)
  WHERE i <= CEIL(GREATEST(len(t) - 64, 0) / 48.0)
),
tokr AS (SELECT doc_id, chunk_id, UNNEST(ct) AS tok FROM chunks),
vecs AS (
  SELECT doc_id, chunk_id,
         CAST(CAST(concat('0x', substr(md5('ragd:' || tok), 1, 15))
              AS UBIGINT) % 16 AS BIGINT) AS dim,
         CAST(SUM(1 - 2 * CAST(CAST(concat('0x', substr(md5('rags:' || tok), 1, 15))
              AS UBIGINT) % 2 AS BIGINT)) AS BIGINT) AS w
  FROM tokr GROUP BY 1, 2, 3
),
qids AS (SELECT doc_id AS q_doc FROM documents ORDER BY doc_id LIMIT 3),
qvecs AS (
  SELECT q.q_doc, v.dim AS qdim, v.w AS qw
  FROM vecs v JOIN qids q ON v.doc_id = q.q_doc WHERE v.chunk_id = 0
),
dots AS (
  SELECT q.q_doc, v.doc_id, v.chunk_id,
         CAST(SUM(v.w * q.qw) AS BIGINT) AS dot_u
  FROM vecs v JOIN qvecs q ON v.dim = q.qdim AND v.doc_id <> q.q_doc
  GROUP BY 1, 2, 3
)
SELECT q_doc, CAST(rank AS INT) AS rank, doc_id, chunk_id, dot_u FROM (
  SELECT q_doc, doc_id, chunk_id, dot_u,
         ROW_NUMBER() OVER (PARTITION BY q_doc
                            ORDER BY dot_u DESC, doc_id, chunk_id) AS rank
  FROM dots
) WHERE rank <= 5 ORDER BY q_doc, rank
""",
)
def rag_retrieval_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.rag_retrieval(load_table(spark, sf_dir, "documents"))


@register(
    "ann_ivf_incremental",
    # milli-quantized integer centroids (SUM DIV n) and exact bigint
    # distances: assignment is bit-identical across engines
    """
WITH vecs AS (
  SELECT vec_id, label AS list_id,
         list_transform(embedding,
           v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS xu
  FROM embeddings
),
base AS (SELECT * FROM vecs WHERE vec_id % 10 <> 0),
delta AS (SELECT * FROM vecs WHERE vec_id % 10 = 0),
base_dims AS (
  SELECT list_id, generate_subscripts(xu, 1) - 1 AS pos, unnest(xu) AS v
  FROM base
),
centroids AS (
  SELECT list_id, pos, CAST(SUM(v) // COUNT(*) AS BIGINT) AS cu
  FROM base_dims GROUP BY 1, 2
),
delta_dims AS (
  SELECT vec_id, generate_subscripts(xu, 1) - 1 AS pos, unnest(xu) AS v
  FROM delta
),
d2 AS (
  SELECT d.vec_id, c.list_id,
         CAST(SUM((d.v - c.cu) * (d.v - c.cu)) AS BIGINT) AS d2
  FROM delta_dims d JOIN centroids c USING (pos)
  GROUP BY 1, 2
),
assigned AS (
  SELECT list_id, COUNT(*) AS n_delta FROM (
    SELECT vec_id, list_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
    FROM d2
  ) WHERE rn = 1 GROUP BY list_id
),
nb AS (SELECT list_id, COUNT(*) AS n_base FROM base GROUP BY list_id)
SELECT nb.list_id, nb.n_base, COALESCE(a.n_delta, 0) AS n_delta,
       nb.n_base + COALESCE(a.n_delta, 0) AS n_total
FROM nb LEFT JOIN assigned a USING (list_id)
ORDER BY nb.list_id
""",
)
def ann_ivf_incremental_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.ann_ivf_incremental(load_table(spark, sf_dir, "embeddings"))


@register(
    "source_mixture_temperature",
    # IEEE sqrt is correctly rounded: floor(sqrt(n*1e6)) is the same
    # bigint on both engines; quotas are exact integer proportions
    """
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
weighted AS (
  SELECT source, n_docs,
         CAST(FLOOR(SQRT(n_docs * 1000000)) AS BIGINT) AS weight_u
  FROM counts
),
total AS (SELECT CAST(SUM(weight_u) AS BIGINT) AS total_w FROM weighted)
SELECT source, n_docs, weight_u,
       CAST(10000 * weight_u // total_w AS BIGINT) AS quota
FROM weighted, total ORDER BY source
""",
)
def source_mixture_temperature_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.source_mixture_temperature(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "join_shuffle_hash_hint",
    # the hint is plan-internal: semantics = the plain equi-join
    """
SELECT o.o_orderpriority, COUNT(*) AS n_pairs
FROM events e JOIN orders o ON e.user_id = o.o_custkey
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
""",
)
def join_shuffle_hash_hint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.join_shuffle_hash_hint(
        load_events(spark, sf_dir), load_table(spark, sf_dir, "orders")
    )


@register(
    "streaming_attribution_right",
    # RIGHT OUTER stream-stream join: matched rows equal the batch
    # self-join; organic purchases emit (NULL, purchase_id) once the
    # per-stream-min terminal watermark passes the purchase time
    """
WITH wm AS (
  SELECT LEAST(
           (SELECT MAX(ts) FROM events WHERE event_type = 'click'),
           (SELECT MAX(ts) FROM events WHERE event_type = 'purchase')
         ) - INTERVAL 2 HOUR AS w
),
matched AS (
  SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
  FROM events c JOIN events p
    ON c.user_id = p.user_id
   AND c.event_type = 'click' AND p.event_type = 'purchase'
   AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
),
unmatched_p AS (
  SELECT CAST(NULL AS BIGINT) AS click_id, p.event_id AS purchase_id,
         p.user_id
  FROM events p, wm
  WHERE p.event_type = 'purchase'
    AND p.ts < wm.w
    AND NOT EXISTS (
      SELECT 1 FROM events c
      WHERE c.user_id = p.user_id AND c.event_type = 'click'
        AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    )
)
SELECT * FROM matched UNION ALL SELECT * FROM unmatched_p
""",
)
def streaming_attribution_right_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    return jobs.run_available_now(
        jobs.attribution_join_right(stream), "streaming_attribution_right"
    )


@register(
    "streaming_resume_exactly_once",
    # the whole point is that a RESTARTED job (same checkpoint) neither
    # loses nor duplicates: injected at-least-once replays are dropped
    # by dedup state recovered from the checkpoint, so the sink equals
    # the plain batch projection of the events exactly once
    """
SELECT event_id, user_id, event_type, value FROM events
""",
)
def streaming_resume_exactly_once_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exactly-once across a restart — the checkpoint-recovery story:

    phase 1: drain half-ish of the feed (AvailableNow) through
    dropDuplicates(event_id) into a parquet sink with a PERSISTENT
    checkpoint; phase 2: new files arrive INCLUDING at-least-once
    replays of phase-1 events (the upstream-retry failure mode the
    reference's fetch loop is exposed to, kinesisReader/index.js:39-44),
    and the SAME query restarts against the same checkpoint. The file
    source's processed-file log skips nothing and repeats nothing, and
    the dedup state store — recovered from the checkpoint, not rebuilt
    — drops every replay. The sink then equals the batch projection
    exactly once, which is the oracle.

    This is the operational guarantee the engine inherits from
    Structured Streaming's checkpoint protocol (WAL of file batches +
    versioned state store), demonstrated end-to-end rather than
    asserted."""
    import tempfile

    from .sources.tables import normalize_timestamps
    from .streaming.jobs import ensure_confs

    ensure_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream_dir = tempfile.mkdtemp(prefix="ksr_resume_src_")
    out_dir = tempfile.mkdtemp(prefix="ksr_resume_out_")
    ckpt_dir = tempfile.mkdtemp(prefix="ksr_resume_ckpt_")

    def drain() -> None:
        stream = normalize_timestamps(
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(stream_dir)
        ).select("event_id", "user_id", "event_type", "value")
        q = (
            stream.dropDuplicates(["event_id"])
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # phase 1: the first 3/4 of events, 4 files
    static.filter(F.col("event_id") % 4 != 0).repartition(4).write.mode(
        "append"
    ).parquet(stream_dir)
    drain()
    # phase 2: the remaining quarter PLUS replays of phase-1 events
    static.filter(
        (F.col("event_id") % 4 == 0) | (F.col("event_id") % 3 == 0)
    ).repartition(3).write.mode("append").parquet(stream_dir)
    drain()
    return spark.read.schema(
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
    ).parquet(out_dir)


@register(
    "expectations_check",
    # exact integer counts: the constraint report is engine-deterministic
    """
WITH agg AS (
  SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_ids,
         COUNT(user_id) AS n_user,
         COUNT(CASE WHEN value >= 0 THEN 1 END) AS n_nonneg,
         COUNT(CASE WHEN event_type IN
               ('click','view','purchase','signup','error') THEN 1 END)
           AS n_domain
  FROM events
),
orph AS (
  SELECT COUNT(*) AS n_orphans FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT check_name, observed, threshold, passed FROM (
  SELECT 'events_nonempty' AS check_name, n AS observed,
         CAST(1 AS BIGINT) AS threshold, n >= 1 AS passed FROM agg
  UNION ALL
  SELECT 'event_id_unique', n_ids, n, n_ids = n FROM agg
  UNION ALL
  SELECT 'user_id_complete', n_user, n, n_user = n FROM agg
  UNION ALL
  SELECT 'value_nonnegative', n_nonneg, n, n_nonneg = n FROM agg
  UNION ALL
  SELECT 'event_type_in_domain', n_domain, n, n_domain = n FROM agg
  UNION ALL
  SELECT 'orders_custkey_refint', n_orphans, CAST(0 AS BIGINT),
         n_orphans = 0 FROM orph
) ORDER BY check_name
""",
)
def expectations_check_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.expectations_check(
        load_events(spark, sf_dir),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


@register(
    "drift_report",
    # cross-multiplied TVD numerators: bigint-exact, no division or log
    """
WITH hist AS (
  SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bucket,
         COUNT(CASE WHEN event_id % 2 = 0 THEN 1 END) AS n_a,
         COUNT(CASE WHEN event_id % 2 <> 0 THEN 1 END) AS n_b
  FROM events GROUP BY 1
),
totals AS (
  SELECT CAST(SUM(n_a) AS BIGINT) AS t_a, CAST(SUM(n_b) AS BIGINT) AS t_b
  FROM hist
)
SELECT bucket, n_a, n_b,
       ABS(n_a * t_b - n_b * t_a) AS dev_u
FROM hist, totals ORDER BY bucket
""",
)
def drift_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.drift_report(load_events(spark, sf_dir))


@register(
    "model_eval_auc",
    # same logits (quality_model_score CTE), same midrank algebra:
    # 2U is an exact bigint; one final IEEE division, floor-half-up
    f"""
WITH f AS (
  SELECT doc_id, lang,
         len({_TOKS})::DOUBLE AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         len(list_filter({_TOKS}, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
           AS n_stop,
         (length(text) - length(replace(text, '.', '')))::DOUBLE AS n_dots
  FROM documents
), wts AS (
  SELECT i.i AS i,
         2 * (CAST(concat('0x', substr(md5('qw:' || i.i), 1, 15)) AS UBIGINT)
              / 1152921504606846976.0) - 1 AS w
  FROM (SELECT UNNEST(range(5)) AS i) i
), z AS (
  SELECT f.doc_id, f.lang = 'en' AS is_pos,
         (SELECT w FROM wts WHERE i = 0) * (n_tokens / 100.0)
         + (SELECT w FROM wts WHERE i = 1) * (n_stop / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 2) * (n_chars / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 3) * (n_dots / (n_chars + 1.0))
         + (SELECT w FROM wts WHERE i = 4) AS z
  FROM f
), ranked AS (
  SELECT is_pos,
         FLOOR(z * 1e4 + 0.5) / 1e4 AS logit,
         RANK() OVER (ORDER BY FLOOR(z * 1e4 + 0.5) / 1e4) AS min_rank,
         COUNT(*) OVER (PARTITION BY FLOOR(z * 1e4 + 0.5) / 1e4) AS ties
  FROM z
), agg AS (
  SELECT COUNT(CASE WHEN is_pos THEN 1 END) AS n_pos,
         COUNT(CASE WHEN NOT is_pos THEN 1 END) AS n_neg,
         CAST(SUM(CASE WHEN is_pos THEN 2 * min_rank + ties - 1 ELSE 0 END)
              - COUNT(CASE WHEN is_pos THEN 1 END)
                * (COUNT(CASE WHEN is_pos THEN 1 END) + 1) AS BIGINT) AS u2
  FROM ranked
)
SELECT n_pos, n_neg, u2,
       FLOOR(u2 / (2.0 * n_pos * n_neg) * 1e6 + 0.5) / 1e6 AS auc
FROM agg
""",
)
def model_eval_auc_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.model_eval_auc(load_table(spark, sf_dir, "documents"))


def _bpe_round_sql(i: int) -> str:
    """One unrolled BPE round: pair census + argmax + greedy merge
    (identical window algebra to operators/text.bpe_train_merges)."""
    p, n = f"s{i - 1}", i
    return f"""
r{n}_lead AS (
  SELECT w, freq, seq, sym,
         LEAD(sym) OVER (PARTITION BY w ORDER BY seq) AS nxt
  FROM {p}
),
r{n}_best AS (
  SELECT sym AS a, nxt AS b, CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM r{n}_lead WHERE nxt IS NOT NULL
  GROUP BY sym, nxt ORDER BY pair_count DESC, sym, nxt LIMIT 1
),
r{n}_marked AS (
  SELECT w, freq, seq, sym, nxt,
         (sym = (SELECT a FROM r{n}_best)
          AND nxt = (SELECT b FROM r{n}_best)) AS cand,
         SUM(CASE WHEN sym = (SELECT a FROM r{n}_best)
                   AND nxt = (SELECT b FROM r{n}_best)
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY w ORDER BY seq) AS crn
  FROM r{n}_lead
),
r{n}_keep AS (
  SELECT w, freq, seq, sym, nxt,
         cand AND ((seq - MIN(seq) OVER (PARTITION BY w,
             CASE WHEN cand THEN seq - crn END)) % 2 = 0) AS keep
  FROM r{n}_marked
),
r{n}_drop AS (
  SELECT w, freq, seq, sym, nxt, keep,
         COALESCE(LAG(keep) OVER (PARTITION BY w ORDER BY seq), FALSE) AS drp
  FROM r{n}_keep
),
s{n} AS (
  SELECT w, freq,
         ROW_NUMBER() OVER (PARTITION BY w ORDER BY seq) - 1 AS seq,
         CASE WHEN keep THEN sym || nxt ELSE sym END AS sym
  FROM r{n}_drop WHERE NOT COALESCE(drp, FALSE)
)"""


_BPE_ORACLE = (
    """
WITH words AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
    FROM documents
  ) WHERE w <> '' GROUP BY w
),
s0 AS (
  SELECT w, freq, generate_subscripts(syms, 1) - 1 AS seq, unnest(syms) AS sym
  FROM (SELECT w, freq,
               list_filter(string_split(w, ''), c -> c <> '') AS syms
        FROM words)
),"""
    + ",".join(_bpe_round_sql(i) for i in (1, 2, 3))
    + """
SELECT * FROM (
  SELECT 1 AS round, a AS lhs, b AS rhs, pair_count FROM r1_best
  UNION ALL SELECT 2, a, b, pair_count FROM r2_best
  UNION ALL SELECT 3, a, b, pair_count FROM r3_best
) ORDER BY round
"""
)


@register("bpe_train_merges", _BPE_ORACLE)
def bpe_train_merges_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.bpe_train_merges(load_table(spark, sf_dir, "documents"))


@register(
    "interval_coverage",
    # same sweep line: +1 on the start day, -1 the day after the end
    """
WITH deltas AS (
  SELECT day, CAST(SUM(delta) AS BIGINT) AS d FROM (
    SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM orders
    UNION ALL
    SELECT CAST(o_orderdate AS DATE) + INTERVAL 31 DAY, -1 FROM orders
  ) GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(SUM(d) OVER (ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_active
FROM deltas ORDER BY day
""",
)
def interval_coverage_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.interval_coverage(load_table(spark, sf_dir, "orders"))


@register(
    "drift_ks",
    # exact integer ECDF cross-products; one final IEEE division
    """
WITH per_val AS (
  SELECT value,
         COUNT(CASE WHEN event_id % 2 = 0 THEN 1 END) AS n_a,
         COUNT(CASE WHEN event_id % 2 <> 0 THEN 1 END) AS n_b
  FROM events GROUP BY value
),
cum AS (
  SELECT SUM(n_a) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         SUM(n_b) OVER (ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
  FROM per_val
),
totals AS (
  SELECT CAST(SUM(n_a) AS BIGINT) AS t_a, CAST(SUM(n_b) AS BIGINT) AS t_b
  FROM per_val
)
SELECT t_a AS n_a, t_b AS n_b,
       CAST(MAX(ABS(cum_a * t_b - cum_b * t_a)) AS BIGINT) AS d_num,
       FLOOR(CAST(MAX(ABS(cum_a * t_b - cum_b * t_a)) AS BIGINT)
             / (t_a * t_b) * 1e6 + 0.5) / 1e6 AS ks_d
FROM cum, totals GROUP BY t_a, t_b
""",
)
def drift_ks_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.drift_ks(load_events(spark, sf_dir))


_BPE_VOCAB_ORACLE = _BPE_ORACLE.split("SELECT * FROM (")[0] + """
SELECT sym, CAST(SUM(freq) AS BIGINT) AS n_occurrences
FROM s3 GROUP BY sym ORDER BY n_occurrences DESC, sym LIMIT 20
"""


@register("bpe_encoded_vocab", _BPE_VOCAB_ORACLE)
def bpe_encoded_vocab_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.bpe_encoded_vocab(load_table(spark, sf_dir, "documents"))


@register(
    "sink_python_datasource",
    # full write -> read round trip through BOTH halves of the Python
    # DataSource: rows serialize to wire pages (<=500 records per
    # flush, the PutRecords limit), land in shard files via the
    # writer's commit protocol, and read back through the reader
    # partition-per-shard — identity oracle on the event projection
    """
SELECT event_id, user_id, event_type, value FROM events
""",
)
def sink_python_datasource_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .sources.python_source import KinesisBackfillDataSource

    spark.dataSource.register(KinesisBackfillDataSource)
    events = load_events(spark, sf_dir)
    payload = F.to_json(
        F.struct("event_id", "user_id", "event_type", "value")
    )
    wire = events.select(F.encode(payload, "utf-8").alias("data")).repartition(
        4, F.col("data")
    )
    out_dir = tempfile.mkdtemp(prefix="ksr_wire_out_")
    wire.write.format("kinesis_backfill").option("path", out_dir).mode(
        "append"
    ).save()
    back = (
        spark.read.format("kinesis_backfill").option("path", out_dir).load()
    )
    parsed = back.select(
        F.from_json(
            F.decode("data", "utf-8"),
            "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE",
        ).alias("r")
    )
    return parsed.select("r.event_id", "r.user_id", "r.event_type", "r.value").orderBy(
        "event_id"
    )


@register(
    "table_checksum",
    # same 60-bit md5 row hashes, same XOR fold: order-independent on
    # both engines; quantized ints avoid float-formatting divergence
    """
WITH ev AS (
  SELECT CAST(concat('0x', substr(md5(
           event_id || chr(31) || strftime(ts, '%Y-%m-%d %H:%M:%S')
           || chr(31) || user_id || chr(31) || event_type || chr(31)
           || CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)), 1, 15))
         AS UBIGINT) AS h
  FROM events
),
od AS (
  SELECT CAST(concat('0x', substr(md5(
           o_orderkey || chr(31) || o_custkey || chr(31)
           || CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)), 1, 15))
         AS UBIGINT) AS h
  FROM orders
),
li AS (
  SELECT CAST(concat('0x', substr(md5(
           l_orderkey || chr(31) || l_linenumber || chr(31)
           || CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)), 1, 15))
         AS UBIGINT) AS h
  FROM lineitem
)
SELECT table_name, n_rows, checksum FROM (
  SELECT 'events' AS table_name, COUNT(*) AS n_rows,
         CAST(bit_xor(h) AS BIGINT) AS checksum FROM ev
  UNION ALL
  SELECT 'lineitem', COUNT(*), CAST(bit_xor(h) AS BIGINT) FROM li
  UNION ALL
  SELECT 'orders', COUNT(*), CAST(bit_xor(h) AS BIGINT) FROM od
) ORDER BY table_name
""",
)
def table_checksum_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.table_checksum(
        load_events(spark, sf_dir),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register(
    "funnel_asof_chain",
    # two chained ASOF legs, ties pre-collapsed to MAX(event_id) per
    # (user, ts) so both engines' as-of picks are identical
    """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts, MAX(event_id) AS event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
v AS (
  SELECT user_id, ts, MAX(event_id) AS event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
s1 AS (
  SELECT p.user_id, p.purchase_id, p.p_ts,
         c.ts AS click_ts, c.event_id AS click_id_raw
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.p_ts >= c.ts
),
s2 AS (
  SELECT s1.user_id, s1.purchase_id, s1.p_ts, s1.click_ts, s1.click_id_raw,
         v.ts AS view_ts, v.event_id AS view_id_raw
  FROM s1 ASOF LEFT JOIN v
    ON s1.user_id = v.user_id AND s1.click_ts >= v.ts
)
SELECT user_id, purchase_id,
       CASE WHEN click_ts >= p_ts - INTERVAL 2 HOUR
            THEN click_id_raw END AS click_id,
       CASE WHEN click_ts >= p_ts - INTERVAL 2 HOUR
             AND view_ts >= click_ts - INTERVAL 2 HOUR
            THEN view_id_raw END AS view_id
FROM s2 ORDER BY purchase_id
""",
)
def funnel_asof_chain_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.funnel_asof_chain(load_events(spark, sf_dir))


@register(
    "bigram_logprob",
    # head counts come from the BIGRAM relation (tokens with a
    # successor), so P(.|w) sums to 1 per head exactly
    """
WITH toks AS (
  SELECT doc_id, pos, tok FROM (
    SELECT doc_id,
           generate_subscripts(t, 1) AS pos, unnest(t) AS tok
    FROM (SELECT doc_id,
                 string_split_regex(lower(trim(text)), '\\s+') AS t
          FROM documents)
  ) WHERE tok <> ''
),
bigrams AS (
  SELECT doc_id, tok, nxt FROM (
    SELECT doc_id, tok,
           LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM toks
  ) WHERE nxt IS NOT NULL
),
pc AS (SELECT tok, nxt, COUNT(*) AS c2 FROM bigrams GROUP BY tok, nxt),
hc AS (SELECT tok, COUNT(*) AS c1 FROM bigrams GROUP BY tok)
SELECT b.doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(LN(pc.c2 / hc.c1)), 6) AS avg_logprob
FROM bigrams b JOIN pc ON b.tok = pc.tok AND b.nxt = pc.nxt
JOIN hc ON b.tok = hc.tok
GROUP BY b.doc_id ORDER BY b.doc_id
""",
)
def bigram_logprob_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.bigram_logprob(load_table(spark, sf_dir, "documents"))


@register(
    "minhash_estimate_report",
    # identical md5 permutations over the same string grams; errors
    # quantize through one fixed IEEE expression
    f"""
WITH g AS (SELECT doc_id, lang, source, {_GRAMS} AS grams FROM documents),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         ROUND(len(list_intersect(a.grams, b.grams))::DOUBLE
               / len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
  FROM g a JOIN g b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.3
),
gr AS (SELECT doc_id, UNNEST(grams) AS gram FROM g),
sig AS (
  SELECT doc_id, i.i AS i,
         MIN(CAST(CAST(concat('0x', substr(md5('mh' || i.i || ':' || gram), 1, 15))
             AS UBIGINT) AS BIGINT)) AS m
  FROM gr, (SELECT UNNEST(range(32)) AS i) i
  GROUP BY doc_id, i.i
),
matched AS (
  SELECT p.a_id, p.b_id, p.jaccard,
         SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS matches
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.a_id
  JOIN sig sb ON sb.doc_id = p.b_id AND sb.i = sa.i
  GROUP BY 1, 2, 3
),
per AS (
  SELECT jaccard, matches / 32.0 AS est,
         CAST(FLOOR(ABS(matches / 32.0 - jaccard) * 1e6 + 0.5) AS BIGINT) AS err_u
  FROM matched
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(err_u) // COUNT(*) AS BIGINT) AS mean_err_u,
       CAST(MAX(err_u) AS BIGINT) AS max_err_u,
       COUNT(CASE WHEN est > jaccard THEN 1 END) AS n_over,
       COUNT(CASE WHEN est < jaccard THEN 1 END) AS n_under
FROM per
""",
)
def minhash_estimate_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.minhash_estimate_report(load_table(spark, sf_dir, "documents"))


@register(
    "agg_boxplot",
    # discrete quartiles (quantile_disc twin); whisker flags exact
    """
WITH q AS (
  SELECT event_type,
         quantile_disc(value, 0.25) AS q1,
         quantile_disc(value, 0.5) AS med,
         quantile_disc(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT e.event_type, COUNT(*) AS n,
       ROUND(MIN(q.q1), 2) AS q1, ROUND(MIN(q.med), 2) AS med,
       ROUND(MIN(q.q3), 2) AS q3,
       COUNT(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1) THEN 1 END)
         AS n_low_outliers,
       COUNT(CASE WHEN e.value > q.q3 + 1.5 * (q.q3 - q.q1) THEN 1 END)
         AS n_high_outliers
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
""",
)
def agg_boxplot_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.agg_boxplot(load_events(spark, sf_dir))


@register(
    "k_anonymity_report",
    # exact integer class sizes over the quasi-identifier domain
    """
WITH classes AS (
  SELECT event_type, EXTRACT(HOUR FROM ts) AS hod, user_id % 100 AS cohort,
         COUNT(*) AS sz
  FROM events GROUP BY 1, 2, 3
)
SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(sz) AS BIGINT) AS min_class_size,
       COUNT(CASE WHEN sz < 5 THEN 1 END) AS n_classes_below_k,
       CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk
FROM classes
""",
)
def k_anonymity_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.k_anonymity_report(load_events(spark, sf_dir))


@register(
    "obs_metrics",
    # the observed metrics equal the plain aggregates — observe() just
    # piggybacks them on the pipeline's own pass
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS sum_value,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
       MAX(value) AS max_value
FROM events
""",
)
def obs_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via the Observation API: the metrics a
    production job reports per run (row counts, value mass, class
    counts) ride the SAME job as the pipeline's real action — observe()
    attaches accumulator-backed aggregates to a plan node, so the scan
    is paid ONCE and the metrics cost nothing extra (vs a second
    .agg() pass that rescans at 100 TB). The correctness contract:
    observed metrics == the standalone aggregates, which is the
    oracle."""
    from pyspark.sql import Observation

    events = load_events(spark, sf_dir)
    obs = Observation("pipeline_metrics")
    observed = events.observe(
        obs,
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_clicks"),
        # DISTINCT aggregates are rejected in observed metrics (they
        # can't ride an accumulator) — max is the idiomatic substitute
        F.max("value").alias("max_value"),
    )
    # the pipeline's own action materializes the metrics as a side effect
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_events"], m["sum_value"], m["n_clicks"], m["max_value"])],
        "n_events BIGINT, sum_value DOUBLE, n_clicks BIGINT, max_value DOUBLE",
    )


@register(
    "html_extract_text",
    # identical synthetic pages, identical RE2-safe extraction
    """
WITH pages AS (
  SELECT doc_id, text,
         '<html><head><title>Doc ' || doc_id
         || '</title><meta charset="utf-8"></head><body>'
         || '<nav>home | about | contact</nav>'
         || '<div class="ad">SPONSORED: buy now</div><p>'
         || text || '</p><footer>(c) 2026 example.com</footer></body></html>'
           AS html
  FROM documents
),
ex AS (
  SELECT doc_id, text, html,
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(html, '<head>.*?</head>', ' ', 'g'),
            '<nav>.*?</nav>', ' ', 'g'),
          '<div class="ad">.*?</div>', ' ', 'g'),
        '<footer>.*?</footer>', ' ', 'g'),
      '<[^>]+>', ' ', 'g')) AS extracted
  FROM pages
)
SELECT doc_id, length(html) AS n_chars_html,
       length(regexp_replace(extracted, '\\s+', ' ', 'g')) AS n_chars_extracted,
       regexp_replace(extracted, '\\s+', ' ', 'g')
         = regexp_replace(trim(text), '\\s+', ' ', 'g') AS roundtrip_ok,
       md5(regexp_replace(extracted, '\\s+', ' ', 'g')) AS fingerprint
FROM ex ORDER BY doc_id
""",
)
def html_extract_text_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.html_extract_text(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext: BM25 ranked retrieval + positional phrase search (round 2) — the
# classic-IR completions of the retrieval ladder (text_search_boolean ->
# tfidf_top_terms -> bm25_retrieval -> rag_retrieval). Reference has no
# search surface; extension mandated by the north star.
# ---------------------------------------------------------------------------
_TOKS_CTE = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       LATERAL UNNEST(string_split(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' ')) AS t(term)
  WHERE t.term <> ''
)"""


@register(
    "bm25_retrieval",
    # mirror of text.bm25_retrieval: identical fixed float sequence,
    # half-up micro-unit quantization, exact bigint combine, ties on
    # (su DESC, doc_id)
    _TOKS_CTE
    + """
, q(query_id, term) AS (
  VALUES (1,'hash'),(1,'join'),(2,'sort'),(2,'merge'),(3,'customer'),(3,'value')
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), tot AS (
  SELECT COUNT(*) AS s_tokens, COUNT(DISTINCT doc_id) AS n_docs FROM toks
), part AS (
  SELECT q.query_id, tf.doc_id,
         CAST(FLOOR(
           (LN(1.0 + (tot.n_docs - df.df + 0.5) / (df.df + 0.5))
            * (tf.tf * 2.2)
            / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / (tot.s_tokens / CAST(tot.n_docs AS DOUBLE))))))
           * 1e6 + 0.5) AS BIGINT) AS su
  FROM tf
  JOIN q USING (term)
  JOIN dl USING (doc_id)
  JOIN df USING (term)
  CROSS JOIN tot
), agg AS (
  SELECT query_id, doc_id, SUM(su) AS su FROM part GROUP BY query_id, doc_id
), ranked AS (
  SELECT query_id, doc_id, su,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY su DESC, doc_id) AS rank
  FROM agg
)
SELECT query_id, doc_id, su / 1e6 AS bm25, rank
FROM ranked WHERE rank <= 3 ORDER BY query_id, rank
""",
)
def bm25_retrieval_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.bm25_retrieval(load_table(spark, sf_dir, "documents"))


@register(
    "phrase_search",
    # positional postings via 1-based array subscripts; adjacency is
    # translation-invariant so the 0- vs 1-based difference vs Spark's
    # posexplode cancels
    """
WITH arrs AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' ') AS arr
  FROM documents
), idx AS (
  SELECT doc_id, unnest(generate_series(1, len(arr))) AS pos, arr FROM arrs
), posting AS (
  SELECT doc_id, pos, arr[pos] AS term FROM idx WHERE arr[pos] <> ''
), ph(phrase_id, w0, w1) AS (
  VALUES (1,'hash','join'),(2,'table','scan')
)
SELECT ph.phrase_id, p0.doc_id, COUNT(*) AS n_hits
FROM posting p0
JOIN ph ON p0.term = ph.w0
JOIN posting p1
  ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1 AND p1.term = ph.w1
GROUP BY ph.phrase_id, p0.doc_id
ORDER BY ph.phrase_id, p0.doc_id
""",
)
def phrase_search_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.phrase_search(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# ext: statistics family round-2 additions — categorical association
# (chi-squared), per-key OLS trend, series autocorrelation, CUSUM change
# detection. All exact-integer cores with one final float op, fully
# mirrored in SQL (the drift_report / drift_ks / model_eval_auc
# convention).
# ---------------------------------------------------------------------------
@register(
    "chi2_independence",
    # DuckDB dayofweek is Sunday=0..Saturday=6; Spark's is Sunday=1..7,
    # hence the +1
    """
WITH cells AS (
  SELECT event_type AS r, dayofweek(ts) + 1 AS c, COUNT(*) AS o
  FROM events GROUP BY 1, 2
), rm AS (SELECT r, SUM(o) AS rm FROM cells GROUP BY r),
cm AS (SELECT c, SUM(o) AS cm FROM cells GROUP BY c),
n AS (SELECT SUM(o) AS n FROM cells),
per AS (
  SELECT cells.r, cells.c, cells.o,
         CAST(FLOOR(
           CAST(cells.o * n.n - rm.rm * cm.cm AS DOUBLE)
           * CAST(cells.o * n.n - rm.rm * cm.cm AS DOUBLE)
           / CAST(rm.rm * cm.cm * n.n AS DOUBLE)
           * 1e6 + 0.5) AS BIGINT) AS term_u
  FROM cells JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN n
)
SELECT COUNT(*) AS n_cells,
       (COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT c) - 1) AS dof,
       CAST(SUM(o) AS BIGINT) AS n,
       SUM(term_u) / 1e6 AS chi2
FROM per
""",
)
def chi2_independence_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.chi2_independence(load_events(spark, sf_dir))


@register(
    "trend_lines",
    # HUGEINT here == DECIMAL(38,0) on the Spark side: both exact for
    # the ~21-digit moment products; the two divisions are the only
    # float ops, in the same left-assoc order
    """
WITH d0 AS (SELECT CAST(MIN(ts) AS DATE) AS d0 FROM events),
base AS (
  SELECT event_type,
         datediff('day', d0.d0, CAST(ts AS DATE)) AS x,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS yu
  FROM events, d0
), m AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(yu) AS sy,
         SUM(x * x) AS sxx, SUM(x * yu) AS sxy
  FROM base GROUP BY event_type
), fit AS (
  SELECT event_type, n, sx, sy,
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
         / 100.0 AS slope
  FROM m
)
SELECT event_type, n,
       FLOOR(slope * 1e6 + 0.5) / 1e6 AS slope_per_day,
       FLOOR((CAST(sy AS DOUBLE) / 100.0 - slope * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS intercept
FROM fit ORDER BY event_type
""",
)
def trend_lines_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.trend_lines(load_events(spark, sf_dir))


@register(
    "acf_daily",
    """
WITH days AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x FROM events GROUP BY 1
), tot AS (SELECT COUNT(*) AS nd, SUM(x) AS s FROM days),
lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
pairs AS (
  SELECT lag, COUNT(*) AS n_pairs,
         SUM((t.nd * a.x - t.s) * (t.nd * b.x - t.s)) AS num
  FROM days a
  CROSS JOIN lags
  JOIN days b ON datediff('day', a.d, b.d) = lag
  CROSS JOIN tot t
  GROUP BY lag
), den AS (
  SELECT SUM((t.nd * x - t.s) * (t.nd * x - t.s)) AS den FROM days, tot t
)
SELECT lag, n_pairs,
       FLOOR(CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE) * 1e6 + 0.5) / 1e6 AS acf
FROM pairs, den ORDER BY lag
""",
)
def acf_daily_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.acf_daily(load_events(spark, sf_dir))


@register(
    "cusum_changepoint",
    """
WITH days AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x FROM events GROUP BY 1
), tot AS (SELECT COUNT(*) AS nd, SUM(x) AS s FROM days),
base AS (SELECT d, x, nd, s, nd * x - s AS dev FROM days, tot),
pref AS (
  SELECT *, SUM(dev) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM base
), cus AS (
  SELECT d, x, nd, s,
         p - LEAST(MIN(p) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS up_u,
         GREATEST(MAX(p) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) - p AS down_u
  FROM pref
)
SELECT strftime(d, '%Y-%m-%d') AS d, x,
       FLOOR(up_u / CAST(nd AS DOUBLE) * 1e6 + 0.5) / 1e6 AS cusum_up,
       FLOOR(down_u / CAST(nd AS DOUBLE) * 1e6 + 0.5) / 1e6 AS cusum_down,
       up_u > 4 * s AS alarm_up,
       down_u > 4 * s AS alarm_down
FROM cus ORDER BY d
""",
)
def cusum_changepoint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.cusum_changepoint(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# ext: round-2 cohort — market-basket rules, bounded shortest path, KMV
# theta-sketch intersection, grid-bucketed spatial radius join.
# ---------------------------------------------------------------------------
@register(
    "assoc_rules",
    """
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS o, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey
), n AS (SELECT COUNT(DISTINCT o) AS n FROM baskets),
ic AS (SELECT item, COUNT(*) AS cnt FROM baskets GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS cooc
  FROM baskets a JOIN baskets b ON a.o = b.o AND a.item < b.item
  GROUP BY 1, 2
)
SELECT item_a, item_b, cooc,
       FLOOR(CAST(cooc AS DOUBLE) / CAST(n.n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS support,
       FLOOR(CAST(cooc AS DOUBLE) / CAST(ca.cnt AS DOUBLE) * 1e6 + 0.5) / 1e6 AS confidence,
       FLOOR(CAST(cooc * n.n AS DOUBLE) / CAST(ca.cnt * cb.cnt AS DOUBLE) * 1e6 + 0.5) / 1e6 AS lift
FROM pairs
JOIN ic ca ON ca.item = pairs.item_a
JOIN ic cb ON cb.item = pairs.item_b
CROSS JOIN n
WHERE cooc * 200 >= n.n
ORDER BY lift DESC, item_a, item_b
LIMIT 50
""",
)
def assoc_rules_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.assoc_rules(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "shortest_path_bounded",
    # 4 unrolled Bellman-Ford rounds — exact integer min-plus algebra,
    # bit-identical to the Spark driver-composed rounds
    """
WITH edges AS (
  SELECT user_id AS src, event_id % 500 AS dst, MIN(event_id % 9) + 1 AS w
  FROM events GROUP BY 1, 2
), d0 AS (
  SELECT MIN(user_id) AS node, CAST(0 AS BIGINT) AS dist FROM events
), d1 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT * FROM d0
    UNION ALL
    SELECT e.dst, d.dist + e.w FROM d0 d JOIN edges e ON e.src = d.node
  ) GROUP BY node
), d2 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT * FROM d1
    UNION ALL
    SELECT e.dst, d.dist + e.w FROM d1 d JOIN edges e ON e.src = d.node
  ) GROUP BY node
), d3 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT * FROM d2
    UNION ALL
    SELECT e.dst, d.dist + e.w FROM d2 d JOIN edges e ON e.src = d.node
  ) GROUP BY node
), d4 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT * FROM d3
    UNION ALL
    SELECT e.dst, d.dist + e.w FROM d3 d JOIN edges e ON e.src = d.node
  ) GROUP BY node
)
SELECT node, dist FROM d4 ORDER BY node
""",
)
def shortest_path_bounded_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.shortest_path_bounded(load_events(spark, sf_dir))


@register(
    "kmv_intersection",
    # full sketch mirror: same 60-bit md5 hashes, same k-smallest
    # retention, same theta algebra — not a bound check
    """
WITH pairs(type_a, type_b) AS (
  VALUES ('click','view'),('click','purchase'),('view','purchase')
), du AS (
  SELECT DISTINCT event_type, user_id FROM events
), hashed AS (
  SELECT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT AS h
  FROM du
), sk AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed QUALIFY rn <= 64
), est AS (
  SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS theta,
         CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
              ELSE 63.0 * 1152921504606846976.0 / CAST(MAX(h) AS DOUBLE) END AS est,
         CASE WHEN COUNT(*) < 64 THEN 1152921504606846976 ELSE MAX(h) END AS bound
  FROM sk GROUP BY event_type
), inter AS (
  SELECT p.type_a, p.type_b, COUNT(*) AS n_common,
         MIN(LEAST(ea.bound, eb.bound)) AS theta_min
  FROM pairs p
  JOIN sk sa ON sa.event_type = p.type_a
  JOIN sk sb ON sb.event_type = p.type_b AND sb.h = sa.h
  JOIN est ea ON ea.event_type = p.type_a
  JOIN est eb ON eb.event_type = p.type_b
  WHERE sa.h <= LEAST(ea.bound, eb.bound)
  GROUP BY p.type_a, p.type_b
), exact AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS exact_intersection
  FROM du a JOIN du b ON a.user_id = b.user_id
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       FLOOR(ea.est * 1e6 + 0.5) / 1e6 AS est_a,
       FLOOR(eb.est * 1e6 + 0.5) / 1e6 AS est_b,
       COALESCE(i.n_common, 0) AS n_common,
       FLOOR(COALESCE(CAST(i.n_common AS DOUBLE) * 1152921504606846976.0
                      / CAST(i.theta_min AS DOUBLE), 0.0) * 1e6 + 0.5) / 1e6 AS est_intersection,
       COALESCE(x.exact_intersection, 0) AS exact_intersection
FROM pairs p
LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
JOIN est ea ON ea.event_type = p.type_a
JOIN est eb ON eb.event_type = p.type_b
LEFT JOIN exact x ON x.type_a = p.type_a AND x.type_b = p.type_b
ORDER BY p.type_a, p.type_b
""",
)
def kmv_intersection_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.kmv_intersection(load_events(spark, sf_dir))


@register(
    "grid_radius_join",
    # BRUTE-FORCE oracle on purpose: the engine's 3x3 grid probe must
    # find exactly the pairs the cross product finds — a completeness
    # proof of the bucketing, not just a mirror
    """
WITH pts AS (
  SELECT event_id, event_type,
         (event_id * 2654435761) % 1000 AS x,
         (user_id * 40503 + event_id * 97) % 1000 AS y
  FROM events
), a AS (SELECT event_id AS a_id, x AS ax, y AS ay FROM pts WHERE event_type = 'click'),
b AS (SELECT event_id AS b_id, x AS bx, y AS by FROM pts WHERE event_type = 'error'),
m AS (
  SELECT a_id, b_id,
         (ax - bx) * (ax - bx) + (ay - by) * (ay - by) AS d2
  FROM a, b
  WHERE (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= 25
)
SELECT COUNT(*) AS n_matches,
       COUNT(DISTINCT a_id) AS n_a_matched,
       COUNT(DISTINCT b_id) AS n_b_matched,
       CAST(COALESCE(SUM(a_id + b_id), 0) AS BIGINT) AS id_sum,
       CAST(COALESCE(SUM(d2), 0) AS BIGINT) AS d2_sum
FROM m
""",
)
def grid_radius_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.grid_radius_join(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# ext: round-2 cohort — MMR diversity re-ranking, deterministic Poisson
# bootstrap, l-diversity audit, normalized-rank windows.
# ---------------------------------------------------------------------------
@register(
    "mmr_rerank",
    # unrolled greedy: 5 selection CTEs, exact integer mmr algebra
    """
WITH vq AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
  FROM embeddings
), q AS (SELECT v AS qv FROM vq WHERE vec_id = 0),
rel AS (
  SELECT vec_id, v, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_zip(v, qv), p -> p[1] * p[2])), (x, y) -> x + y) AS rel_u FROM vq, q WHERE vec_id <> 0
), cand AS (
  SELECT * FROM rel ORDER BY rel_u DESC, vec_id LIMIT 12
), sim AS (
  SELECT a.vec_id AS sa, b.vec_id AS sb, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])), (x, y) -> x + y) AS sim_u
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
), s1 AS (
  SELECT vec_id, rel_u, rel_u AS mmr_u FROM cand ORDER BY rel_u DESC, vec_id LIMIT 1
), sel1 AS (SELECT vec_id FROM s1), p2 AS (
  SELECT c.vec_id, c.rel_u, c.rel_u - MAX(s.sim_u) AS mmr_u
  FROM cand c JOIN sim s ON s.sa = c.vec_id AND s.sb IN (SELECT vec_id FROM sel1)
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel1)
  GROUP BY c.vec_id, c.rel_u
), s2 AS (
  SELECT * FROM p2 ORDER BY mmr_u DESC, vec_id LIMIT 1
), sel2 AS (
  SELECT vec_id FROM sel1 UNION ALL SELECT vec_id FROM s2
), p3 AS (
  SELECT c.vec_id, c.rel_u, c.rel_u - MAX(s.sim_u) AS mmr_u
  FROM cand c JOIN sim s ON s.sa = c.vec_id AND s.sb IN (SELECT vec_id FROM sel2)
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
  GROUP BY c.vec_id, c.rel_u
), s3 AS (
  SELECT * FROM p3 ORDER BY mmr_u DESC, vec_id LIMIT 1
), sel3 AS (
  SELECT vec_id FROM sel2 UNION ALL SELECT vec_id FROM s3
), p4 AS (
  SELECT c.vec_id, c.rel_u, c.rel_u - MAX(s.sim_u) AS mmr_u
  FROM cand c JOIN sim s ON s.sa = c.vec_id AND s.sb IN (SELECT vec_id FROM sel3)
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)
  GROUP BY c.vec_id, c.rel_u
), s4 AS (
  SELECT * FROM p4 ORDER BY mmr_u DESC, vec_id LIMIT 1
), sel4 AS (
  SELECT vec_id FROM sel3 UNION ALL SELECT vec_id FROM s4
), p5 AS (
  SELECT c.vec_id, c.rel_u, c.rel_u - MAX(s.sim_u) AS mmr_u
  FROM cand c JOIN sim s ON s.sa = c.vec_id AND s.sb IN (SELECT vec_id FROM sel4)
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel4)
  GROUP BY c.vec_id, c.rel_u
), s5 AS (
  SELECT * FROM p5 ORDER BY mmr_u DESC, vec_id LIMIT 1
), sel5 AS (
  SELECT vec_id FROM sel4 UNION ALL SELECT vec_id FROM s5
)
SELECT 1 AS rank, vec_id, rel_u / 1e6 AS rel, mmr_u / 1e6 AS mmr FROM s1
UNION ALL
SELECT 2 AS rank, vec_id, rel_u / 1e6 AS rel, mmr_u / 1e6 AS mmr FROM s2
UNION ALL
SELECT 3 AS rank, vec_id, rel_u / 1e6 AS rel, mmr_u / 1e6 AS mmr FROM s3
UNION ALL
SELECT 4 AS rank, vec_id, rel_u / 1e6 AS rel, mmr_u / 1e6 AS mmr FROM s4
UNION ALL
SELECT 5 AS rank, vec_id, rel_u / 1e6 AS rel, mmr_u / 1e6 AS mmr FROM s5
ORDER BY rank
""",
)
def mmr_rerank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.mmr_rerank(load_table(spark, sf_dir, "embeddings"))


@register(
    "bootstrap_ci",
    # identical md5-derived Poisson(1) weights; thresholds are exact
    # integer literals of the scaled CDF
    """
WITH reps AS (SELECT unnest(generate_series(0, 31)) AS b),
base AS (
  SELECT event_id, event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS yu,
         CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS UBIGINT)::BIGINT
           % 36028797018963968 AS h0
  FROM events
), hw AS (
  SELECT event_type, b, yu,
         CASE WHEN h < 13254253713415792 THEN 0
              WHEN h < 26508507426831584 THEN 1
              WHEN h < 33135634283539480 THEN 2
              WHEN h < 35344676569108776 THEN 3
              ELSE 4 END AS w
  FROM (
    SELECT base.*, reps.b, (h0 * (2 * b + 1)) % 36028797018963968 AS h
    FROM base CROSS JOIN reps
  )
), rm AS (
  SELECT event_type, b,
         CAST(FLOOR(CAST(SUM(w * yu) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS m_u
  FROM hw GROUP BY 1, 2
), ranked AS (
  SELECT event_type, m_u, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY m_u, b) AS rn FROM rm
), ci AS (
  SELECT event_type, MIN(m_u) / 1e6 AS ci_lo, MAX(m_u) / 1e6 AS ci_hi
  FROM ranked WHERE rn IN (2, 31) GROUP BY event_type
), pt AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(FLOOR(CAST(SUM(yu) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS mean_u
  FROM base GROUP BY 1
)
SELECT event_type, n, mean_u / 1e6 AS mean, ci_lo, ci_hi
FROM pt JOIN ci USING (event_type) ORDER BY event_type
""",
)
def bootstrap_ci_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.bootstrap_ci(load_events(spark, sf_dir))


@register(
    "l_diversity_report",
    """
WITH pc AS (
  SELECT event_type, EXTRACT(HOUR FROM ts) AS hod, user_id % 100 AS cohort,
         COUNT(*) AS sz,
         COUNT(DISTINCT CAST(FLOOR(value / 100) AS BIGINT)) AS l
  FROM events GROUP BY 1, 2, 3
), ns AS (
  SELECT COUNT(DISTINCT CAST(FLOOR(value / 100) AS BIGINT)) AS n_sensitive_values FROM events
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(l) AS BIGINT) AS min_l,
       CAST(COUNT(CASE WHEN l < 3 THEN 1 END) AS BIGINT) AS n_classes_below_l,
       CAST(SUM(CASE WHEN l < 3 THEN sz ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
       CAST(MAX(n_sensitive_values) AS BIGINT) AS n_sensitive_values
FROM pc, ns
""",
)
def l_diversity_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.l_diversity_report(load_events(spark, sf_dir))


@register(
    "window_percent_rank",
    """
WITH w AS (
  SELECT event_id, event_type, value,
         PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value, event_id) AS pr0,
         CUME_DIST() OVER (PARTITION BY event_type ORDER BY value, event_id) AS cd0
  FROM events
)
SELECT event_id, event_type, value,
       FLOOR(pr0 * 1e6 + 0.5) / 1e6 AS pr,
       FLOOR(cd0 * 1e6 + 0.5) / 1e6 AS cd
FROM w WHERE event_id % 199 = 0 ORDER BY event_id
""",
)
def window_percent_rank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.window_percent_rank(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# ext: round-2 cohort — calibration report, NDCG ranking eval, PMI
# collocations, streaming k-minima distinct sketch.
# ---------------------------------------------------------------------------
@register(
    "calibration_report",
    # embeds quality_model_score's exact z pipeline, then fixed-width
    # quantized-logit bins; confidence/accuracy are single float
    # divisions of exact sums
    f"""
WITH f AS (
  SELECT doc_id,
         len({_TOKS})::DOUBLE AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         len(list_filter({_TOKS}, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
           AS n_stop,
         (length(text) - length(replace(text, '.', '')))::DOUBLE AS n_dots
  FROM documents
), wts AS (
  SELECT i.i AS i,
         2 * (CAST(concat('0x', substr(md5('qw:' || i.i), 1, 15)) AS UBIGINT)
              / 1152921504606846976.0) - 1 AS w
  FROM (SELECT UNNEST(range(5)) AS i) i
), z AS (
  SELECT f.doc_id,
         (SELECT w FROM wts WHERE i = 0) * (n_tokens / 100.0)
         + (SELECT w FROM wts WHERE i = 1) * (n_stop / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 2) * (n_chars / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 3) * (n_dots / (n_chars + 1.0))
         + (SELECT w FROM wts WHERE i = 4) AS z
  FROM f
), lab AS (
  SELECT z.doc_id,
         CAST(FLOOR(FLOOR(z * 1e4 + 0.5) / 1e4 * 1e4 + 0.5) AS BIGINT) AS lu,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM z JOIN documents d ON d.doc_id = z.doc_id
), binned AS (
  SELECT CAST(FLOOR(lu / 2500.0) AS BIGINT) AS bin, lu, pos FROM lab
)
SELECT bin, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
       FLOOR(CAST(SUM(lu) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e4 * 1e6 + 0.5) / 1e6 AS mean_logit,
       FLOOR(CAST(SUM(pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS pos_rate
FROM binned GROUP BY bin ORDER BY bin
""",
)
def calibration_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.calibration_report(load_table(spark, sf_dir, "documents"))


@register(
    "ndcg_eval",
    _TOKS_CTE
    + """
, q(query_id, term) AS (
  VALUES (1,'hash'),(1,'join'),(2,'sort'),(2,'merge'),(3,'customer'),(3,'value')
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), tot AS (
  SELECT COUNT(*) AS s_tokens, COUNT(DISTINCT doc_id) AS n_docs FROM toks
), part AS (
  SELECT q.query_id, tf.doc_id,
         CAST(FLOOR(
           (LN(1.0 + (tot.n_docs - df.df + 0.5) / (df.df + 0.5))
            * (tf.tf * 2.2)
            / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / (tot.s_tokens / CAST(tot.n_docs AS DOUBLE))))))
           * 1e6 + 0.5) AS BIGINT) AS su
  FROM tf
  JOIN q USING (term)
  JOIN dl USING (doc_id)
  JOIN df USING (term)
  CROSS JOIN tot
), agg AS (
  SELECT query_id, doc_id, SUM(su) AS su FROM part GROUP BY query_id, doc_id
), top AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY su DESC, doc_id) AS rank
    FROM agg
  ) WHERE rank <= 10
), relv AS (
  SELECT q.query_id, t.doc_id, COUNT(*) AS rel
  FROM (SELECT DISTINCT doc_id, term FROM toks) t JOIN q USING (term)
  GROUP BY 1, 2
), dcg AS (
  SELECT top.query_id,
         SUM(CAST(FLOOR(CAST(COALESCE(r.rel, 0) AS DOUBLE)
                        / log2(CAST(top.rank AS DOUBLE) + 1) * 1e9 + 0.5) AS BIGINT)) AS dcg_u
  FROM top LEFT JOIN relv r ON r.query_id = top.query_id AND r.doc_id = top.doc_id
  GROUP BY 1
), ideal AS (
  SELECT query_id, SUM(g) AS idcg_u, COUNT(*) AS n_relevant FROM (
    SELECT query_id,
           CAST(FLOOR(CAST(rel AS DOUBLE) / log2(CAST(pos AS DOUBLE) + 1) * 1e9 + 0.5) AS BIGINT) AS g
    FROM (
      SELECT query_id, rel, doc_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS pos
      FROM relv
    ) WHERE pos <= 10
  ) GROUP BY query_id
)
SELECT d.query_id,
       dcg_u / 1e9 AS dcg,
       idcg_u / 1e9 AS idcg,
       FLOOR(CAST(dcg_u AS DOUBLE) / CAST(idcg_u AS DOUBLE) * 1e6 + 0.5) / 1e6 AS ndcg,
       n_relevant
FROM dcg d JOIN ideal USING (query_id) ORDER BY query_id
""",
)
def ndcg_eval_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.ndcg_eval(load_table(spark, sf_dir, "documents"))


@register(
    "pmi_collocations",
    """
WITH arrs AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' ') AS arr
  FROM documents
), idx AS (
  SELECT doc_id, unnest(generate_series(1, len(arr))) AS pos, arr FROM arrs
), posting AS (
  SELECT doc_id, pos, arr[pos] AS term FROM idx WHERE arr[pos] <> ''
), uni AS (
  SELECT term, COUNT(*) AS c FROM posting GROUP BY term
), tot AS (SELECT COUNT(*) AS t FROM posting),
bg AS (
  SELECT p0.term AS w0, p1.term AS w1, COUNT(*) AS c_ab
  FROM posting p0 JOIN posting p1
    ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
  GROUP BY 1, 2
), btot AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS b FROM bg)
SELECT w0, w1, c_ab, ca.c AS ca, cb.c AS cb,
       FLOOR(LN((CAST(c_ab AS DOUBLE) / CAST(b AS DOUBLE))
                / ((CAST(ca.c AS DOUBLE) / CAST(t AS DOUBLE))
                   * (CAST(cb.c AS DOUBLE) / CAST(t AS DOUBLE)))) * 1e6 + 0.5) / 1e6 AS pmi
FROM bg
JOIN uni ca ON ca.term = bg.w0
JOIN uni cb ON cb.term = bg.w1
CROSS JOIN tot CROSS JOIN btot
WHERE c_ab >= 20
ORDER BY pmi DESC, w0, w1
LIMIT 30
""",
)
def pmi_collocations_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.pmi_collocations(load_table(spark, sf_dir, "documents"))


@register(
    "streaming_kmin_sketch",
    # k-partition-minima distinct sketch (stochastic averaging): MIN
    # per (set, bucket) is a valid incremental streaming aggregate and
    # the mergeable store a shard rollup would union; the drained
    # complete-mode table equals this batch build exactly
    """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type,
         CAST(concat('0x', substr(md5('skmv:' || user_id), 1, 15)) AS UBIGINT)::BIGINT AS h
  FROM du
)
SELECT event_type, h % 64 AS bucket, COUNT(*) AS n_keys, MIN(h) AS min_h
FROM h GROUP BY 1, 2
ORDER BY event_type, bucket
""",
)
def streaming_kmin_sketch_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("skmv:"), F.col("user_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    sk = (
        stream.select("event_type", "user_id")
        .dropDuplicates(["event_type", "user_id"])
        .select("event_type", h.alias("h"))
        .groupBy("event_type", F.pmod(F.col("h"), F.lit(64)).alias("bucket"))
        .agg(F.count("*").alias("n_keys"), F.min("h").alias("min_h"))
    )
    return jobs.run_available_now(sk, "streaming_kmin_sketch")


@register(
    "pca_power_iteration",
    # 4 unrolled power-iteration rounds: exact bigint matvecs, ordered
    # double fold + IEEE sqrt for the normalizer, truncating integer
    # rescale — bit-identical to the Spark driver-composed rounds
    """
WITH vecs AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS x
  FROM embeddings
), v0 AS (
  SELECT list_transform(generate_series(1, 64), i -> CAST(1000 AS BIGINT)) AS v
), r1s AS (
  SELECT v.vec_id, v.x, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_zip(v.x, p.v), p -> p[1] * p[2])), (x, y) -> x + y) AS s FROM vecs v, v0 p
), r1u AS (
  SELECT generate_subscripts(x, 1) AS d, unnest(x) AS xd, s FROM r1s
), r1a AS (
  SELECT list(u ORDER BY d) AS u
  FROM (SELECT d, SUM(xd * s) AS u FROM r1u GROUP BY d)
), r1n AS (
  SELECT u,
         CAST(FLOOR(SQRT(list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(u, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE))),
           (a, b) -> a + b))) AS BIGINT) AS nrm
  FROM r1a
), v1 AS (
  SELECT list_transform(u, z -> (z * 1000) // nrm) AS v FROM r1n
), r2s AS (
  SELECT v.vec_id, v.x, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_zip(v.x, p.v), p -> p[1] * p[2])), (x, y) -> x + y) AS s FROM vecs v, v1 p
), r2u AS (
  SELECT generate_subscripts(x, 1) AS d, unnest(x) AS xd, s FROM r2s
), r2a AS (
  SELECT list(u ORDER BY d) AS u
  FROM (SELECT d, SUM(xd * s) AS u FROM r2u GROUP BY d)
), r2n AS (
  SELECT u,
         CAST(FLOOR(SQRT(list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(u, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE))),
           (a, b) -> a + b))) AS BIGINT) AS nrm
  FROM r2a
), v2 AS (
  SELECT list_transform(u, z -> (z * 1000) // nrm) AS v FROM r2n
), r3s AS (
  SELECT v.vec_id, v.x, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_zip(v.x, p.v), p -> p[1] * p[2])), (x, y) -> x + y) AS s FROM vecs v, v2 p
), r3u AS (
  SELECT generate_subscripts(x, 1) AS d, unnest(x) AS xd, s FROM r3s
), r3a AS (
  SELECT list(u ORDER BY d) AS u
  FROM (SELECT d, SUM(xd * s) AS u FROM r3u GROUP BY d)
), r3n AS (
  SELECT u,
         CAST(FLOOR(SQRT(list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(u, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE))),
           (a, b) -> a + b))) AS BIGINT) AS nrm
  FROM r3a
), v3 AS (
  SELECT list_transform(u, z -> (z * 1000) // nrm) AS v FROM r3n
), r4s AS (
  SELECT v.vec_id, v.x, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(list_zip(v.x, p.v), p -> p[1] * p[2])), (x, y) -> x + y) AS s FROM vecs v, v3 p
), r4u AS (
  SELECT generate_subscripts(x, 1) AS d, unnest(x) AS xd, s FROM r4s
), r4a AS (
  SELECT list(u ORDER BY d) AS u
  FROM (SELECT d, SUM(xd * s) AS u FROM r4u GROUP BY d)
), r4n AS (
  SELECT u,
         CAST(FLOOR(SQRT(list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(u, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE))),
           (a, b) -> a + b))) AS BIGINT) AS nrm
  FROM r4a
), v4 AS (
  SELECT list_transform(u, z -> (z * 1000) // nrm) AS v FROM r4n
)
SELECT CAST(generate_subscripts(v, 1) - 1 AS INT) AS d,
       CAST(unnest(v) AS BIGINT) AS v_milli,
       CAST(unnest(v) AS BIGINT) / 1000 AS loading
FROM v4 ORDER BY d
""",
)
def pca_power_iteration_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.pca_power_top_component(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# ext: round-2 cohort — streaming run observability + incremental
# join-view maintenance.
# ---------------------------------------------------------------------------
@register(
    "streaming_obs_metrics",
    # run-level metrics accumulated across micro-batches must equal the
    # batch aggregates over the same data — batch-slicing-invariant by
    # construction (counts/sums add, max maxes)
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
       CAST(MAX(event_id) AS BIGINT) AS max_event_id
FROM events
""",
)
def streaming_obs_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming observability via observe(): per-micro-batch metrics
    ride the stream's own processing (accumulators, zero extra scans —
    the streaming twin of obs_metrics), surface in each progress event,
    and the run-level rollup is the additive combine across batches.
    The noop sink isolates the cost: this is what a production job's
    metrics exporter sees, independent of the sink."""
    import tempfile

    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    observed = stream.observe(
        "run_metrics",
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "value_cents"
        ),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
        F.max("event_id").alias("max_event_id"),
    )
    # retain enough progress events for one-file-per-trigger draining of
    # many-part fixtures; restore the conf afterwards (session hygiene)
    prev = spark.conf.get("spark.sql.streaming.numRecentProgressUpdates", None)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "2000")
    try:
        q = (
            observed.writeStream.format("noop")
            .queryName("streaming_obs_metrics")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ksr_obs_ck_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_events = value_cents = n_purchases = 0
        max_event_id = None
        for p in q.recentProgress:
            om = (p.get("observedMetrics") or {}).get("run_metrics")
            if not om:
                continue
            n_events += om["n_events"]
            value_cents += om["value_cents"] or 0
            n_purchases += om["n_purchases"]
            if om["max_event_id"] is not None:
                max_event_id = (
                    om["max_event_id"]
                    if max_event_id is None
                    else max(max_event_id, om["max_event_id"])
                )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.numRecentProgressUpdates")
        else:
            spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", prev)
    return spark.createDataFrame(
        [(n_events, value_cents, n_purchases, max_event_id)],
        "n_events BIGINT, value_cents BIGINT, n_purchases BIGINT, max_event_id BIGINT",
    )


@register(
    "incremental_join_merge",
    # oracle = the full recompute over base+delta on both sides; the
    # engine's four-leg delta-join merge must land on exactly this
    """
SELECT o.o_custkey,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       COUNT(*) AS n_items
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_custkey
ORDER BY o.o_custkey
""",
)
def incremental_join_merge_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN materialized view by the
    delta rule: with base snapshots A, B and deltas dA, dB,
    new_view = agg(A join B) ++ agg(dA join B) ++ agg(A join dB)
    ++ agg(dA join dB) — the join twin of incremental_agg_merge (which
    maintains a grouped aggregate). Splits: orders before/after
    1997-01-01 (the CDC arrival), lineitem by ship date — all four
    legs are non-empty, so the merge is exercised for real.

    Plan shape at 100 TB: the stored view is read, not recomputed (here
    the A-join-B leg stands in for it); each delta leg joins a SMALL
    delta side — broadcast — against the big snapshot, so maintenance
    cost is O(|delta| + view size), never a re-join of the snapshots;
    the final merge is a partial-agg union keyed like the view. Exact
    integer cents throughout."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = "1997-01-01"
    a = orders.filter(F.col("o_orderdate") < cutoff)
    da = orders.filter(F.col("o_orderdate") >= cutoff)
    b = lineitem.filter(F.col("l_shipdate") < cutoff)
    db = lineitem.filter(F.col("l_shipdate") >= cutoff)
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")

    def leg(o, li):
        # delta sides are broadcast-able in a REAL CDC setting; the
        # synthetic split is ~half/half, so the hint is left to AQE
        # (which broadcasts when the delta actually is small)
        return (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_custkey")
            .agg(F.sum(cents).alias("revenue_cents"), F.count("*").alias("n_items"))
        )

    legs = [leg(a, b), leg(da, b), leg(a, db), leg(da, db)]
    merged = legs[0]
    for d in legs[1:]:
        merged = merged.unionByName(d)
    return (
        merged.groupBy("o_custkey")
        .agg(
            F.sum("revenue_cents").alias("revenue_cents"),
            F.sum("n_items").alias("n_items"),
        )
        .orderBy("o_custkey")
    )


@register(
    "temporal_reachability",
    # 3 unrolled earliest-arrival rounds; the time-respecting
    # constraint is the join residual t >= arrival
    """
WITH edges AS (
  SELECT user_id AS src, event_id % 500 AS dst,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t
  FROM events
), a0 AS (
  SELECT MIN(user_id) AS node, CAST(0 AS BIGINT) AS arrival FROM events
), a1 AS (
  SELECT node, MIN(arrival) AS arrival FROM (
    SELECT * FROM a0
    UNION ALL
    SELECT e.dst, e.t FROM a0 a JOIN edges e ON e.src = a.node AND e.t >= a.arrival
  ) GROUP BY node
), a2 AS (
  SELECT node, MIN(arrival) AS arrival FROM (
    SELECT * FROM a1
    UNION ALL
    SELECT e.dst, e.t FROM a1 a JOIN edges e ON e.src = a.node AND e.t >= a.arrival
  ) GROUP BY node
), a3 AS (
  SELECT node, MIN(arrival) AS arrival FROM (
    SELECT * FROM a2
    UNION ALL
    SELECT e.dst, e.t FROM a2 a JOIN edges e ON e.src = a.node AND e.t >= a.arrival
  ) GROUP BY node
)
SELECT node, arrival FROM a3 ORDER BY node
""",
)
def temporal_reachability_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.temporal_reachability(load_events(spark, sf_dir))


@register(
    "sequence_motifs",
    """
WITH seq AS (
  SELECT user_id, event_type AS e0,
         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2
  FROM events
)
SELECT e0 || '->' || e1 || '->' || e2 AS motif,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users
FROM seq WHERE e2 IS NOT NULL
GROUP BY e0, e1, e2
HAVING COUNT(*) >= 5
ORDER BY n DESC, motif
""",
)
def sequence_motifs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.sequence_motifs(load_events(spark, sf_dir))


@register(
    "dataset_card",
    # flagship #4: the per-source datasheet — token/char mass, lang
    # mix, corpus-wide dup exposure, planted-PII incidence
    f"""
WITH per_doc AS (
  SELECT doc_id, source, lang,
         CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars,
         md5({_NORM}) AS fp,
         CASE WHEN doc_id % 7 = 0 THEN
           CASE WHEN regexp_matches(
                  text || ' contact user' || doc_id || '@example.com or 555-'
                       || lpad((doc_id % 10000)::VARCHAR, 4, '0'),
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')
                OR regexp_matches(
                  text || ' contact user' || doc_id || '@example.com or 555-'
                       || lpad((doc_id % 10000)::VARCHAR, 4, '0'),
                  '\\b555-[0-9]{{4}}\\b')
           THEN 1 ELSE 0 END
         ELSE
           CASE WHEN regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')
                OR regexp_matches(text, '\\b555-[0-9]{{4}}\\b')
           THEN 1 ELSE 0 END
         END AS pii
  FROM documents
), census AS (
  SELECT fp, COUNT(*) AS fp_n FROM per_doc GROUP BY fp
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       COUNT(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
       COUNT(CASE WHEN fp_n > 1 THEN 1 END) AS n_dup_docs,
       CAST(SUM(pii) AS BIGINT) AS n_pii_docs,
       FLOOR(CAST(SUM(n_tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS mean_doc_tokens
FROM per_doc JOIN census USING (fp)
GROUP BY source ORDER BY source
""",
)
def dataset_card_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.dataset_card(load_table(spark, sf_dir, "documents"))


@register(
    "cohort_retention",
    """
WITH d0 AS (SELECT CAST(MIN(ts) AS DATE) AS d0 FROM events),
act AS (
  SELECT DISTINCT user_id,
         datediff('day', d0.d0, CAST(ts AS DATE)) // 7 AS week
  FROM events, d0
), coh AS (
  SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id
), sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM coh GROUP BY cohort_week
), cells AS (
  SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM act a JOIN coh c USING (user_id)
  WHERE a.week - c.cohort_week <= 8
  GROUP BY 1, 2
)
SELECT cohort_week, week_offset, n_active, cohort_size,
       FLOOR(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS retention
FROM cells JOIN sizes USING (cohort_week)
ORDER BY cohort_week, week_offset
""",
)
def cohort_retention_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.cohort_retention(load_events(spark, sf_dir))


@register(
    "forecast_backtest",
    """
WITH days AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS x
  FROM events GROUP BY 1, 2
), paired AS (
  SELECT event_type, x,
         LAG(x, 7) OVER (PARTITION BY event_type ORDER BY d) AS pred
  FROM days
)
SELECT event_type, COUNT(*) AS n_days,
       CAST(SUM(ABS(x - pred)) AS BIGINT) AS abs_err_sum,
       FLOOR(CAST(SUM(CAST(FLOOR(CAST(ABS(x - pred) AS DOUBLE) / CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) + 0.5) / 1e6 AS mape
FROM paired WHERE pred IS NOT NULL AND x > 0
GROUP BY event_type ORDER BY event_type
""",
)
def forecast_backtest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.forecast_backtest(load_events(spark, sf_dir))


@register(
    "ab_test_report",
    """
WITH pu AS (
  SELECT user_id, user_id % 2 AS variant,
         MAX(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1, 2
), st AS (
  SELECT variant, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS k
  FROM pu GROUP BY variant
), j AS (
  SELECT a.n AS n0, a.k AS k0, b.n AS n1, b.k AS k1
  FROM st a, st b WHERE a.variant = 0 AND b.variant = 1
), zc AS (
  SELECT n0, k0, n1, k1,
         FLOOR(CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE) * 1e6 + 0.5) / 1e6 AS p0,
         FLOOR(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) * 1e6 + 0.5) / 1e6 AS p1,
         FLOOR((CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE))
               / SQRT(CAST(k0 + k1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
                      * (1.0 - CAST(k0 + k1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                      * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
               * 1e6 + 0.5) / 1e6 AS z
  FROM j
)
SELECT n0, k0, n1, k1, p0, p1, z, ABS(z) > 1.96 AS significant FROM zc
""",
)
def ab_test_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.ab_test_report(load_events(spark, sf_dir))


@register(
    "pseudonymize_consistent",
    """
WITH ev AS (
  SELECT user_id AS uid,
         substr(md5('pseu:' || user_id), 1, 15) AS utok
  FROM events
), cust AS (
  SELECT o_custkey AS uid,
         substr(md5('pseu:' || o_custkey), 1, 15) AS utok
  FROM orders
), rawj AS (
  SELECT COUNT(*) AS raw_join_keys FROM
    (SELECT DISTINCT uid FROM ev) a JOIN (SELECT DISTINCT uid FROM cust) b USING (uid)
), tokj AS (
  SELECT COUNT(*) AS tok_join_keys FROM
    (SELECT DISTINCT utok FROM ev) a JOIN (SELECT DISTINCT utok FROM cust) b USING (utok)
), card AS (
  SELECT COUNT(DISTINCT uid) AS n_users, COUNT(DISTINCT utok) AS n_tokens FROM ev
)
SELECT n_users, n_tokens, raw_join_keys, tok_join_keys,
       n_users = n_tokens AS collision_free,
       raw_join_keys = tok_join_keys AS join_preserving
FROM card, rawj, tokj
""",
)
def pseudonymize_consistent_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.pseudonymize_consistent(
        load_events(spark, sf_dir), load_table(spark, sf_dir, "orders")
    )


@register(
    "streaming_ab_counts",
    # the A/B guardrail maintained ON the stream: per-variant distinct
    # users and distinct converters via watermark-free dropDuplicates
    # state + a counts-only complete-mode aggregate; drained == batch
    """
WITH tagged AS (
  SELECT DISTINCT user_id, user_id % 2 AS variant, 'all' AS tag FROM events
  UNION
  SELECT DISTINCT user_id, user_id % 2 AS variant, 'conv' AS tag
  FROM events WHERE event_type = 'purchase' AND value > 150
)
SELECT variant, tag, COUNT(*) AS n
FROM tagged GROUP BY variant, tag ORDER BY variant, tag
""",
)
def streaming_ab_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    all_tag = stream.select(
        "user_id", (F.col("user_id") % 2).alias("variant"), F.lit("all").alias("tag")
    )
    conv_tag = (
        stream.filter((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .select(
            "user_id",
            (F.col("user_id") % 2).alias("variant"),
            F.lit("conv").alias("tag"),
        )
    )
    counts = (
        all_tag.unionByName(conv_tag)
        .dropDuplicates(["user_id", "tag"])
        .groupBy("variant", "tag")
        .agg(F.count("*").alias("n"))
    )
    return jobs.run_available_now(counts, "streaming_ab_counts")


@register(
    "source_ablation_report",
    # BRUTE-FORCE oracle on purpose: each source's rest-statistics are
    # recomputed from scratch per source, proving the engine's
    # aggregate-algebra shortcut (including the dup-group dissolution
    # correction) exact
    f"""
WITH per_doc AS (
  SELECT source,
         CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         md5({_NORM}) AS fp
  FROM documents
), srcs AS (SELECT DISTINCT source FROM per_doc),
g AS (SELECT COUNT(*) AS g_docs, SUM(n_tokens) AS g_tokens FROM per_doc)
SELECT s.source,
       x.n_docs_rest,
       FLOOR(CAST(x.tok_rest AS DOUBLE) / CAST(x.n_docs_rest AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS mean_tokens_rest,
       FLOOR((CAST(x.tok_rest AS DOUBLE) / CAST(x.n_docs_rest AS DOUBLE)
              - CAST(g.g_tokens AS DOUBLE) / CAST(g.g_docs AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS delta_mean_tokens,
       d.dup_docs_rest
FROM srcs s
CROSS JOIN g
CROSS JOIN LATERAL (
  SELECT COUNT(*) AS n_docs_rest, CAST(SUM(n_tokens) AS BIGINT) AS tok_rest
  FROM per_doc p WHERE p.source <> s.source
) x
CROSS JOIN LATERAL (
  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS dup_docs_rest FROM (
    SELECT fp, COUNT(*) AS c FROM per_doc p WHERE p.source <> s.source GROUP BY fp
  ) WHERE c >= 2
) d
ORDER BY s.source
""",
)
def source_ablation_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.source_ablation_report(load_table(spark, sf_dir, "documents"))


@register(
    "training_matrix_pit",
    """
WITH feat AS (
  SELECT event_id, user_id, event_type,
         COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_clicks,
         COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_views,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_purchases,
         COALESCE(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_purchase_cents,
         COALESCE(COUNT(*)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_events
  FROM events
)
SELECT event_id, user_id,
       CAST(prior_clicks AS BIGINT) AS prior_clicks,
       CAST(prior_views AS BIGINT) AS prior_views,
       CAST(prior_purchases AS BIGINT) AS prior_purchases,
       CAST(prior_purchase_cents AS BIGINT) AS prior_purchase_cents,
       CAST(prior_events AS BIGINT) AS prior_events
FROM feat
WHERE event_type = 'purchase' AND event_id % 97 = 0
ORDER BY event_id
""",
)
def training_matrix_pit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.training_matrix_pit(load_events(spark, sf_dir))


@register(
    "target_encode_loo",
    """
WITH base AS (
  SELECT l_orderkey, l_linenumber, l_returnflag AS cat,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
  FROM lineitem
), agg AS (
  SELECT cat, CAST(SUM(y) AS BIGINT) AS s, COUNT(*) AS n FROM base GROUP BY cat
)
SELECT l_orderkey, l_linenumber, cat, y,
       FLOOR(CAST(s - y AS DOUBLE) / CAST(n - 1 AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6
         AS loo_mean
FROM base JOIN agg USING (cat)
WHERE l_orderkey % 199 = 0
ORDER BY l_orderkey, l_linenumber
""",
)
def target_encode_loo_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.target_encode_loo(load_table(spark, sf_dir, "lineitem"))


@register(
    "multimodal_video_decode",
    # formula-derived y4m clips: the oracle recomputes decoded header
    # dims, frame counts and exact luma-plane sums from the same
    # integer formulas the builder used
    """
WITH dims AS (
  SELECT doc_id,
         4 + 2 * (doc_id % 3) AS w,
         4 + 2 * (doc_id % 2) AS h,
         3 + doc_id % 4 AS nf
  FROM documents
), fj AS (
  SELECT doc_id, w, h, nf, f.f, j.j
  FROM dims
  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS f) f
  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS j) j
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(nf AS INT) AS n_frames,
       CAST(SUM((doc_id * 11 + f * 17 + j * 5) % 256) AS BIGINT) AS luma_sum,
       CAST(SUM(CASE WHEN f % 2 = 0 THEN (doc_id * 11 + f * 17 + j * 5) % 256 ELSE 0 END) AS BIGINT)
         AS sampled_luma_sum
FROM fj GROUP BY doc_id, w, h, nf ORDER BY doc_id
""",
)
def multimodal_video_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthetic_y4m_media(docs)
    return multimodal.video_decode_features(media).orderBy("doc_id")


@register(
    "source_python_stream",
    # the STREAMING Python DataSource must drain to exactly the batch
    # reader's parse: same shard files, same KPL deagg, same JSON parse
    """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def source_python_stream_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 Python DataSource STREAMING reader: per-shard record
    counts are the offsets (the sequence-number checkpoint analogue),
    micro-batch partitions cover [committed, latest) per shard and read
    on executors, and an AvailableNow drain through KPL deagg + JSON
    parse must equal the batch reader bit for bit — completing the
    custom-source surface: batch reader, paged wire writer, streaming
    reader."""
    from .operators.ingest import deagg_explode, json_parse
    from .streaming import jobs

    shard_dir = _ensure_pyds_fixture(spark, sf_dir)
    stream = (
        spark.readStream.format("kinesis_backfill")
        .option("path", shard_dir)
        .load()
    )
    parsed = json_parse(deagg_explode(stream), schema="event_id BIGINT, k BIGINT")
    return jobs.run_available_now(
        parsed.select("event_id", "k"), "source_python_stream"
    )


@register(
    "join_dynamic_partition_pruning",
    # oracle = the plain join semantics; the ENGINE side must produce
    # this via a partitioned scan whose partitions are pruned at
    # RUNTIME by the dimension filter (dynamicpruning subquery —
    # pytest asserts the plan)
    """
WITH dim(event_type, category) AS (
  VALUES ('click','A'),('purchase','A'),('view','B'),('signup','B'),('error','B')
)
SELECT e.event_type, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events e JOIN dim d ON d.event_type = e.event_type
WHERE d.category = 'A'
GROUP BY e.event_type ORDER BY e.event_type
""",
)
def join_dynamic_partition_pruning_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is STORED partitioned
    by event_type; the dimension filter (category = 'A') is only known
    at runtime, and Catalyst injects a dynamicpruning subquery into the
    fact scan's partition filters — at 100 TB this is the difference
    between scanning 2/5 of the table and all of it, with zero change
    to the query text. The static-pruning twin lives in
    tests/test_partition_pruning.py; this is the join-driven form."""
    from .sources.raw import source_fingerprint

    part_dir = (
        f"/tmp/ksr_dpp/{sf_dir.strip('/').replace('/', '_')}"
        f"_{source_fingerprint(sf_dir)}"
    )
    if not os.path.isdir(part_dir):
        load_events(spark, sf_dir).write.partitionBy("event_type").mode(
            "overwrite"
        ).parquet(part_dir)
    fact = spark.read.parquet(part_dir)
    dim = spark.createDataFrame(
        [
            ("click", "A"),
            ("purchase", "A"),
            ("view", "B"),
            ("signup", "B"),
            ("error", "B"),
        ],
        "event_type string, category string",
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        fact.join(F.broadcast(dim), "event_type")
        .filter(F.col("category") == "A")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("value_cents"))
        .orderBy("event_type")
    )


@register(
    "join_runtime_bloom_filter",
    # oracle = the plain join; the engine must produce it through
    # Spark's runtime bloom-filter join rewrite (might_contain gate on
    # the probe side — the automatic form of bloom_semi_filter's
    # manual build; pytest asserts the plan)
    """
SELECT o.o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 350000
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
""",
)
def join_runtime_bloom_filter_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join rewrite: the selective dimension
    filter (o_totalprice > 350000) is turned into a bloom filter built
    on the creation side and pushed into the fact scan as a
    might_contain gate — rows that cannot join are dropped BEFORE the
    shuffle. At 100 TB this is the shuffle-volume win of
    bloom_semi_filter with zero hand-written code. Local thresholds
    are lowered (and restored) so the rewrite fires at fixture scale;
    a real cluster's defaults fire on real sizes."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 350000
    )
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = (
            li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.sum(cents).alias("revenue_cents"))
            .orderBy("o_orderpriority")
        )
        # materialize the plan (and the result the driver will hash)
        # under the lowered thresholds
        joined = joined.localCheckpoint()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    return joined


@register(
    "funnel_negative",
    # purchases NOT click-attributed within the hour — the CEP
    # negation pattern (A not-preceded-by B within T), same
    # union + running-last machinery as the as-of joins
    """
WITH tagged AS (
  SELECT user_id, ts, 1 AS is_click, CAST(NULL AS TIMESTAMP) AS pts
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, 0 AS is_click, ts AS pts
  FROM events WHERE event_type = 'purchase'
), lastc AS (
  SELECT user_id, ts, is_click, pts,
         MAX(CASE WHEN is_click = 1 THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, is_click DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
  FROM tagged
)
SELECT strftime(CAST(pts AS DATE), '%Y-%m-%d') AS day,
       COUNT(*) AS n_purchases,
       COUNT(CASE WHEN last_click IS NOT NULL
                   AND last_click >= pts - INTERVAL 1 HOUR THEN 1 END) AS n_attributed,
       COUNT(CASE WHEN last_click IS NULL
                   OR last_click < pts - INTERVAL 1 HOUR THEN 1 END) AS n_organic
FROM lastc WHERE is_click = 0
GROUP BY 1 ORDER BY 1
""",
)
def funnel_negative_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-condition funnel (CEP negation): purchases NOT preceded
    by a click within one hour — the complement every attribution
    report needs, via the same one-shuffle union + running-last window
    primitive as join_asof (clicks sort before same-instant
    purchases). No theta join, no per-purchase probe."""
    events = load_events(spark, sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(1).alias("is_click"),
        F.lit(None).cast("timestamp").alias("pts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(0).alias("is_click"), F.col("ts").alias("pts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_click").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lastc = clicks.unionByName(purchases).withColumn(
        "last_click",
        F.max(F.when(F.col("is_click") == 1, F.col("ts"))).over(w),
    )
    attributed = F.col("last_click").isNotNull() & (
        F.col("last_click") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")
    )
    return (
        lastc.filter(F.col("is_click") == 0)
        .groupBy(F.date_format(F.to_date("pts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.count(F.when(attributed, 1)).alias("n_attributed"),
            F.count(F.when(~attributed, 1)).alias("n_organic"),
        )
        .orderBy("day")
    )


@register(
    "gdpr_erasure_audit",
    """
WITH req(user_id) AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
), ev AS (
  SELECT COUNT(*) AS ev_before,
         COUNT(CASE WHEN user_id % 97 <> 0 THEN 1 END) AS ev_after
  FROM events
), ords AS (
  SELECT COUNT(*) AS ord_before,
         COUNT(CASE WHEN o.o_custkey NOT IN (SELECT user_id FROM req) THEN 1 END) AS ord_after
  FROM orders o
), leftover AS (
  SELECT COUNT(*) AS remaining_refs FROM (
    SELECT user_id FROM events WHERE user_id % 97 <> 0
  ) e JOIN req USING (user_id)
)
SELECT (SELECT COUNT(*) FROM req) AS n_requests,
       ev_before, ev_after, ord_before, ord_after, remaining_refs
FROM ev, ords, leftover
""",
)
def gdpr_erasure_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure job + verification pass: given a deterministic
    request list (user_id % 97 = 0), apply the anti-join erase to every
    table referencing the subject key and AUDIT it — per-table before/
    after counts plus a must-be-zero remaining-references probe (the
    erased relation re-joined against the request list). The erase is
    a broadcast anti join per table; the audit adds counts-only
    aggregates. The governance family's write path next to
    pseudonymize_consistent's read path."""
    events = load_events(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    req = events.filter(F.col("user_id") % 97 == 0).select("user_id").distinct()
    ev_after_df = events.join(F.broadcast(req), "user_id", "left_anti")
    ord_after_df = orders.join(
        F.broadcast(req.select(F.col("user_id").alias("o_custkey"))),
        "o_custkey",
        "left_anti",
    )
    n_req = req.agg(F.count("*").alias("n_requests"))
    ev_counts = events.agg(F.count("*").alias("ev_before")).join(
        ev_after_df.agg(F.count("*").alias("ev_after"))
    )
    ord_counts = orders.agg(F.count("*").alias("ord_before")).join(
        ord_after_df.agg(F.count("*").alias("ord_after"))
    )
    leftover = ev_after_df.join(F.broadcast(req), "user_id").agg(
        F.count("*").alias("remaining_refs")
    )
    return (
        n_req.join(ev_counts).join(ord_counts).join(leftover)
    )


@register(
    "pipeline_from_spec",
    # the DSL compiles to ONE Catalyst plan; the oracle is the same
    # logic as plain SQL
    """
SELECT c.c_mktsegment, o.o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 100000
GROUP BY 1, 2
ORDER BY n DESC, c_mktsegment, o_orderpriority
LIMIT 20
""",
)
def pipeline_from_spec_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.pipeline import pipeline_from_spec

    tables = {
        "orders": load_table(spark, sf_dir, "orders"),
        "customer": load_table(spark, sf_dir, "customer"),
    }
    spec = {
        "source": "orders",
        "steps": [
            {"op": "filter", "expr": "o_totalprice > 100000"},
            {
                "op": "join",
                "table": "customer",
                "on": "o_custkey = c_custkey",
                "how": "inner",
                "broadcast": True,
            },
            {
                "op": "with_column",
                "name": "cents",
                "expr": "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)",
            },
            {
                "op": "group_agg",
                "keys": ["c_mktsegment", "o_orderpriority"],
                "aggs": [
                    {"fn": "count", "col": "*", "alias": "n"},
                    {"fn": "sum", "col": "cents", "alias": "total_cents"},
                ],
            },
            {"op": "order_by", "columns": ["n desc", "c_mktsegment", "o_orderpriority"]},
            {"op": "limit", "n": 20},
        ],
    }
    return pipeline_from_spec(spark, tables, spec)


@register(
    "surrogate_keys_dense",
    # dense global numbering WITHOUT a single-partition global sort:
    # value-derived buckets -> per-bucket counts -> tiny running-offset
    # window -> per-bucket parallel row_number + offset. Oracle = the
    # naive global row_number.
    """
SELECT event_id, sk FROM (
  SELECT event_id, ROW_NUMBER() OVER (ORDER BY event_id) AS sk FROM events
) WHERE event_id % 211 = 0
ORDER BY event_id
""",
)
def surrogate_keys_dense_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense surrogate-key assignment at scale: a global row_number
    needs a single-partition sort (the driver-melting plan); instead,
    value-derived buckets (event_id DIV 10000) give a deterministic
    coarse order, per-bucket counts feed a RUNNING OFFSET over the
    tiny bucket relation, and each bucket numbers its rows in
    PARALLEL (row_number partitioned by bucket) shifted by its offset.
    Two passes, no global sort, bit-identical to the naive form —
    which is the oracle. Output gated to a 1-in-211 sample; the keys
    reflect the full numbering."""
    events = load_events(spark, sf_dir)
    b = (F.col("event_id") / 10000).cast("long").alias("bucket")
    bucketed = events.select("event_id", b)
    counts = bucketed.groupBy("bucket").agg(F.count("*").alias("n"))
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("n").over(woff), F.lit(0))
    )
    wlocal = Window.partitionBy("bucket").orderBy("event_id")
    return (
        bucketed.join(F.broadcast(offsets.select("bucket", "offset")), "bucket")
        .withColumn("sk", F.row_number().over(wlocal) + F.col("offset"))
        .filter(F.col("event_id") % 211 == 0)
        .select("event_id", "sk")
        .orderBy("event_id")
    )


@register(
    "backfill_stale_partitions",
    # oracle = the full day-partitioned aggregate; the engine must
    # reach it by recomputing ONLY the partitions whose checksums
    # diverge from a tampered snapshot
    """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1 ORDER BY 1
""",
)
def backfill_stale_partitions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent partial backfill: a prior snapshot of the
    day-partitioned aggregate has stale days (simulated
    deterministically: every 7th day's counts halved); per-day
    checksums of the CURRENT source vs the snapshot identify exactly
    the stale days, and ONLY those recompute — the orchestration
    pattern that turns a full nightly rebuild into an O(changed days)
    touch-up. The merged result must equal the full recompute (the
    oracle). The checksum diff is table_checksum's per-partition
    application."""
    events = load_events(spark, sf_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    fresh = events.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n"), F.sum(cents).alias("value_cents"))
    # the "previous run": every 7th day is stale (halved counts)
    snapshot = fresh.withColumn(
        "stale", F.dayofmonth(F.to_date("day")) % 7 == 0
    ).select(
        "day",
        F.when(F.col("stale"), (F.col("n") / 2).cast("long"))
        .otherwise(F.col("n"))
        .alias("n"),
        F.when(F.col("stale"), (F.col("value_cents") / 2).cast("long"))
        .otherwise(F.col("value_cents"))
        .alias("value_cents"),
    )
    # checksum diff: which days disagree?
    chk = lambda df: df.select(  # noqa: E731
        "day",
        F.md5(
            F.concat_ws(":", F.col("n").cast("string"), F.col("value_cents"))
        ).alias("chk"),
    )
    stale_days = (
        chk(snapshot)
        .alias("s")
        .join(chk(fresh).alias("f"), "day")
        .filter(F.col("s.chk") != F.col("f.chk"))
        .select("day")
    )
    # recompute ONLY stale days from source, keep the rest from snapshot
    recomputed = fresh.join(F.broadcast(stale_days), "day", "left_semi")
    kept = snapshot.join(F.broadcast(stale_days), "day", "left_anti")
    return kept.unionByName(recomputed).orderBy("day")


@register(
    "nested_orders_roundtrip",
    # oracle = the flat join aggregate; the engine must reach it by
    # BUILDING the nested order document (array<struct> of items) and
    # analyzing it with higher-order functions — the document-model
    # round trip a lakehouse runs daily
    """
SELECT o.o_orderkey,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(MAX(l.l_quantity) AS DOUBLE) AS max_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey % 97 = 0
GROUP BY o.o_orderkey ORDER BY o.o_orderkey
""",
)
def nested_orders_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-model round trip: lineitems COLLECT into an
    array<struct> per order (the nested write shape an event-sourcing
    or API-export job produces), then the analytics run WITHOUT
    re-exploding — size(), aggregate() and a transform/array_max fold
    over the nested column, all codegen. One shuffle to build the
    document; zero to analyze it. The oracle is the flat join — the
    comparison proves the nested pipeline loses nothing."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 97 == 0
    )
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    nested = (
        li.join(F.broadcast(orders.select("o_orderkey")), li.l_orderkey == orders.o_orderkey)
        .select(
            "o_orderkey",
            F.struct(
                cents.alias("cents"), F.col("l_quantity").alias("qty")
            ).alias("item"),
        )
        .groupBy("o_orderkey")
        .agg(F.collect_list("item").alias("items"))
    )
    return nested.select(
        "o_orderkey",
        F.size("items").cast("long").alias("n_items"),
        F.aggregate(
            F.col("items"),
            F.lit(0).cast("long"),
            lambda acc, it: acc + it["cents"],
        ).alias("total_cents"),
        F.array_max(
            F.transform(F.col("items"), lambda it: it["qty"])
        ).cast("double").alias("max_qty"),
    ).orderBy("o_orderkey")


@register(
    "late_arrival_histogram",
    # lateness = how far behind the running event-time high-watermark
    # each record arrives (arrival order = event_id); the histogram is
    # the evidence a watermark delay is chosen FROM, not guessed
    """
WITH arr AS (
  -- the fixture is time-sorted, so arrival order is a deterministic
  -- md5 permutation of event_id (simulated network reordering)
  SELECT event_id, ts,
         MAX(ts) OVER (ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
  FROM events
), lat AS (
  SELECT CASE WHEN hwm IS NULL OR ts >= hwm THEN 0
              ELSE CAST(FLOOR(EPOCH(hwm)) AS BIGINT) - CAST(FLOOR(EPOCH(ts)) AS BIGINT)
         END AS late_s
  FROM arr
)
SELECT CAST(LEAST(late_s // 60, 10) AS BIGINT) AS late_minutes_bucket,
       COUNT(*) AS n
FROM lat GROUP BY 1 ORDER BY 1
""",
)
def late_arrival_histogram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit: lateness of each record vs the running
    event-time high-watermark in ARRIVAL order (event_id), bucketed to
    minutes (capped at 10+) — the measurement that turns 'pick a
    watermark delay' from a guess into a percentile read-off. One
    window over arrival order; at 100 TB this runs per
    ingestion-partition, which is exactly how arrival order is defined
    there."""
    events = load_events(spark, sf_dir)
    # deterministic md5 arrival permutation: the fixture is time-sorted,
    # so lateness against raw event_id order would be identically zero
    w = Window.orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    ).rowsBetween(Window.unboundedPreceding, -1)
    hwm = F.max("ts").over(w)
    late_s = F.when(
        hwm.isNull() | (F.col("ts") >= hwm), F.lit(0).cast("long")
    ).otherwise(F.unix_timestamp(hwm) - F.unix_timestamp("ts"))
    return (
        events.select(late_s.alias("late_s"))
        .select(
            F.least(F.expr("late_s DIV 60"), F.lit(10).cast("long")).alias(
                "late_minutes_bucket"
            )
        )
        .groupBy("late_minutes_bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("late_minutes_bucket")
    )


@register(
    "rolling_correlation",
    # 14-day trailing correlation between daily click counts and
    # purchase value; integer moments per frame, one fixed float
    # sequence, half-up 1e-6 (n-1 frames emit NULL-free zero rows
    # are filtered by n >= 2)
    """
WITH days AS (
  SELECT CAST(ts AS DATE) AS d,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS x,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                          THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS y
  FROM events GROUP BY 1
), m AS (
  SELECT d, x, y,
         COUNT(*) OVER w AS n,
         SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
         SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy,
         SUM(x * y) OVER w AS sxy
  FROM days
  WINDOW w AS (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT strftime(d, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n,
       FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 1e6 + 0.5) / 1e6 AS corr
FROM m WHERE n >= 2
ORDER BY day
""",
)
def rolling_correlation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window correlation between two derived daily series
    (click volume vs purchase value) — the co-movement diagnostic next
    to acf_daily (self-memory) and trend_lines (drift). All five
    moments come from ONE frame-bounded window pass over the
    day-census relation; the correlation is a fixed IEEE sequence over
    exact integers, so the full trajectory mirrors."""
    events = load_events(spark, sf_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    days = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", cents)), F.lit(0)
        ).alias("y"),
    )
    w = Window.orderBy("d").rowsBetween(-13, 0)
    m = days.select(
        "d",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    num = F.col("n").cast("double") * F.col("sxy").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sy").cast("double")
    den = F.sqrt(
        (
            F.col("n").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        * (
            F.col("n").cast("double") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        )
    )
    return (
        m.filter(F.col("n") >= 2)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n",
            (F.floor(num / den * 1e6 + F.lit(0.5)) / F.lit(1e6)).alias("corr"),
        )
        .orderBy("day")
    )


@register(
    "rfm_segments",
    # RFM: recency (days since last activity), frequency (events),
    # monetary (purchase cents) per user; quintile scores via NTILE
    # over deterministic total orders; output = segment census
    """
WITH ref AS (SELECT CAST(MAX(ts) AS DATE) AS d1 FROM events),
per_user AS (
  SELECT user_id,
         datediff('day', CAST(MAX(ts) AS DATE), ref.d1) AS recency_days,
         COUNT(*) AS frequency,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                          THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS monetary
  FROM events, ref GROUP BY user_id, ref.d1
), scored AS (
  SELECT user_id,
         NTILE(5) OVER (ORDER BY recency_days, user_id) AS r_score,
         NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
         NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS m_score
  FROM per_user
)
SELECT r_score, f_score, m_score, COUNT(*) AS n_users
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""",
)
def rfm_segments_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles) —
    THE marketing-analytics workhorse. Per-user features are one
    partial-agg pass; quintile scores are NTILE windows over
    deterministic total orders (ties on user_id); the output is the
    125-cell segment census, never the user list. At 100 TB the exact
    NTILE over users is the one global sort — the documented
    alternative is feature_quantile_bins' sketch edges, same trade as
    there."""
    events = load_events(spark, sf_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    ref = events.agg(F.to_date(F.max("ts")).alias("d1"))
    per_user = (
        events.join(F.broadcast(ref))
        .groupBy("user_id", "d1")
        .agg(
            F.max(F.to_date("ts")).alias("last_d"),
            F.count("*").alias("frequency"),
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", cents)), F.lit(0)
            ).alias("monetary"),
        )
        .select(
            "user_id",
            F.datediff("d1", "last_d").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    scored = per_user.select(
        F.ntile(5).over(Window.orderBy("recency_days", "user_id")).alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("frequency"), "user_id"))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("monetary"), "user_id"))
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").alias("n_users"))
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "kcore_bounded",
    # 3 unrolled peel rounds of the k-core decomposition (k=6) over
    # the undirected interaction graph; exact integer degrees
    """
WITH edges0 AS (
  SELECT DISTINCT LEAST(user_id, event_id % 500) AS a,
         GREATEST(user_id, event_id % 500) AS b
  FROM events WHERE user_id <> event_id % 500
), d0 AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM edges0 UNION ALL SELECT b AS node FROM edges0
  ) GROUP BY node
), keep0 AS (SELECT node FROM d0 WHERE deg >= 6),
edges1 AS (
  SELECT e.a, e.b FROM edges0 e
  JOIN keep0 ka ON ka.node = e.a
  JOIN keep0 kb ON kb.node = e.b
), d1 AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM edges1 UNION ALL SELECT b AS node FROM edges1
  ) GROUP BY node
), keep1 AS (SELECT node FROM d1 WHERE deg >= 6),
edges2 AS (
  SELECT e.a, e.b FROM edges1 e
  JOIN keep1 ka ON ka.node = e.a
  JOIN keep1 kb ON kb.node = e.b
), d2 AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM edges2 UNION ALL SELECT b AS node FROM edges2
  ) GROUP BY node
)
SELECT node, CAST(deg AS BIGINT) AS deg FROM d2 WHERE deg >= 6 ORDER BY node
""",
)
def kcore_bounded_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core decomposition (k=6, 3 peel rounds): repeatedly
    drop nodes with degree < k and recount — the community-density
    filter (dense-subgraph extraction) completing the graph family's
    STRUCTURAL side (triangles count local density; k-core extracts
    the dense backbone). Each round is a degree census + two semi
    joins, shuffles carry the edge relation only; rounds compose
    lazily like Bellman-Ford's."""
    events = load_events(spark, sf_dir)
    k = 6
    edges = (
        events.select(
            F.least(F.col("user_id"), F.col("event_id") % 500).alias("a"),
            F.greatest(F.col("user_id"), F.col("event_id") % 500).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    for _ in range(3):
        deg = (
            edges.select(F.col("a").alias("node"))
            .unionByName(edges.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        edges = (
            edges.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            # each round's plan references edges ~4x (degree union +
            # two semi joins): truncate lineage or round N recomputes
            # round N-1 exponentially (measured 26s -> ~8s at sf0.01)
            .localCheckpoint()
        )
    final_deg = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .filter(F.col("deg") >= k)
    )
    return final_deg.orderBy("node")


@register(
    "token_budget_allocation",
    # greedy budget fill: sources ranked by retention quality, running
    # token totals decide full / partial / excluded; the partial
    # source's take is exact integer arithmetic
    """
WITH src AS (
  SELECT source,
         CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_docs,
         CAST(COUNT(CASE WHEN length(text) >= 100 THEN 1 END) AS BIGINT) * 1000000
           // COUNT(*) AS quality_ppm
  FROM documents GROUP BY source
), budget AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 AS b FROM src
), ranked AS (
  SELECT src.*, budget.b,
         COALESCE(SUM(n_tokens) OVER (ORDER BY quality_ppm DESC, source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_tokens
  FROM src, budget
)
SELECT source, n_tokens, CAST(quality_ppm AS BIGINT) AS quality_ppm,
       CASE WHEN prior_tokens + n_tokens <= b THEN 'full'
            WHEN prior_tokens < b THEN 'partial'
            ELSE 'excluded' END AS allocation,
       CAST(CASE WHEN prior_tokens + n_tokens <= b THEN n_tokens
            WHEN prior_tokens < b THEN b - prior_tokens
            ELSE 0 END AS BIGINT) AS tokens_taken
FROM ranked ORDER BY quality_ppm DESC, source
""",
)
def token_budget_allocation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation: fill a 50%-of-corpus training budget
    greedily by source quality (retention rate at a length gate) —
    full sources until the budget line, one partial source at the
    boundary, the rest excluded. The planning step between
    source_mixture_weights (how to flatten) and apply_mixture_weights
    (how to sample): THIS decides who gets in. All exact integers;
    the running-total window runs over the sources relation (tiny
    at any corpus scale)."""
    docs = load_table(spark, sf_dir, "documents")
    from .operators.text import tokens

    src = docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("n_tokens"),
        F.count("*").alias("n_docs"),
        F.count(F.when(F.length("text") >= 100, 1)).alias("q_cnt"),
    ).select(
        "source",
        "n_tokens",
        "n_docs",
        # exact integer ppm — float division could truncate one off
        F.expr("q_cnt * 1000000 DIV n_docs").alias("quality_ppm"),
    )
    budget = src.agg(F.expr("SUM(n_tokens) DIV 2").alias("b"))
    w = Window.orderBy(F.desc("quality_ppm"), "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = src.join(F.broadcast(budget)).withColumn(
        "prior_tokens", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    alloc = (
        F.when(
            F.col("prior_tokens") + F.col("n_tokens") <= F.col("b"), F.lit("full")
        )
        .when(F.col("prior_tokens") < F.col("b"), F.lit("partial"))
        .otherwise(F.lit("excluded"))
    )
    taken = (
        F.when(
            F.col("prior_tokens") + F.col("n_tokens") <= F.col("b"),
            F.col("n_tokens"),
        )
        .when(
            F.col("prior_tokens") < F.col("b"),
            F.col("b") - F.col("prior_tokens"),
        )
        .otherwise(F.lit(0))
    )
    return ranked.select(
        "source",
        "n_tokens",
        "quality_ppm",
        alloc.alias("allocation"),
        taken.cast("long").alias("tokens_taken"),
    ).orderBy(F.desc("quality_ppm"), "source")


@register(
    "mutual_information",
    # MI between event_type and the value-decade bucket: per-cell
    # terms quantized at 1e-9 then exact-summed (the chi2 convention);
    # the ratio inside ln is a fixed overflow-proof float sequence
    """
WITH cells AS (
  SELECT event_type AS r, CAST(FLOOR(value / 20) AS BIGINT) AS c, COUNT(*) AS o
  FROM events GROUP BY 1, 2
), rm AS (SELECT r, SUM(o) AS rm FROM cells GROUP BY r),
cm AS (SELECT c, SUM(o) AS cm FROM cells GROUP BY c),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
per AS (
  SELECT cells.r, cells.c, cells.o,
         CAST(FLOOR(
           (CAST(cells.o AS DOUBLE) / CAST(n.n AS DOUBLE))
           * LN((CAST(cells.o AS DOUBLE) / CAST(n.n AS DOUBLE))
                / ((CAST(rm.rm AS DOUBLE) / CAST(n.n AS DOUBLE))
                   * (CAST(cm.cm AS DOUBLE) / CAST(n.n AS DOUBLE))))
           * 1e9 + 0.5) AS BIGINT) AS term_u
  FROM cells JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN n
)
SELECT COUNT(*) AS n_cells,
       (SELECT n FROM n) AS n,
       SUM(term_u) / 1e9 AS mi_nats
FROM per
""",
)
def mutual_information_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event_type and the value bucket —
    the dependence MEASURE next to chi2_independence's significance
    TEST (feature selection ranks by MI; chi2 gates by p-value).
    Same 35-ish-cell contingency plan: one partial-agg shuffle, tiny
    marginal broadcasts, per-cell quantized terms exact-summed."""
    events = load_events(spark, sf_dir)
    cells = events.groupBy(
        F.col("event_type").alias("r"),
        F.floor(F.col("value") / 20).cast("long").alias("c"),
    ).agg(F.count("*").alias("o"))
    rm = cells.groupBy("r").agg(F.sum("o").alias("rm"))
    cm = cells.groupBy("c").agg(F.sum("o").alias("cm"))
    n = cells.agg(F.sum("o").alias("n"))
    p = F.col("o").cast("double") / F.col("n").cast("double")
    pr = F.col("rm").cast("double") / F.col("n").cast("double")
    pc = F.col("cm").cast("double") / F.col("n").cast("double")
    term = p * F.log(p / (pr * pc))
    per = (
        cells.join(F.broadcast(rm), "r")
        .join(F.broadcast(cm), "c")
        .join(F.broadcast(n))
        .select(
            F.floor(term * 1e9 + F.lit(0.5)).cast("long").alias("term_u"),
            "n",
        )
    )
    return per.agg(
        F.count("*").alias("n_cells"),
        F.max("n").alias("n"),
        (F.sum("term_u") / F.lit(1e9)).alias("mi_nats"),
    )


@register(
    "benford_audit",
    # first-significant-digit census of value cents vs the Benford
    # expectation log10(1 + 1/d); expected counts quantized from exact
    # integer n, deviation is an exact integer numerator
    """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM events WHERE value >= 0.01
), n AS (SELECT COUNT(*) AS n FROM digits),
obs AS (SELECT d, COUNT(*) AS o FROM digits GROUP BY d)
SELECT obs.d, obs.o,
       FLOOR(LOG10(1.0 + 1.0 / CAST(obs.d AS DOUBLE)) * CAST(n.n AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS expected,
       FLOOR((CAST(obs.o AS DOUBLE)
              - LOG10(1.0 + 1.0 / CAST(obs.d AS DOUBLE)) * CAST(n.n AS DOUBLE))
             * 1e6 + 0.5) / 1e6 AS deviation
FROM obs CROSS JOIN n
ORDER BY obs.d
""",
)
def benford_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of the value column — the
    fraud/synthetic-data forensic (natural multiplicative quantities
    follow P(d) = log10(1+1/d); fabricated ones usually don't). One
    map-side digit extraction + a 9-cell census; the expected counts
    derive from the same exact n on both engines."""
    events = load_events(spark, sf_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    digits = events.filter(F.col("value") >= 0.01).select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("d")
    )
    n = digits.agg(F.count("*").alias("n"))
    obs = digits.groupBy("d").agg(F.count("*").alias("o"))
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d").cast("double")) * F.col(
        "n"
    ).cast("double")
    q = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return (
        obs.join(F.broadcast(n))
        .select(
            "d",
            "o",
            q(expected).alias("expected"),
            q(F.col("o").cast("double") - expected).alias("deviation"),
        )
        .orderBy("d")
    )


@register(
    "sql_parameterized",
    # the named-parameter SQL API: values bind as literals AFTER
    # parsing — the injection-safe front door (the reference
    # concatenates query params into its filter logic; this is the
    # engine-grade replacement)
    """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
WHERE event_type IN ('click', 'purchase') AND value >= 25.0
GROUP BY event_type ORDER BY event_type
""",
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-parameter binding): user values
    arrive as PARAMETERS, not string concatenation, so a hostile
    value can never change the query shape — the safe version of the
    reference's param-to-filter plumbing (queryTools/index.js builds
    predicates from raw query params). Identical Catalyst plan to the
    inlined literals, proven by the oracle."""
    load_events(spark, sf_dir).createOrReplaceTempView("ksr_events_param")
    return spark.sql(
        """
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM ksr_events_param
        WHERE event_type IN (:type_a, :type_b) AND value >= :min_value
        GROUP BY event_type ORDER BY event_type
        """,
        args={"type_a": "click", "type_b": "purchase", "min_value": 25.0},
    )


@register(
    "window_session_dynamic",
    # dynamic-gap sessions: each event extends its session by a
    # PER-ROW gap (purchases hold the session open 1h, others 30min).
    # Session semantics: event windows [ts, ts+gap) merge while they
    # overlap — equivalently a new session starts when ts >= running
    # max of previous events' (ts+gap). Exact epoch-second integers.
    """
WITH ev AS (
  SELECT user_id, ts,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t,
         CASE WHEN event_type = 'purchase' THEN 3600 ELSE 1800 END AS gap_s
  FROM events
), marked AS (
  SELECT user_id, ts, t, gap_s,
         CASE WHEN MAX(t + gap_s) OVER (PARTITION BY user_id ORDER BY t, ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR t >= MAX(t + gap_s) OVER (PARTITION BY user_id ORDER BY t, ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS is_start
  FROM ev
), sess AS (
  SELECT user_id, t, gap_s,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY t, ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id, CAST(sid AS BIGINT) AS session_id, COUNT(*) AS n_events,
       MIN(t) AS start_s, MAX(t + gap_s) AS end_s
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_id
""",
)
def window_session_dynamic_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization: the session timeout depends on the
    EVENT (purchases keep a session alive for an hour, everything else
    30 minutes) — Spark's session_window accepts a gap COLUMN for
    exactly this; here the same merge semantics (event windows
    [ts, ts+gap) merge while overlapping) are expressed as
    gaps-and-islands so the oracle is exact: a session breaks when an
    event starts at-or-after the running max of previous events'
    window ends. One user-keyed shuffle shared by both window passes;
    integer epoch seconds end to end."""
    events = load_events(spark, sf_dir)
    ev = events.select(
        "user_id",
        "ts",
        F.unix_timestamp("ts").alias("t"),
        F.when(F.col("event_type") == "purchase", 3600)
        .otherwise(1800)
        .alias("gap_s"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("t", "ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("t") + F.col("gap_s")).over(wprev)
    marked = ev.withColumn(
        "is_start",
        F.when(prev_end.isNull() | (F.col("t") >= prev_end), 1).otherwise(0),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("t", "ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = marked.withColumn("sid", F.sum("is_start").over(wrun))
    return (
        sess.groupBy("user_id", F.col("sid").alias("session_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("t").alias("start_s"),
            F.max(F.col("t") + F.col("gap_s")).alias("end_s"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "window_session_dynamic_builtin",
    # Spark's BUILT-IN session_window with a per-row gap COLUMN must
    # land on exactly the hand-rolled merge rule's sessions — an
    # executable equivalence proof of the engine's dynamic-gap
    # semantics
    """
WITH ev AS (
  SELECT user_id, ts,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t,
         CASE WHEN event_type = 'purchase' THEN 3600 ELSE 1800 END AS gap_s
  FROM events
), marked AS (
  SELECT user_id, ts, t, gap_s,
         CASE WHEN MAX(t + gap_s) OVER (PARTITION BY user_id ORDER BY t, ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR t >= MAX(t + gap_s) OVER (PARTITION BY user_id ORDER BY t, ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS is_start
  FROM ev
), sess AS (
  SELECT user_id, t, gap_s,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY t, ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id, MIN(t) AS start_s, MAX(t + gap_s) AS end_s, COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
ORDER BY user_id, start_s
""",
)
def window_session_dynamic_builtin_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN form of window_session_dynamic: session_window with
    a gap-duration COLUMN. The oracle is the hand-rolled merge rule —
    so this query is an executable proof that Spark's dynamic-gap
    session semantics equal 'event windows [ts, ts+gap) merge while
    overlapping'. The streaming deployment changes groupBy to a
    watermarked stream with the SAME expression (the
    streaming_sessionize_native pattern)."""
    events = load_events(spark, sf_dir)
    gap = F.when(F.col("event_type") == "purchase", F.lit("1 hour")).otherwise(
        F.lit("30 minutes")
    )
    # truncate to whole seconds so the merge arithmetic is exactly the
    # oracle's floored-epoch integers (sub-second fractions could flip
    # a merge decision at a window boundary)
    events = events.withColumn("ts", F.timestamp_seconds(F.unix_timestamp("ts")))
    return (
        events.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("session_window.start").alias("start_s"),
            F.unix_timestamp("session_window.end").alias("end_s"),
            "n_events",
        )
        .orderBy("user_id", "start_s")
    )


@register(
    "quality_model_contributions",
    # same md5 weights, same integer-ratio features, contributions
    # around the corpus-mean baseline (linear-SHAP identity)
    f"""
WITH f AS (
  SELECT doc_id,
         CAST(FLOOR(len({_TOKS})::DOUBLE / 100.0 * 1e9 + 0.5) AS BIGINT) AS f0,
         CAST(FLOOR(len(list_filter({_TOKS}, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
           / (len({_TOKS})::DOUBLE + 1.0) * 1e9 + 0.5) AS BIGINT) AS f1,
         CAST(FLOOR(length(text)::DOUBLE / (len({_TOKS})::DOUBLE + 1.0) * 1e9 + 0.5) AS BIGINT) AS f2,
         CAST(FLOOR((length(text) - length(replace(text, '.', '')))::DOUBLE
           / (length(text)::DOUBLE + 1.0) * 1e9 + 0.5) AS BIGINT) AS f3
  FROM documents
), wts AS (
  SELECT i.i AS i,
         2 * (CAST(concat('0x', substr(md5('qw:' || i.i), 1, 15)) AS UBIGINT)
              / 1152921504606846976.0) - 1 AS w
  FROM (SELECT UNNEST(range(5)) AS i) i
), m AS (
  SELECT CAST(SUM(f0) AS BIGINT) AS s0, CAST(SUM(f1) AS BIGINT) AS s1,
         CAST(SUM(f2) AS BIGINT) AS s2, CAST(SUM(f3) AS BIGINT) AS s3,
         COUNT(*) AS nd
  FROM f
), c AS (
  SELECT doc_id,
         (SELECT w FROM wts WHERE i = 0)
           * (CAST(f0 AS DOUBLE) / 1e9 - CAST(s0 AS DOUBLE) / CAST(nd AS DOUBLE) / 1e9) AS raw_c0,
         (SELECT w FROM wts WHERE i = 1)
           * (CAST(f1 AS DOUBLE) / 1e9 - CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE) / 1e9) AS raw_c1,
         (SELECT w FROM wts WHERE i = 2)
           * (CAST(f2 AS DOUBLE) / 1e9 - CAST(s2 AS DOUBLE) / CAST(nd AS DOUBLE) / 1e9) AS raw_c2,
         (SELECT w FROM wts WHERE i = 3)
           * (CAST(f3 AS DOUBLE) / 1e9 - CAST(s3 AS DOUBLE) / CAST(nd AS DOUBLE) / 1e9) AS raw_c3
  FROM f, m
)
SELECT doc_id,
       FLOOR(raw_c0 * 1e6 + 0.5) / 1e6 AS c0,
       FLOOR(raw_c1 * 1e6 + 0.5) / 1e6 AS c1,
       FLOOR(raw_c2 * 1e6 + 0.5) / 1e6 AS c2,
       FLOOR(raw_c3 * 1e6 + 0.5) / 1e6 AS c3,
       FLOOR((raw_c0 + raw_c1 + raw_c2 + raw_c3) * 1e6 + 0.5) / 1e6 AS total_contrib
FROM c WHERE doc_id % 29 = 0
ORDER BY doc_id
""",
)
def quality_model_contributions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.quality_model_contributions(load_table(spark, sf_dir, "documents"))


@register(
    "log_parse_roundtrip",
    # the oracle computes the aggregates straight from the event
    # formulas; the ENGINE must reach them by formatting each event as
    # an Apache-combined-style log line (with a deterministic 1-in-53
    # corruption) and PARSING it back — the log-ingestion ETL proof
    """
WITH shaped AS (
  SELECT event_type,
         CASE WHEN event_id % 10 = 0 THEN 500
              WHEN event_id % 10 IN (1, 2) THEN 404
              ELSE 200 END AS status,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS bytes,
         event_id % 53 = 0 AS corrupted
  FROM events
)
SELECT event_type,
       CAST(CASE WHEN corrupted THEN NULL ELSE status END AS BIGINT) AS status,
       COUNT(*) AS n,
       CAST(COALESCE(SUM(CASE WHEN NOT corrupted THEN bytes END), 0) AS BIGINT) AS sum_bytes
FROM shaped
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def log_parse_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-ingestion ETL: events render to Apache-combined-style text
    lines (every 53rd line deterministically truncated — the corrupt
    tail every real log feed has), then a codegen regexp parse
    recovers the structure; unparseable lines surface as NULL-status
    rows instead of vanishing (the json_parse_corrupt convention).
    Formatting and parsing are both map-side; the only shuffle is the
    final census. The oracle computes the same aggregates from the
    source formulas, so any parse drift breaks the comparison."""
    events = load_events(spark, sf_dir)
    status = (
        F.when(F.col("event_id") % 10 == 0, 500)
        .when((F.col("event_id") % 10).isin(1, 2), 404)
        .otherwise(200)
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    line = F.format_string(
        '10.%d.%d.%d - - [%s] "GET /api/%s?id=%d HTTP/1.1" %d %d',
        F.pmod(F.col("user_id"), F.lit(256)),
        F.pmod(F.col("event_id"), F.lit(256)),
        F.pmod(F.col("user_id") + F.col("event_id"), F.lit(256)),
        F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss Z"),
        F.col("event_type"),
        F.col("event_id"),
        status,
        cents,
    )
    corrupted = F.col("event_id") % 53 == 0
    raw = events.select(
        F.when(corrupted, F.substring(line, 1, 20)).otherwise(line).alias("line")
    )
    pat = r'^[0-9.]+ - - \[[^\]]+\] "GET /api/([a-z]+)\?id=[0-9]+ HTTP/1\.1" ([0-9]{3}) ([0-9]+)$'
    parsed = raw.select(
        F.nullif(F.regexp_extract("line", pat, 1), F.lit("")).alias("p_type"),
        F.nullif(F.regexp_extract("line", pat, 2), F.lit("")).cast("long").alias(
            "status"
        ),
        F.nullif(F.regexp_extract("line", pat, 3), F.lit("")).cast("long").alias(
            "bytes"
        ),
    )
    # malformed lines lose their payload; the census keeps them under
    # their true type (re-derived from source — a real pipeline
    # quarantines the raw line alongside) with a NULL status
    ok = parsed.filter(F.col("status").isNotNull()).groupBy(
        F.col("p_type").alias("event_type"), "status"
    ).agg(F.count("*").alias("n"), F.sum("bytes").alias("sum_bytes"))
    bad = (
        events.filter(corrupted)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            F.lit(None).cast("long").alias("status"),
            "n",
            F.lit(0).cast("long").alias("sum_bytes"),
        )
    )
    return ok.unionByName(bad).orderBy("event_type", "status")


@register(
    "bitmap_membership",
    # per-day 64-bit presence bitmaps of user buckets via BIT_OR, then
    # day-over-day set algebra with BIT_AND/bit_count — the
    # roaring-bitmap-index technique in its pure-SQL form
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(BIT_OR(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS BIGINT) AS bm
  FROM events GROUP BY 1
), paired AS (
  SELECT d, bm,
         LAG(bm) OVER (ORDER BY d) AS prev_bm
  FROM daily
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(bit_count(bm) AS BIGINT) AS n_buckets,
       CAST(COALESCE(bit_count(bm & prev_bm), 0) AS BIGINT) AS overlap_prev,
       CAST(COALESCE(bit_count(bm | prev_bm), 0) AS BIGINT) AS union_prev
FROM paired ORDER BY day
""",
)
def bitmap_membership_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index membership: each day's active user-bucket set packs
    into a 64-bit bitmap with BIT_OR (one long per day, not a set of
    ids), and day-over-day retention/churn becomes BITWISE algebra —
    bit_count(a & b) intersections with zero joins. This is the
    roaring-bitmap / bitmap-index technique every OLAP engine uses for
    high-cardinality membership, at its pure-SQL 64-bucket
    demonstration scale; production uses arrays of these words keyed
    by bucket-block. The shuffle carries one bigint per (day), ever."""
    events = load_events(spark, sf_dir)
    bm = F.bit_or(
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
    )
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(bm.alias("bm"))
    w = Window.orderBy("d")
    paired = daily.withColumn("prev_bm", F.lag("bm").over(w))
    return paired.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.bit_count("bm").cast("long").alias("n_buckets"),
        F.coalesce(
            F.bit_count(F.col("bm").bitwiseAND(F.col("prev_bm"))), F.lit(0)
        )
        .cast("long")
        .alias("overlap_prev"),
        F.coalesce(
            F.bit_count(F.col("bm").bitwiseOR(F.col("prev_bm"))), F.lit(0)
        )
        .cast("long")
        .alias("union_prev"),
    ).orderBy("day")


@register(
    "join_asof_nearest",
    # merge_asof(direction='nearest'): backward candidate = running
    # MAX of epoch-packed (t*1e7 + max-key-per-date), forward = the
    # symmetric running MIN of (t*1e7 + min-key-per-date) — packing
    # makes both passes plain MAX/MIN over bigints, so the trajectory
    # is bit-identical across engines. Same-instant orders belong to
    # the BACKWARD pass (gap 0 wins there anyway).
    """
WITH ords AS (
  SELECT o_custkey AS uid, CAST(o_orderdate AS TIMESTAMP) AS t,
         MAX(o_orderkey) AS bkey, MIN(o_orderkey) AS fkey
  FROM orders GROUP BY 1, 2
), u AS (
  SELECT user_id AS uid, ts AS t, 0 AS is_order, event_id,
         CAST(NULL AS BIGINT) AS bp, CAST(NULL AS BIGINT) AS fp
  FROM events
  UNION ALL
  SELECT uid, t, 1, NULL,
         CAST(FLOOR(EPOCH(t)) AS BIGINT) * 10000000 + bkey,
         CAST(FLOOR(EPOCH(t)) AS BIGINT) * 10000000 + fkey
  FROM ords
), m AS (
  SELECT uid, t, is_order, event_id,
         MAX(bp) OVER (PARTITION BY uid ORDER BY t, is_order DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_packed,
         MIN(fp) OVER (PARTITION BY uid ORDER BY t, is_order DESC
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_packed
  FROM u
), ev AS (
  SELECT event_id, uid, CAST(FLOOR(EPOCH(t)) AS BIGINT) AS te, b_packed, f_packed
  FROM m WHERE is_order = 0 AND event_id % 131 = 0
)
SELECT event_id, uid AS user_id,
       CAST(CASE
         WHEN b_packed IS NULL AND f_packed IS NULL THEN NULL
         WHEN f_packed IS NULL THEN b_packed % 10000000
         WHEN b_packed IS NULL THEN f_packed % 10000000
         WHEN te - b_packed // 10000000 <= f_packed // 10000000 - te
           THEN b_packed % 10000000
         ELSE f_packed % 10000000 END AS BIGINT) AS nearest_orderkey,
       CASE
         WHEN b_packed IS NULL AND f_packed IS NULL THEN 'none'
         WHEN f_packed IS NULL THEN 'backward'
         WHEN b_packed IS NULL THEN 'forward'
         WHEN te - b_packed // 10000000 <= f_packed // 10000000 - te
           THEN 'backward'
         ELSE 'forward' END AS direction,
       CAST(CASE
         WHEN b_packed IS NULL AND f_packed IS NULL THEN NULL
         WHEN f_packed IS NULL THEN te - b_packed // 10000000
         WHEN b_packed IS NULL THEN f_packed // 10000000 - te
         WHEN te - b_packed // 10000000 <= f_packed // 10000000 - te
           THEN te - b_packed // 10000000
         ELSE f_packed // 10000000 - te END AS BIGINT) AS gap_s
FROM ev ORDER BY event_id
""",
)
def join_asof_nearest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof
    direction='nearest'): each event matches its temporally CLOSEST
    order, looking both ways, ties to the past — completing the as-of
    family (backward / tolerance / nearest). Both directional passes
    ride ONE union + ONE shuffle-sort on the user key: candidates are
    epoch-packed bigints so 'latest before' is a running MAX and
    'earliest after' is a running MIN over mirrored frames — no
    second shuffle, no theta join, engine-exact by construction."""
    events = load_events(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    ords = orders.groupBy(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
    ).agg(F.max("o_orderkey").alias("bkey"), F.min("o_orderkey").alias("fkey"))
    pack = lambda k: F.unix_timestamp("t") * F.lit(10000000) + F.col(k)  # noqa: E731
    left = events.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        "event_id",
        F.lit(None).cast("long").alias("bp"),
        F.lit(None).cast("long").alias("fp"),
    )
    right = ords.select(
        "uid",
        "t",
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        pack("bkey").alias("bp"),
        pack("fkey").alias("fp"),
    )
    order_spec = [F.col("t"), F.col("is_order").desc()]
    wb = (
        Window.partitionBy("uid")
        .orderBy(*order_spec)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("uid")
        .orderBy(*order_spec)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    m = left.unionByName(right).select(
        "uid",
        "t",
        "is_order",
        "event_id",
        F.max("bp").over(wb).alias("b_packed"),
        F.min("fp").over(wf).alias("f_packed"),
    )
    ev = m.filter((F.col("is_order") == 0) & (F.col("event_id") % 131 == 0)).select(
        "event_id",
        "uid",
        F.unix_timestamp("t").alias("te"),
        "b_packed",
        "f_packed",
    )
    bt = F.expr("b_packed DIV 10000000")
    ft = F.expr("f_packed DIV 10000000")
    use_b = F.col("f_packed").isNull() | (
        F.col("b_packed").isNotNull() & ((F.col("te") - bt) <= (ft - F.col("te")))
    )
    none = F.col("b_packed").isNull() & F.col("f_packed").isNull()
    return ev.select(
        "event_id",
        F.col("uid").alias("user_id"),
        F.when(none, F.lit(None).cast("long"))
        .when(use_b, F.expr("b_packed % 10000000"))
        .otherwise(F.expr("f_packed % 10000000"))
        .alias("nearest_orderkey"),
        F.when(none, "none")
        .when(use_b, "backward")
        .otherwise("forward")
        .alias("direction"),
        F.when(none, F.lit(None).cast("long"))
        .when(use_b, F.col("te") - bt)
        .otherwise(ft - F.col("te"))
        .alias("gap_s"),
    ).orderBy("event_id")


@register(
    "sequence_pattern_regex",
    # each user's timeline compresses to a type-initial string; the
    # behavioural pattern 'view, clicks*, purchase' is then ONE
    # codegen regex count — MATCH_RECOGNIZE-lite where the row
    # pattern literally IS a regex (both engines: leftmost,
    # non-overlapping)
    """
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id, length(seq) AS seq_len,
       CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_matches
FROM seqs WHERE user_id % 17 = 0
ORDER BY user_id
""",
)
def sequence_pattern_regex_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching as a regex over the compressed timeline:
    each user's events collapse to a string of type initials (ordered
    by time), and 'view, then any clicks, then purchase' is ONE
    regexp count per user — the MATCH_RECOGNIZE workhorse shapes
    (funnels, A*B patterns) without a pattern-automaton engine. The
    sort happens INSIDE array_sort on (ts, event_id, initial) structs
    — map-side after the one groupBy shuffle; the regex is codegen.
    Timelines are user-bounded, so the string length is too (chunk by
    session for power users at 100 TB)."""
    events = load_events(spark, sf_dir)
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("ts").alias("t"),
                F.col("event_id").alias("e"),
                F.substring("event_type", 1, 1).alias("c"),
            )
        )
    )
    seqs = (
        events.groupBy("user_id")
        .agg(arr.alias("arr"))
        .select(
            "user_id",
            F.concat_ws("", F.transform("arr", lambda x: x["c"])).alias("seq"),
        )
    )
    return (
        seqs.filter(F.col("user_id") % 17 == 0)
        .select(
            "user_id",
            F.length("seq").cast("long").alias("seq_len"),
            F.regexp_count("seq", F.lit("vc*p")).cast("long").alias("n_matches"),
        )
        .orderBy("user_id")
    )


@register(
    "attribution_models",
    # multi-touch attribution in ONE pass: a 24h RANGE frame over the
    # epoch-ordered union gives first-touch (running MIN of packed
    # click ids), last-touch (MAX) and touch count (SUM) per purchase
    """
WITH u AS (
  SELECT user_id AS uid, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t,
         1 AS is_click,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) * 10000000 + event_id AS cp,
         CAST(NULL AS BIGINT) AS purchase_id
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT), 0,
         CAST(NULL AS BIGINT), event_id
  FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT uid, t, purchase_id,
         MIN(cp) OVER w AS first_packed,
         MAX(cp) OVER w AS last_packed,
         SUM(is_click) OVER w AS n_touches
  FROM u
  WINDOW w AS (PARTITION BY uid ORDER BY t
               RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
)
SELECT purchase_id, uid AS user_id,
       CAST(first_packed % 10000000 AS BIGINT) AS first_touch_id,
       CAST(last_packed % 10000000 AS BIGINT) AS last_touch_id,
       CAST(n_touches AS BIGINT) AS n_touches
FROM m
WHERE purchase_id IS NOT NULL AND purchase_id % 61 = 0
ORDER BY purchase_id
""",
)
def attribution_models_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution (first-touch / last-touch / linear
    denominator) for every purchase against its 24h click lookback —
    the batch complement of the streaming attribution matrix (those
    join ONE click per conversion; marketing wants all three credit
    models). A value-based RANGE frame over the epoch-ordered union
    computes all three in one window pass: first = running MIN of
    epoch-packed click ids, last = MAX, count = SUM — no join at all.
    RANGE frames are peer-inclusive, so same-instant clicks count,
    deterministically on both engines."""
    events = load_events(spark, sf_dir)
    t = F.unix_timestamp("ts")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("uid"),
        t.alias("t"),
        F.lit(1).alias("is_click"),
        (t * F.lit(10000000) + F.col("event_id")).alias("cp"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid"),
        t.alias("t"),
        F.lit(0).alias("is_click"),
        F.lit(None).cast("long").alias("cp"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("t")
        .rangeBetween(-86400, 0)
    )
    m = clicks.unionByName(purchases).select(
        "uid",
        "purchase_id",
        F.min("cp").over(w).alias("first_packed"),
        F.max("cp").over(w).alias("last_packed"),
        F.sum("is_click").over(w).alias("n_touches"),
    )
    return (
        m.filter(F.col("purchase_id").isNotNull() & (F.col("purchase_id") % 61 == 0))
        .select(
            "purchase_id",
            F.col("uid").alias("user_id"),
            F.expr("first_packed % 10000000").alias("first_touch_id"),
            F.expr("last_packed % 10000000").alias("last_touch_id"),
            F.col("n_touches").cast("long").alias("n_touches"),
        )
        .orderBy("purchase_id")
    )


@register(
    "conversion_latency_histogram",
    # click -> purchase latency via the running-last window (the
    # attribution primitive), bucketed to minutes capped at 120+
    """
WITH tagged AS (
  SELECT user_id, ts, 1 AS is_click, CAST(NULL AS TIMESTAMP) AS pts
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, 0, ts FROM events WHERE event_type = 'purchase'
), lastc AS (
  SELECT user_id, is_click, pts,
         MAX(CASE WHEN is_click = 1 THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, is_click DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
  FROM tagged
)
SELECT CAST(LEAST((CAST(FLOOR(EPOCH(pts)) AS BIGINT)
                   - CAST(FLOOR(EPOCH(last_click)) AS BIGINT)) // 60, 120) AS BIGINT)
         AS latency_minutes,
       COUNT(*) AS n
FROM lastc
WHERE is_click = 0 AND last_click IS NOT NULL
GROUP BY 1 ORDER BY 1
""",
)
def conversion_latency_histogram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: minutes between each purchase and
    its most recent prior click, histogram-bucketed (capped 120+) —
    the funnel family's latency read-out (funnel_counts says HOW MANY
    convert; this says HOW FAST, which is what the attribution
    lookback window should be sized from). Same one-shuffle
    union + running-last primitive as join_asof."""
    events = load_events(spark, sf_dir)
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(1).alias("is_click"),
        F.lit(None).cast("timestamp").alias("pts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(0).alias("is_click"), F.col("ts").alias("pts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_click").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lastc = clicks.unionByName(purchases).withColumn(
        "last_click", F.max(F.when(F.col("is_click") == 1, F.col("ts"))).over(w)
    )
    lat = F.least(
        F.expr("(unix_timestamp(pts) - unix_timestamp(last_click)) DIV 60"),
        F.lit(120).cast("long"),
    )
    return (
        lastc.filter((F.col("is_click") == 0) & F.col("last_click").isNotNull())
        .groupBy(lat.alias("latency_minutes"))
        .agg(F.count("*").alias("n"))
        .orderBy("latency_minutes")
    )


@register(
    "quarantine_split",
    # contract enforcement: every row carries its full violation list
    # (not just the first), the census keys on the reason SET
    """
WITH checked AS (
  SELECT event_id,
         (event_type NOT IN ('click','view','purchase','signup','error')) AS bad_type,
         (value < 0 OR value > 10000) AS bad_value,
         (user_id IS NULL OR user_id < 0) AS bad_user,
         (event_id % 89 = 0) AS bad_injected
  FROM events
), reasons AS (
  SELECT event_id,
         concat(CASE WHEN bad_type THEN 'type;' ELSE '' END,
                CASE WHEN bad_value THEN 'value;' ELSE '' END,
                CASE WHEN bad_user THEN 'user;' ELSE '' END,
                CASE WHEN bad_injected THEN 'checksum;' ELSE '' END) AS reason_set
  FROM checked
)
SELECT CASE WHEN reason_set = '' THEN 'valid' ELSE reason_set END AS reasons,
       COUNT(*) AS n
FROM reasons GROUP BY 1 ORDER BY 1
""",
)
def quarantine_split_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-contract enforcement with a QUARANTINE: each row is
    checked against every contract rule (enum domain, value range,
    key validity, plus a deterministic injected 'checksum' failure so
    the quarantine path is exercised) and carries its FULL violation
    list — the split a production ingest runs before landing data
    (expectations_check reports corpus health; this routes rows).
    All rules are one codegen pass; the census keys on the reason
    combination."""
    events = load_events(spark, sf_dir)
    rules = [
        ("type;", ~F.col("event_type").isin("click", "view", "purchase", "signup", "error")),
        ("value;", (F.col("value") < 0) | (F.col("value") > 10000)),
        ("user;", F.col("user_id").isNull() | (F.col("user_id") < 0)),
        ("checksum;", F.col("event_id") % 89 == 0),
    ]
    reason = F.concat(
        *[F.when(cond, F.lit(tag)).otherwise(F.lit("")) for tag, cond in rules]
    )
    return (
        events.select(
            F.when(reason == "", F.lit("valid")).otherwise(reason).alias("reasons")
        )
        .groupBy("reasons")
        .agg(F.count("*").alias("n"))
        .orderBy("reasons")
    )


@register(
    "quantile_normalize",
    # batch-effect correction: each group's values map onto the GLOBAL
    # distribution through a 101-point discrete quantile grid (exact at
    # oracle scale per the GK degenerate-accuracy convention); grid
    # index is exact integer rank arithmetic
    """
WITH ranked AS (
  SELECT event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS ns
  FROM events
), gl AS (
  SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS gr,
         COUNT(*) OVER () AS n
  FROM events
), grid AS (
  SELECT t.g, gl.value AS gv
  FROM (SELECT i AS g, 1 + (i * ((SELECT COUNT(*) FROM events) - 1)) // 100 AS target
        FROM (SELECT unnest(generate_series(0, 100)) AS i)) t
  JOIN gl ON gl.gr = t.target
)
SELECT r.event_id, r.event_type, r.value,
       ROUND(grid.gv, 4) AS normalized
FROM ranked r
JOIN grid ON grid.g = CASE WHEN r.ns = 1 THEN 0
                           ELSE ((r.r - 1) * 100) // (r.ns - 1) END
WHERE r.event_id % 173 = 0
ORDER BY r.event_id
""",
)
def quantile_normalize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across groups (batch-effect correction:
    bioinformatics' cross-array fix, a feature-prep classic): each
    value is replaced by the GLOBAL distribution's value at its
    WITHIN-GROUP percent rank, so every group ends up with the same
    marginal distribution. Grid index is exact integer rank algebra;
    the 101-point global grid is one percentile_approx pass (exact at
    oracle scale, bounded-error at 100 TB — the feature_quantile_bins
    trade) broadcast to the rank join. Output gated 1-in-173."""
    events = load_events(spark, sf_dir)
    wrk = Window.partitionBy("event_type").orderBy("value", "event_id")
    wct = Window.partitionBy("event_type")
    ranked = events.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(wrk).alias("r"),
        F.count("*").over(wct).alias("ns"),
    )
    # global order statistics WITHOUT a single-partition sort: the
    # value domain is cents-bounded, so a counting-sort rank works —
    # per-cent-bucket counts feed a running offset over the tiny
    # bucket relation, and each row's exact global rank is
    # offset + within-bucket row_number (all parallel). The 101 grid
    # targets are exact integer rank positions joined against that.
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    bucketed = events.select("event_id", "value", cents.alias("b"))
    counts = bucketed.groupBy("b").agg(F.count("*").alias("cn"))
    woff = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cn").over(woff), F.lit(0))
    )
    wloc = Window.partitionBy("b").orderBy("value", "event_id")
    glob = (
        bucketed.join(F.broadcast(offsets.select("b", "off")), "b")
        .withColumn("gr", F.row_number().over(wloc) + F.col("off"))
    )
    n_total = events.agg(F.count("*").alias("n"))
    targets = (
        events.sparkSession.range(0, 101)
        .select(F.col("id").alias("g"))
        .join(F.broadcast(n_total))
        .select("g", F.expr("1 + (g * (n - 1)) DIV 100").alias("target"))
    )
    grid = glob.join(
        F.broadcast(targets), glob.gr == targets.target
    ).select("g", F.col("value").alias("gv"))
    gidx = F.when(F.col("ns") == 1, F.lit(0)).otherwise(
        F.expr("((r - 1) * 100) DIV (ns - 1)")
    )
    return (
        ranked.withColumn("g", gidx)
        .join(F.broadcast(grid), "g")
        .filter(F.col("event_id") % 173 == 0)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("gv", 4).alias("normalized"),
        )
        .orderBy("event_id")
    )


@register(
    "varint_delta_report",
    # storage-encoding audit: per day, bytes to store sorted event ids
    # raw (8B) vs delta+varint encoded — exact integer byte math via
    # CASE thresholds (the parquet DELTA_BINARY_PACKED intuition)
    """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, event_id,
         event_id - LAG(event_id) OVER (PARTITION BY CAST(ts AS DATE) ORDER BY event_id) AS delta
  FROM events
), sized AS (
  SELECT day,
         CASE WHEN delta IS NULL THEN 8
              WHEN delta < 128 THEN 1
              WHEN delta < 16384 THEN 2
              WHEN delta < 2097152 THEN 3
              WHEN delta < 268435456 THEN 4
              ELSE 8 END AS nb
  FROM d
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       COUNT(*) AS n_ids,
       COUNT(*) * 8 AS raw_bytes,
       CAST(SUM(nb) AS BIGINT) AS encoded_bytes,
       FLOOR(CAST(COUNT(*) * 8 AS DOUBLE) / CAST(SUM(nb) AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS compression_ratio
FROM sized GROUP BY day ORDER BY day
""",
)
def varint_delta_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-encoding audit: how much smaller each day's sorted id
    column gets under delta + varint encoding (the
    DELTA_BINARY_PACKED / Kinesis sequence-number intuition) — exact
    integer byte accounting per id, one window + census. The report a
    storage engineer reads before picking column encodings; at 100 TB
    this is file-layout money."""
    events = load_events(spark, sf_dir)
    w = Window.partitionBy(F.to_date("ts")).orderBy("event_id")
    d = events.select(
        F.to_date("ts").alias("day"),
        (F.col("event_id") - F.lag("event_id").over(w)).alias("delta"),
    )
    nb = (
        F.when(F.col("delta").isNull(), 8)
        .when(F.col("delta") < 128, 1)
        .when(F.col("delta") < 16384, 2)
        .when(F.col("delta") < 2097152, 3)
        .when(F.col("delta") < 268435456, 4)
        .otherwise(8)
    )
    return (
        d.select(F.date_format("day", "yyyy-MM-dd").alias("day"), nb.alias("nb"))
        .groupBy("day")
        .agg(
            F.count("*").alias("n_ids"),
            (F.count("*") * 8).alias("raw_bytes"),
            F.sum("nb").cast("long").alias("encoded_bytes"),
            (
                F.floor(
                    (F.count("*") * 8).cast("double")
                    / F.sum("nb").cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("compression_ratio"),
        )
        .orderBy("day")
    )


@register(
    "streaming_quarantine_counts",
    # the contract gate ON the stream: per-reason counts are additive
    # across micro-batches, so the drained complete-mode census equals
    # the batch quarantine_split exactly
    """
WITH checked AS (
  SELECT event_id,
         (event_type NOT IN ('click','view','purchase','signup','error')) AS bad_type,
         (value < 0 OR value > 10000) AS bad_value,
         (user_id IS NULL OR user_id < 0) AS bad_user,
         (event_id % 89 = 0) AS bad_injected
  FROM events
), reasons AS (
  SELECT event_id,
         concat(CASE WHEN bad_type THEN 'type;' ELSE '' END,
                CASE WHEN bad_value THEN 'value;' ELSE '' END,
                CASE WHEN bad_user THEN 'user;' ELSE '' END,
                CASE WHEN bad_injected THEN 'checksum;' ELSE '' END) AS reason_set
  FROM checked
)
SELECT CASE WHEN reason_set = '' THEN 'valid' ELSE reason_set END AS reasons,
       COUNT(*) AS n
FROM reasons GROUP BY 1 ORDER BY 1
""",
)
def streaming_quarantine_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quarantine_split maintained ON the stream: the same one-pass
    contract rules gate each micro-batch and the per-reason census
    accumulates in complete mode — what the ingest job's dead-letter
    metrics exporter reports, slicing-invariant by additivity."""
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    rules = [
        ("type;", ~F.col("event_type").isin("click", "view", "purchase", "signup", "error")),
        ("value;", (F.col("value") < 0) | (F.col("value") > 10000)),
        ("user;", F.col("user_id").isNull() | (F.col("user_id") < 0)),
        ("checksum;", F.col("event_id") % 89 == 0),
    ]
    reason = F.concat(
        *[F.when(cond, F.lit(tag)).otherwise(F.lit("")) for tag, cond in rules]
    )
    counts = (
        stream.select(
            F.when(reason == "", F.lit("valid")).otherwise(reason).alias("reasons")
        )
        .groupBy("reasons")
        .agg(F.count("*").alias("n"))
    )
    return jobs.run_available_now(counts, "streaming_quarantine_counts")


@register(
    "multimodal_phash_dedup",
    # the oracle recomputes every perceptual hash from the pixel
    # FORMULAS (decode-free), then runs the same band-blocked hamming
    # join — so the engine's real decode+hash+block pipeline is fully
    # value-checked
    """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h FROM documents
), cells AS (
  SELECT doc_id, yy.i * 8 + xx.i AS p,
         (((doc_id * 7 + 3 * (((yy.i * h) // 8) * w + ((xx.i * w) // 8)) + 0) % 256)
          + ((doc_id * 7 + 3 * (((yy.i * h) // 8) * w + ((xx.i * w) // 8)) + 1) % 256)
          + ((doc_id * 7 + 3 * (((yy.i * h) // 8) * w + ((xx.i * w) // 8)) + 2) % 256)) // 3 AS gray
  FROM dims
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) yy
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) xx
), tot AS (
  SELECT doc_id, p, gray, SUM(gray) OVER (PARTITION BY doc_id) AS total FROM cells
), ph AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN p < 63 AND gray * 64 > total THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS phash
  FROM tot GROUP BY doc_id
), groups AS (
  SELECT phash, COUNT(*) AS sz FROM ph GROUP BY phash
), bands AS (
  SELECT phash, sz, b.i AS band, (phash >> (b.i * 16)) & 65535 AS key
  FROM groups CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) b
), cand AS (
  SELECT DISTINCT a.phash AS ap, b.phash AS bp, a.sz AS sa, b.sz AS sb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.phash < b.phash
)
SELECT (SELECT CAST(SUM(sz) AS BIGINT) FROM groups) AS n_images,
       (SELECT COUNT(*) FROM groups) AS n_distinct_hashes,
       (SELECT CAST(SUM(sz) - COUNT(*) AS BIGINT) FROM groups) AS exact_dup_images,
       COUNT(CASE WHEN bit_count(CAST(xor(ap, bp) AS BIGINT)) <= 2 THEN 1 END) AS n_near_hash_pairs,
       CAST(COALESCE(SUM(CASE WHEN bit_count(CAST(xor(ap, bp) AS BIGINT)) <= 2
                         THEN sa * sb END), 0) AS BIGINT) AS near_dup_mass
FROM cand
""",
)
def multimodal_phash_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup detection over REAL decoded images: decode
    (actual PPM parsing on executors) -> integer grayscale -> 8x8
    sign-safe 63-bit average-hash -> 4-band (16-bit) blocked hamming join (complete for hamming
    <= 3 by pigeonhole) -> pairs at distance <= 2 — the multimodal
    member of the near-dup family (simhash for text, phash for
    pixels), with the same banded-blocking scale shape as MinHash LSH.
    The shuffle carries 16-bit hashes, never pixels."""
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthetic_ppm_media(docs)
    return _phash_dedup_report(multimodal.image_phash(media))


def _phash_dedup_report(ph: DataFrame) -> DataFrame:
    """Shared banded-hamming phash dedup report (PPM and JPEG legs).
    Collapses to DISTINCT hashes FIRST (the dedup_minhash_canonical
    lesson: replicated corpora make doc-level pair emission quadratic
    — the first draft measured 367s at 20x docs; hash-level pairs
    with group weights are linear in distinct hashes)."""
    groups = ph.groupBy("phash").agg(F.count("*").alias("sz"))
    bands = groups.select(
        "phash",
        "sz",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn("key", F.expr("(phash >> (band * 16)) & 65535")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.phash") < F.col("b.phash")),
        )
        .select(
            F.col("a.phash").alias("ap"),
            F.col("b.phash").alias("bp"),
            F.col("a.sz").alias("sa"),
            F.col("b.sz").alias("sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ap").bitwiseXOR(F.col("bp")))
    stats = groups.agg(
        F.sum("sz").alias("n_images"),
        F.count("*").alias("n_distinct_hashes"),
        (F.sum("sz") - F.count("*")).alias("exact_dup_images"),
    )
    return cand.agg(
        F.count(F.when(hamming <= 2, 1)).alias("n_near_hash_pairs"),
        F.coalesce(
            F.sum(F.when(hamming <= 2, F.col("sa") * F.col("sb"))), F.lit(0)
        )
        .cast("long")
        .alias("near_dup_mass"),
    ).join(F.broadcast(stats)).select(
        "n_images",
        "n_distinct_hashes",
        "exact_dup_images",
        "n_near_hash_pairs",
        "near_dup_mass",
    )


@register(
    "tfidf_cosine_pairs",
    # sparse cosine similarity join over the df-pruned tf-idf space:
    # weights quantized to exact milli-units, dot products exact
    # bigints via the inverted-index join, norms via IEEE sqrt of
    # exact sums — one float division per pair
    """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents,
       LATERAL UNNEST(string_split(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' ')) AS t(term)
  WHERE t.term <> ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
w AS (
  SELECT tf.doc_id, tf.term,
         CAST(FLOOR(tf.tf * LN(CAST(nd.n AS DOUBLE) / CAST(df.df AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS wu
  FROM tf JOIN df USING (term) CROSS JOIN nd
  WHERE df.df BETWEEN 2 AND 50
), norms AS (
  SELECT doc_id, CAST(FLOOR(SQRT(CAST(SUM(wu * wu) AS DOUBLE))) AS BIGINT) AS nu
  FROM w GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(SUM(a.wu * b.wu) AS BIGINT) AS dot_u
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       FLOOR(CAST(dot_u AS DOUBLE) / (CAST(na.nu AS DOUBLE) * CAST(nb.nu AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS cosine
FROM dots
JOIN norms na ON na.doc_id = a_id
JOIN norms nb ON nb.doc_id = b_id
WHERE CAST(dot_u AS DOUBLE) / (CAST(na.nu AS DOUBLE) * CAST(nb.nu AS DOUBLE)) >= 0.5
ORDER BY a_id, b_id
""",
)
def tfidf_cosine_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse cosine similarity join over tf-idf vectors — the
    SPARSE-vector member of the similarity family
    (dedup_embedding_cosine is the dense side, dedup_ngram_jaccard the
    set side; this weights shared terms by informativeness). The
    inverted-index join touches only shared terms, and the df window
    [2, 50] is the scale lever: singleton terms can't pair, stop-terms
    (the quadratic fan-out) are pruned — the standard
    similarity-join-with-df-cutoff design. Exact integer milli-weights
    end to end; one float division per surviving pair."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), "[^a-z0-9 ]", "")
    toks = docs.select(
        "doc_id", F.explode(F.split(normalized, " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = docs.agg(F.count_distinct("doc_id").alias("n"))
    w = (
        tf.join(F.broadcast(df), "term")
        .filter((F.col("df") >= 2) & (F.col("df") <= 50))
        .join(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            F.floor(
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df").cast("double"))
                * 1000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("wu"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.floor(F.sqrt(F.sum(F.col("wu") * F.col("wu")).cast("double")))
        .cast("long")
        .alias("nu")
    )
    a = w.alias("a")
    b = w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.sum(F.col("a.wu") * F.col("b.wu")).alias("dot_u"))
    )
    cos = F.col("dot_u").cast("double") / (
        F.col("na.nu").cast("double") * F.col("nb.nu").cast("double")
    )
    return (
        dots.join(norms.alias("na"), F.col("a_id") == F.col("na.doc_id"))
        .join(norms.alias("nb"), F.col("b_id") == F.col("nb.doc_id"))
        .filter(cos >= 0.5)
        .select(
            "a_id",
            "b_id",
            (F.floor(cos * 1e6 + F.lit(0.5)) / F.lit(1e6)).alias("cosine"),
        )
        .orderBy("a_id", "b_id")
    )


@register(
    "item_item_recs",
    # "bought X also bought Y": basket co-occurrence ranked by lift,
    # top-3 per item — map-side pair generation from collect_set
    # arrays (the assoc_rules shape) + a per-item TakeOrdered window
    """
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS o, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey
), n AS (SELECT COUNT(DISTINCT o) AS n FROM baskets),
ic AS (SELECT item, COUNT(*) AS cnt FROM baskets GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS cooc
  FROM baskets a JOIN baskets b ON a.o = b.o AND a.item <> b.item
  GROUP BY 1, 2
), scored AS (
  SELECT item_a, item_b, cooc,
         FLOOR(CAST(cooc * n.n AS DOUBLE) / CAST(ca.cnt * cb.cnt AS DOUBLE) * 1e6 + 0.5) / 1e6 AS lift
  FROM pairs
  JOIN ic ca ON ca.item = pairs.item_a
  JOIN ic cb ON cb.item = pairs.item_b
  CROSS JOIN n
  WHERE cooc >= 10
)
SELECT item_a, item_b, cooc, lift, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY item_a ORDER BY lift DESC, item_b) AS rnk
  FROM scored
) WHERE rnk <= 3
ORDER BY item_a, rnk
""",
)
def item_item_recs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item recommendations ('customers who bought X also bought
    Y'): directed basket co-occurrence ranked by lift, top-3 per item
    — the retail serving table assoc_rules' rule mining feeds. Pairs
    are emitted MAP-SIDE from per-basket sorted arrays (both
    directions of each unordered pair), the census is partial-agg'd,
    and the per-item ranking is a WindowGroupLimit over the pair
    relation — never baskets."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    arrs = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("item"))
        .groupBy("o")
        .agg(F.sort_array(F.collect_set("item")).alias("items"))
    )
    n = arrs.select(F.count("*").alias("n"))
    item_counts = (
        arrs.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
    )
    pair_structs = F.explode(
        F.flatten(
            F.transform(
                F.col("items"),
                lambda x: F.transform(
                    F.filter(F.col("items"), lambda y: y != x),
                    lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
                ),
            )
        )
    )
    pairs = (
        arrs.select(pair_structs.alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("cooc"))
        .filter(F.col("cooc") >= 10)
    )
    ca = item_counts.select(F.col("item").alias("item_a"), F.col("cnt").alias("ca"))
    cb = item_counts.select(F.col("item").alias("item_b"), F.col("cnt").alias("cb"))
    lift = (
        F.floor(
            (F.col("cooc") * F.col("n")).cast("double")
            / (F.col("ca") * F.col("cb")).cast("double")
            * 1e6
            + F.lit(0.5)
        )
        / F.lit(1e6)
    )
    w = Window.partitionBy("item_a").orderBy(F.desc("lift"), "item_b")
    return (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .join(F.broadcast(n))
        .select("item_a", "item_b", "cooc", lift.alias("lift"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("item_a", "rnk")
    )


@register(
    "tiered_billing_report",
    # tiered usage pricing per tenant: exact integer unit accounting
    # through three price bands — micro-cents arithmetic, no floats
    # until the final display division
    """
WITH usage AS (
  SELECT user_id % 50 AS tenant, COUNT(*) AS units FROM events GROUP BY 1
), tiers AS (
  SELECT tenant, units,
         LEAST(units, 100) AS t1_units,
         LEAST(GREATEST(units - 100, 0), 400) AS t2_units,
         GREATEST(units - 500, 0) AS t3_units
  FROM usage
)
SELECT tenant, CAST(units AS BIGINT) AS units,
       CAST(t1_units * 500 + t2_units * 300 + t3_units * 100 AS BIGINT) AS microcents,
       FLOOR(CAST(t1_units * 500 + t2_units * 300 + t3_units * 100 AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4
         AS dollars
FROM tiers ORDER BY tenant
""",
)
def tiered_billing_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Usage metering with tiered pricing: per-tenant event units
    through three price bands (first 100 at 500 micro-cents, next 400
    at 300, the rest at 100) — the billing aggregation every
    usage-based product runs nightly, exact integer micro-cents until
    the display conversion. One partial-agg shuffle bounded by
    tenants."""
    events = load_events(spark, sf_dir)
    usage = events.groupBy((F.col("user_id") % 50).alias("tenant")).agg(
        F.count("*").alias("units")
    )
    t1 = F.least(F.col("units"), F.lit(100))
    t2 = F.least(F.greatest(F.col("units") - 100, F.lit(0)), F.lit(400))
    t3 = F.greatest(F.col("units") - 500, F.lit(0))
    micro = t1 * 500 + t2 * 300 + t3 * 100
    return usage.select(
        "tenant",
        "units",
        micro.cast("long").alias("microcents"),
        (
            F.floor(micro.cast("double") / 1e6 * 1e4 + F.lit(0.5)) / F.lit(1e4)
        ).alias("dollars"),
    ).orderBy("tenant")


@register(
    "uptime_report",
    # availability from the event stream itself: per-type gaps over 30
    # minutes are outages; exact epoch-second accounting
    """
WITH g AS (
  SELECT event_type,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT)
           - CAST(FLOOR(EPOCH(LAG(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id))) AS BIGINT)
           AS gap_s
  FROM events
), span AS (
  SELECT event_type,
         CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) - CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS span_s
  FROM events GROUP BY event_type
)
SELECT g.event_type,
       COUNT(CASE WHEN gap_s > 1800 THEN 1 END) AS n_outages,
       CAST(COALESCE(SUM(CASE WHEN gap_s > 1800 THEN gap_s END), 0) AS BIGINT) AS downtime_s,
       MAX(span.span_s) AS span_s,
       FLOOR((1.0 - CAST(COALESCE(SUM(CASE WHEN gap_s > 1800 THEN gap_s END), 0) AS DOUBLE)
                    / CAST(MAX(span.span_s) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS availability
FROM g JOIN span USING (event_type)
GROUP BY g.event_type
ORDER BY g.event_type
""",
)
def uptime_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Availability accounting from the stream itself: a silent gap
    longer than 30 minutes in a source's events IS an outage (there is
    no better signal at the data layer), so per-type downtime and the
    availability ratio fall out of one LAG window + census — the SRE
    report next to late_arrival_histogram (that sizes watermarks, this
    pages people). Exact epoch seconds; one float division for the
    ratio."""
    events = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = events.select(
        "event_type",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    )
    span = events.groupBy("event_type").agg(
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "span_s"
        )
    )
    down = F.coalesce(
        F.sum(F.when(F.col("gap_s") > 1800, F.col("gap_s"))), F.lit(0)
    )
    return (
        g.join(span, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("gap_s") > 1800, 1)).alias("n_outages"),
            down.cast("long").alias("downtime_s"),
            F.max("span_s").alias("span_s"),
            (
                F.floor(
                    (
                        F.lit(1.0)
                        - down.cast("double") / F.max("span_s").cast("double")
                    )
                    * 1e6
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("availability"),
        )
        .orderBy("event_type")
    )


@register(
    "stock_ledger_dips",
    # signed-quantity running ledger per part: R-flag lines consume,
    # others restock; exact integers, one window pass; the report
    # flags parts whose balance ever dipped below zero
    """
WITH ledger AS (
  SELECT l_partkey,
         CASE WHEN l_returnflag = 'R' THEN -CAST(l_quantity AS BIGINT)
              ELSE CAST(l_quantity AS BIGINT) END AS delta,
         l_shipdate, l_orderkey, l_linenumber
  FROM lineitem
), run AS (
  SELECT l_partkey,
         SUM(delta) OVER (PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
  FROM ledger
)
SELECT l_partkey,
       CAST(MIN(bal) AS BIGINT) AS min_balance,
       CAST(MAX(bal) AS BIGINT) AS max_balance,
       CAST(SUM(CASE WHEN bal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative_points,
       MIN(bal) < 0 AS ever_negative
FROM run
WHERE l_partkey % 97 = 0
GROUP BY l_partkey
ORDER BY l_partkey
""",
)
def stock_ledger_dips_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stock-ledger semantics: per-part signed running balance
    (returns consume, shipments restock) with dip detection — the
    inventory/accounting ledger pass (running balances + covenant
    checks) that generalizes window_running_total to business rules.
    One part-keyed window over a deterministic (date, order, line)
    total order; exact integer quantities. Output gated to a 1-in-97
    part sample after the window."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    delta = F.when(
        F.col("l_returnflag") == "R", -F.col("l_quantity").cast("long")
    ).otherwise(F.col("l_quantity").cast("long"))
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = lineitem.select(
        "l_partkey", F.sum(delta).over(w).alias("bal")
    )
    return (
        run.filter(F.col("l_partkey") % 97 == 0)
        .groupBy("l_partkey")
        .agg(
            F.min("bal").alias("min_balance"),
            F.max("bal").alias("max_balance"),
            F.sum(F.when(F.col("bal") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_negative_points"),
            (F.min("bal") < 0).alias("ever_negative"),
        )
        .orderBy("l_partkey")
    )


@register(
    "cycle_time_report",
    # process mining lite: order-to-last-shipment cycle days per
    # priority with discrete quartiles (exact integer day counts)
    """
WITH cycles AS (
  SELECT o.o_orderpriority AS priority,
         datediff('day', CAST(o.o_orderdate AS DATE), CAST(MAX(l.l_shipdate) AS DATE)) AS cycle_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
)
SELECT priority, COUNT(*) AS n_orders,
       CAST(MIN(cycle_days) AS BIGINT) AS min_days,
       CAST(quantile_disc(cycle_days, 0.5) AS BIGINT) AS median_days,
       CAST(quantile_disc(cycle_days, 0.95) AS BIGINT) AS p95_days,
       CAST(MAX(cycle_days) AS BIGINT) AS max_days
FROM cycles GROUP BY priority ORDER BY priority
""",
)
def cycle_time_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining cycle times: order placement to LAST shipment,
    summarized per priority with discrete order statistics — the
    operational SLA readout (are urgent orders actually faster?).
    One join + per-order aggregate + a priority-bounded percentile
    pass; exact integer days (percentile_approx is exact at oracle
    scale per the GK degenerate-accuracy convention)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cycles = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.to_date("last_ship"), F.to_date("o_orderdate")).alias(
                "cycle_days"
            ),
        )
    )
    return (
        cycles.groupBy("priority")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("cycle_days").cast("long").alias("min_days"),
            F.percentile_approx("cycle_days", 0.5, 100000)
            .cast("long")
            .alias("median_days"),
            F.percentile_approx("cycle_days", 0.95, 100000)
            .cast("long")
            .alias("p95_days"),
            F.max("cycle_days").cast("long").alias("max_days"),
        )
        .orderBy("priority")
    )


@register(
    "trimmed_mean_report",
    # 5%-trimmed mean per type: exact integer rank gates from one
    # window pass, exact cent sums inside the kept band
    """
WITH ranked AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n,
       COUNT(*) AS n_kept,
       FLOOR(CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 * 1e6 + 0.5) / 1e6
         AS trimmed_mean
FROM ranked
WHERE r > n * 5 // 100 AND r <= n - n * 5 // 100
GROUP BY event_type ORDER BY event_type
""",
)
def trimmed_mean_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean per group — the robust-statistics companion to
    anomaly_mad (MAD rejects outliers for DETECTION; trimming rejects
    them for ESTIMATION). Exact integer rank gates (r in
    (5%n, n-5%n]) from one per-type window pass, exact cent sums
    inside the kept band, one float division."""
    events = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = events.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.row_number().over(w).alias("r"),
        F.count("*").over(wc).alias("n"),
    )
    lo = F.expr("n * 5 DIV 100")
    return (
        ranked.filter((F.col("r") > lo) & (F.col("r") <= F.col("n") - lo))
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.count("*").alias("n_kept"),
            (
                F.floor(
                    F.sum("cents").cast("double")
                    / F.count("*").cast("double")
                    / F.lit(100.0)
                    * 1e6
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


@register(
    "weekday_seasonality_report",
    # STL-lite: day-of-week means via n-scaled exact integers, and the
    # share of daily-count variance the weekday pattern explains —
    # exact bigint numerators, one float division
    """
WITH days AS (
  SELECT CAST(ts AS DATE) AS d, dayofweek(ts) + 1 AS dow, COUNT(*) AS x
  FROM events GROUP BY 1, 2
), tot AS (SELECT COUNT(*) AS nd, CAST(SUM(x) AS BIGINT) AS s FROM days),
dowm AS (
  SELECT dow, COUNT(*) AS ndw, CAST(SUM(x) AS BIGINT) AS sw FROM days GROUP BY dow
)
SELECT d2.dow,
       CAST(d2.ndw AS BIGINT) AS n_days,
       FLOOR(CAST(d2.sw AS DOUBLE) / CAST(d2.ndw AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_events,
       FLOOR((CAST(d2.sw AS DOUBLE) / CAST(d2.ndw AS DOUBLE)
              - CAST(t.s AS DOUBLE) / CAST(t.nd AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS seasonal_component
FROM dowm d2 CROSS JOIN tot t
ORDER BY d2.dow
""",
)
def weekday_seasonality_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality decomposition (STL-lite): per day-of-week
    mean daily volume and its deviation from the overall daily mean —
    the seasonal component acf_daily diagnoses and forecast_backtest
    exploits, made explicit. Day-census relations bound everything;
    the means are single float divisions of exact integer sums."""
    events = load_events(spark, sf_dir)
    days = events.groupBy(
        F.to_date("ts").alias("d"), F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").alias("x"))
    tot = days.agg(F.count("*").alias("nd"), F.sum("x").alias("s"))
    dowm = days.groupBy("dow").agg(
        F.count("*").alias("ndw"), F.sum("x").alias("sw")
    )
    mean_w = F.col("sw").cast("double") / F.col("ndw").cast("double")
    mean_all = F.col("s").cast("double") / F.col("nd").cast("double")
    q = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return (
        dowm.join(F.broadcast(tot))
        .select(
            "dow",
            F.col("ndw").alias("n_days"),
            q(mean_w).alias("mean_events"),
            q(mean_w - mean_all).alias("seasonal_component"),
        )
        .orderBy("dow")
    )


@register(
    "abandoned_carts",
    # FORWARD CEP negation: clicks with no purchase in the next 24h —
    # next-purchase via running MIN over the mirrored frame, ties and
    # same-instant purchases credited (purchase sorts before the click
    # at equal t via is_click ASC in the forward frame)
    """
WITH u AS (
  SELECT user_id AS uid, ts, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t,
         1 AS is_click, event_id AS click_id, CAST(NULL AS BIGINT) AS pt
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, CAST(FLOOR(EPOCH(ts)) AS BIGINT),
         0, CAST(NULL AS BIGINT), CAST(FLOOR(EPOCH(ts)) AS BIGINT)
  FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT uid, t, is_click, click_id,
         MIN(pt) OVER (PARTITION BY uid ORDER BY t, is_click
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_pt
  FROM u
)
SELECT strftime(CAST(to_timestamp(t) AS DATE), '%Y-%m-%d') AS day,
       COUNT(*) AS n_clicks,
       COUNT(CASE WHEN next_pt IS NULL OR next_pt - t > 86400 THEN 1 END) AS n_abandoned,
       COUNT(CASE WHEN next_pt IS NOT NULL AND next_pt - t <= 86400 THEN 1 END) AS n_converted
FROM m WHERE is_click = 1
GROUP BY 1 ORDER BY 1
""",
)
def abandoned_carts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abandoned-cart detection — the FORWARD CEP negation (clicks
    with no purchase in the following 24h; funnel_negative is the
    backward mirror): next-purchase time rides a running MIN over the
    mirrored window frame on the same one-shuffle union, so no
    per-click probe join exists. Same-instant purchases count as
    conversions (purchase sorts before the click at equal t)."""
    events = load_events(spark, sf_dir)
    t = F.unix_timestamp("ts")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("uid"), t.alias("t"),
        F.lit(1).alias("is_click"), F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("pt"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid"), t.alias("t"),
        F.lit(0).alias("is_click"), F.lit(None).cast("long").alias("click_id"),
        t.alias("pt"),
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "is_click")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    m = clicks.unionByName(purchases).select(
        "t", "is_click", F.min("pt").over(w).alias("next_pt")
    )
    abandoned = F.col("next_pt").isNull() | (F.col("next_pt") - F.col("t") > 86400)
    return (
        m.filter(F.col("is_click") == 1)
        .groupBy(
            F.date_format(F.to_date(F.timestamp_seconds("t")), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .agg(
            F.count("*").alias("n_clicks"),
            F.count(F.when(abandoned, 1)).alias("n_abandoned"),
            F.count(F.when(~abandoned, 1)).alias("n_converted"),
        )
        .orderBy("day")
    )


@register(
    "diversity_index_report",
    # vocabulary diversity per source: Simpson's index from EXACT
    # integer pair counts (sum n_i(n_i-1) over N(N-1)) + Shannon
    # entropy with per-term quantized contributions exact-summed
    """
WITH toks AS (
  SELECT source, t.term
  FROM documents,
       LATERAL UNNEST(string_split(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' ')) AS t(term)
  WHERE t.term <> ''
), tc AS (
  SELECT source, term, COUNT(*) AS c FROM toks GROUP BY source, term
), st AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_terms,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS pair_mass
  FROM tc GROUP BY source
), sh AS (
  SELECT tc.source,
         CAST(SUM(CAST(FLOOR(-(CAST(c AS DOUBLE) / CAST(st.n AS DOUBLE))
                 * LN(CAST(c AS DOUBLE) / CAST(st.n AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sh_u
  FROM tc JOIN st USING (source)
  GROUP BY tc.source
)
SELECT st.source, st.n AS n_tokens, CAST(st.n_terms AS BIGINT) AS n_terms,
       FLOOR(CAST(st.pair_mass AS DOUBLE) / CAST(st.n * (st.n - 1) AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS simpson,
       sh.sh_u / 1e9 AS shannon_nats
FROM st JOIN sh USING (source)
ORDER BY st.source
""",
)
def diversity_index_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary diversity per source — Simpson's concentration index
    (the probability two random tokens coincide: EXACT integer pair
    mass over N(N-1)) and Shannon entropy (per-term contributions
    quantized at 1e-9 then exact-summed) — ecology's diversity metrics
    applied to corpus health: template-heavy sources score
    concentrated, organic ones diverse. Censuses are
    vocabulary-bounded."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), "[^a-z0-9 ]", "")
    toks = docs.select(
        "source", F.explode(F.split(normalized, " ")).alias("term")
    ).filter(F.col("term") != "")
    tc = toks.groupBy("source", "term").agg(F.count("*").alias("c"))
    st = tc.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("n_terms"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("pair_mass"),
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    sh = (
        tc.join(st.select("source", "n"), "source")
        .select(
            "source",
            F.floor(-p * F.log(p) * 1e9 + F.lit(0.5)).cast("long").alias("u"),
        )
        .groupBy("source")
        .agg(F.sum("u").alias("sh_u"))
    )
    return (
        st.join(sh, "source")
        .select(
            "source",
            F.col("n").alias("n_tokens"),
            F.col("n_terms").cast("long").alias("n_terms"),
            (
                F.floor(
                    F.col("pair_mass").cast("double")
                    / (F.col("n") * (F.col("n") - 1)).cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("simpson"),
            (F.col("sh_u") / F.lit(1e9)).alias("shannon_nats"),
        )
        .orderBy("source")
    )


@register(
    "price_elasticity_report",
    # per-brand OLS of quantity against unit price (cents): exact
    # integer moments combined in HUGEINT/DECIMAL(38,0), one float
    # division — the trend_lines kernel pointed at econometrics
    """
WITH base AS (
  SELECT p.p_brand AS brand,
         CAST(FLOOR(l.l_extendedprice / l.l_quantity * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(l.l_quantity AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), m AS (
  SELECT brand, COUNT(*) AS n, SUM(price_c) AS sx, SUM(qty) AS sy,
         SUM(price_c * price_c) AS sxx, SUM(price_c * qty) AS sxy
  FROM base GROUP BY brand
)
SELECT brand, CAST(n AS BIGINT) AS n,
       FLOOR(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
             * 1e9 + 0.5) / 1e9 AS qty_per_cent
FROM m ORDER BY brand
""",
)
def price_elasticity_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-vs-unit-price slope per brand (the demand-curve
    first look): the trend_lines one-pass exact-moment kernel pointed
    at econometrics — unit price quantized to exact cents, all five
    moments in one partial-agg pass, DECIMAL(38,0) combination, one
    float division at 1e-9 precision."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    base = lineitem.join(
        F.broadcast(part), lineitem.l_partkey == part.p_partkey
    ).select(
        F.col("p_brand").alias("brand"),
        F.floor(
            F.col("l_extendedprice") / F.col("l_quantity") * 100 + F.lit(0.5)
        )
        .cast("long")
        .alias("price_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    m = base.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum("price_c").alias("sx"),
        F.sum("qty").alias("sy"),
        F.sum(F.col("price_c") * F.col("price_c")).alias("sxx"),
        F.sum(F.col("price_c") * F.col("qty")).alias("sxy"),
    )
    dec = "decimal(38,0)"
    num = F.col("n").cast(dec) * F.col("sxy").cast(dec) - F.col("sx").cast(
        dec
    ) * F.col("sy").cast(dec)
    den = F.col("n").cast(dec) * F.col("sxx").cast(dec) - F.col("sx").cast(
        dec
    ) * F.col("sx").cast(dec)
    return m.select(
        "brand",
        "n",
        (
            F.floor(num.cast("double") / den.cast("double") * 1e9 + F.lit(0.5))
            / F.lit(1e9)
        ).alias("qty_per_cent"),
    ).orderBy("brand")


@register(
    "text_readability",
    # Flesch-style readability from codegen counts: words, sentences
    # (periods + 1), syllable proxy (vowel groups) — the fixed float
    # formula quantized half-up; output gated 1-in-29
    """
WITH f AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS words,
         CAST(length(text) - length(replace(text, '.', '')) + 1 AS BIGINT) AS sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syllables
  FROM documents
)
SELECT doc_id, words, sentences, syllables,
       FLOOR((206.835
              - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
              - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)))
             * 1e4 + 0.5) / 1e4 AS flesch
FROM f WHERE doc_id % 29 = 0
ORDER BY doc_id
""",
)
def text_readability_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring: words, sentences (period count +
    1) and a vowel-group syllable proxy, all codegen counts, folded
    through the classic formula in one fixed float sequence — the
    readability gate some curation pipelines run next to
    text_quality's ratio features. Map-only; zero shuffle before the
    sample gate."""
    docs = load_table(spark, sf_dir, "documents")
    from .operators.text import tokens

    words = F.size(tokens(F.col("text"))).cast("long")
    sentences = (
        F.length("text") - F.length(F.expr("replace(text, '.', '')")) + 1
    ).cast("long")
    syllables = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    ).cast("long")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("words").cast("double") / F.col("sentences").cast("double"))
        - F.lit(84.6) * (F.col("syllables").cast("double") / F.col("words").cast("double"))
    )
    return (
        docs.select(
            "doc_id",
            words.alias("words"),
            sentences.alias("sentences"),
            syllables.alias("syllables"),
        )
        .filter(F.col("doc_id") % 29 == 0)
        .select(
            "doc_id",
            "words",
            "sentences",
            "syllables",
            (F.floor(flesch * 1e4 + F.lit(0.5)) / F.lit(1e4)).alias("flesch"),
        )
        .orderBy("doc_id")
    )


@register(
    "degree_distribution_report",
    # degree census + log-log OLS slope (the power-law exponent
    # estimate): quantized logs as exact micro-integers, the
    # trend_lines moment combination — the graph family's descriptive
    # statistics
    """
WITH edges AS (
  SELECT DISTINCT user_id AS src, event_id % 500 AS dst FROM events
), deg AS (
  SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src
), hist AS (
  SELECT d, COUNT(*) AS cnt FROM deg GROUP BY d
), logs AS (
  SELECT d, cnt,
         CAST(FLOOR(LN(CAST(d AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lx,
         CAST(FLOOR(LN(CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS ly
  FROM hist WHERE d >= 1
), m AS (
  SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
         SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy
  FROM logs
)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT CAST(SUM(cnt * d) AS BIGINT) FROM hist) AS n_edges,
       (SELECT COUNT(*) FROM hist) AS n_distinct_degrees,
       (SELECT MAX(d) FROM hist) AS max_degree,
       FLOOR(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS loglog_slope
FROM m
""",
)
def degree_distribution_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution characterization of the interaction graph:
    the degree census plus a log-log OLS slope — the power-law
    exponent read-off that tells you whether the graph is scale-free
    (and therefore whether skew salting and degree-ordered wedge caps
    are load-bearing; graph_triangles assumes exactly this). Logs are
    quantized to exact micro-integers so the moment algebra and
    slope are engine-stable; census shuffles bound by the degree
    domain."""
    events = load_events(spark, sf_dir)
    edges = (
        events.select(
            F.col("user_id").alias("src"), (F.col("event_id") % 500).alias("dst")
        )
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    hist = deg.groupBy("d").agg(F.count("*").alias("cnt"))
    logs = hist.select(
        "d",
        "cnt",
        F.floor(F.log(F.col("d").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("lx"),
        F.floor(F.log(F.col("cnt").cast("double")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("ly"),
    )
    m = logs.agg(
        F.count("*").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    dec = "decimal(38,0)"
    num = F.col("n").cast(dec) * F.col("sxy").cast(dec) - F.col("sx").cast(
        dec
    ) * F.col("sy").cast(dec)
    den = F.col("n").cast(dec) * F.col("sxx").cast(dec) - F.col("sx").cast(
        dec
    ) * F.col("sx").cast(dec)
    stats = deg.agg(F.count("*").alias("n_nodes")).join(
        hist.agg(
            F.sum(F.col("cnt") * F.col("d")).alias("n_edges"),
            F.count("*").alias("n_distinct_degrees"),
            F.max("d").alias("max_degree"),
        )
    )
    return (
        m.join(F.broadcast(stats))
        .select(
            "n_nodes",
            F.col("n_edges").cast("long").alias("n_edges"),
            "n_distinct_degrees",
            "max_degree",
            (
                F.floor(num.cast("double") / den.cast("double") * 1e6 + F.lit(0.5))
                / F.lit(1e6)
            ).alias("loglog_slope"),
        )
    )


@register(
    "rolling_median",
    # 7-day rolling median of daily counts per type: the frame's
    # values collect into a (<=7)-element array and the discrete lower
    # median is one sort+index — exact integers, no approx sketch
    """
WITH days AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS x
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, d, x,
         list(x) OVER (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS frame
  FROM days
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day, CAST(x AS BIGINT) AS x,
       CAST(list_sort(frame)[(len(frame) + 1) // 2] AS BIGINT) AS rolling_median,
       CAST(len(frame) AS BIGINT) AS frame_n
FROM r ORDER BY event_type, day
""",
)
def rolling_median_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day median of daily volume per type — the ROBUST
    rolling statistic (rolling means chase spikes; operations
    dashboards want the median). No median window function exists in
    either engine, so the frame materializes as a bounded (<=7)
    array and the discrete lower median is a codegen sort+index —
    exact integers, and the pattern generalizes to any small-frame
    order statistic. Day-census-bounded everything."""
    events = load_events(spark, sf_dir)
    days = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("x"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, 0)
    )
    r = days.withColumn("frame", F.collect_list("x").over(w))
    med = F.element_at(
        F.array_sort("frame"), ((F.size("frame") + 1) / 2).cast("int")
    )
    return r.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("x").cast("long").alias("x"),
        med.cast("long").alias("rolling_median"),
        F.size("frame").cast("long").alias("frame_n"),
    ).orderBy("event_type", "day")


@register(
    "cohort_conversion_report",
    # conversion (ever makes a high-value purchase) by signup-week
    # cohort — the retention matrix's outcome-rate sibling
    """
WITH d0 AS (SELECT CAST(MIN(ts) AS DATE) AS d0 FROM events),
firsts AS (
  SELECT user_id,
         MIN(datediff('day', d0.d0, CAST(ts AS DATE)) // 7) AS cohort_week,
         MAX(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS converted
  FROM events, d0 GROUP BY user_id
)
SELECT cohort_week, COUNT(*) AS n_users,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       FLOOR(CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS conversion_rate
FROM firsts GROUP BY cohort_week ORDER BY cohort_week
""",
)
def cohort_conversion_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion by acquisition cohort: did users who arrived in week
    N ever convert (the ab_test_report metric) — cohort_retention says
    who COMES BACK, this says who PAYS, the second axis every growth
    team reads. One per-user aggregate carrying both the first-seen
    week MIN and the conversion MAX; cohort-bounded census."""
    events = load_events(spark, sf_dir)
    d0 = events.agg(F.to_date(F.min("ts")).alias("d0"))
    firsts = (
        events.join(F.broadcast(d0))
        .groupBy("user_id")
        .agg(
            F.min(
                F.expr("datediff(to_date(ts), d0) DIV 7")
            ).alias("cohort_week"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("converted"),
        )
    )
    return (
        firsts.groupBy("cohort_week")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
            (
                F.floor(
                    F.sum("converted").cast("double")
                    / F.count("*").cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("conversion_rate"),
        )
        .orderBy("cohort_week")
    )


@register(
    "partition_gini_report",
    # Gini coefficient of per-key row counts — skew as ONE number,
    # exact integer numerator over sorted sizes
    """
WITH sizes AS (
  SELECT user_id % 32 AS pkey, COUNT(*) AS sz FROM events GROUP BY 1
), ranked AS (
  SELECT sz, ROW_NUMBER() OVER (ORDER BY sz, pkey) AS i, COUNT(*) OVER () AS n,
         SUM(sz) OVER () AS total
  FROM sizes
)
SELECT CAST(MAX(n) AS BIGINT) AS n_partitions,
       CAST(MAX(total) AS BIGINT) AS n_rows,
       CAST(MIN(sz) AS BIGINT) AS min_rows,
       CAST(MAX(sz) AS BIGINT) AS max_rows,
       FLOOR(CAST(SUM((2 * i - n - 1) * sz) AS DOUBLE)
             / CAST(MAX(n) * MAX(total) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS gini
FROM ranked
""",
)
def partition_gini_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-balance Gini: per-shuffle-key row counts summarized
    as the Gini coefficient (0 = perfectly balanced, ->1 = one key
    holds everything) — skew_profile lists heavy hitters, this is the
    single number an autoscaler or alert thresholds on. Exact integer
    numerator over the (tiny) sorted size relation."""
    events = load_events(spark, sf_dir)
    sizes = events.groupBy((F.col("user_id") % 32).alias("pkey")).agg(
        F.count("*").alias("sz")
    )
    w = Window.orderBy("sz", "pkey")
    wall = Window.partitionBy()
    ranked = sizes.select(
        "sz",
        F.row_number().over(w).alias("i"),
        F.count("*").over(wall).alias("n"),
        F.sum("sz").over(wall).alias("total"),
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_partitions"),
        F.max("total").cast("long").alias("n_rows"),
        F.min("sz").cast("long").alias("min_rows"),
        F.max("sz").cast("long").alias("max_rows"),
        (
            F.floor(
                F.sum(
                    (2 * F.col("i") - F.col("n") - 1) * F.col("sz")
                ).cast("double")
                / (F.max("n") * F.max("total")).cast("double")
                * 1e6
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# ext (round 3): published rule-filter gates + curriculum ordering — the
# named heuristic stages (Gopher repetition rules, C4 quality rules) and
# the difficulty-banded shard layout a trainer consumes. Reference has no
# text surface; extension mandated by the north star.
# ---------------------------------------------------------------------------


@register(
    "gopher_repetition_rules",
    # mirror of text.gopher_repetition_rules: same n-gram construction
    # (1-based list indexing in DuckDB), same dup-mass/top-share ratios,
    # same published thresholds on the ROUNDED values
    """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), g2 AS (
  SELECT doc_id, g.g FROM t, LATERAL UNNEST(
    CASE WHEN len(toks) >= 2
         THEN list_transform(generate_series(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i + 1])
         ELSE []::VARCHAR[] END) AS g(g)
), g3 AS (
  SELECT doc_id, g.g FROM t, LATERAL UNNEST(
    CASE WHEN len(toks) >= 3
         THEN list_transform(generate_series(1, len(toks) - 2),
                             i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
         ELSE []::VARCHAR[] END) AS g(g)
), s2 AS (
  SELECT doc_id, SUM(cnt) AS total,
         SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup, MAX(cnt) AS top
  FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM g2 GROUP BY doc_id, g)
  GROUP BY doc_id
), s3 AS (
  SELECT doc_id, SUM(cnt) AS total,
         SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup
  FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM g3 GROUP BY doc_id, g)
  GROUP BY doc_id
), m AS (
  SELECT s2.doc_id,
         ROUND(s2.dup / s2.total, 4) AS dup_2gram_mass,
         ROUND(COALESCE(s3.dup / s3.total, 0), 4) AS dup_3gram_mass,
         ROUND(s2.top / s2.total, 4) AS top_2gram_share
  FROM s2 LEFT JOIN s3 USING (doc_id)
)
SELECT doc_id, dup_2gram_mass, dup_3gram_mass, top_2gram_share,
       (dup_2gram_mass > 0.2 OR dup_3gram_mass > 0.18
        OR top_2gram_share > 0.2) AS fails_repetition
FROM m ORDER BY doc_id
""",
)
def gopher_repetition_rules_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.gopher_repetition_rules(load_table(spark, sf_dir, "documents"))


@register(
    "c4_quality_filters",
    # mirror of text.c4_quality_filters: boolean gates computed on the
    # UNROUNDED mean word length in both engines
    """
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), m AS (
  SELECT doc_id, toks, text,
         len(toks)::BIGINT AS n_words,
         length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE / len(toks)
           AS mwl
  FROM t
)
SELECT doc_id, n_words,
       ROUND(mwl, 4) AS mean_word_len,
       (n_words >= 50 AND n_words <= 10000) AS ok_word_count,
       (mwl >= 3.0 AND mwl <= 10.0) AS ok_mean_word_len,
       NOT contains(text, '{') AS ok_no_brace,
       (len(list_filter(toks, x -> lower(x) IN ('javascript', 'lorem'))) = 0)
         AS ok_no_blocklist,
       ((n_words >= 50 AND n_words <= 10000)
        AND (mwl >= 3.0 AND mwl <= 10.0)
        AND NOT contains(text, '{')
        AND len(list_filter(toks, x -> lower(x) IN ('javascript', 'lorem'))) = 0)
         AS keep
FROM m ORDER BY doc_id
""",
)
def c4_quality_filters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.c4_quality_filters(load_table(spark, sf_dir, "documents"))


@register(
    "curriculum_shards",
    # same quality-model CTE as model_eval_auc, then the value-census
    # decile construction (prefix-sum over distinct quantized logits)
    # and the md5-keyed within-shard shuffle — every window mirrored
    f"""
WITH f AS (
  SELECT doc_id,
         len({_TOKS})::DOUBLE AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         len(list_filter({_TOKS}, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
           AS n_stop,
         (length(text) - length(replace(text, '.', '')))::DOUBLE AS n_dots
  FROM documents
), wts AS (
  SELECT i.i AS i,
         2 * (CAST(concat('0x', substr(md5('qw:' || i.i), 1, 15)) AS UBIGINT)
              / 1152921504606846976.0) - 1 AS w
  FROM (SELECT UNNEST(range(5)) AS i) i
), z AS (
  SELECT f.doc_id,
         FLOOR((
           (SELECT w FROM wts WHERE i = 0) * (n_tokens / 100.0)
           + (SELECT w FROM wts WHERE i = 1) * (n_stop / (n_tokens + 1.0))
           + (SELECT w FROM wts WHERE i = 2) * (n_chars / (n_tokens + 1.0))
           + (SELECT w FROM wts WHERE i = 3) * (n_dots / (n_chars + 1.0))
           + (SELECT w FROM wts WHERE i = 4)) * 1e4 + 0.5)::BIGINT AS lv
  FROM f
), census AS (
  SELECT lv, COUNT(*) AS c FROM z GROUP BY lv
), ranked AS (
  SELECT lv,
         COALESCE(SUM(c) OVER (ORDER BY lv
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS first_rank,
         SUM(c) OVER () AS total
  FROM census
), edges AS (
  SELECT lv,
         (9 - LEAST(9, FLOOR(first_rank * 10 / CAST(total AS DOUBLE))))::INT
           AS shard
  FROM ranked
), ws AS (
  SELECT z.doc_id, e.shard FROM z JOIN edges e USING (lv)
)
SELECT doc_id, shard,
       (ROW_NUMBER() OVER (PARTITION BY shard
          ORDER BY md5('curriculum:' || doc_id), doc_id) - 1) AS position,
       COUNT(*) OVER (PARTITION BY shard) AS n_in_shard
FROM ws ORDER BY shard, position
""",
)
def curriculum_shards_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.curriculum_shards(load_table(spark, sf_dir, "documents"))


@register(
    "ccnet_perplexity_buckets",
    # bigram_logprob's LM CTEs (per-lang), then the per-lang tercile
    # census: prefix-sum over distinct rounded scores, head = highest
    # avg logprob (lowest perplexity)
    """
WITH toks AS (
  SELECT doc_id, lang, pos, tok FROM (
    SELECT doc_id, lang,
           generate_subscripts(t, 1) AS pos, unnest(t) AS tok
    FROM (SELECT doc_id, lang,
                 string_split_regex(lower(trim(text)), '\\s+') AS t
          FROM documents)
  ) WHERE tok <> ''
),
bigrams AS (
  SELECT doc_id, lang, tok, nxt FROM (
    SELECT doc_id, lang, tok,
           LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM toks
  ) WHERE nxt IS NOT NULL
),
pc AS (SELECT tok, nxt, COUNT(*) AS c2 FROM bigrams GROUP BY tok, nxt),
hc AS (SELECT tok, COUNT(*) AS c1 FROM bigrams GROUP BY tok),
scored AS (
  SELECT b.doc_id, b.lang, ROUND(AVG(LN(pc.c2 / hc.c1)), 6) AS score
  FROM bigrams b JOIN pc ON b.tok = pc.tok AND b.nxt = pc.nxt
  JOIN hc ON b.tok = hc.tok
  GROUP BY b.doc_id, b.lang
),
census AS (SELECT lang, score, COUNT(*) AS c FROM scored GROUP BY lang, score),
edges AS (
  SELECT lang, score,
         COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY score DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS first_rank,
         SUM(c) OVER (PARTITION BY lang) AS total
  FROM census
),
bk AS (
  SELECT lang, score,
         (['head', 'middle', 'tail'])[
           LEAST(2, FLOOR(first_rank * 3 / CAST(total AS DOUBLE)))::INT + 1
         ] AS bucket
  FROM edges
)
SELECT s.doc_id, s.lang, s.score, bk.bucket
FROM scored s JOIN bk USING (lang, score) ORDER BY s.doc_id
""",
)
def ccnet_perplexity_buckets_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.ccnet_perplexity_buckets(load_table(spark, sf_dir, "documents"))


@register(
    "ann_ivfpq",
    # composition of the ann_ivf probe CTEs and the ann_pq ADC CTEs,
    # candidates restricted to the probed inverted lists
    """
WITH e AS (SELECT vec_id, label AS list_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
cent AS (
  SELECT list_id, array_agg(m ORDER BY i) AS c FROM (
    SELECT list_id, i, AVG(v[i]) AS m
    FROM e, generate_series(1, 64) AS t(i)
    GROUP BY list_id, i
  ) GROUP BY list_id
),
probe AS (
  SELECT list_id FROM cent, q
  ORDER BY list_cosine_similarity(c, qv) DESC, list_id LIMIT 2
),
cand AS (SELECT vec_id FROM e JOIN probe USING (list_id)),
parts AS (
  SELECT vec_id, s.s AS sub_id, v[s.s * 16 + 1 : (s.s + 1) * 16] AS sv
  FROM e, (SELECT UNNEST(range(4)) AS s) s
), codes AS (
  SELECT sub_id AS c_sub, vec_id AS code_id, sv AS cv FROM parts WHERE vec_id < 8
), scored AS (
  SELECT p.vec_id, p.sub_id, c.code_id,
         CAST(FLOOR(list_sum(list_transform(range(1, 17),
                i -> (p.sv[i] - c.cv[i]) * (p.sv[i] - c.cv[i]))) * 1000 + 0.5)
              AS BIGINT) AS d_milli
  FROM parts p JOIN codes c ON p.sub_id = c.c_sub
), assign AS (
  SELECT vec_id, sub_id, MIN(d_milli * 8 + code_id) % 8 AS code
  FROM scored
  WHERE vec_id IN (SELECT vec_id FROM cand)
  GROUP BY vec_id, sub_id
), lut AS (
  SELECT s.sub_id, s.code_id, s.d_milli AS q_milli
  FROM scored s WHERE s.vec_id = 0
)
SELECT a.vec_id, SUM(l.q_milli) / 1000 AS adc_dist
FROM assign a JOIN lut l ON a.sub_id = l.sub_id AND a.code = l.code_id
WHERE a.vec_id <> 0
GROUP BY a.vec_id
ORDER BY adc_dist, a.vec_id LIMIT 10
""",
)
def ann_ivfpq_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.ann_ivfpq(load_table(spark, sf_dir, "embeddings"))


@register(
    "multimodal_scene_cuts",
    # formula-derived clips again: per-byte |v_f - v_{f-1}| where
    # v_f = (doc_id*11 + f*17 + j*5) % 256 — the oracle recomputes the
    # exact SAD the decoder must produce from real frame bytes
    """
WITH dims AS (
  SELECT doc_id,
         4 + 2 * (doc_id % 3) AS w,
         4 + 2 * (doc_id % 2) AS h,
         3 + doc_id % 4 AS nf
  FROM documents
), fj AS (
  SELECT doc_id, w, h, f.f, j.j,
         (doc_id * 11 + f.f * 17 + j.j * 5) % 256 AS v,
         (doc_id * 11 + (f.f - 1) * 17 + j.j * 5) % 256 AS pv
  FROM dims
  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, nf - 1)) AS f) f
  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS j) j
)
SELECT doc_id, CAST(f AS INT) AS frame_idx,
       CAST(SUM(ABS(v - pv)) AS BIGINT) AS sad,
       SUM(ABS(v - pv)) > 32 * MAX(w) * MAX(h) AS is_cut
FROM fj GROUP BY doc_id, f ORDER BY doc_id, frame_idx
""",
)
def multimodal_scene_cuts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthetic_y4m_media(docs)
    return multimodal.video_scene_cuts(media).orderBy("doc_id", "frame_idx")


_FERTILITY_ORACLE = (
    """
WITH lw AS (
  SELECT lang, word, COUNT(*) AS freq FROM (
    SELECT lang,
           unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
    FROM documents
  ) WHERE word <> '' GROUP BY lang, word
),
s0 AS (
  SELECT lang || '|' || word AS w, freq,
         generate_subscripts(syms, 1) - 1 AS seq, unnest(syms) AS sym
  FROM (SELECT lang, word, freq,
               list_filter(string_split(word, ''), c -> c <> '') AS syms
        FROM lw)
),"""
    + ",".join(_bpe_round_sql(i) for i in (1, 2, 3))
    + """,
pw AS (SELECT w, freq, COUNT(*) AS n_sym FROM s3 GROUP BY w, freq)
SELECT split_part(w, '|', 1) AS lang,
       COUNT(*) AS n_distinct_words,
       CAST(SUM(freq) AS BIGINT) AS word_occurrences,
       CAST(SUM(freq * n_sym) AS BIGINT) AS token_occurrences,
       ROUND(SUM(freq * n_sym) / CAST(SUM(freq) AS DOUBLE), 4) AS fertility
FROM pw GROUP BY split_part(w, '|', 1) ORDER BY lang
"""
)


@register("tokenizer_fertility_report", _FERTILITY_ORACLE)
def tokenizer_fertility_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.tokenizer_fertility_report(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_substring_scrub",
    # the removal policy on top of dedup_substring_spans' machinery:
    # rank each duplicated gram's occurrences by (doc_id, pos), keep
    # rank 1, merge later ranks into cut intervals, rebuild the token
    # stream outside the cuts and fingerprint it
    """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tl FROM documents
), posts AS (
  SELECT doc_id, i.i AS s, i.i + 8 AS e,
         array_to_string(tl[i.i + 1 : i.i + 8], ' ') AS gram
  FROM toks, LATERAL (SELECT UNNEST(range(greatest(len(tl) - 7, 0))) AS i) i
), occ AS (
  SELECT doc_id, s, e,
         COUNT(*) OVER (PARTITION BY gram) AS n_occ,
         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, s) AS rk
  FROM posts
), intervals AS (
  SELECT doc_id, s, e FROM occ WHERE n_occ >= 2 AND rk >= 2
), marked AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM intervals
), islands AS (
  SELECT doc_id, s, e,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s) AS island
  FROM marked
), mg AS (
  SELECT doc_id, island, MIN(s) AS s, MAX(e) AS e
  FROM islands GROUP BY doc_id, island
), pos AS (
  SELECT doc_id, i.i - 1 AS pos, tl[i.i] AS tok
  FROM toks, LATERAL (SELECT UNNEST(range(1, len(tl) + 1)) AS i) i
), kept AS (
  SELECT p.doc_id, p.pos, p.tok FROM pos p
  WHERE NOT EXISTS (SELECT 1 FROM mg m
                    WHERE m.doc_id = p.doc_id
                      AND p.pos >= m.s AND p.pos < m.e)
), rebuilt AS (
  SELECT doc_id, COUNT(*) AS kept_tokens,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_md5
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, len(t.tl)::BIGINT AS n_tokens,
       COALESCE(r.kept_tokens, 0)::BIGINT AS kept_tokens,
       (len(t.tl) - COALESCE(r.kept_tokens, 0))::BIGINT AS removed_tokens,
       COALESCE(r.clean_md5, md5('')) AS clean_md5
FROM toks t LEFT JOIN rebuilt r USING (doc_id)
ORDER BY t.doc_id
""",
)
def dedup_substring_scrub_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.substring_scrub(load_table(spark, sf_dir, "documents"))


_NEAR_DEDUP_STREAM_ORACLE = """
WITH t AS (
  SELECT doc_id, trim(text) AS tx,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(1, len(toks) - 2),
                                  i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
              ELSE [tx] END AS grams
  FROM t
), gh AS (
  SELECT doc_id,
         list_transform(grams,
           s -> CAST(CAST(concat('0x', substr(md5(s), 1, 15)) AS UBIGINT) AS BIGINT)) AS gh
  FROM g
), sig AS (
  SELECT doc_id,
         list_min(list_transform(gh, x -> (1447053421 * (x >> 30) + 2018637147 * (x % 1073741824) + 821879811) % 2305843009213693951)) AS h0,
         list_min(list_transform(gh, x -> (176928717 * (x >> 30) + 1840952405 * (x % 1073741824) + 704113017) % 2305843009213693951)) AS h1,
         list_min(list_transform(gh, x -> (1765449693 * (x >> 30) + 2080088805 * (x % 1073741824) + 448146271) % 2305843009213693951)) AS h2,
         list_min(list_transform(gh, x -> (492862055 * (x >> 30) + 2054100235 * (x % 1073741824) + 171799059) % 2305843009213693951)) AS h3,
         list_min(list_transform(gh, x -> (156203051 * (x >> 30) + 1040078385 * (x % 1073741824) + 1265968343) % 2305843009213693951)) AS h4,
         list_min(list_transform(gh, x -> (852485825 * (x >> 30) + 579023709 * (x % 1073741824) + 636098179) % 2305843009213693951)) AS h5,
         list_min(list_transform(gh, x -> (2001589517 * (x >> 30) + 1384731507 * (x % 1073741824) + 1513411053) % 2305843009213693951)) AS h6,
         list_min(list_transform(gh, x -> (1183995427 * (x >> 30) + 1483771595 * (x % 1073741824) + 1295655385) % 2305843009213693951)) AS h7,
         list_min(list_transform(gh, x -> (1757684611 * (x >> 30) + 1977193477 * (x % 1073741824) + 2094125749) % 2305843009213693951)) AS h8,
         list_min(list_transform(gh, x -> (1025415121 * (x >> 30) + 936150355 * (x % 1073741824) + 587825955) % 2305843009213693951)) AS h9,
         list_min(list_transform(gh, x -> (1216879987 * (x >> 30) + 1663348111 * (x % 1073741824) + 1204798077) % 2305843009213693951)) AS h10,
         list_min(list_transform(gh, x -> (288620849 * (x >> 30) + 340073899 * (x % 1073741824) + 432610199) % 2305843009213693951)) AS h11,
         list_min(list_transform(gh, x -> (1830857049 * (x >> 30) + 721240335 * (x % 1073741824) + 1547197805) % 2305843009213693951)) AS h12,
         list_min(list_transform(gh, x -> (1365328469 * (x >> 30) + 411226205 * (x % 1073741824) + 1352987033) % 2305843009213693951)) AS h13,
         list_min(list_transform(gh, x -> (560535623 * (x >> 30) + 855913339 * (x % 1073741824) + 182950487) % 2305843009213693951)) AS h14,
         list_min(list_transform(gh, x -> (478807603 * (x >> 30) + 1098033359 * (x % 1073741824) + 1424595627) % 2305843009213693951)) AS h15
  FROM gh
), buckets AS (
  SELECT doc_id, 0 AS band, CAST(CAST(concat('0x', substr(md5(h0 || ':' || h1), 1, 15)) AS UBIGINT) AS BIGINT) AS bucket FROM sig
  UNION ALL SELECT doc_id, 1 AS band, CAST(CAST(concat('0x', substr(md5(h2 || ':' || h3), 1, 15)) AS UBIGINT) AS BIGINT) AS bucket FROM sig
  UNION ALL SELECT doc_id, 2 AS band, CAST(CAST(concat('0x', substr(md5(h4 || ':' || h5), 1, 15)) AS UBIGINT) AS BIGINT) AS bucket FROM sig
  UNION ALL SELECT doc_id, 3 AS band, CAST(CAST(concat('0x', substr(md5(h6 || ':' || h7), 1, 15)) AS UBIGINT) AS BIGINT) AS bucket FROM sig
  UNION ALL SELECT doc_id, 4 AS band, CAST(CAST(concat('0x', substr(md5(h8 || ':' || h9), 1, 15)) AS UBIGINT) AS BIGINT) AS bucket FROM sig
  UNION ALL SELECT doc_id, 5 AS band, CAST(CAST(concat('0x', substr(md5(h10 || ':' || h11), 1, 15)) AS UBIGINT) AS BIGINT) AS bucket FROM sig
  UNION ALL SELECT doc_id, 6 AS band, CAST(CAST(concat('0x', substr(md5(h12 || ':' || h13), 1, 15)) AS UBIGINT) AS BIGINT) AS bucket FROM sig
  UNION ALL SELECT doc_id, 7 AS band, CAST(CAST(concat('0x', substr(md5(h14 || ':' || h15), 1, 15)) AS UBIGINT) AS BIGINT) AS bucket FROM sig
), winners AS (
  SELECT band, bucket, MIN(doc_id) AS first_doc FROM buckets GROUP BY band, bucket
), firsts AS (
  SELECT first_doc AS doc_id, COUNT(*) AS n_bands_first
  FROM winners GROUP BY first_doc
)
SELECT t.doc_id, COALESCE(f.n_bands_first, 0)::BIGINT AS n_bands_first,
       COALESCE(f.n_bands_first, 0) > 0 AS is_novel
FROM t LEFT JOIN firsts f USING (doc_id)
ORDER BY t.doc_id
"""


@register("streaming_near_dedup", _NEAR_DEDUP_STREAM_ORACLE)
def streaming_near_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup NOVELTY detection on the corpus STREAM: per-row md5
    MinHash band keys (md5_minhash_bands — no aggregation needed, so
    the signature computes inside the streaming plan), then ONE
    stateful aggregate MIN(doc_id) per (band, bucket) whose state is
    bounded by the DISTINCT BAND BUCKETS, not the stream length — the
    incremental form of LSH dedup a crawl-ingest pipeline runs. A
    document is novel iff it is the first arrival in at least one of
    its buckets (shares every bucket with earlier docs = near-dup
    candidate); MIN makes the winner arrival-order-independent, so
    the drained complete-mode table equals the batch build exactly."""
    from .operators.dedup import minhash_band_keys
    from .streaming import jobs

    stream = jobs.stream_documents(spark, sf_dir)
    banded = minhash_band_keys(stream)
    winners = banded.groupBy("band", "bucket").agg(
        F.min("doc_id").alias("first_doc")
    )
    res = jobs.run_available_now(winners, "streaming_near_dedup")
    firsts = res.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("n_bands_first")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(firsts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bands_first"), F.lit(0)).alias("n_bands_first"),
            (F.coalesce(F.col("n_bands_first"), F.lit(0)) > 0).alias("is_novel"),
        )
        .orderBy("doc_id")
    )


@register(
    "doremi_reweight_step",
    # quality-model CTE -> quantized logit -> per-source exact integer
    # sums -> linearized multiplicative update in integer micro-units
    f"""
WITH f AS (
  SELECT doc_id, source,
         len({_TOKS})::DOUBLE AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         len(list_filter({_TOKS}, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
           AS n_stop,
         (length(text) - length(replace(text, '.', '')))::DOUBLE AS n_dots
  FROM documents
), wts AS (
  SELECT i.i AS i,
         2 * (CAST(concat('0x', substr(md5('qw:' || i.i), 1, 15)) AS UBIGINT)
              / 1152921504606846976.0) - 1 AS w
  FROM (SELECT UNNEST(range(5)) AS i) i
), z AS (
  SELECT f.doc_id, f.source,
         FLOOR((
           (SELECT w FROM wts WHERE i = 0) * (n_tokens / 100.0)
           + (SELECT w FROM wts WHERE i = 1) * (n_stop / (n_tokens + 1.0))
           + (SELECT w FROM wts WHERE i = 2) * (n_chars / (n_tokens + 1.0))
           + (SELECT w FROM wts WHERE i = 3) * (n_dots / (n_chars + 1.0))
           + (SELECT w FROM wts WHERE i = 4)) * 1e4 + 0.5)::BIGINT AS lv
  FROM f
), per_source AS (
  SELECT source, COUNT(*) AS n_docs, SUM(lv) AS lv_sum FROM z GROUP BY source
), m AS (
  SELECT source, n_docs,
         lv_sum / n_docs / 1e4 AS mean_i,
         SUM(lv_sum) OVER () / CAST(SUM(n_docs) OVER () AS DOUBLE) / 1e4
           AS mean_all
  FROM per_source
), fx AS (
  SELECT source, n_docs, mean_i,
         FLOOR((mean_i - mean_all) * 1e6 + 0.5) / 1e6 AS excess
  FROM m
), fu AS (
  SELECT source, n_docs, mean_i, excess,
         GREATEST(1, FLOOR((1.0 + excess) * 1e6 + 0.5)::BIGINT) AS factor_u
  FROM fx
)
SELECT source, n_docs,
       ROUND(mean_i, 6) AS avg_logit,
       excess,
       ROUND(factor_u / CAST(SUM(factor_u) OVER () AS DOUBLE), 6) AS new_weight
FROM fu ORDER BY source
""",
)
def doremi_reweight_step_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.doremi_reweight_step(load_table(spark, sf_dir, "documents"))


@register(
    "matryoshka_recall",
    # two ranked top-20 lists (full dim vs first-16 prefix), overlap
    # counted per k — same cosine/rounding conventions as ann_bruteforce
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
full_s AS (
  SELECT vec_id, ROUND(list_cosine_similarity(v, qv), 3) AS cs
  FROM e, q WHERE vec_id <> 0 ORDER BY cs DESC, vec_id LIMIT 20
), full_r AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cs DESC, vec_id) AS r FROM full_s
), tr_s AS (
  SELECT vec_id, ROUND(list_cosine_similarity(v[1:16], qv[1:16]), 3) AS cs
  FROM e, q WHERE vec_id <> 0 ORDER BY cs DESC, vec_id LIMIT 20
), tr_r AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cs DESC, vec_id) AS r FROM tr_s
), ov AS (
  SELECT f.r AS fr, t.r AS tr FROM full_r f JOIN tr_r t USING (vec_id)
), ks AS (SELECT UNNEST([5, 10, 20]) AS k)
SELECT ks.k, COUNT(ov.fr)::BIGINT AS n_overlap,
       ROUND(COUNT(ov.fr) / CAST(ks.k AS DOUBLE), 4) AS recall
FROM ks LEFT JOIN ov ON ov.fr <= ks.k AND ov.tr <= ks.k
GROUP BY ks.k ORDER BY ks.k
""",
)
def matryoshka_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.matryoshka_recall_report(
        load_table(spark, sf_dir, "embeddings")
    )


# the confusion-matrix oracle nests the (already verified) lang-ID
# prediction SQL as a CTE — single source of truth for the predictor
_LANG_CONFUSION_ORACLE = (
    "WITH pred AS (" + ORACLES["text_lang_id_ngram"] + """)
SELECT lang, lang_pred, COUNT(*)::BIGINT AS n_docs,
       ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY lang) AS DOUBLE), 4)
         AS frac
FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred
"""
)


@register("lang_id_confusion", _LANG_CONFUSION_ORACLE)
def lang_id_confusion_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.lang_id_confusion(load_table(spark, sf_dir, "documents"))


_KCENTER_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c1 AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT 1),
cand2 AS (
  SELECT a.vec_id, MIN(CAST(FLOOR(list_sum(list_transform(range(1, 65), i -> (a.v[i] - c.v[i]) * (a.v[i] - c.v[i]))) * 1000 + 0.5) AS BIGINT)) AS dmin
  FROM e a JOIN e c ON c.vec_id IN (SELECT vec_id FROM c1)
  WHERE a.vec_id NOT IN (SELECT vec_id FROM c1)
  GROUP BY a.vec_id
), pick2 AS (
  SELECT vec_id, dmin FROM cand2 ORDER BY dmin DESC, vec_id LIMIT 1
), c2 AS (
  SELECT vec_id FROM c1 UNION ALL SELECT vec_id FROM pick2
),
cand3 AS (
  SELECT a.vec_id, MIN(CAST(FLOOR(list_sum(list_transform(range(1, 65), i -> (a.v[i] - c.v[i]) * (a.v[i] - c.v[i]))) * 1000 + 0.5) AS BIGINT)) AS dmin
  FROM e a JOIN e c ON c.vec_id IN (SELECT vec_id FROM c2)
  WHERE a.vec_id NOT IN (SELECT vec_id FROM c2)
  GROUP BY a.vec_id
), pick3 AS (
  SELECT vec_id, dmin FROM cand3 ORDER BY dmin DESC, vec_id LIMIT 1
), c3 AS (
  SELECT vec_id FROM c2 UNION ALL SELECT vec_id FROM pick3
),
cand4 AS (
  SELECT a.vec_id, MIN(CAST(FLOOR(list_sum(list_transform(range(1, 65), i -> (a.v[i] - c.v[i]) * (a.v[i] - c.v[i]))) * 1000 + 0.5) AS BIGINT)) AS dmin
  FROM e a JOIN e c ON c.vec_id IN (SELECT vec_id FROM c3)
  WHERE a.vec_id NOT IN (SELECT vec_id FROM c3)
  GROUP BY a.vec_id
), pick4 AS (
  SELECT vec_id, dmin FROM cand4 ORDER BY dmin DESC, vec_id LIMIT 1
), c4 AS (
  SELECT vec_id FROM c3 UNION ALL SELECT vec_id FROM pick4
),
cand5 AS (
  SELECT a.vec_id, MIN(CAST(FLOOR(list_sum(list_transform(range(1, 65), i -> (a.v[i] - c.v[i]) * (a.v[i] - c.v[i]))) * 1000 + 0.5) AS BIGINT)) AS dmin
  FROM e a JOIN e c ON c.vec_id IN (SELECT vec_id FROM c4)
  WHERE a.vec_id NOT IN (SELECT vec_id FROM c4)
  GROUP BY a.vec_id
), pick5 AS (
  SELECT vec_id, dmin FROM cand5 ORDER BY dmin DESC, vec_id LIMIT 1
), c5 AS (
  SELECT vec_id FROM c4 UNION ALL SELECT vec_id FROM pick5
),
cand6 AS (
  SELECT a.vec_id, MIN(CAST(FLOOR(list_sum(list_transform(range(1, 65), i -> (a.v[i] - c.v[i]) * (a.v[i] - c.v[i]))) * 1000 + 0.5) AS BIGINT)) AS dmin
  FROM e a JOIN e c ON c.vec_id IN (SELECT vec_id FROM c5)
  WHERE a.vec_id NOT IN (SELECT vec_id FROM c5)
  GROUP BY a.vec_id
), pick6 AS (
  SELECT vec_id, dmin FROM cand6 ORDER BY dmin DESC, vec_id LIMIT 1
), c6 AS (
  SELECT vec_id FROM c5 UNION ALL SELECT vec_id FROM pick6
)
SELECT 1 AS sel_order, vec_id, CAST(0 AS BIGINT) AS dmin_milli FROM c1
UNION ALL SELECT 2, vec_id, dmin FROM pick2
UNION ALL SELECT 3, vec_id, dmin FROM pick3
UNION ALL SELECT 4, vec_id, dmin FROM pick4
UNION ALL SELECT 5, vec_id, dmin FROM pick5
UNION ALL SELECT 6, vec_id, dmin FROM pick6
ORDER BY sel_order"""


@register("kcenter_init", _KCENTER_ORACLE)
def kcenter_init_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.kcenter_init(load_table(spark, sf_dir, "embeddings"))


@register(
    "multimodal_audio_vad",
    # formula-derived WAV clips (synthetic_wav_media): sample i =
    # ((doc_id*13 + i*31) % 65536) - 32768, n = 64 + doc_id % 50 —
    # the oracle recomputes every frame energy the decoder must produce
    """
WITH dims AS (
  SELECT doc_id, 64 + doc_id % 50 AS n FROM documents
), s AS (
  SELECT doc_id, i.i AS i,
         ((doc_id * 13 + i.i * 31) % 65536) - 32768 AS v
  FROM dims, LATERAL (SELECT UNNEST(range(n)) AS i) i
), fr AS (
  SELECT doc_id, CAST(i // 16 AS INT) AS frame_idx,
         CAST(SUM(v * v) AS BIGINT) AS energy
  FROM s
  WHERE i // 16 < (SELECT n FROM dims d WHERE d.doc_id = s.doc_id) // 16
  GROUP BY doc_id, i // 16
)
SELECT doc_id, frame_idx, energy, energy > 4800000000 AS is_active
FROM fr ORDER BY doc_id, frame_idx
""",
)
def multimodal_audio_vad_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthetic_wav_media(docs)
    return multimodal.audio_vad_frames(media).orderBy("doc_id", "frame_idx")


@register(
    "source_token_kl",
    # same one-log expression shape, nano-quantized per term, exact
    # bigint per-source sums
    """
WITH toks AS (
  SELECT source, t.tok FROM documents,
       LATERAL UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS t(tok)
  WHERE t.tok <> ''
), cst AS (
  SELECT source, tok, COUNT(*) AS c_st FROM toks GROUP BY source, tok
), ns AS (
  SELECT source, SUM(c_st) AS n_s FROM cst GROUP BY source
), ct AS (
  SELECT tok, SUM(c_st) AS c_t FROM cst GROUP BY tok
), tot AS (SELECT SUM(c_t) AS n FROM ct),
contrib AS (
  SELECT cst.source, ns.n_s,
         CAST(FLOOR((cst.c_st / CAST(ns.n_s AS DOUBLE))
              * LN((cst.c_st * tot.n) / (CAST(ns.n_s AS DOUBLE) * ct.c_t))
              * 1e9 + 0.5) AS BIGINT) AS u
  FROM cst JOIN ns USING (source) JOIN ct USING (tok) CROSS JOIN tot
)
SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_tokens,
       CAST(SUM(u) AS BIGINT) AS kl_nano,
       ROUND(SUM(u) / 1e9, 6) AS kl
FROM contrib GROUP BY source ORDER BY source
""",
)
def source_token_kl_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.source_token_kl(load_table(spark, sf_dir, "documents"))


@register(
    "timeseries_topk_similar",
    # same grid/z-norm/ordered-fold construction: counts exact, mean
    # one division, std one sqrt, distance a day-ordered fold
    """
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
users AS (SELECT DISTINCT user_id FROM events),
counts AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), grid AS (
  SELECT u.user_id, d.day, COALESCE(c.c, 0) AS c
  FROM users u CROSS JOIN days d
  LEFT JOIN counts c ON c.user_id = u.user_id AND c.day = d.day
), vec AS (
  SELECT user_id,
         list_transform(array_agg(c ORDER BY day), x -> CAST(x AS DOUBLE)) AS v
  FROM grid GROUP BY user_id
), wm AS (
  SELECT user_id, v, list_sum(v) / len(v) AS m FROM vec
), ws AS (
  SELECT user_id, v, m,
         CASE WHEN sqrt(list_sum(list_transform(v, x -> (x - m) * (x - m))) / len(v)) = 0
              THEN 1.0
              ELSE sqrt(list_sum(list_transform(v, x -> (x - m) * (x - m))) / len(v))
         END AS s
  FROM wm
), z AS (
  SELECT user_id, list_transform(v, x -> (x - m) / s) AS z FROM ws
), q AS (SELECT z AS qz FROM z WHERE user_id = 0)
SELECT z.user_id,
       ROUND(list_sum(list_transform(range(1, len(z.z) + 1),
             i -> (z.z[i] - q.qz[i]) * (z.z[i] - q.qz[i]))), 6) AS znorm_dist
FROM z, q WHERE z.user_id <> 0
ORDER BY znorm_dist, z.user_id LIMIT 10
""",
)
def timeseries_topk_similar_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.timeseries_topk_similar(load_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Round 3 (cont.): kNN graph + mutual-kNN clustering, corpus novelty,
# robust trend estimation, mergeable-histogram quantiles.
# ---------------------------------------------------------------------------

# shared CTE: milli-quantized vectors and the exact top-5 MIPS ranking —
# mirrors similarity._quantized_vec / knn_graph bit-for-bit (integer dots)
_KNN_TOPK_CTE = """
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS v
  FROM embeddings
), dots AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         CAST(list_dot_product(a.v, b.v) AS BIGINT) AS dot_q
  FROM qv a JOIN qv b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, neighbor_id, dot_q,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dot_q DESC, neighbor_id) AS rank
  FROM dots
), knn AS (
  SELECT vec_id, CAST(rank AS INT) AS rank, neighbor_id, dot_q
  FROM ranked WHERE rank <= 5
)
"""


@register(
    "knn_graph",
    _KNN_TOPK_CTE + "SELECT * FROM knn ORDER BY vec_id, rank",
)
def knn_graph_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.knn_graph(load_table(spark, sf_dir, "embeddings"))


@register(
    "knn_graph_components",
    _KNN_TOPK_CTE
    + """
, mutual AS (
  SELECT a.vec_id AS u, a.neighbor_id AS v
  FROM knn a JOIN knn b
    ON a.vec_id = b.neighbor_id AND a.neighbor_id = b.vec_id
), reach AS (
  WITH RECURSIVE walk(src, dst) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT w.src, m.v FROM walk w JOIN mutual m ON w.dst = m.u
  )
  SELECT src, dst FROM walk
)
SELECT src AS vec_id, MIN(dst) AS component_id
FROM reach GROUP BY src ORDER BY vec_id
""",
)
def knn_graph_components_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.mutual_knn_components(load_table(spark, sf_dir, "embeddings"))


@register(
    "ngram_novelty_curve",
    # string grams stand in for the engine's xxhash64'd grams: counts and
    # min-owner agree absent 64-bit collisions (the gopher/span convention)
    """
WITH t AS (
  SELECT doc_id, trim(text) AS txt,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), dg AS (
  SELECT DISTINCT doc_id, g.g FROM t, LATERAL UNNEST(
    CASE WHEN len(toks) >= 3
         THEN list_transform(generate_series(1, len(toks) - 2),
                             i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
         ELSE [txt] END) AS g(g)
), first_owner AS (
  SELECT g, MIN(doc_id) AS first_doc FROM dg GROUP BY g
)
SELECT dg.doc_id,
       COUNT(*) AS n_grams,
       SUM(CASE WHEN f.first_doc = dg.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
       floor(SUM(CASE WHEN f.first_doc = dg.doc_id THEN 1 ELSE 0 END)
             / COUNT(*) * 1e4 + 0.5) / 1e4 AS novelty_frac
FROM dg JOIN first_owner f USING (g)
GROUP BY dg.doc_id ORDER BY dg.doc_id
""",
)
def ngram_novelty_curve_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.ngram_novelty(load_table(spark, sf_dir, "documents"))


@register(
    "theil_sen_trend",
    """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type,
         CAST(b.v - a.v AS DOUBLE) / (b.day - a.day) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
)
SELECT event_type,
       ROUND(median(slope), 6) AS theil_sen_slope,
       COUNT(*) AS n_pairs
FROM pairs GROUP BY event_type ORDER BY event_type
""",
)
def theil_sen_trend_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event_type: the median over all day
    pairs of the pairwise slope of DAILY revenue — the estimator that
    shrugs off the outlier days that wreck OLS (price_elasticity's
    least-squares twin). Daily sums are cent-quantized ints, so both
    engines divide identical integers; the slope median interpolates
    identically.

    Scale shape: the pair relation is daily-agg x daily-agg PER KEY —
    O(D^2) in CALENDAR DAYS, independent of row count (100 TB of events
    still collapses to types x days rows before the self-join). The
    event scan aggregates map-side; the self-join input is tiny."""
    ev = load_events(spark, sf_dir).select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vq"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.sum("vq").alias("v"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.v") - F.col("a.v")).cast("double")
            / F.datediff(F.col("b.day"), F.col("a.day"))
        ).alias("slope"),
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(slope, 0.5)"), 6).alias("theil_sen_slope"),
            F.count("*").alias("n_pairs"),
        )
        .orderBy("event_type")
    )


@register(
    "quantiles_merged_histograms",
    """
WITH mm AS (
  SELECT MIN(o_totalprice::DOUBLE) AS lo, MAX(o_totalprice::DOUBLE) AS hi,
         COUNT(*) AS n
  FROM orders
), binned AS (
  SELECT LEAST(31, CAST(floor((o_totalprice::DOUBLE - mm.lo)
                              / ((mm.hi - mm.lo) / 32)) AS INT)) AS bin,
         COUNT(*) AS cnt
  FROM orders, mm GROUP BY 1
), cum AS (
  SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum
  FROM binned
), targets AS (
  SELECT q, q * mm.n AS target FROM (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) t(q), mm
), est AS (
  SELECT t.q,
         MIN(c.bin) AS bin,
         MIN(mm.lo + (mm.hi - mm.lo) / 32
             * (c.bin + (t.target - (c.cum - c.cnt)) / c.cnt)) AS raw_est
  FROM targets t JOIN cum c ON c.cum >= t.target AND (c.cum - c.cnt) < t.target
  CROSS JOIN mm
  GROUP BY t.q
), exact AS (
  SELECT ROUND(quantile_cont(o_totalprice::DOUBLE, 0.25), 4) AS e25,
         ROUND(quantile_cont(o_totalprice::DOUBLE, 0.5), 4) AS e50,
         ROUND(quantile_cont(o_totalprice::DOUBLE, 0.75), 4) AS e75,
         ROUND(quantile_cont(o_totalprice::DOUBLE, 0.9), 4) AS e90,
         ROUND(quantile_cont(o_totalprice::DOUBLE, 0.99), 4) AS e99
  FROM orders
)
SELECT q, bin,
       ROUND(raw_est, 4) AS est,
       CASE q WHEN 0.25 THEN e25 WHEN 0.5 THEN e50 WHEN 0.75 THEN e75
              WHEN 0.9 THEN e90 ELSE e99 END AS exact,
       ROUND(ABS(raw_est - CASE q WHEN 0.25 THEN e25 WHEN 0.5 THEN e50
                                  WHEN 0.75 THEN e75 WHEN 0.9 THEN e90
                                  ELSE e99 END), 4) AS abs_err,
       ABS(raw_est - CASE q WHEN 0.25 THEN e25 WHEN 0.5 THEN e50
                            WHEN 0.75 THEN e75 WHEN 0.9 THEN e90
                            ELSE e99 END)
         <= (SELECT (hi - lo) / 32 FROM mm) AS within_bin_width
FROM est, exact ORDER BY q
""",
)
def quantiles_merged_histograms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from MERGEABLE histogram sketches: each shard
    builds a fixed 32-bin equi-width histogram (the mergeable state — a
    32-int vector), partial states merge associatively, and quantiles
    interpolate inside the covering bin. The exact percentile runs
    alongside and the contract asserts |est - exact| <= bin width — the
    sketch's provable error bound. This is the two-level (shard ->
    global) shape every distributed quantile sketch (t-digest/KLL)
    uses; equi-width bins keep the merge and the oracle bit-exact.

    Plan: one min/max pass (broadcast 1-row), one map-side-combined
    groupBy(shard, bin) -> groupBy(bin) merge; the window prefix-sum
    runs over the BOUNDED 32-row bin relation (benign SinglePartition);
    exact quantiles via percentile() for the error column."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("x")
    )
    mm = o.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"), F.count("*").alias("n")
    )
    width = (F.col("hi") - F.col("lo")) / 32
    binned = o.join(F.broadcast(mm)).select(
        F.pmod(F.col("o_orderkey"), F.lit(16)).alias("shard"),
        F.least(F.lit(31), F.floor((F.col("x") - F.col("lo")) / width).cast("int"))
        .alias("bin"),
    )
    # two-level merge: per-shard partial histograms, then the global merge
    state = binned.groupBy("shard", "bin").agg(F.count("*").alias("cnt"))
    merged = state.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    cum = merged.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("bin"))
    )
    qs = load_table(spark, sf_dir, "orders").sparkSession.createDataFrame(
        [(0.25,), (0.5,), (0.75,), (0.9,), (0.99,)], "q double"
    )
    targets = qs.crossJoin(F.broadcast(mm)).select(
        "q", "lo", "hi", "n", (F.col("q") * F.col("n")).alias("target")
    )
    est = (
        F.broadcast(targets)
        .join(
            cum,
            (F.col("cum") >= F.col("target"))
            & ((F.col("cum") - F.col("cnt")) < F.col("target")),
        )
        .groupBy("q")
        .agg(
            F.min("bin").alias("bin"),
            F.min(
                F.col("lo")
                + (F.col("hi") - F.col("lo")) / 32
                * (
                    F.col("bin")
                    + (F.col("target") - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
                )
            ).alias("raw_est"),
        )
    )
    exact = o.agg(
        *[
            F.round(F.expr(f"percentile(x, {q})"), 4).alias(f"e{int(q*100)}")
            for q in (0.25, 0.5, 0.75, 0.9, 0.99)
        ]
    )
    exact_col = (
        F.when(F.col("q") == 0.25, F.col("e25"))
        .when(F.col("q") == 0.5, F.col("e50"))
        .when(F.col("q") == 0.75, F.col("e75"))
        .when(F.col("q") == 0.9, F.col("e90"))
        .otherwise(F.col("e99"))
    )
    bound = mm.select((width).alias("w"))
    return (
        est.join(F.broadcast(exact))
        .join(F.broadcast(bound))
        .select(
            "q",
            "bin",
            F.round(F.col("raw_est"), 4).alias("est"),
            exact_col.alias("exact"),
            F.round(F.abs(F.col("raw_est") - exact_col), 4).alias("abs_err"),
            (F.abs(F.col("raw_est") - exact_col) <= F.col("w")).alias(
                "within_bin_width"
            ),
        )
        .orderBy("q")
    )


@register(
    "split_semantic_leakage",
    """
WITH emb AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS v,
         substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) IN ('0','1','2') AS is_test
  FROM embeddings
), scored AS (
  SELECT t.vec_id AS test_id, tr.vec_id AS nearest_train_id,
         CAST(list_dot_product(t.v, tr.v) AS BIGINT) AS dot_q,
         ROW_NUMBER() OVER (PARTITION BY t.vec_id
                            ORDER BY CAST(list_dot_product(t.v, tr.v) AS BIGINT) DESC,
                                     tr.vec_id) AS rn
  FROM emb t JOIN emb tr ON t.is_test AND NOT tr.is_test
)
SELECT test_id, nearest_train_id, dot_q, dot_q >= 2000000 AS leaked
FROM scored WHERE rn = 1 ORDER BY test_id
""",
)
def split_semantic_leakage_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import similarity

    return similarity.split_semantic_leakage(load_table(spark, sf_dir, "embeddings"))


@register(
    "randomized_response_audit",
    """
WITH cats AS (
  SELECT event_type AS cat,
         ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS idx
  FROM (SELECT DISTINCT event_type FROM events)
), kk AS (SELECT COUNT(*) AS k FROM cats),
reported AS (
  SELECT CASE WHEN CAST(concat('0x', substr(md5('rrkeep:' || CAST(e.event_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 100 < 75
              THEN e.event_type ELSE c.cat END AS category
  FROM events e, kk
  JOIN cats c
    ON c.idx = CAST(CAST(concat('0x', substr(md5('rrcat:' || CAST(e.event_id AS VARCHAR)), 1, 15)) AS UBIGINT) % kk.k AS BIGINT)
), obs AS (
  SELECT category, COUNT(*) AS observed_n FROM reported GROUP BY category
), tru AS (
  SELECT event_type AS category, COUNT(*) AS true_n FROM events GROUP BY event_type
), tot AS (SELECT COUNT(*) AS n FROM events)
SELECT t.category, t.true_n, o.observed_n,
       ROUND((o.observed_n - 0.25 * tot.n / kk.k) / 0.75, 2) AS estimated_n,
       ROUND(ABS((o.observed_n - 0.25 * tot.n / kk.k) / 0.75 - t.true_n), 2) AS abs_err
FROM tru t JOIN obs o USING (category), tot, kk
ORDER BY t.category
""",
)
def randomized_response_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL differential privacy by randomized response (Warner 1965;
    the RAPPOR-style categorical variant): each event keeps its true
    category with p=0.75, else reports a hash-chosen uniform category;
    the debiased estimator (obs - (1-p)N/k) / p recovers per-category
    counts. The audit reports true vs observed vs estimated side by
    side — the calibration check a privacy pipeline ships with. The
    coin flips are md5-derived (the h60 convention), so both engines
    replay the identical mechanism.

    Plan: the category table (k rows) broadcasts twice (index join +
    debias constants); the event pass is one codegen projection + one
    partial-agg census. Nothing scales with more than the category
    count after the scan."""
    ev = load_events(spark, sf_dir).select("event_id", "event_type")

    def h60(prefix: str) -> Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), F.col("event_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")

    w = Window.orderBy("event_type")
    cats = (
        ev.select("event_type")
        .distinct()
        .select(
            F.col("event_type").alias("cat"),
            (F.row_number().over(w) - 1).cast("long").alias("idx"),
        )
    )
    kdf = cats.agg(F.count("*").alias("k"))
    tot = ev.agg(F.count("*").alias("n"))
    reported = (
        ev.join(F.broadcast(kdf))
        .select(
            "event_type",
            (F.pmod(h60("rrkeep:"), F.lit(100)) < 75).alias("keep"),
            F.pmod(h60("rrcat:"), F.col("k")).alias("ridx"),
        )
        .join(F.broadcast(cats), F.col("ridx") == F.col("idx"))
        .select(
            F.when(F.col("keep"), F.col("event_type"))
            .otherwise(F.col("cat"))
            .alias("category")
        )
    )
    obs = reported.groupBy("category").agg(F.count("*").alias("observed_n"))
    tru = ev.groupBy(F.col("event_type").alias("category")).agg(
        F.count("*").alias("true_n")
    )
    est = (
        F.col("observed_n") - 0.25 * F.col("n") / F.col("k")
    ) / 0.75
    return (
        tru.join(obs, "category")
        .join(F.broadcast(tot))
        .join(F.broadcast(kdf))
        .select(
            "category",
            "true_n",
            "observed_n",
            F.round(est, 2).alias("estimated_n"),
            F.round(F.abs(est - F.col("true_n")), 2).alias("abs_err"),
        )
        .orderBy("category")
    )


@register(
    "markov_transition_matrix",
    """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type
  FROM events
), t AS (
  SELECT from_type, event_type AS to_type, COUNT(*) AS n
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       floor(n / SUM(n) OVER (PARTITION BY from_type) * 1e4 + 0.5) / 1e4 AS p
FROM t ORDER BY from_type, to_type
""",
)
def markov_transition_matrix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — the behavioral model
    behind next-event prediction, anomaly scoring (low-probability
    transitions) and Markov attribution. One lag window per user, one
    (from, to) census, and the row-normalizing sum runs over the
    |types|^2-bounded transition relation — the heavy shuffle is the
    per-user sort, which sessionize_batch/funnel queries already pay
    and reuse."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    row_total = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n",
        (
            F.floor(F.col("n") / F.sum("n").over(row_total) * 1e4 + F.lit(0.5)) / 1e4
        ).alias("p"),
    ).orderBy("from_type", "to_type")


@register(
    "keyword_textrank",
    """
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), pairs AS (
  SELECT t[i] AS w, t[i + 1] AS v
  FROM d, LATERAL UNNEST(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2 AND t[i] <> t[i + 1]
), wedges AS (
  SELECT LEAST(w, v) AS a, GREATEST(w, v) AS b, COUNT(*) AS wt
  FROM pairs GROUP BY 1, 2
), edges AS (
  SELECT a, b, wt FROM wedges
  UNION ALL SELECT b AS a, a AS b, wt FROM wedges
), wdeg AS (
  SELECT a, SUM(wt)::BIGINT AS wdeg FROM edges GROUP BY a
), r1 AS (
  SELECT e.b AS word,
         150000000::BIGINT
           + CAST(floor(0.85 * SUM((1000000000::BIGINT * e.wt) // w.wdeg) + 0.5) AS BIGINT)
           AS rank_u
  FROM edges e JOIN wdeg w ON e.a = w.a
  GROUP BY e.b
), r2 AS (
  SELECT e.b AS word,
         150000000::BIGINT
           + CAST(floor(0.85 * SUM((r.rank_u * e.wt) // w.wdeg) + 0.5) AS BIGINT)
           AS rank_u
  FROM edges e JOIN wdeg w ON e.a = w.a JOIN r1 r ON r.word = e.a
  GROUP BY e.b
)
SELECT n.a AS word, COALESCE(r2.rank_u, 150000000) / 1e9 AS textrank
FROM wdeg n LEFT JOIN r2 ON r2.word = n.a
ORDER BY COALESCE(r2.rank_u, 150000000) DESC, word LIMIT 20
""",
)
def keyword_textrank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.keyword_textrank(load_table(spark, sf_dir, "documents"))


@register(
    "als_implicit_step",
    """
WITH r AS (
  SELECT user_id, event_type, COUNT(*) AS r FROM events GROUP BY 1, 2
), f AS (
  SELECT event_type,
         CAST(CAST(concat('0x', substr(md5('alsa:' || event_type), 1, 15)) AS UBIGINT) % 1000 AS BIGINT) AS a,
         CAST(CAST(concat('0x', substr(md5('alsb:' || event_type), 1, 15)) AS UBIGINT) % 1000 AS BIGINT) AS b
  FROM (SELECT DISTINCT event_type FROM events)
), yty AS (
  SELECT SUM(a * a)::BIGINT AS saa, SUM(a * b)::BIGINT AS sab,
         SUM(b * b)::BIGINT AS sbb
  FROM f
), peru AS (
  SELECT r.user_id,
         COUNT(*) AS n_items,
         SUM(r.r * f.a * f.a)::BIGINT AS waa,
         SUM(r.r * f.a * f.b)::BIGINT AS wab,
         SUM(r.r * f.b * f.b)::BIGINT AS wbb,
         SUM((1 + r.r) * f.a)::BIGINT AS v0,
         SUM((1 + r.r) * f.b)::BIGINT AS v1
  FROM r JOIN f USING (event_type) GROUP BY r.user_id
), solved AS (
  SELECT user_id, n_items,
         CAST(yty.saa + waa + 100000 AS DOUBLE) AS m11,
         CAST(yty.sab + wab AS DOUBLE) AS m12,
         CAST(yty.sbb + wbb + 100000 AS DOUBLE) AS m22,
         CAST(v0 AS DOUBLE) AS v0, CAST(v1 AS DOUBLE) AS v1
  FROM peru, yty
)
SELECT user_id, n_items,
       floor((m22 * v0 - m12 * v1) / (m11 * m22 - m12 * m12) * 1e6 + 0.5) / 1e6 AS x0,
       floor((m11 * v1 - m12 * v0) / (m11 * m22 - m12 * m12) * 1e6 + 0.5) / 1e6 AS x1
FROM solved ORDER BY user_id
""",
)
def als_implicit_step_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One implicit-feedback ALS half-step (Hu, Koren & Volinsky 2008,
    public algorithm), rank 2: item factors are fixed md5-derived
    integer millis (the deterministic stand-in for the previous
    iteration — swapping in learned factors changes one broadcast
    table), and each user's factor solves the 2x2 normal equations
    (YtY + Yt(C-I)Y + lambda*I) x = Yt C p in closed form. This is the
    matrix-factorization training kernel next to kmeans/pagerank/PCA:
    a full ALS alternates this exact plan between sides.

    Plan: one (user, item) census shuffle, item factors broadcast, the
    global YtY term is a 1-row broadcast, and the per-user normal
    matrix is a partial-agg fold — closed-form solve is a codegen
    projection. All accumulations are exact bigints; the 2x2 solve is
    one fixed IEEE sequence, bit-identical across engines."""
    ev = load_events(spark, sf_dir)
    r = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("r"))

    def hmod(prefix: str) -> Column:
        return F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(prefix), F.col("event_type"))), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(1000),
        )

    f = (
        ev.select("event_type")
        .distinct()
        .select("event_type", hmod("alsa:").alias("a"), hmod("alsb:").alias("b"))
    )
    yty = f.agg(
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
    )
    peru = (
        r.join(F.broadcast(f), "event_type")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("r") * F.col("a") * F.col("a")).alias("waa"),
            F.sum(F.col("r") * F.col("a") * F.col("b")).alias("wab"),
            F.sum(F.col("r") * F.col("b") * F.col("b")).alias("wbb"),
            F.sum((F.lit(1) + F.col("r")) * F.col("a")).alias("v0"),
            F.sum((F.lit(1) + F.col("r")) * F.col("b")).alias("v1"),
        )
    )
    m11 = (F.col("saa") + F.col("waa") + F.lit(100000)).cast("double")
    m12 = (F.col("sab") + F.col("wab")).cast("double")
    m22 = (F.col("sbb") + F.col("wbb") + F.lit(100000)).cast("double")
    v0 = F.col("v0").cast("double")
    v1 = F.col("v1").cast("double")
    det = m11 * m22 - m12 * m12
    return (
        peru.join(F.broadcast(yty))
        .select(
            "user_id",
            "n_items",
            (F.floor((m22 * v0 - m12 * v1) / det * 1e6 + F.lit(0.5)) / 1e6).alias("x0"),
            (F.floor((m11 * v1 - m12 * v0) / det * 1e6 + F.lit(0.5)) / 1e6).alias("x1"),
        )
        .orderBy("user_id")
    )


@register(
    "twap_report",
    """
WITH seq AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq,
         (epoch_us(LEAD(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id))
          - epoch_us(ts)) // 1000000 AS dt_s
  FROM events
)
SELECT event_type,
       floor(SUM(vq * dt_s) / SUM(dt_s) / 100 * 1e4 + 0.5) / 1e4 AS twap,
       SUM(dt_s)::BIGINT AS total_secs,
       COUNT(*) AS n_intervals
FROM seq WHERE dt_s IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
)
def twap_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price/value (TWAP) per event type: each
    observation holds until the next one, so its weight is the interval
    it was live — the right mean for IRREGULARLY sampled series where
    the arithmetic mean over-weights bursts (ewma_smoothing's
    sampling-bias complement; the financial/metrics standard).

    Plan: one per-type lead window (reusing the sessionize sort order),
    integer second deltas and cent-quantized values keep every sum
    exact; one census aggregate out. Linear scan, type-bounded output."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.expr("unix_micros(ts)")
    seq = (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vq"),
            (F.lead(us).over(w) - us).alias("dt_us"),
        )
        # integer floor division, not float-divide-then-cast: a float
        # quotient can round up to the next integer before the cast
        .select("event_type", "vq", F.expr("dt_us DIV 1000000").alias("dt_s"))
        .filter(F.col("dt_s").isNotNull())
    )
    return (
        seq.groupBy("event_type")
        .agg(
            (
                F.floor(
                    F.sum(F.col("vq") * F.col("dt_s"))
                    / F.sum("dt_s")
                    / 100
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("twap"),
            F.sum("dt_s").alias("total_secs"),
            F.count("*").alias("n_intervals"),
        )
        .orderBy("event_type")
    )


@register(
    "rank_fusion_rrf",
    # BM25 leg reuses the bm25_retrieval mirror (k=10); coverage leg
    # ranks by distinct query terms hit then doc length; RRF is two
    # IEEE divisions + one fixed-order sum, ties on doc_id
    _TOKS_CTE
    + """
, q(query_id, term) AS (
  VALUES (1,'hash'),(1,'join'),(2,'sort'),(2,'merge'),(3,'customer'),(3,'value')
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), tot AS (
  SELECT COUNT(*) AS s_tokens, COUNT(DISTINCT doc_id) AS n_docs FROM toks
), part AS (
  SELECT q.query_id, tf.doc_id,
         CAST(FLOOR(
           (LN(1.0 + (tot.n_docs - df.df + 0.5) / (df.df + 0.5))
            * (tf.tf * 2.2)
            / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / (tot.s_tokens / CAST(tot.n_docs AS DOUBLE))))))
           * 1e6 + 0.5) AS BIGINT) AS su
  FROM tf
  JOIN q USING (term)
  JOIN dl USING (doc_id)
  JOIN df USING (term)
  CROSS JOIN tot
), agg AS (
  SELECT query_id, doc_id, SUM(su) AS su FROM part GROUP BY query_id, doc_id
), bm25r AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY su DESC, doc_id) AS rank_bm25
  FROM agg QUALIFY rank_bm25 <= 10
), hits AS (
  SELECT q.query_id, t.doc_id, COUNT(*) AS n_hit
  FROM (SELECT DISTINCT doc_id, term FROM toks) t JOIN q USING (term)
  GROUP BY q.query_id, t.doc_id
), covr AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY n_hit DESC, dl.dl ASC, doc_id) AS rank_cov
  FROM hits JOIN dl USING (doc_id) QUALIFY rank_cov <= 10
), fused AS (
  SELECT COALESCE(a.query_id, b.query_id) AS query_id,
         COALESCE(a.doc_id, b.doc_id) AS doc_id,
         a.rank_bm25, b.rank_cov,
         COALESCE(1.0 / (60 + a.rank_bm25), 0.0)
           + COALESCE(1.0 / (60 + b.rank_cov), 0.0) AS rrf_raw
  FROM bm25r a FULL OUTER JOIN covr b
    ON a.query_id = b.query_id AND a.doc_id = b.doc_id
)
SELECT query_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_raw DESC, doc_id) AS INT)
         AS fused_rank,
       doc_id,
       floor(rrf_raw * 1e9 + 0.5) / 1e9 AS rrf,
       rank_bm25, rank_cov
FROM fused
QUALIFY fused_rank <= 5
ORDER BY query_id, fused_rank
""",
)
def rank_fusion_rrf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.rank_fusion_rrf(load_table(spark, sf_dir, "documents"))


@register(
    "link_prediction_jaccard",
    # same interaction graph as graph_triangles; score NON-edges at
    # distance 2 by neighbor-set Jaccard (common-neighbors family)
    """
WITH raw AS (
  SELECT user_id % 200 AS p, event_id % 199 AS q FROM events
  WHERE user_id % 200 <> event_id % 199
),
edges AS (SELECT DISTINCT LEAST(p, q) AS u, GREATEST(p, q) AS v FROM raw),
adj AS (
  SELECT u AS node, v AS nbr FROM edges
  UNION ALL SELECT v AS node, u AS nbr FROM edges
),
deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY node),
cand AS (
  SELECT a1.node AS u, a2.node AS v, COUNT(*) AS n_common
  FROM adj a1 JOIN adj a2 ON a1.nbr = a2.nbr AND a1.node < a2.node
  GROUP BY a1.node, a2.node
),
nonedges AS (
  SELECT c.u, c.v, c.n_common FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.u = c.u AND e.v = c.v)
)
SELECT u, v, n_common,
       floor(n_common / (du.deg + dv.deg - n_common) * 1e4 + 0.5) / 1e4 AS jaccard
FROM nonedges JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v
ORDER BY jaccard DESC, u, v LIMIT 20
""",
)
def link_prediction_jaccard_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighbor-set Jaccard (the common-neighbors
    family, Liben-Nowell & Kleinberg 2003): score every NON-adjacent
    node pair at distance 2 on the interaction graph and rank — the
    recommendation/completion primitive next to item_item_recs (which
    scores co-purchases, not graph structure).

    Plan: candidate pairs come from ONE self-join on the adjacency list
    keyed by the shared neighbor — the wedge join graph_triangles
    already pays, bounded by sum-of-degrees-squared, never all pairs;
    the existing-edge exclusion is a broadcast anti-join and Jaccard is
    a census-side projection. Top-20 is a TakeOrdered."""
    ev = load_events(spark, sf_dir)
    raw = ev.select(
        (F.col("user_id") % 200).alias("p"), (F.col("event_id") % 199).alias("q")
    ).filter(F.col("p") != F.col("q"))
    edges = raw.select(
        F.least("p", "q").alias("u"), F.greatest("p", "q").alias("v")
    ).distinct()
    adj = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionByName(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("deg"))
    a1 = adj.select(F.col("node").alias("u"), "nbr")
    a2 = adj.select(F.col("node").alias("v"), F.col("nbr").alias("nbr2"))
    cand = (
        a1.join(a2, (F.col("nbr") == F.col("nbr2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n_common"))
    )
    nonedges = cand.join(edges, ["u", "v"], "left_anti")
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    jac = F.col("n_common") / (F.col("du") + F.col("dv") - F.col("n_common"))
    return (
        nonedges.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "n_common",
            (F.floor(jac * 1e4 + F.lit(0.5)) / 1e4).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "u", "v")
        .limit(20)
    )


@register(
    "conformal_coverage_report",
    """
WITH feats AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\\s+')) AS x,
         n_chars AS y,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
  FROM documents
), splits AS (
  SELECT doc_id, CAST(x AS BIGINT) AS x, y,
         CASE WHEN h IN ('a','b','c') THEN 'calib'
              WHEN h IN ('d','e','f') THEN 'test'
              ELSE 'train' END AS split
  FROM feats
), fit AS (
  SELECT COUNT(*) AS n, SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
         SUM(x * y)::BIGINT AS sxy, SUM(x * x)::BIGINT AS sxx
  FROM splits WHERE split = 'train'
), model AS (
  SELECT CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
         (CAST(sy AS DOUBLE)
          - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
            * CAST(sx AS DOUBLE)) / n AS icept
  FROM fit
), resid AS (
  SELECT s.doc_id, s.split,
         ABS(s.y - (m.icept + m.slope * s.x)) AS r
  FROM splits s, model m WHERE s.split <> 'train'
), calib AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r, doc_id) AS rn,
         COUNT(*) OVER () AS nc
  FROM resid WHERE split = 'calib'
), qhat AS (
  SELECT r AS q, nc FROM calib WHERE rn = CAST(ceil(0.9 * (nc + 1)) AS BIGINT)
), test AS (
  SELECT COUNT(*) AS nt,
         SUM(CASE WHEN r <= (SELECT q FROM qhat) THEN 1 ELSE 0 END)::BIGINT AS covered
  FROM resid WHERE split = 'test'
)
SELECT (SELECT COUNT(*) FROM splits WHERE split = 'train') AS n_train,
       (SELECT nc FROM qhat) AS n_calib,
       nt AS n_test,
       floor((SELECT q FROM qhat) * 1e4 + 0.5) / 1e4 AS qhat,
       floor(covered / nt * 1e4 + 0.5) / 1e4 AS coverage
FROM test
""",
)
def conformal_coverage_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk et al.; Lei et al.
    2018 — public method) for a regression model: fit OLS (n_chars ~
    token count) on the TRAIN split, take qhat = the ceil(0.9*(n+1))-th
    smallest absolute residual on the CALIBRATION split, and report
    empirical coverage of |y - yhat| <= qhat on the TEST split — the
    distribution-free uncertainty audit a model-serving pipeline runs
    before shipping intervals. Splits are the md5-digit convention.

    Determinism: OLS uses exact integer moments (trend_lines kernel);
    qhat is a DISCRETE order statistic selected by row_number (no
    interpolation); coverage is an integer ratio.

    Plan: one feature pass, a 1-row broadcast model, one residual pass;
    the order statistic runs on the calibration split only (a bounded
    fraction at any scale — and at 100 TB you'd census-bucket it like
    quantile_normalize)."""
    docs = load_table(spark, sf_dir, "documents")
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    splits = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("x"),
        F.col("n_chars").alias("y"),
        F.when(first_hex.isin("a", "b", "c"), "calib")
        .when(first_hex.isin("d", "e", "f"), "test")
        .otherwise("train")
        .alias("split"),
    )
    fit = splits.filter(F.col("split") == "train").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    icept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / F.col(
        "n"
    )
    model = fit.select(
        slope.alias("slope"), icept.alias("icept"), F.col("n").alias("n_train")
    )
    resid = (
        splits.filter(F.col("split") != "train")
        .join(F.broadcast(model))
        .select(
            "doc_id",
            "split",
            "n_train",
            F.abs(F.col("y") - (F.col("icept") + F.col("slope") * F.col("x"))).alias(
                "r"
            ),
        )
    )
    wq = Window.orderBy("r", "doc_id")
    calib = (
        resid.filter(F.col("split") == "calib")
        .withColumn("rn", F.row_number().over(wq))
        .withColumn("nc", F.count("*").over(Window.partitionBy()))
    )
    qhat = calib.filter(
        F.col("rn") == F.ceil(0.9 * (F.col("nc") + 1)).cast("long")
    ).select(F.col("r").alias("q"), F.col("nc").alias("n_calib"))
    test = (
        resid.filter(F.col("split") == "test")
        .join(F.broadcast(qhat))
        .groupBy("n_train", "n_calib", "q")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(F.when(F.col("r") <= F.col("q"), 1).otherwise(0)).alias("covered"),
        )
    )
    return test.select(
        "n_train",
        "n_calib",
        "n_test",
        (F.floor(F.col("q") * 1e4 + F.lit(0.5)) / 1e4).alias("qhat"),
        (F.floor(F.col("covered") / F.col("n_test") * 1e4 + F.lit(0.5)) / 1e4).alias(
            "coverage"
        ),
    )


# ---------------------------------------------------------------------------
# ext (round 3): model-eval curve, survival analysis, winnowing dedup,
# t-closeness, BH-FDR, CUPED, LATERAL top-k — evaluation/stats surface a
# training-data pipeline runs around its gates. Reference has no analytics
# surface; extension mandated by the north star.
# ---------------------------------------------------------------------------
@register(
    "pr_curve_points",
    # same quality-model CTE as model_eval_auc; descending prefix sums
    # over the quantized-logit census; keep rows where the 5%-recall
    # bucket (ceil(recall*20)) first changes under lv-descending order
    f"""
WITH f AS (
  SELECT doc_id, lang,
         len({_TOKS})::DOUBLE AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         len(list_filter({_TOKS}, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
           AS n_stop,
         (length(text) - length(replace(text, '.', '')))::DOUBLE AS n_dots
  FROM documents
), wts AS (
  SELECT i.i AS i,
         2 * (CAST(concat('0x', substr(md5('qw:' || i.i), 1, 15)) AS UBIGINT)
              / 1152921504606846976.0) - 1 AS w
  FROM (SELECT UNNEST(range(5)) AS i) i
), z AS (
  SELECT f.doc_id, f.lang = 'en' AS is_pos,
         (SELECT w FROM wts WHERE i = 0) * (n_tokens / 100.0)
         + (SELECT w FROM wts WHERE i = 1) * (n_stop / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 2) * (n_chars / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 3) * (n_dots / (n_chars + 1.0))
         + (SELECT w FROM wts WHERE i = 4) AS z
  FROM f
), census AS (
  SELECT CAST(FLOOR(z * 1e4 + 0.5) AS BIGINT) AS lv,
         COUNT(*) AS c,
         COUNT(CASE WHEN is_pos THEN 1 END) AS p
  FROM z GROUP BY 1
), cum AS (
  SELECT lv,
         SUM(c) OVER (ORDER BY lv DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_pred,
         SUM(p) OVER (ORDER BY lv DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         SUM(p) OVER () AS pos_total
  FROM census
), pts AS (
  SELECT lv, n_pred, tp, pos_total,
         CEIL(tp / pos_total * 20) AS b,
         LAG(CEIL(tp / pos_total * 20)) OVER (ORDER BY lv DESC) AS pb
  FROM cum
)
SELECT lv / 1e4 AS threshold,
       CAST(n_pred AS BIGINT) AS n_pred,
       CAST(tp AS BIGINT) AS tp,
       FLOOR(tp / n_pred * 1e6 + 0.5) / 1e6 AS "precision",
       FLOOR(tp / pos_total * 1e6 + 0.5) / 1e6 AS recall
FROM pts WHERE pb IS NULL OR b <> pb
ORDER BY threshold DESC
""",
)
def pr_curve_points_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.pr_curve_points(load_table(spark, sf_dir, "documents"))


@register(
    "kaplan_meier_survival",
    # exact-hour census; at-risk prefix sums over the <=73-cell census;
    # survival = fixed left-to-right fold of per-time IEEE factors
    """
WITH per_user AS (
  SELECT user_id, MIN(ts) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
  FROM events GROUP BY 1
), subj AS (
  SELECT CASE WHEN tp IS NOT NULL AND dh <= 72 THEN dh ELSE 72 END AS t,
         CASE WHEN tp IS NOT NULL AND dh <= 72 THEN 1 ELSE 0 END AS event
  FROM (SELECT tp, (epoch_us(tp) - epoch_us(t0)) // 3600000000 AS dh
        FROM per_user)
), census AS (
  SELECT t, COUNT(*) AS n_at, SUM(event) AS d_events FROM subj GROUP BY t
), risk AS (
  SELECT t, d_events, n_at - d_events AS n_censored,
         SUM(n_at) OVER ()
           - COALESCE(SUM(n_at) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk,
         ROW_NUMBER() OVER (ORDER BY t) AS rn
  FROM census
), packed AS (
  SELECT list(CAST(n_risk - d_events AS DOUBLE) / n_risk ORDER BY t) AS fs
  FROM risk
)
SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d_events AS BIGINT) AS d_events,
       CAST(n_censored AS BIGINT) AS n_censored,
       FLOOR(list_reduce(fs[1:rn], (a, x) -> a * x) * 1e6 + 0.5) / 1e6
         AS survival
FROM risk, packed ORDER BY t
""",
)
def kaplan_meier_survival_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.kaplan_meier_survival(load_events(spark, sf_dir))


@register(
    "winnowing_fingerprints",
    # md5-15-hex gram hashes; rightmost-min window selection via
    # list_position over the reversed window; df-capped postings join;
    # canonical = CONNECTED-COMPONENT minimum over the >=5-shared
    # partner graph (recursive walk mirrors dedup_components)
    """
WITH ws AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(trim(text)),
           '[^a-z0-9 ]', '', 'g'), ' '), t -> t <> '') AS ws
  FROM documents
), hs AS (
  SELECT doc_id,
         list_transform(range(1, len(ws) - 2), i ->
           CAST(concat('0x', substr(md5(array_to_string(ws[i:i+3], ' ')), 1, 15))
                AS BIGINT)) AS hs
  FROM ws WHERE len(ws) >= 7
), fps AS (
  SELECT DISTINCT doc_id, f.sel AS sel, f.val AS val
  FROM (
    SELECT doc_id,
           UNNEST(list_transform(range(1, len(hs) - 2), j -> struct_pack(
             sel := j + 4 - list_position(list_reverse(hs[j:j+3]),
                                          list_aggregate(hs[j:j+3], 'min')),
             val := list_aggregate(hs[j:j+3], 'min')))) AS f
    FROM hs)
), n_fp AS (
  SELECT doc_id, COUNT(*) AS n_fingerprints FROM fps GROUP BY 1
), postings AS (
  SELECT DISTINCT doc_id, val FROM fps
), rare AS (
  SELECT val FROM postings GROUP BY val HAVING COUNT(*) <= 50
), pruned AS (
  SELECT p.doc_id, p.val FROM postings p JOIN rare USING (val)
), pairs AS (
  SELECT a.doc_id AS doc_id, b.doc_id AS partner, COUNT(*) AS shared
  FROM pruned a JOIN pruned b ON a.val = b.val AND a.doc_id <> b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
), reach AS (
  WITH RECURSIVE walk(src, dst) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT w.src, p.partner FROM walk w JOIN pairs p ON w.dst = p.doc_id
  )
  SELECT src, MIN(dst) AS component_id FROM walk GROUP BY src
)
SELECT d.doc_id,
       CAST(COALESCE(n.n_fingerprints, 0) AS BIGINT) AS n_fingerprints,
       COALESCE(r.component_id, d.doc_id) AS canonical_id
FROM documents d
LEFT JOIN n_fp n USING (doc_id)
LEFT JOIN reach r ON r.src = d.doc_id
ORDER BY doc_id
""",
)
def winnowing_fingerprints_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    return dedup.winnowing_fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "t_closeness_report",
    # full (group x sensitive-domain) grid so absent cells contribute
    # |0 - ns*ng|; deviations are exact bigints, one final IEEE division
    """
WITH cells AS (
  SELECT event_type, user_id % 20 AS cohort,
         CAST(FLOOR(value) AS BIGINT) % 8 AS s, COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
), gm AS (
  SELECT event_type, cohort, SUM(n) AS ng FROM cells GROUP BY 1, 2
), sm AS (
  SELECT s, SUM(n) AS ns FROM cells GROUP BY 1
), tot AS (
  SELECT SUM(n) AS nn FROM cells
), terms AS (
  SELECT g.event_type, g.cohort, g.ng, t.nn,
         ABS(COALESCE(c.n, 0) * t.nn - s.ns * g.ng) AS dev
  FROM gm g CROSS JOIN sm s CROSS JOIN tot t
  LEFT JOIN cells c
    ON c.event_type = g.event_type AND c.cohort = g.cohort AND c.s = s.s
), grp AS (
  SELECT event_type, cohort, MAX(ng) AS n, MAX(nn) AS nn, SUM(dev) AS dev_u
  FROM terms GROUP BY 1, 2
)
SELECT event_type, CAST(cohort AS BIGINT) AS cohort, CAST(n AS BIGINT) AS n,
       FLOOR(dev_u / (2.0 * n * nn) * 1e6 + 0.5) / 1e6 AS tvd,
       dev_u / (2.0 * n * nn) > 0.2 AS breach
FROM grp ORDER BY event_type, cohort
""",
)
def t_closeness_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007 —
    public method) with total-variation distance: for each
    quasi-identifier class (event_type x user cohort), how far the
    class's sensitive-attribute distribution (bucketed value) sits
    from the global distribution — the release gate that catches what
    k-anonymity (class SIZE) and l-diversity (class CARDINALITY) miss:
    a large, diverse class can still leak by being skewed.

    Determinism: TVD sums |n_gs*N - n_s*N_g| as exact bigints over the
    FULL group x sensitive-domain grid (absent cells contribute
    |0 - n_s*N_g|); one IEEE division at the end.

    Plan shape: one partial-agg shuffle to the (group, s) census; the
    grid, margins, and TVD algebra run on census-bounded relations
    (|groups| x |s-domain| cells), never rows. Linear at 100 TB."""
    events = load_events(spark, sf_dir)
    cells = events.groupBy(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(20)).alias("cohort"),
        F.pmod(F.floor(F.col("value")).cast("long"), F.lit(8)).alias("s"),
    ).agg(F.count("*").alias("n"))
    gm = cells.groupBy("event_type", "cohort").agg(F.sum("n").alias("ng"))
    sm = cells.groupBy("s").agg(F.sum("n").alias("ns"))
    tot = cells.agg(F.sum("n").alias("nn"))
    grid = gm.join(F.broadcast(sm)).join(F.broadcast(tot))
    terms = grid.join(
        cells, ["event_type", "cohort", "s"], "left"
    ).select(
        "event_type",
        "cohort",
        "ng",
        "nn",
        F.abs(
            F.coalesce(F.col("n"), F.lit(0)) * F.col("nn")
            - F.col("ns") * F.col("ng")
        ).alias("dev"),
    )
    grp = terms.groupBy("event_type", "cohort").agg(
        F.max("ng").alias("n"), F.max("nn").alias("nn"), F.sum("dev").alias("dev_u")
    )
    tvd_raw = F.col("dev_u") / (F.lit(2.0) * F.col("n") * F.col("nn"))
    return grp.select(
        "event_type",
        F.col("cohort").cast("long").alias("cohort"),
        F.col("n").cast("long").alias("n"),
        (F.floor(tvd_raw * 1e6 + F.lit(0.5)) / 1e6).alias("tvd"),
        (tvd_raw > 0.2).alias("breach"),
    ).orderBy("event_type", "cohort")


@register(
    "fdr_bh_correction",
    # Welch z from exact centi-unit integer moments; surrogate
    # two-sided p = 1 - |z|/sqrt(z^2+1) (rational, engine-stable — no
    # erf in either engine's stable subset); BH step-up at alpha=0.1
    """
WITH m AS (
  SELECT event_type,
         COUNT(CASE WHEN event_id % 2 = 0 THEN 1 END) AS na,
         SUM(CASE WHEN event_id % 2 = 0 THEN vu ELSE 0 END) AS sa,
         SUM(CASE WHEN event_id % 2 = 0 THEN vu * vu ELSE 0 END) AS qa,
         COUNT(CASE WHEN event_id % 2 <> 0 THEN 1 END) AS nb,
         SUM(CASE WHEN event_id % 2 <> 0 THEN vu ELSE 0 END) AS sb,
         SUM(CASE WHEN event_id % 2 <> 0 THEN vu * vu ELSE 0 END) AS qb
  FROM (SELECT event_type, event_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vu FROM events)
  GROUP BY 1
), z AS (
  SELECT event_type,
         (sa / CAST(na AS DOUBLE) - sb / CAST(nb AS DOUBLE))
         / sqrt((qa - sa / CAST(na AS DOUBLE) * sa) / (na - 1) / na
              + (qb - sb / CAST(nb AS DOUBLE) * sb) / (nb - 1) / nb) AS zval
  FROM m
), p AS (
  SELECT event_type, zval,
         1.0 - ABS(zval) / sqrt(zval * zval + 1.0) AS pv
  FROM z
), ranked AS (
  SELECT event_type, zval, pv,
         ROW_NUMBER() OVER (ORDER BY pv, event_type) AS r,
         COUNT(*) OVER () AS m
  FROM p
), ks AS (
  SELECT COALESCE(MAX(CASE WHEN pv <= r * 0.1 / m THEN r END), 0) AS kstar
  FROM ranked
)
SELECT event_type,
       FLOOR(zval * 1e4 + 0.5) / 1e4 AS z,
       FLOOR(pv * 1e6 + 0.5) / 1e6 AS p_surrogate,
       CAST(r AS BIGINT) AS rank,
       r <= (SELECT kstar FROM ks) AS rejected
FROM ranked ORDER BY rank
""",
)
def fdr_bh_correction_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR step-up correction (Benjamini & Hochberg
    1995 — public method) across the per-event-type A/B mean tests: the
    multiple-testing guard an experimentation pipeline applies before
    declaring winners across many metrics. Welch z-statistics come
    from exact centi-unit integer moments; the two-sided p-value uses
    the rational surrogate CDF p = 1 - |z|/sqrt(z^2+1) (monotone in
    |z|; documented stand-in — neither engine has erf in the
    bit-stable subset, and BH consumes only the p ORDERING and
    threshold comparisons, both preserved). Step-up: reject ranks
    <= k* = max{r : p_(r) <= r*alpha/m} at alpha = 0.1.

    Determinism: integer moments are exact; z/p are fixed IEEE
    sequences (sqrt is correctly rounded per IEEE-754); the step-up
    scan runs on the metric census (|event_type| rows).

    Plan shape: ONE partial-agg shuffle to per-metric moments; the BH
    order statistics run on the bounded metric relation. At 100 TB the
    shuffle carries m metric rows, never events."""
    events = load_events(spark, sf_dir)
    vu = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    a = F.col("event_id") % 2 == 0
    m = events.select("event_type", a.alias("is_a"), vu.alias("vu")).groupBy(
        "event_type"
    ).agg(
        F.count(F.when(F.col("is_a"), 1)).alias("na"),
        F.sum(F.when(F.col("is_a"), F.col("vu")).otherwise(0)).alias("sa"),
        F.sum(F.when(F.col("is_a"), F.col("vu") * F.col("vu")).otherwise(0)).alias(
            "qa"
        ),
        F.count(F.when(~F.col("is_a"), 1)).alias("nb"),
        F.sum(F.when(~F.col("is_a"), F.col("vu")).otherwise(0)).alias("sb"),
        F.sum(F.when(~F.col("is_a"), F.col("vu") * F.col("vu")).otherwise(0)).alias(
            "qb"
        ),
    )
    na_d = F.col("na").cast("double")
    nb_d = F.col("nb").cast("double")
    zval = (F.col("sa") / na_d - F.col("sb") / nb_d) / F.sqrt(
        (F.col("qa") - F.col("sa") / na_d * F.col("sa"))
        / (F.col("na") - 1)
        / F.col("na")
        + (F.col("qb") - F.col("sb") / nb_d * F.col("sb"))
        / (F.col("nb") - 1)
        / F.col("nb")
    )
    z = m.select("event_type", zval.alias("zval"))
    pv = F.lit(1.0) - F.abs(F.col("zval")) / F.sqrt(
        F.col("zval") * F.col("zval") + F.lit(1.0)
    )
    p = z.select("event_type", "zval", pv.alias("pv"))
    wr = Window.orderBy("pv", "event_type")
    ranked = p.select(
        "event_type",
        "zval",
        "pv",
        F.row_number().over(wr).alias("r"),
        F.count("*").over(Window.partitionBy()).alias("m"),
    )
    ranked = ranked.withColumn(
        "kstar",
        F.coalesce(
            F.max(
                F.when(
                    F.col("pv") <= F.col("r") * 0.1 / F.col("m"), F.col("r")
                )
            ).over(Window.partitionBy()),
            F.lit(0),
        ),
    )
    return ranked.select(
        "event_type",
        (F.floor(F.col("zval") * 1e4 + F.lit(0.5)) / 1e4).alias("z"),
        (F.floor(F.col("pv") * 1e6 + F.lit(0.5)) / 1e6).alias("p_surrogate"),
        F.col("r").cast("long").alias("rank"),
        (F.col("r") <= F.col("kstar")).alias("rejected"),
    ).orderBy("rank")


@register(
    "cuped_adjustment",
    # exact centi-unit integer moments (bigint-safe through sf0.1;
    # the sf1+ path is DECIMAL(38) sums — same algebra); theta/xbar
    # are a broadcast one-row model; arm means adjust algebraically
    # (mean(yadj) = ybar_arm - theta*(xbar_arm - xbar)) so no
    # order-nondeterministic double sums exist anywhere
    """
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN vu ELSE 0 END) AS x,
         SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN vu ELSE 0 END) AS y
  FROM (SELECT user_id, ts,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS vu FROM events)
  GROUP BY 1
), g AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM per_user
), model AS (
  SELECT CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
         CAST(sx AS DOUBLE) / n AS xbar,
         CAST(n * sxy - sx * sy AS DOUBLE)
           * CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE)
           / CAST(n * syy - sy * sy AS DOUBLE) AS var_reduction
  FROM g
), arms AS (
  SELECT arm, COUNT(*) AS n_users, SUM(x) AS sxa, SUM(y) AS sya
  FROM per_user GROUP BY arm
)
SELECT CAST(a.arm AS BIGINT) AS arm, CAST(a.n_users AS BIGINT) AS n_users,
       FLOOR(CAST(a.sya AS DOUBLE) / a.n_users / 100.0 * 1e6 + 0.5) / 1e6
         AS mean_y,
       FLOOR((CAST(a.sya AS DOUBLE) / a.n_users
              - m.theta * (CAST(a.sxa AS DOUBLE) / a.n_users - m.xbar))
             / 100.0 * 1e6 + 0.5) / 1e6 AS mean_y_cuped,
       FLOOR(m.theta * 1e6 + 0.5) / 1e6 AS theta,
       FLOOR(m.var_reduction * 1e6 + 0.5) / 1e6 AS var_reduction
FROM arms a CROSS JOIN model m ORDER BY arm
""",
)
def cuped_adjustment_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013
    — public method) for the A/B report: per user, Y = post-cutoff
    spend and the covariate X = PRE-cutoff spend; theta = cov(X,Y)/
    var(X) fitted on the pooled population; each arm's adjusted mean
    is ybar_arm - theta*(xbar_arm - xbar). var_reduction is the
    achieved corr(X,Y)^2 = cov^2/(varX*varY).

    Determinism: ALL sums are exact centi-unit bigints (Spark's
    double-sum is accumulation-order-nondeterministic, so the per-user
    adjusted values are never summed as floats — the arm-mean
    adjustment is applied ALGEBRAICALLY from integer arm sums);
    theta/xbar/var_reduction are fixed IEEE sequences on a one-row
    relation.

    Plan shape: one shuffle on user_id (the per-subject table), one
    partial-agg pass each for the global-moment row and the 2-row arm
    relation; the model row broadcasts. At 100 TB: linear, two
    map-combine shuffles, no window over rows."""
    events = load_events(spark, sf_dir)
    cutoff = F.lit("2024-01-16").cast("timestamp")
    vu = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    per_user = events.select(
        "user_id", "ts", vu.alias("vu")
    ).groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, F.col("vu")).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("ts") >= cutoff, F.col("vu")).otherwise(0)).alias("y"),
    ).withColumn("arm", F.pmod(F.col("user_id"), F.lit(2)))
    g = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    model = g.select(
        (cov / varx).alias("theta"),
        (F.col("sx").cast("double") / F.col("n")).alias("xbar"),
        (cov * cov / varx / vary).alias("var_reduction"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("x").alias("sxa"),
        F.sum("y").alias("sya"),
    )
    out = arms.join(F.broadcast(model))
    mean_y_raw = F.col("sya").cast("double") / F.col("n_users")
    mean_x_raw = F.col("sxa").cast("double") / F.col("n_users")
    return out.select(
        F.col("arm").cast("long").alias("arm"),
        F.col("n_users").cast("long").alias("n_users"),
        (F.floor(mean_y_raw / 100.0 * 1e6 + F.lit(0.5)) / 1e6).alias("mean_y"),
        (
            F.floor(
                (mean_y_raw - F.col("theta") * (mean_x_raw - F.col("xbar")))
                / 100.0
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("mean_y_cuped"),
        (F.floor(F.col("theta") * 1e6 + F.lit(0.5)) / 1e6).alias("theta"),
        (F.floor(F.col("var_reduction") * 1e6 + F.lit(0.5)) / 1e6).alias(
            "var_reduction"
        ),
    ).orderBy("arm")


@register(
    "join_lateral_topk",
    # DuckDB's lateral is the comma form; same correlation, same
    # (o_totalprice DESC, o_orderkey) tie-break, LIMIT 3
    """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
""",
)
def join_lateral_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — the SQL
    top-N-per-group surface (every-customer top-3 orders by price).
    Spark 4 DECORRELATES this (DecorrelateInnerQuery): the plan is a
    rank-window over a single orders shuffle keyed on o_custkey, not
    N per-customer probes — the declarative form and the hand-written
    window top-k (top_k_per_group_agg) converge to the same physical
    shape, which is the point of registering the SQL spelling.

    Plan shape at 100 TB: one shuffle of orders on custkey feeding the
    rank filter, then the join back to customer — no per-row
    subquery execution, no driver loop."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


@register(
    "holt_linear_smoothing",
    # recursive CTE replays the identical IEEE recurrence per type:
    # l' = 0.5*y + 0.5*(l+b); b' = 0.3*(l'-l) + 0.7*b (expressions
    # repeated verbatim so the float sequences match bit-for-bit)
    """
WITH RECURSIVE census AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS y,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(ts AS DATE)) AS rn
  FROM events GROUP BY 1, 2
), h AS (
  SELECT event_type, day, y, rn, y AS l, CAST(0.0 AS DOUBLE) AS b
  FROM census WHERE rn = 1
  UNION ALL
  SELECT c.event_type, c.day, c.y, c.rn,
         0.5 * c.y + 0.5 * (h.l + h.b) AS l,
         0.3 * ((0.5 * c.y + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b AS b
  FROM h JOIN census c
    ON c.event_type = h.event_type AND c.rn = h.rn + 1
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, CAST(y AS BIGINT) AS y,
       FLOOR(l * 1e6 + 0.5) / 1e6 AS level,
       FLOOR(b * 1e6 + 0.5) / 1e6 AS trend,
       FLOOR(COALESCE(LAG(l) OVER w + LAG(b) OVER w, y) * 1e6 + 0.5) / 1e6
         AS fitted
FROM h
WINDOW w AS (PARTITION BY event_type ORDER BY day)
ORDER BY event_type, day
""",
)
def holt_linear_smoothing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing per event-type
    daily series — level + trend recursion (alpha=0.5, beta=0.3), the
    classic short-horizon forecaster a metrics pipeline fits next to
    the seasonal decomposition. fitted(t) is the one-step-ahead
    forecast l(t-1) + b(t-1).

    The recurrence is inherently sequential, so it runs WHERE the data
    is small: events aggregate to a (type, day) census (one partial-agg
    shuffle, |types| x |days| cells); each type's series packs into a
    sorted array (broadcast) and row t's state is a left fold over its
    prefix — O(days^2) folds on a <=31-element array, zero Python. At
    100 TB the corpus-size term is the census shuffle; the fold cost
    is unchanged.

    Determinism: the fold is a fixed IEEE sequence (mirrored verbatim
    in the oracle's recursive CTE); counts are exact; outputs floored
    at 1e-6."""
    events = load_events(spark, sf_dir)
    census = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("double").alias("y"))
    wrn = Window.partitionBy("event_type").orderBy("day")
    census = census.withColumn("rn", F.row_number().over(wrn))
    packed = census.groupBy("event_type").agg(
        F.expr("sort_array(collect_list(struct(rn, y)))").alias("ys")
    )
    folded = census.join(F.broadcast(packed), "event_type").withColumn(
        "st",
        F.expr(
            """
            aggregate(
              slice(ys, 2, rn - 1),
              named_struct('l', element_at(ys, 1).y, 'b', CAST(0.0 AS DOUBLE)),
              (a, e) -> named_struct(
                'l', 0.5 * e.y + 0.5 * (a.l + a.b),
                'b', 0.3 * ((0.5 * e.y + 0.5 * (a.l + a.b)) - a.l) + 0.7 * a.b))
            """
        ),
    )
    wl = Window.partitionBy("event_type").orderBy("day")
    fitted = F.coalesce(
        F.lag("st.l").over(wl) + F.lag("st.b").over(wl), F.col("y")
    )
    return folded.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("y").cast("long").alias("y"),
        (F.floor(F.col("st.l") * 1e6 + F.lit(0.5)) / 1e6).alias("level"),
        (F.floor(F.col("st.b") * 1e6 + F.lit(0.5)) / 1e6).alias("trend"),
        (F.floor(fitted * 1e6 + F.lit(0.5)) / 1e6).alias("fitted"),
    ).orderBy("event_type", "day")


@register(
    "mann_kendall_trend",
    # S from the i<j pair census; tie-corrected variance in exact
    # 18ths; z's three-way branch on integer S
    """
WITH census AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
  FROM events GROUP BY 1, 2
), s AS (
  SELECT a.event_type,
         SUM(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS s
  FROM census a JOIN census b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY 1
), n AS (
  SELECT event_type, COUNT(*) AS n FROM census GROUP BY 1
), ties AS (
  SELECT event_type, SUM(t * (t - 1) * (2 * t + 5)) AS tie18
  FROM (SELECT event_type, y, COUNT(*) AS t FROM census GROUP BY 1, 2)
  GROUP BY 1
), v AS (
  SELECT n.event_type, n.n, s.s,
         n.n * (n.n - 1) * (2 * n.n + 5) - COALESCE(t.tie18, 0) AS var18
  FROM n JOIN s USING (event_type) LEFT JOIN ties t USING (event_type)
)
SELECT event_type, CAST(n AS BIGINT) AS n_days, CAST(s AS BIGINT) AS s,
       CAST(var18 AS BIGINT) AS var18,
       FLOOR(CASE WHEN s > 0 THEN (s - 1) / sqrt(var18 / 18.0)
                  WHEN s < 0 THEN (s + 1) / sqrt(var18 / 18.0)
                  ELSE 0.0 END * 1e4 + 0.5) / 1e4 AS z,
       CASE WHEN s > 0 AND (s - 1) / sqrt(var18 / 18.0) > 1.96
              THEN 'increasing'
            WHEN s < 0 AND (s + 1) / sqrt(var18 / 18.0) < -1.96
              THEN 'decreasing'
            ELSE 'none' END AS trend
FROM v ORDER BY event_type
""",
)
def mann_kendall_trend_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test (Mann 1945, Kendall 1975 — public
    method) per event-type daily series: S = sum over day pairs i<j of
    sign(y_j - y_i), tie-corrected variance var(S) = [n(n-1)(2n+5) -
    sum_t t(t-1)(2t+5)]/18, z with the +-1 continuity correction —
    the distribution-free 'is this metric trending?' monitor that
    complements theil_sen_trend's slope ESTIMATE with a significance
    CALL.

    Determinism: S, var18 are exact integers from the census pair
    join; z is one IEEE division over a correctly-rounded sqrt.

    Plan shape: one partial-agg shuffle to the (type, day) census;
    the pair join, tie census, and variance run over |types| x |days|
    cells (<=155 rows) — the self-join is census-bounded exactly like
    theil_sen_trend. Linear at 100 TB."""
    events = load_events(spark, sf_dir)
    census = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("y"))
    a, b = census.alias("a"), census.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.y") > F.col("a.y"), 1)
                .when(F.col("b.y") < F.col("a.y"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    n = census.groupBy("event_type").agg(F.count("*").alias("n"))
    ties = (
        census.groupBy("event_type", "y")
        .agg(F.count("*").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie18")
        )
    )
    v = (
        n.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n",
            "s",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie18"), F.lit(0))
            ).alias("var18"),
        )
    )
    denom = F.sqrt(F.col("var18") / 18.0)
    zraw = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / denom)
        .when(F.col("s") < 0, (F.col("s") + 1) / denom)
        .otherwise(F.lit(0.0))
    )
    return v.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("s"),
        F.col("var18").cast("long").alias("var18"),
        (F.floor(zraw * 1e4 + F.lit(0.5)) / 1e4).alias("z"),
        F.when((F.col("s") > 0) & ((F.col("s") - 1) / denom > 1.96), "increasing")
        .when((F.col("s") < 0) & ((F.col("s") + 1) / denom < -1.96), "decreasing")
        .otherwise("none")
        .alias("trend"),
    ).orderBy("event_type")


@register(
    "functional_dependency_audit",
    # five candidate FDs, each a (lhs -> count distinct rhs) census;
    # a key-side FD (n_name -> n_regionkey) anchors the 'holds' case
    """
WITH checks AS (
  SELECT 'part: p_name -> p_brand' AS fd, p_name AS k,
         COUNT(DISTINCT p_brand) AS nrhs FROM part GROUP BY 2
  UNION ALL
  SELECT 'part: p_brand -> p_size', p_brand,
         COUNT(DISTINCT p_size) FROM part GROUP BY 2
  UNION ALL
  SELECT 'orders: o_custkey -> o_orderpriority', CAST(o_custkey AS VARCHAR),
         COUNT(DISTINCT o_orderpriority) FROM orders GROUP BY 2
  UNION ALL
  SELECT 'lineitem: l_orderkey -> l_returnflag', CAST(l_orderkey AS VARCHAR),
         COUNT(DISTINCT l_returnflag) FROM lineitem GROUP BY 2
  UNION ALL
  SELECT 'nation: n_name -> n_regionkey', n_name,
         COUNT(DISTINCT n_regionkey) FROM nation GROUP BY 2
)
SELECT fd, CAST(COUNT(*) AS BIGINT) AS n_keys,
       COUNT(CASE WHEN nrhs > 1 THEN 1 END) AS n_violating_keys,
       CAST(MAX(nrhs) AS BIGINT) AS max_rhs_per_key,
       MAX(nrhs) = 1 AS holds
FROM checks GROUP BY fd ORDER BY fd
""",
)
def functional_dependency_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery/audit: for each candidate FD
    lhs -> rhs, count determinant values whose dependent is not unique
    — the data-profiling primitive behind schema inference, key
    detection, and denormalization safety checks (does this column
    RIDE on that one?).

    Plan shape: each FD is one partial-agg shuffle keyed on its lhs
    (count-distinct rhs per key), reduced to a single summary row
    map-side; the union is 5 rows. Per-FD cost is one exchange at any
    scale; FDs over different tables scan independently (column-pruned
    to exactly lhs+rhs)."""

    def check(df: DataFrame, fd: str, lhs: str, rhs: str) -> DataFrame:
        per_key = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("nrhs"))
        return per_key.agg(
            F.lit(fd).alias("fd"),
            F.count("*").cast("long").alias("n_keys"),
            F.count(F.when(F.col("nrhs") > 1, 1)).alias("n_violating_keys"),
            F.max("nrhs").cast("long").alias("max_rhs_per_key"),
            (F.max("nrhs") == 1).alias("holds"),
        )

    part = load_table(spark, sf_dir, "part")
    out = (
        check(part, "part: p_name -> p_brand", "p_name", "p_brand")
        .unionAll(check(part, "part: p_brand -> p_size", "p_brand", "p_size"))
        .unionAll(
            check(
                load_table(spark, sf_dir, "orders"),
                "orders: o_custkey -> o_orderpriority",
                "o_custkey",
                "o_orderpriority",
            )
        )
        .unionAll(
            check(
                load_table(spark, sf_dir, "lineitem"),
                "lineitem: l_orderkey -> l_returnflag",
                "l_orderkey",
                "l_returnflag",
            )
        )
        .unionAll(
            check(
                load_table(spark, sf_dir, "nation"),
                "nation: n_name -> n_regionkey",
                "n_name",
                "n_regionkey",
            )
        )
    )
    return out.orderBy("fd")


@register(
    "referential_integrity_audit",
    # one anti-join per FK edge; parent key sets are dimension-sized
    # (broadcast) except orders<-lineitem which is the big-big case
    """
WITH edges AS (
  SELECT 'lineitem.l_orderkey -> orders' AS fk,
         (SELECT COUNT(*) FROM lineitem) AS n_child,
         (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           AS n_orphans
  UNION ALL
  SELECT 'lineitem.l_partkey -> part',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
  UNION ALL
  SELECT 'lineitem.l_suppkey -> supplier',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
  UNION ALL
  SELECT 'orders.o_custkey -> customer',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'customer.c_nationkey -> nation',
         (SELECT COUNT(*) FROM customer),
         (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
            (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
  UNION ALL
  SELECT 'supplier.s_nationkey -> nation',
         (SELECT COUNT(*) FROM supplier),
         (SELECT COUNT(*) FROM supplier s WHERE NOT EXISTS
            (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
  UNION ALL
  SELECT 'nation.n_regionkey -> region',
         (SELECT COUNT(*) FROM nation),
         (SELECT COUNT(*) FROM nation n WHERE NOT EXISTS
            (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
)
SELECT fk, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_orphans AS BIGINT) AS n_orphans,
       FLOOR(n_orphans * 1e6 / n_child + 0.5) / 1e4 AS orphan_pct
FROM edges ORDER BY fk
""",
)
def referential_integrity_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity sweep over the star schema's seven FK
    edges: per edge, child row count + orphan count (children whose
    FK misses every parent key) via LEFT ANTI join — the load-time
    contract check a warehouse runs before exposing a snapshot
    (expectations_check covers single-table rules; this is the
    CROSS-table contract).

    Plan shape: dimension-parent edges anti-join against a BROADCAST
    parent key set; the lineitem->orders edge is the genuine big-big
    anti (one shuffle pair on orderkey). Counts reduce map-side; the
    output is 7 rows. orphan_pct is an exact scaled-integer ratio."""

    def edge(child: DataFrame, fk: str, ck: str, parent: DataFrame, pk: str,
             broadcast_parent: bool = True) -> DataFrame:
        keys = parent.select(pk).distinct()
        if broadcast_parent:
            keys = F.broadcast(keys)
        orphans = child.join(keys, child[ck] == keys[pk], "left_anti")
        return child.agg(F.count("*").alias("n_child")).crossJoin(
            orphans.agg(F.count("*").alias("n_orphans"))
        ).select(
            F.lit(fk).alias("fk"),
            F.col("n_child").cast("long").alias("n_child"),
            F.col("n_orphans").cast("long").alias("n_orphans"),
            (
                F.floor(F.col("n_orphans") * 1e6 / F.col("n_child") + F.lit(0.5))
                / 1e4
            ).alias("orphan_pct"),
        )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    out = (
        edge(li, "lineitem.l_orderkey -> orders", "l_orderkey", orders,
             "o_orderkey", broadcast_parent=False)
        .unionAll(edge(li, "lineitem.l_partkey -> part", "l_partkey",
                       load_table(spark, sf_dir, "part"), "p_partkey"))
        .unionAll(edge(li, "lineitem.l_suppkey -> supplier", "l_suppkey",
                       supp, "s_suppkey"))
        .unionAll(edge(orders, "orders.o_custkey -> customer", "o_custkey",
                       cust, "c_custkey", broadcast_parent=False))
        .unionAll(edge(cust, "customer.c_nationkey -> nation", "c_nationkey",
                       nat, "n_nationkey"))
        .unionAll(edge(supp, "supplier.s_nationkey -> nation", "s_nationkey",
                       nat, "n_nationkey"))
        .unionAll(edge(nat, "nation.n_regionkey -> region", "n_regionkey",
                       load_table(spark, sf_dir, "region"), "r_regionkey"))
    )
    return out.orderBy("fk")


@register(
    "embedding_drift_report",
    # cohort centroids ride the embedding_centroids convention
    # (ROUND(AVG,4) -> exact scaled ints); distances are integer
    # algebra + correctly-rounded sqrt
    """
WITH cent AS (
  SELECT label, vec_id % 2 AS cohort, i AS pos,
         CAST(ROUND(ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 4) * 1e4)
              AS BIGINT) AS iu
  FROM embeddings, generate_series(1, 64) t(i)
  GROUP BY 1, 2, 3
), sizes AS (
  SELECT label,
         COUNT(DISTINCT CASE WHEN vec_id % 2 = 0 THEN vec_id END) AS n_a,
         COUNT(DISTINCT CASE WHEN vec_id % 2 <> 0 THEN vec_id END) AS n_b
  FROM embeddings GROUP BY 1
), paired AS (
  SELECT a.label,
         SUM((a.iu - b.iu) * (a.iu - b.iu)) AS l2,
         SUM(a.iu * b.iu) AS dot,
         SUM(a.iu * a.iu) AS na2,
         SUM(b.iu * b.iu) AS nb2
  FROM cent a JOIN cent b ON a.label = b.label AND a.pos = b.pos
  WHERE a.cohort = 0 AND b.cohort = 1
  GROUP BY 1
)
SELECT p.label, CAST(s.n_a AS BIGINT) AS n_a, CAST(s.n_b AS BIGINT) AS n_b,
       FLOOR(sqrt(l2) / 1e4 * 1e6 + 0.5) / 1e6 AS l2_shift,
       FLOOR(dot / sqrt(na2) / sqrt(nb2) * 1e6 + 0.5) / 1e6 AS cos_centroids
FROM paired p JOIN sizes s ON p.label = s.label
ORDER BY p.label
""",
)
def embedding_drift_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: split each label's vectors into two
    cohorts (vec_id parity stands in for the before/after snapshot),
    compute both cohort centroids, and report the centroid L2 shift
    and cosine similarity — the check a feature-store pipeline runs
    when a new encoder version lands (centroids moving = downstream
    ANN indexes and thresholds need re-tuning).

    Determinism: centroids take the embedding_centroids convention
    (ROUND(AVG, 4)) then quantize to exact 1e-4 ints, so all distance
    algebra is integer sums + one correctly-rounded sqrt per term.

    Plan shape: posexplode + partial-agg shuffle bounded by
    |labels| x 2 x dim cells (the label_centroids shape — shuffle
    carries partial sums, never vectors); the pairing join and the
    report run on that census. Linear at 100 TB."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label",
        F.pmod(F.col("vec_id"), F.lit(2)).alias("cohort"),
        F.posexplode(F.transform("embedding", lambda v: v.cast("double"))).alias(
            "pos0", "x"
        ),
    )
    cent = (
        exploded.groupBy("label", "cohort", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.round(F.round(F.avg("x"), 4) * 1e4)
            .cast("long")
            .alias("iu")
        )
    )
    sizes = emb.groupBy("label").agg(
        F.countDistinct(
            F.when(F.pmod(F.col("vec_id"), F.lit(2)) == 0, F.col("vec_id"))
        ).alias("n_a"),
        F.countDistinct(
            F.when(F.pmod(F.col("vec_id"), F.lit(2)) != 0, F.col("vec_id"))
        ).alias("n_b"),
    )
    a = cent.filter(F.col("cohort") == 0).select(
        "label", "pos", F.col("iu").alias("ia")
    )
    b = cent.filter(F.col("cohort") == 1).select(
        "label", "pos", F.col("iu").alias("ib")
    )
    paired = (
        a.join(b, ["label", "pos"])
        .groupBy("label")
        .agg(
            F.sum((F.col("ia") - F.col("ib")) * (F.col("ia") - F.col("ib"))).alias(
                "l2"
            ),
            F.sum(F.col("ia") * F.col("ib")).alias("dot"),
            F.sum(F.col("ia") * F.col("ia")).alias("na2"),
            F.sum(F.col("ib") * F.col("ib")).alias("nb2"),
        )
    )
    return (
        paired.join(sizes, "label")
        .select(
            "label",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.floor(F.sqrt(F.col("l2")) / 1e4 * 1e6 + F.lit(0.5)) / 1e6
            ).alias("l2_shift"),
            (
                F.floor(
                    F.col("dot")
                    / F.sqrt(F.col("na2"))
                    / F.sqrt(F.col("nb2"))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("cos_centroids"),
        )
        .orderBy("label")
    )


@register(
    "streaming_topk_windowed",
    # batch mirror of the watermarked windowed counts + per-window
    # rank(3) with the (n_events DESC, event_type) tie-break
    """
WITH counts AS (
  SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT window_start,
       CAST(ROW_NUMBER() OVER (PARTITION BY window_start
                               ORDER BY n_events DESC, event_type) AS INT)
         AS rank,
       event_type, n_events
FROM counts
QUALIFY rank <= 3
ORDER BY window_start, rank
""",
)
def streaming_topk_windowed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-window top-k: the watermarked tumbling-window
    count stream drained with Trigger.AvailableNow, then ranked to the
    top-3 event types per hour — the 'trending now' board. The rank
    runs OVER THE MATERIALIZED WINDOW AGGREGATE (complete-mode output
    is |windows| x |types| rows), not the stream: per-window state in
    flight stays the watermark-bounded count state, and the top-k is a
    census-sized window pass per drain — the production shape is this
    exact rank in the foreachBatch sink."""
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    mat = jobs.run_available_now(
        jobs.windowed_counts(stream), "streaming_topk_windowed"
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    return (
        mat.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("window_start", "rank", "event_type", "n_events")
        .orderBy("window_start", "rank")
    )


@register(
    "isotonic_calibration",
    # same quality-model CTE; minimax identity over the bin census:
    # iso(t) = max_{i<=t} min_{j>=t} wavg(i..j), each wavg ONE division
    f"""
WITH f AS (
  SELECT doc_id, lang,
         len({_TOKS})::DOUBLE AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         len(list_filter({_TOKS}, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
           AS n_stop,
         (length(text) - length(replace(text, '.', '')))::DOUBLE AS n_dots
  FROM documents
), wts AS (
  SELECT i.i AS i,
         2 * (CAST(concat('0x', substr(md5('qw:' || i.i), 1, 15)) AS UBIGINT)
              / 1152921504606846976.0) - 1 AS w
  FROM (SELECT UNNEST(range(5)) AS i) i
), z AS (
  SELECT f.doc_id, f.lang = 'en' AS is_pos,
         (SELECT w FROM wts WHERE i = 0) * (n_tokens / 100.0)
         + (SELECT w FROM wts WHERE i = 1) * (n_stop / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 2) * (n_chars / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 3) * (n_dots / (n_chars + 1.0))
         + (SELECT w FROM wts WHERE i = 4) AS z
  FROM f
), census AS (
  SELECT CAST(FLOOR(CAST(FLOOR(z * 1e4 + 0.5) AS BIGINT) / 250.0) AS BIGINT)
           AS bin,
         COUNT(*) AS n,
         COUNT(CASE WHEN is_pos THEN 1 END) AS n_pos
  FROM z GROUP BY 1
), pre AS (
  SELECT bin, n, n_pos,
         ROW_NUMBER() OVER (ORDER BY bin) AS rn,
         SUM(n) OVER (ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         SUM(n_pos) OVER (ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
  FROM census
), inner_min AS (
  SELECT t.bin, t.n, t.n_pos, t.rn AS t_rn, i.rn AS i_rn,
         MIN(CAST(j.cp - (i.cp - i.n_pos) AS DOUBLE)
             / CAST(j.cn - (i.cn - i.n) AS DOUBLE)) AS mn
  FROM pre t
  JOIN pre i ON i.rn <= t.rn
  JOIN pre j ON j.rn >= t.rn
  GROUP BY 1, 2, 3, 4, 5
)
SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       FLOOR(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS pos_rate,
       FLOOR(MAX(mn) * 1e6 + 0.5) / 1e6 AS iso_fit
FROM inner_min GROUP BY bin, n, n_pos ORDER BY bin
""",
)
def isotonic_calibration_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.isotonic_calibration(load_table(spark, sf_dir, "documents"))


@register(
    "logrank_test",
    # oracle computes per-arm at-risk sets by direct census-scale
    # counting (values identical to the engine's LOCF construction);
    # O/E/V terms quantize at 1e-9 before summation on both engines
    """
WITH per_user AS (
  SELECT user_id, MIN(ts) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
  FROM events GROUP BY 1
), subj AS (
  SELECT user_id % 2 AS arm,
         CASE WHEN tp IS NOT NULL AND dh <= 72 THEN dh ELSE 72 END AS t,
         CASE WHEN tp IS NOT NULL AND dh <= 72 THEN 1 ELSE 0 END AS event
  FROM (SELECT user_id, tp,
               (epoch_us(tp) - epoch_us(t0)) // 3600000000 AS dh
        FROM per_user)
), times AS (
  SELECT DISTINCT t FROM subj
), cells AS (
  SELECT ti.t,
         (SELECT COALESCE(SUM(s.event), 0) FROM subj s
          WHERE s.arm = 0 AND s.t = ti.t) AS d0,
         (SELECT COALESCE(SUM(s.event), 0) FROM subj s
          WHERE s.arm = 1 AND s.t = ti.t) AS d1,
         (SELECT COUNT(*) FROM subj s
          WHERE s.arm = 0 AND s.t >= ti.t) AS n0,
         (SELECT COUNT(*) FROM subj s
          WHERE s.arm = 1 AND s.t >= ti.t) AS n1
  FROM times ti
), terms AS (
  SELECT d0,
         CAST(FLOOR(CAST(d AS DOUBLE) * frac0 * 1e9 + 0.5) AS BIGINT) AS e0q,
         CAST(FLOOR(CAST(d AS DOUBLE) * frac0 * (1.0 - frac0)
                    * CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                    * 1e9 + 0.5) AS BIGINT) AS vq
  FROM (SELECT d0, d1, d0 + d1 AS d, n0 + n1 AS n,
               CAST(n0 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS frac0
        FROM cells)
  WHERE d > 0 AND n > 1
), agg AS (
  SELECT COUNT(*) AS n_times, SUM(d0) AS o0, SUM(e0q) AS se0, SUM(vq) AS sv
  FROM terms
)
SELECT CAST(n_times AS BIGINT) AS n_times, CAST(o0 AS BIGINT) AS o0,
       FLOOR(se0 / 1e9 * 1e6 + 0.5) / 1e6 AS e0,
       FLOOR((CAST(o0 AS DOUBLE) - se0 / 1e9) * (CAST(o0 AS DOUBLE) - se0 / 1e9)
             / (sv / 1e9) * 1e4 + 0.5) / 1e4 AS chi2,
       (CAST(o0 AS DOUBLE) - se0 / 1e9) * (CAST(o0 AS DOUBLE) - se0 / 1e9)
         / (sv / 1e9) > 3.841 AS significant
FROM agg
""",
)
def logrank_test_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.logrank_test(load_events(spark, sf_dir))


@register(
    "jackknife_ratio_ci",
    # delete-one-bucket ratio estimates quantized at 1e-4 BEFORE the
    # variance sum (exact ints end-to-end); se/CI are fixed IEEE
    """
WITH b AS (
  SELECT user_id % 32 AS g,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS s,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS c
  FROM events GROUP BY 1
), tot AS (
  SELECT COUNT(*) AS gn, SUM(s) AS st, SUM(c) AS ct FROM b
), rq AS (
  SELECT CAST(FLOOR(CAST(tot.st - b.s AS DOUBLE)
                    / CAST(tot.ct - b.c AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS r
  FROM b CROSS JOIN tot
), dev AS (
  SELECT SUM((t.gn * rq.r - s.srq) * (t.gn * rq.r - s.srq)) AS sumdev2
  FROM rq CROSS JOIN (SELECT SUM(r) AS srq FROM rq) s CROSS JOIN tot t
), fin AS (
  SELECT t.gn, CAST(t.st AS DOUBLE) / t.ct AS r_c,
         sqrt((t.gn - 1.0) / t.gn * CAST(d.sumdev2 AS DOUBLE)) / t.gn / 1e4
           AS se_c
  FROM tot t CROSS JOIN dev d
)
SELECT CAST(gn AS BIGINT) AS n_buckets,
       FLOOR(r_c / 100.0 * 1e6 + 0.5) / 1e6 AS ratio,
       FLOOR(se_c / 100.0 * 1e6 + 0.5) / 1e6 AS jk_se,
       FLOOR((r_c - 1.96 * se_c) / 100.0 * 1e6 + 0.5) / 1e6 AS ci_lo,
       FLOOR((r_c + 1.96 * se_c) / 100.0 * 1e6 + 0.5) / 1e6 AS ci_hi
FROM fin
""",
)
def jackknife_ratio_ci_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife CI (Quenouille/Tukey — public
    method) for a RATIO metric (purchase revenue per click), the
    estimator A/B platforms use because a ratio of sums has no simple
    closed-form variance: split users into 32 hash buckets, recompute
    the ratio with each bucket deleted, and take the jackknife
    variance of the 32 leave-one-out estimates.

    Determinism: bucket sums are exact centi-ints; each leave-one-out
    ratio quantizes at 1e-4 BEFORE the variance accumulation, so the
    deviation sum is exact integer algebra (a float sum over buckets
    would be order-nondeterministic); se/CI are fixed IEEE sequences.

    Plan shape: one partial-agg shuffle to 32 bucket rows; everything
    after is census algebra. The bucket count is the scale knob — at
    100 TB you'd use 256 buckets, still census-sized."""
    events = load_events(spark, sf_dir)
    vu = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    b = events.groupBy(F.pmod(F.col("user_id"), F.lit(32)).alias("g")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", vu).otherwise(0)
        ).alias("s"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c"),
    )
    tot = b.agg(
        F.count("*").alias("gn"), F.sum("s").alias("st"), F.sum("c").alias("ct")
    )
    rq = b.join(F.broadcast(tot)).select(
        F.floor(
            (F.col("st") - F.col("s")).cast("double")
            / (F.col("ct") - F.col("c")).cast("double")
            * 1e4
            + F.lit(0.5)
        )
        .cast("long")
        .alias("r"),
        "gn",
    )
    srq = rq.agg(F.sum("r").alias("srq"))
    dev = (
        rq.join(F.broadcast(srq))
        .select(
            ((F.col("gn") * F.col("r") - F.col("srq"))
             * (F.col("gn") * F.col("r") - F.col("srq"))).alias("d2")
        )
        .agg(F.sum("d2").alias("sumdev2"))
    )
    fin = tot.join(F.broadcast(dev)).select(
        "gn",
        (F.col("st").cast("double") / F.col("ct")).alias("r_c"),
        (
            F.sqrt(
                (F.col("gn") - F.lit(1.0))
                / F.col("gn")
                * F.col("sumdev2").cast("double")
            )
            / F.col("gn")
            / F.lit(1e4)
        ).alias("se_c"),
    )
    q = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return fin.select(
        F.col("gn").cast("long").alias("n_buckets"),
        q(F.col("r_c") / 100.0).alias("ratio"),
        q(F.col("se_c") / 100.0).alias("jk_se"),
        q((F.col("r_c") - 1.96 * F.col("se_c")) / 100.0).alias("ci_lo"),
        q((F.col("r_c") + 1.96 * F.col("se_c")) / 100.0).alias("ci_hi"),
    )


@register(
    "spearman_daily",
    # midranks doubled to stay integral (2mr = 2*min_rank + ties - 1);
    # Spearman = Pearson over exact midrank moments
    """
WITH census AS (
  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS x,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
  FROM orders GROUP BY 1
), ranked AS (
  SELECT 2 * RANK() OVER (ORDER BY x) + COUNT(*) OVER (PARTITION BY x) - 1
           AS a,
         2 * RANK() OVER (ORDER BY y) + COUNT(*) OVER (PARTITION BY y) - 1
           AS b
  FROM census
), m AS (
  SELECT COUNT(*) AS n, SUM(a) AS sa, SUM(b) AS sb, SUM(a * b) AS sab,
         SUM(a * a) AS saa, SUM(b * b) AS sbb
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_days,
       FLOOR(CAST(n * sab - sa * sb AS DOUBLE)
             / sqrt(CAST(n * saa - sa * sa AS DOUBLE))
             / sqrt(CAST(n * sbb - sb * sb AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS rho
FROM m
""",
)
def spearman_daily_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily order count and daily
    revenue — the robust monotone-association twin of agg_correlation's
    Pearson (rank-based, so outlier days can't dominate). Midranks are
    kept as exact integers by DOUBLING (2mr = 2*min_rank + ties - 1),
    so all correlation moments are exact and the only float ops are
    the final division over two correctly-rounded sqrts.

    Plan shape: one partial-agg shuffle to the day census (~30 cells);
    ranks and moments run on the census. Linear at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    census = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count("*").alias("x"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("y"),
    )
    ranked = census.select(
        (
            2 * F.rank().over(Window.orderBy("x"))
            + F.count("*").over(Window.partitionBy("x"))
            - 1
        ).alias("a"),
        (
            2 * F.rank().over(Window.orderBy("y"))
            + F.count("*").over(Window.partitionBy("y"))
            - 1
        ).alias("b"),
    )
    m = ranked.agg(
        F.count("*").alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
    )
    rho = (
        (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
        / F.sqrt((F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double"))
        / F.sqrt((F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double"))
    )
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        (F.floor(rho * 1e6 + F.lit(0.5)) / 1e6).alias("rho"),
    )


@register(
    "mrr_recall_eval",
    # binary relevance = contains ALL query terms; first-rank/hits
    # over the bm25 top-10 (same CTE as ndcg_eval's relevance census)
    _TOKS_CTE
    + """
, q(query_id, term) AS (
  VALUES (1,'hash'),(1,'join'),(2,'sort'),(2,'merge'),(3,'customer'),(3,'value')
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), tot AS (
  SELECT COUNT(*) AS s_tokens, COUNT(DISTINCT doc_id) AS n_docs FROM toks
), part AS (
  SELECT q.query_id, tf.doc_id,
         CAST(FLOOR(
           (LN(1.0 + (tot.n_docs - df.df + 0.5) / (df.df + 0.5))
            * (tf.tf * 2.2)
            / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / (tot.s_tokens / CAST(tot.n_docs AS DOUBLE))))))
           * 1e6 + 0.5) AS BIGINT) AS su
  FROM tf
  JOIN q USING (term)
  JOIN dl USING (doc_id)
  JOIN df USING (term)
  CROSS JOIN tot
), agg AS (
  SELECT query_id, doc_id, SUM(su) AS su FROM part GROUP BY query_id, doc_id
), ranked AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY su DESC, doc_id) AS rank
  FROM agg QUALIFY rank <= 10
), qsize AS (
  SELECT query_id, COUNT(*) AS n_terms FROM q GROUP BY 1
), fullrel AS (
  SELECT r.query_id, r.doc_id
  FROM (SELECT q.query_id, t.doc_id, COUNT(*) AS rel
        FROM (SELECT DISTINCT doc_id, term FROM toks) t JOIN q USING (term)
        GROUP BY 1, 2) r
  JOIN qsize USING (query_id)
  WHERE r.rel = qsize.n_terms
), nrel AS (
  SELECT query_id, COUNT(*) AS n_relevant FROM fullrel GROUP BY 1
), hits AS (
  SELECT r.query_id, MIN(r.rank) AS first_rank, COUNT(*) AS n_hits
  FROM ranked r JOIN fullrel f
    ON r.query_id = f.query_id AND r.doc_id = f.doc_id
  GROUP BY 1
)
SELECT n.query_id, CAST(n.n_relevant AS BIGINT) AS n_relevant,
       CAST(COALESCE(h.first_rank, 0) AS BIGINT) AS first_rank,
       FLOOR(CASE WHEN h.first_rank IS NOT NULL THEN 1.0 / h.first_rank
                  ELSE 0.0 END * 1e6 + 0.5) / 1e6 AS mrr,
       FLOOR(CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
             / CAST(n.n_relevant AS DOUBLE) * 1e6 + 0.5) / 1e6 AS recall_at_k
FROM nrel n LEFT JOIN hits h ON n.query_id = h.query_id
ORDER BY n.query_id
""",
)
def mrr_recall_eval_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.mrr_recall_eval(load_table(spark, sf_dir, "documents"))


@register(
    "welch_ttest",
    # exact centi-int moments per arm; every downstream float op is
    # the SAME fixed IEEE expression tree on both engines
    """
WITH st AS (
  SELECT user_id % 2 AS arm, COUNT(*) AS n,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS s1,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
             * CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS s2
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), j AS (
  SELECT a.n AS n0, a.s1 AS a1, a.s2 AS a2, b.n AS n1, b.s1 AS b1, b.s2 AS b2
  FROM st a, st b WHERE a.arm = 0 AND b.arm = 1
), c AS (
  SELECT n0, n1,
         CAST(a1 AS DOUBLE) / n0 AS m0, CAST(b1 AS DOUBLE) / n1 AS m1,
         (CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / n0) / (n0 - 1) AS v0,
         (CAST(b2 AS DOUBLE) - CAST(b1 AS DOUBLE) * b1 / n1) / (n1 - 1) AS v1
  FROM j
), t AS (
  SELECT n0, n1, m0, m1,
         (m1 - m0) / SQRT(v0 / n0 + v1 / n1) AS tstat,
         (v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1)
           / ((v0 / n0) * (v0 / n0) / (n0 - 1)
              + (v1 / n1) * (v1 / n1) / (n1 - 1)) AS dof
  FROM c
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       FLOOR(m0 / 100.0 * 1e4 + 0.5) / 1e4 AS mean0,
       FLOOR(m1 / 100.0 * 1e4 + 0.5) / 1e4 AS mean1,
       FLOOR(tstat * 1e4 + 0.5) / 1e4 AS t_stat,
       FLOOR(dof * 1e2 + 0.5) / 1e2 AS welch_df,
       ABS(tstat) > 1.96 AS significant
FROM t
""",
)
def welch_ttest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (Welch 1947 — public method)
    comparing mean purchase value between the user-parity arms — the
    continuous-metric complement of ab_test_report's conversion z-test
    (revenue metrics have unequal variances across arms; Student's
    pooled test would be wrong).

    Determinism: per-arm (n, sum, sum-of-squares) are exact centi-int
    moments; mean/variance/t/Welch-Satterthwaite df are a fixed IEEE
    expression tree evaluated identically on both engines.

    Plan shape: ONE partial-agg shuffle to 2 arm rows; the test itself
    is one-row algebra. Linear at 100 TB, no scale knob needed."""
    events = load_events(spark, sf_dir)
    vu = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    st = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.pmod(F.col("user_id"), F.lit(2)).alias("arm"))
        .agg(
            F.count("*").alias("n"),
            F.sum(vu).alias("s1"),
            F.sum(vu * vu).alias("s2"),
        )
    )
    a = st.filter(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("s1").alias("a1"), F.col("s2").alias("a2")
    )
    b = st.filter(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("s1").alias("b1"), F.col("s2").alias("b2")
    )
    j = a.join(F.broadcast(b))
    m0 = F.col("a1").cast("double") / F.col("n0")
    m1 = F.col("b1").cast("double") / F.col("n1")
    v0 = (
        F.col("a2").cast("double") - F.col("a1").cast("double") * F.col("a1") / F.col("n0")
    ) / (F.col("n0") - 1)
    v1 = (
        F.col("b2").cast("double") - F.col("b1").cast("double") * F.col("b1") / F.col("n1")
    ) / (F.col("n1") - 1)
    c = j.select("n0", "n1", m0.alias("m0"), m1.alias("m1"), v0.alias("v0"), v1.alias("v1"))
    tstat = (F.col("m1") - F.col("m0")) / F.sqrt(
        F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    )
    dof = (
        (F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1"))
        * (F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1"))
    ) / (
        (F.col("v0") / F.col("n0")) * (F.col("v0") / F.col("n0")) / (F.col("n0") - 1)
        + (F.col("v1") / F.col("n1")) * (F.col("v1") / F.col("n1")) / (F.col("n1") - 1)
    )
    t = c.select("n0", "n1", "m0", "m1", tstat.alias("tstat"), dof.alias("dof"))
    return t.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        (F.floor(F.col("m0") / 100.0 * 1e4 + F.lit(0.5)) / 1e4).alias("mean0"),
        (F.floor(F.col("m1") / 100.0 * 1e4 + F.lit(0.5)) / 1e4).alias("mean1"),
        (F.floor(F.col("tstat") * 1e4 + F.lit(0.5)) / 1e4).alias("t_stat"),
        (F.floor(F.col("dof") * 1e2 + F.lit(0.5)) / 1e2).alias("welch_df"),
        (F.abs(F.col("tstat")) > 1.96).alias("significant"),
    )


@register(
    "kendall_tau_daily",
    # concordant/discordant pair counts over the day census; the pair
    # relation is census^2/2 — bounded by distinct days, never by rows
    """
WITH census AS (
  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS x,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
  FROM orders GROUP BY 1
), p AS (
  SELECT a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by_
  FROM census a JOIN census b ON a.day < b.day
), cnt AS (
  SELECT COUNT(*) AS n0,
         SUM(CASE WHEN (ax - bx) * (ay - by_) > 0 THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN (ax - bx) * (ay - by_) < 0 THEN 1 ELSE 0 END) AS d,
         SUM(CASE WHEN ax = bx THEN 1 ELSE 0 END) AS tx,
         SUM(CASE WHEN ay = by_ THEN 1 ELSE 0 END) AS ty
  FROM p
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM census) AS n_days,
       CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
       FLOOR(CAST(c - d AS DOUBLE) / SQRT(CAST(n0 - tx AS DOUBLE))
             / SQRT(CAST(n0 - ty AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS tau_b
FROM cnt
""",
)
def kendall_tau_daily_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b (Kendall 1938 — public method) between daily order
    count and daily revenue — the pair-based monotone-association
    measure beside spearman_daily's rank-based rho (tau has a direct
    probabilistic reading: P(concordant) - P(discordant)).

    Determinism: all pair classifications and tie counts are exact
    integer comparisons on the centi-int census; tau_b is one fixed
    IEEE sequence over two correctly-rounded sqrts.

    Plan shape: one partial-agg shuffle to the ~2.4k-cell day census;
    the i<j pair relation (~2.9M cells) is a broadcast theta join over
    the CENSUS — its size depends on distinct days, not on fact rows,
    so it is flat at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    census = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count("*").alias("x"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("y"),
    )
    a = census.select(F.col("day").alias("ad"), F.col("x").alias("ax"), F.col("y").alias("ay"))
    b = census.select(F.col("day").alias("bd"), F.col("x").alias("bx"), F.col("y").alias("by_"))
    p = a.join(F.broadcast(b), F.col("ad") < F.col("bd"))
    cnt = p.agg(
        F.count("*").alias("n0"),
        F.sum(
            F.when((F.col("ax") - F.col("bx")) * (F.col("ay") - F.col("by_")) > 0, 1).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("ax") - F.col("bx")) * (F.col("ay") - F.col("by_")) < 0, 1).otherwise(0)
        ).alias("d"),
        F.sum(F.when(F.col("ax") == F.col("bx"), 1).otherwise(0)).alias("tx"),
        F.sum(F.when(F.col("ay") == F.col("by_"), 1).otherwise(0)).alias("ty"),
    )
    nd = census.agg(F.count("*").cast("long").alias("n_days"))
    tau = (
        (F.col("c") - F.col("d")).cast("double")
        / F.sqrt((F.col("n0") - F.col("tx")).cast("double"))
        / F.sqrt((F.col("n0") - F.col("ty")).cast("double"))
    )
    return cnt.join(F.broadcast(nd)).select(
        "n_days",
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        (F.floor(tau * 1e6 + F.lit(0.5)) / 1e6).alias("tau_b"),
    )


@register(
    "srm_check",
    # sample-ratio-mismatch guardrail: distinct users per arm vs the
    # designed 50/50 split, 1-df chi-square
    """
WITH pu AS (SELECT DISTINCT user_id, user_id % 2 AS arm FROM events),
st AS (SELECT arm, COUNT(*) AS n FROM pu GROUP BY 1),
j AS (
  SELECT a.n AS n0, b.n AS n1 FROM st a, st b WHERE a.arm = 0 AND b.arm = 1
), c AS (
  SELECT n0, n1, CAST(n0 + n1 AS DOUBLE) / 2.0 AS e FROM j
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       FLOOR(((n0 - e) * (n0 - e) / e + (n1 - e) * (n1 - e) / e) * 1e4 + 0.5)
         / 1e4 AS chi2,
       ((n0 - e) * (n0 - e) / e + (n1 - e) * (n1 - e) / e) > 3.841
         AS srm_detected
FROM c
""",
)
def srm_check_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check (Fabijan et al. 2019 — public
    method): the A/B platform guardrail that fires BEFORE any metric is
    read — if the observed user split deviates from the designed 50/50
    beyond chi-square noise, the assignment pipeline is broken and
    ab_test_report / welch_ttest / cuped_adjustment results are invalid.

    Plan shape: one distinct-user shuffle, then 2-row algebra.
    Determinism: counts are exact; chi2 is one fixed IEEE sequence."""
    events = load_events(spark, sf_dir)
    pu = events.select(
        "user_id", F.pmod(F.col("user_id"), F.lit(2)).alias("arm")
    ).distinct()
    st = pu.groupBy("arm").agg(F.count("*").alias("n"))
    a = st.filter(F.col("arm") == 0).select(F.col("n").alias("n0"))
    b = st.filter(F.col("arm") == 1).select(F.col("n").alias("n1"))
    c = a.join(F.broadcast(b)).select(
        "n0", "n1", ((F.col("n0") + F.col("n1")).cast("double") / 2.0).alias("e")
    )
    chi2 = (F.col("n0") - F.col("e")) * (F.col("n0") - F.col("e")) / F.col("e") + (
        F.col("n1") - F.col("e")
    ) * (F.col("n1") - F.col("e")) / F.col("e")
    return c.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        (F.floor(chi2 * 1e4 + F.lit(0.5)) / 1e4).alias("chi2"),
        (chi2 > 3.841).alias("srm_detected"),
    )


@register(
    "power_mde_report",
    # minimal detectable effect at 80% power / 5% alpha from the
    # observed base rate and arm sizes (z_a/2 + z_b = 2.801585)
    """
WITH pu AS (
  SELECT user_id, user_id % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
), st AS (SELECT arm, COUNT(*) AS n, SUM(conv) AS k FROM pu GROUP BY 1),
j AS (
  SELECT a.n AS n0, a.k AS k0, b.n AS n1, b.k AS k1
  FROM st a, st b WHERE a.arm = 0 AND b.arm = 1
), c AS (
  SELECT n0, n1,
         CAST(k0 + k1 AS DOUBLE) / (n0 + n1) AS p,
         CASE WHEN n0 < n1 THEN n0 ELSE n1 END AS nmin
  FROM j
), m AS (
  SELECT n0, n1, p, 2.801585 * SQRT(2.0 * p * (1.0 - p) / nmin) AS mde
  FROM c
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       FLOOR(p * 1e6 + 0.5) / 1e6 AS base_rate,
       FLOOR(mde * 1e6 + 0.5) / 1e6 AS mde_abs,
       FLOOR(mde / p * 1e4 + 0.5) / 1e4 AS mde_rel
FROM m
""",
)
def power_mde_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power / minimal-detectable-effect report (standard
    two-proportion power formula, e.g. Kohavi et al. 2020 — public):
    given the observed base conversion rate and per-arm user counts,
    the smallest absolute/relative lift detectable at 80% power and 5%
    two-sided alpha. The design-stage twin of ab_test_report: it says
    whether a null result is evidence of no effect or just an
    underpowered test.

    Plan shape: one user shuffle, 2-row algebra. Determinism: exact
    counts; one fixed IEEE sequence."""
    events = load_events(spark, sf_dir)
    pu = events.groupBy(
        "user_id", F.pmod(F.col("user_id"), F.lit(2)).alias("arm")
    ).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv")
    )
    st = pu.groupBy("arm").agg(F.count("*").alias("n"), F.sum("conv").alias("k"))
    a = st.filter(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("k").alias("k0")
    )
    b = st.filter(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("k").alias("k1")
    )
    c = a.join(F.broadcast(b)).select(
        "n0",
        "n1",
        ((F.col("k0") + F.col("k1")).cast("double") / (F.col("n0") + F.col("n1"))).alias("p"),
        F.when(F.col("n0") < F.col("n1"), F.col("n0")).otherwise(F.col("n1")).alias("nmin"),
    )
    m = c.select(
        "n0",
        "n1",
        "p",
        (
            F.lit(2.801585)
            * F.sqrt(F.lit(2.0) * F.col("p") * (F.lit(1.0) - F.col("p")) / F.col("nmin"))
        ).alias("mde"),
    )
    return m.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        (F.floor(F.col("p") * 1e6 + F.lit(0.5)) / 1e6).alias("base_rate"),
        (F.floor(F.col("mde") * 1e6 + F.lit(0.5)) / 1e6).alias("mde_abs"),
        (F.floor(F.col("mde") / F.col("p") * 1e4 + F.lit(0.5)) / 1e4).alias("mde_rel"),
    )


@register(
    "seasonal_decompose",
    # census algebra mirror of operators/relational.seasonal_decompose:
    # trend/seasonal/resid each re-quantized to exact cents before the
    # next subtraction
    """
WITH census AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS yc
  FROM orders GROUP BY 1
), trended AS (
  SELECT day, yc,
         CASE WHEN COUNT(*) OVER w7 = 7
              THEN CAST(FLOOR(CAST(SUM(yc) OVER w7 AS DOUBLE) / 7.0 + 0.5)
                        AS BIGINT) END AS trend_c,
         (day - DATE '1970-01-01') % 7 AS wd
  FROM census
  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), det AS (
  SELECT day, yc, trend_c, wd, yc - trend_c AS det_c FROM trended
), wk AS (
  SELECT wd,
         CAST(FLOOR(CAST(SUM(det_c) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
           AS raw_s
  FROM det WHERE det_c IS NOT NULL GROUP BY wd
), center AS (
  SELECT CAST(FLOOR(CAST(SUM(raw_s) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
           AS mean_s
  FROM wk
), seasonal AS (
  SELECT wd, raw_s - mean_s AS seasonal_c FROM wk CROSS JOIN center
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       FLOOR(CAST(yc AS DOUBLE) / 100.0 * 100 + 0.5) / 100.0 AS revenue,
       FLOOR(CAST(trend_c AS DOUBLE) / 100.0 * 100 + 0.5) / 100.0 AS trend,
       FLOOR(CAST(seasonal_c AS DOUBLE) / 100.0 * 100 + 0.5) / 100.0 AS seasonal,
       FLOOR(CAST(yc - trend_c - seasonal_c AS DOUBLE) / 100.0 * 100 + 0.5)
         / 100.0 AS residual
FROM det JOIN seasonal USING (wd)
WHERE trend_c IS NOT NULL
ORDER BY day
""",
)
def seasonal_decompose_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.seasonal_decompose(load_table(spark, sf_dir, "orders"))


@register(
    "shapley_attribution",
    # exact Shapley over the 16-cell channel-set lattice; phi kept in
    # integer units of 1/4! so the efficiency identity is exact
    """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         + MAX(CASE WHEN event_type = 'view' THEN 2 ELSE 0 END)
         + MAX(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END)
         + MAX(CASE WHEN event_type = 'error' THEN 8 ELSE 0 END) AS mask,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
), census AS (SELECT mask, SUM(conv) AS n_conv FROM per_user GROUP BY 1),
subsets AS (SELECT UNNEST(range(16)) AS s),
v AS (
  SELECT s, COALESCE(SUM(n_conv), 0) AS v
  FROM subsets LEFT JOIN census ON (mask & s) = mask
  GROUP BY s
),
channels(ch_bit, channel) AS (
  VALUES (0, 'click'), (1, 'view'), (2, 'signup'), (3, 'error')
),
pairs AS (
  SELECT ch_bit, channel, s,
         ((s >> 0) & 1) + ((s >> 1) & 1) + ((s >> 2) & 1) + ((s >> 3) & 1)
           AS size_s,
         s | (1 << ch_bit) AS s_with
  FROM channels JOIN subsets ON ((s >> ch_bit) & 1) = 0
), phi AS (
  SELECT channel,
         SUM((CASE WHEN size_s IN (0, 3) THEN 6 ELSE 2 END)
             * (vw.v - vs.v)) AS phi24
  FROM pairs
  JOIN v vs ON pairs.s = vs.s
  JOIN v vw ON pairs.s_with = vw.s
  GROUP BY channel
), tot AS (SELECT SUM(phi24) AS tot24 FROM phi)
SELECT channel, CAST(phi24 AS BIGINT) AS phi24,
       FLOOR(CAST(phi24 AS DOUBLE) / 24.0 * 1e6 + 0.5) / 1e6 AS phi,
       FLOOR(CAST(phi24 AS DOUBLE) / CAST(tot24 AS DOUBLE) * 1e6 + 0.5) / 1e6
         AS credit_share
FROM phi CROSS JOIN tot ORDER BY channel
""",
)
def shapley_attribution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.shapley_attribution(load_events(spark, sf_dir))


@register(
    "hyperball_neighborhood",
    # oracle replays the register algebra round by round (3 explicit
    # round CTEs — no recursion needed for a fixed radius) and the
    # exact-ball BFS beside it
    """
WITH raw AS (
  SELECT user_id % 200 AS p, event_id % 199 AS q FROM events
  WHERE user_id % 200 <> event_id % 199
),
edges AS (SELECT DISTINCT LEAST(p, q) AS u, GREATEST(p, q) AS v FROM raw),
und AS (SELECT u AS a, v AS b FROM edges UNION SELECT v AS a, u AS b FROM edges),
nodes AS (SELECT DISTINCT a AS n FROM und),
hashed AS (
  SELECT n,
         CAST(CAST(concat('0x', substr(md5('hb:' || n), 1, 15)) AS UBIGINT) % 16
              AS INT) AS j,
         CAST(concat('0x', substr(md5('hb:' || n), 17, 15)) AS UBIGINT) AS bits
  FROM nodes
),
init AS (
  SELECT n AS node, j, MIN(k.k) AS rho
  FROM hashed, (SELECT UNNEST(range(1, 32)) AS k) k
  WHERE ((bits >> (k.k - 1)) & 1) = 1
  GROUP BY 1, 2
),
s1 AS (
  SELECT node, j, MAX(rho) AS rho FROM (
    SELECT node, j, rho FROM init
    UNION ALL
    SELECT e.a AS node, i.j, i.rho FROM und e JOIN init i ON e.b = i.node
  ) GROUP BY 1, 2
),
s2 AS (
  SELECT node, j, MAX(rho) AS rho FROM (
    SELECT node, j, rho FROM s1
    UNION ALL
    SELECT e.a AS node, i.j, i.rho FROM und e JOIN s1 i ON e.b = i.node
  ) GROUP BY 1, 2
),
s3 AS (
  SELECT node, j, MAX(rho) AS rho FROM (
    SELECT node, j, rho FROM s2
    UNION ALL
    SELECT e.a AS node, i.j, i.rho FROM und e JOIN s2 i ON e.b = i.node
  ) GROUP BY 1, 2
),
b0 AS (SELECT n AS node, n AS w FROM nodes),
b1 AS (SELECT DISTINCT node, w FROM (
  SELECT node, w FROM b0
  UNION ALL SELECT e.a, b.w FROM und e JOIN b0 b ON e.b = b.node)),
b2 AS (SELECT DISTINCT node, w FROM (
  SELECT node, w FROM b1
  UNION ALL SELECT e.a, b.w FROM und e JOIN b1 b ON e.b = b.node)),
b3 AS (SELECT DISTINCT node, w FROM (
  SELECT node, w FROM b2
  UNION ALL SELECT e.a, b.w FROM und e JOIN b2 b ON e.b = b.node)),
exact AS (SELECT node, COUNT(*) AS exact_ball FROM b3 GROUP BY 1),
z AS (
  SELECT node, SUM(1.0 / (1 << rho)) AS zpart, COUNT(*) AS cnt
  FROM s3 GROUP BY 1
),
fin AS (
  SELECT z.node AS node, exact_ball,
         0.673 * 16.0 * 16.0 / (zpart + (16.0 - cnt)) AS est_raw,
         16 - cnt AS vz
  FROM z JOIN exact ON z.node = exact.node
),
est AS (
  SELECT node, exact_ball,
         CASE WHEN est_raw <= 2.5 * 16.0 AND vz > 0
              THEN 16.0 * LN(16.0 / vz) ELSE est_raw END AS e
  FROM fin
)
SELECT node, CAST(exact_ball AS BIGINT) AS exact_ball,
       FLOOR(e * 1e4 + 0.5) / 1e4 AS est_ball,
       FLOOR((e - exact_ball) / exact_ball * 1e4 + 0.5) / 1e4 AS rel_err
FROM est ORDER BY node
""",
)
def hyperball_neighborhood_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.hyperball_neighborhood(load_events(spark, sf_dir))


@register(
    "seasonal_anomaly_flags",
    # nests the seasonal_decompose census; medians are DISCRETE
    # percentiles (the anomaly_mad convention)
    """
WITH census AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS yc
  FROM orders GROUP BY 1
), trended AS (
  SELECT day, yc,
         CASE WHEN COUNT(*) OVER w7 = 7
              THEN CAST(FLOOR(CAST(SUM(yc) OVER w7 AS DOUBLE) / 7.0 + 0.5)
                        AS BIGINT) END AS trend_c,
         (day - DATE '1970-01-01') % 7 AS wd
  FROM census
  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), det AS (
  SELECT day, yc, trend_c, wd, yc - trend_c AS det_c FROM trended
), wk AS (
  SELECT wd,
         CAST(FLOOR(CAST(SUM(det_c) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
           AS raw_s
  FROM det WHERE det_c IS NOT NULL GROUP BY wd
), center AS (
  SELECT CAST(FLOOR(CAST(SUM(raw_s) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
           AS mean_s
  FROM wk
), seasonal AS (
  SELECT wd, raw_s - mean_s AS seasonal_c FROM wk CROSS JOIN center
), dec AS (
  SELECT strftime(day, '%Y-%m-%d') AS day,
         FLOOR(CAST(yc AS DOUBLE) / 100.0 * 100 + 0.5) / 100.0 AS revenue,
         yc - trend_c - seasonal_c AS resid_c
  FROM det JOIN seasonal USING (wd)
  WHERE trend_c IS NOT NULL
), resid AS (
  SELECT day, revenue,
         FLOOR(CAST(resid_c AS DOUBLE) / 100.0 * 100 + 0.5) / 100.0 AS residual,
         CAST(FLOOR(FLOOR(CAST(resid_c AS DOUBLE) / 100.0 * 100 + 0.5) / 100.0
                    * 100 + 0.5) AS BIGINT) AS rc
  FROM dec
), med AS (SELECT quantile_disc(rc, 0.5) AS med FROM resid),
dev AS (
  SELECT day, revenue, residual, ABS(rc - med) AS adev FROM resid, med
), mad AS (SELECT quantile_disc(adev, 0.5) AS mad FROM dev)
SELECT day, revenue, residual,
       FLOOR(CAST(adev AS DOUBLE) / (1.4826 * CAST(mad AS DOUBLE)) * 1e4 + 0.5)
         / 1e4 AS robust_score
FROM dev, mad
WHERE CAST(adev AS DOUBLE) > 3.0 * 1.4826 * CAST(mad AS DOUBLE)
ORDER BY day
""",
)
def seasonal_anomaly_flags_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.seasonal_anomaly_flags(load_table(spark, sf_dir, "orders"))


@register(
    "pacf_daily",
    # Durbin-Levinson closed forms for lags 1-3 on the ACF census —
    # the sequential recursion becomes three fixed IEEE expressions
    """
WITH days AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x FROM events GROUP BY 1
), tot AS (SELECT COUNT(*) AS nd, SUM(x) AS s FROM days),
lags AS (SELECT UNNEST(range(1, 4)) AS lag),
pairs AS (
  SELECT lag, SUM((t.nd * a.x - t.s) * (t.nd * b.x - t.s)) AS num
  FROM days a CROSS JOIN lags JOIN days b ON datediff('day', a.d, b.d) = lag
  CROSS JOIN tot t GROUP BY lag
), den AS (
  SELECT SUM((t.nd * x - t.s) * (t.nd * x - t.s)) AS den FROM days, tot t
), r AS (
  SELECT
    MAX(CASE WHEN lag = 1 THEN CAST(num AS DOUBLE) / den END) AS r1,
    MAX(CASE WHEN lag = 2 THEN CAST(num AS DOUBLE) / den END) AS r2,
    MAX(CASE WHEN lag = 3 THEN CAST(num AS DOUBLE) / den END) AS r3
  FROM pairs, den
), p AS (
  SELECT r1, r2, r3, r1 AS p11,
         (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22
  FROM r
), p2 AS (
  SELECT r1, r2, r3, p11, p22, p11 - p22 * p11 AS p21 FROM p
), p3 AS (
  SELECT r1, r2, r3, p11, p22,
         (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2) AS p33
  FROM p2
)
SELECT 1 AS lag, FLOOR(r1 * 1e6 + 0.5) / 1e6 AS acf,
       FLOOR(p11 * 1e6 + 0.5) / 1e6 AS pacf FROM p3
UNION ALL
SELECT 2, FLOOR(r2 * 1e6 + 0.5) / 1e6, FLOOR(p22 * 1e6 + 0.5) / 1e6 FROM p3
UNION ALL
SELECT 3, FLOOR(r3 * 1e6 + 0.5) / 1e6, FLOOR(p33 * 1e6 + 0.5) / 1e6 FROM p3
ORDER BY lag
""",
)
def pacf_daily_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily event-count series at lags
    1-3 via the Durbin-Levinson recursion unrolled to closed form
    (Durbin 1960 — public method) — the AR-order diagnostic beside
    acf_daily (ACF says WHAT correlates; PACF says what remains after
    conditioning on shorter lags, i.e. which AR terms to keep).

    Determinism: ACF numerators/denominator are exact integer moments
    (the acf_daily construction); the three D-L expressions are the
    same fixed IEEE tree on both engines, quantized 1e-6.

    Plan shape: one day-census shuffle; lag pairing and the recursion
    run on the census. Linear at 100 TB."""
    events = load_events(spark, sf_dir)
    days = events.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("x")
    )
    tot = days.agg(F.count("*").alias("nd"), F.sum("x").alias("s"))
    lags = spark.range(1, 4).select(F.col("id").cast("int").alias("lag"))
    a = days.select(F.col("d").alias("ad"), F.col("x").alias("ax"))
    b = days.select(F.col("d").alias("bd"), F.col("x").alias("bx"))
    pairs = (
        a.join(F.broadcast(lags))
        .join(b, F.datediff(F.col("bd"), F.col("ad")) == F.col("lag"))
        .join(F.broadcast(tot))
        .groupBy("lag")
        .agg(
            F.sum(
                (F.col("nd") * F.col("ax") - F.col("s"))
                * (F.col("nd") * F.col("bx") - F.col("s"))
            ).alias("num")
        )
    )
    den = (
        days.join(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("nd") * F.col("x") - F.col("s"))
                * (F.col("nd") * F.col("x") - F.col("s"))
            ).alias("den")
        )
    )
    r = (
        pairs.join(F.broadcast(den))
        .agg(
            F.max(
                F.when(F.col("lag") == 1, F.col("num").cast("double") / F.col("den"))
            ).alias("r1"),
            F.max(
                F.when(F.col("lag") == 2, F.col("num").cast("double") / F.col("den"))
            ).alias("r2"),
            F.max(
                F.when(F.col("lag") == 3, F.col("num").cast("double") / F.col("den"))
            ).alias("r3"),
        )
    )
    p11 = F.col("r1")
    p22 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        F.lit(1.0) - F.col("r1") * F.col("r1")
    )
    p = r.select("r1", "r2", "r3", p11.alias("p11"), p22.alias("p22"))
    p2 = p.select(
        "r1", "r2", "r3", "p11", "p22",
        (F.col("p11") - F.col("p22") * F.col("p11")).alias("p21"),
    )
    p33 = (
        F.col("r3") - F.col("p21") * F.col("r2") - F.col("p22") * F.col("r1")
    ) / (
        F.lit(1.0) - F.col("p21") * F.col("r1") - F.col("p22") * F.col("r2")
    )
    p3 = p2.select("r1", "r2", "r3", "p11", "p22", p33.alias("p33"))
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    one = p3.select(
        F.lit(1).alias("lag"), q6(F.col("r1")).alias("acf"), q6(F.col("p11")).alias("pacf")
    )
    two = p3.select(F.lit(2).alias("lag"), q6(F.col("r2")).alias("acf"), q6(F.col("p22")).alias("pacf"))
    three = p3.select(F.lit(3).alias("lag"), q6(F.col("r3")).alias("acf"), q6(F.col("p33")).alias("pacf"))
    return one.union(two).union(three).orderBy("lag")


@register(
    "multimodal_audio_fingerprint",
    # oracle mirrors the synthetic PCM formula + frame-energy
    # differencing in integer algebra (the audio decode convention)
    """
WITH lens AS (SELECT doc_id, 64 + doc_id % 50 AS n FROM documents),
s AS (
  SELECT doc_id, i.i AS i, ((doc_id * 13 + i.i * 31) % 65536) - 32768 AS v
  FROM lens, LATERAL (SELECT UNNEST(range(n)) AS i) i
), fr AS (
  SELECT doc_id, i // 8 AS f, SUM(v * v) AS e
  FROM s GROUP BY 1, 2 HAVING COUNT(*) = 8
), bits AS (
  SELECT doc_id, f, e,
         LAG(e) OVER (PARTITION BY doc_id ORDER BY f) AS pe
  FROM fr
), fp AS (
  SELECT doc_id, COUNT(*) AS nf,
         COALESCE(bit_xor(CASE WHEN pe IS NOT NULL AND e > pe
                          THEN 1 << ((f - 1) % 63) ELSE 0 END), 0) AS fingerprint
  FROM bits GROUP BY doc_id
)
SELECT doc_id, CAST(nf AS INT) AS n_frames,
       CAST(fingerprint AS BIGINT) AS fingerprint,
       MIN(doc_id) OVER (PARTITION BY nf, fingerprint) AS canonical_doc
FROM fp ORDER BY doc_id
""",
)
def multimodal_audio_fingerprint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    fps = multimodal.audio_fingerprint(multimodal.synthetic_wav_media(docs))
    w = Window.partitionBy("n_frames", "fingerprint")
    return fps.select(
        "doc_id",
        "n_frames",
        "fingerprint",
        F.min("doc_id").over(w).alias("canonical_doc"),
    ).orderBy("doc_id")


@register(
    "kneser_ney_logprob",
    # same bigram census; KN terms are integer counts pushed through
    # one fixed expression tree; bigram_logprob's AVG(LN) convention
    """
WITH toks AS (
  SELECT doc_id, pos, tok FROM (
    SELECT doc_id,
           generate_subscripts(t, 1) AS pos, unnest(t) AS tok
    FROM (SELECT doc_id,
                 string_split_regex(lower(trim(text)), '\\s+') AS t
          FROM documents)
  ) WHERE tok <> ''
),
bigrams AS (
  SELECT doc_id, tok, nxt FROM (
    SELECT doc_id, tok,
           LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM toks
  ) WHERE nxt IS NOT NULL
),
pc AS (SELECT tok, nxt, COUNT(*) AS c2 FROM bigrams GROUP BY tok, nxt),
hc AS (SELECT tok, COUNT(*) AS c1 FROM bigrams GROUP BY tok),
fw AS (SELECT tok, COUNT(*) AS n1fw FROM pc GROUP BY tok),
bw AS (SELECT nxt, COUNT(*) AS n1bw FROM pc GROUP BY nxt),
bt AS (SELECT COUNT(*) AS btypes FROM pc),
scored AS (
  SELECT b.doc_id,
         (GREATEST(pc.c2 - 0.75, 0.0)
          + 0.75 * fw.n1fw * bw.n1bw / bt.btypes) / hc.c1 AS p
  FROM bigrams b
  JOIN pc ON b.tok = pc.tok AND b.nxt = pc.nxt
  JOIN hc ON b.tok = hc.tok
  JOIN fw ON b.tok = fw.tok
  JOIN bw ON b.nxt = bw.nxt
  CROSS JOIN bt
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(LN(p)), 6) AS avg_logprob
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams, avg_logprob, ROUND(EXP(-avg_logprob), 4) AS ppl
FROM per_doc ORDER BY doc_id
""",
)
def kneser_ney_logprob_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.kneser_ney_logprob(load_table(spark, sf_dir, "documents"))


@register(
    "ipw_treatment_effect",
    # inverse-propensity weighting on the activity-bucket census;
    # per-bucket terms quantize to exact 1e-6 ints BEFORE the sum
    """
WITH pu AS (
  SELECT user_id, user_id % 2 AS arm, COUNT(*) AS n_ev,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
), bu AS (
  SELECT LEAST(n_ev // 5, 9) AS b, arm, COUNT(*) AS n, SUM(conv) AS k
  FROM pu GROUP BY 1, 2
), cells AS (
  SELECT b,
         SUM(CASE WHEN arm = 0 THEN n ELSE 0 END) AS n0,
         SUM(CASE WHEN arm = 0 THEN k ELSE 0 END) AS k0,
         SUM(CASE WHEN arm = 1 THEN n ELSE 0 END) AS n1,
         SUM(CASE WHEN arm = 1 THEN k ELSE 0 END) AS k1
  FROM bu GROUP BY b
), pos AS (
  SELECT *, CAST(n1 AS DOUBLE) / (n1 + n0) AS e
  FROM cells WHERE n0 > 0 AND n1 > 0
), terms AS (
  SELECT CAST(FLOOR((k1 / e - k0 / (1.0 - e)) * 1e6 + 0.5) AS BIGINT) AS tq,
         n0, n1, k0, k1
  FROM pos
), agg AS (
  SELECT SUM(n0 + n1) AS nu, SUM(tq) AS st,
         SUM(k0) AS k0t, SUM(n0) AS n0t, SUM(k1) AS k1t, SUM(n1) AS n1t
  FROM terms
)
SELECT CAST(nu AS BIGINT) AS n_users,
       FLOOR((CAST(k1t AS DOUBLE) / n1t - CAST(k0t AS DOUBLE) / n0t) * 1e6
             + 0.5) / 1e6 AS ate_naive,
       FLOOR(st / 1e6 / nu * 1e6 + 0.5) / 1e6 AS ate_ipw
FROM agg
""",
)
def ipw_treatment_effect_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted treatment effect (Horvitz &
    Thompson 1952; Rosenbaum & Rubin 1983 — public methods): the
    observational-causal complement of ab_test_report — when arms are
    NOT randomized, reweighting each converter by 1/P(arm|covariate)
    removes the confounding the naive arm difference absorbs. The
    covariate is the user's activity bucket (10 cells); buckets
    violating positivity (an arm absent) are trimmed, per the standard
    IPW contract.

    Determinism: the (bucket, arm) census is exact ints; each bucket's
    IPW term quantizes to an exact 1e-6 int BEFORE summation; the two
    headline ATEs are fixed IEEE sequences.

    Plan shape: one user shuffle -> 20-cell census; everything after
    is census algebra. Linear at 100 TB."""
    events = load_events(spark, sf_dir)
    pu = events.groupBy(
        "user_id", F.pmod(F.col("user_id"), F.lit(2)).alias("arm")
    ).agg(
        F.count("*").alias("n_ev"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv"),
    )
    bu = pu.groupBy(
        F.least(F.floor(F.col("n_ev") / 5), F.lit(9)).alias("b"), "arm"
    ).agg(F.count("*").alias("n"), F.sum("conv").alias("k"))
    cells = bu.groupBy("b").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n")).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("k")).otherwise(0)).alias("k0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n")).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("k")).otherwise(0)).alias("k1"),
    )
    pos = cells.filter((F.col("n0") > 0) & (F.col("n1") > 0)).withColumn(
        "e", F.col("n1").cast("double") / (F.col("n1") + F.col("n0"))
    )
    terms = pos.select(
        F.floor(
            (F.col("k1") / F.col("e") - F.col("k0") / (F.lit(1.0) - F.col("e")))
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("tq"),
        "n0", "n1", "k0", "k1",
    )
    agg = terms.agg(
        F.sum(F.col("n0") + F.col("n1")).alias("nu"),
        F.sum("tq").alias("st"),
        F.sum("k0").alias("k0t"),
        F.sum("n0").alias("n0t"),
        F.sum("k1").alias("k1t"),
        F.sum("n1").alias("n1t"),
    )
    return agg.select(
        F.col("nu").cast("long").alias("n_users"),
        (
            F.floor(
                (
                    F.col("k1t").cast("double") / F.col("n1t")
                    - F.col("k0t").cast("double") / F.col("n0t")
                )
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("ate_naive"),
        (
            F.floor(F.col("st") / 1e6 / F.col("nu") * 1e6 + F.lit(0.5)) / 1e6
        ).alias("ate_ipw"),
    )


@register(
    "did_estimate",
    # 2x2 (arm, period) purchase-value means; the period split is the
    # integer epoch midpoint, so both engines cut identically
    """
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
), cells AS (
  SELECT user_id % 2 AS arm,
         CASE WHEN epoch_us(ts) >= (b.mn + b.mx) // 2 THEN 1 ELSE 0 END AS period,
         COUNT(*) AS n,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS s
  FROM events, bounds b
  WHERE event_type = 'purchase'
  GROUP BY 1, 2
), m AS (
  SELECT
    MAX(CASE WHEN arm = 0 AND period = 0 THEN CAST(s AS DOUBLE) / n END) AS m00,
    MAX(CASE WHEN arm = 0 AND period = 1 THEN CAST(s AS DOUBLE) / n END) AS m01,
    MAX(CASE WHEN arm = 1 AND period = 0 THEN CAST(s AS DOUBLE) / n END) AS m10,
    MAX(CASE WHEN arm = 1 AND period = 1 THEN CAST(s AS DOUBLE) / n END) AS m11
  FROM cells
)
SELECT FLOOR(m00 / 100.0 * 1e4 + 0.5) / 1e4 AS mean_ctl_pre,
       FLOOR(m01 / 100.0 * 1e4 + 0.5) / 1e4 AS mean_ctl_post,
       FLOOR(m10 / 100.0 * 1e4 + 0.5) / 1e4 AS mean_trt_pre,
       FLOOR(m11 / 100.0 * 1e4 + 0.5) / 1e4 AS mean_trt_post,
       FLOOR(((m11 - m10) - (m01 - m00)) / 100.0 * 1e6 + 0.5) / 1e6 AS did
FROM m
""",
)
def did_estimate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator (Card & Krueger 1994 frame —
    public method) on mean purchase value: arm = user parity, period =
    before/after the dataset's epoch midpoint; DiD = (trt_post -
    trt_pre) - (ctl_post - ctl_pre), the parallel-trends-adjusted
    effect the raw post-period difference can't give.

    Determinism: cell sums are exact centi-ints; the 2x2 means and the
    DiD contrast are one fixed IEEE tree; the period cut is integer
    epoch-microsecond arithmetic (identical floor division on both
    engines).

    Plan shape: one bounds scan (2-value broadcast) + one partial-agg
    shuffle to 4 cells. Linear at 100 TB."""
    events = load_events(spark, sf_dir)
    bounds = events.agg(
        F.min(F.unix_micros("ts")).alias("mn"), F.max(F.unix_micros("ts")).alias("mx")
    )
    vu = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    cells = (
        events.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(bounds))
        .groupBy(
            F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
            F.when(
                F.unix_micros("ts")
                >= F.floor((F.col("mn") + F.col("mx")) / 2).cast("long"),
                1,
            )
            .otherwise(0)
            .alias("period"),
        )
        .agg(F.count("*").alias("n"), F.sum(vu).alias("s"))
    )
    mean_of = lambda a_, p_: F.max(  # noqa: E731
        F.when(
            (F.col("arm") == a_) & (F.col("period") == p_),
            F.col("s").cast("double") / F.col("n"),
        )
    )
    m = cells.agg(
        mean_of(0, 0).alias("m00"),
        mean_of(0, 1).alias("m01"),
        mean_of(1, 0).alias("m10"),
        mean_of(1, 1).alias("m11"),
    )
    q4 = lambda c: F.floor(c / 100.0 * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return m.select(
        q4(F.col("m00")).alias("mean_ctl_pre"),
        q4(F.col("m01")).alias("mean_ctl_post"),
        q4(F.col("m10")).alias("mean_trt_pre"),
        q4(F.col("m11")).alias("mean_trt_post"),
        (
            F.floor(
                ((F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00")))
                / 100.0
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("did"),
    )


@register(
    "ucb_arm_ranking",
    # UCB1 scores per event-type arm from exact counts; ln through the
    # same fixed tree on both engines
    """
WITH st AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CASE WHEN value > 200 THEN 1 ELSE 0 END) AS k
  FROM events GROUP BY 1
), tot AS (SELECT SUM(n) AS big_n FROM st),
u AS (
  SELECT event_type, n, k,
         CAST(k AS DOUBLE) / n + SQRT(2.0 * LN(CAST(big_n AS DOUBLE)) / n)
           AS ucb
  FROM st, tot
)
SELECT event_type, CAST(n AS BIGINT) AS n_pulls, CAST(k AS BIGINT) AS n_rewards,
       FLOOR(CAST(k AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS reward_rate,
       FLOOR(ucb * 1e6 + 0.5) / 1e6 AS ucb_score,
       CAST(ROW_NUMBER() OVER (ORDER BY ucb DESC, event_type) AS BIGINT)
         AS ucb_rank
FROM u ORDER BY ucb_rank
""",
)
def ucb_arm_ranking_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 arm ranking (Auer et al. 2002 — public method): treat each
    event type as a bandit arm (reward = value > 200) and rank by the
    optimism bonus mean + sqrt(2 ln N / n) — the exploration order an
    online selector would play next, computed offline from the event
    log. The batch readout of the explore/exploit ledger: arms with
    few pulls outrank slightly-better-known ones.

    Determinism: pulls/rewards are exact ints; UCB is a fixed IEEE
    tree; ties rank by arm name.

    Plan shape: one partial-agg shuffle to 5 arm rows. Linear."""
    events = load_events(spark, sf_dir)
    st = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("value") > 200, 1).otherwise(0)).alias("k"),
    )
    tot = st.agg(F.sum("n").alias("big_n"))
    u = st.join(F.broadcast(tot)).withColumn(
        "ucb",
        F.col("k").cast("double") / F.col("n")
        + F.sqrt(F.lit(2.0) * F.log(F.col("big_n").cast("double")) / F.col("n")),
    )
    return u.select(
        "event_type",
        F.col("n").cast("long").alias("n_pulls"),
        F.col("k").cast("long").alias("n_rewards"),
        (F.floor(F.col("k").cast("double") / F.col("n") * 1e6 + F.lit(0.5)) / 1e6).alias(
            "reward_rate"
        ),
        (F.floor(F.col("ucb") * 1e6 + F.lit(0.5)) / 1e6).alias("ucb_score"),
        F.row_number()
        .over(Window.orderBy(F.col("ucb").desc(), "event_type"))
        .cast("long")
        .alias("ucb_rank"),
    ).orderBy("ucb_rank")


@register(
    "dedup_threshold_sweep",
    # pair cosines computed ONCE (label-blocked, milli-int), then the
    # whole threshold lattice is conditional census algebra
    """
WITH pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(FLOOR(ROUND(list_cosine_similarity(
                a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) * 1000 + 0.5)
              AS INT) AS mcos
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(
          a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) >= 0.3
), th AS (SELECT UNNEST([300, 400, 500, 600, 700, 800, 900]) AS t),
j AS (SELECT t, a_id, b_id FROM pairs, th WHERE mcos >= t),
np AS (SELECT t, COUNT(*) AS n_pairs FROM j GROUP BY t),
docs AS (
  SELECT t, COUNT(DISTINCT id) AS n_docs FROM (
    SELECT t, a_id AS id FROM j UNION ALL SELECT t, b_id FROM j
  ) GROUP BY t
), tot AS (SELECT COUNT(*) AS n FROM embeddings)
SELECT t / 1000.0 AS threshold,
       CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(docs.n_docs, 0) AS BIGINT) AS n_docs_involved,
       FLOOR(CAST(COALESCE(docs.n_docs, 0) AS DOUBLE) / tot.n * 1e6 + 0.5) / 1e6
         AS dup_rate
FROM th LEFT JOIN np USING (t) LEFT JOIN docs USING (t) CROSS JOIN tot
ORDER BY threshold
""",
)
def dedup_threshold_sweep_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold sweep — the tuning report every dedup config
    decision needs: for each cosine cutoff, how many pairs fire and
    what fraction of the corpus gets pulled into a dup group. The
    aggressive/conservative trade (Lee et al. 2022 discuss exactly
    this knob) read off one relation instead of N re-runs.

    Determinism: pair cosines use the embedding_near_dup_pairs
    contract (blocked matmul, half-up milli-rounding), compared as
    exact milli-ints against the integer threshold lattice.

    Plan shape: the blocked pair relation is computed ONCE; the sweep
    is a 7-row broadcast join + conditional censuses — N thresholds
    cost one pass, not N. Linear in pairs at 100 TB."""
    from .operators import dedup

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_near_dup_pairs(emb, threshold=0.3).select(
        "a_id",
        "b_id",
        F.floor(F.col("cos_sim") * 1000 + F.lit(0.5)).cast("int").alias("mcos"),
    )
    th = spark.range(3, 10).select((F.col("id") * 100).cast("int").alias("t"))
    j = pairs.join(F.broadcast(th), F.col("mcos") >= F.col("t"))
    np_ = j.groupBy("t").agg(F.count("*").alias("n_pairs"))
    docs = (
        j.select("t", F.explode(F.array("a_id", "b_id")).alias("id"))
        .groupBy("t")
        .agg(F.countDistinct("id").alias("n_docs"))
    )
    tot = emb.agg(F.count("*").alias("n"))
    return (
        th.join(np_, "t", "left")
        .join(docs, "t", "left")
        .join(F.broadcast(tot))
        .select(
            (F.col("t") / 1000.0).alias("threshold"),
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs_involved"),
            (
                F.floor(
                    F.coalesce(F.col("n_docs"), F.lit(0)).cast("double")
                    / F.col("n")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("dup_rate"),
        )
        .orderBy("threshold")
    )


@register(
    "join_asof_forward",
    # correlated earliest-future-order subquery; the engine's one
    # window pass must match it exactly (strictly-after, min orderkey)
    """
SELECT e.event_id, e.user_id,
       (SELECT o.o_orderkey FROM orders o
        WHERE o.o_custkey = e.user_id
          AND CAST(o.o_orderdate AS TIMESTAMP) > e.ts
        ORDER BY o.o_orderdate, o.o_orderkey LIMIT 1) AS next_orderkey
FROM events e
""",
)
def join_asof_forward_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.join_asof_next_order(
        load_events(spark, sf_dir), load_table(spark, sf_dir, "orders")
    )


@register(
    "window_cume_dist",
    """
SELECT event_id, event_type,
       FLOOR(cume_dist() OVER (PARTITION BY event_type ORDER BY value) * 1e6
             + 0.5) / 1e6 AS cd
FROM events
QUALIFY event_id % 97 = 0
ORDER BY event_id
""",
)
def window_cume_dist_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist completes the analytic-rank surface (rank /
    percent_rank / ntile / cume_dist): P(value <= this row's value)
    within the event-type partition — tie-inclusive by definition, so
    it is deterministic without a tiebreaker. Output sampled by
    event_id so the contract stays small at any scale."""
    events = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value")
    return (
        events.select(
            "event_id",
            "event_type",
            (F.floor(F.cume_dist().over(w) * 1e6 + F.lit(0.5)) / 1e6).alias("cd"),
        )
        .filter(F.col("event_id") % 97 == 0)
        .orderBy("event_id")
    )


@register(
    "blocking_recall_report",
    # the diagnostic the blocked dedup family owes: on a 20% sample,
    # ground truth = UNBLOCKED all-pairs at the same threshold (pairs
    # blocking can only remove, never add), so recall = found / truth
    """
WITH samp AS (
  SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 5 = 0
), truth AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         (a.label = b.label) AS same_block
  FROM samp a JOIN samp b ON a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(
          a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) >= 0.4
), agg AS (
  SELECT COUNT(*) AS n_truth,
         SUM(CASE WHEN same_block THEN 1 ELSE 0 END) AS n_found
  FROM truth
)
SELECT CAST(n_truth AS BIGINT) AS n_truth_pairs,
       CAST(n_found AS BIGINT) AS n_blocked_pairs,
       CAST(n_truth - n_found AS BIGINT) AS n_missed,
       FLOOR(CAST(n_found AS DOUBLE) / n_truth * 1e6 + 0.5) / 1e6
         AS blocking_recall
FROM agg
""",
)
def blocking_recall_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-recall evaluation (the standard record-linkage /
    near-dup QA report, e.g. Christen 2012 — public method): on a
    deterministic 20% sample, compare label-blocked candidate pairs
    against UNBLOCKED ground truth at the same cosine threshold. Since
    blocking can only drop pairs, recall = found / truth — the number
    that says what the label-blocking strategy is missing.

    Plan shape: both pair relations run through the same blocked
    matmul kernel (embedding_near_dup_pairs); ground truth uses a
    single all-sample block — bounded by the SAMPLE size by design
    (that is the documented cost of the diagnostic; the production
    path stays blocked). The report is 1 row."""
    from .operators import dedup

    emb = load_table(spark, sf_dir, "embeddings")
    samp = emb.filter(F.col("vec_id") % 5 == 0)
    truth = dedup.embedding_near_dup_pairs(
        samp.withColumn("allblock", F.lit(0)), threshold=0.4, blocking="allblock"
    ).select("a_id", "b_id")
    blocked = dedup.embedding_near_dup_pairs(samp, threshold=0.4).select(
        F.col("a_id").alias("fa"), F.col("b_id").alias("fb")
    )
    marked = truth.join(
        blocked,
        (F.col("a_id") == F.col("fa")) & (F.col("b_id") == F.col("fb")),
        "left",
    )
    agg = marked.agg(
        F.count("*").alias("n_truth"),
        F.count("fa").alias("n_found"),
    )
    return agg.select(
        F.col("n_truth").cast("long").alias("n_truth_pairs"),
        F.col("n_found").cast("long").alias("n_blocked_pairs"),
        (F.col("n_truth") - F.col("n_found")).cast("long").alias("n_missed"),
        (
            F.floor(
                F.col("n_found").cast("double") / F.col("n_truth") * 1e6 + F.lit(0.5)
            )
            / 1e6
        ).alias("blocking_recall"),
    )


@register(
    "experiment_readout",
    # flagship composition: SRM gate + conversion z + Welch t + MDE in
    # ONE row — each block nests its standalone query's exact algebra
    """
WITH pu AS (
  SELECT user_id, user_id % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY 1, 2
), su AS (SELECT arm, COUNT(*) AS n, SUM(converted) AS k FROM pu GROUP BY 1),
counts AS (
  SELECT a.n AS n0, a.k AS k0, b.n AS n1, b.k AS k1
  FROM su a, su b WHERE a.arm = 0 AND b.arm = 1
), srm AS (
  SELECT n0, n1, k0, k1, CAST(n0 + n1 AS DOUBLE) / 2.0 AS e FROM counts
), zc AS (
  SELECT n0, n1, k0, k1,
         (n0 - e) * (n0 - e) / e + (n1 - e) * (n1 - e) / e AS chi2,
         (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          - CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE))
         / SQRT(CAST(k0 + k1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
                * (1.0 - CAST(k0 + k1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) AS z,
         CAST(k0 + k1 AS DOUBLE) / (n0 + n1) AS p,
         CASE WHEN n0 < n1 THEN n0 ELSE n1 END AS nmin
  FROM srm
), pv AS (
  SELECT user_id % 2 AS arm, COUNT(*) AS n,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS s1,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
             * CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS s2
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), pj AS (
  SELECT a.n AS vn0, a.s1 AS a1, a.s2 AS a2, b.n AS vn1, b.s1 AS b1, b.s2 AS b2
  FROM pv a, pv b WHERE a.arm = 0 AND b.arm = 1
), vt AS (
  SELECT (CAST(b1 AS DOUBLE) / vn1 - CAST(a1 AS DOUBLE) / vn0)
         / SQRT(((CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / vn0) / (vn0 - 1)) / vn0
                + ((CAST(b2 AS DOUBLE) - CAST(b1 AS DOUBLE) * b1 / vn1) / (vn1 - 1)) / vn1)
           AS tstat
  FROM pj
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       FLOOR(chi2 * 1e4 + 0.5) / 1e4 AS srm_chi2,
       chi2 <= 3.841 AS srm_ok,
       FLOOR(CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE) * 1e6 + 0.5) / 1e6 AS conv_p0,
       FLOOR(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) * 1e6 + 0.5) / 1e6 AS conv_p1,
       FLOOR(z * 1e4 + 0.5) / 1e4 AS conv_z,
       ABS(z) > 1.96 AS conv_significant,
       FLOOR(vt.tstat * 1e4 + 0.5) / 1e4 AS value_t,
       ABS(vt.tstat) > 1.96 AS value_significant,
       FLOOR(2.801585 * SQRT(2.0 * p * (1.0 - p) / nmin) * 1e6 + 0.5) / 1e6
         AS mde_abs
FROM zc, vt
""",
)
def experiment_readout_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete A/B readout as ONE report row — the composition an
    experimentation platform actually ships: SRM validity gate first
    (srm_check), then the conversion z-test (ab_test_report's
    statistic), the continuous-metric Welch t (welch_ttest), and the
    design-power MDE (power_mde_report). Each block reuses its
    standalone query's exact integer-moment algebra; the oracle nests
    all four. Two partial-agg shuffles (per-user conversion, purchase
    moments) + one-row joins — flat at 100 TB."""
    events = load_events(spark, sf_dir)
    pu = events.groupBy(
        "user_id", F.pmod(F.col("user_id"), F.lit(2)).alias("arm")
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
            ).otherwise(0)
        ).alias("converted")
    )
    su = pu.groupBy("arm").agg(F.count("*").alias("n"), F.sum("converted").alias("k"))
    counts = (
        su.filter(F.col("arm") == 0)
        .select(F.col("n").alias("n0"), F.col("k").alias("k0"))
        .join(
            F.broadcast(
                su.filter(F.col("arm") == 1).select(
                    F.col("n").alias("n1"), F.col("k").alias("k1")
                )
            )
        )
    )
    e = (F.col("n0") + F.col("n1")).cast("double") / 2.0
    chi2 = (F.col("n0") - e) * (F.col("n0") - e) / e + (F.col("n1") - e) * (
        F.col("n1") - e
    ) / e
    pooled = (F.col("k0") + F.col("k1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = (
        F.col("k1").cast("double") / F.col("n1").cast("double")
        - F.col("k0").cast("double") / F.col("n0").cast("double")
    ) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    nmin = F.when(F.col("n0") < F.col("n1"), F.col("n0")).otherwise(F.col("n1"))
    zc = counts.select(
        "n0", "n1", "k0", "k1",
        chi2.alias("chi2"), z.alias("z"), pooled.alias("p"), nmin.alias("nmin"),
    )
    vu = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    pv = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.pmod(F.col("user_id"), F.lit(2)).alias("arm"))
        .agg(F.count("*").alias("n"), F.sum(vu).alias("s1"), F.sum(vu * vu).alias("s2"))
    )
    pj = (
        pv.filter(F.col("arm") == 0)
        .select(F.col("n").alias("vn0"), F.col("s1").alias("a1"), F.col("s2").alias("a2"))
        .join(
            F.broadcast(
                pv.filter(F.col("arm") == 1).select(
                    F.col("n").alias("vn1"),
                    F.col("s1").alias("b1"),
                    F.col("s2").alias("b2"),
                )
            )
        )
    )
    tstat = (
        F.col("b1").cast("double") / F.col("vn1")
        - F.col("a1").cast("double") / F.col("vn0")
    ) / F.sqrt(
        (
            (F.col("a2").cast("double") - F.col("a1").cast("double") * F.col("a1") / F.col("vn0"))
            / (F.col("vn0") - 1)
        )
        / F.col("vn0")
        + (
            (F.col("b2").cast("double") - F.col("b1").cast("double") * F.col("b1") / F.col("vn1"))
            / (F.col("vn1") - 1)
        )
        / F.col("vn1")
    )
    vt = pj.select(tstat.alias("tstat"))
    q4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return zc.join(F.broadcast(vt)).select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        q4(F.col("chi2")).alias("srm_chi2"),
        (F.col("chi2") <= 3.841).alias("srm_ok"),
        q6(F.col("k0").cast("double") / F.col("n0").cast("double")).alias("conv_p0"),
        q6(F.col("k1").cast("double") / F.col("n1").cast("double")).alias("conv_p1"),
        q4(F.col("z")).alias("conv_z"),
        (F.abs(F.col("z")) > 1.96).alias("conv_significant"),
        q4(F.col("tstat")).alias("value_t"),
        (F.abs(F.col("tstat")) > 1.96).alias("value_significant"),
        q6(
            F.lit(2.801585)
            * F.sqrt(F.lit(2.0) * F.col("p") * (F.lit(1.0) - F.col("p")) / F.col("nmin"))
        ).alias("mde_abs"),
    )


@register(
    "multimodal_keyframe_select",
    # oracle rebuilds frames from the synth formula, mirrors SAD cuts,
    # running-sum scene ids, and the middle-frame keyframe pick
    """
WITH dims AS (
  SELECT doc_id, 4 + 2 * (doc_id % 3) AS w, 4 + 2 * (doc_id % 2) AS h,
         3 + doc_id % 4 AS n
  FROM documents
), fr AS (
  SELECT doc_id, f.f AS f, w, h FROM dims,
  LATERAL (SELECT UNNEST(range(n)) AS f) f
), px AS (
  SELECT doc_id, f, w, h, j.j AS j,
         (doc_id * 11 + f * 17 + j.j * 5) % 256 AS yv
  FROM fr, LATERAL (SELECT UNNEST(range(w * h)) AS j) j
), luma AS (
  SELECT doc_id, f, SUM(yv) AS luma FROM px GROUP BY 1, 2
), sad AS (
  SELECT a.doc_id, a.f, SUM(ABS(a.yv - b.yv)) AS sad
  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.j = b.j AND b.f = a.f - 1
  GROUP BY 1, 2
), cuts AS (
  SELECT l.doc_id, l.f, l.luma,
         COALESCE(s.sad > 32 * d.w * d.h, FALSE) AS is_cut
  FROM luma l
  LEFT JOIN sad s ON s.doc_id = l.doc_id AND s.f = l.f
  JOIN dims d ON d.doc_id = l.doc_id
), scenes AS (
  SELECT doc_id, f, luma,
         SUM(CASE WHEN is_cut THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY f) AS scene
  FROM cuts
), agg AS (
  SELECT doc_id, scene, MIN(f) AS s, MAX(f) AS e, COUNT(*) AS nf
  FROM scenes GROUP BY 1, 2
)
SELECT a.doc_id, CAST(a.scene AS INT) AS scene_id, CAST(s AS INT) AS start_frame,
       CAST(e AS INT) AS end_frame, CAST(nf AS INT) AS n_frames,
       CAST((s + e) // 2 AS INT) AS keyframe_idx,
       CAST(l.luma AS BIGINT) AS keyframe_luma
FROM agg a JOIN scenes l ON l.doc_id = a.doc_id AND l.f = (s + e) // 2
ORDER BY a.doc_id, scene_id
""",
)
def multimodal_keyframe_select_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection per detected shot — the sampling stage a
    video training pipeline runs AFTER scene-cut detection (sample
    within shots, not across them): scenes are running sums of the SAD
    cut flags, and each scene's keyframe is its middle frame (the
    standard representative-frame heuristic). Decode is map-side
    (video_frame_stats); scene assignment and the keyframe pick are
    one window + one census join on (doc, frame) longs — pixels never
    shuffle. Linear in video bytes at 100 TB."""
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    frames = multimodal.video_frame_stats(multimodal.synthetic_y4m_media(docs))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    scenes = frames.withColumn(
        "scene", F.sum(F.col("is_cut").cast("int")).over(w)
    )
    agg = scenes.groupBy("doc_id", "scene").agg(
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count("*").alias("n_frames"),
    ).withColumn(
        "keyframe_idx",
        F.expr("CAST((start_frame + end_frame) DIV 2 AS INT)"),
    )
    key = scenes.select(
        F.col("doc_id").alias("kd"),
        F.col("frame_idx").alias("kf"),
        F.col("luma_sum").alias("keyframe_luma"),
    )
    return (
        agg.join(
            key,
            (F.col("doc_id") == F.col("kd")) & (F.col("keyframe_idx") == F.col("kf")),
        )
        .select(
            "doc_id",
            F.col("scene").cast("int").alias("scene_id"),
            F.col("start_frame").cast("int").alias("start_frame"),
            F.col("end_frame").cast("int").alias("end_frame"),
            F.col("n_frames").cast("int").alias("n_frames"),
            F.col("keyframe_idx").cast("int").alias("keyframe_idx"),
            F.col("keyframe_luma").cast("long").alias("keyframe_luma"),
        )
        .orderBy("doc_id", "scene_id")
    )


@register(
    "dbscan_grid_clusters",
    # grid-density clustering; oracle walks the same core-cell graph
    # with the recursive transitive-closure CTE (dedup_groups pattern)
    """
WITH RECURSIVE pts AS (
  SELECT event_id,
         (event_id * 2654435761) % 1000 AS x,
         (user_id * 40503 + event_id * 97) % 1000 AS y
  FROM events WHERE event_type = 'click'
), cells AS (
  SELECT x // 5 AS cx, y // 5 AS cy, COUNT(*) AS n
  FROM pts GROUP BY 1, 2
), core AS (
  SELECT cx, cy, cx * 1000 + cy AS cell, n FROM cells WHERE n >= 3
), edges AS (
  SELECT a.cell AS u, b.cell AS v
  FROM core a JOIN core b
    ON ABS(a.cx - b.cx) <= 1 AND ABS(a.cy - b.cy) <= 1 AND a.cell <> b.cell
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT c.cell, LEAST(c.cell, COALESCE(MIN(r.v), c.cell)) AS cluster_id
  FROM core c LEFT JOIN reach r ON r.u = c.cell
  GROUP BY c.cell
), clusters AS (
  SELECT cluster_id, COUNT(*) AS n_cells, SUM(core.n) AS n_points
  FROM comp JOIN core ON comp.cell = core.cell
  GROUP BY cluster_id
), noise AS (
  SELECT CAST(-1 AS BIGINT) AS cluster_id, COUNT(*) AS n_cells,
         COALESCE(SUM(n), 0) AS n_points
  FROM cells WHERE n < 3
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(n_cells AS BIGINT) AS n_cells,
       CAST(n_points AS BIGINT) AS n_points
FROM (SELECT * FROM clusters UNION ALL SELECT * FROM noise)
ORDER BY cluster_id
""",
)
def dbscan_grid_clusters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering — DBSCAN's (Ester et al. 1996 — public
    method) scalable grid formulation (eps-sized cells, core cell =
    minPts occupancy, clusters = 8-connected components of core cells;
    sparse cells are noise): completes the clustering family (kmeans /
    k-center / mutual-kNN / SemDeDup centroids) with the density-based
    member, on the same synthetic plane as grid_radius_join.

    Plan shape: one partial-agg shuffle to the occupied-cell census;
    the neighbor join and min-label components (dedup_components —
    convergence by label-sum fixpoint) run on CELLS, never points —
    the cell census is the scale bound, not the row count. Points
    shuffle exactly once. Linear at 100 TB."""
    from .operators import dedup

    events = load_events(spark, sf_dir)
    pts = events.filter(F.col("event_type") == "click").select(
        "event_id",
        ((F.col("event_id") * 2654435761) % 1000).alias("x"),
        ((F.col("user_id") * 40503 + F.col("event_id") * 97) % 1000).alias("y"),
    )
    cells = pts.groupBy(
        F.floor(F.col("x") / 5).alias("cx"), F.floor(F.col("y") / 5).alias("cy")
    ).agg(F.count("*").alias("n"))
    core = cells.filter(F.col("n") >= 3).withColumn(
        "cell", F.col("cx") * 1000 + F.col("cy")
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    spark_offs = load_events(spark, sf_dir).sparkSession.createDataFrame(
        offs, "dx int, dy int"
    )
    nb = core.join(F.broadcast(spark_offs)).select(
        F.col("cell").alias("a_id"),
        ((F.col("cx") + F.col("dx")) * 1000 + (F.col("cy") + F.col("dy"))).alias(
            "b_id"
        ),
    )
    edges = nb.join(
        core.select(F.col("cell").alias("b_id")), "b_id"
    ).filter(F.col("a_id") != F.col("b_id"))
    comp = dedup.dedup_components(
        core.select(F.col("cell").alias("doc_id")), edges
    ).select(F.col("doc_id").alias("cell"), F.col("component_id").alias("cluster_id"))
    clusters = (
        comp.join(core, "cell")
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_cells"), F.sum("n").alias("n_points"))
    )
    noise = cells.filter(F.col("n") < 3).agg(
        F.lit(-1).cast("long").alias("cluster_id"),
        F.count("*").alias("n_cells"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_points"),
    )
    return (
        clusters.unionByName(noise)
        .select(
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.col("n_cells").cast("long").alias("n_cells"),
            F.col("n_points").cast("long").alias("n_points"),
        )
        .orderBy("cluster_id")
    )


@register(
    "decay_weighted_activity",
    # per-event decay weights quantize to exact 1e-6 ints BEFORE the
    # per-user sum; EXP through the same fixed tree on both engines
    """
WITH ref AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
wq AS (
  SELECT user_id,
         CAST(FLOOR(EXP(-0.05 * ((r.mx - epoch_us(ts)) / 86400000000.0))
                    * 1e6 + 0.5) AS BIGINT) AS w
  FROM events, ref r
), pu AS (
  SELECT user_id, COUNT(*) AS n_events, SUM(w) AS sw
  FROM wq GROUP BY 1
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       FLOOR(CAST(sw AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6 AS decay_score
FROM pu WHERE user_id % 57 = 0 ORDER BY user_id
""",
)
def decay_weighted_activity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay activity scoring (the recency-weighted
    engagement feature every ranking/CRM system keeps; exponential
    decay per Ebbinghaus / standard feature-store practice — public):
    each event contributes exp(-lambda * age_days) relative to the
    dataset's newest event, lambda = 0.05 (half-life ~14 days).

    Determinism: each per-event weight quantizes to an exact 1e-6 int
    BEFORE the per-user sum (a float sum over events would be
    order-nondeterministic); the age and EXP are the same fixed IEEE
    tree on both engines. Output sampled by user id.

    Plan shape: one 1-value bounds broadcast + one user shuffle of
    integer partial sums. Linear at 100 TB."""
    events = load_events(spark, sf_dir)
    ref = events.agg(F.max(F.unix_micros("ts")).alias("mx"))
    wq = events.join(F.broadcast(ref)).select(
        "user_id",
        F.floor(
            F.exp(
                F.lit(-0.05)
                * ((F.col("mx") - F.unix_micros("ts")) / F.lit(86400000000.0))
            )
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("w"),
    )
    pu = wq.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum("w").alias("sw")
    )
    return (
        pu.filter(F.col("user_id") % 57 == 0)
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            (
                F.floor(F.col("sw").cast("double") / 1e6 * 1e6 + F.lit(0.5)) / 1e6
            ).alias("decay_score"),
        )
        .orderBy("user_id")
    )


@register(
    "skipgram_negative_table",
    # word2vec negative-sampling table: unigram^0.75 via EXP(0.75*LN c)
    # (identical tree both engines), exact integer prefix sums
    """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents
), vc AS (
  SELECT tok, COUNT(*) AS c FROM toks WHERE tok <> '' GROUP BY tok
), tot_t AS (SELECT SUM(c) AS t FROM vc),
w AS (
  SELECT tok, c,
         CAST(FLOOR(EXP(0.75 * LN(CAST(c AS DOUBLE))) * 1e6 + 0.5) AS BIGINT)
           AS w75
  FROM vc
), tot_w AS (SELECT SUM(w75) AS sw FROM w),
ranked AS (
  SELECT tok, c, w75,
         ROW_NUMBER() OVER (ORDER BY w75 DESC, tok) AS rank,
         SUM(w75) OVER (ORDER BY w75 DESC, tok
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_w
  FROM w QUALIFY rank <= 50
)
SELECT CAST(rank AS BIGINT) AS rank, tok, CAST(c AS BIGINT) AS n_occurrences,
       FLOOR(CAST(w75 AS DOUBLE) / tw.sw * 1e8 + 0.5) / 1e8 AS prob,
       FLOOR(CAST(cum_w AS DOUBLE) / tw.sw * 1e8 + 0.5) / 1e8 AS cum_prob,
       FLOOR(5.0 * tt.t * (CAST(w75 AS DOUBLE) / tw.sw) * 1e4 + 0.5) / 1e4
         AS expected_negatives
FROM ranked, tot_w tw, tot_t tt
ORDER BY rank
""",
)
def skipgram_negative_table_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling table (Mikolov et al. 2013 — public
    method): the unigram^0.75 distribution skip-gram training draws
    negatives from, as a top-50 sampling table with cumulative bounds
    and the expected negative-draw count at k=5 per center token —
    the embedding-training prep stage on the corpus vocabulary.

    Determinism: counts are exact; c^0.75 is EXP(0.75*LN(c)) — the
    same fixed tree on both engines — quantized to 1e-6 ints before
    any sum, so prefix sums are exact integers.

    Plan shape: one token-census shuffle (vocabulary-bounded); the
    rank/prefix window runs over the 50-row table. Linear at 100 TB."""
    documents = load_table(spark, sf_dir, "documents")
    toks = documents.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    vc = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot_t = vc.agg(F.sum("c").alias("t"))
    w = vc.select(
        "tok",
        "c",
        F.floor(F.exp(F.lit(0.75) * F.log(F.col("c").cast("double"))) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("w75"),
    )
    tot_w = w.agg(F.sum("w75").alias("sw"))
    wr = Window.orderBy(F.col("w75").desc(), "tok")
    ranked = (
        w.withColumn("rank", F.row_number().over(wr))
        .withColumn(
            "cum_w",
            F.sum("w75").over(wr.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("rank") <= 50)
    )
    q8 = lambda c_: F.floor(c_ * 1e8 + F.lit(0.5)) / 1e8  # noqa: E731
    return (
        ranked.join(F.broadcast(tot_w))
        .join(F.broadcast(tot_t))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "tok",
            F.col("c").cast("long").alias("n_occurrences"),
            q8(F.col("w75").cast("double") / F.col("sw")).alias("prob"),
            q8(F.col("cum_w").cast("double") / F.col("sw")).alias("cum_prob"),
            (
                F.floor(
                    F.lit(5.0)
                    * F.col("t")
                    * (F.col("w75").cast("double") / F.col("sw"))
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("expected_negatives"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# ROUND 4 — Spark-4 SQL front-door surface: pipe syntax, SQL-defined
# scalar/table functions, session variables, and state-store
# introspection. The reference's only query language is HTTP params
# (queryTools/index.js); these are the modern declarative front doors a
# Spark engine exposes over the same relations.
# ---------------------------------------------------------------------------
@register(
    "sql_pipe_syntax",
    """
SELECT event_type,
       COUNT(*) AS n_events,
       SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS total_cents,
       floor(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
             / COUNT(*) / 100.0 * 1e4 + 0.5) / 1e4 AS avg_value
FROM events
WHERE event_type IN ('click', 'view', 'purchase')
GROUP BY event_type ORDER BY event_type
""",
)
def sql_pipe_syntax_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0 `|>` operators, SIGMOD'24 'Pipe
    Syntax in SQL' — public): the linear FROM -> WHERE -> EXTEND ->
    AGGREGATE -> ORDER BY dataflow form of the revenue rollup. Same
    Catalyst plan as the ANSI form (the parser desugars before
    analysis), so pushdown/codegen are identical — the oracle IS the
    ANSI twin, proving the two front doors agree bit-for-bit."""
    load_events(spark, sf_dir).createOrReplaceTempView("ksr_events_pipe")
    return spark.sql(
        """
        FROM ksr_events_pipe
        |> WHERE event_type IN ('click', 'view', 'purchase')
        |> EXTEND CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |> AGGREGATE COUNT(*) AS n_events, SUM(cents) AS total_cents
           GROUP BY event_type
        |> EXTEND floor(total_cents / n_events / 100.0 * 1e4 + 0.5) / 1e4
           AS avg_value
        |> ORDER BY event_type
        """
    )


@register(
    "sql_udf_scalar",
    """
WITH tiered AS (
  SELECT CASE WHEN value < 10 THEN 'low'
              WHEN value < 100 THEN 'mid'
              ELSE 'high' END AS tier,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT tier, COUNT(*) AS n_events, SUM(cents)::BIGINT AS total_cents
FROM tiered GROUP BY tier ORDER BY tier
""",
)
def sql_udf_scalar_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4.1 CREATE FUNCTION ...
    RETURN expr): the value-tier business rule declared ONCE in the
    catalog and reused by any query — the engine's user-extensible
    scalar surface WITHOUT leaving the JVM (the body inlines into the
    caller's plan at analysis time, so it codegens like a CASE
    expression; zero UDF serialization cost, unlike the Python path).
    Oracle inlines the identical CASE by hand."""
    load_events(spark, sf_dir).createOrReplaceTempView("ksr_events_udf")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION ksr_value_tier(v DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN v < 10 THEN 'low'
                    WHEN v < 100 THEN 'mid'
                    ELSE 'high' END
        """
    )
    return spark.sql(
        """
        SELECT ksr_value_tier(value) AS tier,
               COUNT(*) AS n_events,
               SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS total_cents
        FROM ksr_events_udf
        GROUP BY ksr_value_tier(value)
        ORDER BY tier
        """
    )


@register(
    "sql_udf_table",
    """
WITH base AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 97 = 0
)
SELECT o_orderkey, k.k AS installment,
       CASE WHEN k.k < 3 THEN cents // 3
            ELSE cents - 2 * (cents // 3) END AS amount_cents
FROM base, LATERAL (SELECT UNNEST(range(1, 4)) AS k) k(k)
ORDER BY o_orderkey, installment
""",
)
def sql_udf_table_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined TABLE function (CREATE FUNCTION ... RETURNS TABLE):
    a 3-way installment schedule — floor-split cents with the
    remainder on the last installment, so the rows sum back to the
    exact order total — applied per order row via LATERAL correlation.
    The declarative twin of the Python UDTF (udtf_token_stats): the
    body is a correlated subplan Catalyst inlines and optimizes (the
    lateral join becomes a projected explode, no per-row process
    boundary). Sparse key filter keeps the fixture output readable;
    the plan is a map-side explode at any scale."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ksr_orders_tvf")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION ksr_installments(cents BIGINT)
        RETURNS TABLE(installment INT, amount_cents BIGINT)
        RETURN SELECT k AS installment,
                      CASE WHEN k < 3 THEN cents DIV 3
                           ELSE cents - 2 * (cents DIV 3) END AS amount_cents
               FROM (SELECT explode(sequence(1, 3)) AS k)
        """
    )
    return spark.sql(
        """
        SELECT o.o_orderkey, t.installment, t.amount_cents
        FROM (SELECT o_orderkey,
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              FROM ksr_orders_tvf WHERE o_orderkey % 97 = 0) o,
             LATERAL ksr_installments(o.cents) t
        ORDER BY o.o_orderkey, t.installment
        """
    )


@register(
    "sql_session_variables",
    """
WITH thr AS (
  SELECT CAST(floor(AVG(value) * 100 + 0.5) AS BIGINT) AS thr_cents
  FROM events WHERE event_type = 'purchase'
)
SELECT e.event_type,
       COUNT(*) AS n_above,
       MAX(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS max_cents
FROM events e, thr
WHERE CAST(floor(e.value * 100 + 0.5) AS BIGINT) > thr.thr_cents
GROUP BY e.event_type ORDER BY e.event_type
""",
)
def sql_session_variables_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables (Spark 4 DECLARE VARIABLE / SET VAR): the
    two-step parameterized-analytics shape — first SET a threshold
    variable from a scalar subquery (mean purchase cents), then filter
    a second query with it. Variables live in the session catalog and
    fold into the plan as literals at analysis time, so the scan
    filter is pushed down exactly like a constant (unlike a driver
    round-trip through Python, the value never leaves SQL). Oracle
    computes the same threshold inline via a CTE cross join."""
    load_events(spark, sf_dir).createOrReplaceTempView("ksr_events_var")
    spark.sql("DECLARE OR REPLACE VARIABLE ksr_thr_cents BIGINT")
    spark.sql(
        """
        SET VAR ksr_thr_cents =
          (SELECT CAST(floor(AVG(value) * 100 + 0.5) AS BIGINT)
           FROM ksr_events_var WHERE event_type = 'purchase')
        """
    )
    return spark.sql(
        """
        SELECT event_type,
               COUNT(*) AS n_above,
               MAX(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS max_cents
        FROM ksr_events_var
        WHERE CAST(floor(value * 100 + 0.5) AS BIGINT) > ksr_thr_cents
        GROUP BY event_type ORDER BY event_type
        """
    )


@register(
    "streaming_state_inspect",
    """
SELECT event_type,
       COUNT(*) AS n_events,
       SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS total_cents
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def streaming_state_inspect_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store INTROSPECTION (Spark 4 `statestore` reader): drain a
    per-type count+cents aggregation on the stream, then read the
    aggregation's checkpointed state back as a DataFrame — the result
    rows come from the STATE FILES, not the sink. Matching the batch
    aggregate (the oracle) round-trip-proves the persisted state is
    exactly the aggregation's logical content; the same reader is how
    production debugs state skew or migrates state without replaying
    the stream."""
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    return jobs.state_store_snapshot(stream)


# ---------------------------------------------------------------------------
# ROUND 4 — statistics completions: the rank-based two-sample test, the
# k-group mean comparison, and the proportion interval (next to
# welch_ttest / ab_test_report / chi2_independence).
# ---------------------------------------------------------------------------
@register(
    "mann_whitney_utest",
    """
WITH vals AS (
  SELECT user_id % 2 AS arm,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq
  FROM events WHERE event_type = 'purchase'
), census AS (
  SELECT vq,
         SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS c0,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS c1
  FROM vals GROUP BY vq
), ranked AS (
  SELECT vq, c0, c1, c0 + c1 AS t,
         COALESCE(SUM(c0 + c1) OVER (ORDER BY vq
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM census
), agg AS (
  SELECT SUM(c0)::BIGINT AS n0, SUM(c1)::BIGINT AS n1,
         SUM(c1 * (2 * cum + t + 1))::BIGINT AS two_r1,
         SUM(t * t * t - t)::BIGINT AS tie_term
  FROM ranked
), z AS (
  SELECT n0, n1,
         (CAST(two_r1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1)) / 2 AS u1,
         (CAST(two_r1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1)) / 2
           - CAST(n0 AS DOUBLE) * n1 / 2 AS num,
         SQRT(CAST(n0 AS DOUBLE) * n1 / 12.0
              * ((n0 + n1 + 1)
                 - CAST(tie_term AS DOUBLE)
                   / (CAST(n0 + n1 AS DOUBLE) * (n0 + n1 - 1)))) AS sd
  FROM agg
)
SELECT n0, n1, u1,
       floor(num / sd * 1e4 + 0.5) / 1e4 AS z_stat,
       ABS(num / sd) > 1.96 AS significant
FROM z
""",
)
def mann_whitney_utest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum test (1947 — public method)
    comparing purchase value distributions between the user-parity
    arms: the DISTRIBUTION-FREE twin of welch_ttest (valid under the
    heavy-tailed revenue distributions where the t-test's normality
    assumption is shaky). Midranks, the U statistic, and the tie
    correction are all computed from a QUANTIZED-VALUE CENSUS — the
    model_eval_auc construction (U is the same 2U statistic AUC
    rescales) — so the corpus never crosses a single partition:
    doubled midranks 2*cum + t + 1 keep everything integer, two_r1
    and the tie term SUM(t^3 - t) are exact bigints, and the only
    float ops are the final z expression, one fixed IEEE tree.

    Plan shape: one partial-agg shuffle keyed on the quantized value;
    the prefix-sum window runs over the bounded distinct-value
    relation (cents-bounded, ~|price grid| rows) and the final
    aggregate is one row. Linear at 100 TB."""
    events = load_events(spark, sf_dir)
    vq = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    vals = events.filter(F.col("event_type") == "purchase").select(
        F.pmod(F.col("user_id"), F.lit(2)).alias("arm"), vq.alias("vq")
    )
    census = vals.groupBy("vq").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("c1"),
    )
    w = Window.orderBy("vq").rowsBetween(Window.unboundedPreceding, -1)
    ranked = census.select(
        "c0",
        "c1",
        (F.col("c0") + F.col("c1")).alias("t"),
        F.coalesce(F.sum(F.col("c0") + F.col("c1")).over(w), F.lit(0)).alias("cum"),
    )
    agg = ranked.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.sum(F.col("c1") * (2 * F.col("cum") + F.col("t") + 1)).alias("two_r1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_term"),
    )
    u1 = (
        F.col("two_r1").cast("double") - F.col("n1").cast("double") * (F.col("n1") + 1)
    ) / 2
    num = u1 - F.col("n0").cast("double") * F.col("n1") / 2
    n = F.col("n0") + F.col("n1")
    sd = F.sqrt(
        F.col("n0").cast("double")
        * F.col("n1")
        / 12.0
        * (
            (n + 1)
            - F.col("tie_term").cast("double") / (n.cast("double") * (n - 1))
        )
    )
    return agg.select(
        "n0",
        "n1",
        u1.alias("u1"),
        (F.floor(num / sd * 1e4 + F.lit(0.5)) / 1e4).alias("z_stat"),
        (F.abs(num / sd) > 1.96).alias("significant"),
    )


@register(
    "anova_oneway",
    """
WITH st AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS s1,
         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
             * CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS s2
  FROM events GROUP BY event_type
), terms AS (
  SELECT COUNT(*)::BIGINT AS k, SUM(n)::BIGINT AS n_total,
         SUM(s1)::BIGINT AS s1_all, SUM(s2)::BIGINT AS s2_all,
         SUM(s1 * s1 // n)::BIGINT AS sq_within
  FROM st
), ss AS (
  SELECT k, n_total,
         sq_within - (s1_all * s1_all // n_total) AS ssb,
         s2_all - sq_within AS ssw
  FROM terms
)
SELECT k, n_total,
       CAST(ssb AS BIGINT) AS ssb_cents2,
       CAST(ssw AS BIGINT) AS ssw_cents2,
       floor((CAST(ssb AS DOUBLE) / (k - 1))
             / (CAST(ssw AS DOUBLE) / (n_total - k)) * 1e6 + 0.5) / 1e6 AS f_stat
FROM ss
""",
)
def anova_oneway_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic for mean value across the event-type
    groups (Fisher — public method): the k-group generalization of
    welch_ttest's two arms, the omnibus 'do ANY groups differ' gate
    run before pairwise tests.

    Determinism: per-group (n, sum, sum-of-squares) are exact cent
    integers; the between/within sums of squares use INTEGER FLOOR
    DIVISION for each s1^2/n term (s1^2 <= ~2.5e17 at sf0.1 fits
    int64; a 100 TB deployment lifts to DECIMAL(38,0) exactly like
    trend_lines), so ssb/ssw are exact bigints bit-identical across
    engines — no IEEE sum-order hazard — and the only float op is the
    final F ratio, floor-error <= 1 cent^2 per group (relative 1e-14).

    Plan shape: ONE partial-agg shuffle to k=|event types| rows, then
    one-row algebra. Linear at 100 TB."""
    events = load_events(spark, sf_dir)
    vu = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    st = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(vu).alias("s1"),
        F.sum(vu * vu).alias("s2"),
    )
    terms = st.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n_total"),
        F.sum("s1").alias("s1_all"),
        F.sum("s2").alias("s2_all"),
        F.sum(F.expr("s1 * s1 div n")).alias("sq_within"),
    )
    ssb = F.col("sq_within") - F.expr("s1_all * s1_all div n_total")
    ssw = F.col("s2_all") - F.col("sq_within")
    f_stat = (ssb.cast("double") / (F.col("k") - 1)) / (
        ssw.cast("double") / (F.col("n_total") - F.col("k"))
    )
    return terms.select(
        "k",
        "n_total",
        ssb.alias("ssb_cents2"),
        ssw.alias("ssw_cents2"),
        (F.floor(f_stat * 1e6 + F.lit(0.5)) / 1e6).alias("f_stat"),
    )


@register(
    "wilson_ci_report",
    """
WITH users AS (
  SELECT user_id % 2 AS variant, user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1, 2
), st AS (
  SELECT variant, COUNT(*)::BIGINT AS n_users,
         SUM(converted)::BIGINT AS n_converted
  FROM users GROUP BY variant
), wil AS (
  SELECT variant, n_users, n_converted,
         CAST(n_converted AS DOUBLE) / n_users AS p,
         1.96 * 1.96 / n_users AS z2n
  FROM st
)
SELECT variant, n_users, n_converted,
       floor(p * 1e6 + 0.5) / 1e6 AS p_hat,
       floor((p + z2n / 2 - 1.96 * SQRT(p * (1 - p) / n_users + z2n / (4 * n_users)))
             / (1 + z2n) * 1e6 + 0.5) / 1e6 AS ci_low,
       floor((p + z2n / 2 + 1.96 * SQRT(p * (1 - p) / n_users + z2n / (4 * n_users)))
             / (1 + z2n) * 1e6 + 0.5) / 1e6 AS ci_high
FROM wil ORDER BY variant
""",
)
def wilson_ci_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score confidence interval (Wilson 1927 — public method)
    for each variant's conversion rate: the interval that stays inside
    [0,1] and behaves at small n / extreme p where the Wald interval
    collapses — what ab_test_report's point estimates ship with on a
    dashboard.

    Determinism: (n_users, n_converted) are exact via the per-user
    MAX-flag census; the interval is one fixed IEEE expression tree
    from those two integers, quantized to 1e-6.

    Plan shape: one user-keyed partial-agg shuffle (the cohort
    census), then a 2-row aggregate — the same two-shuffle ladder as
    streaming_ab_counts' batch twin. Linear at 100 TB."""
    events = load_events(spark, sf_dir)
    users = events.groupBy(
        F.pmod(F.col("user_id"), F.lit(2)).alias("variant"), "user_id"
    ).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    st = users.groupBy("variant").agg(
        F.count("*").alias("n_users"), F.sum("converted").alias("n_converted")
    )
    p = F.col("n_converted").cast("double") / F.col("n_users")
    z2n = F.lit(1.96) * 1.96 / F.col("n_users")
    half = F.lit(1.96) * F.sqrt(
        p * (1 - p) / F.col("n_users") + z2n / (4 * F.col("n_users"))
    )
    q6 = lambda c_: F.floor(c_ * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return st.select(
        "variant",
        "n_users",
        "n_converted",
        q6(p).alias("p_hat"),
        q6((p + z2n / 2 - half) / (1 + z2n)).alias("ci_low"),
        q6((p + z2n / 2 + half) / (1 + z2n)).alias("ci_high"),
    ).orderBy("variant")


# ---------------------------------------------------------------------------
# ROUND 4 — graph completions: the log-degree-weighted link predictor
# and seed-biased PageRank (next to link_prediction_jaccard /
# pagerank_converged).
# ---------------------------------------------------------------------------
@register(
    "link_prediction_adamic_adar",
    # same interaction graph / wedge join as link_prediction_jaccard;
    # per-wedge weight 1/LN(deg(shared)) quantized to nano-units then
    # exact-summed (the chi2 per-cell convention)
    """
WITH raw AS (
  SELECT user_id % 200 AS p, event_id % 199 AS q FROM events
  WHERE user_id % 200 <> event_id % 199
),
edges AS (SELECT DISTINCT LEAST(p, q) AS u, GREATEST(p, q) AS v FROM raw),
adj AS (
  SELECT u AS node, v AS nbr FROM edges
  UNION ALL SELECT v AS node, u AS nbr FROM edges
),
deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY node),
wedges AS (
  SELECT a1.node AS u, a2.node AS v,
         CAST(floor(1e9 / LN(d.deg) + 0.5) AS BIGINT) AS w_u
  FROM adj a1
  JOIN adj a2 ON a1.nbr = a2.nbr AND a1.node < a2.node
  JOIN deg d ON d.node = a1.nbr
),
cand AS (
  SELECT u, v, COUNT(*) AS n_common, SUM(w_u)::BIGINT AS aa_u
  FROM wedges GROUP BY u, v
),
nonedges AS (
  SELECT c.u, c.v, c.n_common, c.aa_u FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.u = c.u AND e.v = c.v)
)
SELECT u, v, n_common,
       floor(aa_u / 1e9 * 1e4 + 0.5) / 1e4 AS adamic_adar
FROM nonedges
ORDER BY aa_u DESC, u, v LIMIT 20
""",
)
def link_prediction_adamic_adar_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003 — public
    method): score non-adjacent distance-2 pairs by sum over common
    neighbors of 1/ln(degree) — rare shared neighbors count more than
    hubs, the refinement that beats raw common-neighbor counts and
    Jaccard on social graphs (Liben-Nowell & Kleinberg 2003's
    benchmark result).

    Determinism: each wedge's weight 1/LN(deg) is ONE fixed IEEE
    expression on the shared neighbor's exact integer degree,
    quantized to nano-units BEFORE the per-pair sum — so pair scores
    are exact bigints and ranking ties break on (u, v).

    Plan shape: identical wedge join to link_prediction_jaccard (the
    graph_triangles bound: fan-out sum-of-degrees-squared, never all
    pairs) with the degree lookup joined on the shared neighbor;
    existing-edge exclusion is a broadcast anti-join; top-20 is a
    TakeOrdered. At 100 TB the hub cap is the same degree-ordered
    orientation triangles use."""
    ev = load_events(spark, sf_dir)
    raw = ev.select(
        (F.col("user_id") % 200).alias("p"), (F.col("event_id") % 199).alias("q")
    ).filter(F.col("p") != F.col("q"))
    edges = raw.select(
        F.least("p", "q").alias("u"), F.greatest("p", "q").alias("v")
    ).distinct()
    adj = edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionByName(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count("*").alias("deg"))
    a1 = adj.select(F.col("node").alias("u"), "nbr")
    a2 = adj.select(F.col("node").alias("v"), F.col("nbr").alias("nbr2"))
    dn = deg.select(F.col("node").alias("nbr"), F.col("deg").alias("ndeg"))
    wedges = (
        a1.join(a2, (F.col("nbr") == F.col("nbr2")) & (F.col("u") < F.col("v")))
        .join(dn, "nbr")
        .select(
            "u",
            "v",
            F.floor(F.lit(1e9) / F.log(F.col("ndeg").cast("double")) + F.lit(0.5))
            .cast("long")
            .alias("w_u"),
        )
    )
    cand = wedges.groupBy("u", "v").agg(
        F.count("*").alias("n_common"), F.sum("w_u").alias("aa_u")
    )
    nonedges = cand.join(edges, ["u", "v"], "left_anti")
    return (
        nonedges.select(
            "u",
            "v",
            "n_common",
            (F.floor(F.col("aa_u") / 1e9 * 1e4 + F.lit(0.5)) / 1e4).alias(
                "adamic_adar"
            ),
            "aa_u",
        )
        .orderBy(F.col("aa_u").desc(), "u", "v")
        .limit(20)
        .drop("aa_u")
    )


@register(
    "personalized_pagerank",
    # 3 unrolled power rounds in integer micro-units; teleport mass
    # goes to the SEED only (min node) — pagerank_converged's exact
    # arithmetic with a biased restart
    """
WITH raw AS (
  SELECT DISTINCT user_id AS src, event_id % 500 AS dst FROM events
),
outdeg AS (SELECT src, COUNT(*) AS outdeg FROM raw GROUP BY src),
nodes AS (
  SELECT src AS node FROM raw UNION SELECT dst AS node FROM raw
),
seed AS (SELECT MIN(node) AS s FROM nodes),
r0 AS (
  SELECT node, CASE WHEN node = s THEN 1000000000 ELSE 0 END AS rank_u
  FROM nodes, seed
),
r1 AS (
  SELECT n.node,
         CASE WHEN n.node = sd.s THEN 150000000 ELSE 0 END
         + CAST(floor(0.85 * COALESCE(i.inflow, 0) + 0.5) AS BIGINT) AS rank_u
  FROM nodes n CROSS JOIN seed sd
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank_u // o.outdeg) AS inflow
    FROM raw e JOIN outdeg o ON e.src = o.src JOIN r0 r ON r.node = e.src
    GROUP BY e.dst
  ) i ON i.node = n.node
),
r2 AS (
  SELECT n.node,
         CASE WHEN n.node = sd.s THEN 150000000 ELSE 0 END
         + CAST(floor(0.85 * COALESCE(i.inflow, 0) + 0.5) AS BIGINT) AS rank_u
  FROM nodes n CROSS JOIN seed sd
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank_u // o.outdeg) AS inflow
    FROM raw e JOIN outdeg o ON e.src = o.src JOIN r1 r ON r.node = e.src
    GROUP BY e.dst
  ) i ON i.node = n.node
),
r3 AS (
  SELECT n.node,
         CASE WHEN n.node = sd.s THEN 150000000 ELSE 0 END
         + CAST(floor(0.85 * COALESCE(i.inflow, 0) + 0.5) AS BIGINT) AS rank_u
  FROM nodes n CROSS JOIN seed sd
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank_u // o.outdeg) AS inflow
    FROM raw e JOIN outdeg o ON e.src = o.src JOIN r2 r ON r.node = e.src
    GROUP BY e.dst
  ) i ON i.node = n.node
)
SELECT node, floor(rank_u / 1e9 * 1e6 + 0.5) / 1e6 AS ppr
FROM r3 WHERE rank_u > 0
ORDER BY rank_u DESC, node LIMIT 50
""",
)
def personalized_pagerank_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a single seed (the min node):
    teleport mass restarts at the SEED instead of uniformly, so rank
    measures proximity TO THE SEED — the neighborhood-relevance score
    behind 'people you may know' and seed-expanded retrieval (the
    query-biased twin of pagerank_converged's global importance).

    Three unrolled power rounds in exact integer micro-units
    (pagerank_converged's convention: per-edge contribution is
    rank_u DIV outdeg, damping is one IEEE op per node per round), so
    every round is bit-identical across engines and the oracle unrolls
    the same three rounds as chained CTEs.

    Plan shape: per round, the contribution join hash-partitions on
    src (exchange reused with the out-degree aggregate) and the inflow
    sum re-keys on dst — shuffles carry (node, rank) pairs only.
    Output is the positive-rank frontier (3 hops from the seed),
    TakeOrdered top-50."""
    ev = load_events(spark, sf_dir)
    edges = (
        ev.select(F.col("user_id").alias("src"), (F.col("event_id") % 500).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed = nodes.agg(F.min("node").alias("s"))
    ranks = nodes.join(F.broadcast(seed)).select(
        "node",
        F.when(F.col("node") == F.col("s"), F.lit(1000000000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank_u"),
    )
    for _ in range(3):
        contribs = (
            edges.join(outdeg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("rank_u DIV outdeg").alias("contrib_u"))
        )
        inflow = contribs.groupBy(F.col("dst").alias("node")).agg(
            F.sum("contrib_u").alias("inflow_u")
        )
        ranks = (
            nodes.join(F.broadcast(seed))
            .join(inflow, "node", "left_outer")
            .select(
                "node",
                (
                    F.when(F.col("node") == F.col("s"), F.lit(150000000))
                    .otherwise(F.lit(0))
                    .cast("long")
                    + F.floor(
                        F.lit(0.85)
                        * F.coalesce(F.col("inflow_u"), F.lit(0)).cast("double")
                        + F.lit(0.5)
                    ).cast("long")
                ).alias("rank_u"),
            )
            .localCheckpoint()
        )
    return (
        ranks.filter(F.col("rank_u") > 0)
        .select(
            "node",
            (F.floor(F.col("rank_u") / 1e9 * 1e6 + F.lit(0.5)) / 1e6).alias("ppr"),
            "rank_u",
        )
        .orderBy(F.col("rank_u").desc(), "node")
        .limit(50)
        .drop("rank_u")
    )


# ---------------------------------------------------------------------------
# ROUND 4 — corpus-linguistics completions: Zipf fit, lexical richness,
# term burstiness, and the paragraph-granular dedup scrub (the C4
# line-level analogue between exact-doc dedup and substring spans).
# ---------------------------------------------------------------------------
@register(
    "zipf_fit_report",
    _TOKS_CTE
    + """
, census AS (
  SELECT term, COUNT(*) AS freq FROM toks GROUP BY term
), ranked AS (
  SELECT term, freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rnk
  FROM census QUALIFY rnk <= 200
), lps AS (
  SELECT CAST(floor(LN(rnk) * 1e6 + 0.5) AS BIGINT) AS lx,
         CAST(floor(LN(freq) * 1e6 + 0.5) AS BIGINT) AS ly
  FROM ranked
), m AS (
  SELECT COUNT(*)::BIGINT AS n, SUM(lx)::BIGINT AS sx, SUM(ly)::BIGINT AS sy,
         SUM(lx * lx)::BIGINT AS sxx, SUM(lx * ly)::BIGINT AS sxy
  FROM lps
)
SELECT n AS n_terms,
       floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5) / 1e6 AS zipf_slope,
       floor((CAST(sy AS DOUBLE) / 1e6
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE)
                * (CAST(sx AS DOUBLE) / 1e6)) / n * 1e4 + 0.5) / 1e4
         AS log_c_intercept
FROM m
""",
)
def zipf_fit_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus rank-frequency curve (Zipf 1949 —
    public): OLS slope of ln(freq) on ln(rank) over the top-200 terms
    — natural text sits near -1; template/synthetic corpora deviate,
    so the slope is a corpus-health forensic next to benford_audit
    (which checks digits where this checks words).

    Determinism: ln(rank) / ln(freq) are one fixed IEEE op each on
    exact integers, quantized to micro-units BEFORE the moment sums —
    so Sx/Sy/Sxx/Sxy are exact bigints (trend_lines' convention in log
    space) and the slope is two final float divisions.

    Plan shape: one vocabulary-bounded census shuffle; the rank window
    runs over the 200-row head only (WindowGroupLimit prunes). Linear
    at 100 TB."""
    documents = load_table(spark, sf_dir, "documents")
    from .operators.text import tokens

    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), "[^a-z0-9 ]", "")
    toks = documents.select(
        F.explode(F.split(norm, " ")).alias("term")
    ).filter(F.col("term") != "")
    census = toks.groupBy("term").agg(F.count("*").alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), "term")
    ranked = census.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 200
    )
    lq = lambda c_: F.floor(F.log(c_.cast("double")) * 1e6 + F.lit(0.5)).cast(  # noqa: E731
        "long"
    )
    lps = ranked.select(lq(F.col("rnk")).alias("lx"), lq(F.col("freq")).alias("ly"))
    m = lps.agg(
        F.count("*").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    slope_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    slope_den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = slope_num / slope_den
    intercept = (
        F.col("sy").cast("double") / 1e6 - slope * (F.col("sx").cast("double") / 1e6)
    ) / F.col("n")
    return m.select(
        F.col("n").alias("n_terms"),
        (F.floor(slope * 1e6 + F.lit(0.5)) / 1e6).alias("zipf_slope"),
        (F.floor(intercept * 1e4 + F.lit(0.5)) / 1e4).alias("log_c_intercept"),
    )


@register(
    "ttr_hapax_report",
    _TOKS_CTE.replace("SELECT doc_id, t.term", "SELECT doc_id, d.source, t.term")
    .replace("FROM documents,", "FROM documents d,")
    + """
, per_term AS (
  SELECT source, term, COUNT(*) AS c FROM toks GROUP BY source, term
)
SELECT source,
       SUM(c)::BIGINT AS n_tokens,
       COUNT(*)::BIGINT AS n_types,
       SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
       SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS n_dis,
       floor(COUNT(*) / CAST(SUM(c) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS ttr,
       floor(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS hapax_ratio
FROM per_term GROUP BY source ORDER BY source
""",
)
def ttr_hapax_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-richness profile per source: type-token ratio plus
    hapax/dis legomena counts (Baayen's LNRE vocabulary-growth
    observables — public): high hapax share marks productive natural
    text, low marks templated/boilerplate sources — the vocabulary
    lens next to diversity_index_report's distributional one.

    Exact integers end-to-end (two final IEEE divisions, quantized);
    one (source, term)-keyed census shuffle, vocabulary-bounded, then
    a per-source aggregate. Linear at 100 TB."""
    documents = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), "[^a-z0-9 ]", "")
    toks = documents.select(
        "source", F.explode(F.split(norm, " ")).alias("term")
    ).filter(F.col("term") != "")
    per_term = toks.groupBy("source", "term").agg(F.count("*").alias("c"))
    q6 = lambda c_: F.floor(c_ * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return (
        per_term.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
            F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("n_dis"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            "n_dis",
            q6(F.col("n_types") / F.col("n_tokens").cast("double")).alias("ttr"),
            q6(F.col("n_hapax") / F.col("n_types").cast("double")).alias(
                "hapax_ratio"
            ),
        )
        .orderBy("source")
    )


@register(
    "term_burstiness",
    _TOKS_CTE
    + """
, per_doc AS (
  SELECT term, doc_id, COUNT(*) AS c FROM toks GROUP BY term, doc_id
), nd AS (SELECT COUNT(*) AS n_docs FROM documents),
moments AS (
  SELECT term, COUNT(*) AS df,
         SUM(c)::BIGINT AS s1, SUM(c * c)::BIGINT AS s2
  FROM per_doc GROUP BY term
), top AS (
  SELECT term, df, s1, s2,
         ROW_NUMBER() OVER (ORDER BY df DESC, term) AS rnk
  FROM moments QUALIFY rnk <= 50
)
SELECT term, df, s1 AS n_occurrences,
       floor((CAST(n_docs AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
             / (CAST(n_docs AS DOUBLE) - 1) / s1 * 1e6 + 0.5) / 1e6
         AS fano_factor
FROM top, nd ORDER BY term
""",
)
def term_burstiness_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church & Gale 1995 — public): the Fano factor
    (variance-to-mean over per-document counts, zeros included) of the
    50 highest-df terms. Function words sit near Poisson (factor ~1);
    topical/template terms are bursty (>>1) — the term-level forensic
    feeding stopword choice and boilerplate detection
    (boilerplate_ngram_flags' statistical cousin).

    Fano = (N*S2 - S1^2) / ((N-1)*S1): per-term (df, S1, S2) are exact
    bigints from one (term, doc) census, so the factor is a single
    fixed float expression — no per-doc float sums.

    Plan shape: (term, doc)-keyed partial agg, then a vocabulary-
    bounded moment aggregate; the top-50 window prunes via
    WindowGroupLimit. Linear at 100 TB."""
    documents = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), "[^a-z0-9 ]", "")
    toks = documents.select(
        "doc_id", F.explode(F.split(norm, " ")).alias("term")
    ).filter(F.col("term") != "")
    per_doc = toks.groupBy("term", "doc_id").agg(F.count("*").alias("c"))
    moments = per_doc.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    w = Window.orderBy(F.col("df").desc(), "term")
    top = moments.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 50)
    nd = documents.agg(F.count("*").alias("n_docs"))
    fano = (
        (
            F.col("n_docs").cast("double") * F.col("s2")
            - F.col("s1").cast("double") * F.col("s1")
        )
        / (F.col("n_docs").cast("double") - 1)
        / F.col("s1")
    )
    return (
        top.join(F.broadcast(nd))
        .select(
            "term",
            "df",
            F.col("s1").alias("n_occurrences"),
            (F.floor(fano * 1e6 + F.lit(0.5)) / 1e6).alias("fano_factor"),
        )
        .orderBy("term")
    )


@register(
    "paragraph_dedup_scrub",
    # 20-token blocks; first owner = lexicographic min (doc_id, blk);
    # rebuilt text is the kept blocks in order, md5-fingerprinted
    """
WITH ws AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS w
  FROM documents
), blocks AS (
  SELECT doc_id, b.blk AS blk,
         array_to_string(w[(b.blk * 20 + 1):(b.blk * 20 + 20)], ' ') AS para
  FROM ws, LATERAL (
    SELECT UNNEST(range(CAST(ceil(len(w) / 20.0) AS BIGINT))) AS blk
  ) b
  WHERE len(w) > 0
), owner AS (
  SELECT para, MIN(doc_id * 1000000 + blk) AS first_key
  FROM blocks GROUP BY para
), flagged AS (
  SELECT b.doc_id, b.blk, b.para,
         (b.doc_id * 1000000 + b.blk = o.first_key) AS keep
  FROM blocks b JOIN owner o USING (para)
)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_paras,
       SUM(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       md5(COALESCE(array_to_string(list(para ORDER BY blk)
                                    FILTER (WHERE keep), ' '), '')) AS scrubbed_md5
FROM flagged GROUP BY doc_id ORDER BY doc_id
""",
)
def paragraph_dedup_scrub_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granular exact dedup with removal — the C4 recipe's
    line-level dedup (Raffel et al. 2020 — public method) at 20-token
    block granularity: every duplicated block keeps only its corpus-
    first occurrence (lexicographic (doc_id, position)); each doc's
    text is rebuilt from its kept blocks and fingerprinted. Sits
    between dedup_exact (whole doc) and dedup_substring_scrub
    (arbitrary spans): block-aligned, so membership needs no interval
    algebra — one census decides every block.

    Plan shape: blocks derive map-side from one array pass; the owner
    census shuffles (block-hash -> min key) — content-bounded, the
    exact-dedup shape; the keep flag is an equi-join back on the block
    hash. Shuffles carry block hashes and keys, never full documents
    (the rebuilt text is a per-doc map-side concat). Linear at 100 TB."""
    documents = load_table(spark, sf_dir, "documents")
    from .operators.text import tokens

    docs = documents.select(
        "doc_id", F.filter(tokens(F.col("text")), lambda t: t != "").alias("w")
    ).filter(F.size("w") > 0)
    nblk = F.ceil(F.size("w") / F.lit(20.0)).cast("long")
    blocks = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nblk - 1),
                lambda b: F.array_join(
                    F.slice(F.col("w"), (b * 20 + 1).cast("int"), 20), " "
                ),
            )
        ).alias("blk", "para"),
    )
    owner = blocks.groupBy("para").agg(
        F.min(F.col("doc_id") * 1000000 + F.col("blk")).alias("first_key")
    )
    flagged = blocks.join(owner, "para").select(
        "doc_id",
        "blk",
        "para",
        (F.col("doc_id") * 1000000 + F.col("blk") == F.col("first_key")).alias("keep"),
    )
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("keep"), F.struct(F.col("blk"), F.col("para")))
            )
        ),
        lambda s: s["para"],
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.md5(F.array_join(kept_sorted, " ")).alias("scrubbed_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# ROUND 4 — multimodal completions: a third REAL image codec (BMP),
# histogram/Otsu image statistics, and autocorrelation pitch — all on
# formula-derived payloads so DuckDB recomputes every decoded fact.
# ---------------------------------------------------------------------------
@register(
    "multimodal_bmp_decode",
    # same pixel formula as the PPM/PNG fixtures -> same oracle shape
    """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, (doc_id * 7 + i.i) % 256 AS v
  FROM dims, LATERAL (SELECT UNNEST(range(w * h * 3)) AS i) i
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       3 AS channels, ROUND(AVG(v), 4) AS byte_mean
FROM px GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_bmp_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 24-bit BMP decode executing in-sandbox (pure stdlib struct
    + numpy: BITMAPINFOHEADER grammar, bottom-up row flip, BGR->RGB
    channel swap, 4-byte row padding) — the third real image codec
    next to PPM and PNG, sharing their pixel formula so ONE oracle
    covers all three. Decode is map-side Arrow-batched; only
    (doc_id, dims, mean) shuffles."""
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.image_decode_features(multimodal.synthetic_bmp_media(docs))


@register(
    "multimodal_image_histogram",
    # luma/bin algebra mirrored from the pixel formula; Otsu argmax by
    # the identical IEEE division, ties to the smallest bin
    """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h FROM documents
), lum AS (
  SELECT doc_id,
         (299 * ((doc_id * 7 + 3 * p.p) % 256)
          + 587 * ((doc_id * 7 + 3 * p.p + 1) % 256)
          + 114 * ((doc_id * 7 + 3 * p.p + 2) % 256)) // 1000 // 16 AS bin
  FROM dims, LATERAL (SELECT UNNEST(range(w * h)) AS p) p
), hist AS (
  SELECT doc_id, bin, COUNT(*)::BIGINT AS c FROM lum GROUP BY 1, 2
), tot AS (
  SELECT doc_id, SUM(c)::BIGINT AS n, SUM(bin * c)::BIGINT AS st
  FROM hist GROUP BY doc_id
), cand AS (
  SELECT t.doc_id, ts.t,
         SUM(h.c)::BIGINT AS w0, SUM(h.bin * h.c)::BIGINT AS s0,
         ANY_VALUE(t.n) AS n, ANY_VALUE(t.st) AS st
  FROM tot t
  CROSS JOIN (SELECT UNNEST(range(15)) AS t) ts
  JOIN hist h ON h.doc_id = t.doc_id AND h.bin <= ts.t
  GROUP BY t.doc_id, ts.t
), scored AS (
  SELECT doc_id, t, w0, n,
         CAST((s0 * n - st * w0) * (s0 * n - st * w0) AS DOUBLE)
           / CAST(w0 * (n - w0) AS DOUBLE) AS score
  FROM cand WHERE w0 > 0 AND w0 < n
), best AS (
  SELECT doc_id, t, w0, n,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, t) AS rn
  FROM scored
), lsum AS (
  SELECT doc_id,
         SUM((299 * ((doc_id * 7 + 3 * p.p) % 256)
              + 587 * ((doc_id * 7 + 3 * p.p + 1) % 256)
              + 114 * ((doc_id * 7 + 3 * p.p + 2) % 256)) // 1000)::BIGINT
           AS luma_sum
  FROM dims, LATERAL (SELECT UNNEST(range(w * h)) AS p) p
  GROUP BY doc_id
)
SELECT b.doc_id, b.n AS n_px, l.luma_sum,
       CAST(b.t AS INT) AS otsu_bin,
       b.w0 AS n_below, (b.n - b.w0)::BIGINT AS n_above
FROM best b JOIN lsum l USING (doc_id)
WHERE b.rn = 1 ORDER BY b.doc_id
""",
)
def multimodal_image_histogram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bin luma histogram + Otsu threshold (Otsu 1979 — public
    method) over REAL decoded PPM pixels — see
    operators/multimodal.py:image_histogram_otsu for the exact-integer
    contract. The oracle recomputes luma bins from the pixel formula
    and replays the argmax with the identical IEEE division."""
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.image_histogram_otsu(multimodal.synthetic_ppm_media(docs))


@register(
    "multimodal_audio_pitch",
    # R(L) mirrored from the synthetic PCM formula; argmax ties to the
    # smallest lag
    """
WITH lens AS (SELECT doc_id, 64 + doc_id % 50 AS n FROM documents),
s AS (
  SELECT doc_id, n, i.i AS i,
         ((doc_id * 13 + i.i * 31) % 65536) - 32768 AS v
  FROM lens, LATERAL (SELECT UNNEST(range(n)) AS i) i
), r AS (
  SELECT a.doc_id, lag.lag, SUM(a.v * b.v)::BIGINT AS r
  FROM s a
  CROSS JOIN (SELECT UNNEST(range(2, 17)) AS lag) lag
  JOIN s b ON b.doc_id = a.doc_id AND b.i = a.i + lag.lag
  GROUP BY a.doc_id, lag.lag
), best AS (
  SELECT doc_id, lag, r,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY r DESC, lag) AS rn
  FROM r
)
SELECT b.doc_id, CAST(l.n AS INT) AS n_samples,
       CAST(b.lag AS INT) AS pitch_lag, b.r AS r_max
FROM best b JOIN lens l USING (doc_id)
WHERE b.rn = 1 ORDER BY b.doc_id
""",
)
def multimodal_audio_pitch_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation pitch lag over REAL decoded PCM16 — see
    operators/multimodal.py:audio_pitch. Exact int64 lag products; the
    oracle recomputes every R(L) from the synthetic PCM formula via a
    positional self-join."""
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.audio_pitch(multimodal.synthetic_wav_media(docs))


# ---------------------------------------------------------------------------
# ROUND 4 — time-series completion: triple-exponential (Holt-Winters)
# smoothing joins the Holt linear recursion and the seasonal decompose.
# ---------------------------------------------------------------------------
@register(
    "holt_winters_seasonal",
    # recursive CTE replays the identical IEEE recurrence per type with
    # a rolling 7-slot seasonal buffer; the l' expression is repeated
    # VERBATIM inside b'/s' so the float trees match bit-for-bit
    """
WITH RECURSIVE census AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS y,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(ts AS DATE)) AS rn
  FROM events GROUP BY 1, 2
), h AS (
  SELECT event_type, day, y, rn, y AS l, CAST(0.0 AS DOUBLE) AS b,
         [CAST(0.0 AS DOUBLE), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS s
  FROM census WHERE rn = 1
  UNION ALL
  SELECT c.event_type, c.day, c.y, c.rn,
         0.5 * (c.y - h.s[1]) + 0.5 * (h.l + h.b) AS l,
         0.3 * ((0.5 * (c.y - h.s[1]) + 0.5 * (h.l + h.b)) - h.l)
           + 0.7 * h.b AS b,
         h.s[2:7] || [0.2 * (c.y - (0.5 * (c.y - h.s[1]) + 0.5 * (h.l + h.b)))
                      + 0.8 * h.s[1]] AS s
  FROM h JOIN census c
    ON c.event_type = h.event_type AND c.rn = h.rn + 1
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, CAST(y AS BIGINT) AS y,
       FLOOR(l * 1e6 + 0.5) / 1e6 AS level,
       FLOOR(b * 1e6 + 0.5) / 1e6 AS trend,
       FLOOR(s[7] * 1e6 + 0.5) / 1e6 AS seasonal,
       FLOOR(COALESCE(LAG(l) OVER w + LAG(b) OVER w + LAG(s[1]) OVER w, y)
             * 1e6 + 0.5) / 1e6 AS fitted
FROM h
WINDOW w AS (PARTITION BY event_type ORDER BY day)
ORDER BY event_type, day
""",
)
def holt_winters_seasonal_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple-exponential smoothing (Winters 1960
    — public method) per event-type daily series: level + trend +
    weekly seasonal recursion (alpha=0.5, beta=0.3, gamma=0.2,
    period 7). The seasonal state is a ROLLING 7-slot buffer whose
    head is s(t-7) — each step consumes the head and appends the fresh
    seasonal, so the fold state stays fixed-size. fitted(t) is the
    one-step forecast l(t-1) + b(t-1) + s_buffer(t-1)[head].
    Completes the smoothing ladder: ewma (simple) -> holt_linear
    (trend) -> this (trend + seasonality that weekday_seasonality_
    report showed is real).

    Same execution shape as holt_linear_smoothing: the recurrence runs
    where the data is SMALL — a (type, day) census (one partial-agg
    shuffle), per-type sorted array broadcast, row t's state an
    aggregate() fold over its prefix (O(days^2) folds on a <=31-element
    array, zero Python). The l' expression repeats verbatim inside the
    b'/s' updates on BOTH engines, so every float op is the same IEEE
    tree.

    At 100 TB only the census shuffle grows; the fold cost is fixed."""
    events = load_events(spark, sf_dir)
    census = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("double").alias("y"))
    wrn = Window.partitionBy("event_type").orderBy("day")
    census = census.withColumn("rn", F.row_number().over(wrn))
    packed = census.groupBy("event_type").agg(
        F.expr("sort_array(collect_list(struct(rn, y)))").alias("ys")
    )
    folded = census.join(F.broadcast(packed), "event_type").withColumn(
        "st",
        F.expr(
            """
            aggregate(
              slice(ys, 2, rn - 1),
              named_struct(
                'l', element_at(ys, 1).y, 'b', CAST(0.0 AS DOUBLE),
                's', array(CAST(0.0 AS DOUBLE), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
              (a, e) -> named_struct(
                'l', 0.5 * (e.y - element_at(a.s, 1)) + 0.5 * (a.l + a.b),
                'b', 0.3 * ((0.5 * (e.y - element_at(a.s, 1))
                             + 0.5 * (a.l + a.b)) - a.l) + 0.7 * a.b,
                's', concat(
                  slice(a.s, 2, 6),
                  array(0.2 * (e.y - (0.5 * (e.y - element_at(a.s, 1))
                                      + 0.5 * (a.l + a.b)))
                        + 0.8 * element_at(a.s, 1)))))
            """
        ),
    )
    wl = Window.partitionBy("event_type").orderBy("day")
    q6 = lambda c_: F.floor(c_ * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    lvl, trd = F.col("st.l"), F.col("st.b")
    s_head = F.element_at(F.col("st.s"), 1)
    s_new = F.element_at(F.col("st.s"), 7)
    return (
        folded.select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("y").cast("long").alias("y"),
            q6(lvl).alias("level"),
            q6(trd).alias("trend"),
            q6(s_new).alias("seasonal"),
            q6(
                F.coalesce(
                    F.lag(lvl).over(wl) + F.lag(trd).over(wl)
                    + F.lag(s_head).over(wl),
                    F.col("y"),
                )
            ).alias("fitted"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "bleu_pairs_report",
    # prefix-fingerprint blocking (8-token md5) picks the pair set; the
    # BLEU-2 algebra is exact clipped counts + one fixed exp/ln tree
    """
WITH ws AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS w
  FROM documents
), pref AS (
  SELECT doc_id, w, md5(array_to_string(w[1:8], ' ')) AS fp
  FROM ws WHERE len(w) >= 8
), canon AS (
  SELECT fp, MIN(doc_id) AS ref_id FROM pref GROUP BY fp
), pairs AS (
  SELECT doc_id, ref_id, block_pairs_total FROM (
    SELECT p.doc_id, c.ref_id,
           ROW_NUMBER() OVER (PARTITION BY p.fp ORDER BY p.doc_id) AS prn,
           COUNT(*) OVER (PARTITION BY p.fp) AS block_pairs_total
    FROM pref p JOIN canon c USING (fp)
    WHERE p.doc_id <> c.ref_id
  ) WHERE prn <= 64
), g1 AS (
  SELECT doc_id, t.g AS g, COUNT(*) AS c
  FROM ws, LATERAL UNNEST(w) AS t(g) GROUP BY doc_id, t.g
), g2 AS (
  SELECT doc_id, t.g AS g, COUNT(*) AS c
  FROM ws, LATERAL UNNEST(
    CASE WHEN len(w) >= 2
         THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
         ELSE [] END) AS t(g)
  GROUP BY doc_id, t.g
), lens AS (SELECT doc_id, len(w)::BIGINT AS n FROM ws),
clip1 AS (
  SELECT p.doc_id, p.ref_id,
         SUM(LEAST(a.c, COALESCE(b.c, 0)))::BIGINT AS clipped,
         SUM(a.c)::BIGINT AS total
  FROM pairs p
  JOIN g1 a ON a.doc_id = p.doc_id
  LEFT JOIN g1 b ON b.doc_id = p.ref_id AND b.g = a.g
  GROUP BY p.doc_id, p.ref_id
), clip2 AS (
  SELECT p.doc_id, p.ref_id,
         SUM(LEAST(a.c, COALESCE(b.c, 0)))::BIGINT AS clipped,
         SUM(a.c)::BIGINT AS total
  FROM pairs p
  JOIN g2 a ON a.doc_id = p.doc_id
  LEFT JOIN g2 b ON b.doc_id = p.ref_id AND b.g = a.g
  GROUP BY p.doc_id, p.ref_id
), m AS (
  SELECT c1.doc_id, c1.ref_id,
         c1.clipped AS k1, c1.total AS t1, c2.clipped AS k2, c2.total AS t2,
         lc.n AS c_len, lr.n AS r_len
  FROM clip1 c1 JOIN clip2 c2 USING (doc_id, ref_id)
  JOIN lens lc ON lc.doc_id = c1.doc_id
  JOIN lens lr ON lr.doc_id = c1.ref_id
)
SELECT doc_id, ref_id, p.block_pairs_total::BIGINT AS block_pairs_total,
       floor(CAST(k1 AS DOUBLE) / t1 * 1e6 + 0.5) / 1e6 AS p1,
       floor(CAST(k2 AS DOUBLE) / t2 * 1e6 + 0.5) / 1e6 AS p2,
       floor(CASE WHEN c_len >= r_len THEN 1.0
                  ELSE EXP(1.0 - CAST(r_len AS DOUBLE) / c_len) END
             * 1e6 + 0.5) / 1e6 AS brevity_penalty,
       floor(CASE WHEN k1 > 0 AND k2 > 0 THEN
               (CASE WHEN c_len >= r_len THEN 1.0
                     ELSE EXP(1.0 - CAST(r_len AS DOUBLE) / c_len) END)
               * EXP(0.5 * LN(CAST(k1 AS DOUBLE) / t1)
                     + 0.5 * LN(CAST(k2 AS DOUBLE) / t2))
             ELSE 0.0 END * 1e6 + 0.5) / 1e6 AS bleu2
FROM m JOIN pairs p USING (doc_id, ref_id) ORDER BY doc_id, ref_id
""",
)
def bleu_pairs_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 (Papineni et al. 2002 — public method) scored over
    blocked near-dup pairs: 8-token-prefix md5 blocking picks each
    doc's reference (the block's min doc_id), then modified n-gram
    precision with CLIPPED counts (min of candidate/reference gram
    counts), brevity penalty, and the geometric mean — the
    paraphrase-similarity measure an eval pipeline runs on suspected
    rewrites, next to the retrieval metrics (ndcg/mrr) and the dedup
    similarity estimates (BLEU is n-gram PRECISION where Jaccard is
    set overlap).

    Determinism: clipped/total counts are exact bigints; p1/p2/BP/the
    geometric mean are one fixed IEEE exp/ln tree, floored at 1e-6.

    Plan shape: blocking is one fingerprint census (exact-dedup
    shape); each clip pass is a (pair x gram) join bounded by
    pair-count x doc-length — pairs are near-dups by construction, so
    the relation is linear in the duplicated mass, never corpus^2.
    Gram counts shuffle as 8-byte-keyed rows; texts never shuffle."""
    documents = load_table(spark, sf_dir, "documents")
    from .operators.text import blocked_eval_pairs, tokens

    ws = documents.select(
        "doc_id", F.filter(tokens(F.col("text")), lambda t: t != "").alias("w")
    )
    pref = ws.filter(F.size("w") >= 8).select(
        "doc_id", "w", F.md5(F.array_join(F.slice("w", 1, 8), " ")).alias("fp")
    )
    pairs = blocked_eval_pairs(pref)
    g1 = (
        ws.select("doc_id", F.explode("w").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    bigrams = F.when(
        F.size("w") >= 2,
        F.zip_with(
            F.slice("w", 1, F.size("w") - 1),
            F.slice("w", 2, F.size("w") - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g2 = (
        ws.select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    lens = ws.select("doc_id", F.size("w").cast("long").alias("n"))

    def clip(g: DataFrame) -> DataFrame:
        a = g.alias("a")
        b = g.select(
            F.col("doc_id").alias("r_id"),
            F.col("g").alias("g_r"),
            F.col("c").alias("c_r"),
        )
        return (
            pairs.join(a, "doc_id")
            .join(
                b,
                (F.col("ref_id") == F.col("r_id")) & (F.col("a.g") == F.col("g_r")),
                "left",
            )
            .groupBy("doc_id", "ref_id")
            .agg(
                F.sum(F.least(F.col("a.c"), F.coalesce(F.col("c_r"), F.lit(0))))
                .alias("clipped"),
                F.sum(F.col("a.c")).alias("total"),
            )
        )

    c1 = clip(g1).select(
        "doc_id", "ref_id", F.col("clipped").alias("k1"), F.col("total").alias("t1")
    )
    c2 = clip(g2).select(
        "doc_id", "ref_id", F.col("clipped").alias("k2"), F.col("total").alias("t2")
    )
    lc = lens.select(F.col("doc_id"), F.col("n").alias("c_len"))
    lr = lens.select(F.col("doc_id").alias("ref_id"), F.col("n").alias("r_len"))
    m = c1.join(c2, ["doc_id", "ref_id"]).join(lc, "doc_id").join(lr, "ref_id")
    p1 = F.col("k1").cast("double") / F.col("t1")
    p2 = F.col("k2").cast("double") / F.col("t2")
    bp = F.when(F.col("c_len") >= F.col("r_len"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - F.col("r_len").cast("double") / F.col("c_len"))
    )
    bleu = F.when(
        (F.col("k1") > 0) & (F.col("k2") > 0),
        bp * F.exp(F.lit(0.5) * F.log(p1) + F.lit(0.5) * F.log(p2)),
    ).otherwise(F.lit(0.0))
    q6 = lambda c_: F.floor(c_ * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    # 1:1 join-back for the pre-cap block count (pairs is pair-mass-sized)
    m = m.join(pairs.select("doc_id", "ref_id", "block_pairs_total"),
               ["doc_id", "ref_id"])
    return m.select(
        "doc_id",
        "ref_id",
        "block_pairs_total",
        q6(p1).alias("p1"),
        q6(p2).alias("p2"),
        q6(bp).alias("brevity_penalty"),
        q6(bleu).alias("bleu2"),
    ).orderBy("doc_id", "ref_id")


# ---------------------------------------------------------------------------
# ROUND 4 (cont.) — ML-eval / information / storage completions.
# ---------------------------------------------------------------------------
@register(
    "cluster_silhouette",
    # squared-distance silhouette from per-cluster (n, Q, S) aggregates:
    # sum d2(x, C) = n_C*|x|^2 + Q_C - 2*x.S_C — no pairwise relation
    """
WITH q AS (
  SELECT vec_id, label, p.i AS pos,
         CAST(floor(p.v * 1000 + 0.5) AS BIGINT) AS xv
  FROM embeddings,
       LATERAL (SELECT UNNEST(embedding) AS v,
                       generate_subscripts(embedding, 1) AS i) p
), norms AS (
  SELECT vec_id, ANY_VALUE(label) AS label, SUM(xv * xv)::BIGINT AS x2
  FROM q GROUP BY vec_id
), csums AS (
  SELECT label AS c_label, pos, SUM(xv)::BIGINT AS sv
  FROM q GROUP BY label, pos
), cstats AS (
  SELECT label AS c_label, COUNT(*)::BIGINT AS n_c, SUM(x2)::BIGINT AS q_c
  FROM norms GROUP BY label
), dots AS (
  SELECT q.vec_id, c.c_label, SUM(q.xv * c.sv)::BIGINT AS xs
  FROM q JOIN csums c ON c.pos = q.pos
  GROUP BY q.vec_id, c.c_label
), ab AS (
  SELECT n.vec_id, n.label,
         MAX(CASE WHEN d.c_label = n.label
                  THEN CAST(s.n_c * n.x2 + s.q_c - 2 * d.xs AS DOUBLE)
                       / (s.n_c - 1) END) AS a2,
         MIN(CASE WHEN d.c_label <> n.label
                  THEN CAST(s.n_c * n.x2 + s.q_c - 2 * d.xs AS DOUBLE)
                       / s.n_c END) AS b2
  FROM norms n
  JOIN dots d ON d.vec_id = n.vec_id
  JOIN cstats s ON s.c_label = d.c_label
  GROUP BY n.vec_id, n.label
)
SELECT vec_id, label,
       floor(a2 * 1e3 + 0.5) / 1e3 AS a2,
       floor(b2 * 1e3 + 0.5) / 1e3 AS b2,
       floor((b2 - a2) / GREATEST(a2, b2) * 1e6 + 0.5) / 1e6 AS silhouette
FROM ab ORDER BY vec_id
""",
)
def cluster_silhouette_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silhouette coefficient (Rousseeuw 1987 — public method) of the
    embedding clustering (label column), SQUARED-distance variant:
    a(x) = mean d2 to own cluster (self excluded), b(x) = min over
    other clusters of mean d2, s = (b-a)/max(a,b). The clustering-
    quality read-off next to kmeans_converged / ann_recall_report.

    THE PLAN IS THE POINT: sum of d2(x, C) over members of C equals
    n_C*|x|^2 + Q_C - 2*x.S_C, so the whole silhouette needs only the
    per-cluster aggregates (count, sum-of-norms Q, component-sum
    vector S) — NO pairwise distance relation, which is what makes
    this linear at 100 TB where the textbook formula is corpus^2.

    Determinism: milli-quantized components make |x|^2, Q_C and the
    x.S_C dots exact bigints (via the positional explode join, the
    ivf_centroids shuffle shape: (n_clusters x dim) cells); a2/b2 are
    one float division each, min/max over <=|clusters| doubles."""
    embeddings = load_table(spark, sf_dir, "embeddings")
    q = embeddings.select(
        "vec_id",
        "label",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long"),
            )
        ).alias("pos", "xv"),
    )
    norms = q.groupBy("vec_id").agg(
        F.any_value(F.col("label")).alias("label"),
        F.sum(F.col("xv") * F.col("xv")).alias("x2"),
    )
    csums = q.groupBy(F.col("label").alias("c_label"), "pos").agg(
        F.sum("xv").alias("sv")
    )
    cstats = norms.groupBy(F.col("label").alias("c_label")).agg(
        F.count("*").alias("n_c"), F.sum("x2").alias("q_c")
    )
    dots = (
        q.join(csums.withColumnRenamed("pos", "cpos"), F.col("pos") == F.col("cpos"))
        .groupBy("vec_id", "c_label")
        .agg(F.sum(F.col("xv") * F.col("sv")).alias("xs"))
    )
    joined = (
        norms.join(dots, "vec_id")
        .join(F.broadcast(cstats), "c_label")
    )
    own = F.col("c_label") == F.col("label")
    sum_d2 = (
        F.col("n_c") * F.col("x2") + F.col("q_c") - 2 * F.col("xs")
    ).cast("double")
    ab = joined.groupBy("vec_id", "label").agg(
        F.max(F.when(own, sum_d2 / (F.col("n_c") - 1))).alias("a2"),
        F.min(F.when(~own, sum_d2 / F.col("n_c"))).alias("b2"),
    )
    q3 = lambda c_: F.floor(c_ * 1e3 + F.lit(0.5)) / 1e3  # noqa: E731
    return ab.select(
        "vec_id",
        "label",
        q3(F.col("a2")).alias("a2"),
        q3(F.col("b2")).alias("b2"),
        (
            F.floor(
                (F.col("b2") - F.col("a2"))
                / F.greatest(F.col("a2"), F.col("b2"))
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("silhouette"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# ROUND 5 — baseline JPEG: the codec 90% of a real crawl needs, now a
# fourth REAL image format (pure stdlib+numpy baseline-sequential
# decoder: marker grammar, canonical Huffman, restarts, dequant+IDCT,
# JFIF color convert). The fixture is built in the COMPRESSED domain —
# DC-only blocks with Q[0]=8 land the IDCT exactly on dc+128, and the
# sub-0.18 AC probe rounds away — so DuckDB recomputes every decoded
# pixel from closed integer formulas and the float YCbCr->RGB mirror.
# ---------------------------------------------------------------------------
@register(
    "multimodal_jpeg_decode",
    # per-pixel block index -> DC formulas -> JFIF conversion, with the
    # exact-integer SUM(r+g+b)/(3wh) mean (numpy pairwise sum of
    # integers is exact, so one division matches IEEE-for-IEEE)
    """
WITH dims AS (
  SELECT doc_id, 8 * (2 + doc_id % 3) AS w, 8 * (2 + doc_id % 2) AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h,
         ((p.p // w) // 8) * (w // 8) + (p.p % w) // 8 AS b
  FROM dims, LATERAL (SELECT UNNEST(range(w * h)) AS p) p
), ycc AS (
  SELECT doc_id, w, h,
         (128 + (doc_id * 7 + 13 * b) % 120 - 60)::DOUBLE AS y,
         (128 + (doc_id * 5 + 11 * b) % 40 - 20)::DOUBLE AS cb,
         (128 + (doc_id * 3 + 17 * b) % 40 - 20)::DOUBLE AS cr
  FROM px
), rgb AS (
  SELECT doc_id, w, h,
         GREATEST(0, LEAST(255, FLOOR(y + 1.402 * (cr - 128.0) + 0.5))) AS r,
         GREATEST(0, LEAST(255, FLOOR(y - 0.344136 * (cb - 128.0)
                                        - 0.714136 * (cr - 128.0) + 0.5))) AS g,
         GREATEST(0, LEAST(255, FLOOR(y + 1.772 * (cb - 128.0) + 0.5))) AS bb
  FROM ycc
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       3 AS channels,
       ROUND(SUM(r + g + bb) / (3.0 * ANY_VALUE(w) * ANY_VALUE(h)), 4)
         AS byte_mean
FROM rgb GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_jpeg_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode executing in-sandbox (multimodal.
    decode_jpeg): DQT/DHT/SOF0/SOS/DRI marker walk, canonical Huffman
    with 0xFF00 unstuffing and RSTn restarts, DC prediction chains,
    dequantize + inverse zigzag + orthonormal float IDCT, JFIF
    YCbCr->RGB. Decode is map-side Arrow-batched over the binary
    payload column; only (doc_id, dims, mean) ever shuffles — the same
    100 TB shape as the PPM/PNG/BMP legs."""
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.image_decode_features(multimodal.synthetic_jpeg_media(docs))


@register(
    "multimodal_jpeg_phash_dedup",
    # the JPEG leg of the phash dedup contract: gray cells recomputed
    # from the compressed-domain pixel formulas THROUGH the JFIF float
    # conversion, then the identical band-blocked hamming report
    """
WITH dims AS (
  SELECT doc_id, 8 * (2 + doc_id % 3) AS w, 8 * (2 + doc_id % 2) AS h
  FROM documents
), cells AS (
  SELECT doc_id, yy.i * 8 + xx.i AS p, w,
         ((((yy.i * h) // 8) // 8) * (w // 8) + ((xx.i * w) // 8) // 8) AS b
  FROM dims
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) yy
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) xx
), ycc AS (
  SELECT doc_id, p,
         (128 + (doc_id * 7 + 13 * b) % 120 - 60)::DOUBLE AS y,
         (128 + (doc_id * 5 + 11 * b) % 40 - 20)::DOUBLE AS cb,
         (128 + (doc_id * 3 + 17 * b) % 40 - 20)::DOUBLE AS cr
  FROM cells
), gray_cells AS (
  SELECT doc_id, p,
         (CAST(GREATEST(0, LEAST(255, FLOOR(y + 1.402 * (cr - 128.0) + 0.5))) AS BIGINT)
          + CAST(GREATEST(0, LEAST(255, FLOOR(y - 0.344136 * (cb - 128.0)
                                   - 0.714136 * (cr - 128.0) + 0.5))) AS BIGINT)
          + CAST(GREATEST(0, LEAST(255, FLOOR(y + 1.772 * (cb - 128.0) + 0.5))) AS BIGINT)
         ) // 3 AS gray
  FROM ycc
), tot AS (
  SELECT doc_id, p, gray, SUM(gray) OVER (PARTITION BY doc_id) AS total
  FROM gray_cells
), ph AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN p < 63 AND gray * 64 > total
                       THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS phash
  FROM tot GROUP BY doc_id
), groups AS (
  SELECT phash, COUNT(*) AS sz FROM ph GROUP BY phash
), bands AS (
  SELECT phash, sz, b.i AS band, (phash >> (b.i * 16)) & 65535 AS key
  FROM groups CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) b
), cand AS (
  SELECT DISTINCT a.phash AS ap, b.phash AS bp, a.sz AS sa, b.sz AS sb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.phash < b.phash
)
SELECT (SELECT CAST(SUM(sz) AS BIGINT) FROM groups) AS n_images,
       (SELECT COUNT(*) FROM groups) AS n_distinct_hashes,
       (SELECT CAST(SUM(sz) - COUNT(*) AS BIGINT) FROM groups) AS exact_dup_images,
       COUNT(CASE WHEN bit_count(CAST(xor(ap, bp) AS BIGINT)) <= 2 THEN 1 END) AS n_near_hash_pairs,
       CAST(COALESCE(SUM(CASE WHEN bit_count(CAST(xor(ap, bp) AS BIGINT)) <= 2
                         THEN sa * sb END), 0) AS BIGINT) AS near_dup_mass
FROM cand
""",
)
def multimodal_jpeg_phash_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup detection over REAL decoded JPEG payloads:
    the full baseline-JPEG decoder (Huffman + IDCT + JFIF conversion)
    runs inside the Arrow batch, then the identical 63-bit average-hash
    -> 4x16-bit band-blocked hamming join as the PPM leg — proving the
    new codec composes with the multimodal dedup family end to end.
    Shuffles carry 16-bit band keys, never pixels."""
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.synthetic_jpeg_media(docs)
    return _phash_dedup_report(multimodal.image_phash(media))


@register(
    "dedup_downweight",
    # SlimPajama-style soft dedup: same exact-Jaccard pair graph walked
    # to components (recursive CTE), then weight = 1/|component|
    f"""
WITH RECURSIVE g AS (
  SELECT doc_id, {_GRAMS} AS grams FROM documents
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
        / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
), edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION ALL
  SELECT b_id AS u, a_id AS v FROM pairs
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT d.doc_id,
         LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS component_id
  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
  GROUP BY d.doc_id
), sizes AS (
  SELECT component_id, COUNT(*) AS component_size FROM comp GROUP BY 1
)
SELECT c.doc_id, c.component_id,
       s.component_size::BIGINT AS component_size,
       FLOOR(1.0 / s.component_size * 1e6 + 0.5) / 1e6 AS weight
FROM comp c JOIN sizes s USING (component_id)
ORDER BY c.doc_id
""",
)
def dedup_downweight_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import dedup

    documents = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(documents, threshold=0.8)
    return dedup.dedup_downweight(documents, pairs)


@register(
    "sql_collation_distinct",
    # Spark-4 collation surface: COUNT(DISTINCT x) under UTF8_LCASE
    # equals DuckDB's COUNT(DISTINCT lower(x)); the mixed-case relation
    # is synthesized deterministically from doc_id parity
    """
WITH mixed AS (
  SELECT lang,
         CASE WHEN doc_id % 3 = 0 THEN upper(source)
              WHEN doc_id % 3 = 1 THEN source
              ELSE concat(upper(substr(source, 1, 1)), substr(source, 2)) END AS s
  FROM documents
)
SELECT lang,
       COUNT(DISTINCT lower(s))::BIGINT AS n_sources_ci,
       COUNT(DISTINCT s)::BIGINT AS n_sources_cs,
       COUNT(*)::BIGINT AS n_docs
FROM mixed GROUP BY lang ORDER BY lang
""",
)
def sql_collation_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION surface (public SQL feature, SPARK-46830):
    string comparison semantics declared on the COLUMN, not hand-lower()ed
    at every call site. COUNT(DISTINCT s COLLATE UTF8_LCASE) counts
    case-insensitive distinct sources; the binary-collation count runs
    alongside to show the two semantics diverge on the synthesized
    mixed-case values. Catalyst plans the collated distinct as an
    ordinary two-phase aggregate — partial per partition, one shuffle
    on (lang, collation key) — so the construct is scale-neutral."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = docs.select(
        "lang",
        F.when(F.col("doc_id") % 3 == 0, F.upper("source"))
        .when(F.col("doc_id") % 3 == 1, F.col("source"))
        .otherwise(
            # NOT initcap (which also lowercases the tail): mirror the
            # oracle's concat(upper(first), rest) byte-for-byte
            F.concat(
                F.upper(F.substring("source", 1, 1)),
                F.expr("substring(source, 2)"),
            )
        )
        .alias("s"),
    )
    return (
        mixed.groupBy("lang")
        .agg(
            F.countDistinct(F.collate(F.col("s"), "UTF8_LCASE")).alias("n_sources_ci"),
            F.countDistinct("s").alias("n_sources_cs"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("lang")
    )


@register(
    "readability_report",
    # Flesch with deterministic proxies; identical run-count regexes
    # and the floor(x*1e4+0.5) quantization on the same IEEE doubles
    """
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_words,
         len(regexp_extract_all(text, '[.!?]+'))::BIGINT AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_syllables
  FROM documents
), f AS (
  SELECT doc_id, n_words, n_sentences, n_syllables,
         FLOOR((206.835
                - 1.015 * (GREATEST(n_words, 1)::DOUBLE
                           / GREATEST(n_sentences, 1)::DOUBLE)
                - 84.6 * (n_syllables::DOUBLE
                          / GREATEST(n_words, 1)::DOUBLE)) * 1e4 + 0.5) / 1e4
           AS flesch
  FROM c
)
SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
       CASE WHEN flesch >= 90 THEN 'very_easy'
            WHEN flesch >= 70 THEN 'easy'
            WHEN flesch >= 50 THEN 'medium'
            WHEN flesch >= 30 THEN 'hard'
            ELSE 'very_hard' END AS grade
FROM f ORDER BY doc_id
""",
)
def readability_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.readability_report(load_table(spark, sf_dir, "documents"))


@register(
    "code_prose_report",
    # same symbol/keyword/indent counts and threshold rule in SQL
    """
WITH c AS (
  SELECT doc_id,
         length(text)::BIGINT AS n_chars,
         len(regexp_extract_all(text, '[{}();=<>\\[\\]]'))::BIGINT AS n_symbol_chars,
         len(regexp_extract_all(text,
             '\\b(def|return|import|class|function|var|const|if|for)\\b'))::BIGINT
           AS n_code_keywords,
         len(list_filter(string_split(text, chr(10)),
                         ln -> regexp_matches(ln, '^(  |\\t)')))::BIGINT
           AS n_indented_lines
  FROM documents
), r AS (
  SELECT *, FLOOR(n_symbol_chars::DOUBLE / GREATEST(n_chars, 1)::DOUBLE * 1e6
                  + 0.5) / 1e6 AS symbol_ratio
  FROM c
)
SELECT doc_id, n_chars, n_symbol_chars, n_code_keywords, n_indented_lines,
       symbol_ratio,
       (symbol_ratio >= 0.04 OR n_code_keywords >= 3) AS is_code
FROM r ORDER BY doc_id
""",
)
def code_prose_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.code_prose_report(load_table(spark, sf_dir, "documents"))


@register(
    "bradley_terry_arena",
    # arena-style BT fit in exact bigint micro-units: the 12-round
    # minorization is replayed by a recursive CTE over score LISTS,
    # every term one exact integer floor division
    """
WITH RECURSIVE seq AS (
  SELECT user_id, event_type, value,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS b_type,
         LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS b_value
  FROM events
), matches AS (
  SELECT CASE WHEN value > b_value THEN event_type ELSE b_type END AS winner,
         CASE WHEN value > b_value THEN b_type ELSE event_type END AS loser
  FROM seq
  WHERE b_type IS NOT NULL AND b_type <> event_type AND value <> b_value
), wd AS (
  SELECT winner, loser, COUNT(*)::BIGINT AS n FROM matches GROUP BY 1, 2
), und AS (
  SELECT i, j, SUM(n)::BIGINT AS m FROM (
    SELECT winner AS i, loser AS j, n FROM wd
    UNION ALL
    SELECT loser AS i, winner AS j, n FROM wd
  ) GROUP BY 1, 2
), types AS (
  SELECT i AS t, ROW_NUMBER() OVER (ORDER BY i) AS idx
  FROM (SELECT DISTINCT i FROM und)
), nt AS (SELECT COUNT(*)::BIGINT AS n FROM types
), wl AS (
  SELECT list(COALESCE(ww.w, 0) ORDER BY types.idx) AS w
  FROM types LEFT JOIN (
    SELECT winner AS t, SUM(n)::BIGINT AS w FROM wd GROUP BY 1) ww USING (t)
), mm AS (
  SELECT list(row ORDER BY idx) AS m FROM (
    SELECT ti.idx AS idx, list(COALESCE(u.m, 0) ORDER BY tj.idx) AS row
    FROM types ti CROSS JOIN types tj
    LEFT JOIN und u ON u.i = ti.t AND u.j = tj.t
    GROUP BY ti.idx)
), fit(it, s) AS (
  SELECT 0, (SELECT list(CAST(1000000 AS BIGINT) ORDER BY idx) FROM types)
  UNION ALL
  SELECT it + 1,
         list_transform(stepped, x -> (x * n * 1000000) // tot)
  FROM (
    SELECT it, n,
           list_reduce(stepped, (a, b) -> a + b) AS tot, stepped
    FROM (
      SELECT f.it AS it, nt.n AS n,
             list_transform(range(len(f.s)), k -> CASE
               WHEN list_reduce(list_transform(range(len(f.s)), j2 -> CASE
                      WHEN mm.m[k + 1][j2 + 1] = 0 THEN 0
                      ELSE (mm.m[k + 1][j2 + 1] * 1000000000000)
                           // (f.s[k + 1] + f.s[j2 + 1]) END),
                    (a, b) -> a + b) > 0
               THEN (wl.w[k + 1] * 1000000000000)
                    // list_reduce(list_transform(range(len(f.s)), j2 -> CASE
                         WHEN mm.m[k + 1][j2 + 1] = 0 THEN 0
                         ELSE (mm.m[k + 1][j2 + 1] * 1000000000000)
                              // (f.s[k + 1] + f.s[j2 + 1]) END),
                       (a, b) -> a + b)
               ELSE f.s[k + 1] END) AS stepped
      FROM fit f, nt, wl, mm WHERE f.it < 12))
), final_s AS (
  SELECT s FROM fit WHERE it = 12
), per_type AS (
  SELECT t.t AS event_type, t.idx,
         (SELECT COALESCE(SUM(n), 0) FROM wd WHERE winner = t.t)::BIGINT AS n_wins,
         (SELECT COALESCE(SUM(m), 0) FROM und WHERE i = t.t)::BIGINT AS n_matches,
         f.s[t.idx] / 1e6 AS bt_score
  FROM types t, final_s f
)
SELECT event_type, n_wins, n_matches, bt_score,
       ROW_NUMBER() OVER (ORDER BY bt_score DESC, event_type)::BIGINT AS rank
FROM per_type ORDER BY event_type
""",
)
def bradley_terry_arena_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.bradley_terry_strengths(load_events(spark, sf_dir))


@register(
    "pivot_event_matrix",
    # .pivot() relational surface: per-user event-type count matrix +
    # summed value; DuckDB mirrors with conditional aggregates
    """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END)::BIGINT AS n_click,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END)::BIGINT AS n_view,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)::BIGINT AS n_purchase,
       FLOOR(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN value END), 0)
             * 1e4 + 0.5) / 1e4 AS purchase_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def pivot_event_matrix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RelationalGroupedDataset.pivot with an EXPLICIT value list — the
    wide event-type matrix every feature store materializes. Explicit
    values matter at scale: without them Spark runs an extra distinct
    pass AND the column set becomes data-dependent (schema drift);
    pinned values keep it one partial-agg shuffle, same plan as any
    groupBy. Purchase value is quantized half-up; count columns are
    exact."""
    events = load_events(spark, sf_dir)
    piv = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(
            # count(*) is rejected inside Pivot — count(lit(1)) is the
            # supported equivalent
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("v"),
        )
    )
    return piv.select(
        "user_id",
        F.coalesce("click_n", F.lit(0)).cast("long").alias("n_click"),
        F.coalesce("view_n", F.lit(0)).cast("long").alias("n_view"),
        F.coalesce("purchase_n", F.lit(0)).cast("long").alias("n_purchase"),
        (
            F.floor(F.coalesce("purchase_v", F.lit(0.0)) * 1e4 + F.lit(0.5)) / 1e4
        ).alias("purchase_value"),
    ).orderBy("user_id")


@register(
    "kcore_decomposition",
    # recursive peel over the packed node list with a dense adjacency
    # list-of-lists; fixed point selected by the `done` sentinel row
    """
WITH RECURSIVE e AS (
  SELECT DISTINCT user_id % 100 AS u, 100 + event_id % 100 AS v FROM events
), ed AS (
  SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e
), ids AS (
  SELECT UNNEST(range(200)) AS id
), adj AS (
  SELECT list(nbrs ORDER BY id) AS a FROM (
    SELECT ids.id AS id,
           COALESCE(list(ed.v ORDER BY ed.v) FILTER (ed.v IS NOT NULL), [])
             AS nbrs
    FROM ids LEFT JOIN ed ON ed.u = ids.id
    GROUP BY ids.id)
), peel(it, nodes, done) AS (
  SELECT 0, (SELECT list(id ORDER BY id) FROM ids), false
  UNION ALL
  SELECT q.it + 1, q.new, q.new = q.nodes
  FROM (
    SELECT p.it AS it, p.nodes AS nodes,
           list_filter(p.nodes,
             n -> len(list_intersect(adj.a[n + 1], p.nodes)) >= 3) AS new
    FROM peel p, adj
    WHERE NOT p.done AND p.it < 250) q
), core AS (
  SELECT nodes FROM peel WHERE done ORDER BY it LIMIT 1
)
SELECT un.n::BIGINT AS node,
       len(list_intersect(a.a[un.n + 1], c.nodes))::BIGINT AS core_degree
FROM core c, adj a, LATERAL (SELECT UNNEST(c.nodes) AS n) un
ORDER BY node
""",
)
def kcore_decomposition_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import relational

    return relational.kcore_decomposition(load_events(spark, sf_dir))


@register(
    "transpose_lang_stats",
    # DataFrame.transpose (Spark 4.0): the 3x5 per-language stats
    # matrix flipped to metric rows; oracle = explicit UNION of the
    # three conditional-aggregate rows
    """
WITH s AS (
  SELECT lang, COUNT(*)::DOUBLE AS n_docs,
         SUM(length(text))::DOUBLE AS total_chars,
         SUM(len(regexp_extract_all(text, '\\S+')))::DOUBLE AS total_words
  FROM documents GROUP BY lang
)
SELECT 'n_docs' AS key,
       MAX(CASE WHEN lang = 'de' THEN n_docs END) AS de,
       MAX(CASE WHEN lang = 'en' THEN n_docs END) AS en,
       MAX(CASE WHEN lang = 'es' THEN n_docs END) AS es,
       MAX(CASE WHEN lang = 'fr' THEN n_docs END) AS fr,
       MAX(CASE WHEN lang = 'zh' THEN n_docs END) AS zh
FROM s
UNION ALL
SELECT 'total_chars',
       MAX(CASE WHEN lang = 'de' THEN total_chars END),
       MAX(CASE WHEN lang = 'en' THEN total_chars END),
       MAX(CASE WHEN lang = 'es' THEN total_chars END),
       MAX(CASE WHEN lang = 'fr' THEN total_chars END),
       MAX(CASE WHEN lang = 'zh' THEN total_chars END)
FROM s
UNION ALL
SELECT 'total_words',
       MAX(CASE WHEN lang = 'de' THEN total_words END),
       MAX(CASE WHEN lang = 'en' THEN total_words END),
       MAX(CASE WHEN lang = 'es' THEN total_words END),
       MAX(CASE WHEN lang = 'fr' THEN total_words END),
       MAX(CASE WHEN lang = 'zh' THEN total_words END)
FROM s
ORDER BY key
""",
)
def transpose_lang_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (Spark 4.0, public API): the per-language
    stats matrix flipped so metrics become rows and languages become
    columns — the report-layout flip analysts otherwise hand-roll with
    N unions. transpose() collects the (tiny, aggregated) frame's
    index column to derive the schema, so it belongs strictly AFTER
    the reduction: here the input is 5 rows x 4 columns — the
    corpus-sized work happened in the groupBy before it."""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum(F.length("text")).cast("double").alias("total_chars"),
        F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)))
        .cast("double")
        .alias("total_words"),
    )
    out = stats.transpose("lang")
    return out.select(
        "key", "de", "en", "es", "fr", "zh"
    ).orderBy("key")


@register(
    "approx_topk_events",
    # approx_top_k (Spark 4.1 sketch aggregate): exact below sketch
    # capacity, so the DuckDB exact top-3 is the oracle; sorted
    # (count desc, type) for a deterministic boundary
    """
SELECT event_type, COUNT(*)::BIGINT AS n
FROM events GROUP BY event_type
ORDER BY n DESC, event_type LIMIT 3
""",
)
def approx_topk_events_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k (Spark 4.1 SQL aggregate — the Apache DataSketches
    frequent-items path): heavy-hitter event types without a global
    sort. Below sketch capacity (default 10k tracked items vs 5 types
    here) the counts are EXACT, which is what makes the exact-SQL
    oracle valid; at 100 TB the sketch is the point — one pass, fixed
    memory, mergeable across partitions, versus the full groupBy the
    oracle runs."""
    events = load_events(spark, sf_dir)
    sk = events.select(
        F.expr("approx_top_k(event_type, 3)").alias("tk")
    )
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("event_type"),
            F.col("e.count").cast("long").alias("n"),
        )
        .orderBy(F.col("n").desc(), "event_type")
    )


@register(
    "pass_at_k_report",
    # unbiased pass@k (Chen et al. 2021 estimator) per k: the per-user
    # product runs i = 0..k-1 left-to-right in BOTH engines, per-user
    # values quantize to bigint micro-units, sums stay exact
    """
WITH per_task AS (
  SELECT user_id, COUNT(*)::BIGINT AS n,
         COUNT(CASE WHEN value > 1.5 THEN 1 END)::BIGINT AS c
  FROM events GROUP BY user_id
), ks AS (SELECT UNNEST([1, 5, 10]) AS k
), per AS (
  SELECT k, user_id,
         CAST(FLOOR((CASE
           WHEN c = 0 THEN 0.0
           WHEN n - c < LEAST(k, n) THEN 1.0
           ELSE 1.0 - list_reduce(
                  list_transform(range(LEAST(k, n)),
                    i -> (n - c - i)::DOUBLE / (n - i)::DOUBLE),
                  (a, b) -> a * b)
         END) * 1e6 + 0.5) AS BIGINT) AS p_u
  FROM per_task, ks
)
SELECT k::BIGINT AS k, COUNT(*)::BIGINT AS n_tasks,
       FLOOR(SUM(p_u) / COUNT(*) * 1e0 + 0.5) / 1e6 AS pass_at_k
FROM per GROUP BY k ORDER BY k
""",
)
def pass_at_k_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k (the HumanEval/codegen eval estimator, Chen et al. 2021,
    public): per task (user) with n attempts and c successes
    (value > 1.5), pass@k = 1 - C(n-c,k)/C(n,k), computed as the
    telescoping product so no factorials overflow. Per-user values are
    quantized to bigint micro-units BEFORE averaging — the sum is
    exact, so float summation order never enters (the house census
    trick). One user shuffle; k-fan-out is a 3x broadcast."""
    events = load_events(spark, sf_dir)
    per_task = events.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("value") > 1.5, 1)).alias("c"),
    )
    ks = spark.range(0, 1).select(
        F.explode(F.array(F.lit(1), F.lit(5), F.lit(10))).alias("k")
    )
    per = per_task.crossJoin(F.broadcast(ks)).select(
        "k",
        F.floor(
            F.when(F.col("c") == 0, F.lit(0.0))
            .when(F.col("n") - F.col("c") < F.least("k", "n"), F.lit(1.0))
            .otherwise(
                F.lit(1.0)
                - F.aggregate(
                    F.sequence(F.lit(0), F.least("k", "n") - 1),
                    F.lit(1.0),
                    lambda acc, i: acc
                    * (F.col("n") - F.col("c") - i).cast("double")
                    / (F.col("n") - i).cast("double"),
                )
            )
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("p_u"),
    )
    return (
        per.groupBy("k")
        .agg(
            F.count("*").alias("n_tasks"),
            (
                F.floor(F.sum("p_u") / F.count("*") + F.lit(0.5)) / 1e6
            ).alias("pass_at_k"),
        )
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n_tasks").cast("long").alias("n_tasks"),
            "pass_at_k",
        )
        .orderBy("k")
    )


@register(
    "gini_source_concentration",
    # Gini over per-source token mass: rank the 20-cell census, one
    # closed formula on exact integer sums
    """
WITH m AS (
  SELECT source, SUM(len(regexp_extract_all(text, '\\S+')))::BIGINT AS toks
  FROM documents GROUP BY source
), r AS (
  SELECT toks, ROW_NUMBER() OVER (ORDER BY toks, source) AS rk FROM m
)
SELECT COUNT(*)::BIGINT AS n_sources, SUM(toks)::BIGINT AS total_tokens,
       FLOOR((2.0 * SUM(rk * toks) / (COUNT(*) * SUM(toks))
              - (COUNT(*) + 1.0) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS gini
FROM r
""",
)
def gini_source_concentration_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of token mass across sources — the mixture-
    concentration report a data-governance pass runs before weighting
    (G = 2*sum(rank*x)/(n*sum(x)) - (n+1)/n on the ascending-sorted
    census; public formula). The corpus reduces to a 20-cell census in
    one partial-agg shuffle; the rank window runs on 20 rows. All sums
    are exact integers; the formula is one deterministic float
    expression."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.groupBy("source").agg(
        F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)))
        .cast("long")
        .alias("toks")
    )
    r = m.select(
        "toks",
        F.row_number().over(Window.orderBy("toks", "source")).alias("rk"),
    )
    return r.agg(
        F.count("*").cast("long").alias("n_sources"),
        F.sum("toks").cast("long").alias("total_tokens"),
        (
            F.floor(
                (
                    F.lit(2.0) * F.sum(F.col("rk") * F.col("toks"))
                    / (F.count("*") * F.sum("toks"))
                    - (F.count("*") + F.lit(1.0)) / F.count("*")
                )
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("gini"),
    )


@register(
    "dpo_pair_builder",
    # best-vs-worst preference mining on the shared quantized-logit
    # quality model; rank windows + rank-equality join, margin > 0
    f"""
WITH f AS (
  SELECT doc_id, lang, source,
         len({_TOKS})::DOUBLE AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         len(list_filter({_TOKS}, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
           AS n_stop,
         (length(text) - length(replace(text, '.', '')))::DOUBLE AS n_dots
  FROM documents
), wts AS (
  SELECT i.i AS i,
         2 * (CAST(concat('0x', substr(md5('qw:' || i.i), 1, 15)) AS UBIGINT)
              / 1152921504606846976.0) - 1 AS w
  FROM (SELECT UNNEST(range(5)) AS i) i
), z AS (
  SELECT doc_id, lang, source,
         FLOOR(((SELECT w FROM wts WHERE i = 0) * (n_tokens / 100.0)
          + (SELECT w FROM wts WHERE i = 1) * (n_stop / (n_tokens + 1.0))
          + (SELECT w FROM wts WHERE i = 2) * (n_chars / (n_tokens + 1.0))
          + (SELECT w FROM wts WHERE i = 3) * (n_dots / (n_chars + 1.0))
          + (SELECT w FROM wts WHERE i = 4)) * 1e4 + 0.5) / 1e4 AS logit
  FROM f
), chosen AS (
  SELECT lang, source, doc_id AS chosen_id, logit AS logit_c,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY logit DESC, doc_id) AS pair_rank
  FROM z
), rejected AS (
  SELECT lang, source, doc_id AS rejected_id, logit AS logit_r,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY logit ASC, doc_id) AS pair_rank
  FROM z
)
SELECT c.lang, c.source, c.pair_rank::BIGINT AS pair_rank,
       c.chosen_id, r.rejected_id,
       FLOOR((c.logit_c - r.logit_r) * 1e4 + 0.5) / 1e4 AS margin
FROM chosen c
JOIN rejected r USING (lang, source, pair_rank)
WHERE c.pair_rank <= 2 AND r.pair_rank <= 2
  AND c.chosen_id <> r.rejected_id
  AND FLOOR((c.logit_c - r.logit_r) * 1e4 + 0.5) / 1e4 > 0
ORDER BY lang, source, pair_rank
""",
)
def dpo_pair_builder_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.dpo_pair_builder(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Round-5 additions: causal matching, sequential testing, embedding
# compression, feature hashing, ER blocking.
# ---------------------------------------------------------------------------
@register(
    "cem_att_estimate",
    # coarsened-exact-matching ATT: 10-cell activity coarsening, cells
    # with both arms matched, ATT = treated-weighted cell difference
    """
WITH pu AS (
  SELECT user_id, user_id % 2 AS arm, COUNT(*) AS n_ev,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
), cells AS (
  SELECT LEAST(n_ev // 5, 9) AS b,
         SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
         SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS k0,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS k1
  FROM pu GROUP BY 1
), matched AS (
  SELECT *, FLOOR((CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0) * 1e6
                  + 0.5) AS dq
  FROM cells WHERE n0 > 0 AND n1 > 0
)
SELECT COUNT(*)::BIGINT AS n_cells_matched,
       SUM(n1)::BIGINT AS n_treated_matched,
       FLOOR(SUM(dq * n1) / SUM(n1) / 1e6 * 1e6 + 0.5) / 1e6 AS att_cem
FROM matched
""",
)
def cem_att_estimate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarsened Exact Matching ATT (Iacus, King & Porro 2012 — public
    method): coarsen the confounder (activity count) into 10 bins,
    keep only bins where BOTH arms appear (common support), and
    estimate the treatment effect on the treated as the
    treated-weighted mean of per-bin arm differences. The matching
    complement of ipw_treatment_effect: CEM prunes off-support units
    instead of reweighting them.

    Determinism: the (bin, arm) census is exact ints; each bin's
    difference quantizes to a 1e-6 int BEFORE the treated-weighted
    mean; the headline ATT is one fixed IEEE expression.

    Plan shape / 100 TB: one user shuffle -> 10-cell census ->
    census algebra. Linear; no window, no join."""
    events = load_events(spark, sf_dir)
    pu = events.groupBy(
        "user_id", F.pmod(F.col("user_id"), F.lit(2)).alias("arm")
    ).agg(
        F.count("*").alias("n_ev"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv"),
    )
    cells = pu.groupBy(
        F.least(F.floor(F.col("n_ev") / 5), F.lit(9)).alias("b")
    ).agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("k0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("k1"),
    )
    matched = cells.filter((F.col("n0") > 0) & (F.col("n1") > 0)).withColumn(
        "dq",
        F.floor(
            (
                F.col("k1").cast("double") / F.col("n1")
                - F.col("k0").cast("double") / F.col("n0")
            )
            * 1e6
            + F.lit(0.5)
        ),
    )
    return matched.agg(
        F.count("*").cast("long").alias("n_cells_matched"),
        F.sum("n1").cast("long").alias("n_treated_matched"),
        (
            F.floor(F.sum(F.col("dq") * F.col("n1")) / F.sum("n1") / 1e6 * 1e6 + F.lit(0.5))
            / 1e6
        ).alias("att_cem"),
    )


# SPRT increments for H0: p=0.15 vs H1: p=0.20 on the per-event purchase
# indicator, quantized to exact 1e-9 integers so the running sum is
# integer arithmetic in both engines:
#   a = floor(ln(0.20/0.15)*1e9 + 0.5), b = floor(ln(0.80/0.85)*1e9 + 0.5)
#   A = floor(ln((1-beta)/alpha)*1e9 + 0.5) with alpha = beta = 0.05
_SPRT_A_INC = 287682072
_SPRT_B_INC = -60624622
_SPRT_BOUND = 2944438979


@register(
    "sprt_sequential_test",
    # day census -> cumulative day offsets (tiny window) -> within-day
    # running LLR -> first boundary crossing by (ts, event_id)
    f"""
WITH ev AS (
  SELECT ts, event_id, DATE_TRUNC('day', ts) AS d,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
  FROM events
), days AS (
  SELECT d, COUNT(*) AS n, SUM(x) AS k FROM ev GROUP BY 1
), offs AS (
  SELECT d,
         COALESCE(SUM(n) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_prev,
         COALESCE(SUM(k) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k_prev
  FROM days
), run AS (
  SELECT ev.ts, ev.event_id,
         o.n_prev + SUM(1) OVER w AS n_cum,
         o.k_prev + SUM(ev.x) OVER w AS k_cum
  FROM ev JOIN offs o USING (d)
  WINDOW w AS (PARTITION BY ev.d ORDER BY ev.ts, ev.event_id
               ROWS UNBOUNDED PRECEDING)
), llr AS (
  SELECT ts, event_id, n_cum,
         {_SPRT_A_INC} * k_cum + {_SPRT_B_INC} * (n_cum - k_cum) AS q
  FROM run
), crossing AS (
  SELECT CASE WHEN q >= {_SPRT_BOUND} THEN 'accept_h1'
              ELSE 'accept_h0' END AS decision,
         n_cum AS n_trials, q, 0 AS pri, ts, event_id
  FROM llr WHERE q >= {_SPRT_BOUND} OR q <= -{_SPRT_BOUND}
), final AS (
  SELECT 'continue' AS decision, n_cum AS n_trials, q, 1 AS pri, ts, event_id
  FROM llr ORDER BY n_cum DESC LIMIT 1
), u AS (
  SELECT * FROM crossing UNION ALL SELECT * FROM final
)
SELECT decision, n_trials::BIGINT AS n_trials,
       FLOOR(q / 1e9 * 1e6 + 0.5) / 1e6 AS llr
FROM u ORDER BY pri, ts, event_id LIMIT 1
""",
)
def sprt_sequential_test_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential probability ratio test (Wald 1945 — public method) on
    the per-event purchase indicator: H0 p=0.15 vs H1 p=0.20 at
    alpha = beta = 0.05; the test walks the event stream in (ts,
    event_id) order accumulating the log-likelihood ratio and stops at
    the FIRST event whose running LLR leaves (-ln 19, +ln 19) — the
    always-valid early-stopping complement of the fixed-horizon
    ab_test_report / srm_check family.

    Determinism: both per-trial increments are pre-quantized 1e-9
    integer constants, so the running LLR is exact integer arithmetic;
    the crossing event is selected by (ts, event_id) — a total order.

    Plan shape / 100 TB: the GLOBAL running sum is decomposed as day
    census (one partial-agg shuffle) -> cumulative day offsets (a
    window over tens of rows) -> within-day running sums (window
    PARTITIONED BY day — parallel, never a single global sort
    partition) -> TakeOrdered(1) for the first crossing. Linear."""
    events = load_events(spark, sf_dir)
    ev = events.select(
        "ts",
        "event_id",
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("x"),
    )
    days = ev.groupBy("d").agg(F.count("*").alias("n"), F.sum("x").alias("k"))
    woff = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    offs = days.select(
        "d",
        F.coalesce(F.sum("n").over(woff), F.lit(0)).alias("n_prev"),
        F.coalesce(F.sum("k").over(woff), F.lit(0)).alias("k_prev"),
    )
    w = (
        Window.partitionBy("d")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = ev.join(F.broadcast(offs), "d").select(
        "ts",
        "event_id",
        (F.col("n_prev") + F.count("*").over(w)).alias("n_cum"),
        (F.col("k_prev") + F.sum("x").over(w)).alias("k_cum"),
    )
    llr = run.select(
        "ts",
        "event_id",
        "n_cum",
        (
            F.lit(_SPRT_A_INC) * F.col("k_cum")
            + F.lit(_SPRT_B_INC) * (F.col("n_cum") - F.col("k_cum"))
        ).alias("q"),
    )
    crossing = llr.filter(
        (F.col("q") >= _SPRT_BOUND) | (F.col("q") <= -_SPRT_BOUND)
    ).select(
        F.when(F.col("q") >= _SPRT_BOUND, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
        F.col("n_cum").alias("n_trials"),
        "q",
        F.lit(0).alias("pri"),
        "ts",
        "event_id",
    )
    final = (
        llr.orderBy(F.col("n_cum").desc())
        .limit(1)
        .select(
            F.lit("continue").alias("decision"),
            F.col("n_cum").alias("n_trials"),
            "q",
            F.lit(1).alias("pri"),
            "ts",
            "event_id",
        )
    )
    return (
        crossing.unionByName(final)
        .orderBy("pri", "ts", "event_id")
        .limit(1)
        .select(
            "decision",
            F.col("n_trials").cast("long").alias("n_trials"),
            (F.floor(F.col("q") / 1e9 * 1e6 + F.lit(0.5)) / 1e6).alias("llr"),
        )
    )


@register(
    "embedding_random_projection",
    # +/-1 sign matrix from the house md5 convention; per-element 1e-6
    # quantization BEFORE the integer dot products, so both engines sum
    # exact ints; norms/distortion are single IEEE expressions at the end
    """
WITH proj AS (
  SELECT vec_id, k.k AS k,
         list_aggregate(list_transform(embedding, (x, i) ->
           CAST(FLOOR(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
           * (2 * (CAST(concat('0x', substr(md5((i - 1) || ':' || k.k), 1, 15))
                   AS UBIGINT)::BIGINT % 2) - 1)), 'sum') AS pq
  FROM embeddings CROSS JOIN (SELECT UNNEST(range(16)) AS k) k
), pv AS (
  SELECT vec_id, SUM(pq * pq) AS proj_sq FROM proj GROUP BY 1
), ov AS (
  SELECT vec_id, list_aggregate(list_transform(embedding, x ->
           CAST(FLOOR(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
           * CAST(FLOOR(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT)), 'sum')
         AS orig_sq
  FROM embeddings
)
SELECT vec_id,
       FLOOR(sqrt(CAST(orig_sq AS DOUBLE)) + 0.5) / 1e6 AS orig_norm,
       FLOOR(sqrt(CAST(proj_sq AS DOUBLE) / 16.0) + 0.5) / 1e6 AS proj_norm,
       FLOOR(sqrt(CAST(proj_sq AS DOUBLE) / 16.0)
             / sqrt(CAST(orig_sq AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS distortion
FROM pv JOIN ov USING (vec_id)
ORDER BY vec_id
""",
)
def embedding_random_projection_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection (Achlioptas 2003
    database-friendly +/-1 variant — public method): compress each
    embedding from d dims to m=16 with a deterministic sign matrix
    s(j,k) derived from the house md5 convention, and report per-vector
    norm distortion |Pv|/|v| — the acceptance gate a pipeline runs
    before switching its ANN index to the compressed vectors.

    Determinism: elements quantize to 1e-6 ints BEFORE the dot
    products, so projections are exact integer sums in both engines;
    the sign matrix is pure md5 bits; norms are single IEEE sqrt
    expressions over exact ints.

    Plan shape / 100 TB: the sign matrix is 256 x 16 rows built from
    spark.range — broadcast; posexplode fans each vector to d rows
    map-side, the broadcast join fans x16, and partial aggregation
    collapses to (vec, k) BEFORE the one shuffle. Linear in corpus,
    never a vector-vector pair."""
    emb = load_table(spark, sf_dir, "embeddings")
    elems = emb.select(
        "vec_id", F.posexplode("embedding").alias("j", "x")
    ).select(
        "vec_id",
        "j",
        F.floor(F.col("x").cast("double") * 1e6 + F.lit(0.5)).cast("long").alias("vq"),
    )
    # 256 covers any dim up to 256 (join keeps only j values present)
    signs = (
        spark.range(256)
        .select(F.col("id").alias("j"))
        .crossJoin(spark.range(16).select(F.col("id").alias("k")))
        .select(
            "j",
            "k",
            (
                F.lit(2)
                * F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws(":", F.col("j"), F.col("k"))), 1, 15
                        ),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(2),
                )
                - F.lit(1)
            ).alias("sgn"),
        )
    )
    proj = (
        elems.join(F.broadcast(signs), "j")
        .groupBy("vec_id", "k")
        .agg(F.sum(F.col("vq") * F.col("sgn")).alias("pq"))
    )
    pv = proj.groupBy("vec_id").agg(F.sum(F.col("pq") * F.col("pq")).alias("proj_sq"))
    ov = elems.groupBy("vec_id").agg(F.sum(F.col("vq") * F.col("vq")).alias("orig_sq"))
    return (
        pv.join(ov, "vec_id")
        .select(
            "vec_id",
            (F.floor(F.sqrt(F.col("orig_sq").cast("double")) + F.lit(0.5)) / 1e6).alias(
                "orig_norm"
            ),
            (
                F.floor(F.sqrt(F.col("proj_sq").cast("double") / F.lit(16.0)) + F.lit(0.5))
                / 1e6
            ).alias("proj_norm"),
            (
                F.floor(
                    F.sqrt(F.col("proj_sq").cast("double") / F.lit(16.0))
                    / F.sqrt(F.col("orig_sq").cast("double"))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("distortion"),
        )
        .orderBy("vec_id")
    )


@register(
    "feature_hashing_vectors",
    # hashing-trick bag-of-words: bucket = md5 % 64, sign = next md5 bit;
    # per-bucket integer sums, then per-doc nnz / l2sq / deterministic argmax
    """
WITH tok AS (
  SELECT doc_id, UNNEST(regexp_extract_all(text, '\\S+')) AS t FROM documents
), hashed AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(t), 1, 15)) AS UBIGINT)::BIGINT AS h
  FROM tok
), bucketed AS (
  SELECT doc_id, h % 64 AS b, SUM(2 * ((h // 64) % 2) - 1) AS val
  FROM hashed GROUP BY 1, 2
), nz AS (
  SELECT * FROM bucketed WHERE val <> 0
), ranked AS (
  SELECT doc_id, b,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY ABS(val) DESC, b) AS rn
  FROM nz
), agg AS (
  SELECT doc_id, COUNT(*)::BIGINT AS nnz, SUM(val * val)::BIGINT AS l2sq
  FROM nz GROUP BY 1
)
SELECT a.doc_id, a.nnz, a.l2sq, r.b::BIGINT AS top_bucket
FROM agg a JOIN ranked r ON a.doc_id = r.doc_id AND r.rn = 1
ORDER BY a.doc_id
""",
)
def feature_hashing_vectors_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing / the hashing trick (Weinberger et al. 2009 —
    public method): project each document's bag-of-words into a fixed
    64-bucket signed vector (bucket = token-hash mod 64, sign = the
    next hash bit, so collisions cancel in expectation) — the
    vocabulary-free featurization step of a large-scale text
    classifier. Reports per-doc sparsity (nnz), energy (l2sq) and the
    dominant bucket (deterministic argmax: largest |value|, lowest
    bucket on ties).

    Plan shape / 100 TB: tokens hash map-side (JVM md5, codegen);
    partial aggregation collapses to (doc, bucket<=64) before the one
    shuffle; the argmax is a 64-row-per-doc window. Linear."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).alias("t"),
    )
    hashed = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("t")), 1, 15), 16, 10).cast("long").alias("h"),
    )
    # sign bit = bit 6 of the hash: shiftright keeps the arithmetic exact
    # on 60-bit values (a double division would round above 2^53)
    bucketed = hashed.groupBy(
        "doc_id", F.pmod(F.col("h"), F.lit(64)).alias("b")
    ).agg(
        F.sum(
            F.lit(2) * F.pmod(F.shiftright(F.col("h"), 6), F.lit(2)) - F.lit(1)
        ).alias("val")
    )
    nz = bucketed.filter(F.col("val") != 0)
    ranked = nz.select(
        "doc_id",
        "b",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy(F.abs(F.col("val")).desc(), "b"))
        .alias("rn"),
    )
    agg = nz.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("nnz"),
        F.sum(F.col("val") * F.col("val")).cast("long").alias("l2sq"),
    )
    return (
        agg.join(ranked.filter(F.col("rn") == 1), "doc_id")
        .select("doc_id", "nnz", "l2sq", F.col("b").cast("long").alias("top_bucket"))
        .orderBy("doc_id")
    )


@register(
    "er_sorted_neighborhood",
    # sorted-neighborhood blocking: first-token blocks, name-sorted
    # windows of 2 trailing neighbors, token-Jaccard on candidate pairs
    """
WITH p AS (
  SELECT p_partkey, p_name,
         split_part(p_name, ' ', 1) AS blk,
         list_distinct(string_split(p_name, ' ')) AS toks
  FROM part
), nbr AS (
  SELECT p_partkey AS a_key, p_name AS a_name, toks AS a_toks,
         LEAD(p_partkey, 1) OVER w AS b1_key,
         LEAD(toks, 1) OVER w AS b1_toks,
         LEAD(p_partkey, 2) OVER w AS b2_key,
         LEAD(toks, 2) OVER w AS b2_toks
  FROM p
  WINDOW w AS (PARTITION BY blk ORDER BY p_name, p_partkey)
), pairs AS (
  SELECT a_key, b1_key AS b_key, a_toks AS x, b1_toks AS y FROM nbr
  WHERE b1_key IS NOT NULL
  UNION ALL
  SELECT a_key, b2_key AS b_key, a_toks AS x, b2_toks AS y FROM nbr
  WHERE b2_key IS NOT NULL
)
SELECT a_key, b_key,
       FLOOR(CAST(len(list_intersect(x, y)) AS DOUBLE)
             / len(list_distinct(list_concat(x, y))) * 1e6 + 0.5) / 1e6 AS sim
FROM pairs
WHERE len(list_intersect(x, y)) > 0
ORDER BY a_key, b_key
""",
)
def er_sorted_neighborhood_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking (Hernandez &
    Stolfo 1995 — public method): sort records by a blocking key
    (name), slide a fixed window, and compare only window neighbors —
    the linear-candidate-generation alternative to the O(n^2)
    cross-join an ER pass would otherwise need. Candidates are the 2
    trailing neighbors within the first-token block; the comparator is
    token-set Jaccard (quantized 1e-6), emitting candidate pairs that
    share at least one token.

    Plan shape / 100 TB: blocks partition the sort (PARTITION BY blk —
    parallel window, never a single global sort partition; the classic
    multi-pass variant adds a second key, same shape); lead() makes
    candidate generation linear with fan-out = window size, and the
    Jaccard runs on tiny in-row token arrays. No join at all."""
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        "p_name",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
        F.array_distinct(F.split(F.col("p_name"), " ")).alias("toks"),
    )
    w = Window.partitionBy("blk").orderBy("p_name", "p_partkey")
    nbr = p.select(
        F.col("p_partkey").alias("a_key"),
        F.col("toks").alias("a_toks"),
        F.lead("p_partkey", 1).over(w).alias("b1_key"),
        F.lead("toks", 1).over(w).alias("b1_toks"),
        F.lead("p_partkey", 2).over(w).alias("b2_key"),
        F.lead("toks", 2).over(w).alias("b2_toks"),
    )
    pairs = (
        nbr.filter(F.col("b1_key").isNotNull())
        .select(
            "a_key",
            F.col("b1_key").alias("b_key"),
            F.col("a_toks").alias("x"),
            F.col("b1_toks").alias("y"),
        )
        .unionByName(
            nbr.filter(F.col("b2_key").isNotNull()).select(
                "a_key",
                F.col("b2_key").alias("b_key"),
                F.col("a_toks").alias("x"),
                F.col("b2_toks").alias("y"),
            )
        )
    )
    inter = F.size(F.array_intersect(F.col("x"), F.col("y")))
    union = F.size(F.array_union(F.col("x"), F.col("y")))
    return (
        pairs.filter(inter > 0)
        .select(
            "a_key",
            "b_key",
            (F.floor(inter.cast("double") / union * 1e6 + F.lit(0.5)) / 1e6).alias(
                "sim"
            ),
        )
        .orderBy("a_key", "b_key")
    )


@register(
    "psm_att_matched",
    # 1-NN propensity matching: each treated user matched to the
    # nearest preceding control in (score, side, user_id) order via a
    # single IGNORE NULLS carry-forward window (the as-of primitive)
    """
WITH pu AS (
  SELECT user_id, user_id % 2 AS side, COUNT(*) AS score,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
), ord AS (
  SELECT side, score, conv,
         last_value(CASE WHEN side = 0 THEN
             struct_pack(s := score, c := conv) END IGNORE NULLS)
           OVER (ORDER BY score, side, user_id
                 ROWS UNBOUNDED PRECEDING) AS ctl
  FROM pu
), t AS (
  SELECT score, conv, ctl FROM ord WHERE side = 1
)
SELECT COUNT(*)::BIGINT AS n_treated,
       COUNT(ctl)::BIGINT AS n_matched,
       FLOOR(SUM(CASE WHEN ctl IS NOT NULL THEN conv - ctl.c END)
             * 1e6 / COUNT(ctl) + 0.5) / 1e6 AS att_psm,
       FLOOR(SUM(CASE WHEN ctl IS NOT NULL THEN score - ctl.s END)
             * 1e6 / COUNT(ctl) + 0.5) / 1e6 AS mean_score_gap
FROM t
""",
)
def psm_att_matched_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity-score 1-NN matching ATT (Rosenbaum & Rubin 1983 —
    public method): every treated user is matched to the nearest
    control at or below its propensity score (activity count), ties
    resolved by the (score, side, user_id) total order, and the effect
    on the treated is the mean matched outcome difference — the
    matching-with-replacement complement of CEM's cell pruning and
    IPW's reweighting.

    Determinism: the match is an as-of carry-forward over a total
    order; outcomes are 0/1 ints; the two headline means are single
    fixed IEEE divisions over exact integer sums.

    Plan shape / 100 TB: the global as-of decomposes exactly like the
    engine's other prefix operators — score-bucket windows in parallel
    plus a per-bucket last-control table (one row per bucket) whose
    cumulative carry broadcasts back; never a single global sort
    partition. Here: one user shuffle, bucketed windows, a tiny
    bucket-prefix join, one final aggregate."""
    events = load_events(spark, sf_dir)
    pu = events.groupBy(
        "user_id", F.pmod(F.col("user_id"), F.lit(2)).alias("side")
    ).agg(
        F.count("*").alias("score"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv"),
    )
    b = F.floor(F.col("score") / 8).alias("b")
    u = pu.select("user_id", "side", "score", "conv", b)
    ctl_struct = F.when(
        F.col("side") == 0, F.struct(F.col("score").alias("s"), F.col("conv").alias("c"))
    )
    wb = (
        Window.partitionBy("b")
        .orderBy("score", "side", "user_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = u.select(
        "b", "side", "score", "conv",
        F.last(ctl_struct, ignorenulls=True).over(wb).alias("ctl_in"),
    )
    # one row per bucket: its last control (lexicographic max over the
    # same order), then the carry from all PRECEDING buckets
    bucket_last = (
        u.filter(F.col("side") == 0)
        .groupBy("b")
        .agg(F.max(F.struct(F.col("score").alias("s"), F.col("user_id"), F.col("conv").alias("c"))).alias("m"))
        .select("b", F.struct(F.col("m.s").alias("s"), F.col("m.c").alias("c")).alias("last_ctl"))
    )
    wprev = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    # every bucket that has treated rows needs a prefix row, including
    # buckets with no controls: build the prefix over ALL buckets
    all_b = u.select("b").distinct()
    prefix_all = (
        all_b.join(bucket_last, "b", "left")
        .select("b", F.last("last_ctl", ignorenulls=True).over(wprev).alias("prev_ctl"))
    )
    t = (
        within.filter(F.col("side") == 1)
        .join(F.broadcast(prefix_all), "b", "left")
        .select(
            "score", "conv", F.coalesce(F.col("ctl_in"), F.col("prev_ctl")).alias("ctl")
        )
    )
    matched = F.col("ctl").isNotNull()
    return t.agg(
        F.count("*").cast("long").alias("n_treated"),
        F.count(F.col("ctl")).cast("long").alias("n_matched"),
        (
            F.floor(
                F.sum(F.when(matched, F.col("conv") - F.col("ctl.c")))
                * 1e6
                / F.count(F.col("ctl"))
                + F.lit(0.5)
            )
            / 1e6
        ).alias("att_psm"),
        (
            F.floor(
                F.sum(F.when(matched, F.col("score") - F.col("ctl.s")))
                * 1e6
                / F.count(F.col("ctl"))
                + F.lit(0.5)
            )
            / 1e6
        ).alias("mean_score_gap"),
    )


@register(
    "cluster_purity_report",
    # milli-quantized exact-int L2 assignment to the k lowest-vec_id
    # seeds, then purity/NMI census algebra with per-term 1e-9
    # quantization before summation
    """
WITH seeds AS (
  SELECT vec_id AS cid, embedding AS c FROM embeddings
  ORDER BY vec_id LIMIT 8
), d AS (
  SELECT e.vec_id, e.label, s.cid,
         list_aggregate(list_transform(e.embedding, (v, i) ->
           (CAST(FLOOR(CAST(v AS DOUBLE) * 1000 + 0.5) AS BIGINT)
            - CAST(FLOOR(CAST(s.c[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT))
           * (CAST(FLOOR(CAST(v AS DOUBLE) * 1000 + 0.5) AS BIGINT)
            - CAST(FLOOR(CAST(s.c[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT))),
           'sum') AS d2
  FROM embeddings e CROSS JOIN seeds s
), assign AS (
  SELECT vec_id, label, cid FROM d
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
), cl AS (
  SELECT cid, label, COUNT(*) AS n_cl FROM assign GROUP BY 1, 2
), tot AS (
  SELECT SUM(n_cl) AS n FROM cl
), cmarg AS (
  SELECT cid, SUM(n_cl) AS n_c FROM cl GROUP BY 1
), lmarg AS (
  SELECT label, SUM(n_cl) AS n_l FROM cl GROUP BY 1
), iterm AS (
  SELECT SUM(CAST(FLOOR(CAST(n_cl AS DOUBLE) / t.n
             * LN(CAST(t.n AS DOUBLE) * n_cl / (CAST(c.n_c AS DOUBLE) * l.n_l))
             * 1e9 + 0.5) AS BIGINT)) AS iq
  FROM cl JOIN cmarg c USING (cid) JOIN lmarg l USING (label), tot t
), hc AS (
  SELECT SUM(CAST(FLOOR(CAST(n_c AS DOUBLE) / t.n
             * LN(CAST(t.n AS DOUBLE) / n_c) * 1e9 + 0.5) AS BIGINT)) AS hq
  FROM cmarg, tot t
), hl AS (
  SELECT SUM(CAST(FLOOR(CAST(n_l AS DOUBLE) / t.n
             * LN(CAST(t.n AS DOUBLE) / n_l) * 1e9 + 0.5) AS BIGINT)) AS hq
  FROM lmarg, tot t
), pur AS (
  SELECT SUM(mx) AS pure_n FROM (
    SELECT cid, MAX(n_cl) AS mx FROM cl GROUP BY 1
  )
)
SELECT (SELECT COUNT(*) FROM cmarg)::BIGINT AS n_clusters,
       (SELECT COUNT(*) FROM lmarg)::BIGINT AS n_labels,
       FLOOR(CAST(pur.pure_n AS DOUBLE) / t.n * 1e6 + 0.5) / 1e6 AS purity,
       CASE WHEN hc.hq > 0 AND hl.hq > 0 THEN
         FLOOR(iterm.iq / sqrt(CAST(hc.hq AS DOUBLE) * CAST(hl.hq AS DOUBLE))
               * 1e6 + 0.5) / 1e6
       ELSE 0.0 END AS nmi
FROM pur, tot t, iterm, hc, hl
""",
)
def cluster_purity_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering validation — purity and normalized mutual
    information (Manning, Raghavan & Schutze, IR book ch.16 — public
    measures) of a one-step KMeans assignment against the ground-truth
    labels: the eval loop a curation pipeline runs after clustering
    embeddings (are my clusters topical?). Assignment reuses the
    kmeans_step convention (seeds = k lowest vec_ids) hardened with
    milli-quantized exact-integer L2, so the contingency census is
    bit-identical across engines; every information term quantizes to
    a 1e-9 int BEFORE summation.

    Plan shape / 100 TB: broadcast k seeds into a map-side argmin (the
    kmeans_step shape), one (cluster, label) census shuffle — bounded
    by k x |labels| cells — then census algebra. Linear."""
    emb = load_table(spark, sf_dir, "embeddings")
    k = 8
    seeds = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c"))
    )
    q = lambda col: F.floor(col.cast("double") * 1000 + F.lit(0.5)).cast("long")  # noqa: E731
    diff2 = F.zip_with(
        "embedding",
        "c",
        lambda a, b: (q(a) - q(b)) * (q(a) - q(b)),
    )
    d2 = F.aggregate(diff2, F.lit(0).cast("long"), lambda acc, v: acc + v)
    assign = (
        emb.crossJoin(F.broadcast(seeds))
        .select("vec_id", "label", "cid", d2.alias("d2"))
        .groupBy("vec_id", "label")
        .agg(F.min(F.struct("d2", "cid")).alias("s"))
        .select("vec_id", "label", F.col("s.cid").alias("cid"))
    )
    cl = assign.groupBy("cid", "label").agg(F.count("*").alias("n_cl"))
    tot = cl.agg(F.sum("n_cl").alias("n"))
    cmarg = cl.groupBy("cid").agg(F.sum("n_cl").alias("n_c"))
    lmarg = cl.groupBy("label").agg(F.sum("n_cl").alias("n_l"))
    iterm = (
        cl.join(cmarg, "cid")
        .join(lmarg, "label")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.floor(
                    F.col("n_cl").cast("double")
                    / F.col("n")
                    * F.log(
                        F.col("n").cast("double")
                        * F.col("n_cl")
                        / (F.col("n_c").cast("double") * F.col("n_l"))
                    )
                    * 1e9
                    + F.lit(0.5)
                ).cast("long")
            ).alias("iq")
        )
    )
    hc = cmarg.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.floor(
                F.col("n_c").cast("double")
                / F.col("n")
                * F.log(F.col("n").cast("double") / F.col("n_c"))
                * 1e9
                + F.lit(0.5)
            ).cast("long")
        ).alias("hcq")
    )
    hl = lmarg.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.floor(
                F.col("n_l").cast("double")
                / F.col("n")
                * F.log(F.col("n").cast("double") / F.col("n_l"))
                * 1e9
                + F.lit(0.5)
            ).cast("long")
        ).alias("hlq")
    )
    pur = cl.groupBy("cid").agg(F.max("n_cl").alias("mx")).agg(
        F.sum("mx").alias("pure_n")
    )
    n_clusters = cmarg.agg(F.count("*").alias("n_clusters"))
    n_labels = lmarg.agg(F.count("*").alias("n_labels"))
    return (
        pur.crossJoin(tot)
        .crossJoin(iterm)
        .crossJoin(hc)
        .crossJoin(hl)
        .crossJoin(n_clusters)
        .crossJoin(n_labels)
        .select(
            F.col("n_clusters").cast("long").alias("n_clusters"),
            F.col("n_labels").cast("long").alias("n_labels"),
            (
                F.floor(F.col("pure_n").cast("double") / F.col("n") * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("purity"),
            F.when(
                (F.col("hcq") > 0) & (F.col("hlq") > 0),
                F.floor(
                    F.col("iq")
                    / F.sqrt(F.col("hcq").cast("double") * F.col("hlq").cast("double"))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6,
            )
            .otherwise(F.lit(0.0))
            .alias("nmi"),
        )
    )


@register(
    "graph_modularity_report",
    # LPA communities (the graph_label_propagation CTEs verbatim) +
    # Newman modularity as ONE exact bigint numerator over the
    # community census: Q = sum_c(4*m*e_c - d_c^2) / (4*m^2)
    """
WITH raw AS (
  SELECT user_id % 200 AS p, event_id % 199 AS q FROM events
  WHERE user_id % 200 <> event_id % 199
),
edges AS (SELECT DISTINCT LEAST(p, q) AS u, GREATEST(p, q) AS v FROM raw),
und AS (
  SELECT u AS src, v AS dst FROM edges
  UNION ALL SELECT v AS src, u AS dst FROM edges
),
l0 AS (SELECT DISTINCT src AS vertex, src AS label FROM und),
v1 AS (
  SELECT dst, label, COUNT(*) AS cnt FROM und JOIN l0 ON und.src = l0.vertex
  GROUP BY dst, label
),
l1 AS (
  SELECT dst AS vertex, label FROM v1
  QUALIFY ROW_NUMBER() OVER (PARTITION BY dst ORDER BY cnt DESC, label) = 1
),
v2 AS (
  SELECT dst, label, COUNT(*) AS cnt FROM und JOIN l1 ON und.src = l1.vertex
  GROUP BY dst, label
),
l2 AS (
  SELECT dst AS vertex, label FROM v2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY dst ORDER BY cnt DESC, label) = 1
),
v3 AS (
  SELECT dst, label, COUNT(*) AS cnt FROM und JOIN l2 ON und.src = l2.vertex
  GROUP BY dst, label
),
l3 AS (
  SELECT dst AS vertex, label FROM v3
  QUALIFY ROW_NUMBER() OVER (PARTITION BY dst ORDER BY cnt DESC, label) = 1
),
m AS (SELECT COUNT(*) AS m FROM edges),
deg AS (SELECT src AS vertex, COUNT(*) AS deg FROM und GROUP BY 1),
dc AS (
  SELECT l.label, SUM(d.deg) AS d_c
  FROM l3 l JOIN deg d USING (vertex) GROUP BY 1
),
ec AS (
  SELECT lu.label, COUNT(*) AS e_c
  FROM edges e JOIN l3 lu ON e.u = lu.vertex JOIN l3 lv ON e.v = lv.vertex
  WHERE lu.label = lv.label GROUP BY 1
),
numer AS (
  SELECT SUM(4 * m.m * COALESCE(ec.e_c, 0) - dc.d_c * dc.d_c) AS num
  FROM dc LEFT JOIN ec USING (label), m
)
SELECT (SELECT COUNT(*) FROM dc)::BIGINT AS n_communities,
       m.m::BIGINT AS n_edges,
       FLOOR(CAST(numer.num AS DOUBLE) / (4.0 * m.m * m.m) * 1e6 + 0.5) / 1e6
         AS modularity
FROM numer, m
""",
)
def graph_modularity_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity (Newman & Girvan 2004 — public measure) of the
    label-propagation partition: Q = sum_c (e_c/m - (d_c/2m)^2), the
    quality score a community-detection pass reports next to its
    labels (is this partition better than random?). Composes
    graph_label_propagation's deterministic 3-round LPA with exact
    integer algebra: the numerator sum_c (4*m*e_c - d_c^2) is pure
    bigint, so the only float is the final division.

    Plan shape / 100 TB: LPA's per-round vertex-keyed shuffles (the
    GraphX/Pregel asymptotics), then one intra-community edge count
    (two broadcast-able label joins on the edge list), one degree
    census, and census algebra over |communities| rows. Linear in
    |E|."""
    from .operators import relational

    events = load_events(spark, sf_dir)
    labels = relational.label_propagation(events)
    raw = events.select(
        (F.col("user_id") % 200).alias("p"),
        (F.col("event_id") % 199).alias("q"),
    ).filter(F.col("p") != F.col("q"))
    edges = raw.select(
        F.least("p", "q").alias("u"), F.greatest("p", "q").alias("v")
    ).distinct()
    und = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    m = edges.agg(F.count("*").alias("m"))
    deg = und.groupBy(F.col("src").alias("vertex")).agg(F.count("*").alias("deg"))
    dc = (
        labels.join(deg, "vertex")
        .groupBy("label")
        .agg(F.sum("deg").alias("d_c"))
    )
    lu = labels.select(F.col("vertex").alias("u"), F.col("label").alias("lu"))
    lv = labels.select(F.col("vertex").alias("v"), F.col("label").alias("lv"))
    ec = (
        edges.join(lu, "u")
        .join(lv, "v")
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count("*").alias("e_c"))
    )
    numer = (
        dc.join(ec, "label", "left")
        .crossJoin(F.broadcast(m))
        .agg(
            F.sum(
                F.lit(4) * F.col("m") * F.coalesce(F.col("e_c"), F.lit(0))
                - F.col("d_c") * F.col("d_c")
            ).alias("num")
        )
    )
    n_comm = dc.agg(F.count("*").alias("n_communities"))
    return (
        numer.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(n_comm))
        .select(
            F.col("n_communities").cast("long").alias("n_communities"),
            F.col("m").cast("long").alias("n_edges"),
            (
                F.floor(
                    F.col("num").cast("double")
                    / (F.lit(4.0) * F.col("m") * F.col("m"))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("modularity"),
        )
    )


@register(
    "wer_pairs_report",
    # same prefix blocking as bleu_pairs_report; token-level edit
    # distance replayed as a recursive-CTE DP over dp-row LISTS (the
    # loop-oracle convention) — DuckDB's levenshtein() is byte-based,
    # so no chr re-encoding can carry a general token vocabulary. The
    # sequential new[j-1] dependency inside a row resolves with the
    # prefix-min identity new[j] = j + min_{k<=j}(t[k] - k).
    """
WITH RECURSIVE ws AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS w
  FROM documents
), pref AS (
  SELECT doc_id, w, md5(array_to_string(w[1:8], ' ')) AS fp
  FROM ws WHERE len(w) >= 8
), canon AS (
  SELECT fp, MIN(doc_id) AS ref_id FROM pref GROUP BY fp
), pairs AS (
  SELECT doc_id, ref_id, block_pairs_total FROM (
    SELECT p.doc_id, c.ref_id,
           ROW_NUMBER() OVER (PARTITION BY p.fp ORDER BY p.doc_id) AS prn,
           COUNT(*) OVER (PARTITION BY p.fp) AS block_pairs_total
    FROM pref p JOIN canon c USING (fp)
    WHERE p.doc_id <> c.ref_id
  ) WHERE prn <= 64
), jp AS (
  SELECT p.doc_id, p.ref_id, a.w AS wa, r.w AS wr
  FROM pairs p JOIN ws a ON a.doc_id = p.doc_id
  JOIN ws r ON r.doc_id = p.ref_id
), dp AS (
  SELECT doc_id, ref_id, wa, wr, 0 AS i,
         list_transform(range(0, len(wr) + 1), j -> j) AS d
  FROM jp
  UNION ALL
  SELECT doc_id, ref_id, wa, wr, i + 1 AS i,
         list_transform(range(1, len(wr) + 2), j ->
           j - 1 + list_aggregate(
             list_transform(t.t[1:j], (tk, k) -> tk - (k - 1)), 'min')) AS d
  FROM dp, LATERAL (
    SELECT list_transform(range(1, len(wr) + 2), j ->
      CASE WHEN j = 1 THEN i + 1
           ELSE LEAST(d[j] + 1,
                      d[j - 1] + CASE WHEN wa[i + 1] = wr[j - 1]
                                      THEN 0 ELSE 1 END)
      END) AS t
  ) t
  WHERE i < len(wa)
), fin AS (
  SELECT doc_id, ref_id, len(wr)::BIGINT AS n_ref, d[len(wr) + 1] AS dist
  FROM dp WHERE i = len(wa)
)
SELECT doc_id, ref_id, p.block_pairs_total::BIGINT AS block_pairs_total,
       n_ref, dist::BIGINT AS dist,
       FLOOR(dist * 1e6 / n_ref + 0.5) / 1e6 AS wer
FROM fin JOIN pairs p USING (doc_id, ref_id) ORDER BY doc_id, ref_id
""",
)
def wer_pairs_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.wer_pairs_report(load_table(spark, sf_dir, "documents"))


@register(
    "stratified_kfold_assign",
    # per-stratum md5-ordered row_number modulo k: EXACTLY balanced
    # folds (+-1 per stratum), reported as a (lang, fold) census
    """
WITH d AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
           ORDER BY md5('fold:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
), a AS (
  SELECT lang, doc_id, (rn - 1) % 5 AS fold FROM d
), census AS (
  SELECT lang, fold, COUNT(*) AS n_docs FROM a GROUP BY 1, 2
)
SELECT lang, fold::BIGINT AS fold, n_docs::BIGINT AS n_docs,
       (MAX(n_docs) OVER (PARTITION BY lang)
        - MIN(n_docs) OVER (PARTITION BY lang) <= 1) AS balanced
FROM census ORDER BY lang, fold
""",
)
def stratified_kfold_assign_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold cross-validation assignment (public ML
    practice; the sklearn StratifiedKFold contract): within each
    stratum (lang), documents are deterministically shuffled by md5
    and dealt round-robin into k=5 folds, so every stratum's folds are
    EXACTLY balanced (max-min <= 1) — unlike a plain hash-bucket split
    whose per-stratum balance is only asymptotic. Output is the
    (lang, fold) census with the balance invariant as a column.

    Determinism: the shuffle key is md5('fold:'||doc_id) with doc_id
    tie-break — a total order; fold = (rank-1) mod 5.

    Plan shape / 100 TB: the rank window partitions BY STRATUM
    (parallel, never a global sort); the census is |strata| x k cells.
    Linear."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))), "doc_id"
    )
    a = docs.select(
        "lang", "doc_id", ((F.row_number().over(w) - 1) % 5).alias("fold")
    )
    census = a.groupBy("lang", "fold").agg(F.count("*").alias("n_docs"))
    wl = Window.partitionBy("lang")
    return census.select(
        "lang",
        F.col("fold").cast("long").alias("fold"),
        F.col("n_docs").cast("long").alias("n_docs"),
        (
            (F.max("n_docs").over(wl) - F.min("n_docs").over(wl)) <= 1
        ).alias("balanced"),
    ).orderBy("lang", "fold")


@register(
    "rouge_l_pairs_report",
    # LCS by the same recursive-CTE DP-row convention as
    # wer_pairs_report, with max in place of min: the in-row
    # dependency new[j] = max(t[j], new[j-1]) is a prefix maximum
    """
WITH RECURSIVE ws AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS w
  FROM documents
), pref AS (
  SELECT doc_id, w, md5(array_to_string(w[1:8], ' ')) AS fp
  FROM ws WHERE len(w) >= 8
), canon AS (
  SELECT fp, MIN(doc_id) AS ref_id FROM pref GROUP BY fp
), pairs AS (
  SELECT doc_id, ref_id, block_pairs_total FROM (
    SELECT p.doc_id, c.ref_id,
           ROW_NUMBER() OVER (PARTITION BY p.fp ORDER BY p.doc_id) AS prn,
           COUNT(*) OVER (PARTITION BY p.fp) AS block_pairs_total
    FROM pref p JOIN canon c USING (fp)
    WHERE p.doc_id <> c.ref_id
  ) WHERE prn <= 64
), jp AS (
  SELECT p.doc_id, p.ref_id, a.w AS wa, r.w AS wr
  FROM pairs p JOIN ws a ON a.doc_id = p.doc_id
  JOIN ws r ON r.doc_id = p.ref_id
), dp AS (
  SELECT doc_id, ref_id, wa, wr, 0 AS i,
         list_transform(range(0, len(wr) + 1), j -> 0) AS d
  FROM jp
  UNION ALL
  SELECT doc_id, ref_id, wa, wr, i + 1 AS i,
         list_transform(range(1, len(wr) + 2), j ->
           list_aggregate(t.t[1:j], 'max')) AS d
  FROM dp, LATERAL (
    SELECT list_transform(range(1, len(wr) + 2), j ->
      CASE WHEN j = 1 THEN 0
           ELSE GREATEST(d[j],
                         d[j - 1] + CASE WHEN wa[i + 1] = wr[j - 1]
                                         THEN 1 ELSE 0 END)
      END) AS t
  ) t
  WHERE i < len(wa)
), fin AS (
  SELECT doc_id, ref_id, len(wa)::BIGINT AS n_cand, len(wr)::BIGINT AS n_ref,
         d[len(wr) + 1] AS lcs
  FROM dp WHERE i = len(wa)
)
SELECT doc_id, ref_id, p.block_pairs_total::BIGINT AS block_pairs_total,
       n_ref, lcs::BIGINT AS lcs,
       FLOOR(CAST(lcs AS DOUBLE) / n_ref * 1e6 + 0.5) / 1e6 AS rouge_l_recall,
       FLOOR(CAST(lcs AS DOUBLE) / n_cand * 1e6 + 0.5) / 1e6 AS rouge_l_precision,
       CASE WHEN lcs > 0 THEN
         FLOOR(2.0 * (CAST(lcs AS DOUBLE) / n_ref) * (CAST(lcs AS DOUBLE) / n_cand)
               / (CAST(lcs AS DOUBLE) / n_ref + CAST(lcs AS DOUBLE) / n_cand)
               * 1e6 + 0.5) / 1e6
       ELSE 0.0 END AS rouge_l_f1
FROM fin JOIN pairs p USING (doc_id, ref_id) ORDER BY doc_id, ref_id
""",
)
def rouge_l_pairs_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.rouge_l_pairs_report(load_table(spark, sf_dir, "documents"))


@register(
    "chrf_pairs_report",
    # char 1/2/3-gram censuses via substr grams, clipped-count P/R per
    # order quantized to 1e-9 ints before the macro-average, F-beta(2)
    """
WITH ws AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS w,
         regexp_replace(text, '\\s+', '', 'g') AS s
  FROM documents
), pref AS (
  SELECT doc_id, md5(array_to_string(w[1:8], ' ')) AS fp, s
  FROM ws WHERE len(w) >= 8
), canon AS (
  SELECT fp, MIN(doc_id) AS ref_id FROM pref GROUP BY fp
), pairs AS (
  SELECT doc_id, ref_id, block_pairs_total FROM (
    SELECT p.doc_id, c.ref_id,
           ROW_NUMBER() OVER (PARTITION BY p.fp ORDER BY p.doc_id) AS prn,
           COUNT(*) OVER (PARTITION BY p.fp) AS block_pairs_total
    FROM pref p JOIN canon c USING (fp)
    WHERE p.doc_id <> c.ref_id
  ) WHERE prn <= 64
), members AS (
  SELECT DISTINCT m FROM (
    SELECT doc_id AS m FROM pairs UNION ALL SELECT ref_id AS m FROM pairs
  )
), census AS (
  SELECT w.doc_id, o.n, t.g, COUNT(*) AS c
  FROM ws w JOIN members ON w.doc_id = members.m
  CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS n) o,
  LATERAL UNNEST(list_transform(range(1, length(w.s) - o.n + 2),
                                i -> substr(w.s, i, o.n))) AS t(g)
  GROUP BY 1, 2, 3
), per_order AS (
  SELECT p.doc_id, p.ref_id, a.n,
         SUM(LEAST(a.c, COALESCE(b.c, 0))) AS clipped,
         SUM(a.c) AS t_cand
  FROM pairs p
  JOIN census a ON a.doc_id = p.doc_id
  LEFT JOIN census b ON b.doc_id = p.ref_id AND b.n = a.n AND b.g = a.g
  GROUP BY 1, 2, 3
), ref_tot AS (
  SELECT p.doc_id, p.ref_id, b.n, SUM(b.c) AS t_ref
  FROM pairs p JOIN census b ON b.doc_id = p.ref_id
  GROUP BY 1, 2, 3
), per AS (
  SELECT o.doc_id, o.ref_id, COUNT(*) AS k,
         SUM(CAST(FLOOR(CAST(o.clipped AS DOUBLE) / o.t_cand * 1e9 + 0.5)
             AS BIGINT)) AS psum,
         SUM(CAST(FLOOR(CAST(o.clipped AS DOUBLE) / r.t_ref * 1e9 + 0.5)
             AS BIGINT)) AS rsum
  FROM per_order o JOIN ref_tot r USING (doc_id, ref_id, n)
  GROUP BY 1, 2
)
SELECT doc_id, ref_id, p.block_pairs_total::BIGINT AS block_pairs_total,
       FLOOR(CAST(psum AS DOUBLE) / k / 1e9 * 1e6 + 0.5) / 1e6
         AS chrf_precision,
       FLOOR(CAST(rsum AS DOUBLE) / k / 1e9 * 1e6 + 0.5) / 1e6 AS chrf_recall,
       CASE WHEN psum > 0 AND rsum > 0 THEN
         FLOOR(5.0 * (CAST(psum AS DOUBLE) / k / 1e9)
               * (CAST(rsum AS DOUBLE) / k / 1e9)
               / (4.0 * (CAST(psum AS DOUBLE) / k / 1e9)
                  + (CAST(rsum AS DOUBLE) / k / 1e9)) * 1e6 + 0.5) / 1e6
       ELSE 0.0 END AS chrf
FROM per JOIN pairs p USING (doc_id, ref_id) ORDER BY doc_id, ref_id
""",
)
def chrf_pairs_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import text

    return text.chrf_pairs_report(load_table(spark, sf_dir, "documents"))


def _kappa_oracle() -> str:
    from .operators.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    scores = ", ".join(
        f"{_lang_score(LANG_MARKERS[lang])} AS s_{lang}" for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    first_max = "CASE " + " ".join(
        f"WHEN s_{lang} = {greatest} THEN '{lang}'" for lang in langs
    ) + " END"
    ngram = ORACLES["text_lang_id_ngram"]
    return f"""
WITH scored AS (SELECT doc_id, {scores} FROM documents),
r1 AS (SELECT doc_id, {first_max} AS a FROM scored),
r2 AS (SELECT doc_id, lang_pred AS b FROM ({ngram})),
j AS (SELECT r1.doc_id, r1.a, r2.b FROM r1 JOIN r2 USING (doc_id)),
cont AS (SELECT a, b, COUNT(*) AS n FROM j GROUP BY 1, 2),
tot AS (SELECT SUM(n) AS nn FROM cont),
ma AS (SELECT a, SUM(n) AS na FROM cont GROUP BY 1),
mb AS (SELECT b, SUM(n) AS nb FROM cont GROUP BY 1),
agree AS (SELECT COALESCE(SUM(n), 0) AS ag FROM cont WHERE a = b),
pen AS (SELECT SUM(ma.na * mb.nb) AS pe_num FROM ma JOIN mb ON ma.a = mb.b)
SELECT t.nn::BIGINT AS n_docs,
       FLOOR(CAST(g.ag AS DOUBLE) / t.nn * 1e6 + 0.5) / 1e6 AS po,
       FLOOR(CAST(p.pe_num AS DOUBLE) / t.nn / t.nn * 1e6 + 0.5) / 1e6 AS pe,
       FLOOR((CAST(g.ag AS DOUBLE) / t.nn
              - CAST(p.pe_num AS DOUBLE) / t.nn / t.nn)
             / (1.0 - CAST(p.pe_num AS DOUBLE) / t.nn / t.nn) * 1e6 + 0.5)
         / 1e6 AS kappa
FROM tot t, agree g, pen p
"""


@register("cohens_kappa_report", _kappa_oracle())
def cohens_kappa_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (Cohen 1960 — public measure) between the engine's
    two REAL language-ID raters — the stopword-marker classifier
    (text_lang_id) and the char-bigram profile classifier
    (text_lang_id_ngram): chance-corrected inter-rater agreement,
    kappa = (po - pe) / (1 - pe), the annotation-QA readout a labeling
    pipeline runs before trusting auto-labels (lang_id_confusion gives
    the per-cell picture; kappa gives the one-number gate).

    Determinism: both raters are deterministic engine operators; the
    contingency census is exact ints; po/pe/kappa are fixed IEEE
    expressions over exact integer sums.

    Plan shape / 100 TB: both raters are map-side codegen scoring
    passes over the same scan; the join is doc-keyed; everything after
    is a |langs|^2-cell census. Linear."""
    from .operators import text

    docs = load_table(spark, sf_dir, "documents")
    r1 = text.text_lang_id(docs).select("doc_id", F.col("lang_pred").alias("a"))
    r2 = text.text_lang_id_ngram(docs).select(
        "doc_id", F.col("lang_pred").alias("b")
    )
    cont = r1.join(r2, "doc_id").groupBy("a", "b").agg(F.count("*").alias("n"))
    tot = cont.agg(F.sum("n").alias("nn"))
    ma = cont.groupBy("a").agg(F.sum("n").alias("na"))
    mb = cont.groupBy("b").agg(F.sum("n").alias("nb"))
    agree = cont.filter(F.col("a") == F.col("b")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("ag")
    )
    pen = (
        ma.join(mb, ma.a == mb.b)
        .agg(F.sum(F.col("na") * F.col("nb")).alias("pe_num"))
    )
    po = F.col("ag").cast("double") / F.col("nn")
    pe = F.col("pe_num").cast("double") / F.col("nn") / F.col("nn")
    return (
        tot.crossJoin(agree)
        .crossJoin(pen)
        .select(
            F.col("nn").cast("long").alias("n_docs"),
            (F.floor(po * 1e6 + F.lit(0.5)) / 1e6).alias("po"),
            (F.floor(pe * 1e6 + F.lit(0.5)) / 1e6).alias("pe"),
            (
                F.floor((po - pe) / (F.lit(1.0) - pe) * 1e6 + F.lit(0.5)) / 1e6
            ).alias("kappa"),
        )
    )


@register(
    "multimodal_gif_decode",
    # indices follow (doc_id*7 + k) % 256; the palette is the
    # deterministic formula (i, 3i % 256, 7i % 256), so the decoded
    # byte mean is closed-form per doc
    """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h FROM documents
), px AS (
  SELECT doc_id, w, h, (doc_id * 7 + i.i) % 256 AS idx
  FROM dims, LATERAL (SELECT UNNEST(range(w * h)) AS i) i
), ch AS (
  SELECT doc_id, w, h, v.v AS v
  FROM px, LATERAL (SELECT UNNEST([idx, (idx * 3) % 256, (idx * 7) % 256]) AS v) v
)
SELECT doc_id, ANY_VALUE(w)::INT AS width, ANY_VALUE(h)::INT AS height,
       3 AS channels, ROUND(AVG(v), 4) AS byte_mean
FROM ch GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_gif_decode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL single-frame GIF87a decode executing in-sandbox (pure
    stdlib + numpy: logical-screen grammar, 256-entry global color
    table, spec-appendix-F LZW — variable-width LSB-first codes,
    CLEAR/EOI, late width change, 4096-entry dict cap with reset;
    interlace/local tables honestly gated) — the fourth real image
    codec next to PPM/PNG/BMP and the first PALETTED one, so the
    oracle recomputes RGB through the palette formula rather than raw
    bytes. Decode is map-side Arrow-batched; only (doc_id, dims, mean)
    shuffles — pixels never leave the executor (the multimodal house
    contract)."""
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.image_decode_features(multimodal.synthetic_gif_media(docs))


@register(
    "ridge_regression_closed_form",
    # per-user activity features -> exact bigint moment matrix ->
    # 3x3 ridge normal equations solved by Cramer determinants (fixed
    # double polynomials over exact integer moments)
    """
WITH pu AS (
  SELECT user_id,
         COUNT(*) AS x1,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x2,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS y
  FROM events GROUP BY 1
), m AS (
  SELECT COUNT(*)::BIGINT AS n,
         SUM(x1)::BIGINT AS s1, SUM(x2)::BIGINT AS s2,
         SUM(x1 * x1)::BIGINT AS s11, SUM(x1 * x2)::BIGINT AS s12,
         SUM(x2 * x2)::BIGINT AS s22,
         SUM(y)::BIGINT AS sy, SUM(x1 * y)::BIGINT AS s1y,
         SUM(x2 * y)::BIGINT AS s2y
  FROM pu
), d AS (
  SELECT n, sy, s1y, s2y,
         CAST(n AS DOUBLE) AS a11, CAST(s1 AS DOUBLE) AS a12,
         CAST(s2 AS DOUBLE) AS a13,
         CAST(s1 AS DOUBLE) AS a21, CAST(s11 + 10000 AS DOUBLE) AS a22,
         CAST(s12 AS DOUBLE) AS a23,
         CAST(s2 AS DOUBLE) AS a31, CAST(s12 AS DOUBLE) AS a32,
         CAST(s22 + 10000 AS DOUBLE) AS a33
  FROM m
), solved AS (
  SELECT n,
         a11 * (a22 * a33 - a23 * a32) - a12 * (a21 * a33 - a23 * a31)
           + a13 * (a21 * a32 - a22 * a31) AS det,
         CAST(sy AS DOUBLE) * (a22 * a33 - a23 * a32)
           - a12 * (CAST(s1y AS DOUBLE) * a33 - a23 * CAST(s2y AS DOUBLE))
           + a13 * (CAST(s1y AS DOUBLE) * a32 - a22 * CAST(s2y AS DOUBLE))
           AS det0,
         a11 * (CAST(s1y AS DOUBLE) * a33 - a23 * CAST(s2y AS DOUBLE))
           - CAST(sy AS DOUBLE) * (a21 * a33 - a23 * a31)
           + a13 * (a21 * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * a31)
           AS det1,
         a11 * (a22 * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * a32)
           - a12 * (a21 * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * a31)
           + CAST(sy AS DOUBLE) * (a21 * a32 - a22 * a31) AS det2
  FROM d
)
SELECT n::BIGINT AS n_users,
       FLOOR(det0 / det * 1e6 + 0.5) / 1e6 AS beta0,
       FLOOR(det1 / det * 1e6 + 0.5) / 1e6 AS beta1,
       FLOOR(det2 / det * 1e6 + 0.5) / 1e6 AS beta2
FROM solved
""",
)
def ridge_regression_closed_form_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression by the closed-form normal equations (Hoerl &
    Kennard 1970 — public method): predict per-user purchase spend
    (cents) from activity features (event count, click count) with an
    L2 penalty (lambda = 10^4 in cent^2 units) on the non-intercept
    coefficients, solved exactly via Cramer's rule on the 3x3 system —
    the linear-probe training kernel next to trend_lines (1 feature),
    als_implicit_step (2x2 per-user solves) and pca_power_iteration.

    Determinism: every moment (X'X, X'y) is an exact bigint sum; the
    ridge-damped determinants are FIXED double polynomials over those
    exact ints (entries ~1e14 < 2^53, so the int->double casts are
    exact), giving identical IEEE sequences in both engines.

    Plan shape / 100 TB: one user shuffle -> one 9-moment partial-agg
    row -> driver-free scalar algebra. The feature matrix never
    materializes; the solve is O(1). Linear, two aggregates total."""
    events = load_events(spark, sf_dir)
    pu = events.groupBy("user_id").agg(
        F.count("*").alias("x1"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x2"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            ).otherwise(0)
        ).alias("y"),
    )
    m = pu.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
    )
    lam = 10_000
    d = m.select(
        "n",
        "sy",
        "s1y",
        "s2y",
        F.col("n").cast("double").alias("a11"),
        F.col("s1").cast("double").alias("a12"),
        F.col("s2").cast("double").alias("a13"),
        F.col("s1").cast("double").alias("a21"),
        (F.col("s11") + lam).cast("double").alias("a22"),
        F.col("s12").cast("double").alias("a23"),
        F.col("s2").cast("double").alias("a31"),
        F.col("s12").cast("double").alias("a32"),
        (F.col("s22") + lam).cast("double").alias("a33"),
    )
    sy = F.col("sy").cast("double")
    s1y = F.col("s1y").cast("double")
    s2y = F.col("s2y").cast("double")
    a = {k: F.col(k) for k in ("a11", "a12", "a13", "a21", "a22", "a23", "a31", "a32", "a33")}
    det = (
        a["a11"] * (a["a22"] * a["a33"] - a["a23"] * a["a32"])
        - a["a12"] * (a["a21"] * a["a33"] - a["a23"] * a["a31"])
        + a["a13"] * (a["a21"] * a["a32"] - a["a22"] * a["a31"])
    )
    det0 = (
        sy * (a["a22"] * a["a33"] - a["a23"] * a["a32"])
        - a["a12"] * (s1y * a["a33"] - a["a23"] * s2y)
        + a["a13"] * (s1y * a["a32"] - a["a22"] * s2y)
    )
    det1 = (
        a["a11"] * (s1y * a["a33"] - a["a23"] * s2y)
        - sy * (a["a21"] * a["a33"] - a["a23"] * a["a31"])
        + a["a13"] * (a["a21"] * s2y - s1y * a["a31"])
    )
    det2 = (
        a["a11"] * (a["a22"] * s2y - s1y * a["a32"])
        - a["a12"] * (a["a21"] * s2y - s1y * a["a31"])
        + sy * (a["a21"] * a["a32"] - a["a22"] * a["a31"])
    )
    solved = d.select(
        "n", det.alias("det"), det0.alias("det0"), det1.alias("det1"), det2.alias("det2")
    )
    return solved.select(
        F.col("n").cast("long").alias("n_users"),
        (F.floor(F.col("det0") / F.col("det") * 1e6 + F.lit(0.5)) / 1e6).alias("beta0"),
        (F.floor(F.col("det1") / F.col("det") * 1e6 + F.lit(0.5)) / 1e6).alias("beta1"),
        (F.floor(F.col("det2") / F.col("det") * 1e6 + F.lit(0.5)) / 1e6).alias("beta2"),
    )


@register(
    "streaming_drift_monitor",
    # batch twin: hourly window census vs the global reference census,
    # exact cross-multiplied TVD numerators (the drift_report integers),
    # flag at 5% via the 1/20 integer gate
    """
WITH win AS (
  SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, COUNT(*) AS w_t
  FROM events GROUP BY 1, 2
), ref AS (
  SELECT event_type, COUNT(*) AS n_t FROM events GROUP BY 1
), tot AS (
  SELECT SUM(n_t) AS big_n FROM ref
), wtot AS (
  SELECT window_start, SUM(w_t) AS big_w FROM win GROUP BY 1
), cells AS (
  SELECT wt.window_start, wt.big_w, t.big_n, r.event_type,
         COALESCE(w.w_t, 0) AS w_t, r.n_t
  FROM wtot wt CROSS JOIN ref r CROSS JOIN tot t
  LEFT JOIN win w ON w.window_start = wt.window_start
                 AND w.event_type = r.event_type
), agg AS (
  SELECT window_start, ANY_VALUE(big_w) AS big_w, ANY_VALUE(big_n) AS big_n,
         SUM(ABS(w_t * big_n - n_t * big_w))::BIGINT AS tvd_num
  FROM cells GROUP BY 1
)
SELECT window_start, big_w::BIGINT AS n_window, tvd_num,
       FLOOR(CAST(tvd_num AS DOUBLE) / (2.0 * big_w * big_n) * 1e6 + 0.5)
         / 1e6 AS tvd,
       tvd_num * 20 > 2 * big_w * big_n AS drift_flag
FROM agg ORDER BY window_start
""",
)
def streaming_drift_monitor_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distribution-drift monitor: the watermarked hourly
    event-type census runs ON THE STREAM (the windowed_counts stateful
    operator, drained with Trigger.AvailableNow), and each finalized
    window is scored against the static reference distribution by
    total variation distance — the production observability loop that
    pages when a traffic mix shifts (drift_report is its batch
    snapshot twin).

    Determinism: the TVD numerator is the drift_report convention —
    exact cross-multiplied bigints |w_t*N - n_t*W| summed per window;
    the 5% page threshold is the integer gate tvd_num*20 > 2*W*N.

    Plan shape / 100 TB: the stream pays one watermark-bounded
    stateful census (state = |windows in flight| x |types|); the
    monitor algebra joins the drained census against a broadcast
    |types|-row reference — nothing downstream of the stream touches
    event rows."""
    from .streaming import jobs

    stream = jobs.stream_events(spark, sf_dir)
    win = jobs.run_available_now(
        jobs.windowed_counts(stream), "streaming_drift_monitor"
    )
    events = load_events(spark, sf_dir)
    ref = events.groupBy("event_type").agg(F.count("*").alias("n_t"))
    tot = ref.agg(F.sum("n_t").alias("big_n"))
    wtot = win.groupBy("window_start").agg(F.sum("n_events").alias("big_w"))
    wcounts = win.select(
        F.col("window_start").alias("ws"),
        F.col("event_type").alias("et"),
        F.col("n_events").alias("w_t_raw"),
    )
    cells = (
        wtot.crossJoin(F.broadcast(ref))
        .crossJoin(F.broadcast(tot))
        .join(
            wcounts,
            (F.col("window_start") == F.col("ws"))
            & (F.col("event_type") == F.col("et")),
            "left",
        )
        .select(
            "window_start",
            "big_w",
            "big_n",
            "n_t",
            F.coalesce(F.col("w_t_raw"), F.lit(0)).alias("w_t"),
        )
    )
    agg = cells.groupBy("window_start").agg(
        F.first("big_w").alias("big_w"),
        F.first("big_n").alias("big_n"),
        F.sum(F.abs(F.col("w_t") * F.col("big_n") - F.col("n_t") * F.col("big_w")))
        .cast("long")
        .alias("tvd_num"),
    )
    return agg.select(
        "window_start",
        F.col("big_w").cast("long").alias("n_window"),
        "tvd_num",
        (
            F.floor(
                F.col("tvd_num").cast("double")
                / (F.lit(2.0) * F.col("big_w") * F.col("big_n"))
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("tvd"),
        (F.col("tvd_num") * 20 > 2 * F.col("big_w") * F.col("big_n")).alias(
            "drift_flag"
        ),
    ).orderBy("window_start")


@register(
    "markov_next_event_eval",
    # split transitions at the epoch midpoint; train argmax (ties to the
    # smallest next type) on the early half, top-1 accuracy on the late
    """
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
), seq AS (
  SELECT user_id, event_type AS cur, ts, event_id,
         LEAD(event_type) OVER w AS nxt,
         CASE WHEN epoch_us(ts) >= (b.mn + b.mx) // 2 THEN 1 ELSE 0 END
           AS period
  FROM events, bounds b
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), tr AS (
  SELECT cur, nxt, period FROM seq WHERE nxt IS NOT NULL
), train AS (
  SELECT cur, nxt, COUNT(*) AS n FROM tr WHERE period = 0 GROUP BY 1, 2
), pred AS (
  SELECT cur, nxt AS pred FROM train
  QUALIFY ROW_NUMBER() OVER (PARTITION BY cur ORDER BY n DESC, nxt) = 1
), ev AS (
  SELECT t.cur, t.nxt, p.pred FROM tr t LEFT JOIN pred p USING (cur)
  WHERE t.period = 1
)
SELECT (SELECT SUM(n) FROM train)::BIGINT AS n_train,
       COUNT(*)::BIGINT AS n_eval,
       COUNT(CASE WHEN pred IS NULL THEN 1 END)::BIGINT AS n_uncovered,
       FLOOR(CAST(COUNT(CASE WHEN nxt = pred THEN 1 END) AS DOUBLE)
             / COUNT(*) * 1e6 + 0.5) / 1e6 AS top1_accuracy
FROM ev
""",
)
def markov_next_event_eval_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction eval for the first-order Markov model
    (the markov_transition_matrix trained and SCORED): transitions
    before the dataset's epoch midpoint train per-state argmax
    predictions (ties to the smallest next type — deterministic), and
    the held-out later transitions measure top-1 accuracy — the
    train/eval loop that turns the transition matrix into a sequence
    model with a number attached.

    Determinism: the split is exact integer epoch-microsecond
    arithmetic (the did_estimate convention); the argmax is
    (count desc, type asc); accuracy is one fixed division of exact
    counts.

    Plan shape / 100 TB: one user-clustered window pass builds
    transitions; train census and predictions are |types|^2 cells; the
    eval join broadcasts the |types|-row prediction table. Linear."""
    events = load_events(spark, sf_dir)
    bounds = events.agg(
        F.min(F.unix_micros("ts")).alias("mn"), F.max(F.unix_micros("ts")).alias("mx")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        events.crossJoin(F.broadcast(bounds))
        .select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
            F.when(
                F.unix_micros("ts")
                >= F.floor((F.col("mn") + F.col("mx")) / 2).cast("long"),
                1,
            )
            .otherwise(0)
            .alias("period"),
        )
        .filter(F.col("nxt").isNotNull())
    )
    train = (
        seq.filter(F.col("period") == 0)
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("n"))
    )
    pred = (
        train.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cur").orderBy(F.col("n").desc(), "nxt")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("cur", F.col("nxt").alias("pred"))
    )
    n_train = train.agg(F.sum("n").alias("n_train"))
    ev = seq.filter(F.col("period") == 1).join(F.broadcast(pred), "cur", "left")
    return (
        ev.agg(
            F.count("*").alias("n_eval"),
            F.sum(F.when(F.col("pred").isNull(), 1).otherwise(0)).alias("n_uncovered"),
            F.sum(F.when(F.col("nxt") == F.col("pred"), 1).otherwise(0)).alias(
                "n_correct"
            ),
        )
        .crossJoin(F.broadcast(n_train))
        .select(
            F.col("n_train").cast("long").alias("n_train"),
            F.col("n_eval").cast("long").alias("n_eval"),
            F.col("n_uncovered").cast("long").alias("n_uncovered"),
            (
                F.floor(
                    F.col("n_correct").cast("double") / F.col("n_eval") * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("top1_accuracy"),
        )
    )


@register(
    "brier_decomposition",
    # quality logit -> exact-integer linear squashing p_u =
    # clamp(lu + 2e4, 0, 4e4) * 25 (no libm exp — the calibration
    # docstring's cross-engine rule); Murphy terms from exact censuses
    f"""
WITH f AS (
  SELECT doc_id,
         len({{toks}})::DOUBLE AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         len(list_filter({{toks}}, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
           AS n_stop,
         (length(text) - length(replace(text, '.', '')))::DOUBLE AS n_dots
  FROM documents
), wts AS (
  SELECT i.i AS i,
         2 * (CAST(concat('0x', substr(md5('qw:' || i.i), 1, 15)) AS UBIGINT)
              / 1152921504606846976.0) - 1 AS w
  FROM (SELECT UNNEST(range(5)) AS i) i
), z AS (
  SELECT f.doc_id,
         (SELECT w FROM wts WHERE i = 0) * (n_tokens / 100.0)
         + (SELECT w FROM wts WHERE i = 1) * (n_stop / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 2) * (n_chars / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 3) * (n_dots / (n_chars + 1.0))
         + (SELECT w FROM wts WHERE i = 4) AS z
  FROM f
), lab AS (
  SELECT z.doc_id,
         CAST(FLOOR(z * 1e4 + 0.5) AS BIGINT) AS lu,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM z JOIN documents d ON d.doc_id = z.doc_id
), p AS (
  SELECT LEAST(GREATEST(lu + 20000, 0), 40000) * 25 AS pq, pos FROM lab
), binned AS (
  SELECT LEAST(pq // 100000, 9) AS bin, pq, pos FROM p
), cells AS (
  SELECT bin, COUNT(*) AS n, SUM(pos) AS k, SUM(pq) AS sp FROM binned
  GROUP BY 1
), tot AS (
  SELECT SUM(n) AS nn, SUM(k) AS kk FROM cells
), brier AS (
  SELECT SUM((pq - pos * 1000000) * (pq - pos * 1000000)) AS b12 FROM p
), terms AS (
  SELECT SUM(CAST(FLOOR(CAST((sp - k * 1000000) AS DOUBLE)
                        * (sp - k * 1000000) / n / 1e12 * 1e9 + 0.5)
             AS BIGINT)) AS relq,
         SUM(CAST(FLOOR(CAST((k * t.nn - t.kk * n) AS DOUBLE)
                        * (k * t.nn - t.kk * n) / n / t.nn / t.nn * 1e9 + 0.5)
             AS BIGINT)) AS resq
  FROM cells, tot t
)
SELECT t.nn::BIGINT AS n_docs,
       FLOOR(CAST(b.b12 AS DOUBLE) / t.nn / 1e12 * 1e6 + 0.5) / 1e6 AS brier,
       FLOOR(CAST(x.relq AS DOUBLE) / 1e9 / t.nn * 1e6 + 0.5) / 1e6
         AS reliability,
       FLOOR(CAST(x.resq AS DOUBLE) / 1e9 / t.nn * 1e6 + 0.5) / 1e6
         AS resolution,
       FLOOR(CAST(t.kk AS DOUBLE) * (t.nn - t.kk) / t.nn / t.nn * 1e6 + 0.5)
         / 1e6 AS uncertainty
FROM tot t, brier b, terms x
""".replace("{toks}", "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"),
)
def brier_decomposition_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the Murphy (1973 — public) decomposition
    brier ~ reliability - resolution + uncertainty for the quality
    model against the lang='en' pseudo-label: calibration_report plots
    the reliability diagram; this turns it into the three scalar terms
    a model report quotes. Probabilities come from an EXACT-INTEGER
    piecewise-linear squashing of the quantized logit
    (p_u = clamp(lu + 2e4, 0, 4e4) * 25, i.e. logit -2..+2 maps to
    0..1) — a Platt-style linear calibration that deliberately avoids
    libm exp(), whose last-ulp behavior diverges across engines (the
    calibration_report rule).

    Determinism: p_u, the per-doc Brier numerator, and every census
    cell are exact bigints; the per-bin reliability/resolution terms
    quantize to 1e-9 ints BEFORE summation; outputs are single IEEE
    expressions.

    Plan shape / 100 TB: scoring is the same single codegen pass as
    quality_model_score; everything after is a 10-cell census. Linear."""
    from .operators import text

    docs = load_table(spark, sf_dir, "documents")
    scored = text.quality_model_score(docs)
    labeled = scored.join(
        docs.select("doc_id", (F.col("lang") == "en").cast("int").alias("pos")),
        "doc_id",
    )
    lu = F.floor(F.col("logit") * 1e4 + F.lit(0.5)).cast("long")
    p = labeled.select(
        (F.least(F.greatest(lu + 20000, F.lit(0)), F.lit(40000)) * 25).alias("pq"),
        "pos",
    )
    binned = p.select(
        F.least(F.floor(F.col("pq") / 100000), F.lit(9)).cast("long").alias("bin"),
        "pq",
        "pos",
    )
    cells = binned.groupBy("bin").agg(
        F.count("*").alias("n"), F.sum("pos").alias("k"), F.sum("pq").alias("sp")
    )
    tot = cells.agg(F.sum("n").alias("nn"), F.sum("k").alias("kk"))
    brier = p.agg(
        F.sum(
            (F.col("pq") - F.col("pos") * 1000000)
            * (F.col("pq") - F.col("pos") * 1000000)
        ).alias("b12")
    )
    terms = cells.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.floor(
                (F.col("sp") - F.col("k") * 1000000).cast("double")
                * (F.col("sp") - F.col("k") * 1000000)
                / F.col("n")
                / 1e12
                * 1e9
                + F.lit(0.5)
            ).cast("long")
        ).alias("relq"),
        F.sum(
            F.floor(
                (F.col("k") * F.col("nn") - F.col("kk") * F.col("n")).cast("double")
                * (F.col("k") * F.col("nn") - F.col("kk") * F.col("n"))
                / F.col("n")
                / F.col("nn")
                / F.col("nn")
                * 1e9
                + F.lit(0.5)
            ).cast("long")
        ).alias("resq"),
    )
    return (
        tot.crossJoin(brier)
        .crossJoin(terms)
        .select(
            F.col("nn").cast("long").alias("n_docs"),
            (
                F.floor(F.col("b12").cast("double") / F.col("nn") / 1e12 * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("brier"),
            (
                F.floor(F.col("relq").cast("double") / 1e9 / F.col("nn") * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("reliability"),
            (
                F.floor(F.col("resq").cast("double") / 1e9 / F.col("nn") * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("resolution"),
            (
                F.floor(
                    F.col("kk").cast("double")
                    * (F.col("nn") - F.col("kk"))
                    / F.col("nn")
                    / F.col("nn")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("uncertainty"),
        )
    )



@register(
    "dtw_timeseries_similarity",
    # dense daily count series per type -> banded DTW replayed as a
    # recursive-CTE DP over dp-row lists (the wer/rouge loop-oracle
    # convention); the in-row dependency resolves by the unrolled
    # identity new[p] = C_p + min_{k<=p}(t_k - C_{k-1}); brute-force
    # DP equality pytest-checked
    """
WITH RECURSIVE days AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS d, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), cal AS (
  SELECT MIN(d) AS d0, MAX(d) AS d1 FROM days
), grid AS (
  SELECT UNNEST(range(0, DATEDIFF('day', d0, d1) + 1)) AS i FROM cal
), types AS (
  SELECT DISTINCT event_type FROM days
), series AS (
  SELECT t.event_type, list(COALESCE(dy.n, 0) ORDER BY g.i) AS v
  FROM types t CROSS JOIN grid g CROSS JOIN cal c
  LEFT JOIN days dy ON dy.event_type = t.event_type
                   AND dy.d = c.d0 + CAST(g.i AS INTEGER)
  GROUP BY t.event_type
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.v AS va, b.v AS vb
  FROM series a JOIN series b ON a.event_type < b.event_type
), dp AS (
  SELECT type_a, type_b, va, vb, 0 AS i,
         list_transform(range(1, len(vb) + 2), p ->
           CASE WHEN p = 1 THEN 0 ELSE 1099511627776 END) AS d
  FROM pairs
  UNION ALL
  SELECT type_a, type_b, va, vb, i + 1 AS i,
         list_transform(range(1, len(vb) + 2), p ->
           CASE WHEN p = 1 OR ABS((i + 1) - (p - 1)) > 7
                THEN 1099511627776
                ELSE LEAST(1099511627776,
                  cc.cc[p] + list_aggregate(
                    list_transform(range(2, p + 1), k -> tt.tt[k] - cc.cc[k - 1]),
                    'min'))
           END) AS d
  FROM dp,
  LATERAL (
    SELECT list_transform(range(1, len(vb) + 2), p ->
      CASE WHEN p = 1 THEN 0
           ELSE list_aggregate(
             list_transform(range(2, p + 1), q -> ABS(va[i + 1] - vb[q - 1])),
             'sum')
      END) AS cc
  ) cc,
  LATERAL (
    SELECT list_transform(range(1, len(vb) + 2), k ->
      CASE WHEN k = 1 OR ABS((i + 1) - (k - 1)) > 7
           THEN 1099511627776
           ELSE LEAST(d[k], d[k - 1]) END) AS tt
  ) tt
  WHERE i < len(va)
)
SELECT type_a, type_b, len(va)::BIGINT AS n_days, d[len(vb) + 1]::BIGINT AS dtw,
       FLOOR(CAST(d[len(vb) + 1] AS DOUBLE) / (2 * len(va)) * 1e6 + 0.5) / 1e6
         AS dtw_per_step
FROM dp WHERE i = len(va)
ORDER BY type_a, type_b
""",
)
def dtw_timeseries_similarity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic time warping (Sakoe & Chiba 1978, with their band
    constraint r=7 — public method) between the daily activity series
    of every event-type pair: the alignment-based similarity that
    tolerates phase shift, next to timeseries_topk_similar's rigid
    z-normalized L2. Costs are |count difference| — exact integers —
    so the whole DP is bigint arithmetic.

    Plan shape / 100 TB: the corpus collapses to per-type daily
    censuses (one partial-agg shuffle); the dense calendar grid, the
    |types|^2/2 pair relation, and the banded O(n*r) DP all run on
    census-sized data (an Arrow-batched numpy kernel per pair, the
    wer/rouge shape). The band keeps per-pair cost linear in series
    length; series length is |days|, independent of corpus size."""
    import pandas as pd

    events = load_events(spark, sf_dir)
    days = events.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
        "event_type",
    ).agg(F.count("*").alias("n"))
    cal = days.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = cal.select(
        "d0", F.explode(F.sequence(F.lit(0), F.datediff("d1", "d0"))).alias("i")
    )
    types = days.select("event_type").distinct()
    dense = (
        types.crossJoin(F.broadcast(grid))
        .join(
            days.withColumnRenamed("event_type", "et"),
            (F.col("event_type") == F.col("et"))
            & (F.col("d") == F.date_add(F.col("d0"), F.col("i"))),
            "left",
        )
        .select("event_type", "i", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )
    series = dense.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "n"))), lambda s: s["n"]
        ).alias("v")
    )
    pairs = (
        series.alias("a")
        .join(series.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
    )

    def _dtw_batches(batches):
        import numpy as np

        sent = 1 << 40
        r = 7
        for pdf in batches:
            dtws = []
            lens = []
            for va, vb in zip(pdf["va"], pdf["vb"]):
                a = np.asarray(va, dtype=np.int64)
                b = np.asarray(vb, dtype=np.int64)
                n, m = len(a), len(b)
                prev = np.full(m + 1, sent, dtype=np.int64)
                prev[0] = 0
                for i in range(1, n + 1):
                    cost = np.abs(a[i - 1] - b)
                    cc = np.concatenate(([0], np.cumsum(cost)))
                    t = np.minimum(prev[1:], prev[:-1])
                    lo, hi = max(1, i - r), min(m, i + r)
                    tprime = np.full(m + 1, sent, dtype=np.int64)
                    tprime[lo : hi + 1] = t[lo - 1 : hi] - cc[lo - 1 : hi]
                    run = np.minimum.accumulate(tprime)
                    new = np.full(m + 1, sent, dtype=np.int64)
                    new[lo : hi + 1] = np.minimum(
                        sent, cc[lo : hi + 1] + run[lo : hi + 1]
                    )
                    new[0] = sent
                    prev = new
                dtws.append(int(prev[m]))
                lens.append(n)
            yield pd.DataFrame(
                {
                    "type_a": pdf["type_a"],
                    "type_b": pdf["type_b"],
                    "n_days": lens,
                    "dtw": dtws,
                }
            )

    out = pairs.mapInPandas(
        _dtw_batches, "type_a string, type_b string, n_days long, dtw long"
    )
    return out.select(
        "type_a",
        "type_b",
        "n_days",
        "dtw",
        (
            F.floor(F.col("dtw").cast("double") / (2 * F.col("n_days")) * 1e6 + F.lit(0.5))
            / 1e6
        ).alias("dtw_per_step"),
    ).orderBy("type_a", "type_b")


@register(
    "harmonic_centrality",
    # 6 unrolled multi-source min-plus rounds (the shortest_path_bounded
    # convention, all sources at once), then per-source 1/d sums with
    # exact integer nano-unit terms
    """
WITH e AS (
  SELECT DISTINCT user_id % 100 AS u, 100 + event_id % 100 AS v FROM events
), und AS (
  SELECT u AS src, v AS dst FROM e
  UNION ALL SELECT v AS src, u AS dst FROM e
), verts AS (
  SELECT DISTINCT src AS v FROM und
), h0 AS (
  SELECT v AS s, v AS node, CAST(0 AS BIGINT) AS d FROM verts
), h1 AS (
  SELECT s, node, MIN(d) AS d FROM (
    SELECT s, node, d FROM h0
    UNION ALL
    SELECT p.s, e.dst AS node, p.d + 1 AS d
    FROM h0 p JOIN und e ON e.src = p.node
  ) GROUP BY s, node), h2 AS (
  SELECT s, node, MIN(d) AS d FROM (
    SELECT s, node, d FROM h1
    UNION ALL
    SELECT p.s, e.dst AS node, p.d + 1 AS d
    FROM h1 p JOIN und e ON e.src = p.node
  ) GROUP BY s, node), h3 AS (
  SELECT s, node, MIN(d) AS d FROM (
    SELECT s, node, d FROM h2
    UNION ALL
    SELECT p.s, e.dst AS node, p.d + 1 AS d
    FROM h2 p JOIN und e ON e.src = p.node
  ) GROUP BY s, node), h4 AS (
  SELECT s, node, MIN(d) AS d FROM (
    SELECT s, node, d FROM h3
    UNION ALL
    SELECT p.s, e.dst AS node, p.d + 1 AS d
    FROM h3 p JOIN und e ON e.src = p.node
  ) GROUP BY s, node), h5 AS (
  SELECT s, node, MIN(d) AS d FROM (
    SELECT s, node, d FROM h4
    UNION ALL
    SELECT p.s, e.dst AS node, p.d + 1 AS d
    FROM h4 p JOIN und e ON e.src = p.node
  ) GROUP BY s, node), h6 AS (
  SELECT s, node, MIN(d) AS d FROM (
    SELECT s, node, d FROM h5
    UNION ALL
    SELECT p.s, e.dst AS node, p.d + 1 AS d
    FROM h5 p JOIN und e ON e.src = p.node
  ) GROUP BY s, node
)
SELECT s AS node, COUNT(*) - 1 AS n_reached,
       FLOOR(CAST(SUM(CASE WHEN d > 0
                  THEN CAST(FLOOR(1e9 / d + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)
             / 1e9 * 1e6 + 0.5) / 1e6 AS harmonic
FROM h6 GROUP BY s ORDER BY s
""",
)
def harmonic_centrality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality (Boldi & Vigna 2014 formulation — public
    measure): H(v) = sum over reachable u != v of 1/d(v,u), computed
    EXACTLY by six multi-source min-plus rounds over the dense-id
    interaction projection — the exact companion the HyperBall sketch
    (hyperball_neighborhood) approximates at scale, completing the
    centrality family next to pagerank (eigen), degree, and k-core.

    Determinism: distances are exact integer min-plus; each 1/d term
    quantizes to an exact nano-unit integer before summation.

    Plan shape / 100 TB: the projection saturates at 200 vertices, so
    the (source, node) relation is bounded at |V|^2 rows; each round
    is one union + one min aggregate keyed on (source, node) —
    exchange-reused across rounds. All-pairs exact BFS is inherently
    |V|^2 (the documented diagnostic knob); HyperBall IS the engine's
    linear-at-scale path for this measure."""
    events = load_events(spark, sf_dir)
    e = events.select(
        (F.col("user_id") % 100).alias("u"),
        (100 + F.col("event_id") % 100).alias("v"),
    ).distinct()
    und = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    verts = und.select(F.col("src").alias("vx")).distinct()
    init = verts.select(
        F.col("vx").alias("s"), F.col("vx").alias("node"), F.lit(0).cast("long").alias("d")
    ).localCheckpoint(eager=False)
    # frontier BFS instead of full min-plus re-aggregation: each round
    # expands only the NEWLY reached (source, node) pairs and anti-joins
    # the settled set, so round cost shrinks as the ball saturates
    # (min-plus re-agg re-shuffles all |V|^2 pairs every round —
    # measured 5.7 s vs 2.8 s at sf0.1). Result is identical: BFS IS
    # min-plus on an unweighted graph, which the oracle's six unrolled
    # relaxation rounds compute. All checkpoints lazy — the single
    # final aggregate materializes every layer once.
    layers = [init]
    frontier = init
    for k in range(1, 7):
        cand = (
            frontier.alias("p")
            .join(und.alias("e"), F.col("p.node") == F.col("e.src"))
            .select(F.col("p.s").alias("s"), F.col("e.dst").alias("node"))
            .distinct()
        )
        settled = layers[0]
        for layer in layers[1:]:
            settled = settled.unionByName(layer)
        new = (
            cand.join(settled.select("s", "node"), ["s", "node"], "left_anti")
            .select("s", "node", F.lit(k).cast("long").alias("d"))
            .localCheckpoint(eager=False)
        )
        layers.append(new)
        frontier = new
    h = layers[0].select("s", "node", "d")
    for layer in layers[1:]:
        h = h.unionByName(layer.select("s", "node", "d"))
    return (
        h.groupBy(F.col("s").alias("node"))
        .agg(
            (F.count("*") - 1).cast("long").alias("n_reached"),
            F.sum(
                F.when(
                    F.col("d") > 0,
                    F.floor(F.lit(1e9) / F.col("d") + F.lit(0.5)).cast("long"),
                ).otherwise(0)
            ).alias("hq"),
        )
        .select(
            "node",
            "n_reached",
            (F.floor(F.col("hq").cast("double") / 1e9 * 1e6 + F.lit(0.5)) / 1e6).alias(
                "harmonic"
            ),
        )
        .orderBy("node")
    )


@register(
    "matrix_profile_daily",
    # length-7 subsequences of the daily count series via lead windows;
    # exact integer squared-L2 distances; exclusion zone |i-j| < 7
    """
WITH days AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS d, COUNT(*) AS n
  FROM events GROUP BY 1
), cal AS (
  SELECT MIN(d) AS d0, MAX(d) AS d1 FROM days
), grid AS (
  SELECT UNNEST(range(0, DATEDIFF('day', d0, d1) + 1)) AS i FROM cal
), series AS (
  SELECT g.i, COALESCE(dy.n, 0) AS y
  FROM grid g CROSS JOIN cal c
  LEFT JOIN days dy ON dy.d = c.d0 + CAST(g.i AS INTEGER)
), subs AS (
  SELECT i,
         [y, LEAD(y, 1) OVER w, LEAD(y, 2) OVER w, LEAD(y, 3) OVER w,
          LEAD(y, 4) OVER w, LEAD(y, 5) OVER w, LEAD(y, 6) OVER w] AS s
  FROM series WINDOW w AS (ORDER BY i)
  QUALIFY LEAD(y, 6) OVER w IS NOT NULL
), dists AS (
  SELECT a.i AS i, b.i AS j,
         list_aggregate(list_transform(a.s, (v, k) ->
           (v - b.s[k]) * (v - b.s[k])), 'sum') AS d2
  FROM subs a JOIN subs b ON ABS(a.i - b.i) >= 7
)
SELECT i, d2::BIGINT AS mp_dist, j::BIGINT AS mp_index FROM (
  SELECT i, j, d2, ROW_NUMBER() OVER (PARTITION BY i ORDER BY d2, j) AS rn
  FROM dists
) WHERE rn = 1 ORDER BY i
""",
)
def matrix_profile_daily_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix profile (Yeh et al., ICDM 2016 — public method) of the
    daily event-count series with subsequence length 7 and the
    standard exclusion zone (|i-j| >= m): for every week-long window,
    the distance to (and index of) its nearest non-trivial match —
    low profile values are MOTIFS (repeated weekly patterns), peaks
    are DISCORDS (anomalous weeks); the motif/discord complement of
    the decomposition-based anomaly flags.

    Determinism: counts are exact ints, distances are exact integer
    squared L2, the argmin tie-breaks on the smallest index.

    Plan shape / 100 TB: the corpus collapses to the day census; the
    all-pairs subsequence relation is |days|^2 rows of 7-int arrays —
    census-sized regardless of corpus size. (For long series the
    published STOMP ordering replaces the quadratic join; at
    day-census lengths the exact join IS the right plan.)"""
    events = load_events(spark, sf_dir)
    days = events.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).agg(F.count("*").alias("n"))
    cal = days.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = cal.select(
        "d0", F.explode(F.sequence(F.lit(0), F.datediff("d1", "d0"))).alias("i")
    )
    series = grid.join(
        days, F.col("d") == F.date_add(F.col("d0"), F.col("i")), "left"
    ).select("i", F.coalesce(F.col("n"), F.lit(0)).alias("y"))
    w = Window.orderBy("i")
    leads = [F.lead("y", k).over(w) for k in range(7)]
    subs = series.select("i", F.array(*leads).alias("s")).filter(
        F.element_at(F.col("s"), 7).isNotNull()
    )
    d2 = F.aggregate(
        F.zip_with("s", "s2", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dists = (
        subs.alias("a")
        .join(
            subs.select(F.col("i").alias("j"), F.col("s").alias("s2")).alias("b"),
            F.abs(F.col("a.i") - F.col("j")) >= 7,
        )
        .select(F.col("a.i").alias("i"), "j", d2.alias("d2"))
    )
    return (
        dists.groupBy("i")
        .agg(
            F.min("d2").cast("long").alias("mp_dist"),
            F.min(F.struct("d2", "j")).getField("j").cast("long").alias("mp_index"),
        )
        .orderBy("i")
    )


@register(
    "pelt_changepoints",
    # exact OPT/PELT dynamic program over the daily purchase-cents
    # census: quantized SSE segment costs from exact prefix sums, the
    # DP replayed as a recursive CTE carrying the F/argmin lists
    # (argmin encoded val*1024 + s, ties to the smallest s), then a
    # backtrack recursion emits the optimal segments
    """
WITH RECURSIVE days AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS d,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS y
  FROM events GROUP BY 1
), cal AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM days),
grid AS (SELECT UNNEST(range(0, DATEDIFF('day', d0, d1) + 1)) AS i FROM cal),
series AS (
  SELECT g.i, COALESCE(dy.y, 0) AS y
  FROM grid g CROSS JOIN cal c
  LEFT JOIN days dy ON dy.d = c.d0 + CAST(g.i AS INTEGER)
), ser AS (
  SELECT list(y ORDER BY i) AS ys, COUNT(*) AS n FROM series
), pre AS (
  SELECT n, ys,
    list_transform(range(1, n + 2), p ->
      CASE WHEN p = 1 THEN 0 ELSE list_aggregate(ys[1:p - 1], 'sum') END) AS sp,
    list_transform(range(1, n + 2), p ->
      CASE WHEN p = 1 THEN 0
           ELSE list_aggregate(list_transform(ys[1:p - 1], v -> v * v), 'sum')
      END) AS sq
  FROM ser
), withbeta AS (
  SELECT n, sp, sq,
    CAST(FLOOR(CAST((sq[n + 1] - sq[1]) * n
         - (sp[n + 1] - sp[1]) * (sp[n + 1] - sp[1]) AS DOUBLE)
         / n / 1e4 + 0.5) AS BIGINT) // 8 AS beta
  FROM pre
), dp AS (
  SELECT 0 AS t, [-beta] AS f, CAST([] AS BIGINT[]) AS a, n, sp, sq, beta
  FROM withbeta
  UNION ALL
  SELECT t + 1,
         list_append(f, best.e // 1024),
         list_append(a, best.e % 1024),
         n, sp, sq, beta
  FROM dp, LATERAL (
    SELECT MIN(
      (f[s.s + 1] + beta +
        CAST(FLOOR(CAST((sq[t + 2] - sq[s.s + 1]) * (t + 1 - s.s)
             - (sp[t + 2] - sp[s.s + 1]) * (sp[t + 2] - sp[s.s + 1]) AS DOUBLE)
             / (t + 1 - s.s) / 1e4 + 0.5) AS BIGINT)
      ) * 1024 + s.s) AS e
    FROM (SELECT UNNEST(range(0, t + 1)) AS s) s
  ) best
  WHERE t < n
), fin AS (
  SELECT f, a, n, sp FROM dp WHERE t = n
), walk AS (
  SELECT n AS seg_end, a[n] AS seg_prev, a, sp, 0 AS depth FROM fin
  UNION ALL
  SELECT CAST(seg_prev AS BIGINT) AS seg_end, a[seg_prev] AS seg_prev, a, sp,
         depth + 1
  FROM walk WHERE seg_prev > 0
)
SELECT (seg_prev + 1)::BIGINT AS seg_start, seg_end::BIGINT AS seg_end,
       (seg_end - seg_prev)::BIGINT AS n_days,
       CAST(FLOOR(CAST(sp[seg_end + 1] - sp[seg_prev + 1] AS DOUBLE)
            / (seg_end - seg_prev) + 0.5) AS BIGINT) AS mean_cents
FROM walk ORDER BY seg_start
""",
)
def pelt_changepoints_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal changepoint segmentation (the OPT dynamic program that
    PELT prunes — Killick, Fearnhead & Eckley 2012, public method)
    over daily purchase revenue: minimize total within-segment SSE
    plus a per-changepoint penalty (beta = whole-series cost / 8),
    solved EXACTLY — the globally-optimal complement of
    cusum_changepoint's sequential detector.

    Determinism: prefix sums are exact bigints; segment costs quantize
    to 1e4-cent^2 ints via one fixed double expression; the DP argmin
    ties to the smallest split; Spark replays the identical arithmetic
    in exact Python ints over the collected day census (the
    bradley_terry census-collect contract), bit-identical to the
    recursive-CTE oracle.

    Plan shape / 100 TB: the corpus collapses to the |days| census in
    one partial-agg shuffle; the O(n^2) DP runs on census-sized data
    (n = |days|, independent of corpus size — PELT's pruning is the
    published lever when n itself grows)."""
    import math

    events = load_events(spark, sf_dir)
    days = (
        events.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
                ).otherwise(0)
            ).alias("y")
        )
        .collect()
    )
    spark = events.sparkSession
    if not days:
        # empty source: no series, no segments — never raise
        return spark.createDataFrame(
            [], "seg_start LONG, seg_end LONG, n_days LONG, mean_cents LONG"
        )
    d0 = min(r.d for r in days)
    n = (max(r.d for r in days) - d0).days + 1
    ys = [0] * n
    for r in days:
        ys[(r.d - d0).days] = int(r.y)
    sp = [0]
    sq = [0]
    for y in ys:
        sp.append(sp[-1] + y)
        sq.append(sq[-1] + y * y)

    def cq(s: int, t: int) -> int:
        length = t - s
        num = (sq[t] - sq[s]) * length - (sp[t] - sp[s]) ** 2
        return math.floor(num / length / 1e4 + 0.5)

    beta = cq(0, n) // 8
    f = [-beta] + [0] * n
    a = [0] * (n + 1)
    for t in range(1, n + 1):
        best_v, best_s = None, None
        for s in range(0, t):
            v = f[s] + beta + cq(s, t)
            if best_v is None or v < best_v:
                best_v, best_s = v, s
        f[t], a[t] = best_v, best_s
    segs = []
    t = n
    while t > 0:
        s = a[t]
        segs.append(
            (
                s + 1,
                t,
                t - s,
                math.floor((sp[t] - sp[s]) / (t - s) + 0.5),
            )
        )
        t = s
    segs.reverse()
    return spark.createDataFrame(
        segs, "seg_start LONG, seg_end LONG, n_days LONG, mean_cents LONG"
    ).orderBy("seg_start")


@register(
    "markov_attribution_removal",
    # journey edge census -> per-variant redirected chains -> 40
    # integer micro-unit power-iteration rounds per variant (recursive
    # CTE over probability lists) -> removal effects + shares
    """
WITH RECURSIVE seq AS (
  SELECT user_id,
         CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS m,
         ROW_NUMBER() OVER w AS rn,
         LEAD(CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END)
           OVER w AS nxt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), edges AS (
  SELECT 'START' AS s, m AS t FROM seq WHERE rn = 1
  UNION ALL
  SELECT m AS s, nxt AS t FROM seq WHERE nxt IS NOT NULL AND m <> 'CONV'
  UNION ALL
  SELECT m AS s, 'NULL' AS t FROM seq WHERE nxt IS NULL AND m <> 'CONV'
), census AS (
  SELECT s, t, COUNT(*) AS n FROM edges GROUP BY 1, 2
), chans AS (
  SELECT DISTINCT event_type AS c FROM events WHERE event_type <> 'purchase'
), states AS (
  SELECT 'START' AS name, 0 AS idx
  UNION ALL
  SELECT c AS name, ROW_NUMBER() OVER (ORDER BY c) AS idx FROM chans
  UNION ALL SELECT 'CONV', (SELECT COUNT(*) FROM chans) + 1
  UNION ALL SELECT 'NULL', (SELECT COUNT(*) FROM chans) + 2
), variants AS (
  SELECT '__none__' AS v UNION ALL SELECT c FROM chans
), redirected AS (
  SELECT vr.v, c.s, CASE WHEN c.t = vr.v THEN 'NULL' ELSE c.t END AS t,
         SUM(c.n) AS n
  FROM variants vr CROSS JOIN census c
  WHERE c.s <> vr.v
  GROUP BY 1, 2, 3
), dense AS (
  SELECT vr.v, ss.idx AS si, tt.idx AS ti, COALESCE(r.n, 0) AS n
  FROM variants vr CROSS JOIN states ss CROSS JOIN states tt
  LEFT JOIN redirected r ON r.v = vr.v AND r.s = ss.name AND r.t = tt.name
), mat AS (
  SELECT v, list(row ORDER BY si) AS m2, list(tot ORDER BY si) AS tots
  FROM (
    SELECT v, si, list(n ORDER BY ti) AS row, SUM(n) AS tot
    FROM dense GROUP BY v, si
  ) GROUP BY v
), nstates AS (SELECT COUNT(*) AS ns FROM states),
pw AS (
  SELECT v, m2, tots, 0 AS k,
         list_transform(range(0, ns), i ->
           CASE WHEN i = 0 THEN 1000000000 ELSE 0 END) AS p,
         ns
  FROM mat, nstates
  UNION ALL
  SELECT v, m2, tots, k + 1,
         list_transform(range(0, ns), t ->
           CASE WHEN t >= ns - 2 THEN p[t + 1] ELSE 0 END
           + list_aggregate(
               list_transform(range(0, ns), s ->
                 CASE WHEN tots[s + 1] > 0
                      THEN p[s + 1] * m2[s + 1][t + 1] // tots[s + 1]
                      ELSE 0 END),
               'sum')) AS p,
         ns
  FROM pw WHERE k < 40
), fin AS (
  SELECT v, p[ns - 1] AS p_conv FROM pw WHERE k = 40
), base AS (SELECT p_conv AS pb FROM fin WHERE v = '__none__'),
re AS (
  SELECT f.v AS channel, b.pb AS p_base, f.p_conv AS p_removed,
         GREATEST(b.pb - f.p_conv, 0) AS re_u
  FROM fin f, base b WHERE f.v <> '__none__'
), tot_re AS (SELECT SUM(re_u) AS sre FROM re)
SELECT channel,
       FLOOR(p_base / 1e9 * 1e6 + 0.5) / 1e6 AS p_conv_base,
       FLOOR(p_removed / 1e9 * 1e6 + 0.5) / 1e6 AS p_conv_removed,
       CASE WHEN p_base > 0
            THEN FLOOR(CAST(re_u AS DOUBLE) / p_base * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS removal_effect,
       CASE WHEN t.sre > 0
            THEN FLOOR(CAST(re_u AS DOUBLE) / t.sre * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS attribution_share
FROM re, tot_re t ORDER BY channel
""",
)
def markov_attribution_removal_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl, Becker,
    von Wangenheim & Schumann 2014 — public method; the data-driven
    multi-touch model next to attribution_models' first/last/linear
    heuristics): user journeys build a first-order absorbing chain
    (START -> channels -> CONV | NULL); each channel's credit is its
    REMOVAL EFFECT — the drop in absorption probability into CONV when
    every transition into that channel is redirected to NULL —
    normalized into attribution shares.

    Determinism: the transition census is exact ints; absorption
    probabilities run 40 power-iteration rounds in integer NANO-units
    with per-entry floor division (the personalized_pagerank trick),
    so all six chains (base + 5 removals) are bit-identical across
    engines; Spark replays the identical arithmetic in exact Python
    ints over the collected |states|^2 census (the bradley_terry /
    pelt census-collect contract), and the oracle replays it as a
    recursive CTE over probability lists.

    Plan shape / 100 TB: one user-clustered window pass builds journey
    edges; the corpus collapses to a <= (|channels|+3)^2 census; the
    six 40-round iterations are driver algebra on that census. Only
    the edge census pass touches data. Linear."""
    import math

    events = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    m = F.when(F.col("event_type") == "purchase", "CONV").otherwise(
        F.col("event_type")
    )
    seq = events.select(
        m.alias("m"),
        F.row_number().over(w).alias("rn"),
        F.lead(m).over(w).alias("nxt"),
    )
    edges = (
        seq.filter(F.col("rn") == 1).select(F.lit("START").alias("s"), F.col("m").alias("t"))
        .unionByName(
            seq.filter(F.col("nxt").isNotNull() & (F.col("m") != "CONV")).select(
                F.col("m").alias("s"), F.col("nxt").alias("t")
            )
        )
        .unionByName(
            seq.filter(F.col("nxt").isNull() & (F.col("m") != "CONV")).select(
                F.col("m").alias("s"), F.lit("NULL").alias("t")
            )
        )
    )
    census = {(r.s, r.t): r.n for r in edges.groupBy("s", "t").agg(F.count("*").alias("n")).collect()}
    chans = sorted(
        ({s for s, _ in census} | {t for _, t in census}) - {"START", "CONV", "NULL"}
    )
    states = ["START"] + chans + ["CONV", "NULL"]
    sidx = {name: i for i, name in enumerate(states)}
    ns = len(states)

    def absorb(removed: str | None) -> int:
        mat = [[0] * ns for _ in range(ns)]
        for (s, t), n in census.items():
            if s == removed:
                continue
            tt = "NULL" if t == removed else t
            mat[sidx[s]][sidx[tt]] += n
        tots = [sum(row) for row in mat]
        p = [0] * ns
        p[0] = 1_000_000_000
        for _ in range(40):
            nxt = [0] * ns
            for t in range(ns):
                carry = p[t] if t >= ns - 2 else 0
                inflow = 0
                for s in range(ns):
                    if tots[s] > 0:
                        inflow += p[s] * mat[s][t] // tots[s]
                nxt[t] = carry + inflow
            p = nxt
        return p[ns - 2]

    pb = absorb(None)
    rows = []
    res = {c: absorb(c) for c in chans}
    sre = sum(max(pb - pc, 0) for pc in res.values())
    for c in chans:
        re_u = max(pb - res[c], 0)
        rows.append(
            (
                c,
                math.floor(pb / 1e9 * 1e6 + 0.5) / 1e6,
                math.floor(res[c] / 1e9 * 1e6 + 0.5) / 1e6,
                # pb == 0 (no conversions) or sre == 0 (no channel reduces
                # conversion): credit is 0, matching the oracle's CASE guard
                math.floor(re_u / pb * 1e6 + 0.5) / 1e6 if pb > 0 else 0.0,
                math.floor(re_u / sre * 1e6 + 0.5) / 1e6 if sre > 0 else 0.0,
            )
        )
    spark = events.sparkSession
    return spark.createDataFrame(
        rows,
        "channel STRING, p_conv_base DOUBLE, p_conv_removed DOUBLE, "
        "removal_effect DOUBLE, attribution_share DOUBLE",
    ).orderBy("channel")


@register(
    "multimodal_audio_hadamard",
    # WHT over the closed-form PCM fixture: sign = parity of
    # popcount(j & k); all-integer coefficients and band masses
    """
WITH px AS (
  SELECT doc_id, j.j AS j,
         ((doc_id * 13 + j.j * 31) % 65536) - 32768 AS s
  FROM documents, LATERAL (SELECT UNNEST(range(64)) AS j) j
), wht AS (
  SELECT doc_id, k.k AS k,
         SUM(CASE WHEN bit_count(CAST(j AS BIGINT) & k.k) % 2 = 0
                  THEN s ELSE -s END) AS c
  FROM px CROSS JOIN (SELECT UNNEST(range(64)) AS k) k
  GROUP BY 1, 2
)
SELECT doc_id,
       SUM(CASE WHEN k = 0 THEN c ELSE 0 END)::BIGINT AS dc,
       SUM(CASE WHEN k BETWEEN 1 AND 7 THEN ABS(c) ELSE 0 END)::BIGINT
         AS band_low,
       SUM(CASE WHEN k BETWEEN 8 AND 31 THEN ABS(c) ELSE 0 END)::BIGINT
         AS band_mid,
       SUM(CASE WHEN k >= 32 THEN ABS(c) ELSE 0 END)::BIGINT AS band_high
FROM wht GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_audio_hadamard_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.audio_hadamard_bands(
        multimodal.synthetic_wav_media(docs)
    ).orderBy("doc_id")


@register(
    "ecod_outlier_scores",
    # per-dimension two-sided ECDF tail log-scores (ties collapse via
    # RANGE frames, so tie order never matters), each term quantized to
    # a 1e-9 int before the per-vector sum
    """
WITH elems AS (
  SELECT vec_id, j.i AS j, CAST(e.embedding[j.i + 1] AS DOUBLE) AS v
  FROM embeddings e, LATERAL (SELECT UNNEST(range(len(e.embedding))) AS i) j
), ranked AS (
  SELECT vec_id, j, v,
         COUNT(*) OVER (PARTITION BY j ORDER BY v
                        RANGE UNBOUNDED PRECEDING) AS r_left,
         COUNT(*) OVER (PARTITION BY j ORDER BY v DESC
                        RANGE UNBOUNDED PRECEDING) AS r_right,
         COUNT(*) OVER (PARTITION BY j) AS n
  FROM elems
), terms AS (
  SELECT vec_id,
         CAST(FLOOR(-LN(CAST(r_left AS DOUBLE) / n) * 1e9 + 0.5) AS BIGINT)
           AS tl,
         CAST(FLOOR(-LN(CAST(r_right AS DOUBLE) / n) * 1e9 + 0.5) AS BIGINT)
           AS tr,
         n
  FROM ranked
), agg AS (
  SELECT vec_id, SUM(tl) AS ol, SUM(tr) AS orr, COUNT(*) AS dims
  FROM terms GROUP BY 1
)
SELECT vec_id,
       FLOOR(CAST(ol AS DOUBLE) / dims / 1e9 * 1e6 + 0.5) / 1e6 AS o_left,
       FLOOR(CAST(orr AS DOUBLE) / dims / 1e9 * 1e6 + 0.5) / 1e6 AS o_right,
       FLOOR(CAST(GREATEST(ol, orr) AS DOUBLE) / dims / 1e9 * 1e6 + 0.5) / 1e6
         AS ecod_score
FROM agg ORDER BY vec_id
""",
)
def ecod_outlier_scores_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECOD outlier scores (Li, Zhao et al., TKDE 2022 — public
    method): per-dimension empirical-CDF tail log-likelihoods, summed
    over dimensions from both tails, score = the worse tail — the
    parameter-free density-forest-free outlier detector a curation
    pipeline runs on embeddings before ANN indexing (next to the
    distance-based anomaly gates). Ties collapse through RANGE-frame
    counts, so the score is independent of tie order.

    Determinism: tail ranks are exact ints; each -ln(rank/n) term
    quantizes to a 1e-9 int BEFORE the per-vector sum (the
    cluster_purity_report convention); outputs are single IEEE
    expressions.

    Plan shape / 100 TB: posexplode fans map-side; the ECDF windows
    partition BY DIMENSION (parallel across dims; within a dim Spark
    range-partitions the sort). At billion-vector scale the exact
    per-dim ECDF swaps for the GK-sketch quantile assignment
    (feature_quantile_bins' documented path); this exact form is the
    oracle-checkable twin."""
    emb = load_table(spark, sf_dir, "embeddings")
    elems = emb.select(
        "vec_id", F.posexplode("embedding").alias("j", "vf")
    ).select("vec_id", "j", F.col("vf").cast("double").alias("v"))
    wl = (
        Window.partitionBy("j")
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wr = (
        Window.partitionBy("j")
        .orderBy(F.col("v").desc())
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("j")
    ranked = elems.select(
        "vec_id",
        F.count("*").over(wl).alias("r_left"),
        F.count("*").over(wr).alias("r_right"),
        F.count("*").over(wn).alias("n"),
    )
    q = lambda c: F.floor(-F.log(c) * 1e9 + F.lit(0.5)).cast("long")  # noqa: E731
    terms = ranked.select(
        "vec_id",
        q(F.col("r_left").cast("double") / F.col("n")).alias("tl"),
        q(F.col("r_right").cast("double") / F.col("n")).alias("tr"),
    )
    agg = terms.groupBy("vec_id").agg(
        F.sum("tl").alias("ol"), F.sum("tr").alias("orr"), F.count("*").alias("dims")
    )
    out = lambda c: (  # noqa: E731
        F.floor(c.cast("double") / F.col("dims") / 1e9 * 1e6 + F.lit(0.5)) / 1e6
    )
    return agg.select(
        "vec_id",
        out(F.col("ol")).alias("o_left"),
        out(F.col("orr")).alias("o_right"),
        out(F.greatest(F.col("ol"), F.col("orr"))).alias("ecod_score"),
    ).orderBy("vec_id")


@register(
    "lof_outlier_scores",
    # exact L2 kNN (k=5) from the quantized integer arithmetic, then
    # reachability distances, integer lrd (5e12 DIV sum-reach) and
    # integer LOF ratios — every step exact in both engines
    """
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS v
  FROM embeddings
), n2 AS (
  SELECT vec_id,
         list_aggregate(list_transform(v, x -> x * x), 'sum') AS nn
  FROM qv
), dots AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         na.nn + nb.nn - 2 * CAST(list_dot_product(a.v, b.v) AS BIGINT) AS d2
  FROM qv a JOIN qv b ON a.vec_id <> b.vec_id
  JOIN n2 na ON na.vec_id = a.vec_id
  JOIN n2 nb ON nb.vec_id = b.vec_id
), knn AS (
  SELECT vec_id, neighbor_id,
         CAST(FLOOR(sqrt(CAST(d2 AS DOUBLE)) + 0.5) AS BIGINT) AS dq,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d2, neighbor_id) AS rank
  FROM dots QUALIFY rank <= 5
), kd AS (
  SELECT vec_id, MAX(dq) AS k_dist FROM knn GROUP BY 1
), reach AS (
  SELECT k.vec_id, GREATEST(kb.k_dist, k.dq) AS r
  FROM knn k JOIN kd kb ON kb.vec_id = k.neighbor_id
), lrd AS (
  SELECT vec_id, 5000000000000 // GREATEST(SUM(r), 1) AS lrd_q
  FROM reach GROUP BY 1
), lof AS (
  SELECT k.vec_id,
         SUM(lb.lrd_q) * 1000000 // (5 * la.lrd_q) AS lof_q
  FROM knn k
  JOIN lrd lb ON lb.vec_id = k.neighbor_id
  JOIN lrd la ON la.vec_id = k.vec_id
  GROUP BY k.vec_id, la.lrd_q
)
SELECT l.vec_id, kd.k_dist::BIGINT AS k_dist,
       FLOOR(CAST(l.lof_q AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS lof
FROM lof l JOIN kd USING (vec_id) ORDER BY l.vec_id
""",
)
def lof_outlier_scores_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local outlier factor (Breunig et al., SIGMOD 2000 — public
    method) over embeddings at k=5: reachability-smoothed density
    ratios, the DENSITY-relative outlier detector next to ECOD's
    marginal-tail scores (LOF flags points whose neighborhood is
    sparser than their neighbors' — cluster-aware where ECOD is
    axis-marginal).

    Determinism: the exact L2 kNN runs on milli-quantized integer
    arithmetic via the shared block-GEMM kernel under the classic
    MIPS reduction (append -|c|^2 to candidates, double the query and
    append 1 — argmax of the augmented dot IS argmin of d2, ties by
    id); distances, k-distances, reachabilities are exact bigints;
    lrd and LOF are integer floor divisions.

    Plan shape / 100 TB: the kNN is the documented block-grid exact
    diagnostic (IVF pruning replaces the grid at scale — ann_ivf's
    layout); everything after is three joins keyed on vec_id over
    k-bounded rows. Linear beyond the kNN."""
    from .operators.similarity import _block_topk_mips

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long"),
        ).alias("v"),
    )
    n2 = qv.select(
        "vec_id",
        F.aggregate(
            F.transform("v", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("nn"),
    )
    queries = qv.join(n2, "vec_id").select(
        "vec_id",
        F.concat(
            F.transform("v", lambda x: x * F.lit(2)), F.array(F.lit(1).cast("long"))
        ).alias("qv"),
    )
    cands = qv.join(n2, "vec_id").select(
        F.col("vec_id").alias("cand_id"),
        F.concat(F.col("v"), F.array(-F.col("nn"))).alias("cv"),
    )
    knn_aug = _block_topk_mips(queries, cands, k=5, blocks=None)
    # dot_q = 2*dot - |c|^2  ->  d2 = |a|^2 - dot_q
    knn = (
        knn_aug.join(n2, "vec_id")
        .select(
            "vec_id",
            "neighbor_id",
            F.floor(
                F.sqrt((F.col("nn") - F.col("dot_q")).cast("double")) + F.lit(0.5)
            )
            .cast("long")
            .alias("dq"),
        )
    )
    kd = knn.groupBy("vec_id").agg(F.max("dq").alias("k_dist"))
    reach = knn.join(
        kd.select(F.col("vec_id").alias("neighbor_id"), F.col("k_dist").alias("kd_b")),
        "neighbor_id",
    ).select("vec_id", F.greatest(F.col("kd_b"), F.col("dq")).alias("r"))
    lrd = reach.groupBy("vec_id").agg(
        F.expr("5000000000000L DIV GREATEST(SUM(r), 1L)").alias("lrd_q")
    )
    lof = (
        knn.join(
            lrd.select(F.col("vec_id").alias("neighbor_id"), F.col("lrd_q").alias("lrd_b")),
            "neighbor_id",
        )
        .join(lrd, "vec_id")
        .groupBy("vec_id", "lrd_q")
        .agg(F.expr("SUM(lrd_b) * 1000000L DIV (5 * FIRST(lrd_q))").alias("lof_q"))
    )
    return (
        lof.join(kd, "vec_id")
        .select(
            "vec_id",
            F.col("k_dist").cast("long").alias("k_dist"),
            (F.floor(F.col("lof_q").cast("double") / 1e6 * 1e4 + F.lit(0.5)) / 1e4).alias(
                "lof"
            ),
        )
        .orderBy("vec_id")
    )



def _mcnemar_oracle() -> str:
    from .operators.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    scores = ", ".join(
        f"{_lang_score(LANG_MARKERS[lang])} AS s_{lang}" for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    first_max = "CASE " + " ".join(
        f"WHEN s_{lang} = {greatest} THEN '{lang}'" for lang in langs
    ) + " END"
    ngram = ORACLES["text_lang_id_ngram"]
    return f"""
WITH scored AS (SELECT doc_id, {scores} FROM documents),
r1 AS (SELECT doc_id, {first_max} AS pred1 FROM scored),
r2 AS (SELECT doc_id, lang_pred AS pred2 FROM ({ngram})),
j AS (
  SELECT d.doc_id,
         CASE WHEN r1.pred1 = d.lang THEN 1 ELSE 0 END AS ok1,
         CASE WHEN r2.pred2 = d.lang THEN 1 ELSE 0 END AS ok2
  FROM documents d JOIN r1 USING (doc_id) JOIN r2 USING (doc_id)
)
SELECT COUNT(*)::BIGINT AS n_docs,
       SUM(CASE WHEN ok1 = 1 AND ok2 = 0 THEN 1 ELSE 0 END)::BIGINT AS b,
       SUM(CASE WHEN ok1 = 0 AND ok2 = 1 THEN 1 ELSE 0 END)::BIGINT AS c,
       CASE WHEN SUM(CASE WHEN ok1 <> ok2 THEN 1 ELSE 0 END) > 0 THEN
         FLOOR(
           (ABS(CAST(SUM(CASE WHEN ok1 = 1 AND ok2 = 0 THEN 1 ELSE 0 END)
                 - SUM(CASE WHEN ok1 = 0 AND ok2 = 1 THEN 1 ELSE 0 END)
                 AS DOUBLE)) - 1)
           * (ABS(CAST(SUM(CASE WHEN ok1 = 1 AND ok2 = 0 THEN 1 ELSE 0 END)
                 - SUM(CASE WHEN ok1 = 0 AND ok2 = 1 THEN 1 ELSE 0 END)
                 AS DOUBLE)) - 1)
           / SUM(CASE WHEN ok1 <> ok2 THEN 1 ELSE 0 END) * 1e6 + 0.5) / 1e6
       ELSE 0.0 END AS chi2_cc
FROM j
"""


@register("mcnemar_raters_test", _mcnemar_oracle())
def mcnemar_raters_test_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test with continuity correction (McNemar 1947 —
    public method) between the engine's two language-ID raters scored
    against the true lang label: are the raters' ACCURACIES different,
    judged only on the discordant pairs (b = only the marker rater
    right, c = only the n-gram rater right)? The paired-significance
    complement of cohens_kappa_report's agreement measure.

    Determinism: b/c are exact counts; chi2 = (|b-c|-1)^2/(b+c) is one
    fixed IEEE expression.

    Plan shape / 100 TB: both raters are map-side scoring passes; one
    doc-keyed join; a 4-cell census. Linear."""
    from .operators import text

    docs = load_table(spark, sf_dir, "documents")
    r1 = text.text_lang_id(docs).select("doc_id", F.col("lang_pred").alias("pred1"))
    r2 = text.text_lang_id_ngram(docs).select(
        "doc_id", F.col("lang_pred").alias("pred2")
    )
    j = (
        docs.select("doc_id", "lang")
        .join(r1, "doc_id")
        .join(r2, "doc_id")
        .select(
            F.when(F.col("pred1") == F.col("lang"), 1).otherwise(0).alias("ok1"),
            F.when(F.col("pred2") == F.col("lang"), 1).otherwise(0).alias("ok2"),
        )
    )
    b = F.sum(F.when((F.col("ok1") == 1) & (F.col("ok2") == 0), 1).otherwise(0))
    c = F.sum(F.when((F.col("ok1") == 0) & (F.col("ok2") == 1), 1).otherwise(0))
    disc = F.sum(F.when(F.col("ok1") != F.col("ok2"), 1).otherwise(0))
    return j.agg(
        F.count("*").cast("long").alias("n_docs"),
        b.cast("long").alias("b"),
        c.cast("long").alias("c"),
        F.when(
            disc > 0,
            F.floor(
                (F.abs((b - c).cast("double")) - 1)
                * (F.abs((b - c).cast("double")) - 1)
                / disc
                * 1e6
                + F.lit(0.5)
            )
            / 1e6,
        )
        .otherwise(F.lit(0.0))
        .alias("chi2_cc"),
    )


_QUALITY_CENSUS_CTE = f"""
WITH f AS (
  SELECT doc_id, lang,
         len({_TOKS})::DOUBLE AS n_tokens,
         length(text)::DOUBLE AS n_chars,
         len(list_filter({_TOKS}, t -> t IN ('the', 'a', 'of', 'and')))::DOUBLE
           AS n_stop,
         (length(text) - length(replace(text, '.', '')))::DOUBLE AS n_dots
  FROM documents
), wts AS (
  SELECT i.i AS i,
         2 * (CAST(concat('0x', substr(md5('qw:' || i.i), 1, 15)) AS UBIGINT)
              / 1152921504606846976.0) - 1 AS w
  FROM (SELECT UNNEST(range(5)) AS i) i
), z AS (
  SELECT f.doc_id, f.lang = 'en' AS is_pos,
         (SELECT w FROM wts WHERE i = 0) * (n_tokens / 100.0)
         + (SELECT w FROM wts WHERE i = 1) * (n_stop / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 2) * (n_chars / (n_tokens + 1.0))
         + (SELECT w FROM wts WHERE i = 3) * (n_dots / (n_chars + 1.0))
         + (SELECT w FROM wts WHERE i = 4) AS z
  FROM f
), census AS (
  SELECT CAST(FLOOR(z * 1e4 + 0.5) AS BIGINT) AS lv,
         COUNT(*) AS c,
         COUNT(CASE WHEN is_pos THEN 1 END) AS p
  FROM z GROUP BY 1
)
"""


@register(
    "gains_lift_deciles",
    # cumulative-gains table at population deciles from the
    # quantized-logit census: first census prefix reaching each decile
    _QUALITY_CENSUS_CTE
    + """
, cum AS (
  SELECT lv,
         SUM(c) OVER (ORDER BY lv DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_pred,
         SUM(p) OVER (ORDER BY lv DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         SUM(c) OVER () AS nn, SUM(p) OVER () AS pp
  FROM census
), deciles AS (SELECT UNNEST(range(1, 11)) AS d),
pick AS (
  SELECT d.d, MIN(cum.n_pred) AS n_sel
  FROM deciles d JOIN cum ON cum.n_pred * 10 >= d.d * cum.nn
  GROUP BY d.d
)
SELECT p2.d::BIGINT AS decile, p2.n_sel::BIGINT AS n_selected,
       c2.tp::BIGINT AS tp,
       FLOOR(CAST(c2.tp AS DOUBLE) / c2.pp * 1e6 + 0.5) / 1e6 AS gain,
       FLOOR(CAST(c2.tp AS DOUBLE) * c2.nn / (c2.pp * c2.n_pred) * 1e6 + 0.5)
         / 1e6 AS lift
FROM pick p2 JOIN cum c2 ON c2.n_pred = p2.n_sel
ORDER BY decile
""",
)
def gains_lift_deciles_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table at population deciles (the classic
    targeting-model readout — public practice): rank the corpus by the
    quality-model score descending and report, at each tenth of the
    population, the share of positives captured (gain) and its ratio
    to random targeting (lift) — the business-facing view of the same
    ranking model model_eval_auc scores and pr_curve_points sweeps.

    Determinism: runs entirely on the quantized-logit value CENSUS
    (the model_eval_auc convention) — decile boundaries are the first
    census prefix reaching n_pred*10 >= d*N, all exact integers; gain
    and lift are single IEEE expressions.

    Plan shape / 100 TB: scoring is one codegen pass; the census
    shuffle is bounded by distinct quantized logits; the decile pick
    joins a 10-row relation to the census prefix sums. Never a
    per-document global rank."""
    from .operators import text

    docs = load_table(spark, sf_dir, "documents")
    scored = text.quality_model_score(docs).join(
        docs.select("doc_id", (F.col("lang") == "en").alias("is_pos")), "doc_id"
    )
    lv = F.floor(F.col("logit") * 1e4 + F.lit(0.5)).cast("long")
    census = scored.groupBy(lv.alias("lv")).agg(
        F.count("*").alias("c"),
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).alias("p"),
    )
    wdesc = Window.orderBy(F.col("lv").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = census.select(
        "lv",
        F.sum("c").over(wdesc).alias("n_pred"),
        F.sum("p").over(wdesc).alias("tp"),
        F.sum("c").over(wall).alias("nn"),
        F.sum("p").over(wall).alias("pp"),
    )
    d = (
        census.sparkSession.range(1, 11)
        .select(F.col("id").alias("d"))
    )
    pick = (
        d.join(cum, cum.n_pred * 10 >= F.col("d") * cum.nn)
        .groupBy("d")
        .agg(F.min("n_pred").alias("n_sel"))
    )
    return (
        pick.join(cum, cum.n_pred == pick.n_sel)
        .select(
            F.col("d").cast("long").alias("decile"),
            F.col("n_sel").cast("long").alias("n_selected"),
            F.col("tp").cast("long").alias("tp"),
            (
                F.floor(F.col("tp").cast("double") / F.col("pp") * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("gain"),
            (
                F.floor(
                    F.col("tp").cast("double")
                    * F.col("nn")
                    / (F.col("pp") * F.col("n_pred"))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("lift"),
        )
        .orderBy("decile")
    )


@register(
    "model_ks_separation",
    # KS between positive and negative score distributions: exact
    # cross-multiplied ECDF gaps over the quantized-logit census,
    # argmax threshold ties to the smallest logit
    _QUALITY_CENSUS_CTE
    + """
, cum AS (
  SELECT lv,
         SUM(p) OVER (ORDER BY lv
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
         SUM(c - p) OVER (ORDER BY lv
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         SUM(p) OVER () AS pp, SUM(c - p) OVER () AS nn
  FROM census
), gaps AS (
  SELECT lv, ABS(cp * nn - cn * pp) AS dnum, pp, nn FROM cum
), best AS (
  SELECT lv, dnum, pp, nn,
         ROW_NUMBER() OVER (ORDER BY dnum DESC, lv) AS rn
  FROM gaps
)
SELECT pp::BIGINT AS n_pos, nn::BIGINT AS n_neg,
       lv / 1e4 AS ks_threshold,
       FLOOR(CAST(dnum AS DOUBLE) / pp / nn * 1e6 + 0.5) / 1e6 AS ks
FROM best WHERE rn = 1
""",
)
def model_ks_separation_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov model separation (the credit-scoring 'KS
    statistic' — public practice): the maximum gap between the score
    ECDFs of positives and negatives, with the threshold attaining it
    — the single-number ranking-power summary next to AUC (KS is the
    max vertical gap where AUC is the area; risk teams threshold ON
    the KS point).

    Determinism: ECDF gaps are exact cross-multiplied bigints over the
    quantized-logit census (the drift_ks convention applied to the
    label split); the argmax ties to the smallest logit.

    Plan shape / 100 TB: one scoring pass, one census shuffle, prefix
    sums over census rows, TakeOrdered-style argmax. Never a
    per-document rank."""
    from .operators import text

    docs = load_table(spark, sf_dir, "documents")
    scored = text.quality_model_score(docs).join(
        docs.select("doc_id", (F.col("lang") == "en").alias("is_pos")), "doc_id"
    )
    lv = F.floor(F.col("logit") * 1e4 + F.lit(0.5)).cast("long")
    census = scored.groupBy(lv.alias("lv")).agg(
        F.count("*").alias("c"),
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).alias("p"),
    )
    wasc = Window.orderBy("lv").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = census.select(
        "lv",
        F.sum("p").over(wasc).alias("cp"),
        F.sum(F.col("c") - F.col("p")).over(wasc).alias("cn"),
        F.sum("p").over(wall).alias("pp"),
        F.sum(F.col("c") - F.col("p")).over(wall).alias("nn"),
    )
    gaps = cum.select(
        "lv",
        F.abs(F.col("cp") * F.col("nn") - F.col("cn") * F.col("pp")).alias("dnum"),
        "pp",
        "nn",
    )
    return (
        gaps.orderBy(F.col("dnum").desc(), "lv")
        .limit(1)
        .select(
            F.col("pp").cast("long").alias("n_pos"),
            F.col("nn").cast("long").alias("n_neg"),
            (F.col("lv") / 1e4).alias("ks_threshold"),
            (
                F.floor(
                    F.col("dnum").cast("double") / F.col("pp") / F.col("nn") * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("ks"),
        )
    )


@register(
    "evt_pot_tail_report",
    # discrete P95 threshold (quantile_disc == degenerate-accuracy
    # percentile_approx on cents), exact integer exceedance moments,
    # method-of-moments GPD fit as fixed IEEE expressions
    """
WITH v AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), u AS (
  SELECT quantile_disc(cents, 0.95) AS thr FROM v
), exc AS (
  SELECT cents - u.thr AS y FROM v, u WHERE cents > u.thr
), m AS (
  SELECT COUNT(*) AS n, SUM(y) AS s1, SUM(y * y) AS s2 FROM exc
)
SELECT u.thr::BIGINT AS threshold_cents, m.n::BIGINT AS n_exceed,
       FLOOR(CAST(m.s1 AS DOUBLE) / m.n + 0.5)::BIGINT AS mean_excess_cents,
       FLOOR((1.0 - (CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n)
              / (CAST(m.s2 AS DOUBLE) / m.n
                 - (CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n)))
             / 2.0 * 1e6 + 0.5) / 1e6 AS xi_mom,
       FLOOR((CAST(m.s1 AS DOUBLE) / m.n)
             * ((CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n)
                / (CAST(m.s2 AS DOUBLE) / m.n
                   - (CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n))
                + 1.0)
             / 2.0 * 1e4 + 0.5) / 1e4 AS sigma_mom_cents
FROM u, m
""",
)
def evt_pot_tail_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value peaks-over-threshold tail report (Pickands 1975 /
    the POT method with the method-of-moments GPD fit, Hosking &
    Wallis 1987 — public methods): exceedances of purchase value over
    the discrete P95 threshold fit a generalized Pareto tail — shape
    xi (heavy tail when > 0) and scale sigma — the risk-team view of
    the same tail the MAD/z-score gates clip (EVT MODELS the tail
    instead of flagging it).

    Determinism: the threshold is the discrete quantile (an actual
    data value — the agg_percentiles_approx degenerate-accuracy
    convention); exceedance moments are exact integer sums; the MoM
    formulas xi = (1 - m^2/s^2)/2, sigma = m(m^2/s^2 + 1)/2 are fixed
    IEEE expressions over those sums.

    Plan shape / 100 TB: one filtered scan -> one 3-moment aggregate
    (the threshold via the same sketch degradation as the percentile
    family). Constant-size output. Linear."""
    events = load_events(spark, sf_dir)
    v = events.filter(F.col("event_type") == "purchase").select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents")
    )
    u = v.agg(
        F.expr("percentile_approx(cents, 0.95, 1000000)").cast("long").alias("thr")
    )
    exc = v.crossJoin(F.broadcast(u)).filter(F.col("cents") > F.col("thr")).select(
        (F.col("cents") - F.col("thr")).alias("y"), "thr"
    )
    m = exc.groupBy("thr").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    ratio = mean * mean / var
    return m.select(
        F.col("thr").cast("long").alias("threshold_cents"),
        F.col("n").cast("long").alias("n_exceed"),
        F.floor(mean + F.lit(0.5)).cast("long").alias("mean_excess_cents"),
        (F.floor((F.lit(1.0) - ratio) / F.lit(2.0) * 1e6 + F.lit(0.5)) / 1e6).alias(
            "xi_mom"
        ),
        (
            F.floor(mean * (ratio + F.lit(1.0)) / F.lit(2.0) * 1e4 + F.lit(0.5)) / 1e4
        ).alias("sigma_mom_cents"),
    )


@register(
    "best_of_n_selection",
    # exact E[max of n iid draws] per user from sorted-reward order
    # statistics: sum r_(i) * (i^n - (i-1)^n) / k^n, powers as explicit
    # HUGEINT products (no float pow), per-user values quantized to
    # cents before the cross-user average
    """
WITH cand AS (
  SELECT user_id, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) <= 10000
), ranked AS (
  SELECT user_id, cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY cents, event_id) AS i,
         COUNT(*) OVER (PARTITION BY user_id) AS k
  FROM cand
), fan AS (
  SELECT r.*, n.n FROM ranked r
  CROSS JOIN (SELECT UNNEST([1, 2, 4, 8]) AS n) n
), pw AS (
  SELECT user_id, n, k, cents,
         CASE n WHEN 1 THEN CAST(i AS HUGEINT)
                WHEN 2 THEN CAST(i AS HUGEINT) * i
                WHEN 4 THEN (CAST(i AS HUGEINT) * i) * (CAST(i AS HUGEINT) * i)
                ELSE ((CAST(i AS HUGEINT) * i) * (CAST(i AS HUGEINT) * i))
                     * ((CAST(i AS HUGEINT) * i) * (CAST(i AS HUGEINT) * i))
         END AS ipow,
         CASE n WHEN 1 THEN CAST(i - 1 AS HUGEINT)
                WHEN 2 THEN CAST(i - 1 AS HUGEINT) * (i - 1)
                WHEN 4 THEN (CAST(i - 1 AS HUGEINT) * (i - 1))
                            * (CAST(i - 1 AS HUGEINT) * (i - 1))
                ELSE ((CAST(i - 1 AS HUGEINT) * (i - 1))
                      * (CAST(i - 1 AS HUGEINT) * (i - 1)))
                     * ((CAST(i - 1 AS HUGEINT) * (i - 1))
                        * (CAST(i - 1 AS HUGEINT) * (i - 1)))
         END AS ipow_prev,
         CASE n WHEN 1 THEN CAST(k AS HUGEINT)
                WHEN 2 THEN CAST(k AS HUGEINT) * k
                WHEN 4 THEN (CAST(k AS HUGEINT) * k) * (CAST(k AS HUGEINT) * k)
                ELSE ((CAST(k AS HUGEINT) * k) * (CAST(k AS HUGEINT) * k))
                     * ((CAST(k AS HUGEINT) * k) * (CAST(k AS HUGEINT) * k))
         END AS kpow
  FROM fan
), per_user AS (
  SELECT user_id, n,
         CAST(FLOOR(CAST(SUM(CAST(cents AS HUGEINT) * (ipow - ipow_prev))
                         AS DOUBLE)
                    / CAST(ANY_VALUE(kpow) AS DOUBLE) + 0.5) AS BIGINT) AS eq
  FROM pw GROUP BY user_id, n
), agg AS (
  SELECT n, COUNT(*) AS n_users,
         FLOOR(CAST(SUM(eq) AS DOUBLE) / COUNT(*) * 1e4 + 0.5) / 1e4
           AS avg_best_cents
  FROM per_user GROUP BY n
), base AS (SELECT avg_best_cents AS b1 FROM agg WHERE n = 1)
SELECT a.n::BIGINT AS n, a.n_users::BIGINT AS n_users, a.avg_best_cents,
       FLOOR(a.avg_best_cents / b.b1 * 1e6 + 0.5) / 1e6 AS uplift_vs_mean
FROM agg a, base b ORDER BY a.n
""",
)
def best_of_n_selection_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n selection curve (the rejection-sampling / BoN policy
    readout used across RLHF data pipelines — public method; the exact
    order-statistics identity E[max of n] = sum r_(i) *
    (i^n - (i-1)^n) / k^n): per user, the expected best purchase value
    under n iid draws from their own candidates, for n in {1,2,4,8} —
    quantifying how much reward best-of-n buys over the mean (n=1).

    Determinism: ranks sort by (reward, event_id); integer powers are
    explicit DECIMAL(38,0)/HUGEINT products (float pow would round past
    2^53); each per-user expectation quantizes to exact cents BEFORE
    the cross-user average.

    Overflow envelope: i^8 in decimal(38,0) holds 38 digits, so an
    uncapped user with >~42k purchase rows would silently null in
    Spark (non-ANSI) while the DuckDB HUGEINT oracle errors. Candidates
    are therefore capped DETERMINISTICALLY at 10,000 per user (first by
    event_id, identically in both engines): 10000^8 = 1e32 and the
    cents-weighted sum stays under 1e37, inside both decimal(38,0) and
    HUGEINT.

    Plan shape / 100 TB: one user-keyed rank window; the n fan-out is
    map-side x4; per-(user, n) partial aggregation bounds the shuffle.
    Linear."""
    events = load_events(spark, sf_dir)
    cand = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .withColumn(
            "_cap_rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("event_id")
            ),
        )
        .filter(F.col("_cap_rn") <= 10000)
        .drop("_cap_rn")
    )
    wu = Window.partitionBy("user_id")
    ranked = cand.select(
        "user_id",
        "cents",
        F.row_number().over(wu.orderBy("cents", "event_id")).alias("i"),
        F.count("*").over(wu).alias("k"),
    )
    fan = ranked.crossJoin(
        F.broadcast(
            events.sparkSession.range(1).select(
                F.explode(F.array(F.lit(1), F.lit(2), F.lit(4), F.lit(8))).alias("n")
            )
        )
    )

    def powx(expr):
        d = expr.cast("decimal(38,0)")
        return (
            F.when(F.col("n") == 1, d)
            .when(F.col("n") == 2, d * d)
            .when(F.col("n") == 4, (d * d) * (d * d))
            .otherwise(((d * d) * (d * d)) * ((d * d) * (d * d)))
        )

    pw = fan.select(
        "user_id",
        "n",
        "cents",
        powx(F.col("i")).alias("ipow"),
        powx(F.col("i") - 1).alias("ipow_prev"),
        powx(F.col("k")).alias("kpow"),
    )
    per_user = pw.groupBy("user_id", "n").agg(
        F.floor(
            F.sum(
                F.col("cents").cast("decimal(38,0)")
                * (F.col("ipow") - F.col("ipow_prev"))
            ).cast("double")
            / F.first("kpow").cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("eq")
    )
    agg = per_user.groupBy("n").agg(
        F.count("*").alias("n_users"),
        (
            F.floor(F.sum("eq").cast("double") / F.count("*") * 1e4 + F.lit(0.5)) / 1e4
        ).alias("avg_best_cents"),
    )
    base = agg.filter(F.col("n") == 1).select(F.col("avg_best_cents").alias("b1"))
    return (
        agg.crossJoin(F.broadcast(base))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("n_users").cast("long").alias("n_users"),
            "avg_best_cents",
            (
                F.floor(F.col("avg_best_cents") / F.col("b1") * 1e6 + F.lit(0.5)) / 1e6
            ).alias("uplift_vs_mean"),
        )
        .orderBy("n")
    )


@register(
    "group_sequential_obf",
    # four scheduled looks at epoch quartiles; per-look cumulative
    # user/conversion censuses per arm; pooled two-proportion z as one
    # fixed IEEE expression; O'Brien-Fleming bounds (public table)
    """
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
), looks AS (
  SELECT k.k AS look,
         b.mn + (b.mx - b.mn + 1) * k.k // 4 AS cutoff,
         CASE k.k WHEN 1 THEN 4.048 WHEN 2 THEN 2.862
                  WHEN 3 THEN 2.337 ELSE 2.024 END AS bound
  FROM bounds b, (SELECT UNNEST(range(1, 5)) AS k) k
), pu AS (
  SELECT l.look, l.bound, user_id % 2 AS arm, user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events e JOIN looks l ON epoch_us(e.ts) < l.cutoff
  GROUP BY 1, 2, 3, 4
), cells AS (
  SELECT look, bound,
         SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
         SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS k0,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS k1
  FROM pu GROUP BY 1, 2
), z AS (
  SELECT look, bound, n0, k0, n1, k1,
         CASE WHEN n0 > 0 AND n1 > 0 AND k0 + k1 > 0
                   AND k0 + k1 < n0 + n1 THEN
           FLOOR((CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0)
                 / sqrt((CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                        * (1.0 - CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)) * 1e4 + 0.5) / 1e4
         ELSE 0.0 END AS z
  FROM cells
)
SELECT look::BIGINT AS look, n0::BIGINT AS n0, k0::BIGINT AS k0,
       n1::BIGINT AS n1, k1::BIGINT AS k1, z, bound,
       ABS(z) >= bound AS crossed
FROM z ORDER BY look
""",
)
def group_sequential_obf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential A/B monitoring with O'Brien-Fleming boundaries
    (O'Brien & Fleming 1979; boundary values from the published K=4,
    two-sided alpha=0.05 table — public method): the experiment is
    examined at four SCHEDULED looks (epoch quartiles), each with a
    pooled two-proportion z against an increasingly lenient bound
    (4.048, 2.862, 2.337, 2.024) — the industry-standard peeking
    discipline between the fixed-horizon ab_test_report and the
    per-event sprt_sequential_test.

    Determinism: look cutoffs are exact integer epoch arithmetic (the
    did_estimate convention); per-look censuses are exact ints; each z
    is one fixed IEEE expression quantized to 1e-4.

    Plan shape / 100 TB: the event-look join fans x4 map-side (looks
    broadcast); ONE user-level shuffle keyed (look, arm, user) feeds
    8-cell censuses; everything after is census algebra. Linear."""
    events = load_events(spark, sf_dir)
    b = events.agg(
        F.min(F.unix_micros("ts")).alias("mn"), F.max(F.unix_micros("ts")).alias("mx")
    )
    looks = (
        events.sparkSession.range(1, 5)
        .select(F.col("id").alias("look"))
        .crossJoin(F.broadcast(b))
        .select(
            "look",
            (
                F.col("mn")
                + F.expr("(mx - mn + 1) * look DIV 4")
            ).alias("cutoff"),
            F.when(F.col("look") == 1, 4.048)
            .when(F.col("look") == 2, 2.862)
            .when(F.col("look") == 3, 2.337)
            .otherwise(2.024)
            .alias("bound"),
        )
    )
    pu = (
        events.crossJoin(F.broadcast(looks))
        .filter(F.unix_micros("ts") < F.col("cutoff"))
        .groupBy(
            "look",
            "bound",
            F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
            "user_id",
        )
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "conv"
            )
        )
    )
    cells = pu.groupBy("look", "bound").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("k0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("k1"),
    )
    p_pool = (F.col("k0") + F.col("k1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = F.when(
        (F.col("n0") > 0)
        & (F.col("n1") > 0)
        & (F.col("k0") + F.col("k1") > 0)
        & (F.col("k0") + F.col("k1") < F.col("n0") + F.col("n1")),
        F.floor(
            (
                F.col("k1").cast("double") / F.col("n1")
                - F.col("k0").cast("double") / F.col("n0")
            )
            / F.sqrt(
                p_pool
                * (F.lit(1.0) - p_pool)
                * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
            )
            * 1e4
            + F.lit(0.5)
        )
        / 1e4,
    ).otherwise(F.lit(0.0))
    return (
        cells.select(
            F.col("look").cast("long").alias("look"),
            F.col("n0").cast("long").alias("n0"),
            F.col("k0").cast("long").alias("k0"),
            F.col("n1").cast("long").alias("n1"),
            F.col("k1").cast("long").alias("k1"),
            z.alias("z"),
            "bound",
        )
        .withColumn("crossed", F.abs(F.col("z")) >= F.col("bound"))
        .orderBy("look")
    )


@register(
    "good_turing_unseen_mass",
    # token census -> frequency-of-frequencies census -> Good-Turing
    # unseen mass and smoothed counts for r = 1..5, all exact integers
    # until the final divisions
    """
WITH tok AS (
  SELECT UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> t <> '')) AS t
  FROM documents
), tc AS (
  SELECT t, COUNT(*) AS r FROM tok GROUP BY 1
), fof AS (
  SELECT r, COUNT(*) AS n_r FROM tc GROUP BY 1
), tot AS (
  SELECT SUM(r * n_r) AS n_tokens, SUM(n_r) AS vocab FROM fof
)
SELECT t.n_tokens::BIGINT AS n_tokens, t.vocab::BIGINT AS vocab,
       COALESCE((SELECT n_r FROM fof WHERE r = 1), 0)::BIGINT AS n1,
       FLOOR(CAST(COALESCE((SELECT n_r FROM fof WHERE r = 1), 0) AS DOUBLE)
             / t.n_tokens * 1e6 + 0.5) / 1e6 AS p_unseen,
       FLOOR(CAST(COALESCE((SELECT n_r FROM fof WHERE r = 2), 0) AS DOUBLE) * 2
             / GREATEST(COALESCE((SELECT n_r FROM fof WHERE r = 1), 0), 1)
             * 1e4 + 0.5) / 1e4 AS r_star_1,
       FLOOR(CAST(COALESCE((SELECT n_r FROM fof WHERE r = 3), 0) AS DOUBLE) * 3
             / GREATEST(COALESCE((SELECT n_r FROM fof WHERE r = 2), 0), 1)
             * 1e4 + 0.5) / 1e4 AS r_star_2
FROM tot t
""",
)
def good_turing_unseen_mass_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-species estimate (Good 1953; Gale & Sampson
    1995 exposition — public method): from the frequency-of-
    frequencies census of the token vocabulary, the probability mass
    the corpus assigns to TOKENS IT HAS NEVER SEEN is N1/N (the
    singleton share), and the smoothed counts r* = (r+1) N_{r+1}/N_r
    re-estimate the rare tail — the vocabulary-coverage forecast a
    tokenizer/LM pipeline reads before freezing a vocab (vocab_coverage
    reports what the top-V covers; Good-Turing forecasts what NEW data
    will bring).

    Determinism: both censuses are exact ints; the outputs are single
    IEEE divisions (zero-guarded).

    Plan shape / 100 TB: token census (partial-agg shuffle bounded by
    |vocab|) -> frequency-of-frequencies census (bounded by distinct
    counts) -> constant-size report. Linear."""
    from .operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.filter(tokens(F.col("text")), lambda t: t != "")).alias("t")
    )
    tc = tok.groupBy("t").agg(F.count("*").alias("r"))
    fof = tc.groupBy("r").agg(F.count("*").alias("n_r"))
    tot = fof.agg(
        F.sum(F.col("r") * F.col("n_r")).alias("n_tokens"),
        F.sum("n_r").alias("vocab"),
    )
    pick = lambda rr: F.coalesce(  # noqa: E731
        F.sum(F.when(F.col("r") == rr, F.col("n_r"))), F.lit(0)
    )
    ns = fof.agg(
        pick(1).alias("n1"), pick(2).alias("n2"), pick(3).alias("n3")
    )
    return (
        tot.crossJoin(F.broadcast(ns))
        .select(
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("vocab").cast("long").alias("vocab"),
            F.col("n1").cast("long").alias("n1"),
            (
                F.floor(
                    F.col("n1").cast("double") / F.col("n_tokens") * 1e6 + F.lit(0.5)
                )
                / 1e6
            ).alias("p_unseen"),
            (
                F.floor(
                    F.col("n2").cast("double")
                    * 2
                    / F.greatest(F.col("n1"), F.lit(1))
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("r_star_1"),
            (
                F.floor(
                    F.col("n3").cast("double")
                    * 3
                    / F.greatest(F.col("n2"), F.lit(1))
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("r_star_2"),
        )
    )


@register(
    "capture_recapture_estimate",
    # two temporal "captures" (epoch halves); Chapman estimator from
    # exact distinct-user counts; exact integer epoch split
    """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
), tagged AS (
  SELECT DISTINCT user_id,
         CASE WHEN epoch_us(ts) < (b.mn + b.mx) // 2 THEN 0 ELSE 1 END AS half
  FROM events, b
), caps AS (
  SELECT
    COUNT(DISTINCT CASE WHEN half = 0 THEN user_id END) AS n1,
    COUNT(DISTINCT CASE WHEN half = 1 THEN user_id END) AS n2
  FROM tagged
), m AS (
  SELECT COUNT(*) AS m FROM (
    SELECT user_id FROM tagged GROUP BY user_id HAVING COUNT(*) = 2
  )
), truth AS (
  SELECT COUNT(DISTINCT user_id) AS n_true FROM events
)
SELECT c.n1::BIGINT AS n_first, c.n2::BIGINT AS n_second, m.m::BIGINT AS n_both,
       FLOOR(CAST((c.n1 + 1) AS DOUBLE) * (c.n2 + 1) / (m.m + 1) - 1 + 0.5)
         ::BIGINT AS n_hat_chapman,
       t.n_true::BIGINT AS n_true
FROM caps c, m, truth t
""",
)
def capture_recapture_estimate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimation (Lincoln-Petersen with
    the Chapman 1951 bias correction — public method): treat the two
    epoch halves of the stream as two capture occasions; the overlap
    of distinct users estimates the TOTAL population N ~ (n1+1)(n2+1)
    / (m+1) - 1 — the technique a data platform uses to estimate how
    many distinct entities exist beyond what two overlapping crawls /
    log windows saw (the ground truth column makes the estimator's
    bias directly visible).

    Determinism: the split is exact integer epoch arithmetic; all
    counts are exact distinct censuses; the estimator is one fixed
    IEEE expression rounded half-up to an integer.

    Plan shape / 100 TB: one distinct-(user, half) shuffle -> scalar
    censuses. Linear."""
    events = load_events(spark, sf_dir)
    b = events.agg(
        F.min(F.unix_micros("ts")).alias("mn"), F.max(F.unix_micros("ts")).alias("mx")
    )
    tagged = (
        events.crossJoin(F.broadcast(b))
        .select(
            "user_id",
            F.when(
                F.unix_micros("ts")
                < F.floor((F.col("mn") + F.col("mx")) / 2).cast("long"),
                0,
            )
            .otherwise(1)
            .alias("half"),
        )
        .distinct()
    )
    per_user = tagged.groupBy("user_id").agg(F.count("*").alias("n_halves"))
    caps = tagged.agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n2"),
    )
    m = per_user.agg(
        F.sum(F.when(F.col("n_halves") == 2, 1).otherwise(0)).alias("m")
    )
    truth = events.agg(F.countDistinct("user_id").alias("n_true"))
    return (
        caps.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(truth))
        .select(
            F.col("n1").cast("long").alias("n_first"),
            F.col("n2").cast("long").alias("n_second"),
            F.col("m").cast("long").alias("n_both"),
            F.floor(
                (F.col("n1") + 1).cast("double")
                * (F.col("n2") + 1)
                / (F.col("m") + 1)
                - 1
                + F.lit(0.5)
            )
            .cast("long")
            .alias("n_hat_chapman"),
            F.col("n_true").cast("long").alias("n_true"),
        )
    )


@register(
    "heaps_law_fit",
    # doc-id decile buckets (integer arithmetic, no global window);
    # V(N) points from first-occurrence-bucket and occurrence censuses;
    # log-log OLS with per-term 1e-6 quantization (the zipf convention)
    """
WITH b AS (
  SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM documents
), tok AS (
  SELECT d.doc_id,
         LEAST((d.doc_id - b.mn) * 10 // (b.mx - b.mn + 1), 9) AS bucket,
         UNNEST(list_filter(string_split_regex(trim(d.text), '\\s+'),
                            t -> t <> '')) AS t
  FROM documents d, b
), occ AS (
  SELECT bucket, COUNT(*) AS n_occ FROM tok GROUP BY 1
), firsts AS (
  SELECT MIN(bucket) AS fb FROM tok GROUP BY t
), vnew AS (
  SELECT fb AS bucket, COUNT(*) AS v_new FROM firsts GROUP BY 1
), pts AS (
  SELECT o.bucket,
         SUM(o.n_occ) OVER (ORDER BY o.bucket
                            ROWS UNBOUNDED PRECEDING) AS big_n,
         SUM(COALESCE(v.v_new, 0)) OVER (ORDER BY o.bucket
                            ROWS UNBOUNDED PRECEDING) AS big_v
  FROM occ o LEFT JOIN vnew v USING (bucket)
), logs AS (
  SELECT CAST(FLOOR(LN(CAST(big_n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(LN(CAST(big_v AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
  FROM pts WHERE big_n > 0 AND big_v > 0
), m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM logs
)
SELECT n::BIGINT AS n_points,
       FLOOR((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             * 1e6 + 0.5) / 1e6 AS heaps_beta,
       FLOOR((CAST(sy AS DOUBLE) / n
              - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(sx AS DOUBLE) / n)) / 1e6 * 1e4 + 0.5) / 1e4
         AS heaps_log_k
FROM m
""",
)
def heaps_law_fit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps 1978 — public law:
    V(N) ~ K * N^beta): vocabulary size V at ten corpus prefixes
    against tokens seen N, fit by log-log OLS — the growth-forecast
    companion to good_turing_unseen_mass (Good-Turing says how much
    NEW mass the next batch brings; Heaps says how the vocab curve
    bends as the corpus scales 10x).

    Determinism: prefixes are integer doc-id decile buckets (no global
    window); V/N points come from exact first-occurrence-bucket and
    occurrence censuses; each log quantizes to a 1e-6 int before the
    OLS moment sums (the zipf_fit_report convention).

    Plan shape / 100 TB: one token explode feeds BOTH censuses (the
    occurrence census and the per-token min-bucket census — each one
    partial-agg shuffle); the fit runs on 10 points. Linear."""
    from .operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    b = docs.agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
    tok = (
        docs.crossJoin(F.broadcast(b))
        .select(
            F.least(
                F.expr("(doc_id - mn) * 10 DIV (mx - mn + 1)"), F.lit(9)
            ).alias("bucket"),
            F.explode(F.filter(tokens(F.col("text")), lambda t: t != "")).alias("t"),
        )
    )
    occ = tok.groupBy("bucket").agg(F.count("*").alias("n_occ"))
    firsts = tok.groupBy("t").agg(F.min("bucket").alias("fb"))
    vnew = firsts.groupBy(F.col("fb").alias("bucket")).agg(
        F.count("*").alias("v_new")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        occ.join(vnew, "bucket", "left")
        .select(
            "bucket",
            F.sum("n_occ").over(w).alias("big_n"),
            F.sum(F.coalesce(F.col("v_new"), F.lit(0))).over(w).alias("big_v"),
        )
        .filter((F.col("big_n") > 0) & (F.col("big_v") > 0))
    )
    q = lambda c: F.floor(F.log(c.cast("double")) * 1e6 + F.lit(0.5)).cast("long")  # noqa: E731
    logs = pts.select(q(F.col("big_n")).alias("x"), q(F.col("big_v")).alias("y"))
    m = logs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    return m.select(
        F.col("n").cast("long").alias("n_points"),
        (F.floor(slope * 1e6 + F.lit(0.5)) / 1e6).alias("heaps_beta"),
        (
            F.floor(
                (
                    F.col("sy").cast("double") / F.col("n")
                    - slope * (F.col("sx").cast("double") / F.col("n"))
                )
                / 1e6
                * 1e4
                + F.lit(0.5)
            )
            / 1e4
        ).alias("heaps_log_k"),
    )
