"""Query registry: every implemented operator as a named (spark, sf_dir)
-> DataFrame callable, with a DuckDB oracle-SQL twin where the semantics
are ANSI-SQL-expressible.

This is the engine's public face for the correctness driver
(__spark_entry__.py re-exports it). Column names are aliased identically
on both sides — the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

    raw = kpl_raw_records(spark, sf_dir, group_size=4)
    exploded = deagg_explode(raw)
    parsed = json_parse(exploded, schema="event_id BIGINT, k BIGINT")
    return parsed.select("event_id", "k")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
