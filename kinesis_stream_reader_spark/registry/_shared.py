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

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.events import flatten_ids, to_nested
from ..operators.filters import (
    agent_id_predicate,
    agent_shift_id_predicate,
    contact_id_predicate,
    filter_records,
    server_name_predicate,
    tenant_id_predicate,
    with_data_relative_window,
)
from ..plans.pipeline import records_plan, sink_json
from ..sources.tables import load_events, load_table

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

