"""Project the driver's flat `events` fixture into the reference's nested
event shape, and flatten it back for oracle-comparable output.

The reference's filters navigate a deeply nested Avro-JSON event
(objectFilter/index.js:5-68; schema reconstructed in schema.py). The
driver's synthetic `events` table is flat (event_id, ts, user_id,
event_type, value, props), so the engine derives the nested shape with a
fixed, documented mapping. The mapping is pure column algebra — it runs
inside whole-stage codegen, costs no shuffle, and is mirrored exactly by
the DuckDB oracle SQL (registry.py) so the nested-navigation semantics
(NULL wrapper => non-match, missing branch => non-match) are actually
exercised end-to-end.

Mapping (flat -> nested), chosen to cover every predicate branch in
FIXTURES.md §1:

- event_time      = ts; partition_key = str(user_id); sequence_number = event_id
- tenantId.tenantId     = {long: user_id}        unless user_id % 7 == 0 (NULL wrapper)
- tenantId.tenantIdAlt  = {long: user_id + 1000} unless user_id % 5 == 0
- tenantId.serverName   = {string: 'Server-' || event_type}   (mixed case on purpose)
- baseEventData.ContactEvent present iff event_type IN (click, view, purchase):
    ...contactId    = {long: event_id % 500} unless event_id % 3 == 0
    ...contactIdAlt = {long: event_id % 100} unless event_id % 4 == 0
- baseEventData.AgentEvent present iff event_type IN (signup, error):
    ...agentShiftId    = {long: event_id % 50} unless event_id % 3 == 0
    ...agentShiftIdAlt = {long: event_id % 60} unless event_id % 4 == 0
    ...agentId         = {long: user_id * 10}  unless user_id % 3 == 0
    ...agentIdAlt      = {long: user_id + 500} unless user_id % 4 == 0
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import AGENT_EVENT, CONTACT_EVENT

CONTACT_TYPES = ("click", "view", "purchase")
AGENT_TYPES = ("signup", "error")


def _wrap_long(value: Column, absent: Column) -> Column:
    """Avro-JSON union encoding: NULL wrapper when absent, else {long: v}."""
    return F.when(absent, F.lit(None)).otherwise(F.struct(value.cast("long").alias("long")))


def to_nested(df: DataFrame) -> DataFrame:
    """flat driver events -> nested reference events (EVENT_SCHEMA shape)."""
    e, u, t = F.col("event_id"), F.col("user_id"), F.col("event_type")

    tenant = F.struct(
        _wrap_long(u, u % 7 == F.lit(0)).alias("tenantId"),
        _wrap_long(u + 1000, u % 5 == F.lit(0)).alias("tenantIdAlt"),
        F.struct(F.concat(F.lit("Server-"), t).alias("string")).alias("serverName"),
    )

    contact_branch = F.when(
        t.isin(*CONTACT_TYPES),
        F.struct(
            F.struct(
                F.struct(
                    _wrap_long(e % 500, e % 3 == F.lit(0)).alias("contactId"),
                    _wrap_long(e % 100, e % 4 == F.lit(0)).alias("contactIdAlt"),
                ).alias("contactIdentification")
            ).alias("mediaScopeIdentification")
        ),
    )

    agent_branch = F.when(
        t.isin(*AGENT_TYPES),
        F.struct(
            F.struct(
                _wrap_long(e % 50, e % 3 == F.lit(0)).alias("agentShiftId"),
                _wrap_long(e % 60, e % 4 == F.lit(0)).alias("agentShiftIdAlt"),
                F.struct(
                    _wrap_long(u * 10, u % 3 == F.lit(0)).alias("agentId"),
                    _wrap_long(u + 500, u % 4 == F.lit(0)).alias("agentIdAlt"),
                ).alias("agentIdentification"),
            ).alias("agentShiftIdentification")
        ),
    )

    return df.select(
        F.col("ts").alias("event_time"),
        u.cast("string").alias("partition_key"),
        e.alias("sequence_number"),
        tenant.alias("tenantId"),
        F.struct(
            contact_branch.alias(CONTACT_EVENT),
            agent_branch.alias(AGENT_EVENT),
        ).alias("baseEventData"),
    )


def flatten_ids(df: DataFrame) -> DataFrame:
    """Nested events -> flat comparable projection (for oracles/tests).

    Extracts every id the filters touch; NULL where the wrapper or the
    branch is NULL — byte-for-byte the shape the oracle SQL computes.
    """
    contact = f"baseEventData.`{CONTACT_EVENT}`.mediaScopeIdentification.contactIdentification"
    shift = f"baseEventData.`{AGENT_EVENT}`.agentShiftIdentification"
    return df.select(
        F.col("sequence_number").alias("event_id"),
        F.col("tenantId.tenantId.long").alias("tenant_id"),
        F.col("tenantId.tenantIdAlt.long").alias("tenant_id_alt"),
        F.col("tenantId.serverName.string").alias("server_name"),
        F.col(f"{contact}.contactId.long").alias("contact_id"),
        F.col(f"{contact}.contactIdAlt.long").alias("contact_id_alt"),
        F.col(f"{shift}.agentShiftId.long").alias("agent_shift_id"),
        F.col(f"{shift}.agentShiftIdAlt.long").alias("agent_shift_id_alt"),
        F.col(f"{shift}.agentIdentification.agentId.long").alias("agent_id"),
        F.col(f"{shift}.agentIdentification.agentIdAlt.long").alias("agent_id_alt"),
    )
