"""Schemas and constants.

1. The nested event schema the reference's filters implicitly navigate
   (reference: app/server/my_modules/objectFilter/index.js:5-68). Scalars
   use the Avro-JSON union encoding — a value is a one-field struct
   ``{long: n}`` / ``{string: s}`` and "absent" is NULL at the wrapper
   level (comment at objectFilter/index.js:13).

2. KPL (Kinesis Producer Library) aggregation constants
   (reference: kinesisReader/resources/constants.js:12,
   kinesisReader/resources/kpl.proto:1-16).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Fully-qualified Java class names used as struct-field names in
# `baseEventData` (objectFilter/index.js:14,26,59). Dots are literal —
# Spark column references must backtick-quote them.
CONTACT_EVENT = "com.incontact.datainfra.events.ContactEvent"
AGENT_EVENT = "com.incontact.datainfra.events.AgentEvent"


def _long_wrapper() -> StructType:
    # Avro-JSON union ["null","long"]: {"long": 123} or NULL.
    return StructType([StructField("long", LongType())])


def _string_wrapper() -> StructType:
    return StructType([StructField("string", StringType())])


CONTACT_IDENTIFICATION = StructType(
    [
        StructField("contactId", _long_wrapper()),       # objectFilter/index.js:15
        StructField("contactIdAlt", _long_wrapper()),    # objectFilter/index.js:16
    ]
)

AGENT_IDENTIFICATION = StructType(
    [
        StructField("agentId", _long_wrapper()),         # objectFilter/index.js:27
        StructField("agentIdAlt", _long_wrapper()),      # objectFilter/index.js:28
    ]
)

AGENT_SHIFT_IDENTIFICATION = StructType(
    [
        StructField("agentShiftId", _long_wrapper()),    # objectFilter/index.js:60
        StructField("agentShiftIdAlt", _long_wrapper()), # objectFilter/index.js:61
        StructField("agentIdentification", AGENT_IDENTIFICATION),
    ]
)

TENANT_ID = StructType(
    [
        StructField("tenantId", _long_wrapper()),        # objectFilter/index.js:48
        StructField("tenantIdAlt", _long_wrapper()),     # objectFilter/index.js:49
        StructField("serverName", _string_wrapper()),    # objectFilter/index.js:37
    ]
)

BASE_EVENT_DATA = StructType(
    [
        StructField(
            CONTACT_EVENT,
            StructType(
                [
                    StructField(
                        "mediaScopeIdentification",
                        StructType([StructField("contactIdentification", CONTACT_IDENTIFICATION)]),
                    )
                ]
            ),
        ),
        StructField(
            AGENT_EVENT,
            StructType([StructField("agentShiftIdentification", AGENT_SHIFT_IDENTIFICATION)]),
        ),
    ]
)

# Full nested event row: engine envelope (Kinesis record metadata) + body.
EVENT_SCHEMA = StructType(
    [
        StructField("event_time", TimestampType()),
        StructField("partition_key", StringType()),
        StructField("sequence_number", LongType()),
        StructField("tenantId", TENANT_ID),
        StructField("baseEventData", BASE_EVENT_DATA),
    ]
)

# Pre-parse wire format for ingestion operators (FIXTURES.md §2).
RAW_RECORD_SCHEMA = StructType(
    [
        StructField("arrival_time", TimestampType()),
        StructField("partition_key", StringType()),
        StructField("sequence_number", LongType()),
        StructField("data", BinaryType()),
    ]
)

# --- KPL aggregation wire format -------------------------------------------
# An aggregated Kinesis record is:
#   4-byte magic 0xF3899AC2 (constants.js:12)
#   protobuf AggregatedRecord body (kpl.proto:1-16)
#   16-byte MD5 of the body (kinesisReader/index.js:139-152)
KPL_MAGIC = bytes.fromhex("f3899ac2")
KPL_MD5_LEN = 16

# Protobuf field numbers (kpl.proto). The container lacks google.protobuf,
# so operators/ingest.py hand-rolls the (trivial) wire-format codec.
AGG_FIELD_PARTITION_KEY_TABLE = 1  # repeated string
AGG_FIELD_EXPLICIT_HASH_KEY_TABLE = 2  # repeated string
AGG_FIELD_RECORDS = 3  # repeated Record
REC_FIELD_PARTITION_KEY_INDEX = 1  # required uint64
REC_FIELD_EXPLICIT_HASH_KEY_INDEX = 2  # optional uint64
REC_FIELD_DATA = 3  # required bytes
REC_FIELD_TAGS = 4  # repeated Tag

# Reference front-door parameter contract (app/server/index.js:46-48),
# plus `limit` — an ENGINE EXTENSION bounding the response array. The
# reference materializes the whole window in one Node heap
# (responses/index.js:34); `limit` caps what a wide window can pin on
# the driver.
ALLOWED_PARAMS = (
    "duration",
    "streamname",
    "contactId",
    "agentId",
    "serverName",
    "tenantId",
    "agentShiftId",
    "limit",
)
REQUIRED_PARAMS = ("streamname",)

# Engine extension: hard ceiling on rows materialized per /records
# response; a request's `limit` can lower it, never raise it.
MAX_RESPONSE_ROWS = 10_000

# Lookback window behavior (app/server/index.js:28-34).
DEFAULT_DURATION_MINUTES = 10
MAX_DURATION_MINUTES = 960  # silently clamped
