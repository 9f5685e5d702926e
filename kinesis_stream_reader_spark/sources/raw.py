"""Synthetic raw-wire-record source: packs the driver's `events` table
into KPL aggregated records (FIXTURES.md §2 shape) so the ingestion
operators can be exercised — and oracle-checked — end-to-end without a
live Kinesis stream.

Each event becomes the JSON payload {"event_id": ..., "k": ...}; events
are grouped (event_id div group_size) and each group packed into one KPL
aggregate with ``kpl_encode``. Decoding with operators.ingest must
reproduce the events table exactly, which gives deagg_explode a strict
DuckDB oracle (the identity on events).

The packing runs distributed via applyInPandas (one shuffle on the
group key — fixture generation only; the decode path itself is
shuffle-free).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ingest import kpl_encode
from .tables import load_events

RAW_SCHEMA = "agg_id BIGINT, partition_key STRING, data BINARY"


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("event_id")
    payloads = [
        json.dumps({"event_id": int(e), "k": int(k)}).encode()
        for e, k in zip(pdf["event_id"], pdf["k"])
    ]
    agg_id = int(pdf["agg_id"].iloc[0])
    return pd.DataFrame(
        {
            "agg_id": [agg_id],
            "partition_key": [str(agg_id)],
            "data": [kpl_encode(payloads, partition_key=str(agg_id))],
        }
    )


def kpl_raw_records(spark: SparkSession, sf_dir: str, group_size: int = 4) -> DataFrame:
    """events -> KPL-aggregated wire records (agg_id, partition_key, data)."""
    events = load_events(spark, sf_dir).select(
        "event_id",
        F.from_json("props", "k BIGINT").getField("k").alias("k"),
        (F.expr(f"event_id div {group_size}")).alias("agg_id"),
    )
    return events.groupBy("agg_id").applyInPandas(_pack_group, RAW_SCHEMA)
