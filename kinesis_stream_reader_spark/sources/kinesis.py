"""Production streaming source: AWS Kinesis.

The reference reads one shard of one stream from AT_TIMESTAMP and drains
to caught-up (kinesisReader/index.js:11-48, 75-95). The Spark-native
equivalent is the Kinesis Structured Streaming connector — e.g. the
spark-sql-kinesis connector ("kinesis" format) — where:

- the AT_TIMESTAMP shard iterator becomes ``startingPosition``;
- the per-call Limit 100 / NextShardIterator loop becomes connector
  micro-batch tuning (maxFetchRecordsPerShard et al.);
- the drain-until-MillisBehindLatest==0 loop becomes
  ``Trigger.AvailableNow``;
- the single-shard '0' restriction simply disappears: the connector
  reads all shards in parallel, one task per shard.

The connector jar is not bundled in this environment, so this module is
import-gated: ``kinesis_stream`` raises a clear error if the format is
unavailable, and tests exercise the identical downstream plan through
the file-stream seam (streaming/jobs.py) — the same swap-the-source
pattern as the reference's own tests (app/server/test/index.js:12-18).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession

KINESIS_FORMAT = "kinesis"

# kinesisReader/index.js constants: single shard '0', AT_TIMESTAMP
# iterator, 100-record fetch pages (index.js:20-23, 75-82)
REFERENCE_SHARD_ID = "0"
FETCH_LIMIT = 100


class KinesisClient(Protocol):
    """The two AWS Kinesis API calls the reference uses, in boto3's
    shapes — satisfied by a real boto3 client, moto, or a recorded-wire
    fake (tests/test_kinesis_source.py)."""

    def get_shard_iterator(
        self, *, StreamName: str, ShardId: str, ShardIteratorType: str, Timestamp: object
    ) -> dict: ...

    def get_records(self, *, ShardIterator: str, Limit: int) -> dict: ...


class InvalidStreamNameError(ValueError):
    """getShardIterator failure (kinesisReader/index.js:84-95 rejects
    with InvalidStreamNameException, surfaced as the API's 404)."""


def fetch_records(
    client: KinesisClient,
    stream_name: str,
    timestamp: datetime,
    limit: int = FETCH_LIMIT,
) -> Iterator[bytes]:
    """The reference's getRecords drain loop (kinesisReader/index.js:
    11-48), verbatim semantics over any boto3-shaped client:

    1. one AT_TIMESTAMP shard iterator on shard '0' (:75-82);
    2. page with Limit=100, following NextShardIterator (:20-23, 40);
    3. stop only when a page is BOTH caught up (MillisBehindLatest == 0)
       AND empty (:39) — the reference keeps paging on either signal.

    Yields raw record payload bytes; feed them through
    operators.ingest.deagg_explode (+ json_parse) for the KPL explode
    and INVALID-JSON fallback, exactly like the reference's
    per-record deaggregate(). This is the bounded-backfill twin of the
    structured-streaming path below — the connector covers continuous
    ingestion; this loop reproduces the reference's request/response
    contract for parity tests and one-shot reads."""
    try:
        it = client.get_shard_iterator(
            StreamName=stream_name,
            ShardId=REFERENCE_SHARD_ID,
            ShardIteratorType="AT_TIMESTAMP",
            Timestamp=timestamp,
        )["ShardIterator"]
    except Exception as exc:
        raise InvalidStreamNameError(stream_name) from exc
    while True:
        page = client.get_records(ShardIterator=it, Limit=limit)
        for record in page.get("Records", []):
            yield record["Data"]
        if page.get("MillisBehindLatest") == 0 and not page.get("Records"):
            return
        it = page["NextShardIterator"]


def records_dataframe(
    spark: SparkSession,
    client: KinesisClient,
    stream_name: str,
    timestamp: datetime,
) -> DataFrame:
    """fetch_records -> one-column binary DataFrame (`data`), the same
    shape the structured-streaming connector emits — so the KPL deagg /
    JSON parse / filter pipeline is byte-identical across the backfill
    loop and the streaming source."""
    rows = [(blob,) for blob in fetch_records(client, stream_name, timestamp)]
    return spark.createDataFrame(rows, "data BINARY")


def kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str,
    start_timestamp: datetime | None = None,
) -> DataFrame:
    """readStream from Kinesis starting at a timestamp.

    Returns the connector's standard schema: data BINARY, streamName,
    partitionKey, sequenceNumber, approximateArrivalTimestamp. Feed the
    binary `data` through operators.ingest.deagg_explode + json_parse —
    the exact pipeline the reference runs per record.
    """
    reader = (
        spark.readStream.format(KINESIS_FORMAT)
        .option("streamName", stream_name)
        .option("region", region)
    )
    if start_timestamp is not None:
        # AT_TIMESTAMP semantics (kinesisReader/index.js:77-81)
        reader = reader.option("startingPosition", start_timestamp.isoformat())
    else:
        reader = reader.option("startingPosition", "TRIM_HORIZON")
    try:
        return reader.load()
    except Exception as exc:  # connector jar absent in this environment
        raise RuntimeError(
            "Kinesis connector not available; use streaming.jobs.stream_events "
            "as the test seam or add a spark-sql-kinesis package to the cluster"
        ) from exc
