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

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

KINESIS_FORMAT = "kinesis"


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
