"""Spark 4 Python DataSource: the Kinesis backfill loop as a first-class
`spark.read.format(...)` source.

`sources/kinesis.py:fetch_records` reproduces the reference's
getRecords drain (kinesisReader/index.js:11-48) as a driver-side
generator; this module lifts the same contract into the modern
user-defined data source API so it composes like any other format:

    spark.dataSource.register(KinesisBackfillDataSource)
    df = (spark.read.format("kinesis_backfill")
          .option("path", wire_dir).option("shards", "4").load())
    deagg_explode(df) ...

Scale shape: `partitions()` exposes one InputPartition per shard file,
so the read parallelizes across executors (each partition re-opens its
own file — no driver materialization, unlike the bounded
`records_dataframe` helper); the emitted schema is exactly the
connector's (`data BINARY` + shard/sequence metadata), so every
downstream pipeline (KPL deagg, JSON parse, filters) is byte-identical
across the real connector, the backfill loop, and this source.

In production the per-partition `read()` would hold a boto3 client and
page one shard via get_shard_iterator/get_records (the fetch_records
loop verbatim); in-sandbox the tests write recorded-wire shard files
and read them back through the full DataSource machinery (registration,
partition planning, Arrow-batched row emission).
"""

from __future__ import annotations

import base64
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

BACKFILL_SCHEMA = (
    "shard_id STRING, sequence_number BIGINT, data BINARY"
)


def write_shard_file(path: str, records: list[bytes]) -> None:
    """Recorded-wire shard fixture: one JSON line per record (base64
    payload), mirroring a get_records page dump."""
    with open(path, "w") as fh:
        for seq, blob in enumerate(records):
            fh.write(
                json.dumps(
                    {"seq": seq, "data": base64.b64encode(blob).decode()}
                )
                + "\n"
            )


class _ShardPartition(InputPartition):
    def __init__(self, shard_id: str, path: str) -> None:
        self.shard_id = shard_id
        self.path = path


class KinesisBackfillReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.dir = options["path"]

    def partitions(self):
        shards = sorted(
            f for f in os.listdir(self.dir) if f.startswith("shard-")
        )
        return [
            _ShardPartition(f.split("-", 1)[1].split(".")[0], os.path.join(self.dir, f))
            for f in shards
        ]

    def read(self, partition: _ShardPartition):
        # runs ON THE EXECUTOR: one shard per task, streamed line by
        # line — the production variant pages boto3 here instead
        # (sources/kinesis.py fetch_records), same yielded shape
        with open(partition.path) as fh:
            for line in fh:
                rec = json.loads(line)
                yield (
                    partition.shard_id,
                    rec["seq"],
                    base64.b64decode(rec["data"]),
                )


class KinesisBackfillDataSource(DataSource):
    """`kinesis_backfill` format: shard-partitioned recorded-wire reads
    through the Spark 4 Python DataSource API."""

    @classmethod
    def name(cls) -> str:
        return "kinesis_backfill"

    def schema(self) -> str:
        return BACKFILL_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return KinesisBackfillReader(self.options)
