"""Round-10 registry slice: reshard-aware Kinesis backfill, batched
ANN serving, the unigram-LM tokenizer leg, TIFF 16-bit grayscale, and
the consume-side streaming shard-lag census.

Follows the established conventions: every query is a (spark, sf_dir)
-> DataFrame callable with a DuckDB oracle replaying the same exact
integer semantics, column names aliased identically on both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..scratch import scratch
from ._shared import load_table, register


# ---------------------------------------------------------------------------
# ROUND 10 — source_python_reshard: lineage-aware Kinesis backfill.
# Real streams split and merge shards (the reference reads exactly
# shard '0' forever, kinesisReader/index.js:77); per-key order is only
# preserved if parents drain to SHARD_END before their children (the
# KCL lease rule). The fixture replays one split (s0 -> s2+s3) and one
# merge (s1a+s1b -> s4) over the events table, timeline-partitioned
# into three epochs by global (ts, event_id) rank; the reader plans
# one InputPartition per lineage CHAIN and emits (chain_id,
# generation, emit_idx) so the per-key order guarantee is VERIFIED
# declaratively from the reader's actual emission order, not assumed.
#
# 100 TB shape: chain count ~ current shard count = read parallelism
# (same as any Kinesis consumer); a chain's data is bounded by one
# hash-range family's retention window. The global row_number in the
# FIXTURE BUILDER is a one-time test-harness construction (recorded
# wire is given in production), not a data-path shuffle.
# ---------------------------------------------------------------------------
_RESHARD_ROUTING_SQL = """
  SELECT event_id, key, seq,
         CASE
           WHEN key < 50 AND epoch = 0 THEN 's0'
           WHEN key < 25 THEN 's2'
           WHEN key < 50 THEN 's3'
           WHEN epoch < 2 AND key < 75 THEN 's1a'
           WHEN epoch < 2 THEN 's1b'
           ELSE 's4' END AS shard_id
  FROM (
    SELECT event_id, key, seq, CAST(((seq - 1) * 3) {div} n AS INT) AS epoch
    FROM (
      SELECT event_id, user_id % 100 AS key,
             row_number() OVER (ORDER BY ts, event_id) AS seq,
             COUNT(*) OVER () AS n
      FROM {tbl}) ranked) routed
"""

_RESHARD_LINEAGE = [
    {"shard_id": "s0", "closed": True},
    {"shard_id": "s2", "parent": "s0"},
    {"shard_id": "s3", "parent": "s0"},
    {"shard_id": "s1a", "closed": True},
    {"shard_id": "s1b", "closed": True},
    {"shard_id": "s4", "parent": "s1a", "adjacent_parent": "s1b"},
]


def _reshard_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf, fingerprint-keyed) the recorded split/merge
    wire: six shard files + the _SHARDS.json lineage manifest."""
    from ..sources.python_source import (
        write_reshard_manifest,
        write_reshard_shard_file,
    )
    from ..sources.raw import source_fingerprint

    d = scratch(
        f"ksr_reshard/{sf_dir.strip('/').replace('/', '_')}"
        f"_{source_fingerprint(sf_dir)}"
    )
    if os.path.isfile(os.path.join(d, "_SHARDS.json")):
        return d
    os.makedirs(d, exist_ok=True)
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("ksr_reshard_events")
    routed = spark.sql(
        _RESHARD_ROUTING_SQL.format(div="DIV", tbl="ksr_reshard_events")
    )

    def dump(pdf):
        import pandas as pd

        shard = str(pdf["shard_id"].iloc[0])
        write_reshard_shard_file(
            d,
            shard,
            [
                (int(s), int(k), str(int(e)).encode())
                for s, k, e in zip(pdf["seq"], pdf["key"], pdf["event_id"])
            ],
        )
        return pd.DataFrame({"shard_id": [shard], "n": [len(pdf)]})

    # executor-side per-shard file write (local-mode shared scratch; a
    # cluster would target shared storage), same pattern as ksr_pyds
    routed.groupBy("shard_id").applyInPandas(
        dump, "shard_id string, n long"
    ).count()
    spark.catalog.dropTempView("ksr_reshard_events")
    write_reshard_manifest(d, _RESHARD_LINEAGE)
    return d


@register(
    "source_python_reshard",
    f"""
WITH shards AS (
{_RESHARD_ROUTING_SQL.format(div="//", tbl="events")}
), lineage AS (
  SELECT *,
         CASE WHEN shard_id IN ('s0', 's1a', 's1b') THEN 0 ELSE 1 END
           AS generation,
         CASE WHEN key < 50 THEN 's0' ELSE 's1a' END AS chain_id
  FROM shards
), emits AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY chain_id ORDER BY generation, shard_id, seq
         ) AS emit_idx
  FROM lineage
), flags AS (
  SELECT key, chain_id, shard_id, seq, event_id,
         lag(seq) OVER (PARTITION BY key ORDER BY emit_idx) AS prev_seq
  FROM emits
)
SELECT key AS partition_key,
       MIN(chain_id) AS chain_id,
       COUNT(*)::BIGINT AS n_records,
       COUNT(DISTINCT shard_id)::INT AS n_shards,
       SUM(event_id)::BIGINT AS sum_event_id,
       bool_and(prev_seq IS NULL OR seq > prev_seq) AS order_ok
FROM flags GROUP BY key ORDER BY partition_key
""",
)
def source_python_reshard_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reshard-aware backfill through the kinesis_reshard Python
    DataSource: drain a recorded split (s0 -> s2+s3) and merge
    (s1a+s1b -> s4), then PROVE per-key ordering survived the reshard
    — for every partition key, sequence numbers must be strictly
    increasing along the reader's actual emission order (emit_idx),
    which holds iff each parent hit SHARD_END before its children
    started. The oracle replays routing, lineage generations, and the
    topological drain order in SQL.

    Plan shape: the DataSource read is one task per lineage chain
    (independent chains in parallel); the only shuffles are the lag
    window on (key) and the final groupBy(key) — both keyed on
    partition_key, partial-agg'd, linear in record count."""
    from ..sources.python_source import KinesisReshardDataSource

    spark.dataSource.register(KinesisReshardDataSource)
    d = _reshard_fixture_dir(spark, sf_dir)
    df = spark.read.format("kinesis_reshard").option("path", d).load()
    w = Window.partitionBy("partition_key").orderBy("emit_idx")
    flags = df.select(
        "partition_key",
        "chain_id",
        "shard_id",
        "sequence_number",
        "emit_idx",
        F.col("data").cast("string").cast("long").alias("event_id"),
    ).withColumn("prev_seq", F.lag("sequence_number").over(w))
    return (
        flags.groupBy("partition_key")
        .agg(
            F.min("chain_id").alias("chain_id"),
            F.count("*").cast("long").alias("n_records"),
            F.countDistinct("shard_id").cast("int").alias("n_shards"),
            F.sum("event_id").cast("long").alias("sum_event_id"),
            F.bool_and(
                F.col("prev_seq").isNull()
                | (F.col("sequence_number") > F.col("prev_seq"))
            ).alias("order_ok"),
        )
        .orderBy("partition_key")
    )
