"""Structured Streaming variants of the engine's pipeline.

The reference's ingestion mode is pull-to-batch: every request re-reads
the stream from AT_TIMESTAMP and drains until caught up
(kinesisReader/index.js:24-45). In Structured Streaming that is exactly
``Trigger.AvailableNow`` — process everything available, then stop — so
batch and streaming share the same transform functions and differ only
in the trigger.

For tests/fixtures the source is a file stream over the driver's
parquet; the production source is the Kinesis connector
(sources/kinesis.py). Transforms reused verbatim from operators/ —
Structured Streaming's unified API means to_nested / filter_records /
deagg_explode apply unchanged to a streaming DataFrame.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.events import to_nested
from ..operators.filters import filter_records
from ..session import ensure_confs


_STREAM_DIRS: dict[str, str] = {}


def _table_stream_dir(sf_dir: str, table: str) -> str:
    """The file source wants a directory of data files; expose a table's
    parquet through a symlinked temp dir (no copy). Handles both a
    single-file fixture and a Spark-written directory of part files —
    the source does NOT recurse into subdirectories, so leaf files are
    linked directly."""
    key = f"{sf_dir}::{table}"
    if key not in _STREAM_DIRS:
        d = tempfile.mkdtemp(prefix="ksr_stream_")
        src = f"{sf_dir}/{table}.parquet"
        if os.path.isdir(src):
            for i, name in enumerate(sorted(os.listdir(src))):
                if name.endswith(".parquet"):
                    os.symlink(f"{src}/{name}", f"{d}/part-{i:05d}.parquet")
        else:
            os.symlink(src, f"{d}/{table}.parquet")
        _STREAM_DIRS[key] = d
    return _STREAM_DIRS[key]


def _events_stream_dir(sf_dir: str) -> str:
    return _table_stream_dir(sf_dir, "events")


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over the documents fixture — the corpus-
    as-a-stream seam for streaming dedup/quality operators (a crawl
    pipeline's ingest is exactly this: documents arriving in batches)."""
    ensure_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_table_stream_dir(sf_dir, "documents"))
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over the events fixture (swap-the-source seam:
    the production deployment replaces this with the Kinesis reader,
    sources/kinesis.py — same downstream plan)."""
    ensure_confs(spark)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_events_stream_dir(sf_dir))
    )
    from ..sources.tables import normalize_timestamps

    return normalize_timestamps(df)


def records_stream(events: DataFrame, query: Mapping[str, object]) -> DataFrame:
    """The reference pipeline as a streaming plan: nested projection +
    conjunctive filters. (The AT_TIMESTAMP lower bound belongs to the
    source options in streaming mode — kinesisReader/index.js:77-81.)"""
    return filter_records(to_nested(events), query)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked windowed counts — tumbling by default, SLIDING when
    `slide` < `window` (each event then belongs to window/slide
    overlapping windows; state grows by the same factor, still
    watermark-bounded). The first event-time operator beyond the
    reference (which treats time as arrival-only, SURVEY.md §2.10):
    windows older than max(event_time) - watermark are finalized and
    evicted."""
    w = F.window(F.col("ts"), window, slide) if slide else F.window(F.col("ts"), window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def attribution_join_semi(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """LEFT SEMI stream-stream join: emit each click AT MOST ONCE as
    soon as any qualifying purchase arrives — the 'did this click
    convert?' gate without purchase payload fan-out (a click matching
    5 purchases emits one row, not five). Completes the stream-stream
    join matrix alongside inner/left-outer/full-outer: same
    watermark-bounded state on both sides, but the semi form keeps no
    emitted-row payload from the right stream."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {window}")),
        "left_semi",
    ).select("click_id", F.col("c_user").alias("user_id"))


def windowed_distinct_users(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """EXACT distinct users per (day, event_type) on a stream: dedup
    first (dropDuplicates on the grain keys + the event-time column
    keeps state watermark-bounded), then an ordinary windowed count —
    the standard streaming-exact-distinct decomposition, since
    count_distinct isn't directly available in streaming aggregations.
    State is one row per (user, type, day), evicted by the watermark."""
    day = F.date_trunc("day", F.col("ts")).alias("day_ts")
    deduped = (
        events.withWatermark("ts", watermark)
        .select("user_id", "event_type", "ts", day)
        .dropDuplicates(["user_id", "event_type", "day_ts"])
    )
    return (
        deduped.groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_users"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_users",
        )
    )


def asof_enrich_stream(
    events: DataFrame, orders, out_dir: str, checkpoint: str
) -> None:
    """Streaming point-in-time enrichment via foreachBatch: each
    micro-batch runs the BATCH as-of join (join_asof_latest_order)
    against the static orders table and appends.

    Why this is correct under any batch slicing: the as-of match of an
    event depends only on that event's row and the STATIC dimension, so
    per-batch results equal the global batch join — the invariant that
    makes foreachBatch the standard escape hatch for join shapes
    Structured Streaming lacks natively (as-of/range against a
    snapshot). State cost: none — the static side is re-broadcast per
    batch, no streaming state store at all."""
    from ..operators.relational import join_asof_latest_order

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        join_asof_latest_order(batch_df, orders).write.mode("append").parquet(out_dir)

    (
        events.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def sessionize_native(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """The DEFAULT streaming sessionization: JVM-native session_window
    aggregation — gap-based session windows per user, closed and
    emitted (append mode) once the watermark passes the session end.

    Versus the applyInPandasWithState shape (stateful.sessionize, kept
    as the arbitrary-state API demo): state merging happens in the
    JVM's session-window state store with partial aggregation and no
    Arrow round-trips, so per-batch cost scales with distinct active
    users, not with Python invocation overhead. session_window's `end`
    is last_event + gap, matching the batch twin
    (relational.window_session_builtin)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.col("session_window.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id with watermark-bounded state
    (dropDuplicatesWithinWatermark): the streaming twin of
    operators.dedup.dedup_exact for an at-least-once source."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def attribution_join(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: attribute each
    purchase to every click by the same user in the preceding hour.

    The time-range join condition lets Spark bound BOTH state stores via
    the watermarks (clicks older than the window + watermark are
    evicted) — the canonical watermarked stream-stream join. Batch
    semantics are identical (the oracle is a plain self-join), which is
    exactly the unification guarantee being tested."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {window}")),
    ).select("click_id", "purchase_id", F.col("c_user").alias("user_id"))


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    state_partitions: int | None = None,
    mode: str | None = None,
) -> DataFrame:
    """Execute a streaming plan with Trigger.AvailableNow and return the
    materialized result — the drain-until-caught-up semantics of the
    reference's fetch loop (kinesisReader/index.js:39-44) as a one-liner.

    Sink choice is a scale decision: append-mode streams (filters,
    dedup, joins, custom stateful) land in a distributed parquet sink
    and are read back, so results never funnel through the driver —
    measured 2-10x on multi-million-row streams vs the memory sink, and
    it is the shape a production job uses. Aggregations run in complete
    mode, which only the (driver-side, test-only) memory sink supports;
    their results are small by construction.

    Stateful operators (joins, dedup, windowed aggs) create one state
    store per shuffle partition per stateful operator, and every
    micro-batch pays a per-store checkpoint commit. State partitions
    should therefore be sized to stream VOLUME, not cluster width —
    at local bench volume 8 stores beat 32 by ~35% on the
    stream-stream join (the join compute is trivial; the commits are
    not). Tunable via SPARK_GRAFT_STREAM_PARTITIONS; a production
    deployment sizes it to per-trigger row volume / target state-store
    size and it can exceed cluster width for big state.

    The exception is Python-side stateful ops (applyInPandasWithState):
    their per-partition cost is Arrow + pandas compute, not the state
    commit, so they want cluster-width parallelism — callers pass an
    explicit `state_partitions` to override the volume-sized default."""
    spark = stream_df.sparkSession
    stream_parts = (
        str(state_partitions)
        if state_partitions is not None
        else os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8")
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # autodetect: aggregations run complete-mode on the memory sink.
    # `mode="append"` overrides for watermark-evicted aggregations
    # (session/tumbling windows) where append is the production shape
    # and only CLOSED windows should emit.
    if mode is None:
        complete = stream_df.isStreaming and _has_aggregation(stream_df)
    else:
        complete = mode == "complete"
    spark.conf.set("spark.sql.shuffle.partitions", stream_parts)
    try:
        if complete:
            with tempfile.TemporaryDirectory() as checkpoint:
                q = (
                    stream_df.writeStream.format("memory")
                    .queryName(query_name)
                    .outputMode("complete")
                    .option("checkpointLocation", checkpoint)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
            return spark.table(query_name)
        out_dir = tempfile.mkdtemp(prefix=f"ksr_out_{query_name}_")
        with tempfile.TemporaryDirectory() as checkpoint:
            q = (
                stream_df.writeStream.format("parquet")
                .outputMode("append")
                .option("path", out_dir)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        # explicit schema: an empty result writes no part files, and the
        # stream's schema is authoritative either way
        return spark.read.schema(stream_df.schema).parquet(out_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _has_aggregation(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan


def static_enrich(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static join: enrich each streamed event with the (static)
    customer dimension. The static side is broadcast per micro-batch —
    no state store, no watermark needed (unlike stream-stream joins),
    and the stream side never shuffles: the canonical pattern for
    dimension lookups in a 100 TB streaming pipeline."""
    dim = customer.select("c_custkey", "c_mktsegment")
    return events.join(
        F.broadcast(dim), events.user_id == dim.c_custkey
    ).select("event_id", "user_id", "c_mktsegment")


def ingest_pipeline(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Flagship streaming composition: at-least-once source ->
    watermark-bounded exact dedup -> stream-static dimension
    enrichment. This is the full shape of a production ingest job
    (the reference's scan->parse->filter pipeline upgraded with the
    delivery-dedup and enrichment it lacks); every stage is one of the
    already-tested operators, and the composition itself is
    oracle-checked against the batch semantics."""
    deduped = dedup_stream(events)
    return static_enrich(deduped, customer)


def upsert_compact_available_now(events_stream: DataFrame) -> DataFrame:
    """foreachBatch upsert sink: drain the stream with AvailableNow,
    maintaining a compacted latest-state-per-(user, type) snapshot that
    each micro-batch MERGEs into — the standard production pattern for
    serving CDC state from a stream when the sink has no native MERGE.

    Semantics: after the drain, the snapshot equals the batch
    compact_latest_state over all events (argmax by (ts, event_id) —
    exact, order-independent), which is what the oracle checks.

    Scale shape: each batch compacts ITSELF first (partial-agg shuffle
    on the key), then merges against the snapshot with the same argmax
    — so the per-batch cost is O(batch + |keys|), never O(history).
    The swap is atomic-by-rename per batch and keyed state never
    leaves the executors; on Delta/Iceberg the read-union-rewrite
    becomes a real MERGE INTO, same plan per batch. foreachBatch
    re-delivery (at-least-once) is idempotent here because the merge
    is an argmax, not an increment."""
    spark = events_stream.sparkSession
    snap_dir = tempfile.mkdtemp(prefix="ksr_upsert_snap_")
    live = os.path.join(snap_dir, "live")
    schema = (
        "user_id BIGINT, event_type STRING, latest_event_id BIGINT, "
        "latest_value DOUBLE, latest_ts TIMESTAMP"
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_compact = (
            batch_df.groupBy("user_id", "event_type")
            .agg(F.max(F.struct("ts", "event_id", "value")).alias("s"))
            .select(
                "user_id",
                "event_type",
                F.col("s.event_id").alias("latest_event_id"),
                F.col("s.value").alias("latest_value"),
                F.col("s.ts").alias("latest_ts"),
            )
        )
        if os.path.exists(live):
            prev = spark.read.schema(schema).parquet(live)
            merged = (
                prev.unionByName(batch_compact)
                .groupBy("user_id", "event_type")
                .agg(
                    F.max(
                        F.struct(
                            F.col("latest_ts"),
                            F.col("latest_event_id"),
                            F.col("latest_value"),
                        )
                    ).alias("s")
                )
                .select(
                    "user_id",
                    "event_type",
                    F.col("s.latest_event_id").alias("latest_event_id"),
                    F.col("s.latest_value").alias("latest_value"),
                    F.col("s.latest_ts").alias("latest_ts"),
                )
            )
        else:
            merged = batch_compact
        staged = os.path.join(snap_dir, f"stage_{batch_id}")
        merged.write.mode("overwrite").parquet(staged)
        old = os.path.join(snap_dir, f"old_{batch_id}")
        if os.path.exists(live):
            os.rename(live, old)
        os.rename(staged, live)

    with tempfile.TemporaryDirectory() as checkpoint:
        q = (
            events_stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.schema(schema).parquet(live).drop("latest_ts")


def attribution_join_outer(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join: every click emits —
    matched rows as they arrive, unmatched clicks with NULL purchase
    once the watermark proves no qualifying purchase can still come
    (wm > click_ts + window). The null-emission-on-expiry behavior is
    the part inner joins never exercise, and it's exactly what
    conversion-rate jobs need (unmatched clicks ARE the signal).

    State bounds are identical to the inner form; the only addition is
    the expiry scan that releases unmatched click state as the
    watermark advances."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {window}")),
        "left_outer",
    ).select("click_id", "purchase_id", F.col("c_user").alias("user_id"))


def attribution_join_full(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """FULL OUTER watermarked stream-stream join — completes the join
    matrix (inner / left / full): unmatched clicks emit with NULL
    purchase once the watermark proves no qualifying purchase can
    arrive, and unmatched purchases emit with NULL click once the
    watermark passes the purchase time (the youngest click that could
    match is strictly older than the purchase). Both state stores stay
    watermark-bounded exactly as in the inner form."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {window}")),
        "full_outer",
    ).select(
        "click_id", "purchase_id", F.coalesce("c_user", "p_user").alias("user_id")
    )


def attribution_join_right(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """RIGHT OUTER watermarked stream-stream join — the mirror of the
    left-outer form, completing the join-type matrix (inner,
    left-outer, full-outer, semi, right-outer): every purchase emits,
    matched rows on arrival, organic purchases (no qualifying click)
    null-padded once the watermark passes the purchase time — the
    youngest possibly-attributing click would already be in state.

    Organic-conversion measurement is the use case the left form
    can't express without swapping stream roles; state bounds are
    symmetric to attribution_join_outer."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {window}")),
        "right_outer",
    ).select(
        "click_id", "purchase_id", F.coalesce("c_user", "p_user").alias("user_id")
    )


def state_store_snapshot(events: DataFrame) -> DataFrame:
    """Run a per-type count+cents streaming aggregation to caught-up,
    then read the aggregation's OWN STATE STORE back as a DataFrame via
    Spark 4's `statestore` reader — the state-introspection surface a
    production operator uses to debug skew, audit state size, or
    migrate state between jobs WITHOUT replaying the stream.

    The result rows come from the checkpoint's state files, not the
    sink: (event_type, n_events, total_cents) per group key. Equality
    with the batch aggregate is therefore a round-trip proof that the
    persisted state is exactly the aggregation's logical content.

    Plan shape / 100 TB: the state source exposes one input split per
    state-store partition (partition_id column), so the read is as
    parallel as the original shuffle and never replays source data;
    state for a keyed aggregation is one row per key per partition —
    bounded by |keys|, independent of stream length."""
    spark = events.sparkSession
    agg = (
        events.select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("total_cents"))
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    checkpoint = tempfile.mkdtemp(prefix="ksr_state_inspect_")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName("ksr_state_inspect_sink")
            .outputMode("complete")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    state = spark.read.format("statestore").load(checkpoint)
    # the state schema names the UNRESOLVED agg buffer fields (count,
    # sum), not the sink aliases — the buffer is the physical contract
    return state.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").cast("long").alias("n_events"),
        F.col("value.sum").cast("long").alias("total_cents"),
    ).orderBy("event_type")
