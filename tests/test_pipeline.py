"""End-to-end front-door tests: validate -> plan -> sink, mirroring the
reference's endpoint tests (app/server/test/index.js:39-80) through the
engine's API layer."""

from __future__ import annotations

import json

from kinesis_stream_reader_spark.plans.pipeline import records_query, sink_json


def test_records_query_happy_path(spark, sf_dir):
    validation, df = records_query(
        spark, sf_dir, {"streamname": "events", "duration": "960", "serverName": "SERVER-click"}
    )
    assert not validation.badRequest
    rows = df.count()
    assert rows > 0


def test_records_query_bad_request_stops(spark, sf_dir):
    # missing streamname -> 400-and-stop (index.js:52-55): no plan built
    validation, df = records_query(spark, sf_dir, {"duration": "10"})
    assert validation.badRequest
    assert validation.missingRequiredParams == ["streamname"]
    assert df is None


def test_records_query_invalid_param_stops(spark, sf_dir):
    validation, df = records_query(spark, sf_dir, {"streamname": "s", "nope": "1"})
    assert validation.badRequest
    assert validation.invalidParams == ["nope"]
    assert df is None


def test_no_filters_passes_everything_in_window(spark, sf_dir):
    """streamname+duration only (the UI's subset, app.js:19-27):
    window applies, no id filters."""
    v1, df1 = records_query(spark, sf_dir, {"streamname": "events", "duration": "960"})
    assert not v1.badRequest
    assert df1.count() > 0


def test_sink_json_emits_valid_json_rows(spark, sf_dir):
    _, df = records_query(
        spark, sf_dir, {"streamname": "events", "duration": "960", "serverName": "SERVER-click"}
    )
    out = sink_json(df.select("sequence_number")).collect()
    for r in out:
        assert json.loads(r.json)["sequence_number"] is not None


def test_training_batches_respects_token_budget(spark, sf_dir):
    """Each bin's token count stays under budget + one max chunk (a
    chunk is never split), bins are dense per shard, and every curated
    document lands in exactly one shard."""
    from kinesis_stream_reader_spark.plans.training import training_batches
    from kinesis_stream_reader_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = training_batches(docs, chunk_tokens=64, stride=48, bin_tokens=512).collect()
    assert rows
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r.n_tokens <= 512 + 64  # budget + one unsplittable chunk
        assert r.n_chunks >= 1
        by_shard.setdefault(r.shard, []).append(r)
    for members in by_shard.values():
        bins = sorted(r.bin_id for r in members)
        assert bins == list(range(len(bins)))  # dense bin ids from 0
