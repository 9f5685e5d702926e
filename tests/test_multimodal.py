"""Multimodal plumbing tests: schema, batch shape, deterministic fake
features, stubbed codecs."""

from __future__ import annotations

import pytest

from kinesis_stream_reader_spark.operators import multimodal
from kinesis_stream_reader_spark.sources.tables import load_table


def test_media_schema(spark, sf_dir):
    media = multimodal.documents_as_media(load_table(spark, sf_dir, "documents"))
    assert media.schema.simpleString() == (
        "struct<doc_id:bigint,data:binary,"
        "media_meta:struct<kind:string,n_bytes:bigint,origin:string>>"
    )


def test_extract_features_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(docs)
    feats = {r.doc_id: r for r in multimodal.extract_features(media).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert set(feats) == set(texts)
    for doc_id, text in list(texts.items())[:20]:
        raw = text.encode()
        f = feats[doc_id]
        assert f.kind == "image"
        assert f.n_bytes == len(raw)
        assert abs(f.byte_mean - sum(raw) / len(raw)) < 1e-9
        assert f.byte_entropy_proxy == len(set(raw))


def test_codec_stubs_raise():
    for fn in (multimodal.decode_image, multimodal.resample_audio, multimodal.sample_frames):
        with pytest.raises(NotImplementedError):
            fn(b"\x00\x01")
