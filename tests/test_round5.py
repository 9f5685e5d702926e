"""Round-5 additions: JPEG-composed phash dedup, soft-dedup weights,
collation distinct, readability, code detection."""

import pytest

from kinesis_stream_reader_spark.operators import dedup, text


def test_readability_known_text(spark):
    docs = spark.createDataFrame(
        [(1, "The cat sat on the mat. It was happy!"), (2, "")],
        "doc_id BIGINT, text STRING",
    )
    rows = {r.doc_id: r for r in text.readability_report(docs).collect()}
    r = rows[1]
    assert (r.n_words, r.n_sentences) == (9, 2)
    # vowel groups: e,a,a,o,e,a,i,a,a,y -> count them explicitly
    assert r.n_syllables == len(
        __import__("re").findall(r"[aeiouy]+", "the cat sat on the mat. it was happy!")
    )
    exp = 206.835 - 1.015 * (9 / 2) - 84.6 * (r.n_syllables / 9)
    import math

    assert r.flesch == math.floor(exp * 1e4 + 0.5) / 1e4
    # empty doc: guards clamp to 1 word / 1 sentence, 0 syllables
    assert rows[2].flesch == math.floor((206.835 - 1.015) * 1e4 + 0.5) / 1e4


def test_code_prose_flags_code(spark):
    code = "def f(x):\n  return x + 1\nimport os\nclass A:\n  pass"
    prose = "The quick brown fox jumps over the lazy dog near the river bank."
    docs = spark.createDataFrame(
        [(1, code), (2, prose)], "doc_id BIGINT, text STRING"
    )
    rows = {r.doc_id: r for r in text.code_prose_report(docs).collect()}
    assert rows[1].is_code and rows[1].n_indented_lines == 2
    assert not rows[2].is_code and rows[2].n_code_keywords == 0


def test_dedup_downweight_unit_mass_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id BIGINT, text STRING"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "a_id BIGINT, b_id BIGINT"
    )
    rows = dedup.dedup_downweight(docs, pairs).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    assert sorted(len(v) for v in by_comp.values()) == [1, 2, 3]
    for comp, members in by_comp.items():
        assert all(m.component_size == len(members) for m in members)
        # each cluster contributes ~unit mass
        assert abs(sum(m.weight for m in members) - 1.0) < 1e-4


def test_jpeg_phash_matches_ppm_phash_on_same_pixels(spark):
    """A JPEG and a PPM holding the SAME pixel content must produce the
    same perceptual hash through the dispatching image_phash."""
    import numpy as np

    from kinesis_stream_reader_spark.operators import multimodal as mm

    qt = [8] + [16] * 63
    # grayscale 16x16 JPEG: two 8x8 blocks per row with distinct DCs
    blocks = [[[d] + [0] * 63 for d in (10, -20, 30, -40)]]
    blob = mm.encode_jpeg_blocks(16, 16, blocks, [qt], comp_quant=(0,))
    arr = mm.decode_jpeg(blob)
    ppm = mm.encode_ppm(arr)
    media = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(ppm))], "doc_id BIGINT, data BINARY"
    )
    hashes = {r.doc_id: r.phash for r in mm.image_phash(media).collect()}
    assert hashes[1] == hashes[2]
