"""Property-based tests (hypothesis): KPL codec round-trip over
arbitrary payload sets, parseInt equivalence with JS semantics."""

from __future__ import annotations

import base64

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_stream_reader_spark.operators.filters import parse_int_param
from kinesis_stream_reader_spark.operators.ingest import kpl_decode, kpl_encode


@given(st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=30))
@settings(max_examples=200, deadline=None)
def test_kpl_roundtrip_property(payloads):
    decoded = kpl_decode(kpl_encode(payloads))
    assert [base64.b64decode(d) for d in decoded] == payloads


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_non_kpl_bytes_pass_through(blob):
    from kinesis_stream_reader_spark.schema import KPL_MAGIC

    if blob[:4] == KPL_MAGIC:
        return  # adversarial magic prefix: covered by corrupt-drop test
    assert kpl_decode(blob) == [base64.b64encode(blob).decode()]


@given(st.binary(min_size=0, max_size=128))
@settings(max_examples=200, deadline=None)
def test_corrupt_aggregates_never_raise(tail):
    """Anything after the magic either decodes or silently drops —
    never raises (kinesisReader/index.js:163-164)."""
    from kinesis_stream_reader_spark.schema import KPL_MAGIC

    result = kpl_decode(KPL_MAGIC + tail)
    assert isinstance(result, list)


@given(st.text(max_size=20))
@settings(max_examples=500, deadline=None)
def test_parse_int_param_matches_js_parseint(s):
    """Model of JS parseInt(s, 10): optional sign, leading digits."""
    t = s.strip()
    sign = 1
    if t[:1] == "+" or t[:1] == "-":
        sign = -1 if t[0] == "-" else 1
        t = t[1:]
    alphabet, base = "0123456789", 10
    if t[:2] in ("0x", "0X"):  # radix-less parseInt hex detection
        t, alphabet, base = t[2:], "0123456789abcdefABCDEF", 16
    digits = ""
    for ch in t:
        if ch in alphabet:
            digits += ch
        else:
            break
    expected = sign * int(digits, base) if digits else None
    assert parse_int_param(s) == expected


@given(st.integers(min_value=-(2**62), max_value=2**62))
@settings(max_examples=200, deadline=None)
def test_parse_int_param_roundtrips_integers(n):
    assert parse_int_param(str(n)) == n


def test_pack_sequences_partitions_docs_and_tokens(spark, sf_dir):
    from pyspark.sql import functions as F

    from kinesis_stream_reader_spark.operators.text import pack_sequences, tokens
    from kinesis_stream_reader_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = pack_sequences(docs, 512).collect()
    totals = {
        r.source: (r.n_docs, r.n_toks)
        for r in docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(tokens(F.col("text")))).alias("n_toks"),
        )
        .collect()
    }
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    assert set(by_source) == set(totals)
    for src, rows in by_source.items():
        assert sum(r.n_docs for r in rows) == totals[src][0]
        assert sum(r.n_tokens for r in rows) == totals[src][1]
        bins = sorted(r.bin_id for r in rows)
        # bins are dense: every boundary crossing starts the next bin
        assert bins[0] == 0
        assert all(b2 - b1 >= 1 for b1, b2 in zip(bins, bins[1:]))
