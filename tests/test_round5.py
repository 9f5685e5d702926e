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


def test_bradley_terry_two_player_closed_form(spark):
    """With two players and A beating B 3:1, BT converges to the
    closed form s_A/s_B = 3 (mean-1 rescale => 1.5 / 0.5)."""
    rows = []
    eid = 0
    for u in range(4):
        # one match per user: consecutive events (A then B); A wins in
        # users 0-2 (higher value), B wins in user 3
        a_val, b_val = (2.0, 1.0) if u < 3 else (1.0, 2.0)
        rows.append((eid, u, "2024-01-01 00:00:00", "A", a_val)); eid += 1
        rows.append((eid, u, "2024-01-01 01:00:00", "B", b_val)); eid += 1
    events = spark.createDataFrame(
        [(e, u, __import__("datetime").datetime.fromisoformat(ts), t, v)
         for e, u, ts, t, v in rows],
        "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE",
    )
    from kinesis_stream_reader_spark.operators import relational

    out = {r.event_type: r for r in relational.bradley_terry_strengths(events).collect()}
    assert out["A"].n_wins == 3 and out["B"].n_wins == 1
    assert out["A"].n_matches == 4 and out["B"].n_matches == 4
    assert abs(out["A"].bt_score - 1.5) < 1e-3
    assert abs(out["B"].bt_score - 0.5) < 1e-3
    assert out["A"].rank == 1 and out["B"].rank == 2


def test_kcore_triangle_plus_tail(spark):
    """A triangle (2-core for k=2) with a pendant tail: the tail peels,
    the triangle survives with degree 2 everywhere."""
    import datetime as dt

    from kinesis_stream_reader_spark.operators import relational

    # craft events whose (user_id%100, 100+event_id%100) projection is
    # a triangle {0,1,2}x{100} union ... simpler: drive via direct ids
    rows = [
        # triangle 0-100, 0-101, 1-100, 1-101, 2-100, 2-101: bipartite
        # K_{3,2}: every node has deg >= 2 -> whole graph is the 2-core
        (0, 0), (1, 0), (0, 1), (1, 1), (0, 2), (1, 2),
        # pendant: node 3 connected only to 102 (deg 1 both) -> peeled
        (2, 3),
    ]
    events = spark.createDataFrame(
        [(eid, dt.datetime(2024, 1, 1), uid, "click", 1.0, "{}")
         for eid, uid in rows],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    )
    out = {r.node: r.core_degree for r in
           relational.kcore_decomposition(events, k=2).collect()}
    assert out == {0: 2, 1: 2, 2: 2, 100: 3, 101: 3}


# --- round-5 late additions: causal matching, SPRT, JL projection,
# feature hashing, sorted-neighborhood ER ---------------------------------


def test_cem_att_common_support(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["cem_att_estimate"](spark, sf_dir).collect()[0]
    assert row.n_cells_matched >= 1
    assert row.n_treated_matched >= row.n_cells_matched
    assert -1.0 <= row.att_cem <= 1.0


def test_sprt_decision_is_beyond_boundary(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["sprt_sequential_test"](spark, sf_dir).collect()[0]
    assert row.decision in {"accept_h0", "accept_h1", "continue"}
    bound = 2944438979 / 1e9
    if row.decision == "accept_h1":
        assert row.llr >= bound - 1e-6
    elif row.decision == "accept_h0":
        assert row.llr <= -bound + 1e-6
    else:
        assert abs(row.llr) < bound
    assert row.n_trials >= 1


def test_jl_projection_norm_preservation(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    rows = registry.QUERIES["embedding_random_projection"](spark, sf_dir).collect()
    assert len(rows) > 0
    import statistics

    ds = [r.distortion for r in rows]
    # JL with m=16: individual distortions vary, but the mean should be
    # near 1 and every distortion strictly positive
    assert 0.5 < statistics.mean(ds) < 1.5
    assert all(r.distortion > 0 and r.orig_norm > 0 for r in rows)


def test_feature_hashing_bounds(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    rows = registry.QUERIES["feature_hashing_vectors"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r.nnz <= 64
        assert r.l2sq >= r.nnz  # every nonzero bucket contributes >= 1
        assert 0 <= r.top_bucket < 64


def test_sorted_neighborhood_pairs_share_token(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    rows = registry.QUERIES["er_sorted_neighborhood"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.a_key != r.b_key
        assert 0.0 < r.sim <= 1.0


def test_psm_matched_bounds(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["psm_att_matched"](spark, sf_dir).collect()[0]
    assert 0 <= row.n_matched <= row.n_treated
    assert -1.0 <= row.att_psm <= 1.0
    # as-of backward matching: matched control score <= treated score
    assert row.mean_score_gap >= 0


def test_cluster_purity_nmi_ranges(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["cluster_purity_report"](spark, sf_dir).collect()[0]
    assert 1 <= row.n_clusters <= 8
    assert row.n_labels >= 1
    # purity >= 1/n_labels (the random floor), both measures in [0, 1]
    assert 1.0 / row.n_labels <= row.purity <= 1.0
    assert 0.0 <= row.nmi <= 1.0 + 1e-9


def test_modularity_range_and_edge_count(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["graph_modularity_report"](spark, sf_dir).collect()[0]
    # Newman Q is bounded by (-1/2, 1)
    assert -0.5 <= row.modularity < 1.0
    assert row.n_edges > 0 and row.n_communities >= 1


def test_wer_identical_and_known_edits(spark):
    from kinesis_stream_reader_spark.operators import text

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),                          # blocked ref (min doc_id)
            (2, base),                          # identical twin -> dist 0
            (3, base + " lambda"),              # one insertion -> dist 1
            (4, base.replace("iota", "mu")),    # one substitution -> dist 1
        ],
        "doc_id BIGINT, text STRING",
    )
    rows = {r.doc_id: r for r in text.wer_pairs_report(docs).collect()}
    assert set(rows) == {2, 3, 4}
    assert rows[2].dist == 0 and rows[2].wer == 0.0
    assert rows[3].dist == 1 and rows[3].n_ref == 10
    assert rows[4].dist == 1
    assert all(r.ref_id == 1 for r in rows.values())


def test_kfold_exact_balance(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    rows = registry.QUERIES["stratified_kfold_assign"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.balanced for r in rows)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.n_docs)
    for counts in by_lang.values():
        assert max(counts) - min(counts) <= 1


def test_rouge_l_known_values(spark):
    from kinesis_stream_reader_spark.operators import text

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                        # identical -> LCS = 10, F1 = 1
            (3, base + " lambda mu"),         # superset -> LCS = 10, P < 1
        ],
        "doc_id BIGINT, text STRING",
    )
    rows = {r.doc_id: r for r in text.rouge_l_pairs_report(docs).collect()}
    assert rows[2].lcs == 10 and rows[2].rouge_l_f1 == 1.0
    assert rows[3].lcs == 10 and rows[3].rouge_l_recall == 1.0
    assert rows[3].rouge_l_precision < 1.0


def test_chrf_identical_pair_is_one(spark):
    from kinesis_stream_reader_spark.operators import text

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base)], "doc_id BIGINT, text STRING"
    )
    rows = text.chrf_pairs_report(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.chrf_precision, r.chrf_recall, r.chrf) == (1.0, 1.0, 1.0)


def test_kappa_bounds(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["cohens_kappa_report"](spark, sf_dir).collect()[0]
    assert row.n_docs > 0
    assert 0.0 <= row.po <= 1.0 and 0.0 <= row.pe <= 1.0
    assert -1.0 <= row.kappa <= 1.0


def test_gif_lzw_roundtrip_and_boundaries():
    import numpy as np

    from kinesis_stream_reader_spark.operators.multimodal import (
        _gif_palette,
        _lzw_decode_gif,
        _lzw_encode_gif,
        decode_gif,
        encode_gif,
    )

    # width-change boundary: random stream long enough to push the code
    # table past 512 and 1024 entries (9 -> 10 -> 11 bit codes)
    rng = np.random.RandomState(42)
    idx = [int(v) for v in rng.randint(0, 256, size=5000)]
    assert _lzw_decode_gif(_lzw_encode_gif(idx)) == idx
    # dict-cap boundary: compressible stream that exceeds 4096 entries,
    # forcing a mid-stream CLEAR + reset
    idx3 = [int(v) for v in np.tile(np.arange(64), 600)]
    assert _lzw_decode_gif(_lzw_encode_gif(idx3)) == idx3
    # full container round trip through the palette
    w, h = 11, 7
    raster = [(5 * i) % 256 for i in range(w * h)]
    rgb = decode_gif(encode_gif(raster, w, h))
    pal = np.frombuffer(_gif_palette(), dtype=np.uint8).reshape(256, 3)
    assert (rgb == pal[np.asarray(raster).reshape(h, w)]).all()


def test_gif_interlace_bit_and_truncation():
    import numpy as np
    import pytest as _pytest

    from kinesis_stream_reader_spark.operators.multimodal import (
        _gif_interlace_rows,
        decode_gif,
        encode_gif,
    )

    # round 6: the interlace bit is now HONORED, not rejected — setting
    # it on raster-stored data must decode to the inverse permutation
    gif = bytearray(encode_gif(list(range(8)), 2, 4))
    flag_at = 6 + 7 + 768 + 9  # image-descriptor flags byte
    gif[flag_at] |= 0x40
    plain = decode_gif(bytes(encode_gif(list(range(8)), 2, 4)))
    permuted = decode_gif(bytes(gif))
    inv = np.empty_like(plain)
    inv[_gif_interlace_rows(4)] = plain
    assert np.array_equal(permuted, inv)
    # parseable header but no image descriptor -> loud ValueError
    with _pytest.raises(ValueError):
        decode_gif(b"GIF87a" + b"\x00" * 7)


def test_ridge_closed_form_matches_numpy(spark, sf_dir):
    """The Cramer solve must agree with numpy's ridge solution on the
    same per-user moments."""
    import numpy as np

    from kinesis_stream_reader_spark import registry
    from kinesis_stream_reader_spark.sources.tables import load_events
    from pyspark.sql import functions as F

    row = registry.QUERIES["ridge_regression_closed_form"](spark, sf_dir).collect()[0]
    pu = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("x1"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x2"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
                ).otherwise(0)
            ).alias("y"),
        )
        .collect()
    )
    X = np.array([[1.0, r.x1, r.x2] for r in pu])
    y = np.array([float(r.y) for r in pu])
    lam = 10_000
    A = X.T @ X + lam * np.diag([0.0, 1.0, 1.0])
    beta = np.linalg.solve(A, X.T @ y)
    assert abs(row.beta0 - beta[0]) < 1e-3
    assert abs(row.beta1 - beta[1]) < 1e-3
    assert abs(row.beta2 - beta[2]) < 1e-3
    assert row.n_users == len(pu)


def test_streaming_drift_monitor_invariants(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    rows = registry.QUERIES["streaming_drift_monitor"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_window > 0 and r.tvd_num >= 0
        assert 0.0 <= r.tvd <= 1.0
        # the flag is exactly the 5% integer gate
        assert r.drift_flag == (r.tvd > 0.05) or abs(r.tvd - 0.05) < 1e-5


def test_markov_eval_bounds(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["markov_next_event_eval"](spark, sf_dir).collect()[0]
    assert row.n_train > 0 and row.n_eval > 0
    assert 0 <= row.n_uncovered <= row.n_eval
    assert 0.0 <= row.top1_accuracy <= 1.0
    # 5 uniform event types: argmax prediction should beat 1/5 - noise
    assert row.top1_accuracy > 0.1


def test_brier_murphy_identity_bounds(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["brier_decomposition"](spark, sf_dir).collect()[0]
    assert 0.0 <= row.brier <= 1.0
    assert row.reliability >= 0.0 and row.resolution >= 0.0
    assert 0.0 <= row.uncertainty <= 0.25 + 1e-9
    # Murphy identity holds up to the within-bin forecast variance term
    # (which is >= 0), so REL - RES + UNC <= brier + quantization slack
    assert row.reliability - row.resolution + row.uncertainty <= row.brier + 1e-3


def test_dtw_kernel_matches_bruteforce(spark, sf_dir):
    """The banded prefix-min DTW kernel must equal the cell-by-cell DP."""
    import numpy as np

    from kinesis_stream_reader_spark import registry

    rows = registry.QUERIES["dtw_timeseries_similarity"](spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) type pairs
    # independent brute-force on one pair pulled from the same census
    from kinesis_stream_reader_spark.sources.tables import load_events
    from pyspark.sql import functions as F

    days = (
        load_events(spark, sf_dir)
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    d0 = min(r.d for r in days)
    ndays = (max(r.d for r in days) - d0).days + 1
    series = {}
    for r in days:
        series.setdefault(r.event_type, np.zeros(ndays, dtype=np.int64))[
            (r.d - d0).days
        ] = r.n

    def brute(a, b, band=7):
        inf = 1 << 40
        n, m = len(a), len(b)
        dp = np.full((n + 1, m + 1), inf, dtype=np.int64)
        dp[0][0] = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                if abs(i - j) > band:
                    continue
                c = abs(int(a[i - 1]) - int(b[j - 1]))
                dp[i][j] = min(inf, c + min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]))
        return int(dp[n][m])

    by_pair = {(r.type_a, r.type_b): r.dtw for r in rows}
    ts = sorted(series)
    for i in range(len(ts)):
        for j in range(i + 1, len(ts)):
            assert by_pair[(ts[i], ts[j])] == brute(series[ts[i]], series[ts[j]])


def test_harmonic_centrality_bounds(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    rows = registry.QUERIES["harmonic_centrality"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # H(v) <= n_reached (each term <= 1), and > n_reached/6 (d <= 6)
        assert r.harmonic <= r.n_reached + 1e-6
        assert r.harmonic >= r.n_reached / 6.0 - 1e-6


def test_matrix_profile_symmetric_motifs(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    rows = registry.QUERIES["matrix_profile_daily"](spark, sf_dir).collect()
    assert len(rows) > 0
    by_i = {r.i: r for r in rows}
    for r in rows:
        assert r.mp_dist >= 0
        assert abs(r.i - r.mp_index) >= 7  # exclusion zone respected
        # motif distance is symmetric as a bound: d(i, nn(i)) >= mp(nn(i))
        assert r.mp_dist >= by_i[r.mp_index].mp_dist


def test_pelt_segments_partition_the_series(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    rows = registry.QUERIES["pelt_changepoints"](spark, sf_dir).collect()
    assert len(rows) >= 1
    assert rows[0].seg_start == 1
    for prev, cur in zip(rows, rows[1:]):
        assert cur.seg_start == prev.seg_end + 1  # contiguous cover
    assert all(r.n_days == r.seg_end - r.seg_start + 1 for r in rows)
    assert all(r.mean_cents >= 0 for r in rows)


def test_markov_removal_shares_sum_to_one(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    rows = registry.QUERIES["markov_attribution_removal"](spark, sf_dir).collect()
    assert len(rows) == 4  # the four non-purchase channels
    assert abs(sum(r.attribution_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0.0 <= r.p_conv_removed <= r.p_conv_base <= 1.0
        assert 0.0 <= r.removal_effect <= 1.0


def test_hadamard_parseval_energy(spark):
    """WHT is orthogonal up to a factor of 64: sum(c_k^2) = 64 * sum(s_j^2).
    Check against a directly constructed WAV."""
    import numpy as np

    from kinesis_stream_reader_spark.operators import multimodal as mm

    s = (((7 * 13 + np.arange(64) * 31) % 65536) - 32768).astype("<i2")
    media = spark.createDataFrame(
        [(7, bytearray(mm.encode_wav(s, 8000)))], "doc_id BIGINT, data BINARY"
    )
    row = mm.audio_hadamard_bands(media).collect()[0]
    H = np.array(
        [[1 - 2 * (bin(j & k).count("1") % 2) for k in range(64)] for j in range(64)],
        dtype=np.int64,
    )
    c = H.T @ s.astype(np.int64)
    assert row.dc == int(c[0])
    assert row.band_low == int(np.abs(c[1:8]).sum())
    assert row.band_mid == int(np.abs(c[8:32]).sum())
    assert row.band_high == int(np.abs(c[32:64]).sum())
    # Parseval for the +/-1 WHT
    assert (c @ c) == 64 * (s.astype(np.int64) @ s.astype(np.int64))


def test_ecod_uniform_vector_scores_low(spark):
    """A vector sitting at the center of every dimension must score
    LOWER than one at the extreme of every dimension."""
    import numpy as np

    rows = []
    rng = np.random.RandomState(7)
    for i in range(50):
        rows.append((i, [float(v) for v in rng.uniform(-1, 1, 8)], 0))
    rows.append((100, [0.0] * 8, 0))   # central
    rows.append((101, [9.0] * 8, 0))   # extreme right tail everywhere
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT")
    # drive the operator body via a temp sf_dir-free path: reuse the
    # registry function by monkey-backing load_table? simpler: inline
    import sys

    from kinesis_stream_reader_spark import registry as R
    regmod = sys.modules[R.QUERIES["ecod_outlier_scores"].__module__]
    orig = regmod.load_table
    try:
        regmod.load_table = lambda spark_, sf_, name: emb
        out = {r.vec_id: r for r in R.QUERIES["ecod_outlier_scores"](spark, "unused").collect()}
    finally:
        regmod.load_table = orig
    assert out[101].ecod_score > out[100].ecod_score
    assert all(r.ecod_score >= 0 for r in out.values())


def test_lof_flags_isolated_point(spark):
    """A tight cluster plus one far point: the isolated point's LOF must
    exceed every cluster member's."""
    import numpy as np

    rows = []
    rng = np.random.RandomState(3)
    for i in range(30):
        rows.append((i, [float(v) for v in rng.normal(0, 0.1, 8)], 0))
    rows.append((99, [5.0] * 8, 0))
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT")
    import sys

    from kinesis_stream_reader_spark import registry as R

    regmod = sys.modules[R.QUERIES["lof_outlier_scores"].__module__]
    orig = regmod.load_table
    try:
        regmod.load_table = lambda spark_, sf_, name: emb
        out = {r.vec_id: r.lof for r in R.QUERIES["lof_outlier_scores"](spark, "x").collect()}
    finally:
        regmod.load_table = orig
    cluster_max = max(v for k, v in out.items() if k != 99)
    assert out[99] > cluster_max
    assert out[99] > 1.5  # clearly anomalous


def test_mcnemar_counts_consistent(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["mcnemar_raters_test"](spark, sf_dir).collect()[0]
    assert 0 <= row.b <= row.n_docs and 0 <= row.c <= row.n_docs
    assert row.chi2_cc >= 0.0


def test_gains_lift_monotone(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    rows = registry.QUERIES["gains_lift_deciles"](spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    gains = [r.gain for r in rows]
    assert gains == sorted(gains)           # cumulative gains never drop
    assert abs(rows[-1].gain - 1.0) < 1e-6  # all positives captured at 100%
    assert abs(rows[-1].lift - 1.0) < 1e-3  # lift converges to 1


def test_ks_matches_max_gap(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["model_ks_separation"](spark, sf_dir).collect()[0]
    assert 0.0 <= row.ks <= 1.0
    assert row.n_pos > 0 and row.n_neg > 0


def test_bon_curve_monotone_and_exact_small_case(spark):
    """BoN expectations must be non-decreasing in n, and match the
    closed form on a crafted two-candidate user."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "purchase", 1.00, "{}"),
        (2, dt.datetime(2024, 1, 2), 1, "purchase", 3.00, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING",
    )
    import sys

    from kinesis_stream_reader_spark import registry as R

    regmod = sys.modules[R.QUERIES["best_of_n_selection"].__module__]
    orig = regmod.load_events
    try:
        regmod.load_events = lambda spark_, sf_: events
        out = {r.n: r for r in R.QUERIES["best_of_n_selection"](spark, "x").collect()}
    finally:
        regmod.load_events = orig
    # k=2, rewards {100, 300} cents: E[max of n] = 100/2^n + 300*(2^n-1)/2^n,
    # half-up rounded to whole cents PER USER (the documented contract)
    assert out[1].avg_best_cents == 200.0
    assert out[2].avg_best_cents == 250.0   # (100 + 300*3)/4
    assert out[4].avg_best_cents == 288.0   # floor(287.5 + 0.5)
    assert out[8].avg_best_cents == 299.0   # floor(299.21875 + 0.5)
    vals = [out[n].avg_best_cents for n in (1, 2, 4, 8)]
    assert vals == sorted(vals)


def test_evt_tail_sane(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["evt_pot_tail_report"](spark, sf_dir).collect()[0]
    assert row.n_exceed > 0 and row.mean_excess_cents > 0
    # uniform-ish values: bounded support implies xi < 0.5 and finite sigma
    assert row.xi_mom < 0.5
    assert row.sigma_mom_cents > 0


def test_obf_bounds_decrease_and_counts_accumulate(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    rows = registry.QUERIES["group_sequential_obf"](spark, sf_dir).collect()
    assert [r.look for r in rows] == [1, 2, 3, 4]
    bounds = [r.bound for r in rows]
    assert bounds == sorted(bounds, reverse=True)  # OBF gets more lenient
    for prev, cur in zip(rows, rows[1:]):
        # cumulative looks: populations and conversions never shrink
        assert cur.n0 >= prev.n0 and cur.n1 >= prev.n1
        assert cur.k0 >= prev.k0 and cur.k1 >= prev.k1
    assert rows[-1].crossed == (abs(rows[-1].z) >= rows[-1].bound)


def test_good_turing_bounds(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["good_turing_unseen_mass"](spark, sf_dir).collect()[0]
    assert 0 < row.vocab <= row.n_tokens
    assert 0 <= row.n1 <= row.vocab
    assert 0.0 <= row.p_unseen <= 1.0
    assert row.r_star_1 >= 0.0 and row.r_star_2 >= 0.0


def test_capture_recapture_sane(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["capture_recapture_estimate"](spark, sf_dir).collect()[0]
    assert row.n_both <= min(row.n_first, row.n_second)
    # Chapman is bounded below by the union of captures
    union = row.n_first + row.n_second - row.n_both
    assert row.n_hat_chapman >= union - 1
    assert row.n_true >= union


def test_heaps_beta_in_sublinear_range(spark, sf_dir):
    from kinesis_stream_reader_spark import registry

    row = registry.QUERIES["heaps_law_fit"](spark, sf_dir).collect()[0]
    assert row.n_points == 10
    # Heaps exponent: vocabulary grows sublinearly, beta in [0, 1).
    # The synthetic fixture's bounded vocab saturates in the first
    # decile, so a flat curve (beta == 0) is the CORRECT fit there.
    assert 0.0 <= row.heaps_beta < 1.0


# --------------------------------------------------------------------------
# Round 6: UniMax water-filling
# --------------------------------------------------------------------------
def test_unimax_allocation_invariants(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["unimax_allocation"](spark, sf_dir).collect()
    total_tokens = sum(r.tokens for r in rows)
    budget = 2 * total_tokens
    # nobody exceeds the 4-epoch cap; the budget is never exceeded and
    # the shortfall is only the integer-floor remainder of the even split
    assert all(r.alloc <= r.cap for r in rows)
    spent = sum(r.alloc for r in rows)
    n_uncapped = sum(1 for r in rows if r.alloc < r.cap)
    assert spent <= budget
    assert budget - spent < max(1, n_uncapped)
    # capped languages are exactly the low-resource ones: every capped
    # language has capacity <= every uncapped language's allocation
    capped = [r for r in rows if r.alloc == r.cap]
    uncapped = [r for r in rows if r.alloc < r.cap]
    if capped and uncapped:
        assert max(r.cap for r in capped) <= min(r.alloc for r in uncapped) + 1


def test_morton_shards_locality_beats_random(spark, sf_dir):
    """The Z-order sharding must actually preserve locality: the
    weighted mean intra-shard locality score should beat the single-
    shard (global) baseline computed the same way."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from kinesis_stream_reader_spark.sources.tables import load_table

    rows = entrymod.queries()["embedding_morton_shards"](spark, sf_dir).collect()
    n_total = sum(r.n_vectors for r in rows)
    assert n_total == load_table(spark, sf_dir, "embeddings").count()
    assert all(0 <= r.shard < 16 for r in rows)
    # global baseline: same quantized-dot statistic over ONE shard
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("d", "x")
    ).select(
        "vec_id", "d",
        F.greatest(F.lit(0), F.least(F.lit(15),
            F.floor((F.col("x").cast("double") + 1.0) * 8.0).cast("long"))
        ).alias("qv"),
    )
    sums = q.groupBy("d").agg(F.sum("qv").alias("sd"))
    dot = (
        q.join(sums, "d")
        .agg(F.sum(F.col("qv") * F.col("sd")).alias("ds"))
        .collect()[0].ds
    )
    global_loc = dot / (n_total * n_total)
    weighted = sum(r.locality * r.n_vectors for r in rows) / n_total
    assert weighted > global_loc


def test_hubness_histogram_mass_conserved(spark, sf_dir):
    """The k-occurrence histogram must cover every vector exactly once,
    and total edge mass must equal N*k (each vector emits k edges)."""
    import __spark_entry__ as entrymod
    from kinesis_stream_reader_spark.sources.tables import load_table

    rows = entrymod.queries()["hubness_report"](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n
    assert sum(r.k_occurrence * r.n_vectors for r in rows) == n * 5


def test_coreset_selects_farthest_and_weights_normalize(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["coreset_sensitivity_select"](spark, sf_dir).collect()
    assert len(rows) == 64
    d2 = [r.d2min for r in rows]
    assert d2 == sorted(d2, reverse=True)  # outlier-biased prefix
    assert all(r.sensitivity_weight > 0 for r in rows)


def test_fim_transform_reconstructs_psm_exactly(spark):
    """fim_transform invariants: segment lengths partition the doc, the
    gate is the documented md5 hex digit, and psm_md5 equals the md5
    of the PSM string rebuilt in plain Python from the reported cut
    points — i.e. the Spark-side substr/concat arithmetic is exactly
    the Bavarian et al. serialization."""
    import hashlib

    from kinesis_stream_reader_spark.operators import text as t

    texts = [
        (0, ""),
        (1, "a"),
        (2, "hello world, fill me in"),
        (3, "x" * 257),
        (4, "multi\nline\ntext with  spaces"),
        (5, "unicode: éèê end"),
    ]
    docs = spark.createDataFrame(texts, "doc_id BIGINT, text STRING")
    rows = {r.doc_id: r for r in t.fim_transform(docs).collect()}
    applied = 0
    for doc_id, s in texts:
        r = rows[doc_id]
        n = len(s)
        assert r.prefix_len + r.middle_len + r.suffix_len == n
        assert 0 <= r.cut1 <= r.cut2 <= n
        gate_hex = hashlib.md5(f"{doc_id}:fim".encode()).hexdigest()[0]
        assert r.fim_applied == int(gate_hex < "8")
        if r.fim_applied:
            applied += 1
            c1 = (
                int(hashlib.md5(f"{doc_id}:fim1".encode()).hexdigest()[:12], 16)
                % (n + 1)
            )
            c2 = (
                int(hashlib.md5(f"{doc_id}:fim2".encode()).hexdigest()[:12], 16)
                % (n + 1)
            )
            c1, c2 = min(c1, c2), max(c1, c2)
            assert (r.cut1, r.cut2) == (c1, c2)
            psm = "<PRE>" + s[:c1] + "<SUF>" + s[c2:] + "<MID>" + s[c1:c2]
        else:
            assert (r.cut1, r.cut2, r.middle_len) == (0, 0, n and r.middle_len)
            psm = s
        assert r.psm_md5 == hashlib.md5(psm.encode()).hexdigest()
    assert applied >= 1  # the tiny id set must exercise both branches


def test_fim_transform_rate_is_half(spark):
    from kinesis_stream_reader_spark.operators import text as t

    docs = spark.range(500).selectExpr(
        "id AS doc_id", "repeat('ab', 10) AS text"
    )
    out = t.fim_transform(docs)
    frac = out.agg({"fim_applied": "avg"}).collect()[0][0]
    assert 0.4 < frac < 0.6


def test_ece_report_closed_form_on_tiny_corpus(spark):
    """ECE on a hand-checkable corpus: recompute the exact-integer
    bin algebra in plain Python from quality_model_score's logits and
    compare — proving the |1e6*k - sp| collapse is the textbook
    sum n_b/N * |acc_b - conf_b|."""
    import math

    from kinesis_stream_reader_spark.operators import text as t

    docs = spark.createDataFrame(
        [
            (1, "The cat sat on the mat.", "en"),
            (2, "a b c d e f g h", "en"),
            (3, "wort wort wort und so weiter.", "de"),
            (4, "the of and a " * 10, "en"),
            (5, "zzzzz", "fr"),
        ],
        "doc_id BIGINT, text STRING, lang STRING",
    )
    scored = {r.doc_id: r.logit for r in t.quality_model_score(docs).collect()}
    cells = {}
    for doc_id, lg in scored.items():
        lu = math.floor(lg * 1e4 + 0.5)
        pq = min(max(lu + 20000, 0), 40000) * 25
        b = min(pq // 100000, 9)
        n, k, sp = cells.get(b, (0, 0, 0))
        pos = 1 if doc_id in (1, 2, 4) else 0
        cells[b] = (n + 1, k + pos, sp + pq)
    nn = sum(c[0] for c in cells.values())
    ece = math.floor(
        sum(abs(k * 1000000 - sp) for _, k, sp in cells.values()) / nn + 0.5
    ) / 1e6
    max_gap = max(
        math.floor(abs(k * 1000000 - sp) / n + 0.5) for n, k, sp in cells.values()
    ) / 1e6
    row = t.ece_report(docs).collect()[0]
    assert (row.n_docs, row.n_bins) == (5, len(cells))
    assert row.ece == ece
    assert row.max_gap == max_gap


def test_unigram_lm_viterbi_is_globally_optimal(spark, sf_dir):
    """The emitted score must equal the brute-force best segmentation
    score under the final vocab — Viterbi, not greedy (pure-Python
    replay of the EM + exhaustive segmentation on the same census)."""
    import itertools
    import math
    from collections import Counter

    from kinesis_stream_reader_spark.operators import text
    from kinesis_stream_reader_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r.word: (r.pieces, r.n_pieces, r.score_u)
        for r in text.unigram_lm_encode(docs).collect()
    }

    words = Counter()
    for r in docs.select("text").collect():
        for w in r.text.strip().split():
            if w:
                words[w] += 1

    # seed census + scores (mirror of the operator)
    occ = Counter()
    for w, n in words.items():
        for j in range(len(w)):
            for l in range(1, min(6, len(w) - j) + 1):
                occ[w[j : j + l]] += n
    occ = {p: c for p, c in occ.items() if len(p) == 1 or c >= 50}
    tot = sum(occ.values())
    vocab = {p: math.floor(math.log(c / tot) * 1e6 + 0.5) for p, c in occ.items()}

    def viterbi(w, vcb):
        NEG = -(1 << 60)
        dp = [0] + [NEG] * len(w)
        bp = [0] * (len(w) + 1)
        for p in range(1, len(w) + 1):
            for j in range(1, min(6, p) + 1):
                lp = vcb.get(w[p - j : p])
                if lp is not None and dp[p - j] + lp >= dp[p]:
                    dp[p], bp[p] = dp[p - j] + lp, j
        pieces, p = [], len(w)
        while p > 0:
            pieces.append(w[p - bp[p] : p])
            p -= bp[p]
        return list(reversed(pieces)), dp[len(w)]

    # hard-EM iteration
    usage = Counter()
    for w, n in words.items():
        for piece in viterbi(w, vocab)[0]:
            usage[piece] += n
    kept = dict(usage)
    for p in vocab:
        if len(p) == 1:
            kept.setdefault(p, 1)
    totu = sum(kept.values())
    vocab1 = {
        p: math.floor(math.log(c / totu) * 1e6 + 0.5) for p, c in kept.items()
    }

    def brute_best(w):
        best = None
        L = len(w)
        for cuts in itertools.product([0, 1], repeat=L - 1):
            pos, pieces, s, ok = 0, [], 0, True
            bounds = [i + 1 for i, c in enumerate(cuts) if c] + [L]
            for b in bounds:
                piece = w[pos:b]
                if len(piece) > 6 or piece not in vocab1:
                    ok = False
                    break
                s += vocab1[piece]
                pieces.append(piece)
                pos = b
            if ok and (best is None or s > best):
                best = s
        return best

    assert set(got) == set(words)
    checked = 0
    for w in sorted(words):
        pieces, score = viterbi(w, vocab1)
        assert got[w] == (" ".join(pieces), len(pieces), score), w
        if len(w) <= 12:  # brute force 2^(L-1) segmentations
            assert score == brute_best(w), w
            checked += 1
    assert checked > 0


def test_wordpiece_vocab_cap_binds_deterministically(spark, sf_dir):
    """With a tiny explicit cap the multi-char vocab truncates to the
    top-K by (wt DESC, is_head DESC, piece ASC) and the encode stays
    total (single chars unconditional) — the bounded-broadcast
    contract the round-10 cap added."""
    from kinesis_stream_reader_spark.operators import text
    from kinesis_stream_reader_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    full = {
        r.word: r.pieces
        for r in text.wordpiece_encode(docs, vocab_cap=65536).collect()
    }
    capped = {
        r.word: r.pieces
        for r in text.wordpiece_encode(docs, vocab_cap=3).collect()
    }
    assert set(full) == set(capped)
    # same cap twice -> identical output (deterministic tie-breaks)
    again = {
        r.word: r.pieces
        for r in text.wordpiece_encode(docs, vocab_cap=3).collect()
    }
    assert capped == again
    # capped vocab can only make segmentations coarser-or-equal never
    # drop words, and every piece sequence reassembles its word
    for w, pieces in capped.items():
        assert "".join(p.lstrip("#") for p in pieces.split(" ")) == w


def test_unigram_lm_multiple_em_iters_terminate(spark, sf_dir):
    """em_iters=2 runs a second Viterbi-EM round and still yields a
    total, deterministic segmentation (fixpoint-safe)."""
    from kinesis_stream_reader_spark.operators import text
    from kinesis_stream_reader_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out1 = {
        r.word: (r.pieces, r.score_u)
        for r in text.unigram_lm_encode(docs, em_iters=2).collect()
    }
    out2 = {
        r.word: (r.pieces, r.score_u)
        for r in text.unigram_lm_encode(docs, em_iters=2).collect()
    }
    assert out1 == out2 and out1
    for w, (pieces, _) in out1.items():
        assert "".join(pieces.split(" ")) == w
