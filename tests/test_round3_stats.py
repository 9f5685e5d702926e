"""Semantic tests for the round-3 stats/eval additions: Kaplan-Meier,
PR curve, winnowing fingerprints, BH-FDR, CUPED, t-closeness, LATERAL
top-k — brute-force recomputation or invariant checks, independent of
the DuckDB oracles."""

from __future__ import annotations

import math

from pyspark.sql import Row, functions as F

from kinesis_stream_reader_spark.operators import dedup, relational
from kinesis_stream_reader_spark.registry import QUERIES
from kinesis_stream_reader_spark.sources.tables import load_events, load_table


def test_kaplan_meier_brute(spark, sf_dir):
    """Recompute the KM curve in plain Python from the raw events."""
    rows = load_events(spark, sf_dir).select("user_id", "ts", "event_type").collect()
    first, purch = {}, {}
    for r in rows:
        u = r.user_id
        if u not in first or r.ts < first[u]:
            first[u] = r.ts
        if r.event_type == "purchase" and (u not in purch or r.ts < purch[u]):
            purch[u] = r.ts
    subjects = []
    for u, t0 in first.items():
        if u in purch:
            dh = int((purch[u] - t0).total_seconds() // 3600)
            if dh <= 72:
                subjects.append((dh, 1))
                continue
        subjects.append((72, 0))
    times = sorted({t for t, _ in subjects})
    n_total, seen = len(subjects), 0
    expect = {}
    s = 1.0
    for t in times:
        d = sum(1 for tt, e in subjects if tt == t and e == 1)
        c = sum(1 for tt, e in subjects if tt == t and e == 0)
        n_risk = n_total - seen
        s = s * ((n_risk - d) / n_risk)
        expect[t] = (n_risk, d, c, math.floor(s * 1e6 + 0.5) / 1e6)
        seen += d + c
    out = relational.kaplan_meier_survival(load_events(spark, sf_dir)).collect()
    got = {r.t: (r.n_risk, r.d_events, r.n_censored, r.survival) for r in out}
    assert got == expect
    # curve invariants: survival non-increasing, at-risk strictly decreasing
    surv = [r.survival for r in out]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    risks = [r.n_risk for r in out]
    assert all(a > b for a, b in zip(risks, risks[1:]))


def test_pr_curve_properties(spark, sf_dir):
    pts = QUERIES["pr_curve_points"](spark, sf_dir).collect()
    # thresholds descending, recall strictly increasing along the sweep
    ths = [r.threshold for r in pts]
    assert ths == sorted(ths, reverse=True)
    recs = [r.recall for r in pts]
    assert all(a < b for a, b in zip(recs, recs[1:]))
    # the sweep emits the FIRST crossing of each 5% bucket, so the last
    # point is the first threshold whose recall clears 0.95
    assert recs[-1] > 0.95
    for r in pts:
        assert 0 <= r.precision <= 1 and 0 <= r.recall <= 1
        assert r.tp <= r.n_pred


def test_winnowing_shared_run_guarantee(spark):
    """Schleimer et al.'s guarantee: two docs sharing a token run of
    length >= k + w - 1 (= 7 here) must share a fingerprint value, so
    with threshold lowered to 1 they become partners."""
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    rows = [
        Row(doc_id=1, text=shared + " one two three four five six seven eight"),
        Row(doc_id=2, text="nine ten eleven twelve thirteen fourteen " + shared),
        Row(doc_id=3, text="totally unrelated words forming another document body here"),
    ]
    docs = spark.createDataFrame(rows)
    out = {
        r.doc_id: (r.n_fingerprints, r.canonical_id)
        for r in dedup.winnowing_fingerprints(docs, share_threshold=1).collect()
    }
    assert out[2][1] == 1  # doc 2 canonicalizes to doc 1 via the shared run
    assert out[1][1] == 1 and out[3][1] == 3
    assert all(n > 0 for n, _ in out.values())
    # short docs (< k+w-1 tokens) produce no fingerprints but still appear
    tiny = spark.createDataFrame([Row(doc_id=9, text="too short for grams")])
    trow = dedup.winnowing_fingerprints(tiny).collect()[0]
    assert (trow.n_fingerprints, trow.canonical_id) == (0, 9)


def test_fdr_bh_rejections_are_rank_prefix(spark, sf_dir):
    rows = QUERIES["fdr_bh_correction"](spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    rejected = [r.rejected for r in rows]
    # BH step-up rejects exactly ranks 1..k*: no True after a False
    assert all(not b or all(rejected[:i]) for i, b in enumerate(rejected))
    for r in rows:
        assert 0 <= r.p_surrogate <= 1
    # p ordering matches |z| ordering (surrogate is monotone in |z|)
    zs = [abs(r.z) for r in rows]
    assert zs == sorted(zs, reverse=True)


def test_cuped_preserves_pooled_mean(spark, sf_dir):
    rows = QUERIES["cuped_adjustment"](spark, sf_dir).collect()
    assert len(rows) == 2
    n = sum(r.n_users for r in rows)
    pooled_raw = sum(r.n_users * r.mean_y for r in rows) / n
    pooled_adj = sum(r.n_users * r.mean_y_cuped for r in rows) / n
    # theta*(xbar_arm - xbar) sums to zero weighted by arm size, so the
    # pooled mean is invariant (up to the 1e-6 output rounding)
    assert abs(pooled_raw - pooled_adj) < 1e-4
    assert 0 <= rows[0].var_reduction <= 1
    assert rows[0].theta == rows[1].theta


def test_t_closeness_bounds_and_margins(spark, sf_dir):
    rows = QUERIES["t_closeness_report"](spark, sf_dir).collect()
    total = load_events(spark, sf_dir).count()
    assert sum(r.n for r in rows) == total
    for r in rows:
        assert 0 <= r.tvd <= 1
        assert r.breach == (r.tvd > 0.2 or (r.tvd == 0.2 and r.breach))


def test_lateral_topk_matches_window(spark, sf_dir):
    from pyspark.sql.window import Window

    got = QUERIES["join_lateral_topk"](spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    expect = (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))


def test_holt_recurrence_brute(spark, sf_dir):
    """Replay Holt's recursion in plain Python per event type."""
    rows = QUERIES["holt_linear_smoothing"](spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r.day)
        l, b = float(series[0].y), 0.0
        assert (series[0].level, series[0].trend) == (
            math.floor(l * 1e6 + 0.5) / 1e6,
            0.0,
        )
        for prev, cur in zip(series, series[1:]):
            fitted = l + b
            l_new = 0.5 * cur.y + 0.5 * (l + b)
            b = 0.3 * (l_new - l) + 0.7 * b
            l = l_new
            assert cur.fitted == math.floor(fitted * 1e6 + 0.5) / 1e6
            assert cur.level == math.floor(l * 1e6 + 0.5) / 1e6
            assert cur.trend == math.floor(b * 1e6 + 0.5) / 1e6


def test_mann_kendall_brute(spark, sf_dir):
    from collections import Counter

    rows = QUERIES["mann_kendall_trend"](spark, sf_dir).collect()
    counts: dict = {}
    for r in (
        load_events(spark, sf_dir)
        .select("event_type", F.col("ts").cast("date").alias("d"))
        .collect()
    ):
        counts.setdefault(r.event_type, Counter())[r.d] += 1
    for r in rows:
        ys = [v for _, v in sorted(counts[r.event_type].items())]
        n = len(ys)
        s = sum(
            (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie18 = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(ys).values()
        )
        var18 = n * (n - 1) * (2 * n + 5) - tie18
        assert (r.n_days, r.s, r.var18) == (n, s, var18)
        if s > 0:
            z = (s - 1) / math.sqrt(var18 / 18.0)
        elif s < 0:
            z = (s + 1) / math.sqrt(var18 / 18.0)
        else:
            z = 0.0
        assert r.z == math.floor(z * 1e4 + 0.5) / 1e4


def test_fd_audit_brute(spark, sf_dir):
    rows = {r.fd: r for r in QUERIES["functional_dependency_audit"](spark, sf_dir).collect()}
    assert rows["nation: n_name -> n_regionkey"].holds  # key-side FD
    part = load_table(spark, sf_dir, "part").select("p_name", "p_brand").collect()
    per = {}
    for r in part:
        per.setdefault(r.p_name, set()).add(r.p_brand)
    got = rows["part: p_name -> p_brand"]
    assert got.n_keys == len(per)
    assert got.n_violating_keys == sum(1 for v in per.values() if len(v) > 1)
    assert got.max_rhs_per_key == max(len(v) for v in per.values())
    assert got.holds == (got.n_violating_keys == 0)


def test_referential_integrity_clean_fixture(spark, sf_dir):
    rows = QUERIES["referential_integrity_audit"](spark, sf_dir).collect()
    assert len(rows) == 7
    # driver fixtures are referentially consistent by construction
    assert all(r.n_orphans == 0 and r.orphan_pct == 0.0 for r in rows)
    assert all(r.n_child > 0 for r in rows)


def test_embedding_drift_bounds(spark, sf_dir):
    rows = QUERIES["embedding_drift_report"](spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    sizes = {
        r.label: (r.na, r.nb)
        for r in emb.groupBy("label")
        .agg(
            F.count(F.when(F.col("vec_id") % 2 == 0, 1)).alias("na"),
            F.count(F.when(F.col("vec_id") % 2 != 0, 1)).alias("nb"),
        )
        .collect()
    }
    for r in rows:
        assert (r.n_a, r.n_b) == sizes[r.label]
        assert -1.0 <= r.cos_centroids <= 1.0
        assert r.l2_shift >= 0


def test_streaming_topk_matches_batch(spark, sf_dir):
    got = QUERIES["streaming_topk_windowed"](spark, sf_dir).collect()
    batch = (
        load_events(spark, sf_dir)
        .groupBy(
            F.date_format(
                F.window("ts", "1 hour").start, "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    expect = (
        batch.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("window_start", "rank", "event_type", "n_events")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))


def test_isotonic_matches_pav_brute(spark, sf_dir):
    """The minimax construction must equal classic sequential
    weighted PAV on the same bin census."""
    rows = QUERIES["isotonic_calibration"](spark, sf_dir).collect()
    fits = [r.iso_fit for r in rows]
    assert all(a <= b for a, b in zip(fits, fits[1:]))  # monotone
    # sequential pool-adjacent-violators over (n, n_pos) in bin order
    blocks = []  # [sum_pos, sum_n]
    for r in rows:
        blocks.append([r.n_pos, r.n])
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
        ):
            p, n = blocks.pop()
            blocks[-1][0] += p
            blocks[-1][1] += n
    pav = []
    for p, n in blocks:
        pav.extend([p / n] * 0)  # lengths handled below
    # expand blocks back over bins
    expanded = []
    bi = 0
    for p, n in blocks:
        covered = 0
        while covered < n:
            covered += rows[bi].n
            expanded.append(p / n)
            bi += 1
    assert len(expanded) == len(rows)
    for r, e in zip(rows, expanded):
        assert r.iso_fit == math.floor(e * 1e6 + 0.5) / 1e6


def test_logrank_brute(spark, sf_dir):
    row = QUERIES["logrank_test"](spark, sf_dir).collect()[0]
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_type").collect()
    first, purch = {}, {}
    for r in ev:
        u = r.user_id
        if u not in first or r.ts < first[u]:
            first[u] = r.ts
        if r.event_type == "purchase" and (u not in purch or r.ts < purch[u]):
            purch[u] = r.ts
    subj = []
    for u, t0 in first.items():
        dh = (
            int((purch[u] - t0).total_seconds() // 3600) if u in purch else None
        )
        if dh is not None and dh <= 72:
            subj.append((u % 2, dh, 1))
        else:
            subj.append((u % 2, 72, 0))
    times = sorted({t for _, t, _ in subj})
    o0 = se0 = sv = 0
    n_times = 0
    for t in times:
        d0 = sum(1 for a, tt, e in subj if a == 0 and tt == t and e)
        d1 = sum(1 for a, tt, e in subj if a == 1 and tt == t and e)
        n0 = sum(1 for a, tt, _ in subj if a == 0 and tt >= t)
        n1 = sum(1 for a, tt, _ in subj if a == 1 and tt >= t)
        d, n = d0 + d1, n0 + n1
        if d == 0 or n <= 1:
            continue
        n_times += 1
        o0 += d0
        frac0 = n0 / n
        se0 += math.floor(d * frac0 * 1e9 + 0.5)
        sv += math.floor(d * frac0 * (1.0 - frac0) * (n - d) / (n - 1) * 1e9 + 0.5)
    assert (row.n_times, row.o0) == (n_times, o0)
    assert row.e0 == math.floor(se0 / 1e9 * 1e6 + 0.5) / 1e6
    chi2 = (o0 - se0 / 1e9) ** 2 / (sv / 1e9)
    assert row.chi2 == math.floor(chi2 * 1e4 + 0.5) / 1e4
    assert row.significant == (chi2 > 3.841)


def test_jackknife_brute(spark, sf_dir):
    row = QUERIES["jackknife_ratio_ci"](spark, sf_dir).collect()[0]
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "value").collect()
    S: dict = {}
    C: dict = {}
    for r in ev:
        g = r.user_id % 32
        S.setdefault(g, 0)
        C.setdefault(g, 0)
        if r.event_type == "purchase":
            S[g] += math.floor(r.value * 100 + 0.5)
        elif r.event_type == "click":
            C[g] += 1
    buckets = sorted(S)
    st, ct, G = sum(S.values()), sum(C.values()), len(buckets)
    rqs = [math.floor((st - S[g]) / (ct - C[g]) * 1e4 + 0.5) for g in buckets]
    srq = sum(rqs)
    sumdev2 = sum((G * r - srq) ** 2 for r in rqs)
    se_c = math.sqrt((G - 1.0) / G * sumdev2) / G / 1e4
    r_c = st / ct
    assert row.n_buckets == G
    assert row.ratio == math.floor(r_c / 100.0 * 1e6 + 0.5) / 1e6
    assert row.jk_se == math.floor(se_c / 100.0 * 1e6 + 0.5) / 1e6
    assert row.ci_lo <= row.ratio <= row.ci_hi


def test_spearman_brute(spark, sf_dir):
    row = QUERIES["spearman_daily"](spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"), "o_totalprice"
    ).collect()
    days: dict = {}
    for r in orders:
        x, y = days.get(r.d, (0, 0))
        days[r.d] = (x + 1, y + math.floor(r.o_totalprice * 100 + 0.5))
    xs = [v[0] for v in days.values()]
    ys = [v[1] for v in days.values()]

    def midranks2(vals):
        out = []
        for v in vals:
            less = sum(1 for w in vals if w < v)
            ties = sum(1 for w in vals if w == v)
            out.append(2 * (less + 1) + ties - 1)
        return out

    a, b = midranks2(xs), midranks2(ys)
    n = len(a)
    num = n * sum(p * q for p, q in zip(a, b)) - sum(a) * sum(b)
    da = n * sum(p * p for p in a) - sum(a) ** 2
    db = n * sum(q * q for q in b) - sum(b) ** 2
    rho = num / math.sqrt(da) / math.sqrt(db)
    assert row.n_days == n
    assert row.rho == math.floor(rho * 1e6 + 0.5) / 1e6
    assert -1 <= row.rho <= 1


def test_mrr_recall_consistency(spark, sf_dir):
    rows = QUERIES["mrr_recall_eval"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r.recall_at_k <= 1
        if r.first_rank > 0:
            assert r.mrr == math.floor(1.0 / r.first_rank * 1e6 + 0.5) / 1e6
        else:
            assert r.mrr == 0.0
    # brute relevant sets: docs containing ALL terms of the query
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    import re as _re

    qsets = {1: {"hash", "join"}, 2: {"sort", "merge"}, 3: {"customer", "value"}}
    nrel = {q: 0 for q in qsets}
    for d in docs:
        toks = set(
            t
            for t in _re.sub(r"[^a-z0-9 ]", "", d.text.lower().strip()).split(" ")
            if t
        )
        for q, terms in qsets.items():
            if terms <= toks:
                nrel[q] += 1
    for r in rows:
        assert r.n_relevant == nrel[r.query_id]


def test_welch_brute(spark, sf_dir):
    row = QUERIES["welch_ttest"](spark, sf_dir).collect()[0]
    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "value")
        .collect()
    )
    arms: dict = {0: [], 1: []}
    for r in ev:
        arms[r.user_id % 2].append(math.floor(r.value * 100 + 0.5))
    n0, n1 = len(arms[0]), len(arms[1])
    a1, a2 = sum(arms[0]), sum(v * v for v in arms[0])
    b1, b2 = sum(arms[1]), sum(v * v for v in arms[1])
    m0, m1 = a1 / n0, b1 / n1
    v0 = (a2 - a1 * a1 / n0) / (n0 - 1)
    v1 = (b2 - b1 * b1 / n1) / (n1 - 1)
    t = (m1 - m0) / math.sqrt(v0 / n0 + v1 / n1)
    assert (row.n0, row.n1) == (n0, n1)
    assert row.mean0 == math.floor(m0 / 100.0 * 1e4 + 0.5) / 1e4
    assert row.t_stat == math.floor(t * 1e4 + 0.5) / 1e4
    assert row.significant == (abs(t) > 1.96)
    # Welch df must sit between min(n)-1 and n0+n1-2
    assert min(n0, n1) - 1 <= row.welch_df <= n0 + n1 - 2


def test_kendall_brute(spark, sf_dir):
    row = QUERIES["kendall_tau_daily"](spark, sf_dir).collect()[0]
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").cast("date").alias("d"), "o_totalprice")
        .collect()
    )
    days: dict = {}
    for r in orders:
        x, y = days.get(r.d, (0, 0))
        days[r.d] = (x + 1, y + math.floor(r.o_totalprice * 100 + 0.5))
    vals = list(days.values())
    n = len(vals)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = vals[i][0] - vals[j][0]
            dy = vals[i][1] - vals[j][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    tau = (c - d) / math.sqrt(n0 - tx) / math.sqrt(n0 - ty)
    assert (row.n_days, row.concordant, row.discordant) == (n, c, d)
    assert row.tau_b == math.floor(tau * 1e6 + 0.5) / 1e6
    # rank-based siblings must agree on the direction of association
    rho = QUERIES["spearman_daily"](spark, sf_dir).collect()[0].rho
    assert (row.tau_b > 0) == (rho > 0)


def test_seasonal_decompose_identities(spark, sf_dir):
    rows = QUERIES["seasonal_decompose"](spark, sf_dir).collect()
    assert len(rows) > 50
    # additive identity holds in quantized cents on every row
    for r in rows:
        assert abs(r.revenue - r.trend - r.seasonal - r.residual) < 0.011
    # exactly 7 distinct seasonal offsets, re-centered to ~0
    seas = sorted({r.seasonal for r in rows})
    assert len(seas) <= 7
    assert abs(sum(seas)) < 0.04 * len(seas) * 100
    # trend equals the brute centered 7-day MA on a sample row
    import datetime

    day_rows = {r.day: r for r in rows}
    census: dict = {}
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").cast("date").alias("d"), "o_totalprice")
        .collect()
    )
    for o in orders:
        census[o.d] = census.get(o.d, 0) + math.floor(o.o_totalprice * 100 + 0.5)
    days_sorted = sorted(census)
    for idx in (5, len(days_sorted) // 2):
        window = days_sorted[idx - 3 : idx + 4]
        if len(window) != 7:
            continue
        key = days_sorted[idx].strftime("%Y-%m-%d")
        if key not in day_rows:
            continue
        trend_c = math.floor(sum(census[d] for d in window) / 7.0 + 0.5)
        assert day_rows[key].trend == math.floor(trend_c / 100.0 * 100 + 0.5) / 100.0


def test_shapley_brute(spark, sf_dir):
    rows = QUERIES["shapley_attribution"](spark, sf_dir).collect()
    assert [r.channel for r in rows] == ["click", "error", "signup", "view"]
    ev = load_events(spark, sf_dir).select("user_id", "event_type").collect()
    masks: dict = {}
    conv: dict = {}
    bit = {"click": 1, "view": 2, "signup": 4, "error": 8}
    for r in ev:
        masks.setdefault(r.user_id, 0)
        conv.setdefault(r.user_id, 0)
        if r.event_type in bit:
            masks[r.user_id] |= bit[r.event_type]
        elif r.event_type == "purchase":
            conv[r.user_id] = 1
    census: dict = {}
    for u, m in masks.items():
        census[m] = census.get(m, 0) + conv[u]

    def v(s):
        return sum(nc for m, nc in census.items() if (m & s) == m)

    import itertools

    got = {r.channel: r.phi24 for r in rows}
    names = {0: "click", 1: "view", 2: "signup", 3: "error"}
    wt = {0: 6, 1: 2, 2: 2, 3: 6}
    tot = 0
    for i in range(4):
        phi24 = 0
        for s in range(16):
            if (s >> i) & 1:
                continue
            size = bin(s).count("1")
            phi24 += wt[size] * (v(s | (1 << i)) - v(s))
        assert got[names[i]] == phi24
        tot += phi24
    # exact efficiency: credits sum to 24 * (v(full) - v(empty))
    assert tot == 24 * (v(15) - v(0))


def test_srm_and_power_brute(spark, sf_dir):
    srm = QUERIES["srm_check"](spark, sf_dir).collect()[0]
    pw = QUERIES["power_mde_report"](spark, sf_dir).collect()[0]
    ev = load_events(spark, sf_dir).select("user_id", "event_type").collect()
    users = {r.user_id for r in ev}
    conv = {r.user_id for r in ev if r.event_type == "purchase"}
    n0 = sum(1 for u in users if u % 2 == 0)
    n1 = len(users) - n0
    e = (n0 + n1) / 2.0
    chi2 = (n0 - e) ** 2 / e + (n1 - e) ** 2 / e
    assert (srm.n0, srm.n1) == (n0, n1)
    assert srm.chi2 == math.floor(chi2 * 1e4 + 0.5) / 1e4
    assert srm.srm_detected == (chi2 > 3.841)
    p = len(conv) / len(users)
    mde = 2.801585 * math.sqrt(2.0 * p * (1.0 - p) / min(n0, n1))
    assert (pw.n0, pw.n1) == (n0, n1)
    assert pw.base_rate == math.floor(p * 1e6 + 0.5) / 1e6
    assert pw.mde_abs == math.floor(mde * 1e6 + 0.5) / 1e6


def test_hyperball_brute(spark, sf_dir):
    rows = QUERIES["hyperball_neighborhood"](spark, sf_dir).collect()
    ev = load_events(spark, sf_dir).select("user_id", "event_id").collect()
    und: dict = {}
    for r in ev:
        p, q = r.user_id % 200, r.event_id % 199
        if p == q:
            continue
        u, v = min(p, q), max(p, q)
        und.setdefault(u, set()).add(v)
        und.setdefault(v, set()).add(u)
    assert len(rows) == len(und)
    by_node = {r.node: r for r in rows}
    for node in list(sorted(und))[:20]:
        ball = {node}
        for _ in range(3):
            ball |= {w for b in list(ball) for w in und.get(b, ())}
        assert by_node[node].exact_ball == len(ball)
    # estimator sanity: positive, and the reported rel_err is honest
    for r in rows:
        assert r.est_ball > 0
        assert abs(r.est_ball - r.exact_ball * (1 + r.rel_err)) < r.exact_ball * 0.001 + 0.01


def test_seasonal_anomaly_consistency(spark, sf_dir):
    flags = QUERIES["seasonal_anomaly_flags"](spark, sf_dir).collect()
    dec = {r.day: r for r in QUERIES["seasonal_decompose"](spark, sf_dir).collect()}
    for r in flags:
        assert r.day in dec
        assert r.residual == dec[r.day].residual
        assert r.robust_score > 3.0  # the cutoff, in MAD units


def test_pacf_brute(spark, sf_dir):
    rows = {r.lag: r for r in QUERIES["pacf_daily"](spark, sf_dir).collect()}
    ev = load_events(spark, sf_dir).select(F.col("ts").cast("date").alias("d")).collect()
    days: dict = {}
    for r in ev:
        days[r.d] = days.get(r.d, 0) + 1
    nd, s = len(days), sum(days.values())
    cvals = {d: nd * x - s for d, x in days.items()}
    den = sum(v * v for v in cvals.values())
    import datetime

    r_ = {}
    for lag in (1, 2, 3):
        num = sum(
            cvals[d] * cvals[d + datetime.timedelta(days=lag)]
            for d in days
            if d + datetime.timedelta(days=lag) in days
        )
        r_[lag] = num / den
    p11 = r_[1]
    p22 = (r_[2] - r_[1] ** 2) / (1.0 - r_[1] ** 2)
    p21 = p11 - p22 * p11
    p33 = (r_[3] - p21 * r_[2] - p22 * r_[1]) / (1.0 - p21 * r_[1] - p22 * r_[2])
    assert rows[1].pacf == math.floor(p11 * 1e6 + 0.5) / 1e6
    assert rows[1].acf == rows[1].pacf  # PACF(1) == ACF(1) identity
    assert rows[2].pacf == math.floor(p22 * 1e6 + 0.5) / 1e6
    assert rows[3].pacf == math.floor(p33 * 1e6 + 0.5) / 1e6


def test_audio_fingerprint_brute(spark, sf_dir):
    rows = QUERIES["multimodal_audio_fingerprint"](spark, sf_dir).collect()
    by_doc = {r.doc_id: r for r in rows}
    for doc_id in list(by_doc)[:25]:
        n = 64 + doc_id % 50
        samples = [((doc_id * 13 + i * 31) % 65536) - 32768 for i in range(n)]
        nf = n // 8
        es = [sum(v * v for v in samples[f * 8 : (f + 1) * 8]) for f in range(nf)]
        fp = sum((1 << k) for k in range(nf - 1) if es[k + 1] > es[k])
        r = by_doc[doc_id]
        assert (r.n_frames, r.fingerprint) == (nf, fp)
        assert r.canonical_doc <= doc_id


def test_audio_fingerprint_long_clip_folds_into_63_bits(spark):
    """Clips with > 64 frame pairs must xor-fold (bit i = XOR of pair
    bits at index ≡ i mod 63), never shift past the int64 width."""
    import numpy as np

    from kinesis_stream_reader_spark.operators import multimodal as mm

    n = 8 * 200  # 200 frames -> 199 pair bits, well past 63
    s = (((7 * 13 + np.arange(n) * 31) % 65536) - 32768).astype("<i2")
    media = spark.createDataFrame(
        [(7, bytearray(mm.encode_wav(s)))], "doc_id BIGINT, data BINARY"
    )
    row = mm.audio_fingerprint(media).collect()[0]
    es = (s.astype(np.int64).reshape(200, 8) ** 2).sum(axis=1)
    bits = [1 if es[k + 1] > es[k] else 0 for k in range(199)]
    want = 0
    for k, b in enumerate(bits):
        if b:
            want ^= 1 << (k % 63)
    assert row.n_frames == 200
    assert row.fingerprint == want
    assert 0 <= row.fingerprint < (1 << 63)


def test_kneser_ney_brute(spark, sf_dir):
    rows = {r.doc_id: r for r in QUERIES["kneser_ney_logprob"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {
        d.doc_id: [t for t in d.text.lower().strip().split() if t] for d in docs
    }
    pc: dict = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            pc[(a, b)] = pc.get((a, b), 0) + 1
    hc: dict = {}
    fw: dict = {}
    bw: dict = {}
    for (a, b), c in pc.items():
        hc[a] = hc.get(a, 0) + c
        fw[a] = fw.get(a, 0) + 1
        bw[b] = bw.get(b, 0) + 1
    bt = len(pc)
    for doc_id in list(rows)[:10]:
        ts = toks[doc_id]
        lps = [
            math.log(
                (max(pc[(a, b)] - 0.75, 0.0) + 0.75 * fw[a] * bw[b] / bt) / hc[a]
            )
            for a, b in zip(ts, ts[1:])
        ]
        r = rows[doc_id]
        assert r.n_bigrams == len(lps)
        assert abs(r.avg_logprob - sum(lps) / len(lps)) < 2e-6
        assert r.ppl == round(math.exp(-r.avg_logprob), 4)
    # KN mass re-allocation keeps every probability in (0, 1]
    assert all(r.ppl >= 1.0 for r in rows.values())


def test_ipw_and_did_brute(spark, sf_dir):
    ipw = QUERIES["ipw_treatment_effect"](spark, sf_dir).collect()[0]
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "value", "ts"
    ).collect()
    per: dict = {}
    for r in ev:
        st = per.setdefault(r.user_id, [0, 0])
        st[0] += 1
        if r.event_type == "purchase":
            st[1] = 1
    cells: dict = {}
    for u, (n_ev, conv) in per.items():
        key = min(n_ev // 5, 9)
        c = cells.setdefault(key, [0, 0, 0, 0])  # n0 k0 n1 k1
        if u % 2 == 0:
            c[0] += 1
            c[1] += conv
        else:
            c[2] += 1
            c[3] += conv
    st_sum = nu = 0
    for n0, k0, n1, k1 in cells.values():
        if n0 == 0 or n1 == 0:
            continue
        e = n1 / (n1 + n0)
        st_sum += math.floor((k1 / e - k0 / (1.0 - e)) * 1e6 + 0.5)
        nu += n0 + n1
    assert ipw.n_users == nu
    assert ipw.ate_ipw == math.floor(st_sum / 1e6 / nu * 1e6 + 0.5) / 1e6
    did = QUERIES["did_estimate"](spark, sf_dir).collect()[0]
    micros = [int(r.ts.timestamp() * 1e6) for r in ev]
    # timestamp() float can drift a us; recompute from Spark-exact micros
    mn, mx = min(micros), max(micros)
    mid = (mn + mx) // 2
    sums: dict = {}
    for r, us in zip(ev, micros):
        if r.event_type != "purchase":
            continue
        key = (r.user_id % 2, 1 if us >= mid else 0)
        s = sums.setdefault(key, [0, 0])
        s[0] += 1
        s[1] += math.floor(r.value * 100 + 0.5)
    m = {k: v[1] / v[0] for k, v in sums.items()}
    brute = ((m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])) / 100.0
    assert abs(did.did - brute) < 1e-5
    assert did.mean_trt_post == math.floor(m[(1, 1)] / 100.0 * 1e4 + 0.5) / 1e4


def test_ucb_brute(spark, sf_dir):
    rows = QUERIES["ucb_arm_ranking"](spark, sf_dir).collect()
    ev = load_events(spark, sf_dir).select("event_type", "value").collect()
    st: dict = {}
    for r in ev:
        c = st.setdefault(r.event_type, [0, 0])
        c[0] += 1
        c[1] += 1 if r.value > 200 else 0
    big_n = sum(c[0] for c in st.values())
    ucbs = {
        t: c[1] / c[0] + math.sqrt(2.0 * math.log(big_n) / c[0])
        for t, c in st.items()
    }
    for r in rows:
        assert (r.n_pulls, r.n_rewards) == tuple(st[r.event_type])
        assert r.ucb_score == math.floor(ucbs[r.event_type] * 1e6 + 0.5) / 1e6
    order = sorted(ucbs, key=lambda t: (-ucbs[t], t))
    assert [r.event_type for r in rows] == order


def test_threshold_sweep_consistency(spark, sf_dir):
    rows = QUERIES["dedup_threshold_sweep"](spark, sf_dir).collect()
    assert [r.threshold for r in rows] == [0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_involved >= b.n_docs_involved
        assert a.dup_rate >= b.dup_rate
    # the tau=0.4 cell must equal the standalone dedup query's pair count
    n04 = QUERIES["dedup_embedding_cosine"](spark, sf_dir).count()
    assert rows[1].n_pairs == n04


def test_asof_forward_brute(spark, sf_dir):
    rows = {r.event_id: r for r in QUERIES["join_asof_forward"](spark, sf_dir).collect()}
    ev = load_events(spark, sf_dir).select("event_id", "user_id", "ts").collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("timestamp").alias("d"), "o_orderkey"
    ).collect()
    by_cust: dict = {}
    for o in orders:
        by_cust.setdefault(o.o_custkey, []).append((o.d, o.o_orderkey))
    for r in ev[:200]:
        cands = sorted(
            [(d, k) for d, k in by_cust.get(r.user_id, []) if d > r.ts]
        )
        expect = cands[0][1] if cands else None
        assert rows[r.event_id].next_orderkey == expect


def test_cume_dist_brute(spark, sf_dir):
    rows = QUERIES["window_cume_dist"](spark, sf_dir).collect()
    ev = load_events(spark, sf_dir).select("event_id", "event_type", "value").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    vals = {r.event_id: r for r in ev}
    for r in rows:
        universe = by_type[r.event_type]
        cd = sum(1 for v in universe if v <= vals[r.event_id].value) / len(universe)
        assert r.cd == math.floor(cd * 1e6 + 0.5) / 1e6


def test_blocking_recall_invariants(spark, sf_dir):
    r = QUERIES["blocking_recall_report"](spark, sf_dir).collect()[0]
    assert r.n_blocked_pairs <= r.n_truth_pairs
    assert r.n_missed == r.n_truth_pairs - r.n_blocked_pairs
    assert 0 <= r.blocking_recall <= 1
    # blocked pairs on the sample must agree with the dedup kernel run
    # standalone on the same sample
    from kinesis_stream_reader_spark.operators import dedup

    samp = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    n_blocked = dedup.embedding_near_dup_pairs(samp, threshold=0.4).count()
    assert r.n_blocked_pairs == n_blocked


def test_experiment_readout_consistency(spark, sf_dir):
    r = QUERIES["experiment_readout"](spark, sf_dir).collect()[0]
    srm = QUERIES["srm_check"](spark, sf_dir).collect()[0]
    # srm_check counts distinct users; readout counts per-user rows — same
    assert (r.n0, r.n1) == (srm.n0, srm.n1)
    assert r.srm_chi2 == srm.chi2
    assert r.srm_ok == (not srm.srm_detected)
    ab = QUERIES["ab_test_report"](spark, sf_dir).collect()[0]
    assert abs(r.conv_z - ab.z) <= 1e-4 + 1e-9
    t = QUERIES["welch_ttest"](spark, sf_dir).collect()[0]
    assert r.value_t == t.t_stat
    assert r.value_significant == t.significant
    pw = QUERIES["power_mde_report"](spark, sf_dir).collect()[0]
    # readout's base rate uses value>150 conversion; power_mde uses any
    # purchase — only the construction matches, not the number (and at
    # tiny sf every user purchases, making power_mde's MDE exactly 0)
    assert r.mde_abs > 0 and pw.mde_abs >= 0


def test_keyframe_brute(spark, sf_dir):
    rows = QUERIES["multimodal_keyframe_select"](spark, sf_dir).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id in list(by_doc)[:15]:
        w = 4 + 2 * (doc_id % 3)
        h = 4 + 2 * (doc_id % 2)
        n = 3 + doc_id % 4
        frames = [
            [(doc_id * 11 + f * 17 + j * 5) % 256 for j in range(w * h)]
            for f in range(n)
        ]
        lumas = [sum(fr) for fr in frames]
        cuts = [False] + [
            sum(abs(a - b) for a, b in zip(frames[f], frames[f - 1])) > 32 * w * h
            for f in range(1, n)
        ]
        scene = 0
        scenes: dict = {}
        for f in range(n):
            scene += int(cuts[f])
            scenes.setdefault(scene, []).append(f)
        got = sorted(by_doc[doc_id], key=lambda r: r.scene_id)
        assert len(got) == len(scenes)
        for r, (sid, fs) in zip(got, sorted(scenes.items())):
            key = (fs[0] + fs[-1]) // 2
            assert (r.scene_id, r.start_frame, r.end_frame) == (sid, fs[0], fs[-1])
            assert (r.n_frames, r.keyframe_idx) == (len(fs), key)
            assert r.keyframe_luma == lumas[key]


def test_dbscan_brute(spark, sf_dir):
    rows = QUERIES["dbscan_grid_clusters"](spark, sf_dir).collect()
    ev = load_events(spark, sf_dir).select("event_id", "user_id", "event_type").collect()
    cells: dict = {}
    for r in ev:
        if r.event_type != "click":
            continue
        x = (r.event_id * 2654435761) % 1000
        y = (r.user_id * 40503 + r.event_id * 97) % 1000
        cells[(x // 5, y // 5)] = cells.get((x // 5, y // 5), 0) + 1
    core = {c for c, n in cells.items() if n >= 3}
    # union-find over 8-neighborhood
    parent = {c: c for c in core}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for (cx, cy) in core:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb in core and nb != (cx, cy):
                    ra, rb = find((cx, cy)), find(nb)
                    if ra != rb:
                        parent[ra] = rb
    comps: dict = {}
    for c in core:
        comps.setdefault(find(c), []).append(c)
    expect = sorted(
        (
            min(cx * 1000 + cy for cx, cy in mem),
            len(mem),
            sum(cells[c] for c in mem),
        )
        for mem in comps.values()
    )
    got = [(r.cluster_id, r.n_cells, r.n_points) for r in rows if r.cluster_id >= 0]
    assert sorted(got) == expect
    noise = [r for r in rows if r.cluster_id == -1][0]
    assert noise.n_cells == len(cells) - len(core)
    assert noise.n_points == sum(n for c, n in cells.items() if c not in core)


def test_decay_brute(spark, sf_dir):
    rows = {r.user_id: r for r in QUERIES["decay_weighted_activity"](spark, sf_dir).collect()}
    ev = load_events(spark, sf_dir).select("user_id", "ts").collect()
    micros = [int(r.ts.timestamp() * 1e6) for r in ev]
    mx = max(micros)
    per: dict = {}
    for r, us in zip(ev, micros):
        if r.user_id % 57 != 0:
            continue
        w = math.floor(math.exp(-0.05 * ((mx - us) / 86400000000.0)) * 1e6 + 0.5)
        n, s = per.get(r.user_id, (0, 0))
        per[r.user_id] = (n + 1, s + w)
    assert set(rows) == set(per)
    for u, (n, s) in per.items():
        assert rows[u].n_events == n
        assert abs(rows[u].decay_score - s / 1e6) < 2e-6


def test_skipgram_table_brute(spark, sf_dir):
    rows = QUERIES["skipgram_negative_table"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    vc: dict = {}
    for d in docs:
        for t in d.text.lower().strip().split():
            if t:
                vc[t] = vc.get(t, 0) + 1
    w75 = {t: math.floor(math.exp(0.75 * math.log(c)) * 1e6 + 0.5) for t, c in vc.items()}
    sw = sum(w75.values())
    order = sorted(w75, key=lambda t: (-w75[t], t))[:50]
    assert [r.tok for r in rows] == order
    cum = 0
    for r, t in zip(rows, order):
        cum += w75[t]
        assert r.n_occurrences == vc[t]
        assert r.prob == math.floor(w75[t] / sw * 1e8 + 0.5) / 1e8
        assert r.cum_prob == math.floor(cum / sw * 1e8 + 0.5) / 1e8
    assert abs(rows[-1].cum_prob - 1.0) < 0.2 or len(rows) == 50


def test_delong_matches_pure_python(spark, sf_dir):
    """Independent replay of the Sun-Xu midrank DeLong estimator in
    pure Python over the collected logits — third implementation
    beside the census algebra and the SQL oracle; also sanity: the CI
    brackets the AUC and the variance is positive on mixed labels."""
    import math
    from collections import Counter

    from kinesis_stream_reader_spark.operators import text
    from kinesis_stream_reader_spark.registry import QUERIES
    from kinesis_stream_reader_spark.sources.tables import load_table

    row = QUERIES["delong_auc_ci"](spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    scored = (
        text.quality_model_score(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("logit", "lang")
        .collect()
    )
    data = [
        (round(r.logit * 1e4), r.lang == "en") for r in scored
    ]
    m = sum(1 for _, p in data if p)
    n = len(data) - m
    cnt = Counter(v for v, _ in data)
    pcnt = Counter(v for v, p in data if p)
    a_by, b_by = {}, {}
    cb = pb = 0
    for v in sorted(cnt):
        c, p, q = cnt[v], pcnt.get(v, 0), cnt[v] - pcnt.get(v, 0)
        qb = cb - pb
        a_by[v] = (2 * cb + c + 1) - (2 * pb + p + 1)
        b_by[v] = (2 * cb + c + 1) - (2 * qb + q + 1)
        cb += c
        pb += p
    sa = sum(pcnt.get(v, 0) * a_by[v] for v in cnt)
    sa2 = sum(pcnt.get(v, 0) * a_by[v] ** 2 for v in cnt)
    sb = sum((cnt[v] - pcnt.get(v, 0)) * b_by[v] for v in cnt)
    sb2 = sum((cnt[v] - pcnt.get(v, 0)) * b_by[v] ** 2 for v in cnt)
    var = (m * sa2 - sa * sa) / (4.0 * n * n * m * m * (m - 1)) + (
        n * sb2 - sb * sb
    ) / (4.0 * m * m * n * n * (n - 1))
    want_var = math.floor(var * 1e9 + 0.5) / 1e9
    assert (row.n_pos, row.n_neg) == (m, n)
    assert row.var_delong == want_var
    assert row.var_delong > 0
    assert row.ci_lo <= row.auc <= row.ci_hi
