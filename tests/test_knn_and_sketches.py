"""Semantic tests for the round-3 additions: exact kNN graph,
mutual-kNN components, n-gram novelty, Theil-Sen trend, and
mergeable-histogram quantiles — each checked against an independent
driver-side replay (numpy / pure Python), not the DuckDB oracle."""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

from kinesis_stream_reader_spark.registry import QUERIES
from kinesis_stream_reader_spark.sources.tables import load_table


def _quantized_matrix(spark, sf_dir):
    import numpy as np

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array(
        [[math.floor(float(x) * 1000 + 0.5) for x in r.embedding] for r in rows],
        dtype=np.int64,
    )
    order = np.argsort(ids)
    return ids[order], mat[order]


def test_knn_graph_matches_numpy_bruteforce(spark, sf_dir):
    import numpy as np

    ids, mat = _quantized_matrix(spark, sf_dir)
    D = mat @ mat.T
    # sentinel must survive negation below (int64.min negates to itself)
    np.fill_diagonal(D, -(2**62))
    got = QUERIES["knn_graph"](spark, sf_dir).collect()
    by_query = defaultdict(list)
    for r in got:
        by_query[r.vec_id].append((r.rank, r.neighbor_id, r.dot_q))
    assert set(by_query) == set(ids.tolist())
    for qi, vid in enumerate(ids):
        row = D[qi]
        want = sorted(zip(-row, ids))[:5]
        mine = sorted(by_query[vid])
        assert len(mine) == 5
        for (rank, nbr, dot), (negdot, wid) in zip(mine, want):
            assert nbr == wid and dot == -negdot, (vid, rank)


def test_mutual_knn_components_union_find(spark, sf_dir):
    got = {
        r.vec_id: r.component_id
        for r in QUERIES["knn_graph_components"](spark, sf_dir).collect()
    }
    knn = defaultdict(set)
    for r in QUERIES["knn_graph"](spark, sf_dir).collect():
        knn[r.vec_id].add(r.neighbor_id)
    parent = {v: v for v in got}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, nbrs in knn.items():
        for b in nbrs:
            if a in knn[b]:  # mutual edge
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in got}
    assert got == want
    # sanity: at least one non-singleton component OR all singleton —
    # either way every component id is its minimum member
    for v, c in got.items():
        assert c <= v


def test_ngram_novelty_replay(spark, sf_dir):
    got = {r.doc_id: r for r in QUERIES["ngram_novelty_curve"](spark, sf_dir).collect()}
    docs = sorted(
        (r.doc_id, r.text)
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    )
    seen: set = set()
    for doc_id, text in docs:
        toks = text.strip().split()
        grams = (
            {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
            if len(toks) >= 3
            else {text.strip()}
        )
        novel = {g for g in grams if g not in seen}
        seen |= grams
        r = got[doc_id]
        assert r.n_grams == len(grams)
        assert r.n_novel == len(novel)
        assert r.novelty_frac == math.floor(len(novel) / len(grams) * 1e4 + 0.5) / 1e4
    # corpus-order novelty must start at 1.0 for the first document
    first = min(got)
    assert got[first].novelty_frac == 1.0


def test_theil_sen_trend_replay(spark, sf_dir):
    got = {r.event_type: r for r in QUERIES["theil_sen_trend"](spark, sf_dir).collect()}
    daily: dict = defaultdict(lambda: defaultdict(int))
    for r in (
        load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    ):
        daily[r.event_type][r.ts.date()] += math.floor(r.value * 100 + 0.5)
    for et, per_day in daily.items():
        days = sorted(per_day)
        slopes = [
            (per_day[d2] - per_day[d1]) / (d2 - d1).days
            for i, d1 in enumerate(days)
            for d2 in days[i + 1 :]
        ]
        assert got[et].n_pairs == len(slopes)
        assert abs(got[et].theil_sen_slope - statistics.median(slopes)) < 1e-6, et


def test_merged_histogram_quantiles_bound_and_formula(spark, sf_dir):
    import numpy as np

    rows = QUERIES["quantiles_merged_histograms"](spark, sf_dir).collect()
    assert [r.q for r in rows] == [0.25, 0.5, 0.75, 0.9, 0.99]
    assert all(r.within_bin_width for r in rows)
    xs = np.sort(
        np.array(
            [
                r.o_totalprice
                for r in load_table(spark, sf_dir, "orders")
                .select("o_totalprice")
                .collect()
            ],
            dtype=float,
        )
    )
    lo, hi, n = xs[0], xs[-1], len(xs)
    width = (hi - lo) / 32
    counts, _ = np.histogram(xs, bins=32, range=(lo, hi))
    cum = np.cumsum(counts)
    for r in rows:
        target = r.q * n
        b = int(np.searchsorted(cum, target))
        below = cum[b - 1] if b else 0
        est = lo + width * (b + (target - below) / counts[b])
        assert abs(r.est - est) < 1e-3, r.q
        exact = float(np.quantile(xs, r.q))
        assert abs(r.exact - exact) < 1e-3, r.q


def test_split_semantic_leakage_replay(spark, sf_dir):
    import hashlib

    import numpy as np

    ids, mat = _quantized_matrix(spark, sf_dir)
    is_test = np.array(
        [hashlib.md5(str(v).encode()).hexdigest()[0] in "012" for v in ids]
    )
    got = {r.test_id: r for r in QUERIES["split_semantic_leakage"](spark, sf_dir).collect()}
    assert set(got) == set(ids[is_test].tolist())
    train_ids, train_mat = ids[~is_test], mat[~is_test]
    for qi in np.flatnonzero(is_test):
        dots = train_mat @ mat[qi]
        best = np.lexsort((train_ids, -dots))[0]
        r = got[ids[qi]]
        assert r.nearest_train_id == train_ids[best]
        assert r.dot_q == dots[best]
        assert r.leaked == (dots[best] >= 2_000_000)


def test_randomized_response_debiasing(spark, sf_dir):
    rows = QUERIES["randomized_response_audit"](spark, sf_dir).collect()
    truth = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    n_total = sum(truth.values())
    assert {r.category for r in rows} == set(truth)
    for r in rows:
        assert r.true_n == truth[r.category]
        # debiased estimate should land within ~5 sigma of truth:
        # var of the mechanism is bounded by N * (1-p)/p^2
        sigma = (n_total * 0.25) ** 0.5 / 0.75
        assert abs(r.estimated_n - r.true_n) < 5 * sigma + 1
        assert abs(abs(r.estimated_n - r.true_n) - r.abs_err) < 0.011
    # counts are conserved: observed sums to N
    assert sum(r.observed_n for r in rows) == n_total


def test_markov_transitions_replay(spark, sf_dir):
    import math as _math
    from collections import Counter

    got = {(r.from_type, r.to_type): r for r in QUERIES["markov_transition_matrix"](spark, sf_dir).collect()}
    per_user = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    ):
        per_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    counts: Counter = Counter()
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    assert set(got) == set(counts)
    row_totals: Counter = Counter()
    for (a, _), n in counts.items():
        row_totals[a] += n
    for key, n in counts.items():
        assert got[key].n == n
        want_p = _math.floor(n / row_totals[key[0]] * 1e4 + 0.5) / 1e4
        assert got[key].p == want_p
