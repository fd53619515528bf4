"""Property tests for the round-4v..4ae exact algorithms: Hamilton
allocation, two-pass weighted median, FastSS neighborhood recall.

Hypothesis drives the INPUTS; each property compares the distributed
algorithm against an in-Python naive reference on the same data.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    weights=st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=12)
)
@settings(**_SETTINGS)
def test_largest_remainder_total_and_bounds(spark, monkeypatch, weights):
    """For any weight vector with positive total: Σseats == 1000 and
    every share differs from the exact quota by < 1 seat."""
    if sum(weights) == 0:
        weights[0] = 1
    import whisky_wine_etl_spark.plans.round4v as r4v

    # nations with revenue == weight (cents exactness: weight dollars)
    nation = spark.createDataFrame(
        [Row(n_nationkey=i, n_name=f"N{i:02d}") for i in range(len(weights))]
    )
    cust = spark.createDataFrame(
        [Row(c_custkey=i, c_nationkey=i) for i in range(len(weights))]
    )
    orders = spark.createDataFrame(
        [Row(o_orderkey=i, o_custkey=i) for i in range(len(weights))]
    )
    li = spark.createDataFrame(
        [
            Row(l_orderkey=i, l_extendedprice=float(w), l_discount=0.0)
            for i, w in enumerate(weights)
        ]
    )
    tables = {"nation": nation, "customer": cust, "orders": orders, "lineitem": li}
    monkeypatch.setattr(r4v, "load_table", lambda s, sf, n: tables[n])
    rows = plans.QUERIES["alloc_largest_remainder"](spark, SF).collect()
    total_w = sum(weights)
    assert sum(r.seats for r in rows) == 1000
    for r in rows:
        w = weights[int(r.n_name[1:])]
        quota = 1000 * w / total_w
        assert quota - 1 < r.seats < quota + 1


@given(
    data=st.lists(
        st.tuples(
            st.floats(min_value=1.0, max_value=50_000.0, allow_nan=False),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_weighted_median_matches_naive(spark, monkeypatch, data):
    """The histogram+refine selection equals the naive sorted
    cumulative scan for any (price, weight) multiset."""
    import whisky_wine_etl_spark.plans.round4aa as r4aa

    data = [(round(p, 2), w) for p, w in data]
    orders = spark.createDataFrame(
        [Row(o_orderkey=i, o_totalprice=p) for i, (p, _) in enumerate(data)]
    )
    li = spark.createDataFrame(
        [Row(l_orderkey=i) for i, (_, w) in enumerate(data) for _k in range(w)]
    )
    tables = {"orders": orders, "lineitem": li}
    monkeypatch.setattr(r4aa, "load_table", lambda s, sf, n: tables[n])
    out = plans.QUERIES["agg_weighted_median_2pass"](spark, SF).collect()[0]

    tw = sum(w for _, w in data)
    cum = 0
    naive = None
    for p, w in sorted(data):
        cum += w
        if cum * 2 >= tw:
            naive = p
            break
    assert out.total_weight == tw
    assert out.weighted_median == naive


_NAME = st.text(alphabet="ab", min_size=1, max_size=6)


@given(names=st.lists(_NAME, min_size=2, max_size=12))
@settings(**_SETTINGS)
def test_fastss_matches_cross_join(spark, monkeypatch, names):
    """Deletion-neighborhood pairs == brute-force levenshtein ≤ 1
    pairs for arbitrary short strings over {a,b} (the alphabet that
    maximizes collisions)."""
    import whisky_wine_etl_spark.plans.round4y as r4y

    cust = spark.createDataFrame(
        [
            Row(c_custkey=i, c_name=n, c_mktsegment="MACHINERY")
            for i, n in enumerate(names)
        ]
    )
    monkeypatch.setattr(r4y, "load_table", lambda s, sf, n: cust)
    got = {
        (r.custkey_a, r.custkey_b)
        for r in plans.QUERIES["er_deletion_neighborhood_join"](spark, SF).collect()
    }

    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = {
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(names[i], names[j]) <= 1
    }
    assert got == want
