"""Property tests for operators/keys.py — now load-bearing for
er_sorted_neighborhood, stat_hodges_lehmann and alloc_knapsack_greedy:
the two-pass range-partition rank/running-total must equal the naive
single-partition window on arbitrary data (duplicates, negatives,
skewed key distributions, tiny frames vs partition count)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from whisky_wine_etl_spark.operators.keys import (
    add_running_total,
    add_surrogate_key,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(-50, 50),      # order key (duplicates likely)
            st.integers(0, 10 ** 6),   # unique-ifier source
            st.integers(-100, 100),    # value to sum
        ),
        min_size=1,
        max_size=120,
    ),
    n_parts=st.sampled_from([1, 2, 7]),
)
def test_two_pass_equals_naive_window(spark, rows, n_parts):
    # make the total order genuinely total: (k, uid) with uid unique
    uniq = {}
    data = []
    for k, u, v in rows:
        while u in uniq:
            u += 1
        uniq[u] = True
        data.append((k, u, v))
    df = spark.createDataFrame(data, "k long, uid long, v long")

    sk = {
        (r.k, r.uid): r.sk
        for r in add_surrogate_key(
            df, ["k", "uid"], key_col="sk", num_partitions=n_parts
        ).collect()
    }
    rt_inc = {
        (r.k, r.uid): r.rt
        for r in add_running_total(
            df, ["k", "uid"], "v", out_col="rt",
            inclusive=True, num_partitions=n_parts,
        ).collect()
    }
    rt_exc = {
        (r.k, r.uid): r.rt
        for r in add_running_total(
            df, ["k", "uid"], "v", out_col="rt",
            inclusive=False, num_partitions=n_parts,
        ).collect()
    }

    ordered = sorted(data, key=lambda t: (t[0], t[1]))
    run = 0
    for i, (k, u, v) in enumerate(ordered, start=1):
        assert sk[(k, u)] == i, ("sk", k, u)
        assert rt_exc[(k, u)] == run, ("exclusive", k, u)
        run += v
        assert rt_inc[(k, u)] == run, ("inclusive", k, u)
