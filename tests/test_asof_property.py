"""Property-based parity: the as-of join operator vs DuckDB's native
ASOF JOIN on randomized fixtures (hypothesis drives the shapes;
timestamps are unique per side so both engines are deterministic)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from whisky_wine_etl_spark.operators.asof import asof_join

KEYS = ["a", "b", "c"]


@st.composite
def sides(draw):
    # unique integer-second offsets per side → no intra-side time ties
    n_l = draw(st.integers(1, 12))
    n_r = draw(st.integers(0, 12))
    l_ts = draw(st.lists(st.integers(0, 400), min_size=n_l, max_size=n_l, unique=True))
    r_ts = draw(st.lists(st.integers(0, 400), min_size=n_r, max_size=n_r, unique=True))
    l_keys = draw(st.lists(st.sampled_from(KEYS), min_size=n_l, max_size=n_l))
    r_keys = draw(st.lists(st.sampled_from(KEYS), min_size=n_r, max_size=n_r))
    left = [(i, l_keys[i], l_ts[i]) for i in range(n_l)]
    right = [(r_keys[i], r_ts[i], 100 + i) for i in range(n_r)]
    return left, right


@given(sides())
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_backward_matches_duckdb(spark, data):
    left_rows, right_rows = data
    left = spark.createDataFrame(left_rows, "lid int, key string, t bigint")
    right = spark.createDataFrame(right_rows, "key string, rt bigint, rv int")
    got = {
        r.lid: r.rv
        for r in asof_join(
            left, right, on="t", by_left="key", by_right="key",
            right_time="rt", value_cols=["rv"],
        ).collect()
    }

    con = duckdb.connect()
    con.register("l", pd.DataFrame(left_rows, columns=["lid", "key", "t"]))
    con.register("r", pd.DataFrame(right_rows, columns=["key", "rt", "rv"]))
    if right_rows:
        expected = dict(
            con.execute(
                "SELECT l.lid, r.rv FROM l ASOF LEFT JOIN r"
                " ON l.key = r.key AND l.t >= r.rt"
            ).fetchall()
        )
    else:  # DuckDB needs a non-empty right side for ASOF; all-null expected
        expected = {lid: None for lid, _, _ in left_rows}
    expected = {k: (None if pd.isna(v) else v) for k, v in expected.items()}
    assert got == expected
