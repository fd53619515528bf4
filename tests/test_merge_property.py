"""Property-based invariants for merge/upsert and SCD2 on randomized
key/value fixtures (hypothesis drives shapes; values kept to small int
domains so collisions and null patterns are actually exercised)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from whisky_wine_etl_spark.operators import merge as mg

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(0, 8),  # key — small domain forces collisions
        st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
        st.one_of(st.none(), st.integers(0, 99)),
    ),
    max_size=12,
)


def _dedup_keys(rs):
    # one row per key (last wins) — upsert/scd2 inputs are keyed relations
    return list({r[0]: r for r in rs}.values())


@given(t=rows, s=rows)
@_SETTINGS
def test_upsert_idempotent_and_total(spark, t, s):
    """upsert(upsert(T,S),S) == upsert(T,S); keys(out) = keys(T)∪keys(S)."""
    t, s = _dedup_keys(t), _dedup_keys(s)
    target = spark.createDataFrame(t, "k int, name string, v int") if t else spark.createDataFrame([], "k int, name string, v int")
    source = spark.createDataFrame(s, "k int, name string, v int") if s else spark.createDataFrame([], "k int, name string, v int")
    once = mg.upsert(target, source, ["k"])
    got1 = sorted(tuple(r) for r in once.collect())
    got2 = sorted(tuple(r) for r in mg.upsert(once, source, ["k"]).collect())
    assert got1 == got2
    assert {r[0] for r in got1} == {r[0] for r in t} | {r[0] for r in s}


@given(cur=rows, snap=rows)
@_SETTINGS
def test_scd2_open_row_invariants(spark, cur, snap):
    """After an SCD2 apply: exactly one OPEN row per snapshot key, with
    the snapshot's value; no open rows for deleted keys; closed rows
    all carry the effective date."""
    cur, snap = _dedup_keys(cur), _dedup_keys(snap)
    dim_rows = [(k, seg, "2024-01-01", None) for (k, seg, _v) in cur]
    dim = (
        spark.createDataFrame(dim_rows, "k int, seg string, valid_from string, valid_to string")
        .selectExpr("k", "seg", "cast(valid_from as date) valid_from", "cast(valid_to as date) valid_to")
    )
    snap_df = spark.createDataFrame([(k, seg) for (k, seg, _v) in snap], "k int, seg string") \
        if snap else spark.createDataFrame([], "k int, seg string")
    out = mg.scd2_apply(dim, snap_df, ["k"], ["seg"], "2024-06-01").collect()

    open_rows = {r["k"]: r for r in out if r["valid_to"] is None}
    snap_map = {k: seg for (k, seg, _v) in snap}
    assert set(open_rows) == set(snap_map)                      # open iff in snapshot
    for k, r in open_rows.items():
        assert r["seg"] == snap_map[k]                          # open row = snapshot state
    n_open = sum(1 for r in out if r["valid_to"] is None)
    assert n_open == len(snap_map)                              # exactly one open per key
    for r in out:
        if r["valid_to"] is not None:
            assert str(r["valid_to"]) in ("2024-06-01",)        # closures stamp effective date
