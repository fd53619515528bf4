"""Behavior tests for round-4am: lambda pack, IDENTIFIER clause,
collation grouping, adjacent-duplicate compaction."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_lambda_pack_semantics_on_crafted_vectors(spark, monkeypatch):
    import whisky_wine_etl_spark.plans.round4am as r4am

    e = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, -2.5, 3.0]),
            Row(vec_id=2, embedding=[-1.0, -1.0, -1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    monkeypatch.setattr(r4am, "load_table", lambda s, sf, n: e)
    out = {r.vec_id: r for r in plans.QUERIES["func_lambda_pack"](spark, SF).collect()}
    assert out[1].n_pos == 2 and out[2].n_pos == 0
    assert out[1].has_big is True and out[2].has_big is False
    assert out[1].all_finite is True
    # dot with reverse: [1,-2.5,3]·[3,-2.5,1] = 3 + 6.25 + 3 = 12.25
    assert abs(out[1].dot_rev - 12.25) < 1e-9


def test_collation_group_folds_case(spark, monkeypatch):
    """UTF8_LCASE grouping merges 'LOGIN' and 'login'; a plain
    group-by would keep them apart."""
    import whisky_wine_etl_spark.plans.round4am as r4am

    ev = spark.createDataFrame(
        [
            Row(event_id=0, event_type="login", value=1.0),
            Row(event_id=1, event_type="login", value=2.0),
            Row(event_id=2, event_type="click", value=4.0),
        ]
    )
    monkeypatch.setattr(r4am, "load_table", lambda s, sf, n: ev)
    out = plans.QUERIES["func_collation_group"](spark, SF).collect()
    # event 0 is uppercased by the parity rule; collation folds it back
    by_key = {r.etype_ci: r for r in out}
    assert set(by_key) == {"login", "click"}
    assert by_key["login"].n == 2 and abs(by_key["login"].total - 3.0) < 1e-9
    # counter-factual: without collation the mixed key splits
    mixed = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.upper("event_type"))
        .otherwise(F.col("event_type"))
        .alias("m")
    )
    assert mixed.select("m").distinct().count() == 3


def test_collapse_adjacent_drops_self_loops_only(spark, monkeypatch):
    import datetime as dt

    import whisky_wine_etl_spark.plans.round4am as r4am

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    ev = spark.createDataFrame(
        [
            Row(event_id=1, ts=ts(0), user_id=7, event_type="a"),
            Row(event_id=2, ts=ts(1), user_id=7, event_type="a"),  # dropped
            Row(event_id=3, ts=ts(2), user_id=7, event_type="b"),
            Row(event_id=4, ts=ts(3), user_id=7, event_type="a"),  # kept: not adjacent
            Row(event_id=5, ts=ts(0), user_id=8, event_type="a"),  # other user unaffected
        ]
    )
    monkeypatch.setattr(r4am, "load_table", lambda s, sf, n: ev)
    out = plans.QUERIES["events_collapse_adjacent"](spark, SF).collect()
    assert [(r.user_id, r.event_id) for r in out] == [(7, 1), (7, 3), (7, 4), (8, 5)]


def test_identifier_clause_binds_table_name(spark):
    out = plans.QUERIES["sql_identifier_clause"](spark, SF).collect()
    assert {r.l_returnflag for r in out} == {"A", "N", "R"}
    assert all(r.n > 0 for r in out)
