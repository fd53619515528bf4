"""Behavior tests for round-4af: Markov next-event train/eval."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()

_P = 2147483647
_MULT = 1000003


def _bucket(u: int) -> int:
    return ((u % _P) * _MULT) % _P % 10


def test_markov_eval_learns_deterministic_chain(spark, monkeypatch):
    """Train users follow a→b strictly; an eval user also follows
    a→b → accuracy 1.0 for prev='a'."""
    import whisky_wine_etl_spark.plans.round4af as r4af

    train_users = [u for u in range(60) if _bucket(u) < 8][:5]
    eval_users = [u for u in range(60) if _bucket(u) >= 8][:2]
    assert train_users and eval_users
    rows, eid = [], 0
    for u in train_users + eval_users:
        for i, et in enumerate(["a", "b", "a", "b", "a", "b"]):
            eid += 1
            rows.append(
                Row(event_id=eid, ts=dt.datetime(2024, 1, 1, 0, 0, i),
                    user_id=u, event_type=et, value=1.0, props="{}")
            )
    monkeypatch.setattr(
        r4af, "load_table", lambda s, sf, n: spark.createDataFrame(rows)
    )
    out = {r.prev: r for r in plans.QUERIES["ml_markov_next_event_eval"](spark, SF).collect()}
    assert out["a"].predicted == "b"
    assert out["a"].accuracy == pytest.approx(1.0)
    assert out["b"].predicted == "a"
    assert out["b"].accuracy == pytest.approx(1.0)


def test_markov_eval_no_user_leakage(spark):
    """Real-data sanity: every eval count is positive, accuracies in
    [0,1], and the 5 event types cover the antecedents."""
    rows = plans.QUERIES["ml_markov_next_event_eval"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_eval > 0
        assert 0.0 <= r.accuracy <= 1.0
        assert r.n_correct <= r.n_eval
