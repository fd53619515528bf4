"""Behavior tests for round-4aw: cogroup as-of join, isotonic
calibration."""

from __future__ import annotations

from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_cogroup_asof_matches_window_operator(spark):
    """The cogroup/merge_asof path must agree with the established
    tagged-union window operator on the shared columns."""
    cg = plans.QUERIES["join_asof_cogroup"](spark, SF).select(
        "event_id", "purchase_ts"
    )
    win = plans.QUERIES["join_asof_last_purchase"](spark, SF).select(
        "event_id", "purchase_ts"
    )
    assert cg.count() == win.count()
    assert cg.exceptAll(win).count() == 0
    assert win.exceptAll(cg).count() == 0


def test_cogroup_asof_backwardness(spark):
    rows = plans.QUERIES["join_asof_cogroup"](spark, SF).collect()
    assert rows
    for r in rows:
        if r.purchase_ts is not None:
            assert r.purchase_ts <= r.ts


def test_isotonic_output_is_monotone(spark):
    rows = plans.QUERIES["ml_isotonic_calibration"](spark, SF).collect()
    assert rows
    ordered = sorted(rows, key=lambda r: r.bin)
    rates = [r.iso_rate for r in ordered]
    assert all(a <= b + 1e-12 for a, b in zip(rates, rates[1:]))


def test_isotonic_preserves_weighted_mean(spark):
    rows = plans.QUERIES["ml_isotonic_calibration"](spark, SF).collect()
    n = sum(r.n for r in rows)
    raw_mean = sum(r.raw_rate * r.n for r in rows) / n
    iso_mean = sum(r.iso_rate * r.n for r in rows) / n
    assert abs(raw_mean - iso_mean) < 1e-4  # 6dp rounding slack per bin


def test_isotonic_equals_naive_pava(spark):
    """Cross-check the distributed+driver PAVA against a naive
    reference implementation over the same bins."""
    rows = sorted(
        plans.QUERIES["ml_isotonic_calibration"](spark, SF).collect(),
        key=lambda r: r.bin,
    )
    # naive PAVA on (raw_rate, n)
    pools = []
    for r in rows:
        pools.append([r.raw_rate * r.n, float(r.n), [r.bin]])
        while len(pools) > 1 and pools[-2][0] / pools[-2][1] > pools[-1][0] / pools[-1][1] + 1e-12:
            a = pools.pop()
            pools[-1][0] += a[0]
            pools[-1][1] += a[1]
            pools[-1][2] += a[2]
    expect = {}
    for s, w, bns in pools:
        for bn in bns:
            expect[bn] = s / w
    for r in rows:
        assert abs(r.iso_rate - expect[r.bin]) < 1e-4
