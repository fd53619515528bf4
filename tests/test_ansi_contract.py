"""Round-5 ANSI contract tests (VERDICT r4 items 1-3).

The engine pins ``spark.sql.ansi.enabled=true`` in both session entry
points (session.py). These tests assert:

1. The pin is actually present in sessions built by ``get_spark`` and
   applied by ``tune_session``.
2. The wine T-1 coerce path (reference wine_etl_kaggle.py:73,
   ``pd.to_numeric(errors='coerce')``) produces identical results under
   BOTH ANSI settings — the engine uses try_cast, so the coerce
   semantics never depended on ANSI-off.
3. The scale-dependent integer arithmetic family
   (``alloc_capped_proportional``, the query that crashed BENCH_r04
   with an int64 ARITHMETIC_OVERFLOW at sf0.1) now runs clean at sf0.1
   under ANSI-on and matches the DuckDB oracle exactly — the
   redistribution multiply is widened to DECIMAL(38,0)
   (plans/round4ba.py).
"""

from __future__ import annotations

import pytest

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.parity import compare, duckdb_connection
from whisky_wine_etl_spark.session import tune_session

plans.load_all()

SF01 = "/root/testdata/sf0.1"


def test_ansi_pinned_by_factory(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_tune_session_pins_ansi(spark):
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        tune_session(spark)
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")


def _collect_sorted(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


@pytest.mark.parametrize(
    "name",
    ["wine_t1_t2_cast_dropna", "alloc_capped_proportional"],
)
def test_two_mode_parity(spark, sf_small, name):
    """Result is byte-identical under ANSI on and off: coercion goes
    through try_cast and overflow-prone arithmetic through decimal
    widening, so the ANSI flag can never change an answer — only turn
    a silent wraparound into a loud failure."""
    q = plans.QUERIES[name]
    spark.conf.set("spark.sql.ansi.enabled", "true")
    on = _collect_sorted(q(spark, sf_small))
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        off = _collect_sorted(q(spark, sf_small))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
    assert on == off
    assert len(on) > 0


def test_alloc_capped_proportional_sf01_oracle_green(spark):
    """The exact failure mode of BENCH_r04: at sf0.1 per-nation rev_c
    ~1.5e11 cents makes remaining*rev_c ~1.5e19 > int64. Must now be
    oracle-exact (not merely non-crashing) at sf0.1 under ANSI-on."""
    con = duckdb_connection(SF01)
    df = plans.QUERIES["alloc_capped_proportional"](spark, SF01)
    ok, msg = compare(df, con, plans.ORACLES["alloc_capped_proportional"])
    assert ok, msg
