"""Permanent regression gate for the r8 oracle-fragility discipline
(tools/logs/r8_oracle_fragility_audit.md): the hazard classes that
produced the only two driver reds in project history (r5 cusum, r7
diag) must never re-enter the oracle corpus.

These are STATIC + cheap-empirical checks (DuckDB only, sf0.001) —
they complement, not replace, the parity sweeps and the FP-order
perturbation audit.
"""

from __future__ import annotations

import decimal
import re

import duckdb
import pytest

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.parity import duckdb_connection

plans.load_all()

SF = "/root/testdata/sf0.001"

# Driver-green quantile_cont holdovers, adjudicated in the r8 audit:
# the (n-1)*p interpolation rule matches Spark percentile_cont and has
# been stable across DuckDB history. ADDITIONS to this list are a
# design decision, not a default.
_QUANTILE_CONT_ALLOWED = {
    "agg_median_percentile",
    "agg_mode_percentile_cont",
    "agg_trimmed_winsorized",
    "events_funnel_latency",
    "graph_kcore",
    "stat_bootstrap_poisson",
    "stat_theil_sen_daily",
    "window_rolling_median",
}


def _stripped(sql: str) -> str:
    return re.sub(r"--[^\n]*", "", sql)


def test_no_quantile_disc_anywhere():
    """quantile_disc's index rule has varied across DuckDB versions —
    zero uses allowed (explicit rank selection is the replacement)."""
    offenders = [
        n
        for n, s in plans.ORACLES.items()
        if re.search(r"\bquantile_disc\b", _stripped(s), re.I)
    ]
    assert offenders == []


def test_quantile_cont_only_in_adjudicated_set():
    users = {
        n
        for n, s in plans.ORACLES.items()
        if re.search(r"\bquantile_cont\b", _stripped(s), re.I)
    }
    assert users <= _QUANTILE_CONT_ALLOWED, (
        f"new quantile_cont user(s) {users - _QUANTILE_CONT_ALLOWED}: "
        "prefer explicit rank selection (see r8 audit doc)"
    )


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    return duckdb_connection(SF)


def test_no_decimal_typed_output_cells(con):
    """A DECIMAL-typed output means version-dependent scale rules
    reach the driver hash (probe D of the r8 audit; the
    events_attribution_models class). Must stay at zero."""
    offenders = []
    for name, sql in plans.ORACLES.items():
        rows = con.execute(sql).fetchall()
        if any(isinstance(v, decimal.Decimal) for r in rows for v in r):
            offenders.append(name)
    assert offenders == []


# Queries whose pre-round values were measured EXACTLY ON (or within
# ulps of) rounding halves by the r8-extension pre-round probe
# (tools/audit_oracle_fragility.py probe E, fixed 2026-08-16) and
# therefore migrated to the pinned floor(x*10^n + 0.5)/10^n discipline
# on BOTH engines. Bare ROUND must never return to these oracles —
# their data provably sits where engine rounding rules split.
_PINNED_ON_HALF = [
    "text_token_stats",
    "text_quality_score",
    "text_readability_flesch",
    "text_cdc_chunks",
    "ts_time_weighted_avg",
    "ts_holt_linear",
    "q15_top_supplier",
]


def test_on_half_migrations_stay_pinned():
    for name in _PINNED_ON_HALF:
        sql = _stripped(plans.ORACLES[name])
        assert not re.search(r"\bROUND\s*\(", sql, re.I), (
            f"{name}: bare ROUND reintroduced — this oracle's data sits "
            "ON rounding halves (r8-extension probe); keep the floor-pin"
        )
        assert re.search(r"FLOOR\s*\(", sql, re.I), name


# --- class-A static gate (r9, VERDICT r8 item 3) -----------------------
#
# Adjudicated allowlist for tools/oracle_typing.class_a_hits. The ONLY
# sanctioned pattern is the explicit fixed-scale money accumulation
# SUM(CAST(x AS DECIMAL(18,2))): both engines declare the identical
# DECIMAL(18,2) input type, summation widens to DECIMAL(38,2) under
# every DuckDB version's rule (scale never changes on SUM), the inputs
# are 2-dp-generated values ~1e-13 from the grid so the double->decimal
# cast cannot straddle a .005 boundary, and the result is cast back to
# DOUBLE before output. That exactness is the POINT of these queries
# (decimal-exact revenue vs float accumulation). Each entry lists the
# number of sanctioned hits so a new hit in the same oracle still
# fails. Additions are a design decision, not a default.
_CLASS_A_ALLOWED: dict[str, int] = {
    "etl_incremental_agg_state": 2,
    "privacy_tokenization_vault": 1,
    "sql_pipe_segment_revenue": 1,
    "sql_scripting_block": 1,
    "sql_session_variables": 1,
}


def _oracle_typing_module():
    """Load tools/oracle_typing.py by path (it is a tool script, not a
    package module); mirrors _frag_module below (ADVICE r9 item 4)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "oracle_typing",
        str(
            pathlib.Path(__file__).resolve().parents[1]
            / "tools"
            / "oracle_typing.py"
        ),
    )
    ot = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ot)
    return ot


def test_no_integer_context_decimal_literals():
    """The r5/r7 red mechanism, gated statically: no oracle may carry
    a decimal literal whose every arithmetic neighbor types INTEGER
    (R1), nor a SUM/AVG over a DECIMAL-typed expression (R2), beyond
    the line-adjudicated allowlist above. Typing comes from DuckDB's
    own parser + the live parquet schemas (tools/oracle_typing)."""
    ot = _oracle_typing_module()

    from whisky_wine_etl_spark.catalog import TABLES

    base = ot.base_column_categories(SF, list(TABLES))
    offenders: dict[str, list[str]] = {}
    for name, sql in plans.ORACLES.items():
        hits = ot.class_a_hits(sql, base)
        allowed = _CLASS_A_ALLOWED.get(name, 0)
        if len(hits) > allowed:
            offenders[name] = hits
    assert offenders == {}, (
        "integer-context decimal-literal arithmetic (the r5/r7 red "
        f"mechanism) found in: {offenders} — migrate to CAST(x AS "
        "DOUBLE) per tools/logs/r8_oracle_fragility_audit.md rule 4, "
        "or adjudicate into _CLASS_A_ALLOWED with a written reason"
    )
    # stale-allowlist guard: every allowlisted oracle must still exist
    # and still carry exactly its sanctioned hit count
    for name, count in _CLASS_A_ALLOWED.items():
        assert name in plans.ORACLES, f"stale allowlist entry {name}"
        assert len(ot.class_a_hits(plans.ORACLES[name], base)) == count, (
            f"{name}: allowlisted hit count changed — re-adjudicate"
        )


def test_no_limit_without_order_by():
    """An unordered LIMIT's row set is engine- and thread-dependent —
    a red-row source no value discipline can fix. Every LIMIT in every
    oracle (CTEs and subqueries included) must sit under an ORDER BY
    on the same SELECT node. Boundary TIES under an existing ORDER BY
    are the empirical half, covered by the DuckDB thread-perturbation
    sweep (tools/audit_fp_stability.py and the r9 corpus-wide pass)."""
    ot = _oracle_typing_module()
    offenders = {
        n: hits
        for n, s in plans.ORACLES.items()
        if (hits := ot.limit_without_order(s))
    }
    assert offenders == {}


def _frag_module():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "frag",
        str(
            pathlib.Path(__file__).resolve().parents[1]
            / "tools"
            / "audit_oracle_fragility.py"
        ),
    )
    frag = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(frag)
    return frag


def test_probe_e_blind_spot_detection():
    """ADVICE r8: nested ROUND and aggregate-consumed ROUND make the
    probe's substituted distances untrustworthy — the detector must
    flag both, skip string-literal fakes, and pass plain forms (and
    the current oracle corpus must contain zero blind-spot sites,
    else the committed scan's distances are partly masked)."""
    frag = _frag_module()
    assert frag.probe_e_blind_spots("SELECT ROUND(ROUND(x, 2) + 1, 4)")
    assert frag.probe_e_blind_spots("SELECT MIN(ROUND(x, 2)) FROM t")
    assert frag.probe_e_blind_spots("SELECT ROUND(x, 2), MAX(y) FROM t") == []
    assert frag.probe_e_blind_spots("SELECT 'MIN(', ROUND(x, 2) FROM t") == []
    offenders = {
        n: notes
        for n, s in plans.ORACLES.items()
        if (notes := frag.probe_e_blind_spots(s))
    }
    assert offenders == {}


def test_pre_round_substitution_arity():
    """The probe's ROUND rewriter must handle nesting, 1-arg calls,
    and parens/commas hiding inside string literals."""
    frag = _frag_module()
    out = frag.substitute_round("SELECT ROUND(x), round(ROUND(y, 2) + 1, 4)")
    assert out == (
        "SELECT __pre_round_dist(x, 0), "
        "__pre_round_dist(__pre_round_dist(y, 2) + 1, 4)"
    )
    # parens/commas inside string literals must not miscount depth
    hostile = "SELECT ROUND(strpos(x, '('), 2) + length('),'), 'ROUND(' AS t"
    assert frag.substitute_round(hostile) == (
        "SELECT __pre_round_dist(strpos(x, '('), 2) + length('),'), "
        "'ROUND(' AS t"
    )
    # doubled '' escape stays inside the literal
    esc = "SELECT ROUND(len(x || 'it''s (a) test'), 0)"
    assert frag.substitute_round(esc) == (
        "SELECT __pre_round_dist(len(x || 'it''s (a) test'), 0)"
    )
