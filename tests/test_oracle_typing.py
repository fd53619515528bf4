"""Unit coverage for tools/oracle_typing.py — the AST-typed class-A
gate. The corpus-level assertion lives in test_oracle_discipline; this
file pins the scanner's behavior on the canonical bad/good forms so a
refactor can't silently weaken the gate."""

from __future__ import annotations

import importlib.util
import pathlib

import pytest

_spec = importlib.util.spec_from_file_location(
    "oracle_typing",
    str(pathlib.Path(__file__).resolve().parents[1] / "tools" / "oracle_typing.py"),
)
ot = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ot)

# Static schema stand-in (mirrors the real testdata categories; the
# corpus test derives the live one from parquet footers)
BASE = {
    "o_totalprice": "DOUBLE",
    "o_orderstatus": "OTHER",
    "l_quantity": "DOUBLE",
    "user_id": "INTEGER",
    "n_chars": "INTEGER",
}

BAD = {
    # the r7 red itself: BIGINT * 1.0 * BIGINT / BIGINT through a CTE chain
    "cte_chain": """
        WITH c AS (SELECT o_orderstatus a, COUNT(*) n FROM orders GROUP BY 1),
        ra AS (SELECT a, SUM(n) na FROM c GROUP BY a),
        t AS (SELECT SUM(n) total FROM c)
        SELECT SUM(POWER(c.n - ra.na * 1.0 * c.n / t.total, 2)) x
        FROM c JOIN ra USING (a) CROSS JOIN t""",
    # the r5-adjacent (COUNT + 1.0)/COUNT bridge
    "count_bridge": "SELECT (COUNT(*) + 1.0) / COUNT(*) FROM orders",
    # CASE-branch decimal accumulation (the borderline class, R2)
    "case_sum": (
        "SELECT SUM(CASE WHEN o_orderstatus='F' THEN 1.0 ELSE 0.0 END) "
        "FROM orders"
    ),
    # DuckDB types sign() TINYINT -> SUM(sign) HUGEINT -> -1.0 DECIMAL
    "sign_sum": (
        "SELECT SUM(sgn) - 1.0 FROM "
        "(SELECT sign(o_totalprice) sgn FROM orders) t"
    ),
    # window count in integer context
    "window_count": (
        "SELECT (COUNT(*) OVER (PARTITION BY user_id) - 1) / 2.0 FROM events"
    ),
    # integer base column from the schema map
    "base_int_col": "SELECT n_chars * 0.5 FROM documents",
    # unary minus over a decimal literal still counts as one
    "unary_minus": "SELECT COUNT(*) * -0.5 FROM orders",
}

GOOD = {
    # the sanctioned idiom
    "cast_bridge": "SELECT CAST(COUNT(*) AS DOUBLE) / COUNT(*) FROM orders",
    # literal adjacent to a DOUBLE column
    "double_col": "SELECT o_totalprice * 0.5 FROM orders",
    # literal adjacent to a DOUBLE-returning function
    "exp_adjacent": "SELECT 1.0 / (1.0 + exp(-o_totalprice)) FROM orders",
    # integer counting + cast, the migrated kendall form
    "int_count_cast": (
        "SELECT CAST(nc - nd AS DOUBLE) / sqrt(CAST(nc + nd AS DOUBLE)) "
        "FROM (SELECT SUM(CASE WHEN user_id > 0 THEN 1 ELSE 0 END) nc, "
        "COUNT(*) nd FROM events) t"
    ),
    # AVG over an explicitly DOUBLE-cast CASE
    "avg_double_case": (
        "SELECT AVG(CAST(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END "
        "AS DOUBLE)) FROM orders"
    ),
    # decimal literal in a CASE unified by a DOUBLE branch
    "case_double_branch": (
        "SELECT SUM(CASE WHEN user_id = 1 THEN CAST(1 AS DOUBLE) "
        "WHEN user_id = 2 THEN 0.5 ELSE 0.2 / CAST(user_id - 2 AS DOUBLE) "
        "END) FROM events"
    ),
    # UNKNOWN neighbors never flag (conservative three-valued rule)
    "unknown_neighbor": "SELECT some_udf(user_id) * 1.5 FROM events",
}


@pytest.mark.parametrize("name", sorted(BAD))
def test_flags_known_bad_forms(name):
    assert ot.class_a_hits(BAD[name], BASE), name


@pytest.mark.parametrize("name", sorted(GOOD))
def test_passes_known_good_forms(name):
    assert ot.class_a_hits(GOOD[name], BASE) == [], name


def test_limit_without_order_detection():
    assert ot.limit_without_order("SELECT a FROM t LIMIT 5")
    assert ot.limit_without_order("SELECT a FROM t ORDER BY a LIMIT 5") == []
    # nested: an inner unordered LIMIT is just as nondeterministic
    assert ot.limit_without_order(
        "SELECT * FROM (SELECT a FROM t LIMIT 3) s ORDER BY a"
    )
    assert ot.limit_without_order(
        "WITH c AS (SELECT a FROM t ORDER BY a LIMIT 3) SELECT * FROM c"
    ) == []


def test_unparseable_oracle_raises():
    with pytest.raises(ValueError):
        ot.class_a_hits("SELEC nonsense FRM", BASE)


def test_base_column_categories_live():
    from whisky_wine_etl_spark.catalog import TABLES

    base = ot.base_column_categories("/root/testdata/sf0.001", list(TABLES))
    assert base["o_totalprice"] == "DOUBLE"
    assert base["user_id"] == "INTEGER"
    assert base["o_orderstatus"] == "OTHER"
