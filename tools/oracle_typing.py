"""Static class-A oracle gate: integer-context DECIMAL-literal arithmetic.

Both driver reds ever (r5 ts_cusum, r7 diag_key_skew) and the 35
migrations that followed share ONE mechanism: a bare decimal literal
(``1.0``, ``0.5``) typed DECIMAL by DuckDB meets integer
columns/aggregates, the whole expression stays DECIMAL until some
version-dependent promotion point (division scale, CASE unification,
AVG output typing), and a DuckDB upgrade shifts the rounded output
while Spark — which types the same literal DOUBLE — stands still.

The regex audit (tools/audit_oracle_fragility.py, class A) reports
every decimal literal near arithmetic and leaves adjudication to a
human. This module is the *decidable* core of that rule as a hard
test gate: it parses each oracle with DuckDB's own parser
(``json_serialize_sql``) and flags a decimal literal ONLY when every
arithmetic neighbor provably types INTEGER — the exact red-row shape
— so the gate needs no judgement calls and can run in every pytest.

Type inference is deliberately three-valued-conservative:

- category(expr) ∈ {DOUBLE, INTEGER, DECIMAL, UNKNOWN}
- base-table column types come from the caller (derived live from the
  testdata parquet footers); CTE/derived-table aliases resolve through
  a whole-statement alias map, so ``ra.na → SUM(n) → COUNT(*)`` chains
  ground out correctly
- anything unresolvable is UNKNOWN, and UNKNOWN never flags — the
  gate prefers a missed borderline (the regex audit still surfaces
  those for by-hand review) over a false red build

Two rules:

R1  decimal constant as an operand of + - * / % where the OTHER
    operands unify to INTEGER  → the r7-red form itself.
R2  SUM()/AVG() (incl. windowed) over an expression that types
    DECIMAL → pure-decimal accumulation (the CASE-branch-literal
    form); its output scale/type is engine-version territory.

Callers pass an allowlist of adjudicated exceptions; see
tests/test_oracle_discipline.py for the (currently empty) list.
"""

from __future__ import annotations

import json
from collections import defaultdict

import duckdb

# Function categories model DUCKDB typing (the oracle engine), not
# Spark's: sign() is TINYINT here but DOUBLE in Spark, etc.
_DOUBLE_FNS = {
    "exp", "ln", "log", "log2", "log10", "sqrt", "cbrt", "pow", "power",
    "sin", "cos", "tan", "asin", "acos", "atan", "atan2", "radians",
    "degrees", "pi", "avg", "mean", "stddev", "stddev_pop", "stddev_samp",
    "var_pop", "var_samp", "variance", "corr", "covar_pop", "covar_samp",
    "epoch", "random", "setseed",
}
_INT_FNS = {
    "count", "count_star", "row_number", "rank", "dense_rank", "ntile",
    "sign", "length", "strlen", "len", "hash", "ascii", "unicode",
    "strpos", "instr", "bit_count", "epoch_us", "epoch_ms", "epoch_ns",
    "year", "month", "day", "hour", "minute", "second", "dayofweek",
    "dayofyear", "week", "quarter", "date_diff", "datediff", "date_part",
    "datepart", "levenshtein", "editdist3", "hamming", "jaro_similarity",
}
# result type = unification of the children's types
_PASSTHRU_FNS = {
    "sum", "min", "max", "any_value", "first", "last", "arbitrary",
    "coalesce", "ifnull", "nullif", "least", "greatest", "abs", "floor",
    "ceil", "ceiling", "round", "trunc", "mod", "lead", "lag",
    "first_value", "last_value", "nth_value", "median", "@",
}
_INT_TYPE_IDS = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT",
}
_ARITH_OPS = {"+", "-", "*", "/", "%"}


def _type_id_category(type_obj) -> str:
    tid = (type_obj or {}).get("id", "")
    if tid in ("DOUBLE", "FLOAT"):
        return "DOUBLE"
    if tid == "DECIMAL":
        return "DECIMAL"
    if tid in _INT_TYPE_IDS:
        return "INTEGER"
    return "UNKNOWN"


def _unify(cats: list[str]) -> str:
    """DuckDB-style numeric unification, conservatively: any DOUBLE
    wins; an UNKNOWN poisons (it *could* be DOUBLE); else DECIMAL
    dominates INTEGER; all-INTEGER stays INTEGER."""
    if not cats:
        return "UNKNOWN"
    if "DOUBLE" in cats:
        return "DOUBLE"
    if "UNKNOWN" in cats or "OTHER" in cats:
        return "UNKNOWN"
    if "DECIMAL" in cats:
        return "DECIMAL"
    return "INTEGER"


def _collect_select_nodes(obj, out: list) -> None:
    if isinstance(obj, dict):
        if obj.get("type") == "SELECT_NODE":
            out.append(obj)
        for v in obj.values():
            _collect_select_nodes(v, out)
    elif isinstance(obj, list):
        for v in obj:
            _collect_select_nodes(v, out)


class _Scope:
    """Whole-statement alias environment: alias -> candidate
    expression nodes from every SELECT node in the statement, plus the
    base-table column categories. Scope-free by design: candidates
    from different CTEs that disagree in category resolve UNKNOWN."""

    def __init__(self, ast: dict, base_columns: dict[str, str]):
        self.base = base_columns
        self.aliases: dict[str, list] = defaultdict(list)
        # memo for _category keyed by (expression-node identity,
        # alias stack): the function is pure in (node, scope, stack),
        # and without the memo an alias chain whose every COLUMN_REF
        # re-resolves all candidate expressions recursively is
        # EXPONENTIAL in chain depth — one r13-profiled oracle made
        # tests/test_oracle_discipline.py run for tens of minutes.
        # Same results, linear time (r13; VERDICT r12 item 2).
        self.memo: dict[tuple[int, frozenset[str]], str] = {}
        nodes: list = []
        _collect_select_nodes(ast, nodes)
        for node in nodes:
            for item in node.get("select_list", []):
                alias = item.get("alias") or ""
                if not alias and item.get("class") == "COLUMN_REF":
                    names = item.get("column_names") or []
                    alias = names[-1] if names else ""
                if alias:
                    self.aliases[alias].append(item)


def _category(node, scope: _Scope, stack: frozenset[str]) -> str:
    if not isinstance(node, dict):
        return "UNKNOWN"
    key = (id(node), stack)
    hit = scope.memo.get(key)
    if hit is not None:
        return hit
    out = _category_uncached(node, scope, stack)
    scope.memo[key] = out
    return out


def _category_uncached(node, scope: _Scope, stack: frozenset[str]) -> str:
    cls = node.get("class")

    if cls == "CONSTANT":
        return _type_id_category((node.get("value") or {}).get("type"))

    if cls == "CAST":
        return _type_id_category(node.get("cast_type"))

    if cls == "COLUMN_REF":
        names = node.get("column_names") or []
        if not names:
            return "UNKNOWN"
        name = names[-1]
        if name in stack:  # self-referential alias chain
            return "UNKNOWN"
        cats = set()
        if name in scope.base:
            cats.add(scope.base[name])
        for cand in scope.aliases.get(name, []):
            # skip the trivial self-mapping a bare COLUMN_REF creates
            if cand is node:
                continue
            if (
                cand.get("class") == "COLUMN_REF"
                and (cand.get("column_names") or [])[-1:] == [name]
                and name not in scope.base
            ):
                continue
            cats.add(_category(cand, scope, stack | {name}))
        # conservative: any disagreement (or any UNKNOWN candidate)
        # makes the reference unresolvable — UNKNOWN never flags
        if len(cats) == 1:
            return next(iter(cats))
        return "UNKNOWN"

    if cls == "CASE":
        branches = [c.get("then_expr") for c in node.get("case_checks", [])]
        branches.append(node.get("else_expr"))
        return _unify([_category(b, scope, stack) for b in branches if b])

    if cls == "SUBQUERY":
        sub = ((node.get("subquery") or {}).get("node")) or {}
        sel = sub.get("select_list") or []
        if len(sel) == 1:
            return _category(sel[0], scope, stack)
        return "UNKNOWN"

    if cls in ("FUNCTION", "WINDOW"):
        name = (node.get("function_name") or "").lower()
        children = node.get("children") or []
        child_cats = [_category(c, scope, stack) for c in children]
        if name in _ARITH_OPS:
            if name == "-" and len(children) == 1:  # unary minus
                return child_cats[0]
            if name == "/":
                # decimal/integer division typing is exactly the
                # version-varying rule — only a DOUBLE operand makes
                # the result type certain
                return "DOUBLE" if "DOUBLE" in child_cats else "UNKNOWN"
            return _unify(child_cats)
        if name in _DOUBLE_FNS:
            return "DOUBLE"
        if name in _INT_FNS:
            return "INTEGER"
        if node.get("type") == "WINDOW_ROW_NUMBER" or name in (
            "row_number", "rank", "dense_rank", "ntile",
        ):
            return "INTEGER"
        if name in _PASSTHRU_FNS:
            return _unify(child_cats) if child_cats else "UNKNOWN"
        return "UNKNOWN"

    return "UNKNOWN"


def _is_decimal_constant(node) -> bool:
    if not isinstance(node, dict):
        return False
    if node.get("class") == "CONSTANT":
        return (
            _type_id_category((node.get("value") or {}).get("type")) == "DECIMAL"
        )
    # unary minus over a decimal constant (-0.5)
    if (
        node.get("class") == "FUNCTION"
        and node.get("function_name") == "-"
        and len(node.get("children") or []) == 1
    ):
        return _is_decimal_constant(node["children"][0])
    return False


def _walk_exprs(obj, scope: _Scope, sql: str, hits: list[str]) -> None:
    if isinstance(obj, dict):
        cls = obj.get("class")
        name = (obj.get("function_name") or "").lower()
        children = obj.get("children") or []
        if cls in ("FUNCTION", "WINDOW"):
            if name in _ARITH_OPS and len(children) >= 2:
                for i, ch in enumerate(children):
                    if not _is_decimal_constant(ch):
                        continue
                    others = [
                        _category(c, scope, frozenset())
                        for j, c in enumerate(children)
                        if j != i
                    ]
                    if _unify(others) == "INTEGER":
                        hits.append(
                            "R1 integer-context decimal literal: "
                            f"{_ctx(sql, obj)}"
                        )
            if name in ("sum", "avg") and len(children) == 1:
                if _category(children[0], scope, frozenset()) == "DECIMAL":
                    hits.append(
                        f"R2 {name.upper()} over DECIMAL-typed expression: "
                        f"{_ctx(sql, obj)}"
                    )
        for v in obj.values():
            _walk_exprs(v, scope, sql, hits)
    elif isinstance(obj, list):
        for v in obj:
            _walk_exprs(v, scope, sql, hits)


def _ctx(sql: str, node) -> str:
    loc = node.get("query_location")
    if not isinstance(loc, int) or loc < 0 or loc > len(sql):
        return "<no location>"
    return "..." + " ".join(sql[max(0, loc - 40) : loc + 60].split()) + "..."


def base_column_categories(sf_dir: str, tables: list[str]) -> dict[str, str]:
    """Column-name -> category map derived from the live parquet
    footers; a name appearing with conflicting categories across
    tables maps UNKNOWN."""
    con = duckdb.connect()
    cats: dict[str, set] = defaultdict(set)
    for t in tables:
        rows = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        ).fetchall()
        for name, typ, *_ in rows:
            if typ in ("DOUBLE", "FLOAT"):
                cats[name].add("DOUBLE")
            elif typ in _INT_TYPE_IDS:
                cats[name].add("INTEGER")
            elif typ.startswith("DECIMAL"):
                cats[name].add("DECIMAL")
            else:
                cats[name].add("OTHER")
    con.close()
    return {
        n: next(iter(s)) if len(s) == 1 else "UNKNOWN" for n, s in cats.items()
    }


def _collect_modifier_nodes(obj, out: list) -> None:
    if isinstance(obj, dict):
        if "modifiers" in obj and isinstance(obj["modifiers"], list):
            out.append(obj)
        for v in obj.values():
            _collect_modifier_nodes(v, out)
    elif isinstance(obj, list):
        for v in obj:
            _collect_modifier_nodes(v, out)


def limit_without_order(sql: str) -> list[str]:
    """SELECT nodes (anywhere — CTEs, subqueries) carrying a LIMIT
    modifier without an ORDER modifier on the SAME node. An unordered
    LIMIT's row set is engine- and thread-count-dependent — a red-row
    source no value discipline can fix. Returns one description per
    offending node."""
    con = duckdb.connect()
    try:
        escaped = sql.replace("'", "''")
        raw = con.execute(f"SELECT json_serialize_sql('{escaped}')").fetchone()[0]
    finally:
        con.close()
    ast = json.loads(raw)
    if ast.get("error"):
        raise ValueError(f"unparseable oracle: {ast.get('error_message')}")
    nodes: list = []
    _collect_modifier_nodes(ast.get("statements", []), nodes)
    hits: list[str] = []
    for node in nodes:
        kinds = {m.get("type") for m in node["modifiers"]}
        if "LIMIT_MODIFIER" in kinds and "ORDER_MODIFIER" not in kinds:
            sel = ", ".join(
                (it.get("alias") or str(it.get("column_names", it.get("class"))))
                for it in (node.get("select_list") or [])[:4]
            )
            hits.append(f"LIMIT without ORDER BY on node selecting [{sel}]")
    return hits


def class_a_hits(sql: str, base_columns: dict[str, str]) -> list[str]:
    """Every provable integer-context decimal-literal site in the
    oracle (R1) plus every pure-DECIMAL SUM/AVG accumulation (R2).
    Empty list == the oracle cannot hit the r5/r7 red mechanism
    through any typing rule this gate models. Raises ValueError if
    DuckDB cannot parse the statement (an oracle that doesn't parse
    would fail parity anyway)."""
    con = duckdb.connect()
    try:
        escaped = sql.replace("'", "''")
        raw = con.execute(f"SELECT json_serialize_sql('{escaped}')").fetchone()[0]
    finally:
        con.close()
    ast = json.loads(raw)
    if ast.get("error"):
        raise ValueError(f"unparseable oracle: {ast.get('error_message')}")
    scope = _Scope(ast, base_columns)
    hits: list[str] = []
    _walk_exprs(ast.get("statements", []), scope, sql, hits)
    return hits
