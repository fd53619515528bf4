"""Oracle version-fragility audit (VERDICT r7 item 3).

The r7 red row (diag_key_skew_profile) and the r5 red (ts_cusum_rate_drift)
shared a signature: local parity PASS + FP-order-perturbation STABLE, yet
driver hash mismatch. Local auditing cannot see DuckDB *version* drift, so
this audit greps every registered oracle for the three hazard classes the
judge identified, then adds two empirical probes:

Pattern classes
  A. decimal literals (e.g. ``1.0``, ``0.5``) participating in arithmetic
     while NOT wrapped in ``CAST(... AS DOUBLE)`` — DuckDB types these
     DECIMAL, and DECIMAL promotion/scale rules for +,*,/ have changed
     across DuckDB versions, while Spark types the same literal DOUBLE.
     A literal adjacent to an already-DOUBLE operand is safe (result is
     DOUBLE either way), so hits need manual adjudication — the audit
     prints the context window for review.
  B. ``quantile_disc`` / ``quantile_cont`` — the discrete-index /
     interpolation rule has varied across DuckDB versions.
  C. bare ``ROUND(x, n)`` on a double expression — both engines agree on
     correctly-rounded decimal output except at representable half
     boundaries (Spark HALF_UP vs DuckDB nearest-even sprintf path) and
     except under implementation drift. Floor-pinned
     ``FLOOR(x*10^n + 0.5)/10^n`` (any scale n, identical on both
     engines) is the documented safe idiom.

Empirical probes (DuckDB at the given sf_dir)
  D. output column type check — any output cell arriving as
     ``decimal.Decimal`` means the oracle's output type is DECIMAL, whose
     scale is version-dependent (and the driver hash would already differ
     locally; expected zero hits while green).
  E. PRE-round boundary-distance probe — the original form of this probe
     scaled the POST-round output by 10^6, which is tautologically far
     from every half (ROUND(x, n<=6) makes x*10^6 an integer up to ulp),
     so it could never see the r5/r7 hazard it was built for. The fixed
     probe substitutes every ``ROUND(`` call with a DuckDB macro that
     emits the PRE-round value's distance to the nearest half at the
     call's own scale, STRING-TAGGED as ``'PRD:<dist>'`` so a raw output
     cell can never collide with (and mask) a distance. Distances land in
     [0, 0.5]; a cell within 1e-8 of zero is a value sitting ON a
     representable half (the dyadic-rational class ts_cusum/ts_holt hit),
     where HALF_UP-vs-nearest-even or engine drift can split. ROUND
     feeding arithmetic/numeric predicates/casts fails to bind under the
     VARCHAR macro and reports "substitution inapplicable" (by-hand
     adjudication); string-comparable predicates shift the surviving row
     set and are noted as reduced coverage.

Usage: python tools/audit_oracle_fragility.py [sf_dir] [name1,name2,...]
Writes a full report to stdout (tee to tools/logs/).
"""

from __future__ import annotations

import decimal
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisky_wine_etl_spark import plans  # noqa: E402
from whisky_wine_etl_spark.parity import duckdb_connection  # noqa: E402

DEC_LIT = re.compile(r"(?<![\w.])(\d+\.\d+|\.\d+)(?![\w.])")
CAST_DOUBLE = re.compile(r"CAST\s*\(\s*(\d+\.\d+|\.\d+)\s+AS\s+DOUBLE\s*\)", re.I)
QUANTILE = re.compile(r"\bquantile_(disc|cont)\b", re.I)
ROUND_RE = re.compile(r"\bROUND\s*\(", re.I)


def decimal_literal_hits(sql: str) -> list[str]:
    """Decimal literals not wrapped in CAST(x AS DOUBLE), with context."""
    safe_spans = [m.span(1) for m in CAST_DOUBLE.finditer(sql)]
    hits = []
    for m in DEC_LIT.finditer(sql):
        if any(a <= m.start() and m.end() <= b for a, b in safe_spans):
            continue
        ctx = sql[max(0, m.start() - 45) : m.end() + 45].replace("\n", " ")
        hits.append(f"{m.group(0)!r} in ...{ctx}...")
    return hits


# Probe-E macro: ROUND(x, n) call sites are rewritten to this, turning
# every rounded output cell into a STRING-TAGGED pre-round
# distance-to-half at the call's own scale ('PRD:<dist>'). The tag
# makes distance cells unmistakable — a raw output cell can never
# collide with one (the earlier numeric encoding silently swallowed a
# genuine on-half distance whenever any raw cell in the column held
# the same float, e.g. a literal 0.0). NULL stays NULL; non-finite /
# overflow-scale inputs report 0.5 ("far from a half") so they never
# false-flag. A ROUND feeding arithmetic or a numeric predicate now
# fails to bind (VARCHAR where DOUBLE expected) → reported
# "substitution inapplicable", the honest outcome for by-hand cases.
PRE_ROUND_DIST_MACRO_NUM = """
CREATE OR REPLACE MACRO __pre_round_dist_num(x, n) AS
  CASE
    WHEN x IS NULL THEN CAST(NULL AS DOUBLE)
    WHEN NOT isfinite(CAST(x AS DOUBLE)) THEN 0.5
    WHEN abs(CAST(x AS DOUBLE)) * pow(10, n) > 4.5e15 THEN 0.5
    ELSE abs(abs(CAST(x AS DOUBLE)) * pow(10, n)
             - floor(abs(CAST(x AS DOUBLE)) * pow(10, n)) - 0.5)
  END
"""

# String-tagged wrapper over the SAME numeric distance (one source of
# truth — the two passes cannot drift apart). NULL propagates through
# the concatenation as NULL.
PRE_ROUND_DIST_MACRO = """
CREATE OR REPLACE MACRO __pre_round_dist(x, n) AS
  'PRD:' || CAST(__pre_round_dist_num(x, n) AS VARCHAR)
"""


def masked_spans(sql: str) -> list[tuple[int, int]]:
    """Spans of SQL text that are NOT code: '...'-string literals
    (with '' escapes) and -- comments (when not inside a string).
    Single source of truth for every scanner in this module — the
    ROUND search, the paren/comma walk, and has_round all use it, so
    they can never disagree about what is inside a literal."""
    spans: list[tuple[int, int]] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            start = i
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
            spans.append((start, min(i + 1, n)))
            i += 1
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":
            start = i
            while i < n and sql[i] != "\n":
                i += 1
            spans.append((start, i))
        else:
            i += 1
    return spans


def _in_spans(pos: int, spans: list[tuple[int, int]]) -> bool:
    return any(a <= pos < b for a, b in spans)


def _round_sites(sql: str) -> list[re.Match]:
    spans = masked_spans(sql)
    return [m for m in ROUND_RE.finditer(sql) if not _in_spans(m.start(), spans)]


AGG_RE = re.compile(
    r"\b(MIN|MAX|SUM|AVG|ANY_VALUE|FIRST|LAST|ARBITRARY|STRING_AGG|"
    r"LIST|ARRAY_AGG|MEDIAN|MODE)\s*\(",
    re.I,
)


def _call_span(sql: str, open_paren_end: int) -> int:
    """End index (exclusive) of the call whose '(' just closed at
    open_paren_end, using the shared masked-span scanner."""
    spans = masked_spans(sql)
    i, depth = open_paren_end, 1
    while i < len(sql) and depth:
        if _in_spans(i, spans):
            i += 1
            continue
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        i += 1
    return i


def probe_e_blind_spots(sql: str) -> list[str]:
    """Sites where the probe-E macro substitution is structurally
    BLIND (ADVICE r8): a ROUND nested inside another ROUND feeds the
    inner call's *distance* (not the true pre-round value) into the
    outer macro, and a ROUND consumed by an aggregate binds the
    VARCHAR-tagged distance so a lexicographic extremum can mask the
    true numeric minimum without any row-count shift. Both must be
    adjudicated by hand, never reported as a clean distance."""
    notes: list[str] = []
    rounds = [(m.start(), _call_span(sql, m.end())) for m in _round_sites(sql)]
    for i, (s1, e1) in enumerate(rounds):
        if any(s2 < s1 < e2 for j, (s2, e2) in enumerate(rounds) if j != i):
            notes.append(
                "nested-ROUND: outer macro sees the inner call's "
                f"distance, not its value — {sql[s1:min(e1, s1 + 60)]!r}"
            )
    spans = masked_spans(sql)
    aggs = [
        (m.start(), _call_span(sql, m.end()))
        for m in AGG_RE.finditer(sql)
        if not _in_spans(m.start(), spans)
    ]
    for s1, e1 in rounds:
        for s2, e2 in aggs:
            if s2 < s1 < e2:
                notes.append(
                    "ROUND inside aggregate: VARCHAR-bound extremum can "
                    "mask the numeric minimum distance — "
                    f"{sql[s2:min(e2, s2 + 60)]!r}"
                )
                break
    return notes


def substitute_round(sql: str, macro: str = "__pre_round_dist") -> str:
    """Rewrite every code-position ROUND(...) call to macro(...),
    arity-aware: 1-arg ROUND(x) (integer rounding) becomes macro(x, 0).
    Nested ROUNDs resolve by re-scanning until none remain (the
    replacement token contains no 'ROUND'). Operates on RAW SQL: the
    shared masked_spans scanner skips string literals AND -- comments,
    so quoted '(' ')' ',' never miscount depth and commented-out
    ROUNDs are never rewritten — no lossy comment-stripping needed."""
    while True:
        sites = _round_sites(sql)
        if not sites:
            return sql
        m = sites[0]
        spans = masked_spans(sql)
        i, depth, comma_at_depth1 = m.end(), 1, False
        while i < len(sql) and depth:
            if _in_spans(i, spans):
                i += 1
                continue
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                comma_at_depth1 = True
            i += 1
        inner = sql[m.end() : i - 1]
        if not comma_at_depth1:
            inner += ", 0"
        sql = sql[: m.start()] + macro + "(" + inner + ")" + sql[i:]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    plans.load_all()
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else sorted(plans.ORACLES)
    )
    con = duckdb_connection(sf_dir)
    con.execute(PRE_ROUND_DIST_MACRO_NUM)
    con.execute(PRE_ROUND_DIST_MACRO)

    n_dec = n_q = n_round = n_decout = n_near = 0
    for name in names:
        if name not in plans.ORACLES:
            print(f"{name:40s} SKIP (rows-only carve-out, no oracle)")
            continue
        raw = plans.ORACLES[name]
        # strip -- comments so documentation lines can't false-positive
        sql = re.sub(r"--[^\n]*", "", raw)
        lines: list[str] = []

        dec_hits = decimal_literal_hits(sql)
        if dec_hits:
            n_dec += 1
            for h in dec_hits:
                lines.append(f"  [A decimal-literal] {h}")
        if QUANTILE.search(sql):
            n_q += 1
            lines.append("  [B quantile builtin] quantile_disc/cont present")
        round_sites = _round_sites(raw)
        has_round = bool(round_sites)
        if has_round:
            n_round += 1
            lines.append(f"  [C bare-ROUND] {len(round_sites)} site(s)")

        # empirical probes (run the RAW sql — stripping would corrupt a
        # hypothetical '--' inside a string literal)
        try:
            rows = con.execute(raw).fetchall()
        except Exception as exc:  # pragma: no cover - audit robustness
            lines.append(f"  [!] oracle failed to run: {exc}")
            rows = []
        dec_cols = any(
            isinstance(v, decimal.Decimal) for r in rows for v in r
        )
        if dec_cols:
            n_decout += 1
            lines.append("  [D DECIMAL-typed output] Decimal cell in result")
        blind = probe_e_blind_spots(raw) if has_round else []
        if blind:
            # ADVICE r8: these structures make any reported distance
            # untrustworthy (inner-distance feeding, VARCHAR extremum
            # masking) — route straight to by-hand adjudication
            for b in blind:
                lines.append(f"  [E pre-round distance] BLIND SPOT — {b}")
            lines.append(
                "  [E pre-round distance] substitution structurally "
                "blind here — adjudicate by hand"
            )
        if has_round and not blind:
            worst = None
            precise = True
            note = None
            # pass 1 — precise string-tagged distances (collision-proof)
            try:
                pre_rows = con.execute(substitute_round(raw)).fetchall()
            except Exception:
                pre_rows = None
            if pre_rows is not None:
                if len(pre_rows) != len(rows):
                    note = (
                        "  [E pre-round distance] ROUND feeds a string-"
                        "comparable predicate — row set shifted, distances "
                        "cover the surviving rows only"
                    )
                for r in pre_rows:
                    for v in r:
                        if isinstance(v, str) and v.startswith("PRD:"):
                            try:
                                d = float(v[4:])
                            except ValueError:
                                continue
                            if worst is None or d < worst:
                                worst = d
            if worst is None:
                # pass 2 — numeric fallback where the VARCHAR tag cannot
                # bind (ROUND feeds arithmetic/predicate/cast): same
                # distance as a DOUBLE, identified by per-column multiset
                # difference vs the raw run. Conservative: a distance
                # colliding with a raw cell value is swallowed.
                precise = False
                try:
                    num_rows = con.execute(
                        substitute_round(raw, macro="__pre_round_dist_num")
                    ).fetchall()
                except Exception:
                    num_rows = None
                if (
                    num_rows is not None
                    and len(num_rows) == len(rows)
                    and num_rows
                ):
                    from collections import Counter

                    ncols = len(num_rows[0])
                    for i in range(ncols):
                        raw_left = Counter(repr(r[i]) for r in rows)
                        for r in num_rows:
                            v = r[i]
                            if raw_left[repr(v)] > 0:
                                raw_left[repr(v)] -= 1
                                continue
                            if (
                                isinstance(v, float)
                                and math.isfinite(v)
                                and 0.0 <= v <= 0.5
                            ):
                                if worst is None or v < worst:
                                    worst = v
                elif num_rows is None:
                    if pre_rows is None:
                        note = (
                            "  [E pre-round distance] substitution "
                            "inapplicable in both passes (ROUND feeds a "
                            "context neither macro binds) — adjudicate "
                            "by hand"
                        )
                    elif note is None:
                        note = (
                            "  [E pre-round distance] no tagged distance "
                            "surfaced and the numeric fallback does not "
                            "bind — adjudicate by hand"
                        )
                elif note is None and len(num_rows) != len(rows):
                    note = (
                        "  [E pre-round distance] numeric fallback row set "
                        "shifted (ROUND feeds a predicate) — adjudicate "
                        "the threshold by hand"
                    )
            if note:
                lines.append(note)
            if worst is not None:
                tag = "ON-HALF" if worst < 1e-8 else "ok"
                if worst < 1e-8:
                    n_near += 1
                kind = "precise" if precise else "fallback-conservative"
                lines.append(
                    f"  [E pre-round distance] min dist-to-half = "
                    f"{worst:.3e} ({kind}) -> {tag}"
                )
            elif note is None:
                lines.append(
                    "  [E pre-round distance] no distance surfaced "
                    "(rounded value consumed before the output — "
                    "adjudicate by hand)"
                )

        status = "CLEAN" if not lines else "REVIEW"
        print(f"{name:40s} {status}")
        for ln in lines:
            print(ln)

    print(
        f"\nSUMMARY over {len(names)} oracles: "
        f"decimal-literal={n_dec} quantile={n_q} bare-ROUND={n_round} "
        f"decimal-output={n_decout} pre-round-on-half={n_near}"
    )


if __name__ == "__main__":
    main()
