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
     ``FLOOR(x*1000000 + 0.5)/1000000`` is the documented safe idiom.

Empirical probes (DuckDB at the given sf_dir)
  D. output column type check — any output cell arriving as
     ``decimal.Decimal`` means the oracle's output type is DECIMAL, whose
     scale is version-dependent (and the driver hash would already differ
     locally; expected zero hits while green).
  E. boundary-distance probe — for every float output cell x of a
     ROUND-using oracle, the distance of ``x * 10^6`` to the nearest
     half-integer; a cell within 1e-3 of a half sits where engine rounding
     disciplines can split. (10^6 because the repo rounds outputs to 6 dp;
     coarser roundings only move cells FURTHER from 6-dp halves.)

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
FLOOR_PIN = re.compile(r"FLOOR\s*\([^()]*\*\s*1000000(\.0)?\s*\+", re.I)


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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    plans.load_all()
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else sorted(plans.ORACLES)
    )
    con = duckdb_connection(sf_dir)

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
        has_round = bool(ROUND_RE.search(sql))
        if has_round and not FLOOR_PIN.search(sql):
            n_round += 1
            lines.append(f"  [C bare-ROUND] {len(ROUND_RE.findall(sql))} site(s)")

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
        if has_round:
            worst = None
            for r in rows:
                for v in r:
                    if isinstance(v, float) and math.isfinite(v):
                        scaled = abs(v) * 1e6
                        if scaled > 2**52:  # beyond ulp resolution
                            continue
                        frac = scaled - math.floor(scaled)
                        d = abs(frac - 0.5)
                        if worst is None or d < worst:
                            worst = d
            if worst is not None:
                tag = "NEAR-HALF" if worst < 1e-3 else "ok"
                if worst < 1e-3:
                    n_near += 1
                lines.append(
                    f"  [E boundary-distance] min |frac(x*1e6)-0.5| = "
                    f"{worst:.6f} -> {tag}"
                )

        status = "CLEAN" if not lines else "REVIEW"
        print(f"{name:40s} {status}")
        for ln in lines:
            print(ln)

    print(
        f"\nSUMMARY over {len(names)} oracles: "
        f"decimal-literal={n_dec} quantile={n_q} bare-ROUND={n_round} "
        f"decimal-output={n_decout} near-half={n_near}"
    )


if __name__ == "__main__":
    main()
