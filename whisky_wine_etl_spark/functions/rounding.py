"""The repo-wide pinned-rounding discipline, single-sourced.

``pinned(col, n)`` emits ``floor(x·10^n + 0.5)/10^n`` — the same three
IEEE operations DuckDB evaluates for
``FLOOR(x * 10^n + 0.5) / 10^n`` — so identical input doubles produce
identical output doubles on both engines by construction. This is
rule 3 of tools/logs/r8_oracle_fragility_audit.md: use it (instead of
F.round / SQL ROUND) whenever the pre-round value can sit ON a
rounding half — small-denominator rational ratios (p/2^k token stats,
means of integer lengths), cent-grid sums, recursive-fold inputs —
because Spark (BigDecimal HALF_UP on the shortest decimal repr) and
DuckDB (binary-value rounding) demonstrably split there:
round(1.005, 2) = 1.01 on Spark vs 1.00 on DuckDB.

Oracle twin: write ``FLOOR(x * 10^n + 0.5) / 10^n`` with an INTEGER
scale literal (DOUBLE*INT → DOUBLE in every DuckDB version; the 0.5 is
safe adjacent to the DOUBLE product). Keep the operation ORDER
identical on both sides — divide-then-pin is not pin-then-divide.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pinned(col: Column, ndigits: int) -> Column:
    """floor(x·10^n + 0.5)/10^n as a DOUBLE — engine-pinned rounding."""
    scale = F.lit(float(10**ndigits))
    return F.floor(col * scale + F.lit(0.5)) / scale
