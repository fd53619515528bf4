"""Round-4ay: Holt's linear smoothing and the Mann-Kendall trend test.

Registered AFTER round4ax so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.

- ``ts_holt_linear`` is the level+trend extension of ts_ewma_user.
  EWMA unrolls to a closed-form prefix sum; Holt's coupled 2-state
  recursion does not (the transition matrix has a repeated
  eigenvalue), so this is the canonical "per-key logic outgrows
  window algebra" case: the engine runs a per-key sequential fold in
  one secondary-sorted mapInPandas pass, and the oracle runs the IDENTICAL
  recursion as a DuckDB recursive CTE — an exact cross-engine pin of
  a genuinely sequential computation.
- ``stat_mann_kendall`` is the significance test that pairs with
  stat_theil_sen_daily's slope estimate: S statistic, tie-corrected
  variance, and the continuity-corrected z-score over the daily
  revenue series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.functions.rounding import pinned
from whisky_wine_etl_spark.plans.registry import query

_ALPHA, _BETA = 0.5, 0.3


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "ts_holt_linear",
    f"""
WITH RECURSIVE s0 AS (
  -- pinned input rounding (r8 audit rule 3): the daily sum feeds a
  -- 64-step recursion, so a single half-boundary round-rule split
  -- would diverge the whole fold — same floor discipline as the
  -- outputs below
  SELECT user_id, CAST(ts AS DATE) AS day,
         FLOOR(SUM(value) * 1000000 + 0.5) / 1000000 AS v
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
s AS (
  SELECT user_id, v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS i
  FROM s0 QUALIFY i <= 64
),
hw(user_id, i, v, l, b) AS (
  SELECT user_id, i, v, v, CAST(0 AS DOUBLE) FROM s WHERE i = 1
  UNION ALL
  SELECT s.user_id, s.i, s.v,
         CAST({_ALPHA} AS DOUBLE) * s.v
           + CAST({1 - _ALPHA} AS DOUBLE) * (hw.l + hw.b),
         CAST({_BETA} AS DOUBLE)
           * ((CAST({_ALPHA} AS DOUBLE) * s.v
               + CAST({1 - _ALPHA} AS DOUBLE) * (hw.l + hw.b)) - hw.l)
           + CAST({1 - _BETA} AS DOUBLE) * hw.b
  FROM hw JOIN s ON s.user_id = hw.user_id AND s.i = hw.i + 1
)
SELECT user_id, CAST(i AS BIGINT) AS i,
       FLOOR(l * 1000000 + 0.5) / 1000000 AS level,
       FLOOR(b * 1000000 + 0.5) / 1000000 AS trend,
       FLOOR((l + b) * 1000000 + 0.5) / 1000000 AS forecast_next
FROM hw
""",
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing, α=0.5 β=0.3,
    over each user's daily value series (first 64 days):
    l_t = α·v_t + (1−α)(l_{t−1}+b_{t−1});
    b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}; l_1 = v_1, b_1 = 0.

    Unlike EWMA (ts_ewma_user) this 2-state recursion has no
    prefix-sum closed form, so the engine runs it as a per-key
    sequential fold: ONE mapInPandas pass over (user_id, i)-sorted
    partitions, folding every user in an Arrow batch in one Python
    call (one Arrow round-trip per ~10k rows, not per group — see
    fold_stream) — O(1) state per key, keys spread across executors,
    no cross-key coordination (at 100 TB the per-key series length is
    the calendar, not the data size). The
    day-grain input is rounded to 6 dp BEFORE the recursion so both
    engines fold bit-identical doubles (the daily SUM's addition
    order is the only engine difference); every +/× in the fold then
    matches the oracle's recursive-CTE arithmetic exactly."""
    e = _t(spark, sf_dir, "events")
    s0 = (
        e.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(pinned(F.sum("value"), 6).alias("v"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    s = (
        s0.select("user_id", "v", F.row_number().over(w).alias("i"))
        .filter(F.col("i") <= 64)
    )

    def _fold_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        """Fold EVERY complete user group in pdf (sorted by user_id, i).
        Arithmetic is identical to the original per-group form — the
        recursion runs per user on that user's values only."""

        def r6(x: np.ndarray) -> np.ndarray:
            # floor(x·1e6 + 0.5)/1e6 on BOTH engines: the fold's
            # half-exact decimals sit ON 7th-dp rounding boundaries,
            # where np.round (half-even), Spark (HALF_UP on the exact
            # binary expansion) and DuckDB (half-away after a 1e6
            # scale) all disagree — this formula is the same three
            # IEEE ops everywhere, so identical inputs stay identical.
            return np.floor(x * 1e6 + 0.5) / 1e6

        uids = pdf["user_id"].to_numpy()
        vs = pdf["v"].to_numpy(dtype=np.float64)
        ls = np.empty(len(vs))
        bs = np.empty(len(vs))
        # group boundaries in the (user_id, i)-sorted frame
        starts = np.flatnonzero(np.r_[True, uids[1:] != uids[:-1]])
        ends = np.r_[starts[1:], len(uids)]
        for s0_, e0_ in zip(starts, ends):
            v = vs[s0_:e0_]
            l, b = v[0], 0.0
            ls[s0_], bs[s0_] = l, b
            for t in range(1, len(v)):
                l_new = _ALPHA * v[t] + (1 - _ALPHA) * (l + b)
                b = _BETA * (l_new - l) + (1 - _BETA) * b
                l = l_new
                ls[s0_ + t], bs[s0_ + t] = l, b
        return pd.DataFrame(
            {
                "user_id": uids,
                "i": pdf["i"].to_numpy(dtype=np.int64),
                "level": r6(ls),
                "trend": r6(bs),
                "forecast_next": r6(ls + bs),
            }
        )

    def fold_stream(batches):
        # mapInPandas, NOT groupBy().applyInPandas: one Python/Arrow
        # round-trip per ~10k-row batch instead of one PER GROUP
        # (measured ~1.7 ms/group × 1500 groups ≈ the whole fold cost
        # at sf0.1; round-5 rewrite, same pattern as
        # ts_next_higher_value's secondary-sort monotone stack). Rows
        # arrive partition-local in (user_id, i) order; a user's rows
        # can straddle Arrow batch boundaries, so the trailing
        # (possibly incomplete) user is CARRIED into the next batch
        # and folded once its group is complete.
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_uid = pdf["user_id"].iloc[-1]
            tail_mask = (pdf["user_id"] == last_uid).to_numpy()
            carry = pdf[tail_mask]
            head = pdf[~tail_mask]
            if len(head):
                yield _fold_frame(head)
        if carry is not None and len(carry):
            yield _fold_frame(carry)

    return (
        s.repartition("user_id")
        .sortWithinPartitions("user_id", "i")
        .mapInPandas(
            fold_stream,
            schema="user_id long, i long, level double, trend double, "
            "forecast_next double",
        )
    )


@query(
    "stat_mann_kendall",
    """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         ROUND(SUM(o_totalprice), 6) AS revenue
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
p AS (
  SELECT SIGN(b.revenue - a.revenue) AS sgn
  FROM d a JOIN d b ON a.day < b.day
),
sstat AS (SELECT SUM(sgn) AS s, COUNT(*) AS np FROM p),
n_ AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d),
ties AS (
  SELECT COALESCE(SUM(t * (t - 1.0) * (2.0 * t + 5.0)), 0.0) AS tie_term
  FROM (
    SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM d GROUP BY revenue
    HAVING COUNT(*) > 1
  ) g
)
SELECT CAST(s.s AS BIGINT) AS s_stat,
       ROUND((n_.n * (n_.n - 1.0) * (2.0 * n_.n + 5.0) - ties.tie_term)
             / 18.0, 6) AS var_s,
       ROUND(CASE
         WHEN s.s > 0 THEN (CAST(s.s AS DOUBLE) - 1)
           / sqrt((n_.n * (n_.n - 1.0) * (2.0 * n_.n + 5.0) - ties.tie_term)
                  / 18.0)
         WHEN s.s < 0 THEN (CAST(s.s AS DOUBLE) + 1)
           / sqrt((n_.n * (n_.n - 1.0) * (2.0 * n_.n + 5.0) - ties.tie_term)
                  / 18.0)
         ELSE CAST(0 AS DOUBLE) END, 6) AS z_score
FROM sstat s, n_, ties
""",
)
def stat_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on daily revenue: S = Σ_{i<j}
    sign(x_j − x_i), tie-corrected variance
    (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18, continuity-corrected z.

    The companion significance test to stat_theil_sen_daily's slope:
    same scale shape — one data-sized groupBy collapses to the
    calendar grain, then the O(days²) pair join runs on a
    SF-independent frame (~2.4k rows → ~3M pairs). Daily sums are
    rounded before the sign comparison so tie detection agrees
    across engines. The three scalar frames (S, n, tie term) meet in
    broadcast cross joins — no driver-side math."""
    o = _t(spark, sf_dir, "orders")
    d = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 6).alias("revenue"))
    )
    a, b = d.alias("a"), d.alias("b")
    p = a.join(b, F.col("a.day") < F.col("b.day")).select(
        F.signum(F.col("b.revenue") - F.col("a.revenue")).alias("sgn")
    )
    sstat = p.agg(F.sum("sgn").alias("s"))
    n_ = d.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ties = (
        d.groupBy("revenue")
        .agg(F.count(F.lit(1)).cast("double").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t")
                    * (F.col("t") - 1.0)
                    * (2.0 * F.col("t") + 5.0)
                ),
                F.lit(0.0),
            ).alias("tie_term")
        )
    )
    var_expr = (
        F.col("n") * (F.col("n") - 1.0) * (2.0 * F.col("n") + 5.0)
        - F.col("tie_term")
    ) / 18.0
    return (
        sstat.crossJoin(F.broadcast(n_))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("s").cast("bigint").alias("s_stat"),
            F.round(var_expr, 6).alias("var_s"),
            F.round(
                F.when(
                    F.col("s") > 0, (F.col("s") - 1.0) / F.sqrt(var_expr)
                )
                .when(F.col("s") < 0, (F.col("s") + 1.0) / F.sqrt(var_expr))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("z_score"),
        )
    )
