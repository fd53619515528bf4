"""Round-4ba: gradient-boosted stumps and capped quota allocation.

Registered AFTER round4az so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.

- ``ml_gbm_stumps`` upgrades ml_decision_stump (one split) to a
  3-round L2 gradient-boosting loop. The enabling observation: with
  one histogram-able feature the model is a function of the feature
  VALUE, so after a single data-sized groupBy the entire training
  loop (residuals, split scan, leaf values, model update) runs on
  the ≤50-row value histogram — the XGBoost histogram trick taken to
  its logical end. Per-x sums are 6 dp-rounded once so every later
  double matches the oracle bit-for-bit.
- ``alloc_capped_proportional`` is water-filling quota allocation
  (ad budgets, rate limits, shard quotas): proportional shares with
  a per-key cap, overflow redistributed among uncapped keys over 3
  unrolled rounds — all in BIGINT cents, so both engines agree
  EXACTLY with no FP caveat at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_LR = 0.5
_GBM_ROUND = """
c{k} AS (
  SELECT x, f,
         SUM(n) OVER (ORDER BY x) AS n_le,
         SUM(sy - n * f) OVER (ORDER BY x) AS r_le,
         SUM(n) OVER () AS n_tot,
         SUM(sy - n * f) OVER () AS r_tot
  FROM f{p}
),
s{k} AS (
  SELECT x AS threshold,
         r_le * r_le / n_le
           + (r_tot - r_le) * (r_tot - r_le) / (n_tot - n_le) AS gain,
         r_le / n_le AS dl,
         (r_tot - r_le) / (n_tot - n_le) AS dr
  FROM c{k} WHERE n_le < n_tot
),
b{k} AS (
  SELECT threshold, gain, dl, dr,
         ROW_NUMBER() OVER (ORDER BY gain DESC, threshold) AS rn
  FROM s{k}
),
f{k} AS (
  SELECT f.x, f.n, f.sy,
         f.f + {lr} * CASE WHEN f.x <= b.threshold THEN b.dl ELSE b.dr END AS f
  FROM f{p} f CROSS JOIN (SELECT * FROM b{k} WHERE rn = 1) b
)
"""


@query(
    "ml_gbm_stumps",
    """
WITH h AS (
  SELECT l_quantity AS x, CAST(COUNT(*) AS DOUBLE) AS n,
         ROUND(SUM(l_extendedprice / 1000.0), 6) AS sy
  FROM lineitem GROUP BY l_quantity
),
tot AS (SELECT SUM(sy) / SUM(n) AS f0 FROM h),
f0 AS (SELECT x, n, sy, (SELECT f0 FROM tot) AS f FROM h),
"""
    + ",".join(
        _GBM_ROUND.format(k=k, p=k - 1, lr=_LR) for k in range(1, 4)
    )
    + """
SELECT r.rnd, r.threshold, ROUND(r.gain, 6) AS gain,
       ROUND(r.dl, 6) AS left_delta, ROUND(r.dr, 6) AS right_delta
FROM (
  SELECT 1 AS rnd, threshold, gain, dl, dr FROM b1 WHERE rn = 1
  UNION ALL SELECT 2, threshold, gain, dl, dr FROM b2 WHERE rn = 1
  UNION ALL SELECT 3, threshold, gain, dl, dr FROM b3 WHERE rn = 1
) r
""",
)
def ml_gbm_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of L2 gradient boosting with regression stumps on
    l_quantity predicting l_extendedprice/1000 (learning rate 0.5).

    Because every feature value is histogram-able, the model F is a
    function of x alone: ONE groupBy collapses the fact table to the
    ~50-row (x, n, Σy) histogram and the whole boosting loop —
    residual sums, split scan via two running windows, leaf deltas,
    model update — replays on that bounded frame. At 100 TB the only
    data-sized cost is the initial partial-aggregated groupBy; the
    windows order a ≤50-row frame, never the data. Σy is rounded to
    6 dp at the histogram so both engines then fold bit-identical
    doubles (running sums accumulate in the same x order), making
    the argmax split choice and leaf values exactly reproducible.
    Returns the 3 fitted stumps (round, threshold, gain, leaf
    deltas)."""
    h = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_quantity").alias("x"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") / 1000.0), 6).alias("sy"),
        )
    )
    tot = h.agg((F.sum("sy") / F.sum("n")).alias("f0"))
    f = h.crossJoin(F.broadcast(tot)).select(
        "x", "n", "sy", F.col("f0").alias("f")
    )
    wo = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    wa = W.orderBy("x").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    stumps = []
    for rnd in range(1, 4):
        c = f.select(
            "x",
            "f",
            F.sum("n").over(wo).alias("n_le"),
            F.sum(F.col("sy") - F.col("n") * F.col("f")).over(wo).alias(
                "r_le"
            ),
            F.sum("n").over(wa).alias("n_tot"),
            F.sum(F.col("sy") - F.col("n") * F.col("f")).over(wa).alias(
                "r_tot"
            ),
        )
        s = c.where(F.col("n_le") < F.col("n_tot")).select(
            F.col("x").alias("threshold"),
            (
                F.col("r_le") * F.col("r_le") / F.col("n_le")
                + (F.col("r_tot") - F.col("r_le"))
                * (F.col("r_tot") - F.col("r_le"))
                / (F.col("n_tot") - F.col("n_le"))
            ).alias("gain"),
            (F.col("r_le") / F.col("n_le")).alias("dl"),
            (
                (F.col("r_tot") - F.col("r_le"))
                / (F.col("n_tot") - F.col("n_le"))
            ).alias("dr"),
        )
        b = (
            s.withColumn(
                "rn",
                F.row_number().over(W.orderBy(F.desc("gain"), "threshold")),
            )
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        stumps.append(
            b.select(
                F.lit(rnd).alias("rnd"),
                "threshold",
                F.round("gain", 6).alias("gain"),
                F.round("dl", 6).alias("left_delta"),
                F.round("dr", 6).alias("right_delta"),
            )
        )
        f = (
            f.crossJoin(F.broadcast(b))
            .select(
                "x",
                "n",
                "sy",
                (
                    F.col("f")
                    + _LR
                    * F.when(
                        F.col("x") <= F.col("threshold"), F.col("dl")
                    ).otherwise(F.col("dr"))
                ).alias("f"),
            )
        )
    out = stumps[0]
    for s_ in stumps[1:]:
        out = out.unionAll(s_)
    return out


_BUDGET_CENTS = 100_000_000  # 1M currency units
_CAP_CENTS = 8_000_000  # 80k per nation

_ALLOC_ROUND = """
st{k} AS (
  SELECT nation, rev_c,
         CASE WHEN a + inc >= {cap} THEN {cap} ELSE a + inc END AS a,
         CASE WHEN a + inc >= {cap} THEN 1 ELSE 0 END AS capped
  FROM (
    SELECT nation, rev_c, a, capped,
           CASE WHEN capped = 1 THEN CAST(0 AS BIGINT)
                ELSE CAST(
                  (CAST({budget} - (SELECT SUM(a) FROM st{p}) AS HUGEINT)
                   * rev_c)
                  // (SELECT SUM(rev_c) FROM st{p} WHERE capped = 0)
                AS BIGINT) END AS inc
    FROM st{p}
  ) u
)
"""


@query(
    "alloc_capped_proportional",
    """
WITH rev AS (
  SELECT c.c_nationkey AS nation,
         CAST(ROUND(SUM(o.o_totalprice) * 100) AS BIGINT) AS rev_c
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey
),
st0 AS (
  SELECT nation, rev_c, CAST(0 AS BIGINT) AS a, 0 AS capped FROM rev
),
"""
    + ",".join(
        _ALLOC_ROUND.format(
            k=k, p=k - 1, cap=_CAP_CENTS, budget=_BUDGET_CENTS
        )
        for k in range(1, 4)
    )
    + """
SELECT nation, rev_c,
       CAST(a AS BIGINT) AS alloc_cents,
       CAST(capped AS INT) AS capped
FROM st3
""",
)
def alloc_capped_proportional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling quota allocation: split a 1M budget across
    nations proportional to revenue with an 80k per-nation cap;
    overflow from capped nations is re-shared among uncapped ones
    over 3 unrolled redistribution rounds (floor division leaves the
    sub-cent crumbs unallocated — reported via the capped flag and
    reproducible exactly).

    All state is BIGINT cents: revenue is exact (2 dp prices × 100),
    each round's increment is floor(remaining · rev / uncapped_rev).
    The multiply is widened to DECIMAL(38,0) on Spark / HUGEINT on
    the oracle: at sf0.1 per-nation rev_c ≈ 1.5e11 cents, so
    remaining·rev_c ≈ 1.5e19 EXCEEDS int64 (this overflowed under
    ANSI at sf0.1 until round 5; bound grows linearly with sf —
    ~1.5e21 at sf=10, comfortably inside 38 digits). Spark's
    IntegralDivide on decimals uses divideToIntegralValue (exact),
    DuckDB's ``//`` on HUGEINT is exact floor division; both operands
    are non-negative so truncation == floor and the allocation stays
    bit-exact on every engine with NO floating-point involvement.
    Scale: the data-sized work is one groupBy to the 25-row nation
    frame; the redistribution rounds are scalar subquery folds over
    that bounded frame, broadcast either way."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("bigint")
            .alias("rev_c")
        )
    )
    st = rev.select(
        "nation", "rev_c", F.lit(0).cast("bigint").alias("a"),
        F.lit(0).alias("capped"),
    )
    for _ in range(3):
        tots = st.agg(
            F.sum("a").alias("alloc_tot"),
            F.sum(F.when(F.col("capped") == 0, F.col("rev_c"))).alias(
                "uncapped_rev"
            ),
        )
        u = st.crossJoin(F.broadcast(tots)).select(
            "nation",
            "rev_c",
            "a",
            "capped",
            F.when(F.col("capped") == 1, F.lit(0).cast("bigint"))
            .otherwise(
                F.expr(
                    f"(CAST({_BUDGET_CENTS} - alloc_tot AS DECIMAL(38,0))"
                    " * rev_c) div uncapped_rev"
                ).cast("bigint")
            )
            .alias("inc"),
        )
        st = u.select(
            "nation",
            "rev_c",
            F.when(
                F.col("a") + F.col("inc") >= _CAP_CENTS, F.lit(_CAP_CENTS)
            )
            .otherwise(F.col("a") + F.col("inc"))
            .cast("bigint")
            .alias("a"),
            F.when(F.col("a") + F.col("inc") >= _CAP_CENTS, F.lit(1))
            .otherwise(F.lit(0))
            .alias("capped"),
        )
    return st.select(
        "nation",
        "rev_c",
        F.col("a").cast("bigint").alias("alloc_cents"),
        F.col("capped").cast("int").alias("capped"),
    )
