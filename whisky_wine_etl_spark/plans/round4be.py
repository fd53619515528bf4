"""Round-4be: Cox proportional hazards and randomized response.

Registered AFTER round4bd so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.

- ``ml_cox_ph`` adds survival REGRESSION next to the Kaplan-Meier
  curve (stat_kaplan_meier): one-covariate Cox partial likelihood
  with Breslow tie handling, fit by three unrolled Newton steps.
  The risk-set sums that make Cox expensive are expressed as
  descending-time running windows with RANGE frames (ties share one
  risk set), so each Newton step is ONE window pass + one aggregate
  — no per-event rescan of the risk set.
- ``privacy_randomized_response`` closes the privacy family's
  collection side: local-DP style response flipping with a
  DETERMINISTIC integer-hash coin (so both engines flip the same
  users) and the closed-form debias π̂ = (p̂ − f)/(1 − 2f), reported
  next to the ground-truth rate the mechanism hides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_COX_BASE = """
pu AS (
  SELECT user_id,
         CAST(user_id % 2 AS DOUBLE) AS x,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ev,
         CAST(epoch_us(MIN(CASE WHEN event_type = 'purchase' THEN ts END))
                // 1000000
              - epoch_us(MIN(ts)) // 1000000 AS DOUBLE) AS dur_p,
         CAST(epoch_us(MAX(ts)) // 1000000
              - epoch_us(MIN(ts)) // 1000000 AS DOUBLE) AS dur_c
  FROM events GROUP BY user_id
),
d AS (
  SELECT user_id, x, ev,
         CASE WHEN ev = 1 THEN dur_p ELSE dur_c END AS dur
  FROM pu WHERE (CASE WHEN ev = 1 THEN dur_p ELSE dur_c END) > 0
)
"""

_COX_STEP = """
r{k} AS (
  SELECT x, ev,
         SUM(exp(b * x)) OVER wdesc AS a0,
         SUM(x * exp(b * x)) OVER wdesc AS a1,
         SUM(x * x * exp(b * x)) OVER wdesc AS a2,
         b
  FROM d CROSS JOIN b{p}
  WINDOW wdesc AS (ORDER BY dur DESC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
b{k} AS (
  SELECT b + SUM(CASE WHEN ev = 1 THEN x - a1 / a0 ELSE 0 END)
           / SUM(CASE WHEN ev = 1
                      THEN a2 / a0 - (a1 / a0) * (a1 / a0) ELSE 0 END) AS b
  FROM r{k} GROUP BY b
)
"""


@query(
    "ml_cox_ph",
    "WITH "
    + _COX_BASE
    + ", b0 AS (SELECT CAST(0 AS DOUBLE) AS b),"
    + ",".join(_COX_STEP.format(k=k, p=k - 1) for k in range(1, 4))
    + """
SELECT ROUND(b, 6) AS beta, ROUND(exp(b), 6) AS hazard_ratio,
       (SELECT CAST(SUM(ev) AS BIGINT) FROM d) AS n_events,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_subjects
FROM b3
""",
)
def ml_cox_ph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox proportional-hazards fit (one binary covariate: odd vs
    even user id) on time-to-first-purchase, censored at last
    activity, Breslow tie handling, three unrolled Newton steps from
    β=0.

    The partial-likelihood machinery is window algebra: sort
    subjects by duration DESCENDING and the risk set at any event
    time is exactly the running prefix — so A_k(t) = Σ_{risk set}
    x^k·e^{βx} are three running sums with a RANGE frame (duration
    ties share one risk set on both engines, no ordering ambiguity).
    Each Newton step is one window pass + one aggregate building the
    score U = Σ_ev (x − A1/A0) and information I = Σ_ev (A2/A0 −
    (A1/A0)²), then β ← β + U/I inside the plan — no driver math.
    Scale note: the global ORDER BY window range-partitions by
    duration at cluster scale (the two-pass prefix-sum pattern used
    by corpus_token_budget); at the survival-analysis grain (one row
    per SUBJECT, not per event) a single range partitioning is
    cheap."""
    e = _t(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("ev"),
        (
            F.unix_timestamp(
                F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
            )
            - F.unix_timestamp(F.min("ts"))
        )
        .cast("double")
        .alias("dur_p"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("double")
        .alias("dur_c"),
    )
    d = (
        pu.select(
            (F.col("user_id") % 2).cast("double").alias("x"),
            "ev",
            F.when(F.col("ev") == 1, F.col("dur_p"))
            .otherwise(F.col("dur_c"))
            .alias("dur"),
        )
        .filter(F.col("dur") > 0)
    )
    d = d.localCheckpoint()  # GC-cleaned, unlike persist (ADVICE r4)
    betas = d.sparkSession.range(1).select(F.lit(0.0).alias("b"))
    wdesc = W.orderBy(F.col("dur").desc()).rangeBetween(
        W.unboundedPreceding, W.currentRow
    )
    for _ in range(3):
        ex = F.exp(F.col("b") * F.col("x"))
        r = d.crossJoin(F.broadcast(betas)).select(
            "x",
            "ev",
            "b",
            F.sum(ex).over(wdesc).alias("a0"),
            F.sum(F.col("x") * ex).over(wdesc).alias("a1"),
            F.sum(F.col("x") * F.col("x") * ex).over(wdesc).alias("a2"),
            "dur",
        )
        m = F.col("a1") / F.col("a0")
        betas = (
            r.groupBy("b")
            .agg(
                F.sum(
                    F.when(F.col("ev") == 1, F.col("x") - m).otherwise(0.0)
                ).alias("u"),
                F.sum(
                    F.when(
                        F.col("ev") == 1,
                        F.col("a2") / F.col("a0") - m * m,
                    ).otherwise(0.0)
                ).alias("i"),
            )
            .select((F.col("b") + F.col("u") / F.col("i")).alias("b"))
        )
    counts = d.agg(
        F.sum("ev").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_subjects"),
    )
    return betas.crossJoin(F.broadcast(counts)).select(
        F.round("b", 6).alias("beta"),
        F.round(F.exp("b"), 6).alias("hazard_ratio"),
        "n_events",
        "n_subjects",
    )


_FLIP_PCT = 25  # flip probability f = 0.25


@query(
    "privacy_randomized_response",
    f"""
WITH pu AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS truth,
         CASE WHEN (user_id * 1103515245 + 12345) % 100 < {_FLIP_PCT}
              THEN 1 ELSE 0 END AS flip
  FROM events GROUP BY user_id
),
rep AS (
  SELECT user_id, truth, flip,
         CASE WHEN flip = 1 THEN 1 - truth ELSE truth END AS reported
  FROM pu
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(AVG(CAST(truth AS DOUBLE)), 6) AS true_rate,
       ROUND(AVG(CAST(reported AS DOUBLE)), 6) AS reported_rate,
       ROUND((AVG(CAST(reported AS DOUBLE)) - CAST({_FLIP_PCT / 100.0} AS DOUBLE))
             / CAST({1.0 - _FLIP_PCT / 50.0} AS DOUBLE), 6) AS debiased_rate
FROM rep
""",
)
def privacy_randomized_response(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Warner randomized response over the per-user conversion flag:
    each user's report is flipped with probability f = 0.25 (here a
    DETERMINISTIC integer-LCG coin on user_id so both engines flip
    the same users — a real deployment uses client randomness), and
    the population rate is recovered as π̂ = (p̂ − f)/(1 − 2f).

    The collection-side complement to privacy_dp_group_counts
    (which adds noise server-side): the server never sees a
    truthful bit it can trust per user, yet the aggregate debiases
    exactly. All counts are integers; the single division happens
    once at the end, so both engines agree to the rounded digit.
    One groupBy(user) is the only data-sized work."""
    e = _t(spark, sf_dir, "events")
    f = _FLIP_PCT / 100.0
    pu = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("truth")
    ).select(
        "user_id",
        "truth",
        F.when(
            (F.col("user_id") * 1103515245 + 12345) % 100 < _FLIP_PCT, 1
        )
        .otherwise(0)
        .alias("flip"),
    )
    rep = pu.select(
        "truth",
        F.when(F.col("flip") == 1, 1 - F.col("truth"))
        .otherwise(F.col("truth"))
        .alias("reported"),
    )
    return rep.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg(F.col("truth").cast("double")), 6).alias("true_rate"),
        F.round(F.avg(F.col("reported").cast("double")), 6).alias(
            "reported_rate"
        ),
        F.round(
            (F.avg(F.col("reported").cast("double")) - F.lit(f))
            / (1.0 - 2 * f),
            6,
        ).alias("debiased_rate"),
    )
