"""Round-4bc: Shapley-value attribution and delta-method ratio SE.

Registered AFTER round4bb so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.

- ``events_shapley_attribution`` upgrades the heuristic multi-touch
  models (events_multitouch_attribution: linear / position / last)
  to the game-theoretic one: each channel's Shapley value over the
  coalition game whose characteristic function is the observed
  conversion rate per exact channel set. After ONE data-sized
  aggregate (per-user channel bitmask + converted flag), the whole
  solve runs on the 2⁴-row coalition table with literal factorial
  weights — the standard data-driven attribution construction
  (Zhao et al., "Shapley Value Methods for Attribution Modeling").
- ``stat_delta_method_ratio`` is the closed-form sibling of
  stat_jackknife_ratio: the first-order (delta-method) standard
  error of a ratio metric from one pass of moment aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# channel bit assignment, alphabetical: click=1, error=2, signup=4, view=8
_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
# Shapley weight by |S| for n=4: |S|!·(n−1−|S|)!/n!  — CAST AS DOUBLE
# so DuckDB does double (not version-scaled DECIMAL) division, matching
# Spark's lit-double weights bit-exactly (r8 oracle-fragility audit).
_W = {
    0: "CAST(6.0 AS DOUBLE)/24.0",
    1: "CAST(2.0 AS DOUBLE)/24.0",
    2: "CAST(2.0 AS DOUBLE)/24.0",
    3: "CAST(6.0 AS DOUBLE)/24.0",
}

_POPCNT = ("((vs.s >> 0) & 1) + ((vs.s >> 1) & 1)"
           " + ((vs.s >> 2) & 1) + ((vs.s >> 3) & 1)")


@query(
    "events_shapley_attribution",
    f"""
WITH per_user AS (
  SELECT user_id,
         COALESCE(SUM(CASE WHEN event_type = 'click'  THEN 1 ELSE 0 END), 0) AS has_c,
         COALESCE(SUM(CASE WHEN event_type = 'error'  THEN 1 ELSE 0 END), 0) AS has_e,
         COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END), 0) AS has_s,
         COALESCE(SUM(CASE WHEN event_type = 'view'   THEN 1 ELSE 0 END), 0) AS has_v,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
masks AS (
  SELECT CASE WHEN has_c > 0 THEN 1 ELSE 0 END
       + CASE WHEN has_e > 0 THEN 2 ELSE 0 END
       + CASE WHEN has_s > 0 THEN 4 ELSE 0 END
       + CASE WHEN has_v > 0 THEN 8 ELSE 0 END AS mask,
         CAST(COUNT(*) AS DOUBLE) AS n_users,
         CAST(SUM(conv) AS DOUBLE) AS n_conv
  FROM per_user GROUP BY 1
),
allmask AS (SELECT CAST(range AS INT) AS s FROM range(0, 16)),
v AS (
  SELECT a.s, COALESCE(m.n_conv / m.n_users, 0.0) AS v
  FROM allmask a LEFT JOIN masks m ON a.s = m.mask
),
ch AS (
  SELECT * FROM (VALUES ('click', 1), ('error', 2), ('signup', 4),
                        ('view', 8)) AS t(channel, bit)
),
contrib AS (
  SELECT ch.channel,
         (CASE {" ".join(f"WHEN ({_POPCNT}) = {k} THEN {w}" for k, w in _W.items())}
          END) * (vw.v - vs.v) AS part
  FROM ch
  JOIN v vs ON (vs.s & ch.bit) = 0
  JOIN v vw ON vw.s = (vs.s | ch.bit)
)
SELECT channel, ROUND(SUM(part), 6) AS shapley
FROM contrib GROUP BY channel
""",
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution: v(S) = conversion rate of
    users whose observed non-purchase channel set is exactly S (0 for
    unobserved coalitions), φ_c = Σ_{S∌c} |S|!(n−1−|S|)!/n! ·
    (v(S∪{c}) − v(S)) over the 4-channel universe.

    Scale split: the only data-sized work is one groupBy(user)
    building the channel bitmask and converted flag, then a 16-cell
    mask aggregate; the Shapley sum is two broadcast self-joins of
    that 16-row coalition table against the 4-row channel table with
    literal factorial weights — O(2ⁿ·n) cells, SF-independent. The
    weight CASE keys on an explicit 4-bit popcount so both engines
    compute identical branch selections."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        *[
            F.max(F.when(F.col("event_type") == name, 1).otherwise(0)).alias(
                f"h_{name}"
            )
            for name, _ in _CHANNELS
        ],
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    mask_col = None
    for name, bit in _CHANNELS:
        term = F.when(F.col(f"h_{name}") > 0, bit).otherwise(0)
        mask_col = term if mask_col is None else mask_col + term
    masks = per_user.groupBy(mask_col.alias("mask")).agg(
        F.count(F.lit(1)).cast("double").alias("n_users"),
        F.sum("conv").cast("double").alias("n_conv"),
    )
    spark_ = e.sparkSession
    allmask = spark_.range(0, 16).select(F.col("id").cast("int").alias("s"))
    v = allmask.join(
        F.broadcast(masks), allmask.s == masks.mask, "left"
    ).select(
        "s",
        F.coalesce(F.col("n_conv") / F.col("n_users"), F.lit(0.0)).alias(
            "v"
        ),
    )
    ch = spark_.createDataFrame(_CHANNELS, "channel string, bit int")
    vs = v.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
    vw = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    popcnt = sum(
        F.shiftright(F.col("s0"), i).bitwiseAND(F.lit(1)) for i in range(4)
    )
    w = (
        F.when(popcnt == 0, F.lit(6.0) / 24.0)
        .when(popcnt == 1, F.lit(2.0) / 24.0)
        .when(popcnt == 2, F.lit(2.0) / 24.0)
        .when(popcnt == 3, F.lit(6.0) / 24.0)
    )
    contrib = (
        F.broadcast(ch)
        .join(vs, vs.s0.bitwiseAND(ch.bit) == 0)
        .join(vw, vw.s1 == vs.s0.bitwiseOR(ch.bit))
        .select(
            "channel", (w * (F.col("v1") - F.col("v0"))).alias("part")
        )
    )
    return contrib.groupBy("channel").agg(
        F.round(F.sum("part"), 6).alias("shapley")
    )


@query(
    "stat_delta_method_ratio",
    """
WITH pu AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS rev,
         CAST(COUNT(*) AS DOUBLE) AS n_ev
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         AVG(rev) AS ma, AVG(n_ev) AS mb,
         VAR_SAMP(rev) AS va, VAR_SAMP(n_ev) AS vb,
         COVAR_SAMP(rev, n_ev) AS cab
  FROM pu
)
SELECT ROUND(ma / mb, 6) AS ratio,
       ROUND(sqrt((va / (ma * ma) + vb / (mb * mb)
                   - 2.0 * cab / (ma * mb))
                  * (ma / mb) * (ma / mb) / n), 6) AS se_delta,
       CAST(n AS BIGINT) AS n_users
FROM m
""",
)
def stat_delta_method_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error for the ratio metric
    revenue-per-event (user-level ratio of means):
    SE² ≈ (μa/μb)²·(σa²/μa² + σb²/μb² − 2σab/(μaμb))/n.

    The closed-form sibling of stat_jackknife_ratio (which resamples
    buckets): ONE pass of user-level sums, then one moment aggregate
    (mean/variance/covariance — all map-side combinable); the SE is
    scalar arithmetic on the 1-row result. This is how large A/B
    platforms compute ratio-metric CIs without resampling."""
    e = _t(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        ).alias("rev"),
        F.count(F.lit(1)).cast("double").alias("n_ev"),
    )
    m = pu.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("rev").alias("ma"),
        F.avg("n_ev").alias("mb"),
        F.var_samp("rev").alias("va"),
        F.var_samp("n_ev").alias("vb"),
        F.covar_samp("rev", "n_ev").alias("cab"),
    )
    ratio = F.col("ma") / F.col("mb")
    se = F.sqrt(
        (
            F.col("va") / (F.col("ma") * F.col("ma"))
            + F.col("vb") / (F.col("mb") * F.col("mb"))
            - 2.0 * F.col("cab") / (F.col("ma") * F.col("mb"))
        )
        * ratio
        * ratio
        / F.col("n")
    )
    return m.select(
        F.round(ratio, 6).alias("ratio"),
        F.round(se, 6).alias("se_delta"),
        F.col("n").cast("bigint").alias("n_users"),
    )
