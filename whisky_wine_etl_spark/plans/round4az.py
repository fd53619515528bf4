"""Round-4az: Poisson GLM and absorbing-Markov conversion probability.

Registered AFTER round4ay so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.

- ``ml_poisson_glm`` completes the GLM family (ols / ridge / huber /
  logistic already registered) with the count-data link: three
  unrolled Newton steps, each ONE distributed pass of algebraic
  sums — the same shape as ml_logistic_newton (round4o.py:61) with
  the canonical log link (for Poisson, Newton == Fisher scoring).
- ``events_absorbing_markov`` extends events_markov_transitions from
  one-step probabilities to the absorbing-chain solve: P(eventually
  purchase | current state) per transient state, x = r + Q·x, by 40
  fixed Jacobi sweeps. The chain matrix is bounded by event-type
  cardinality (states², NOT data scale), so the sweep runs on the
  driver like the IVF codebook / isotonic-PAVA precedents; every
  +/× is written in the same fixed state order as the oracle's 40
  unrolled CTE levels, so the doubles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_POIS_STEP = """
  SELECT
    SUM(exp(b0 + b1 * x) - y)           AS g0,
    SUM((exp(b0 + b1 * x) - y) * x)     AS g1,
    SUM(exp(b0 + b1 * x))               AS h00,
    SUM(exp(b0 + b1 * x) * x)           AS h01,
    SUM(exp(b0 + b1 * x) * x * x)       AS h11,
    ANY_VALUE(b0) AS pb0, ANY_VALUE(b1) AS pb1
  FROM d CROSS JOIN {prev}
"""

_POIS_SOLVE = """
  SELECT pb0 - (h11 * g0 - h01 * g1) / (h00 * h11 - h01 * h01) AS b0,
         pb1 - (h00 * g1 - h01 * g0) / (h00 * h11 - h01 * h01) AS b1
  FROM {step}
"""


@query(
    "ml_poisson_glm",
    f"""
WITH raw AS (
  SELECT l_quantity AS y, l_extendedprice / 10000.0 AS xr FROM lineitem
),
mx AS (SELECT AVG(xr) AS mx, ln(AVG(y)) AS lb FROM raw),
d AS (SELECT y, xr - (SELECT mx FROM mx) AS x FROM raw),
b_init AS (SELECT (SELECT lb FROM mx) AS b0, CAST(0 AS DOUBLE) AS b1),
s1 AS ({_POIS_STEP.format(prev="b_init")}),
b1_ AS ({_POIS_SOLVE.format(step="s1")}),
s2 AS ({_POIS_STEP.format(prev="b1_")}),
b2_ AS ({_POIS_SOLVE.format(step="s2")}),
s3 AS ({_POIS_STEP.format(prev="b2_")}),
b3_ AS ({_POIS_SOLVE.format(step="s3")})
SELECT ROUND(b0, 6) AS beta0_centered, ROUND(b1, 6) AS beta1,
       ROUND(b0 - b1 * (SELECT mx FROM mx), 6) AS beta0,
       ROUND(exp(b0), 6) AS mu_at_mean
FROM b3_
""",
)
def ml_poisson_glm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson regression E[l_quantity] = exp(b0 + b1·price/10k) by
    three unrolled Newton/Fisher steps (for the canonical log link
    the observed and expected information coincide). Each step is one
    distributed pass over the fact table aggregating the exact
    gradient (Σ(μ−y)·[1,x]) and Hessian (Σμ·[1,x]⊗[1,x]) — algebraic
    sums, map-side combinable — then a 2×2 Cramer solve inside the
    same 1-row plan. Feature mean-centered, intercept initialized at
    ln(ȳ) (the null model's MLE) so three steps land well inside
    quadratic convergence. At 100 TB each step is one scan + one
    scalar broadcast; the cached projection only helps single-node
    re-reads."""
    raw = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("y"),
        (F.col("l_extendedprice") / 10000.0).alias("xr"),
    )
    mx = raw.agg(F.avg("xr").alias("mx"), F.log(F.avg("y")).alias("lb"))
    d = raw.crossJoin(F.broadcast(mx)).select(
        "y", (F.col("xr") - F.col("mx")).alias("x"), "mx"
    )
    # localCheckpoint, not persist: blocks are freed when the RDD is
    # GC'd (persist() entries leak until an explicit unpersist the
    # lazy return contract has no place for — ADVICE r4).
    d = d.localCheckpoint()
    betas = mx.select(F.col("lb").alias("b0"), F.lit(0.0).alias("b1"))
    mu = F.exp(F.col("b0") + F.col("b1") * F.col("x"))
    for _ in range(3):
        step = d.crossJoin(F.broadcast(betas)).agg(
            F.sum(mu - F.col("y")).alias("g0"),
            F.sum((mu - F.col("y")) * F.col("x")).alias("g1"),
            F.sum(mu).alias("h00"),
            F.sum(mu * F.col("x")).alias("h01"),
            F.sum(mu * F.col("x") * F.col("x")).alias("h11"),
            F.any_value("b0").alias("pb0"),
            F.any_value("b1").alias("pb1"),
        )
        det = F.col("h00") * F.col("h11") - F.col("h01") * F.col("h01")
        betas = step.select(
            (
                F.col("pb0")
                - (F.col("h11") * F.col("g0") - F.col("h01") * F.col("g1"))
                / det
            ).alias("b0"),
            (
                F.col("pb1")
                - (F.col("h00") * F.col("g1") - F.col("h01") * F.col("g0"))
                / det
            ).alias("b1"),
        )
    return betas.crossJoin(F.broadcast(mx)).select(
        F.round("b0", 6).alias("beta0_centered"),
        F.round("b1", 6).alias("beta1"),
        F.round(F.col("b0") - F.col("b1") * F.col("mx"), 6).alias("beta0"),
        F.round(F.exp(F.col("b0")), 6).alias("mu_at_mean"),
    )


# Transient states in the FIXED order both engines fold in.
_STATES = ["click", "error", "signup", "view"]
_N_SWEEPS = 40


def _markov_coef_sql() -> str:
    """Pivoted coefficient row: per transient from-state, the direct
    purchase probability r_s and the four transient-to-transient
    probabilities q_s_t (count ratios — identical doubles in both
    engines)."""
    cols = []
    for s in _STATES:
        cols.append(
            f"SUM(CASE WHEN f = '{s}' AND t = 'purchase' THEN c ELSE 0 END)"
            f" / SUM(CASE WHEN f = '{s}' THEN c ELSE 0 END) AS r_{s}"
        )
        for t in _STATES:
            cols.append(
                f"SUM(CASE WHEN f = '{s}' AND t = '{t}' THEN c ELSE 0 END)"
                f" / SUM(CASE WHEN f = '{s}' THEN c ELSE 0 END) AS q_{s}_{t}"
            )
    return "SELECT " + ",\n       ".join(cols) + " FROM trans"


def _markov_sweep_sql(k: int, p: int) -> str:
    exprs = []
    for s in _STATES:
        terms = " + ".join(f"q_{s}_{t} * x{p}.x_{t}" for t in _STATES)
        exprs.append(f"r_{s} + {terms} AS x_{s}")
    return (
        f"x{k} AS (SELECT " + ", ".join(exprs) + f" FROM x{p} CROSS JOIN coef)"
    )


@query(
    "events_absorbing_markov",
    """
WITH seq AS (
  SELECT user_id, event_type AS f,
         COALESCE(LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id), 'end') AS t
  FROM events
),
trans AS (
  SELECT f, t, CAST(COUNT(*) AS DOUBLE) AS c
  FROM seq WHERE f <> 'purchase' GROUP BY f, t
),
coef AS (
"""
    + _markov_coef_sql()
    + """
),
x0 AS (SELECT CAST(0 AS DOUBLE) AS x_click, CAST(0 AS DOUBLE) AS x_error,
              CAST(0 AS DOUBLE) AS x_signup, CAST(0 AS DOUBLE) AS x_view),
"""
    + ",\n".join(_markov_sweep_sql(k, k - 1) for k in range(1, _N_SWEEPS + 1))
    + f"""
SELECT s.state, ROUND(s.p_convert, 6) AS p_convert
FROM (
  SELECT 'click' AS state, x_click AS p_convert FROM x{_N_SWEEPS}
  UNION ALL SELECT 'error', x_error FROM x{_N_SWEEPS}
  UNION ALL SELECT 'signup', x_signup FROM x{_N_SWEEPS}
  UNION ALL SELECT 'view', x_view FROM x{_N_SWEEPS}
) s
""",
)
def events_absorbing_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-chain conversion probability: P(a user in transient
    state s eventually reaches 'purchase' before their sequence ends)
    with 'purchase' and sequence-end as the two absorbing states,
    solved as x = r + Q·x by 40 fixed Jacobi sweeps from x = 0.

    Scale split: the data-sized work is ONE pass building transition
    counts (lag window per user, then a groupBy bounded by
    event-type² cells); the sweep then runs on a ≤ states² coefficient
    matrix — driver-bounded like the IVF codebook, O(1) in corpus
    size. Both engines fold each sweep in the SAME literal state
    order (click, error, signup, view), so the 40-step fixed-point
    arithmetic is bit-identical before the 6 dp rounding; the oracle
    unrolls the identical sweeps as CTE levels."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("f"),
        F.coalesce(F.lead("event_type").over(w), F.lit("end")).alias("t"),
    )
    trans = (
        seq.filter(F.col("f") != "purchase")
        .groupBy("f", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    # states² cells — O(1) driver traffic regardless of SF
    cells = {(r["f"], r["t"]): r["c"] for r in trans.collect()}
    tot = {s: sum(c for (f, _), c in cells.items() if f == s) for s in _STATES}
    r = {s: cells.get((s, "purchase"), 0.0) / tot[s] for s in _STATES}
    q = {
        (s, t): cells.get((s, t), 0.0) / tot[s]
        for s in _STATES
        for t in _STATES
    }
    x = {s: 0.0 for s in _STATES}
    for _ in range(_N_SWEEPS):
        # same fixed left-to-right fold order as the oracle's exprs
        new = {}
        for s in _STATES:
            acc = r[s]
            for t in _STATES:
                acc = acc + q[(s, t)] * x[t]
            new[s] = acc
        x = new
    rows = [(s, round(x[s], 6)) for s in _STATES]
    return spark.createDataFrame(rows, "state string, p_convert double")
