"""Round-5b: four more operator families, registered after round5a
(still inside the ≤150 backlog budget: 136 + 4 = 140 at round close).

- ``stat_logrank_test`` — the two-cohort survival COMPARISON that
  completes the survival family (stat_kaplan_meier estimates one
  curve, ml_cox_ph fits a hazard model; the log-rank test answers
  "are the two curves different", the primary endpoint test of every
  clinical/retention analysis).
- ``ml_pr_curve_ap`` — precision-recall curve, average precision and
  best-F1 operating point; the imbalanced-classes evaluation twin of
  ml_roc_auc.
- ``stat_hodges_lehmann`` — the rank-based location estimator paired
  with stat_theil_sen_daily (slope) and stat_mann_whitney_u (test):
  median of all Walsh averages of the daily revenue series.
- ``alloc_knapsack_greedy`` — budgeted greedy selection by value
  density, the allocation primitive quota systems use; the global
  running total comes from the two-pass range-partition pattern
  (operators/keys.py), NOT a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Log-rank test: cohorts = user_id parity, lifetimes/censoring exactly
# as stat_kaplan_meier so the family shares one framing. At each
# distinct event time: O = observed group-1 deaths, E = expected under
# H0 (deaths split proportionally to at-risk counts), V = hypergeometric
# variance; z = (O - E)/sqrt(V).
# ---------------------------------------------------------------------------


@query(
    "stat_logrank_test",
    """
WITH lt AS (
  SELECT user_id % 2 AS grp,
         (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 3600000000 AS dur,
         CASE WHEN MAX(ts) > (SELECT MAX(ts) FROM events) - INTERVAL 6 HOUR
              THEN 0 ELSE 1 END AS observed
  FROM events GROUP BY user_id
),
t AS (
  SELECT dur,
         CAST(COUNT(*) AS DOUBLE) AS n_all,
         CAST(SUM(observed) AS DOUBLE) AS d_all,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
         CAST(SUM(CASE WHEN grp = 1 THEN observed ELSE 0 END) AS DOUBLE) AS d1
  FROM lt GROUP BY dur
),
r AS (
  SELECT dur, d_all, d1,
         SUM(n_all) OVER (ORDER BY dur
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nr_all,
         SUM(n1) OVER (ORDER BY dur
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nr1
  FROM t
),
terms AS (
  SELECT d1,
         ROUND(d_all * nr1 / nr_all, 9) AS e1,
         CASE WHEN nr_all > 1
              THEN ROUND(d_all * (nr1 / nr_all) * (1 - nr1 / nr_all)
                         * (nr_all - d_all) / (nr_all - 1), 9)
              ELSE 0.0 END AS v1
  FROM r WHERE d_all > 0
)
SELECT CAST(SUM(d1) AS BIGINT) AS observed_g1,
       ROUND(SUM(e1), 6) AS expected_g1,
       ROUND(SUM(v1), 6) AS variance,
       ROUND((SUM(d1) - SUM(e1)) / SQRT(SUM(v1)), 6) AS z_logrank
FROM terms
""",
)
def stat_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-cohort log-rank test on per-user lifetimes (cohort =
    user_id parity, duration/censoring identical to
    stat_kaplan_meier's framing so the survival family shares one
    ground truth): O/E/V accumulated over the distinct-duration risk
    sets, z = (O−E)/√V. Durations are exact integer floor division of
    the µs span (unix_micros / epoch_us twins, ADVICE r5 — second
    truncation per timestamp could bucket near-hour-multiple
    lifetimes differently per engine).

    Scale shape: one groupBy(user) for lifetimes, one groupBy(dur) to
    the calendar-bounded duration table; risk sets are reverse
    cumulative sums over that bounded table (single-partition window
    over ~tens of rows, never the fact table); the final row is a
    4-field aggregate. Exactness: every count is an integer; each
    time's E/V term is a ratio of integers rounded to 9dp BEFORE the
    sum (so both engines add identical doubles; the sum's order
    sensitivity is then ulp-scale, absorbed by the final 6dp round)."""
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx"))
    lt = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("user_id") % 2).alias("grp"),
            F.expr(
                "(unix_micros(last_ts) - unix_micros(first_ts))"
                " div 3600000000"
            ).alias("dur"),
            F.when(
                F.col("last_ts") > F.col("mx") - F.expr("INTERVAL 6 HOUR"), 0
            )
            .otherwise(1)
            .alias("observed"),
        )
    )
    t = lt.groupBy("dur").agg(
        F.count(F.lit(1)).cast("double").alias("n_all"),
        F.sum("observed").cast("double").alias("d_all"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("double")
        .alias("n1"),
        F.sum(F.when(F.col("grp") == 1, F.col("observed")).otherwise(0))
        .cast("double")
        .alias("d1"),
    )
    w_rev = W.orderBy("dur").rowsBetween(W.currentRow, W.unboundedFollowing)
    r = t.select(
        "dur",
        "d_all",
        "d1",
        F.sum("n_all").over(w_rev).alias("nr_all"),
        F.sum("n1").over(w_rev).alias("nr1"),
    ).filter(F.col("d_all") > 0)
    terms = r.select(
        "d1",
        F.round(F.col("d_all") * F.col("nr1") / F.col("nr_all"), 9).alias("e1"),
        F.when(
            F.col("nr_all") > 1,
            F.round(
                F.col("d_all")
                * (F.col("nr1") / F.col("nr_all"))
                * (1 - F.col("nr1") / F.col("nr_all"))
                * (F.col("nr_all") - F.col("d_all"))
                / (F.col("nr_all") - 1),
                9,
            ),
        )
        .otherwise(0.0)
        .alias("v1"),
    )
    return terms.agg(
        F.sum("d1").cast("bigint").alias("observed_g1"),
        F.round(F.sum("e1"), 6).alias("expected_g1"),
        F.round(F.sum("v1"), 6).alias("variance"),
        F.round(
            (F.sum("d1") - F.sum("e1")) / F.sqrt(F.sum("v1")), 6
        ).alias("z_logrank"),
    )


# ---------------------------------------------------------------------------
# Precision-recall curve + average precision. The score domain
# (l_discount) is an 11-value grid, so the whole curve lives on an
# 11-row threshold histogram — the fact table is touched exactly once.
# ---------------------------------------------------------------------------


@query(
    "ml_pr_curve_ap",
    """
WITH h AS (
  SELECT l_discount AS score,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
           AS pos
  FROM lineitem GROUP BY l_discount
),
c AS (
  SELECT score,
         SUM(n) OVER (ORDER BY score DESC) AS cum_n,
         SUM(pos) OVER (ORDER BY score DESC) AS cum_pos,
         SUM(pos) OVER () AS tot_pos
  FROM h
),
k AS (
  SELECT score,
         cum_pos / cum_n AS prec,
         cum_pos / tot_pos AS rec,
         (cum_pos - COALESCE(LAG(cum_pos) OVER (ORDER BY score DESC), 0))
           / tot_pos AS d_rec
  FROM c
),
f AS (
  SELECT score, prec, rec,
         CASE WHEN prec + rec > 0 THEN 2 * prec * rec / (prec + rec)
              ELSE 0 END AS f1
  FROM k
),
best AS (
  SELECT score AS best_threshold, ROUND(f1, 6) AS best_f1,
         ROW_NUMBER() OVER (ORDER BY f1 DESC, score) AS rk
  FROM f
)
SELECT ROUND((SELECT SUM(d_rec * prec) FROM k), 6) AS avg_precision,
       best_f1, best_threshold,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM h) AS n_thresholds
FROM best WHERE rk = 1
""",
)
def ml_pr_curve_ap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve over the discount→returns classifier
    (score = l_discount, label = returnflag 'R'): average precision
    AP = Σ Δrecall·precision over score-DESC thresholds, plus the
    best-F1 operating point (ties toward the lower threshold).

    Scale shape: the score domain is the 11-value discount grid, so
    ONE map-side-combinable groupBy collapses the fact table to an
    11-row histogram and every curve quantity is a window over those
    11 rows — the canonical 'metrics on the value histogram, not the
    data' move (ml_decision_stump, sketch_equidepth_hist). All inputs
    to every ratio are exact integer counts; AP's multiply-add runs
    over ≤11 9dp-stable terms, far inside the final 6dp round."""
    li = _t(spark, sf_dir, "lineitem").select("l_discount", "l_returnflag")
    h = li.groupBy(F.col("l_discount").alias("score")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("double")
        .alias("pos"),
    )
    wd = W.orderBy(F.col("score").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.orderBy(F.col("score").desc()).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    c = h.select(
        "score",
        F.sum("n").over(wd).alias("cum_n"),
        F.sum("pos").over(wd).alias("cum_pos"),
        F.sum("pos").over(wall).alias("tot_pos"),
    )
    k = c.select(
        "score",
        (F.col("cum_pos") / F.col("cum_n")).alias("prec"),
        (F.col("cum_pos") / F.col("tot_pos")).alias("rec"),
        (
            (
                F.col("cum_pos")
                - F.coalesce(
                    F.lag("cum_pos").over(W.orderBy(F.col("score").desc())),
                    F.lit(0.0),
                )
            )
            / F.col("tot_pos")
        ).alias("d_rec"),
    )
    f = k.select(
        "score",
        "prec",
        "rec",
        "d_rec",
        F.when(
            F.col("prec") + F.col("rec") > 0,
            2 * F.col("prec") * F.col("rec") / (F.col("prec") + F.col("rec")),
        )
        .otherwise(0.0)
        .alias("f1"),
    )
    ap = f.agg(F.round(F.sum(F.col("d_rec") * F.col("prec")), 6).alias("ap"))
    nthr = h.agg(F.count(F.lit(1)).cast("bigint").alias("n_thresholds"))
    best = (
        f.withColumn(
            "rk", F.row_number().over(W.orderBy(F.col("f1").desc(), "score"))
        )
        .filter(F.col("rk") == 1)
        .select(
            F.round("f1", 6).alias("best_f1"),
            F.col("score").alias("best_threshold"),
        )
    )
    return (
        best.crossJoin(F.broadcast(ap))
        .crossJoin(F.broadcast(nthr))
        .select(
            F.col("ap").alias("avg_precision"),
            "best_f1",
            "best_threshold",
            "n_thresholds",
        )
    )


# ---------------------------------------------------------------------------
# Hodges-Lehmann estimator: median of all Walsh averages (x_i+x_j)/2,
# i <= j, of the daily revenue series — the location estimate that
# pairs with stat_theil_sen_daily (slope) and stat_mann_whitney_u
# (test) in the rank-based toolkit.
# ---------------------------------------------------------------------------


@query(
    "stat_hodges_lehmann",
    """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         ROUND(SUM(o_totalprice), 6) AS rev
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
walsh AS (
  SELECT (a.rev + b.rev) / 2 AS w
  FROM d a JOIN d b ON a.day <= b.day
),
r AS (
  -- explicit median selection (no quantile_cont: its index rule has
  -- varied across DuckDB versions — r8 oracle-fragility audit). Same
  -- two-middle-position rule as the Spark side: lo=(m+1)//2,
  -- hi=(m+2)//2, equal when m odd; AVG interpolates the even case.
  SELECT w, ROW_NUMBER() OVER (ORDER BY w) AS pos,
         COUNT(*) OVER () AS m
  FROM walsh
)
SELECT ROUND(AVG(w), 6) AS hl_estimate,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
       CAST(MIN(m) AS BIGINT) AS n_pairs
FROM r
WHERE pos = (m + 1) // 2 OR pos = (m + 2) // 2
""",
)
def stat_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location estimate of daily revenue: the median
    of all (n·(n+1)/2) Walsh averages (rev_i + rev_j)/2 with i ≤ j —
    robust to outlier days where the plain mean is not, tighter than
    the plain median.

    Scale shape: the pairwise stage is calendar² (the ~2400-row daily
    frame self-joined — same explicitly-bounded quadratic as
    stat_kendall_tau_daily, independent of fact-table size; the fact
    table is touched once by the daily groupBy). The median itself is
    DISTRIBUTED SELECTION, not the percentile() aggregate: percentile
    buffers every value for a single-reducer merge (measured 10 s on
    the 2.9M Walsh rows at sf0.1), while the two-pass range-partition
    surrogate key (operators/keys.py) sorts in parallel and a filter
    picks the two middle POSITIONS — position→value is deterministic
    on ties because the sorted multiset is; measured ~1.5 s.
    Exactness: daily revenue is 6dp-pinned after the SUM (the one
    order-dependent FP aggregate), Walsh averages are then identical
    doubles on both engines, and both engines interpolate the even
    case as (v_k + v_{k+1})/2."""
    from whisky_wine_etl_spark.operators.keys import add_surrogate_key

    o = _t(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    # materialize the ~2400-row daily frame ONCE: it feeds both join
    # sides and n_days, and each lazy consumer would otherwise re-run
    # the fact-table scan+groupBy (localCheckpoint: GC-cleaned blocks)
    d = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 6).alias("rev"))
        .localCheckpoint()
    )
    a, b = d.alias("a"), d.alias("b")
    walsh = a.join(b, F.col("a.day") <= F.col("b.day")).select(
        ((F.col("a.rev") + F.col("b.rev")) / 2).alias("w")
    )
    ranked = add_surrogate_key(walsh, ["w"], key_col="pos")
    counts = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    # 1-based middle positions: odd m -> both = (m+1)/2; even m ->
    # m/2 and m/2+1; mean of the selected values = interpolated median
    mid = (
        ranked.crossJoin(F.broadcast(counts))
        # lo = (m+1) div 2, hi = (m+2) div 2: equal when m is odd
        # (single middle), adjacent when even (interpolated pair) —
        # integer `div`, NOT `/` (double division never equals a pos)
        .filter(
            (F.col("pos") == F.expr("(n_pairs + 1) div 2"))
            | (F.col("pos") == F.expr("(n_pairs + 2) div 2"))
        )
        .agg(F.round(F.avg("w"), 6).alias("hl_estimate"))
    )
    n_days = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return (
        mid.crossJoin(F.broadcast(n_days))
        .crossJoin(F.broadcast(counts))
        .select("hl_estimate", "n_days", "n_pairs")
    )


# ---------------------------------------------------------------------------
# Greedy knapsack by value density under a global size budget. The
# greedy prefix needs a GLOBAL running total in density order — the
# single-partition-window trap — so it uses the two-pass
# range-partition running total (operators/keys.py), the same pattern
# sort_global_contract proves.
# ---------------------------------------------------------------------------

_KNAPSACK_BUDGET = 50_000  # size units


@query(
    "alloc_knapsack_greedy",
    f"""
WITH it AS (
  SELECT p_partkey,
         p_size,
         p_retailprice / p_size AS density
  FROM part
),
r AS (
  SELECT p_partkey, p_size, density,
         SUM(p_size) OVER (
           ORDER BY density DESC, p_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_size
  FROM it
)
SELECT p_partkey,
       CAST(p_size AS BIGINT) AS p_size,
       ROUND(density, 6) AS density,
       CAST(cum_size AS BIGINT) AS cum_size
FROM r WHERE cum_size <= {_KNAPSACK_BUDGET}
""",
)
def alloc_knapsack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted greedy selection: take parts in value-density order
    (retailprice per size unit, ties → lower partkey) while the
    cumulative size stays within the 50k budget — the classic
    fractional-knapsack greedy restricted to whole items, i.e. how
    quota/placement systems spend a budget.

    Scale shape: the global cumulative size comes from
    operators/keys.py:add_running_total — range shuffle on the sort
    key, parallel per-partition running sums, O(partitions) driver
    prefix — NEVER a single-partition row_number window (the oracle
    uses one; DuckDB's single node is the right place for it).
    Exactness: density = one IEEE division of parquet doubles
    (identical both engines; it is the SORT KEY unrounded and is only
    display-rounded at emission), cum_size is an integer sum."""
    from whisky_wine_etl_spark.operators.keys import add_running_total

    it = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        (F.col("p_retailprice") / F.col("p_size")).alias("density"),
    )
    # order by density DESC == ascending on (-density); partkey breaks ties
    ranked = add_running_total(
        it.withColumn("__neg_d", -F.col("density")),
        order_cols=["__neg_d", "p_partkey"],
        sum_col="p_size",
        out_col="cum_size",
        inclusive=True,
    )
    return (
        ranked.filter(F.col("cum_size") <= _KNAPSACK_BUDGET)
        .select(
            "p_partkey",
            F.col("p_size").cast("bigint").alias("p_size"),
            F.round("density", 6).alias("density"),
            F.col("cum_size").cast("bigint").alias("cum_size"),
        )
    )
