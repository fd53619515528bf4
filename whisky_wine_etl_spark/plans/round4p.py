"""Round-4p additions: decision-stump learning as aggregation, ridge
regression, Kaplan-Meier survival over user lifetimes, neighborhood
Jaccard similarity on the co-purchase graph, top event trigram paths,
and an end-to-end binaryFile-source verification.

Registered AFTER round4o so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Decision stump (depth-1 tree) by weighted Gini — tree induction as
# pure aggregation: one groupBy collapses the fact table to the
# feature's value histogram (~50 rows for l_quantity), cumulative
# sums over that bounded histogram price every candidate split at
# once, and the argmin picks the stump. All split statistics are
# integer counts, so the Gini arithmetic is bit-identical across
# engines with no rounding games.
# ---------------------------------------------------------------------------


@query(
    "ml_decision_stump",
    """
WITH h AS (
  SELECT l_quantity AS x,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) AS pos
  FROM lineitem GROUP BY l_quantity
),
c AS (
  SELECT x,
         SUM(n) OVER (ORDER BY x) AS n_le,
         SUM(pos) OVER (ORDER BY x) AS pos_le,
         SUM(n) OVER () AS n_tot,
         SUM(pos) OVER () AS pos_tot
  FROM h
),
s AS (
  SELECT x AS threshold,
         n_le, n_tot - n_le AS n_gt,
         (n_le / n_tot)
           * (1 - pow(pos_le / n_le, 2) - pow(1 - pos_le / n_le, 2))
         + ((n_tot - n_le) / n_tot)
           * (1 - pow((pos_tot - pos_le) / (n_tot - n_le), 2)
                - pow(1 - (pos_tot - pos_le) / (n_tot - n_le), 2)) AS gini,
         CASE WHEN pos_le * 2 > n_le THEN 'R' ELSE 'other' END AS left_label,
         CASE WHEN (pos_tot - pos_le) * 2 > (n_tot - n_le)
              THEN 'R' ELSE 'other' END AS right_label
  FROM c WHERE n_le < n_tot
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY gini, threshold) AS rn FROM s
)
SELECT threshold, ROUND(gini, 6) AS gini,
       CAST(n_le AS BIGINT) AS n_left, CAST(n_gt AS BIGINT) AS n_right,
       left_label, right_label
FROM r WHERE rn = 1
""",
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best depth-1 split of l_quantity predicting returnflag='R' by
    weighted Gini impurity. The data-sized work is ONE groupBy to the
    ~50-row value histogram; every candidate threshold is then priced
    simultaneously with two cumulative sums over that histogram (the
    single-partition window is over the bounded histogram, never the
    fact table), and a row_number argmin with a threshold tiebreak
    picks the stump. Counts stay integers until the final division,
    so both engines agree exactly; this is how tree-ensemble trainers
    (XGBoost-style histogram split finding) scale on Spark."""
    h = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_quantity").alias("x"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("double")
            .alias("pos"),
        )
    )
    wo = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    wa = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    c = h.select(
        "x",
        F.sum("n").over(wo).alias("n_le"),
        F.sum("pos").over(wo).alias("pos_le"),
        F.sum("n").over(wa).alias("n_tot"),
        F.sum("pos").over(wa).alias("pos_tot"),
    )
    pl = F.col("pos_le") / F.col("n_le")
    pr = (F.col("pos_tot") - F.col("pos_le")) / (F.col("n_tot") - F.col("n_le"))
    gini = (F.col("n_le") / F.col("n_tot")) * (
        1 - F.pow(pl, 2) - F.pow(1 - pl, 2)
    ) + ((F.col("n_tot") - F.col("n_le")) / F.col("n_tot")) * (
        1 - F.pow(pr, 2) - F.pow(1 - pr, 2)
    )
    s = c.where(F.col("n_le") < F.col("n_tot")).select(
        F.col("x").alias("threshold"),
        "n_le",
        (F.col("n_tot") - F.col("n_le")).alias("n_gt"),
        gini.alias("gini"),
        F.when(F.col("pos_le") * 2 > F.col("n_le"), "R")
        .otherwise("other")
        .alias("left_label"),
        F.when(
            (F.col("pos_tot") - F.col("pos_le")) * 2
            > (F.col("n_tot") - F.col("n_le")),
            "R",
        )
        .otherwise("other")
        .alias("right_label"),
    )
    r = s.withColumn("rn", F.row_number().over(W.orderBy("gini", "threshold")))
    return r.where(F.col("rn") == 1).select(
        "threshold",
        F.round("gini", 6).alias("gini"),
        F.col("n_le").cast("bigint").alias("n_left"),
        F.col("n_gt").cast("bigint").alias("n_right"),
        "left_label",
        "right_label",
    )


# ---------------------------------------------------------------------------
# Ridge regression — ml_ols_normal_eq with an L2 penalty folded into
# the centered normal equations: (S + lambda*I) beta = Sxy. Same two
# algebraic passes; regularization costs nothing at scale because it
# only perturbs the 1-row solve.
# ---------------------------------------------------------------------------

_RIDGE_LAMBDA = 1000.0


@query(
    "ml_ridge_normal_eq",
    f"""
WITH d AS (
  SELECT l_quantity AS x1, l_discount AS x2, l_extendedprice AS y
  FROM lineitem
),
m AS (SELECT AVG(x1) AS m1, AVG(x2) AS m2, AVG(y) AS my FROM d),
s AS (
  SELECT ANY_VALUE(m1) AS m1, ANY_VALUE(m2) AS m2, ANY_VALUE(my) AS my,
         SUM((x1 - m1) * (x1 - m1)) + {_RIDGE_LAMBDA} AS s11,
         SUM((x1 - m1) * (x2 - m2)) AS s12,
         SUM((x2 - m2) * (x2 - m2)) + {_RIDGE_LAMBDA} AS s22,
         SUM((x1 - m1) * (y - my)) AS s1y,
         SUM((x2 - m2) * (y - my)) AS s2y
  FROM d CROSS JOIN m
)
SELECT ROUND((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12), 6) AS b1,
       ROUND((s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12), 6) AS b2,
       ROUND(my - (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) * m1
                - (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) * m2, 4)
         AS b0
FROM s
""",
)
def ml_ridge_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge fit (lambda=1000) of extendedprice on quantity and
    discount: identical distributed shape to ml_ols_normal_eq — two
    algebraic passes, 1-row broadcast of the means — with the penalty
    added to the centered Gram diagonal before the 2x2 Cramer solve.
    The intercept is unpenalized (standard practice: centering makes
    the intercept my - b·mx independently of lambda)."""
    d = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        F.col("l_extendedprice").alias("y"),
    )
    m = d.agg(F.avg("x1").alias("m1"), F.avg("x2").alias("m2"), F.avg("y").alias("my"))
    c = d.crossJoin(F.broadcast(m))
    dx1 = F.col("x1") - F.col("m1")
    dx2 = F.col("x2") - F.col("m2")
    dy = F.col("y") - F.col("my")
    s = c.agg(
        F.any_value("m1").alias("m1"),
        F.any_value("m2").alias("m2"),
        F.any_value("my").alias("my"),
        (F.sum(dx1 * dx1) + _RIDGE_LAMBDA).alias("s11"),
        F.sum(dx1 * dx2).alias("s12"),
        (F.sum(dx2 * dx2) + _RIDGE_LAMBDA).alias("s22"),
        F.sum(dx1 * dy).alias("s1y"),
        F.sum(dx2 * dy).alias("s2y"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det
    b2 = (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
    return s.select(
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(F.col("my") - b1 * F.col("m1") - b2 * F.col("m2"), 4).alias("b0"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival of user "lifetimes" (first to last observed
# event), right-censored for users still active in the final hours of the
# observation window. The estimator collapses to the distinct-
# duration table (a few hundred rows), risk sets come from reverse
# cumulative counts, and the survival product runs in log space with
# an explicit zero guard — the same additive-window discipline as
# window_cumulative_product.
# ---------------------------------------------------------------------------


@query(
    "stat_kaplan_meier",
    """
WITH lt AS (
  SELECT user_id,
         (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 3600000000 AS dur,
         CASE WHEN MAX(ts) > (SELECT MAX(ts) FROM events) - INTERVAL 6 HOUR
              THEN 0 ELSE 1 END AS observed
  FROM events GROUP BY user_id
),
t AS (
  SELECT dur,
         CAST(COUNT(*) AS DOUBLE) AS n_all,
         CAST(SUM(observed) AS DOUBLE) AS d_evt
  FROM lt GROUP BY dur
),
r AS (
  SELECT dur, n_all, d_evt,
         SUM(n_all) OVER (ORDER BY dur
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
  FROM t
),
s AS (
  SELECT dur, d_evt, n_risk,
         SUM(CASE WHEN d_evt < n_risk THEN ln(1 - d_evt / n_risk)
                  ELSE 0 END)
           OVER (ORDER BY dur) AS logsurv,
         MAX(CASE WHEN d_evt >= n_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY dur) AS hit_zero
  FROM r
)
SELECT dur AS duration_hours,
       CAST(d_evt AS BIGINT) AS events,
       CAST(n_risk AS BIGINT) AS at_risk,
       CASE WHEN hit_zero = 1 THEN 0.0
            ELSE ROUND(exp(logsurv), 6) END AS survival
FROM s WHERE d_evt > 0
""",
)
def stat_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier curve over per-user lifetimes (hours between first
    and last event; the synthetic corpus spans ~3 days, so hours are
    the natural grain), censoring users whose last event falls in the
    final 6 hours of the corpus. Lifetimes are exact integer floor
    division of the µs span (unix_micros / epoch_us twins — ts carries
    microseconds, so per-timestamp second truncation would bucket a
    near-hour-multiple lifetime differently per engine; ADVICE r5).
    One groupBy(user) builds lifetimes,
    one groupBy(duration) collapses to the distinct-duration table
    (calendar-bounded, not data-sized), a reverse cumulative sum
    yields the risk sets, and the product Π(1 - d/n) runs as a
    cumulative log-sum with a hit-zero flag so a final exhausted risk
    set yields exact 0 instead of ln(0). The single-partition windows
    are over the bounded duration table only."""
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx"))
    lt = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(mx))
        .select(
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
        F.sum("observed").cast("double").alias("d_evt"),
    )
    w_rev = W.orderBy("dur").rowsBetween(W.currentRow, W.unboundedFollowing)
    w_fwd = W.orderBy("dur").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = t.select(
        "dur", "n_all", "d_evt", F.sum("n_all").over(w_rev).alias("n_risk")
    )
    s = r.select(
        "dur",
        "d_evt",
        "n_risk",
        F.sum(
            F.when(
                F.col("d_evt") < F.col("n_risk"),
                F.log(1 - F.col("d_evt") / F.col("n_risk")),
            ).otherwise(0.0)
        )
        .over(w_fwd)
        .alias("logsurv"),
        F.max(F.when(F.col("d_evt") >= F.col("n_risk"), 1).otherwise(0))
        .over(w_fwd)
        .alias("hit_zero"),
    )
    return s.where(F.col("d_evt") > 0).select(
        F.col("dur").alias("duration_hours"),
        F.col("d_evt").cast("bigint").alias("events"),
        F.col("n_risk").cast("bigint").alias("at_risk"),
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("logsurv"), 6))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# Neighborhood Jaccard on the co-purchase graph — "parts bought with
# similar company": similarity of two parts is the Jaccard of their
# neighbor SETS, found by joining the edge list to itself on the
# shared neighbor (inverted-index enumeration: candidate pairs come
# only from nodes that actually share a neighbor, never all-pairs).
# ---------------------------------------------------------------------------


@query(
    "graph_jaccard_neighbors",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e1 AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
edges AS (SELECT src, dst FROM e1 UNION ALL SELECT dst, src FROM e1),
deg AS (SELECT src AS node, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src),
common AS (
  SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS DOUBLE) AS c
  FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src
),
j AS (
  SELECT u, v, c / (du.d + dv.d - c) AS jac
  FROM common
  JOIN deg du ON du.node = u
  JOIN deg dv ON dv.node = v
),
r AS (
  SELECT u, v, jac, ROW_NUMBER() OVER (ORDER BY jac DESC, u, v) AS rk FROM j
)
SELECT u AS part_a, v AS part_b, ROUND(jac, 6) AS jaccard
FROM r WHERE rk <= 50
""",
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 part pairs by co-purchase neighborhood Jaccard
    (deterministic (jac, u, v) ordering; the unrounded ratio of exact
    integer counts is a single IEEE division, so the rank is
    engine-stable). Edges come from per-order baskets (in-array
    combination emission — one orderkey shuffle, no self-join;
    basket size is order-width-bounded), candidate pairs from the
    edge⋈edge join on the shared neighbor — work is Σ deg(n)² over
    neighbors, the inverted-index bound, with the same hot-key
    characteristics (and the same capping lever, if a hub node ever
    dominated) as the shingle dedup family. Degrees join in by node;
    Jaccard = c/(da+db-c) on exact integer counts. The oracle
    reaches the identical edge set through a relational self-join."""
    from whisky_wine_etl_spark.operators.graph import copurchase_edges

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(li, both_directions=True).localCheckpoint()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("double").alias("d")
    )
    a, b = edges.alias("a"), edges.alias("b")
    common = (
        a.join(b, (F.col("a.dst") == F.col("b.dst")) & (F.col("a.src") < F.col("b.src")))
        .groupBy(F.col("a.src").alias("u"), F.col("b.src").alias("v"))
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    j = (
        common.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            (F.col("c") / (F.col("du") + F.col("dv") - F.col("c"))).alias("jac"),
        )
    )
    # orderBy+limit plans as TakeOrderedAndProject — per-partition
    # top-50 then a 50-row driver merge, never a global sort (a
    # row_number window here would funnel all pairs into one task)
    return (
        j.orderBy(F.desc("jac"), "u", "v")
        .limit(50)
        .select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            F.round("jac", 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Top event trigram paths — the length-3 extension of
# events_markov_transitions: most frequent consecutive (e1 -> e2 ->
# e3) paths per user timeline, a pure lead-window + count + top-k.
# ---------------------------------------------------------------------------


@query(
    "events_top_trigram_paths",
    """
WITH o AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events
),
c AS (
  SELECT event_type AS e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM o WHERE e3 IS NOT NULL
  GROUP BY event_type, e2, e3
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, e1, e2, e3) AS rn FROM c
)
SELECT e1, e2, e3, cnt FROM r WHERE rn <= 20
""",
)
def events_top_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 consecutive three-event paths across user timelines:
    two lead windows per user (keyed shuffle on user_id, frames local
    to each user), a trigram count, and a TakeOrderedAndProject-shaped
    global top-k with a full lexical tiebreak so the cut is
    deterministic. The trigram key space is |event_types|³ — tiny —
    so the count shuffle is bounded regardless of SF."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    c = (
        o.where(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    r = c.withColumn(
        "rn",
        F.row_number().over(W.orderBy(F.desc("cnt"), "e1", "e2", "e3")),
    )
    return r.where(F.col("rn") <= 20).drop("rn")


# ---------------------------------------------------------------------------
# binaryFile source verification — the ingestion face of the
# multimodal column story (mm_* queries consume binary columns; THIS
# is how such columns enter Spark from a filesystem): read the
# testdata directory's parquet files as opaque blobs and fingerprint
# each (name, size, head/tail bytes). The oracle re-reads the same
# files with DuckDB's read_blob, so path handling, length, and
# byte-exact content all cross-check.
# ---------------------------------------------------------------------------


@query(
    "source_binaryfile_stats",
    """
SELECT regexp_extract(filename, '[^/]+$') AS file_name,
       CAST(size AS BIGINT) AS n_bytes,
       substr(hex(content), 1, 16) AS head8,
       substr(hex(content), length(hex(content)) - 15, 16) AS tail8
FROM read_blob('/root/testdata/sf0.001/*.parquet')
""",
)
def source_binaryfile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's binaryFile source over the sf0.001 parquet files:
    (file name, byte length, first/last 8 bytes hex). binaryFile
    distributes whole-file reads across executors (one file per
    task; the multimodal ingestion pattern for images/audio), and the
    head/tail hex plus exact length pin the content byte-for-byte
    against DuckDB's read_blob — hex-of-slice on the Spark side
    equals slice-of-hex on the oracle side. The directory is FIXED
    at sf0.001 on both sides (the oracle SQL is a literal the driver
    runs verbatim, so it cannot interpolate sf_dir; the source
    contract being verified is scale-independent). Full-content
    hashing is deliberately avoided: DuckDB's blob->varchar cast
    escapes bytes, so md5 would hash different strings."""
    df = spark.read.format("binaryFile").load("/root/testdata/sf0.001/*.parquet")
    return df.select(
        F.regexp_extract("path", "[^/]+$", 0).alias("file_name"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.hex(F.expr("substring(content, 1, 8)")).alias("head8"),
        F.hex(F.expr("substring(content, length(content) - 7, 8)")).alias("tail8"),
    )
