"""Round-5a: five genuinely new operator families, registered LAST.

Per VERDICT r4 item 4, round 5 biases verification density over
registry growth: these five are the round's ONLY registrations
(backlog 181 − 50 driver slots + 5 = 136 ≤ the 150 target), each a
capability the 381-query surface did not have:

- ``ts_ewma_time_decay`` — HALF-LIFE decay over irregular event times
  (ts_ewma_user decays per OBSERVATION; real telemetry smoothing
  decays per unit TIME). Same closed-form prefix-sum trick, new
  axis: weights 2^{-Δdays} are exact powers of two, so the decayed
  products are bit-exact binary scalings.
- ``join_bitemporal_asof`` — point-in-time lookup along TWO time
  axes (valid time × transaction time), the corrections-ledger query
  scd2/as-of (one axis each) cannot express.
- ``er_sorted_neighborhood`` — the third classic ER blocking scheme
  (have: key blocking er_blocked_fuzzy_pairs, FastSS deletion
  neighborhoods): sort by a continuous key, pair only within a rank
  window — candidate count O(n·w), never block².
- ``ml_silhouette_labeled`` — clustering-quality metric (simplified
  silhouette on centroid distances), the evaluation piece the
  kmeans/semantic-dedup family lacked; exact because centroids are
  6dp-pinned before any downstream math.
- ``graph_jaccard_capped`` — THE scale lever VERDICT r4 named for
  perf-weak graph_jaccard_neighbors: cap the common-neighbor index by
  via-node degree so the join is Σ_{deg≤C} deg² ≤ C·|E| instead of
  Σdeg² (the df-capped-postings move from the dedup family applied to
  the graph); the cap is mirrored literally in the oracle, and the
  uncapped exact form stays registered as ground truth.
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
# Time-decayed EWMA (half-life = 1 day) over each user's daily value
# series. ts_ewma_user decays per observation index; this decays per
# elapsed DAY, which is what irregular event streams need.
# ---------------------------------------------------------------------------


@query(
    "ts_ewma_time_decay",
    """
WITH d AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         ROUND(SUM(value), 4) AS v
  FROM events
  GROUP BY 1, 2
),
p AS (
  SELECT user_id, day, v,
         SUM(v * POWER(2.0, day)) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
  FROM d
)
SELECT user_id, CAST(day AS BIGINT) AS day,
       v AS day_value,
       FLOOR(POWER(2.0, -day) * pre * 1000000 + 0.5) / 1000000
         AS decayed_score
FROM p
""",
)
def ts_ewma_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed running score with a one-day
    half-life: score(d) = Σ_{d'≤d} v(d') · 2^{-(d−d')}.

    Closed form: score(d) = 2^{-d} · P(d) with the keyed prefix sum
    P(d) = Σ v(d')·2^{d'} — ONE map-side-combinable groupBy to the
    (user, day) grain and ONE keyed running-sum window; no sequential
    fold, no UDF. Exactness: the weights 2^{±d} with integer d are
    exact IEEE doubles and multiplying by them only shifts the
    exponent, so each term is a bit-exact scaling of v — and v itself
    is pinned to 4dp right after the daily groupBy (the only
    engine-order-dependent FP sum in the chain; its true value has 2dp,
    so the pin is lossless), making the whole prefix bit-identical on
    both engines before the final 6dp rounding. Bound: 2^day overflows double past day 1023 —
    ~2.8 years of data on this rebase date; the bound is ENFORCED
    (ADVICE r5): a 1-row broadcast horizon check raise_error()s the
    query past day 1022 instead of letting both engines emit identical
    Inf rows that would hash-verify green. For longer horizons rebase
    per segment and carry the boundary score (same identity as
    ts_ewma_user's 64-row segments). Scale: the window is per-user
    over the ~day-count-sized daily series, never the raw event
    grain."""
    e = _t(spark, sf_dir, "events")
    d = (
        e.select(
            "user_id",
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            ).alias("day"),
            "value",
        )
        .groupBy("user_id", "day")
        # 4dp pin: the daily sum is the ONE engine-order-dependent FP
        # aggregate in the chain; inputs are 2dp so the true sum has 2dp
        # and rounding at 4dp collapses both engines onto the identical
        # double — every later term is an exact power-of-two scaling of
        # it, so the whole prefix stays bit-identical cross-engine
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    wrun = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # loud horizon guard: the guard rides the value expression (not a
    # pruned-away side column), so day ≥ 1023 fails the job instead of
    # silently overflowing pow(2, day) to +Inf on BOTH engines
    hz = d.agg(F.max("day").alias("max_day"))
    d = d.crossJoin(F.broadcast(hz)).withColumn(
        "v",
        F.when(F.col("max_day") < 1023, F.col("v")).otherwise(
            F.raise_error(
                F.lit(
                    "ts_ewma_time_decay: horizon >= 1023 days overflows "
                    "pow(2, day); rebase per segment"
                )
            )
        ),
    ).drop("max_day")
    p = d.select(
        "user_id",
        "day",
        "v",
        F.sum(F.col("v") * F.pow(F.lit(2.0), F.col("day"))).over(wrun).alias("pre"),
    )
    return p.select(
        "user_id",
        F.col("day").cast("bigint").alias("day"),
        F.col("v").alias("day_value"),
        # floor(x*1e6+0.5)/1e6, NOT round(x, 6): the scores are dyadic
        # rationals (v·2^{-k} with 4dp v), which land EXACTLY on 7th-dp
        # halves where HALF_UP (Spark) and HALF_EVEN (DuckDB) disagree —
        # the ts_holt_linear lesson. floor of bit-identical doubles is
        # deterministic on both engines.
        (
            F.floor(
                F.pow(F.lit(2.0), -F.col("day")) * F.col("pre") * 1e6 + 0.5
            )
            / 1e6
        ).alias("decayed_score"),
    )


# ---------------------------------------------------------------------------
# Bitemporal as-of: the corrections-ledger lookup. Each event is a
# restatement of its user's value: valid from `ts` (valid time),
# recorded in `event_id` sequence (transaction time). The query asks
# "what value was in effect at VALID_TS, as the system knew it at
# transaction horizon K" — both axes at once, which join_scd2_point_in_time
# (valid time only) and the as-of family (one axis) cannot express.
# ---------------------------------------------------------------------------

_BT_VALID_TS = "2024-01-15 00:00:00"


@query(
    "join_bitemporal_asof",
    f"""
WITH cap AS (
  -- CAST(0.6 AS DOUBLE): Spark computes the cap in double; a bare 0.6
  -- is DECIMAL in DuckDB with version-dependent promotion (r8 audit)
  SELECT CAST(FLOOR(CAST(0.6 AS DOUBLE) * MAX(event_id)) AS BIGINT) AS txn_cap
  FROM events
),
known AS (
  SELECT e.user_id, e.event_id, e.ts, e.value
  FROM events e, cap
  WHERE e.event_id <= cap.txn_cap
    AND e.ts <= TIMESTAMP '{_BT_VALID_TS}'
),
r AS (
  SELECT user_id, event_id, ts, value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM known
)
SELECT user_id,
       CAST(event_id AS BIGINT) AS txn_id,
       ts AS valid_ts,
       ROUND(value, 4) AS value_asof
FROM r WHERE rn = 1
""",
)
def join_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal point-in-time: per user, the latest restatement
    whose VALID time is ≤ 2024-01-15 among rows RECORDED at or before
    the 60%-of-max transaction horizon (a scalar subquery, so the
    probe scales with the data instead of hard-coding an id).

    Plan shape: both as-of predicates are scan-level filters (the
    transaction cap broadcasts as a 1-row crossJoin, the valid-time
    bound pushes into the parquet scan), then ONE keyed window picks
    the per-user winner — no join at all on the data-sized path.
    Tie rule (same ts twice): higher event_id wins, i.e. the later
    RECORDED row — the standard bitemporal "latest assertion"
    semantics, pinned identically in the oracle's ORDER BY."""
    e = _t(spark, sf_dir, "events")
    cap = e.agg(
        F.floor(0.6 * F.max("event_id")).cast("bigint").alias("txn_cap")
    )
    known = (
        e.crossJoin(F.broadcast(cap))
        .filter(
            (F.col("event_id") <= F.col("txn_cap"))
            & (F.col("ts") <= F.lit(_BT_VALID_TS).cast("timestamp"))
        )
        .select("user_id", "event_id", "ts", "value")
    )
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        known.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").cast("bigint").alias("txn_id"),
            F.col("ts").alias("valid_ts"),
            F.round("value", 4).alias("value_asof"),
        )
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking: sort within a coarse partition by a
# continuous key, generate candidate pairs only within a rank window
# of w=2 — O(n·w) candidates. Implemented join-FREE with lead():
# one window pass emits each rank-adjacent pair exactly once.
# ---------------------------------------------------------------------------


@query(
    "er_sorted_neighborhood",
    """
WITH r AS (
  SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal,
         ROW_NUMBER() OVER (
           PARTITION BY c_mktsegment
           ORDER BY c_acctbal, c_custkey) AS rn
  FROM customer
)
SELECT a.c_mktsegment AS segment,
       a.c_custkey AS cust_a,
       b.c_custkey AS cust_b,
       ROUND(b.c_acctbal - a.c_acctbal, 2) AS bal_gap
FROM r a JOIN r b
  ON a.c_mktsegment = b.c_mktsegment
 AND b.rn - a.rn BETWEEN 1 AND 2
WHERE b.c_acctbal - a.c_acctbal <= 100.0
  AND a.c_nationkey = b.c_nationkey
""",
)
def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate pairs: customers sorted by
    account balance within market segment; a pair is a candidate iff
    the two rows sit within 2 ranks of each other, their balances
    differ by ≤ 100.00, and they share a nation (the duplicate-account
    screen — wide enough to emit candidates at every test SF; the
    window bound, not the gap filter, is what caps the work).

    Scale shape (the whole point of SNB): a window partitioned only
    by segment would sort n/|segments| rows in ONE task — fine at test
    SF, broken at 100 TB. Instead the global rank comes from the
    two-pass range-partition surrogate-key pattern
    (operators/keys.py:add_surrogate_key — range shuffle, parallel
    per-partition numbering, O(partitions) driver prefix), ordered by
    (segment, acctbal, custkey) so each segment occupies one
    contiguous sk block; rank-adjacency is then TWO equi-joins on the
    dense unique sk (sk+1, sk+2 — hash joins with zero skew by
    construction), and pairs whose sk-neighbor crossed a segment
    boundary drop out at the same-segment filter — exactly the
    (b.rn − a.rn ∈ [1,2]) within-segment pair set the oracle reaches
    with a window. Candidates stay ≤ 2n regardless of how many
    near-equal balances pile up (the failure mode of key-equality
    blocking). bal_gap is a 2dp difference of 2dp inputs — exact."""
    from whisky_wine_etl_spark.operators.keys import add_surrogate_key

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    r = add_surrogate_key(
        c, ["c_mktsegment", "c_acctbal", "c_custkey"], key_col="sk"
    )
    a = r.select(
        F.col("sk").alias("sk_a"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_custkey").alias("cust_a"),
        F.col("c_nationkey").alias("nat_a"),
        F.col("c_acctbal").alias("bal_a"),
    )
    b = r.select(
        F.col("sk").alias("sk_b"),
        F.col("c_mktsegment").alias("seg_b"),
        F.col("c_custkey").alias("cust_b"),
        F.col("c_nationkey").alias("nat_b"),
        F.col("c_acctbal").alias("bal_b"),
    )
    probe = a.select(
        "*", F.explode(F.array(F.lit(1), F.lit(2))).alias("__d")
    ).withColumn("sk_b", F.col("sk_a") + F.col("__d"))
    return (
        probe.join(b, "sk_b")
        .filter(
            (F.col("segment") == F.col("seg_b"))
            & (F.col("nat_a") == F.col("nat_b"))
            & (F.col("bal_b") - F.col("bal_a") <= 100.0)
        )
        .select(
            "segment",
            "cust_a",
            "cust_b",
            F.round(F.col("bal_b") - F.col("bal_a"), 2).alias("bal_gap"),
        )
    )


# ---------------------------------------------------------------------------
# Simplified silhouette over the labeled embeddings: per-point
# distance to each label centroid, a = own-centroid distance,
# b = nearest other centroid. Centroids are 6dp-PINNED before any
# downstream math so every later double is bit-identical on both
# engines (the ml_gbm_stumps rounding discipline).
# ---------------------------------------------------------------------------


@query(
    "ml_silhouette_labeled",
    """
WITH v AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
c AS (
  SELECT label AS clab, dim, ROUND(AVG(val), 6) AS cv
  FROM v GROUP BY label, dim
),
cn AS (SELECT clab, SQRT(SUM(cv * cv)) AS cnorm FROM c GROUP BY clab),
xn AS (SELECT vec_id, SQRT(SUM(val * val)) AS xnorm FROM v GROUP BY vec_id),
dist AS (
  SELECT v.vec_id, v.label, c.clab,
         1 - SUM(v.val * c.cv) / (MAX(xn.xnorm) * MAX(cn.cnorm)) AS dist
  FROM v
  JOIN c ON c.dim = v.dim
  JOIN xn ON xn.vec_id = v.vec_id
  JOIN cn ON cn.clab = c.clab
  GROUP BY v.vec_id, v.label, c.clab
),
s AS (
  SELECT vec_id, label,
         MAX(CASE WHEN clab = label THEN dist END) AS a,
         MIN(CASE WHEN clab <> label THEN dist END) AS b
  FROM dist GROUP BY vec_id, label
)
SELECT CAST(label AS INT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG((b - a) / GREATEST(a, b)), 4) AS avg_silhouette
FROM s GROUP BY label
""",
)
def ml_silhouette_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label simplified silhouette on cosine distance: for each
    vector, a = distance to its own label centroid, b = distance to
    the nearest OTHER centroid, s = (b−a)/max(a,b); report the label
    mean — the standard clustering-quality readout the kmeans/semantic
    family lacked (k·n centroid distances, not the n² point-pair
    silhouette).

    Cross-engine exactness: the only aggregates over data-sized FP
    input are the centroid means and the per-point dot/norm sums;
    centroids are rounded to 6dp BEFORE any downstream use (so both
    engines proceed from identical doubles), per-point sums are
    64-term and the final 4dp rounding of a ~50-point mean absorbs
    their ulp-level order sensitivity — the same discipline
    sim_centroid_affinity ships with. Scale: one posexplode pass to
    (label, dim), distances via a broadcast join against the k·d=640
    row centroid frame; nothing quadratic, no UDF."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    )
    v = emb.select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.col("val").cast("double").alias("val"),
    )
    c = (
        v.groupBy(F.col("label").alias("clab"), "dim")
        .agg(F.round(F.avg("val"), 6).alias("cv"))
        .localCheckpoint()
    )
    cn = c.groupBy("clab").agg(F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("cnorm"))
    xn = v.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("xnorm")
    )
    dist = (
        v.join(F.broadcast(c), "dim")
        .groupBy("vec_id", "label", "clab")
        .agg(F.sum(F.col("val") * F.col("cv")).alias("dot"))
        .join(xn, "vec_id")
        .join(F.broadcast(cn), "clab")
        .select(
            "vec_id",
            "label",
            "clab",
            (1 - F.col("dot") / (F.col("xnorm") * F.col("cnorm"))).alias("dist"),
        )
    )
    s = dist.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clab") == F.col("label"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("clab") != F.col("label"), F.col("dist"))).alias("b"),
    )
    return s.groupBy(F.col("label").cast("int").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.avg((F.col("b") - F.col("a")) / F.greatest("a", "b")), 4
        ).alias("avg_silhouette"),
    )


# ---------------------------------------------------------------------------
# Degree-capped neighborhood Jaccard — the scale path for
# graph_jaccard_neighbors (benched out at Σdeg² ≈ 26 s / sf0.1).
# Hub via-nodes (degree > CAP) are dropped from the common-neighbor
# INDEX ONLY; degrees in the denominator stay exact. Work bound:
# Σ_{deg(n)≤C} deg(n)² ≤ C·|E| — linear in edges at fixed C.
# ---------------------------------------------------------------------------

_JACC_CAP = 128


@query(
    "graph_jaccard_capped",
    f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e1 AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
edges AS (SELECT src, dst FROM e1 UNION ALL SELECT dst, src FROM e1),
deg AS (SELECT src AS node, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src),
idx AS (
  SELECT e.src, e.dst FROM edges e
  JOIN deg ON deg.node = e.dst
  WHERE deg.d <= {_JACC_CAP}
),
common AS (
  SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS DOUBLE) AS c
  FROM idx a JOIN idx b ON a.dst = b.dst AND a.src < b.src
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
SELECT u AS part_a, v AS part_b, ROUND(jac, 6) AS jaccard_capped
FROM r WHERE rk <= 50
""",
)
def graph_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 co-purchase part pairs by DEGREE-CAPPED neighborhood
    Jaccard: via-nodes with degree > 128 are removed from the
    common-neighbor index (exactly the df-capped-postings lever from
    the shingle dedup family), bounding the pair join at C·|E| while
    the uncapped twin (graph_jaccard_neighbors, the registered exact
    oracle form) stays Σdeg². The capped count is a lower bound on
    the true overlap, so jaccard_capped ≤ jaccard — the estimator's
    bias is one-sided and the cap literal is mirrored in the oracle,
    making THIS query's semantics exact (hash-verified) even though
    it estimates the uncapped quantity. Fidelity note: this synthetic
    co-purchase graph is uniform-dense (sf0.001 degrees 49–138, sf0.1
    38–222 — no real hub tail), so the exact top-50 jaccards are
    near-ties and ANY sparsifier reshuffles that ranking; the honest
    fidelity metric is pairwise, and tests assert corr(capped, exact)
    ≥ 0.9 over ALL pairs plus the one-sided bound on every pair
    (measured 0.996 / zero violations at cap 128, sf0.001). On a
    skewed real graph the same cap removes the hubs that drive Σdeg²
    — raising/lowering it trades fidelity against the C·|E| bound
    with no other plan change; degrees in the denominator stay
    exact."""
    from whisky_wine_etl_spark.operators.graph import copurchase_edges

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(li, both_directions=True).localCheckpoint()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("double").alias("d")
    )
    # allowed-via list is node-count-sized (tiny vs edges) → broadcast;
    # idx feeds BOTH sides of the pair self-join, so materialize it
    # once or each side re-runs the filter join
    idx = edges.join(
        F.broadcast(
            deg.filter(F.col("d") <= _JACC_CAP).select(
                F.col("node").alias("dst")
            )
        ),
        "dst",
    ).localCheckpoint()
    a, b = idx.alias("a"), idx.alias("b")
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
    # top-50 then a 50-row driver merge; a global row_number window
    # here would funnel the ENTIRE pair set into one task (the
    # uncapped twin round4p already uses this shape)
    return (
        j.orderBy(F.col("jac").desc(), "u", "v")
        .limit(50)
        .select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            F.round("jac", 6).alias("jaccard_capped"),
        )
    )
