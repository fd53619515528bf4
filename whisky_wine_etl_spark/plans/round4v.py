"""Round-4v additions: sketch/summary structures and their exact
twins — a Bloom-filter semi-join reduction, a Count-Min sketch with
measured overcount, mergeable fixed-bin histogram quantiles — plus
HITS hub/authority scoring, a largest-remainder integer allocation,
an item-item cosine recommender, ROC-AUC / calibration model
evaluation, and an inverted-index build.

Registered AFTER round4u so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.

All hash functions here are plain modular arithmetic ((k % P) * M % P
% width) rather than engine builtins, so Spark and the DuckDB oracle
compute bit-for-bit identical sketches — the same trick
operators/sampling.py uses for rerun-stable sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.materialize import materialize
from whisky_wine_etl_spark.plans.registry import query

_P = 2147483647  # 2^31 - 1, Mersenne prime: (k % P) * M fits in int64
_MULTS = (1000003, 1000033, 1000099)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction. The build side (customers with a
# >300k order) hashes each key into k=3 bit positions of an m=65536
# bloom; the probe side keeps only customers whose THREE positions are
# all set, then an exact semi-join removes the false positives. The
# result is bit-identical to the plain semi-join — the oracle IS the
# plain semi-join — which is the whole point: the bloom is a transport
# optimization, not a semantics change. At 100 TB the three position
# sets (≤ m rows each) broadcast for free and cut the shuffled probe
# volume before the only real exchange.
# ---------------------------------------------------------------------------


@query(
    "join_bloom_prefilter",
    """
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(c_acctbal), 2) AS bal_sum
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
GROUP BY c_mktsegment
""",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via an explicit (engine-portable) Bloom
    filter; the final exact semi-join guarantees the plain-semi-join
    answer, so false positives only cost work, never correctness."""
    m = 65536
    build = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
        .distinct()
    )
    cust = _t(spark, sf_dir, "customer")
    probe = cust
    for mult in _MULTS:
        positions = build.select(
            (((F.col("o_custkey") % _P) * mult) % _P % m).alias("pos")
        ).distinct()
        probe = probe.join(
            F.broadcast(positions),
            (((F.col("c_custkey") % _P) * mult) % _P % m) == F.col("pos"),
            "left_semi",
        )
    exact = probe.join(
        build, probe["c_custkey"] == build["o_custkey"], "left_semi"
    )
    return exact.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("bal_sum"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: d=3 rows × w=512 counters over l_partkey, then the
# true top-15 keys' estimates read back out of the sketch next to
# their exact counts. Both engines build the identical sketch (same
# arithmetic hashes), so est and overcount match exactly — the query
# demonstrates the sketch's mergeability (counter build is ONE
# partial-agg'd groupBy) and measures its error instead of hiding it.
# ---------------------------------------------------------------------------

_CMS_W = 512


def _cms_bucket_sql(key: str, mult: int) -> str:
    return f"((({key} % {_P}) * {mult}) % {_P}) % {_CMS_W}"


@query(
    "sketch_cms_topk_err",
    f"""
WITH sk AS (
  SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (
    SELECT 0 AS j, {_cms_bucket_sql('l_partkey', _MULTS[0])} AS bucket FROM lineitem
    UNION ALL
    SELECT 1 AS j, {_cms_bucket_sql('l_partkey', _MULTS[1])} AS bucket FROM lineitem
    UNION ALL
    SELECT 2 AS j, {_cms_bucket_sql('l_partkey', _MULTS[2])} AS bucket FROM lineitem
  ) GROUP BY j, bucket
),
topk AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM lineitem GROUP BY l_partkey
  ORDER BY exact_n DESC, l_partkey LIMIT 15
),
est AS (
  SELECT t.l_partkey, t.exact_n, MIN(sk.cnt) AS cms_n
  FROM topk t
  JOIN sk ON (sk.j = 0 AND sk.bucket = {_cms_bucket_sql('t.l_partkey', _MULTS[0])})
          OR (sk.j = 1 AND sk.bucket = {_cms_bucket_sql('t.l_partkey', _MULTS[1])})
          OR (sk.j = 2 AND sk.bucket = {_cms_bucket_sql('t.l_partkey', _MULTS[2])})
  GROUP BY t.l_partkey, t.exact_n
)
SELECT l_partkey, exact_n, cms_n, cms_n - exact_n AS overcount
FROM est ORDER BY exact_n DESC, l_partkey
""",
)
def sketch_cms_topk_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch build + point queries with measured overcount.

    Sketch build is one scan (explode to d rows) + one partial-agg'd
    groupBy on (j, bucket) — d×w counters total, mergeable across any
    partitioning, which is what makes CMS the 100 TB answer when the
    key domain is too wide for an exact count. The top-k read-back
    joins a 15-row frame against the ≤ d×w-row sketch (broadcast)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    buckets = [
        F.struct(
            F.lit(j).alias("j"),
            (((F.col("l_partkey") % _P) * mult) % _P % _CMS_W).alias("bucket"),
        )
        for j, mult in enumerate(_MULTS)
    ]
    sketch = (
        li.select(F.explode(F.array(*buckets)).alias("e"))
        .groupBy(F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    topk = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "l_partkey")
        .limit(15)
    )
    probes = topk.select(
        "l_partkey",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (((F.col("l_partkey") % _P) * mult) % _P % _CMS_W).alias(
                            "bucket"
                        ),
                    )
                    for j, mult in enumerate(_MULTS)
                ]
            )
        ).alias("e"),
    ).select("l_partkey", "exact_n", "e.j", "e.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("l_partkey", "exact_n")
        .agg(F.min("cnt").alias("cms_n"))
    )
    return est.select(
        "l_partkey",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
    ).orderBy(F.desc("exact_n"), "l_partkey")


# ---------------------------------------------------------------------------
# Mergeable fixed-bin histogram quantiles: each partition's partial
# histogram folds into a global one in a single partial-agg'd groupBy
# (the mergeability that exact percentile lacks), then p50/p90/p99
# read off the cumulative curve. Estimates are bin upper edges — the
# error bound is the bin width, stated, not hidden.
# ---------------------------------------------------------------------------


@query(
    "sketch_quantile_hist",
    """
WITH hist AS (
  SELECT CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
cum AS (
  SELECT bin, SUM(n) OVER (ORDER BY bin) AS cum,
         SUM(n) OVER () AS total
  FROM hist
),
qs AS (SELECT CAST(UNNEST([0.5, 0.9, 0.99]) AS DOUBLE) AS q)
SELECT q, CAST(MIN(total) AS BIGINT) AS total_n,
       CAST((MIN(bin) + 1) * 1000 AS DOUBLE) AS est_value
FROM qs JOIN cum ON cum.cum >= CEIL(q * cum.total)
GROUP BY q ORDER BY q
""",
)
def sketch_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles of o_totalprice (bin width 1000).

    The cumulative window runs over ~600 bins — a metric-sized frame,
    not the data — so the single-partition window is O(bins) however
    large the table. Exact percentile_cont needs a global sort or
    multi-pass selection; this is the mergeable streaming-friendly
    alternative with a stated ±bin_width bound."""
    o = _t(spark, sf_dir, "orders")
    hist = (
        o.select(F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    qs = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    return (
        qs.join(F.broadcast(cum), F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
        .groupBy("q")
        .agg(
            F.min("total").cast("bigint").alias("total_n"),
            ((F.min("bin") + 1) * 1000).cast("double").alias("est_value"),
        )
        .orderBy("q")
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities, two unrolled iterations over the
# customer→part purchase bipartite graph. Authority-1 is in-degree;
# hub-1 concentrates on customers buying popular parts; authority-2
# re-weights parts by who buys them. Max-normalized (deterministic, no
# sqrt-sum float ordering issues), rounded to 6dp.
# ---------------------------------------------------------------------------


@query(
    "graph_hits_authorities",
    """
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
a1 AS (SELECT p, CAST(COUNT(*) AS DOUBLE) AS a FROM edges GROUP BY p),
h1 AS (
  SELECT e.c, SUM(a1.a) AS h FROM edges e JOIN a1 ON a1.p = e.p GROUP BY e.c
),
a2 AS (
  SELECT e.p, SUM(h1.h) AS a FROM edges e JOIN h1 ON h1.c = e.c GROUP BY e.p
),
mx AS (SELECT MAX(a) AS amax FROM a2)
SELECT a2.p AS l_partkey, ROUND(a2.a / mx.amax, 6) AS authority
FROM a2, mx
ORDER BY authority DESC, l_partkey LIMIT 15
""",
)
def graph_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two HITS iterations as three joins + three aggs — each round is
    one shuffle keyed alternately on part/customer, the same
    message-passing shape as pagerank but over the bipartite purchase
    graph. The 1-row max normalizer is a broadcast cross join."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        # r12: edges feeds three consumers (a1, h1's join side, a2's
        # join side) — materialize the fact-join + distinct once
        # instead of once per consumer (measured 4.5 → 3.8 s median
        # at sf0.1; guide §2.4). r13: eager=False (the final collect
        # materializes it) + policy tier (fact-scale frame).
        .transform(lambda d: materialize(d, fact_scale=True))
    )
    a1 = edges.groupBy("p").agg(F.count(F.lit(1)).cast("double").alias("a"))
    h1 = edges.join(a1, "p").groupBy("c").agg(F.sum("a").alias("h"))
    a2 = edges.join(h1, "c").groupBy("p").agg(F.sum("h").alias("a"))
    mx = a2.agg(F.max("a").alias("amax"))
    return (
        a2.crossJoin(F.broadcast(mx))
        .select(
            F.col("p").alias("l_partkey"),
            F.round(F.col("a") / F.col("amax"), 6).alias("authority"),
        )
        .orderBy(F.desc("authority"), "l_partkey")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) allocation: hand out exactly 1000 units
# across nations proportional to revenue. All arithmetic is integer
# (revenue in cents) after one 2dp rounding, so both engines agree to
# the last seat; ties on remainder break by nationkey.
# ---------------------------------------------------------------------------


@query(
    "alloc_largest_remainder",
    """
WITH rev AS (
  SELECT n.n_nationkey, n.n_name,
         CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100, 0) AS BIGINT) AS rev_c
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_nationkey, n.n_name
),
base AS (
  SELECT n_nationkey, n_name, rev_c,
         (rev_c * 1000) // SUM(rev_c) OVER () AS floor_seats,
         (rev_c * 1000) % SUM(rev_c) OVER () AS rem
  FROM rev
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY rem DESC, n_nationkey) AS rnk,
         1000 - SUM(floor_seats) OVER () AS leftover
  FROM base
)
SELECT n_name, rev_c,
       CAST(floor_seats + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS seats
FROM ranked ORDER BY n_name
""",
)
def alloc_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer proportional allocation (Hamilton's method).

    The heavy part is the revenue rollup (one fact shuffle); the
    allocation itself runs on the 25-row nation frame, so the global
    windows are metric-sized. Revenue is fixed to cents BEFORE the
    divisions — pure int64 arithmetic from there on guarantees
    cross-engine agreement and Σseats = 1000 exactly."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_nationkey", "n_name")
        .agg(F.round(F.sum("rev") * 100, 0).cast("bigint").alias("rev_c"))
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    base = rev.select(
        "n_nationkey",
        "n_name",
        "rev_c",
        F.expr("rev_c * 1000 div sum(rev_c) over ()").alias("floor_seats"),
        ((F.col("rev_c") * 1000) % F.sum("rev_c").over(wall)).alias("rem"),
    )
    ranked = base.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), "n_nationkey"))
        .alias("rnk"),
        (F.lit(1000) - F.sum("floor_seats").over(wall)).alias("leftover"),
    )
    return ranked.select(
        "n_name",
        "rev_c",
        (
            F.col("floor_seats")
            + F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("seats"),
    ).orderBy("n_name")


# ---------------------------------------------------------------------------
# Item-item cosine recommender over per-order baskets. Reuses the
# basket edge builder (one orderkey shuffle, pairs emitted per basket
# — never a fact self-join); cosine = co / sqrt(n_i · n_j) with
# co ≥ 3 support, top-3 neighbors per item.
# ---------------------------------------------------------------------------


@query(
    "rec_item_item_cosine",
    """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_ord FROM b GROUP BY l_partkey),
co AS (
  SELECT x.l_partkey AS pa, y.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS co
  FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY x.l_partkey, y.l_partkey
  HAVING COUNT(*) >= 3
),
sym AS (
  SELECT pa AS item, pb AS other, co FROM co
  UNION ALL
  SELECT pb AS item, pa AS other, co FROM co
),
scored AS (
  SELECT s.item, s.other,
         ROUND(s.co / SQRT(ni.n_ord * nj.n_ord), 6) AS cosine
  FROM sym s JOIN n ni ON ni.l_partkey = s.item
             JOIN n nj ON nj.l_partkey = s.other
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY item
                               ORDER BY cosine DESC, other) AS rnk
  FROM scored
)
SELECT item, other, cosine, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3 ORDER BY item, rnk
""",
)
def rec_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: cosine over basket
    co-occurrence, top-3 neighbors per item at support ≥ 3.

    Pair generation is the shared basket builder (operators/graph.py)
    — one shuffle on orderkey, per-order k² pair emission, never a
    lineitem self-join. The per-item top-3 is a window over the
    co-pair frame (already support-pruned), keyed by item — the same
    TakeOrdered-per-group shape as topk_per_group."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # r12: ONE orderkey shuffle total. The basket aggregate is
    # materialized once and feeds BOTH the per-item order counts
    # (explode of the deduped baskets ≡ the former li.distinct()
    # row multiset — collect_set already dedups within an order) and
    # the pair emission that copurchase_edges(distinct=False) would
    # otherwise rebuild from scratch (guide §2.4: two fact-scale
    # shuffles → one; measured 2.4 → 1.9 s median at sf0.1).
    baskets = materialize(
        li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("parts")),
        fact_scale=True,
    )
    n = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ord"))
    )
    co = (
        baskets.select(F.explode("parts").alias("pa"), "parts")
        .select("pa", F.explode("parts").alias("pb"))
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
        .filter(F.col("co") >= 3)
    )
    sym = co.select(
        F.col("pa").alias("item"), F.col("pb").alias("other"), "co"
    ).unionAll(co.select(F.col("pb").alias("item"), F.col("pa").alias("other"), "co"))
    ni = n.select(F.col("l_partkey").alias("item"), F.col("n_ord").alias("ni"))
    nj = n.select(F.col("l_partkey").alias("other"), F.col("n_ord").alias("nj"))
    scored = (
        sym.join(ni, "item")
        .join(nj, "other")
        .select(
            "item",
            "other",
            F.round(F.col("co") / F.sqrt(F.col("ni") * F.col("nj")), 6).alias(
                "cosine"
            ),
        )
    )
    wr = Window.partitionBy("item").orderBy(F.desc("cosine"), "other")
    return (
        scored.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("item", "other", "cosine", "rnk")
        .orderBy("item", "rnk")
    )


# ---------------------------------------------------------------------------
# ROC-AUC by the rank statistic (Mann-Whitney with tie correction),
# computed from per-score positive/negative counts so the only
# ordered pass runs over DISTINCT scores, not rows. Label: order
# finished (o_orderstatus = 'F'); score: o_totalprice (does price
# separate finished orders?). AUC near 0.5 is the honest answer —
# the query pins the metric machinery, not a model's quality.
# ---------------------------------------------------------------------------


@query(
    "ml_roc_auc",
    """
WITH s AS (
  SELECT o_totalprice AS score,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS pos,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus <> 'F') AS BIGINT) AS neg
  FROM orders GROUP BY o_totalprice
),
c AS (
  SELECT pos, neg,
         SUM(neg) OVER (ORDER BY score) - neg AS neg_below,
         SUM(pos) OVER () AS n_pos, SUM(neg) OVER () AS n_neg
  FROM s
)
SELECT ROUND(SUM(pos * (neg_below + CAST(neg AS DOUBLE) / 2))
             / (MIN(n_pos) * MIN(n_neg)), 6) AS auc,
       ROUND(2 * SUM(pos * (neg_below + CAST(neg AS DOUBLE) / 2))
             / (MIN(n_pos) * MIN(n_neg)) - 1, 6) AS gini,
       CAST(MIN(n_pos) AS BIGINT) AS n_pos, CAST(MIN(n_neg) AS BIGINT) AS n_neg
FROM c
""",
)
def ml_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC via the rank-sum identity with tie handling:
    AUC = Σ_s pos_s·(neg_below_s + neg_s/2) / (P·N).

    The groupBy collapses rows to distinct scores first (mergeable,
    partial-agg'd); only the distinct-score frame takes the ordered
    cumulative window. That is the scalable form of AUC: no global
    row sort, no per-pair join — at 100 TB you'd additionally bin
    scores (sketch_quantile_hist's trick) to bound the distinct
    count."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    s = o.groupBy(F.col("o_totalprice").alias("score")).agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).cast("bigint").alias("pos"),
        F.count(F.when(F.col("o_orderstatus") != "F", 1)).cast("bigint").alias("neg"),
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    word = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    c = s.select(
        "pos",
        "neg",
        (F.sum("neg").over(word) - F.col("neg")).alias("neg_below"),
        F.sum("pos").over(wall).alias("n_pos"),
        F.sum("neg").over(wall).alias("n_neg"),
    )
    num = F.sum(F.col("pos") * (F.col("neg_below") + F.col("neg") / 2.0))
    den = F.min("n_pos") * F.min("n_neg")
    return c.agg(
        F.round(num / den, 6).alias("auc"),
        F.round(2 * num / den - 1, 6).alias("gini"),
        F.min("n_pos").cast("bigint").alias("n_pos"),
        F.min("n_neg").cast("bigint").alias("n_neg"),
    )


# ---------------------------------------------------------------------------
# Calibration-by-decile + Brier decomposition inputs for the same
# score/label pair: fixed [0,1) score bins (price / global max), per
# bin the mean score vs observed positive rate.
# ---------------------------------------------------------------------------


@query(
    "ml_calibration_bins",
    """
WITH mx AS (SELECT MAX(o_totalprice) AS m FROM orders),
b AS (
  SELECT LEAST(CAST(FLOOR(o_totalprice / mx.m * 10) AS BIGINT), 9) AS bin,
         o_totalprice / mx.m AS score,
         CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS DOUBLE) AS y
  FROM orders, mx
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(score), 6) AS mean_score,
       ROUND(AVG(y), 6) AS pos_rate,
       ROUND(AVG((score - y) * (score - y)), 6) AS brier
FROM b GROUP BY bin ORDER BY bin
""",
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile calibration table + per-bin Brier term. The global max
    normalizer is a 1-row broadcast; everything else is one
    partial-agg'd groupBy over 10 bins."""
    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_totalprice").alias("m"))
    b = o.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.floor(F.col("o_totalprice") / F.col("m") * 10).cast("bigint"), F.lit(9)
        ).alias("bin"),
        (F.col("o_totalprice") / F.col("m")).alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(F.avg("y"), 6).alias("pos_rate"),
            F.round(F.avg((F.col("score") - F.col("y")) ** 2), 6).alias("brier"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Inverted-index build: term → document frequency, total term
# frequency, and the head of its (sorted) posting list. Posting lists
# serialize to comma-joined strings so the cross-engine hash compare
# is representation-stable.
# ---------------------------------------------------------------------------


@query(
    "text_inverted_index",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS tf_total FROM tok
  WHERE term <> '' GROUP BY term
),
post AS (
  SELECT term, doc_id FROM tok WHERE term <> '' GROUP BY term, doc_id
),
idx AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq,
         array_to_string((list(doc_id ORDER BY doc_id))[1:8], ',') AS postings_head
  FROM post GROUP BY term
)
SELECT i.term, i.doc_freq, t.tf_total, i.postings_head
FROM idx i JOIN tf t ON t.term = i.term
ORDER BY i.doc_freq DESC, i.term LIMIT 30
""",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index head: top-30 terms by document frequency with
    the first 8 postings. One explode feeds BOTH aggregates (term tf
    and the per-(term,doc) dedup) — the posting-list collect runs on
    the deduped frame, so list size is bounded by doc_freq, and the
    head slice caps what ships to the result. At 100 TB the posting
    lists partition by term (the groupBy key) and each list stays a
    per-key aggregation — no global structure is materialized."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("tf_total"))
    post = tok.groupBy("term", "doc_id").agg(F.lit(1).alias("_one")).drop("_one")
    idx = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
        F.array_join(
            F.transform(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 8),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings_head"),
    )
    return (
        idx.join(tf, "term")
        .select("term", "doc_freq", "tf_total", "postings_head")
        .orderBy(F.desc("doc_freq"), "term")
        .limit(30)
    )
