"""Round-4c additions: skyline (Pareto frontier), sweep-line peak
concurrency, Welch's two-sample t-test, BM25 retrieval scoring,
exponentially-weighted moving average, and fully-distributed Lloyd's
k-means.

Registered AFTER round4b (plans.load_all imports this module last) so
the driver's unverified-first ordering keeps the earlier backlog in
the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.functions.rounding import pinned
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier — the "best tradeoff" operator (cheapest
# price at every quality level). The naive formulation is an
# all-pairs dominance anti-join (the oracle below); the engine plan
# exploits the 2-D structure: dominance only depends on the per-size
# MINIMUM price, so the frontier test collapses to a 50-row aggregate.
# ---------------------------------------------------------------------------


@query(
    "skyline_pareto_parts",
    """
SELECT a.p_partkey, a.p_size, a.p_retailprice
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
""",
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts minimizing p_retailprice while
    maximizing p_size. A part is dominated iff some part is <= on
    price and >= on size with one strict.

    Scale plan: 2-D skyline needs no pairwise comparison — a point
    survives iff (a) it has the min price of its size class and
    (b) that price is strictly below the min price of EVERY larger
    size (else the larger-size point dominates: size strictly
    greater, price <=). So: one partial-aggregated groupBy down to
    |distinct sizes| rows, an exclusive suffix-min window over that
    tiny aggregate (single task over ≤ C rows, C = size cardinality,
    never the fact table), and a broadcast join back. The oracle is
    the O(n²) NOT EXISTS form — ground truth, not the plan."""
    p = _t(spark, sf_dir, "part")
    per_size = p.groupBy("p_size").agg(F.min("p_retailprice").alias("__mp"))
    # exclusive suffix min over larger sizes; the window input is the
    # size-cardinality aggregate (tiny), not the parts table
    w = Window.orderBy(F.col("p_size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_sizes = (
        per_size.withColumn("__suf", F.min("__mp").over(w))
        .filter(F.col("__suf").isNull() | (F.col("__mp") < F.col("__suf")))
        .select("p_size", "__mp")
    )
    return (
        p.join(F.broadcast(frontier_sizes), "p_size")
        .filter(F.col("p_retailprice") == F.col("__mp"))
        .select("p_partkey", "p_size", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# Sweep-line peak concurrency — "max simultaneously-open sessions",
# the interval-overlap aggregate behind capacity planning. Each event
# opens a half-open 30-minute activity interval [ts, ts+30m).
# ---------------------------------------------------------------------------


@query(
    "events_max_concurrency",
    """
WITH pts AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 30 MINUTE AS t, -1 AS delta FROM events
),
run AS (
  SELECT event_type, t,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta) AS conc
  FROM pts
),
pk AS (
  SELECT event_type, t, conc,
         MAX(conc) OVER (PARTITION BY event_type) AS peak
  FROM run
)
SELECT event_type, CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
       MIN(t) AS first_peak_at
FROM pk WHERE conc = peak GROUP BY event_type
""",
)
def events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic sweep line: every interval contributes a +1 point at
    its start and a -1 at its end, the running sum of deltas ordered
    by (time, delta) is the live concurrency, and the answer is its
    max (+ the first instant it is reached).

    Semantics pinned for engine parity: ordering by (t, delta) puts
    closings before openings at equal timestamps (half-open
    intervals), and BOTH engines use the default RANGE frame, so
    tied points are peers sharing one cumulative value — the running
    sum is well-defined regardless of physical tie order. The window
    partitions on event_type; for a single giant key the two-pass
    range-partitioned prefix-sum pattern (operators/corpus.py) is the
    drop-in replacement, same semantics."""
    e = _t(spark, sf_dir, "events")
    opens = e.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    closes = e.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = opens.unionAll(closes)
    w = Window.partitionBy("event_type").orderBy("t", "delta")  # RANGE default
    run = pts.withColumn("conc", F.sum("delta").over(w))
    wp = Window.partitionBy("event_type")
    return (
        run.withColumn("peak", F.max("conc").over(wp))
        .filter(F.col("conc") == F.col("peak"))
        .groupBy("event_type")
        .agg(
            F.max("conc").alias("peak_concurrency"),
            F.min("t").alias("first_peak_at"),
        )
    )


# ---------------------------------------------------------------------------
# Welch's unequal-variance two-sample t-test — the A/B-test summary,
# computed exactly from one conditional-aggregation pass (no join, no
# second scan).
# ---------------------------------------------------------------------------


@query(
    "stat_ab_welch_ttest",
    """
SELECT
  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_a,
  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_b,
  ROUND(AVG(value) FILTER (WHERE event_type = 'purchase'), 6) AS mean_a,
  ROUND(AVG(value) FILTER (WHERE event_type = 'view'), 6) AS mean_b,
  ROUND(
    (AVG(value) FILTER (WHERE event_type = 'purchase')
     - AVG(value) FILTER (WHERE event_type = 'view'))
    / sqrt(VAR_SAMP(value) FILTER (WHERE event_type = 'purchase')
             / COUNT(*) FILTER (WHERE event_type = 'purchase')
           + VAR_SAMP(value) FILTER (WHERE event_type = 'view')
             / COUNT(*) FILTER (WHERE event_type = 'view')), 6) AS t_stat,
  ROUND(
    POWER(VAR_SAMP(value) FILTER (WHERE event_type = 'purchase')
            / COUNT(*) FILTER (WHERE event_type = 'purchase')
          + VAR_SAMP(value) FILTER (WHERE event_type = 'view')
            / COUNT(*) FILTER (WHERE event_type = 'view'), 2)
    / (POWER(VAR_SAMP(value) FILTER (WHERE event_type = 'purchase')
               / COUNT(*) FILTER (WHERE event_type = 'purchase'), 2)
         / (COUNT(*) FILTER (WHERE event_type = 'purchase') - 1)
       + POWER(VAR_SAMP(value) FILTER (WHERE event_type = 'view')
                 / COUNT(*) FILTER (WHERE event_type = 'view'), 2)
         / (COUNT(*) FILTER (WHERE event_type = 'view') - 1)), 4) AS welch_df
FROM events
WHERE event_type IN ('purchase', 'view')
""",
)
def stat_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t over `value` for purchase (A) vs view (B) events:
    t = (m̄_a − m̄_b) / √(s²_a/n_a + s²_b/n_b), df by
    Welch–Satterthwaite. One filtered scan with conditional
    aggregates — all six statistics partial-aggregate map-side, so
    the shuffle is a single row per task regardless of input size."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    a = F.col("event_type") == "purchase"
    b = F.col("event_type") == "view"

    def cond(agg_fn, flag):
        return agg_fn(F.when(flag, F.col("value")))

    n_a = F.count(F.when(a, F.lit(1)))
    n_b = F.count(F.when(b, F.lit(1)))
    va_n = cond(F.var_samp, a) / n_a
    vb_n = cond(F.var_samp, b) / n_b
    return e.agg(
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        F.round(cond(F.avg, a), 6).alias("mean_a"),
        F.round(cond(F.avg, b), 6).alias("mean_b"),
        F.round(
            (cond(F.avg, a) - cond(F.avg, b)) / F.sqrt(va_n + vb_n), 6
        ).alias("t_stat"),
        F.round(
            F.pow(va_n + vb_n, 2)
            / (F.pow(va_n, 2) / (n_a - 1) + F.pow(vb_n, 2) / (n_b - 1)),
            4,
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# BM25 keyword retrieval — the lexical-search scorer every RAG /
# training-data pipeline keeps next to its embeddings. Fixed query
# terms, Okapi BM25 with k1=1.2, b=0.75.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "scan", "filter")


@query(
    "text_bm25_search",
    """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
d AS (SELECT doc_id, len(tk) AS dl FROM tk),
s AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d),
tf AS (
  SELECT doc_id, t AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(tk) AS t FROM tk)
  WHERE t IN ('join', 'scan', 'filter')
  GROUP BY 1, 2
),
dfq AS (SELECT term, COUNT(*) AS dfc FROM tf GROUP BY 1),
sc AS (
  SELECT tf.doc_id,
         SUM(ln(1 + (CAST(s.n_docs - dfq.dfc AS DOUBLE) + 0.5)
                    / (CAST(dfq.dfc AS DOUBLE) + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * CAST(d.dl AS DOUBLE) / s.avgdl)))
           AS score
  FROM tf
  JOIN dfq USING (term)
  JOIN d USING (doc_id)
  CROSS JOIN s
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS bm25
FROM sc
ORDER BY bm25 DESC, doc_id
LIMIT 20
""",
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by Okapi BM25 against a fixed 3-term query.

    Plan shape: tokenize once; per-(doc, term) tf is an exploded
    groupBy that partial-aggregates map-side AFTER the isin filter
    (only query-term tokens survive the explode, so the shuffle
    carries ≤ |terms| rows per doc); document frequency and the
    (N, avgdl) scalars are tiny broadcast sides; the top-k is
    TakeOrderedAndProject on the ROUNDED score (both engines order by
    the same rounded value + doc_id, so the LIMIT boundary is
    deterministic across engines)."""
    docs = _t(spark, sf_dir, "documents")
    k1, b = 1.2, 0.75
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("tk")
    ).withColumn("dl", F.size("tk"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select("doc_id", "dl", F.explode("tk").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("dfc") + 0.5) / (F.col("dfc") + 0.5)
    )
    tf_norm = (
        F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * tf_norm).alias("score"))
        .select("doc_id", F.round("score", 6).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(20)


# ---------------------------------------------------------------------------
# Exponentially-weighted moving average — the smoothing/decay
# primitive (pandas ewm(adjust=False) semantics), expressed as a
# closed-form prefix sum instead of a sequential fold.
# ---------------------------------------------------------------------------


@query(
    "ts_ewma_user",
    """
WITH r AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
c AS (SELECT * FROM r WHERE rn <= 64),
p AS (
  SELECT user_id, rn,
         FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY rn) AS v1,
         SUM(value * POWER(0.8, -rn)) OVER (
           PARTITION BY user_id ORDER BY rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
  FROM c
)
SELECT user_id, CAST(rn AS BIGINT) AS rn,
       ROUND(POWER(0.8, rn) * (0.2 * pre + v1), 6) AS ewma
FROM p
""",
)
def ts_ewma_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (α=0.2, recursive y_n = α·v_n + (1−α)·y_{n−1}, y_1 = v_1)
    over each user's first 64 events.

    The recursion unrolls to the closed form
    y_n = q^n · (α·P_n + v_1) with q = 1−α and the prefix sum
    P_n = Σ_{k≤n} q^{−k} v_k — so the whole series is ONE keyed
    running-sum window (no sequential UDF, no collect_list). The
    64-row cap bounds q^{−rn} at q^{−64} ≈ 1.6e6, keeping the
    rescaled prefix far from double overflow; for unbounded series
    the same identity applies per fixed-size segment (carry y across
    segment boundaries). Both engines accumulate the prefix in
    ascending rn order, so the rounded values agree."""
    e = _t(spark, sf_dir, "events")
    alpha, q = 0.2, 0.8
    wrn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = (
        e.select(
            "user_id", "value", F.row_number().over(wrn).alias("rn")
        ).filter(F.col("rn") <= 64)
    )
    wu = Window.partitionBy("user_id").orderBy("rn")
    wrun = wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p = c.select(
        "user_id",
        "rn",
        F.first("value").over(wu).alias("v1"),
        F.sum(F.col("value") * F.pow(F.lit(q), -F.col("rn"))).over(wrun).alias("pre"),
    )
    return p.select(
        "user_id",
        F.col("rn").cast("long").alias("rn"),
        F.round(
            F.pow(F.lit(q), F.col("rn")) * (alpha * F.col("pre") + F.col("v1")), 6
        ).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Distributed Lloyd's k-means — iterative clustering where every
# assignment and centroid update runs on the executors; per-iteration
# driver traffic is the k×d centroid matrix only. Graduated in r10
# from the rows-only carve-out to a HASH-EXACT oracle by quantizing
# (the int8-ANN trick): all arithmetic is int64, so there is no FP
# summation order left for engines to disagree on. The float-Lloyd's
# operator (kmeans_fit_assign) remains for callers that want raw-FP
# centroids; its numpy parity stays pinned in tests/test_round4c_ops.
# ---------------------------------------------------------------------------


def _kmeans_quant_oracle(k: int, n_iter: int, scale: int) -> str:
    """Unrolled DuckDB twin of kmeans_fit_assign_quantized. Exactness
    argument (why this can be a hash oracle when float Lloyd's can't):

    - quantization: CAST(FLOOR(CAST(x AS DOUBLE)*scale + 0.5) AS
      BIGINT) is a per-element chain of individually-deterministic
      IEEE ops (exact f32→f64 widening, one correctly-rounded multiply
      and add, exact floor) — identical in Spark and DuckDB, with no
      aggregation order anywhere.
    - distances and sums are integer (DuckDB HUGEINT / Spark int64):
      associative, order-free; ties break to the lower cluster id on
      both sides (np.argmin first-match == ROW_NUMBER ORDER BY d2,
      cluster).
    - centroid update c̃ = round-half-up(S/n) = FLOOR((2S+n)/(2n)):
      computed in exact Python ints on the Spark side; here via DOUBLE
      division + FLOOR, exact because |2S+n| ≤ ~2e10 and 2n ≤ ~1e5 are
      both exactly representable, the quotient is correctly rounded to
      ≤6e-11 absolute error, and any non-integer true quotient is
      ≥ 1/(2n) ≥ 5e-6 away from an integer — so FLOOR never straddles.
      (DuckDB's integer // truncates toward zero, hence the DOUBLE
      form for negative sums.)"""
    parts = [
        f"""
WITH qv AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {scale} + 0.5)
              AS BIGINT) AS x
  FROM embeddings
),
init AS (
  SELECT vec_id,
         CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
),
c0 AS (SELECT i.cluster, q.dim, q.x AS c FROM init i JOIN qv q USING (vec_id))"""
    ]
    prev = "c0"
    for i in range(1, n_iter + 1):
        parts.append(
            f""",
d{i} AS (
  SELECT q.vec_id, c.cluster, SUM((q.x - c.c) * (q.x - c.c)) AS d2
  FROM qv q JOIN {prev} c USING (dim)
  GROUP BY q.vec_id, c.cluster
),
a{i} AS (
  SELECT vec_id, cluster
  FROM (SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cluster) AS rk
        FROM d{i})
  WHERE rk = 1
),
s{i} AS (
  SELECT a.cluster, q.dim, SUM(q.x) AS s, COUNT(*) AS n
  FROM a{i} a JOIN qv q USING (vec_id)
  GROUP BY a.cluster, q.dim
),
c{i} AS (
  SELECT p.cluster, p.dim,
         COALESCE(
           CAST(FLOOR((2 * CAST(s.s AS DOUBLE) + s.n)
                      / (2 * CAST(s.n AS DOUBLE))) AS BIGINT),
           p.c) AS c
  FROM {prev} p LEFT JOIN s{i} s USING (cluster, dim)
)"""
        )
        prev = f"c{i}"
    parts.append(
        f""",
dfin AS (
  SELECT q.vec_id, c.cluster, SUM((q.x - c.c) * (q.x - c.c)) AS d2
  FROM qv q JOIN {prev} c USING (dim)
  GROUP BY q.vec_id, c.cluster
)
SELECT vec_id, cluster, CAST(d2 AS BIGINT) AS sq_dist_q
FROM (SELECT vec_id, cluster, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY d2, cluster) AS rk
      FROM dfin)
WHERE rk = 1"""
    )
    return "".join(parts)


_KMEANS_QUANT_ORACLE = _kmeans_quant_oracle(k=8, n_iter=4, scale=1_000_000)


@query("sim_kmeans_lloyd", _KMEANS_QUANT_ORACLE)
def sim_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8 quantized Lloyd's over embeddings: deterministic
    lowest-vec_id init, 4 fixed update rounds, integer-exact output
    (vec_id, cluster, sq_dist_q at scale 1e6 — divide by 1e12 for the
    real-valued squared distance).

    See operators/clustering.py:kmeans_fit_assign_quantized for the
    scale contract (map-only Arrow assignment, O(tasks·k·d) update
    shuffle, k·d-int driver traffic per round) and the bit-identity
    argument that lets this iterative clusterer carry a HASH-EXACT
    DuckDB oracle (_kmeans_quant_oracle) where float Lloyd's was a
    rows-only carve-out: quantize once per element (no aggregation
    order in a per-element IEEE chain), then every distance, sum, and
    centroid update is exact integer arithmetic — associative,
    thread-count- and engine-independent."""
    from whisky_wine_etl_spark.operators.clustering import (
        kmeans_fit_assign_quantized,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_fit_assign_quantized(
        emb, "vec_id", "embedding", k=8, n_iter=4, scale=1_000_000
    )


# ---------------------------------------------------------------------------
# RFM segmentation — the classic customer-scoring rollup (recency /
# frequency / monetary quartiles). Quartile assignment is threshold
# scoring against the three exact percentile_disc boundaries (25/50/
# 75), broadcast as one row — NO global window anywhere in the plan
# (VERDICT r6 item 2 closed the former ntile version's single-task
# global sort). Ties on a metric now share a score, which is the
# better RFM semantic anyway.
# ---------------------------------------------------------------------------


@query(
    "stat_rfm_segments",
    """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
rfm AS (
  SELECT o_custkey,
         date_diff('day', MAX(CAST(o_orderdate AS DATE)), (SELECT maxd FROM mx))
           AS recency_days,
         COUNT(*) AS frequency,
         ROUND(SUM(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey
),
thr AS (
  SELECT
    percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_days) AS r25,
    percentile_disc(0.5)  WITHIN GROUP (ORDER BY recency_days) AS r50,
    percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_days) AS r75,
    percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency) AS f25,
    percentile_disc(0.5)  WITHIN GROUP (ORDER BY frequency) AS f50,
    percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency) AS f75,
    percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary) AS m25,
    percentile_disc(0.5)  WITHIN GROUP (ORDER BY monetary) AS m50,
    percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary) AS m75
  FROM rfm
)
SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency, monetary,
       CAST(4 - ((recency_days > r25)::INT + (recency_days > r50)::INT
                 + (recency_days > r75)::INT) AS INT) AS r_score,
       CAST(1 + (frequency > f25)::INT + (frequency > f50)::INT
              + (frequency > f75)::INT AS INT) AS f_score,
       CAST(1 + (monetary > m25)::INT + (monetary > m50)::INT
              + (monetary > m75)::INT AS INT) AS m_score
FROM rfm CROSS JOIN thr
""",
)
def stat_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer recency (days since last order, vs the corpus max
    date), frequency, monetary; each scored 1-4 by exact quartile
    THRESHOLDS where 4 = best (most recent / most frequent / highest
    spend): score = 1 + number of quartile boundaries the metric
    exceeds (mirrored for recency, where smaller is better).

    Scale notes (the VERDICT-r6 rewrite off global ntile windows):
    the per-customer rollup partial-aggregates map-side; the corpus
    max date is a 1-row broadcast. The three quartile boundaries per
    metric come from ONE exact percentile_disc aggregate (both
    engines pin the same rank-ceil(p*n) element, verified; Spark's
    exact-percentile aggregate is mergeable, memory O(distinct
    metric values) — bounded for integer recency/frequency, cents-
    grained monetary; pre-coarsening is the lever if ever needed),
    broadcast as ONE row, and scoring is a map-only CASE — zero
    Window nodes in the plan (tests/test_round4c_ops.py pins this).
    Ties on a metric share a score (threshold semantics), which both
    engines decide identically on exact ints / cents-rounded values;
    monetary is rounded BEFORE scoring so the compared key itself is
    fp-stable."""
    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("lastd"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff("maxd", "lastd").cast("long").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    thr = rfm.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {m})"
            ).alias(f"{m[0]}{int(p * 100)}")
            for m in ("recency_days", "frequency", "monetary")
            for p in (0.25, 0.5, 0.75)
        ]
    )
    gt = lambda m, t: (F.col(m) > F.col(t)).cast("int")  # noqa: E731
    return rfm.crossJoin(F.broadcast(thr)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        (
            F.lit(4)
            - gt("recency_days", "r25")
            - gt("recency_days", "r50")
            - gt("recency_days", "r75")
        ).alias("r_score"),
        (
            F.lit(1) + gt("frequency", "f25") + gt("frequency", "f50")
            + gt("frequency", "f75")
        ).alias("f_score"),
        (
            F.lit(1) + gt("monetary", "m25") + gt("monetary", "m50")
            + gt("monetary", "m75")
        ).alias("m_score"),
    )


# ---------------------------------------------------------------------------
# Association rules over order baskets — support / confidence / lift
# for directional part pairs, reusing the self-join-free in-basket
# pair generation (see graph_pagerank_copurchase).
# ---------------------------------------------------------------------------


@query(
    "assoc_rules_lift",
    """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
ic AS (SELECT l_partkey, COUNT(*) AS n_item FROM op GROUP BY 1),
pr AS (
  SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent, COUNT(*) AS n_both
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
),
r AS (
  SELECT pr.antecedent, pr.consequent, CAST(pr.n_both AS BIGINT) AS n_both,
         ROUND(CAST(pr.n_both AS DOUBLE) / n.n_orders, 6) AS support,
         ROUND(CAST(pr.n_both AS DOUBLE) / ia.n_item, 6) AS confidence,
         ROUND(CAST(pr.n_both AS DOUBLE) * n.n_orders
               / (ia.n_item * ib.n_item), 6) AS lift
  FROM pr
  JOIN ic ia ON ia.l_partkey = pr.antecedent
  JOIN ic ib ON ib.l_partkey = pr.consequent
  CROSS JOIN n
  WHERE pr.n_both >= 3
)
SELECT * FROM r ORDER BY lift DESC, antecedent, consequent LIMIT 100
""",
)
def assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket rules A→B with exact support, confidence, and
    lift; min co-occurrence 3, top-100 by lift.

    Scale plan: pairs come from per-order basket arrays (one
    orderkey shuffle, O(k²) in-array combination work with tiny
    basket k — never a fact-fact self-join); item counts and the
    order-count scalar are broadcast sides; the top-k is
    TakeOrderedAndProject on the ROUNDED lift + pair key, so the
    LIMIT boundary is engine-deterministic. All three metrics are
    ratios of exact integers (bit-stable after 6-dp round)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # ONE fact-table shuffle: collect_set folds the per-order dedup
    # into the basket aggregate, and the materialized baskets feed
    # the order count, the item counts, AND the pair generation —
    # without the checkpoint each consumer would re-run the scan and
    # the orderkey exchange (lazy plans don't share subtrees across
    # branches until runtime exchange reuse, which the three
    # different downstream shapes here defeat).
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    ).localCheckpoint(eager=True)
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    item_counts = baskets.select(
        F.explode("parts").alias("l_partkey")
    ).groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    # double explode + != filter, not nested HOF lambdas: explode is
    # whole-stage codegen while transform/filter lambdas interpret per
    # element (the round-5 copurchase_edges rewrite, same 2x)
    pairs = (
        baskets.select(F.explode("parts").alias("antecedent"), "parts")
        .select("antecedent", F.explode("parts").alias("consequent"))
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    ia = item_counts.select(
        F.col("l_partkey").alias("antecedent"), F.col("n_item").alias("n_a")
    )
    ib = item_counts.select(
        F.col("l_partkey").alias("consequent"), F.col("n_item").alias("n_b")
    )
    r = (
        pairs.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ib), "consequent")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            F.round(F.col("n_both") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_both") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                F.col("n_both") * F.col("n_orders") / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
    return r.orderBy(
        F.col("lift").desc(), "antecedent", "consequent"
    ).limit(100)


# ---------------------------------------------------------------------------
# Benford first-digit profile — the forensic data-quality screen for
# fabricated numeric columns. Digit extraction goes through integer
# formatting (floor → bigint → string), never log10, so fp rounding
# can't misclassify boundary values like 1000.
# ---------------------------------------------------------------------------


@query(
    "stat_benford_digits",
    """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM orders WHERE o_totalprice > 0
),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
t AS (SELECT SUM(n) AS total FROM c)
SELECT digit, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n AS DOUBLE) / t.total, 6) AS obs_frac,
       ROUND(log10(1 + CAST(1.0 AS DOUBLE) / digit), 6) AS benford_frac
FROM c CROSS JOIN t
""",
)
def stat_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed vs Benford-expected first-significant-digit
    distribution of order totals. One partial-aggregated scan down to
    ≤ 9 digit groups; the grand total joins back as a 1-row
    broadcast. (TPC-H-ish totals are sums of uniform prices, so the
    screen correctly reports a NON-Benford profile — the point of the
    operator is the measurement, not the law.)"""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("obs_frac"),
        F.round(F.log10(1 + 1.0 / F.col("digit")), 6).alias("benford_frac"),
    )


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick) — bag-of-words to a fixed
# 64-bucket sparse count vector without a vocabulary pass. The bucket
# hash is derived from md5 (identical in both engines), so the oracle
# is exact.
# ---------------------------------------------------------------------------


@query(
    "text_feature_hashing",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
h AS (
  SELECT doc_id,
         (ascii(substr(md5(term), 1, 1)) * 256
          + ascii(substr(md5(term), 2, 1))) % 64 AS feat_idx
  FROM tok WHERE term <> ''
)
SELECT doc_id, CAST(feat_idx AS INT) AS feat_idx, CAST(COUNT(*) AS BIGINT) AS n
FROM h GROUP BY doc_id, feat_idx
""",
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse hashed bag-of-words: term → bucket in [0, 64) via the
    first two md5 hex chars (engine-portable, unlike xxhash64), then
    per-(doc, bucket) counts. No vocabulary table, no global state —
    the featurizer is a single map+partial-agg pass whose output is
    bounded by 64 rows per document regardless of vocabulary size,
    which is exactly why the hashing trick scales where a dictionary
    join does not."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    h = tok.select(
        "doc_id",
        (
            (
                F.ascii(F.substring(F.md5("term"), 1, 1)) * 256
                + F.ascii(F.substring(F.md5("term"), 2, 1))
            )
            % 64
        )
        .cast("int")
        .alias("feat_idx"),
    )
    return h.groupBy("doc_id", "feat_idx").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Robust aggregates — trimmed and winsorized means per group: the
# outlier-resistant location estimates a metrics pipeline reports
# next to the plain mean.
# ---------------------------------------------------------------------------


@query(
    "agg_trimmed_winsorized",
    """
WITH th AS (
  SELECT l_returnflag,
         ROUND(quantile_cont(l_extendedprice, 0.1), 6) AS p10,
         ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(AVG(l.l_extendedprice), 4) AS mean_all,
       ROUND(AVG(CASE WHEN l.l_extendedprice BETWEEN th.p10 AND th.p90
                      THEN l.l_extendedprice END), 4) AS mean_trimmed,
       ROUND(AVG(LEAST(GREATEST(l.l_extendedprice, th.p10), th.p90)), 4)
         AS mean_winsorized
FROM lineitem l JOIN th USING (l_returnflag)
GROUP BY l.l_returnflag
""",
)
def agg_trimmed_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed and p10/p90-winsorized means of extended price per
    return flag. Two passes by necessity (thresholds are
    order statistics): pass 1 partial-aggregates the exact percentile
    per group (|groups| rows), which broadcasts back into a second
    conditional-aggregate scan. Thresholds are rounded to 6 dp on
    BOTH sides before clipping so a 1-ulp interpolation difference
    between engines cannot flip a boundary row's membership."""
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    th = li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.1), 6).alias("p10"),
        F.round(F.percentile("l_extendedprice", 0.9), 6).alias("p90"),
    )
    j = li.join(F.broadcast(th), "l_returnflag")
    x = F.col("l_extendedprice")
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg(x), 4).alias("mean_all"),
        F.round(
            F.avg(F.when((x >= F.col("p10")) & (x <= F.col("p90")), x)), 4
        ).alias("mean_trimmed"),
        F.round(
            F.avg(F.least(F.greatest(x, F.col("p10")), F.col("p90"))), 4
        ).alias("mean_winsorized"),
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence — are order status and priority
# associated? Exact integer contingency table, closed-form statistic.
# ---------------------------------------------------------------------------


@query(
    "stat_chi2_independence",
    """
WITH c AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
ra AS (SELECT a, SUM(n) AS na FROM c GROUP BY a),
rb AS (SELECT b, SUM(n) AS nb FROM c GROUP BY b),
t AS (SELECT SUM(n) AS total FROM c)
SELECT CAST(t.total AS BIGINT) AS n,
       CAST((COUNT(DISTINCT c.a) - 1) * (COUNT(DISTINCT c.b) - 1) AS BIGINT)
         AS dof,
       ROUND(SUM(POWER(c.n - CAST(ra.na AS DOUBLE) * rb.nb / t.total, 2)
                 / (CAST(ra.na AS DOUBLE) * rb.nb / t.total)), 6) AS chi2
FROM c JOIN ra USING (a) JOIN rb USING (b) CROSS JOIN t
GROUP BY t.total
""",
)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square over the o_orderstatus × o_orderpriority
    contingency table. The fact scan partial-aggregates straight down
    to the |statuses|·|priorities| cell table; marginals and the
    grand total derive from those cells (tiny broadcast joins), so
    the data-scale work is exactly one groupBy. Cells and marginals
    are exact integers → the statistic is bit-stable at 6 dp."""
    o = _t(spark, sf_dir, "orders")
    c = o.groupBy(
        F.col("o_orderstatus").alias("a"), F.col("o_orderpriority").alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    ra = c.groupBy("a").agg(F.sum("n").alias("na"))
    rb = c.groupBy("b").agg(F.sum("n").alias("nb"))
    t = c.agg(F.sum("n").alias("total"))
    j = (
        c.join(F.broadcast(ra), "a")
        .join(F.broadcast(rb), "b")
        .crossJoin(F.broadcast(t))
    )
    exp = F.col("na") * F.col("nb") / F.col("total")
    return j.groupBy("total").agg(
        F.countDistinct("a").alias("__ka"),
        F.countDistinct("b").alias("__kb"),
        F.round(F.sum(F.pow(F.col("n") - exp, 2) / exp), 6).alias("chi2"),
    ).select(
        F.col("total").cast("long").alias("n"),
        ((F.col("__ka") - 1) * (F.col("__kb") - 1)).cast("long").alias("dof"),
        "chi2",
    )


# ---------------------------------------------------------------------------
# PCA projection — embedding analytics beside k-means: top-4
# principal components of the 64-d embedding corpus. Rows-only driver
# check (eigenvectors are FP-iterative territory); numpy parity is
# pinned in tests.
# ---------------------------------------------------------------------------


@query("sim_pca_project")
def sim_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the corpus's top-4 principal
    components (see operators/clustering.py pca_project for the scale
    contract: one mapInPandas partial-Gram pass, driver-side d×d
    eigh, codegen-only projection)."""
    from whisky_wine_etl_spark.operators.clustering import pca_project

    emb = _t(spark, sf_dir, "embeddings")
    return pca_project(emb, "vec_id", "embedding", k=4)


# ---------------------------------------------------------------------------
# BPE merge-pair statistics — the TRAINING side of byte-pair
# encoding: the most frequent adjacent symbol pairs across the
# corpus, i.e. exactly the table a tokenizer trainer consults for its
# next merge.
# ---------------------------------------------------------------------------


@query(
    "text_bpe_merge_pairs",
    """
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
p AS (
  SELECT substr(word, i.i, 1) AS a, substr(word, i.i + 1, 1) AS b
  FROM w, LATERAL (SELECT unnest(range(1, len(word))) AS i) i(i)
  WHERE len(word) >= 2
)
SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM p GROUP BY a, b
ORDER BY n_pairs DESC, a, b
LIMIT 50
""",
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent character pairs over all word occurrences (the
    first-iteration BPE merge candidates). The pair enumeration is a
    per-word array transform (no self-join, no Python); counts
    partial-aggregate map-side down to the |alphabet|² table, and the
    top-k is TakeOrderedAndProject with a full (count, pair)
    tie-break so the LIMIT boundary is engine-deterministic."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.length("word") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> named_struct('a', substring(word, i, 1),"
                " 'b', substring(word, i + 1, 1)))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    counts = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_pairs"))
    return counts.orderBy(F.col("n_pairs").desc(), "a", "b").limit(50)


# ---------------------------------------------------------------------------
# Flesch reading ease — the classic readability score, computed from
# regex-derived sentence/word/syllable counts (vowel-group heuristic)
# in one map-only pass.
# ---------------------------------------------------------------------------


@query(
    "text_readability_flesch",
    """
WITH s AS (
  SELECT doc_id,
         greatest(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                                  x -> trim(x) <> '')), 1) AS n_sent,
         list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
),
m AS (
  SELECT doc_id, n_sent,
         greatest(len(words), 1) AS n_words,
         list_sum(list_transform(words,
           w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))) AS n_syll
  FROM s
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_syll AS BIGINT) AS n_syllables,
       -- pinned rounding (r8 audit rule 3) on pure-double ratios: the
       -- score is a rational of small integers, which can sit exactly
       -- on (or within ulps of) 4-dp halves where round rules split
       FLOOR((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sent)
                      - 84.6 * (CAST(n_syll AS DOUBLE) / n_words))
             * 10000 + 0.5) / 10000 AS flesch
FROM m
""",
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per document: 206.835 − 1.015·(words/
    sentences) − 84.6·(syllables/words), syllables estimated as
    vowel-group runs (min 1 per word). Sentence/word/syllable counts
    are all array-local regex work inside one map-only projection —
    zero shuffles. The score is a rational of exact integers, so both
    engines compute the identical double; the 4-dp emit uses the
    pinned floor(x*1e4+0.5)/1e4 discipline on BOTH engines because
    such rationals can sit exactly on rounding halves (r8 audit)."""
    docs = _t(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        F.greatest(
            F.size(
                F.filter(
                    F.split("text", r"[.!?]+"), lambda x: F.trim(x) != ""
                )
            ),
            F.lit(1),
        ).alias("n_sent"),
        F.filter(F.split("text", " "), lambda x: x != "").alias("words"),
    )
    m = s.select(
        "doc_id",
        "n_sent",
        F.greatest(F.size("words"), F.lit(1)).alias("n_words"),
        F.aggregate(
            F.transform(
                "words",
                lambda w: F.greatest(
                    F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
                    F.lit(1),
                ),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("n_syll"),
    )
    return m.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_syll").cast("long").alias("n_syllables"),
        pinned(
            F.lit(206.835)
            - 1.015 * (F.col("n_words") / F.col("n_sent"))
            - 84.6 * (F.col("n_syll") / F.col("n_words")),
            4,
        ).alias("flesch"),
    )


# ---------------------------------------------------------------------------
# Population stability index — the standard model-monitoring drift
# score between two time slices of a numeric feature, over fixed
# value buckets.
# ---------------------------------------------------------------------------


@query(
    "stat_psi_value_drift",
    """
WITH sliced AS (
  SELECT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'base'
              ELSE 'current' END AS slice,
         LEAST(CAST(floor(value / 10) AS INT), 10) AS bucket
  FROM events
),
c AS (SELECT slice, bucket, COUNT(*) AS n FROM sliced GROUP BY 1, 2),
t AS (SELECT slice, SUM(n) AS tot FROM c GROUP BY slice),
f AS (
  SELECT c.bucket,
         SUM(CASE WHEN c.slice = 'base'
                  THEN CAST(c.n AS DOUBLE) / t.tot END) AS p,
         SUM(CASE WHEN c.slice = 'current'
                  THEN CAST(c.n AS DOUBLE) / t.tot END) AS q
  FROM c JOIN t USING (slice) GROUP BY c.bucket
)
SELECT bucket, ROUND(p, 6) AS p_base, ROUND(q, 6) AS q_current,
       ROUND((p - q) * ln(p / q), 6) AS psi_term
FROM f
""",
)
def stat_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket PSI terms for events.value between the first and
    second half of the month (fixed width-10 buckets, tail clamped at
    100+ so every bucket is populated on both sides and the log is
    finite). One partial-aggregated scan to the (slice, bucket)
    cells; slice totals derive from the cells and broadcast back.
    Σ psi_term > 0.2 is the conventional 'significant drift' flag —
    emitting the per-bucket terms keeps the diagnosis, not just the
    verdict."""
    e = _t(spark, sf_dir, "events")
    sliced = e.select(
        F.when(
            F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"),
            F.lit("base"),
        )
        .otherwise(F.lit("current"))
        .alias("slice"),
        F.least(
            F.floor(F.col("value") / 10).cast("int"), F.lit(10)
        ).alias("bucket"),
    )
    c = sliced.groupBy("slice", "bucket").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("slice").agg(F.sum("n").alias("tot"))
    f = (
        c.join(F.broadcast(t), "slice")
        .groupBy("bucket")
        .agg(
            F.sum(
                F.when(F.col("slice") == "base", F.col("n") / F.col("tot"))
            ).alias("p"),
            F.sum(
                F.when(F.col("slice") == "current", F.col("n") / F.col("tot"))
            ).alias("q"),
        )
    )
    return f.select(
        "bucket",
        F.round("p", 6).alias("p_base"),
        F.round("q", 6).alias("q_current"),
        F.round((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 6).alias(
            "psi_term"
        ),
    )
