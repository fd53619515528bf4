"""Round-4bd: MMR diversity re-ranking and periodogram seasonality.

Registered AFTER round4bc so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.

- ``sim_mmr_rerank`` is the retrieval-stack stage the sim_topk_*
  family feeds: maximal-marginal-relevance re-ranking (Carbonell &
  Goldstein '98), the standard diversity pass in RAG pipelines.
  Candidate generation and the pairwise similarity matrix are
  distributed; the greedy selection runs on the BOUNDED candidate
  set (30 rows / 870 pair sims — O(k²) driver traffic, independent
  of corpus size). Every similarity is rounded to 6 dp before any
  comparison, so the greedy path is bit-reproducible and the oracle
  replays it as unrolled argmax CTE levels.
- ``ts_periodogram_dft`` scores candidate seasonal periods by their
  normalized periodogram fraction — the spectral companion to
  ts_autocorr_hourly / ts_decompose_additive (which ASSUME a period;
  this one finds it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query

_N_CAND = 30
_K = 8
_LAM = 0.7


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_MMR_COS = """
q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings
  WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
),
rel0 AS MATERIALIZED (
  SELECT c.vec_id,
         ROUND(
           SUM(CAST(q.qv[t.i] AS DOUBLE) * CAST(c.embedding[t.i] AS DOUBLE))
           / (SQRT(SUM(CAST(q.qv[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)))
              * SQRT(SUM(CAST(c.embedding[t.i] AS DOUBLE)
                         * CAST(c.embedding[t.i] AS DOUBLE)))),
           6) AS rel
  FROM q JOIN embeddings c ON c.vec_id <> q.qid,
       LATERAL (SELECT unnest(range(1, 65)) AS i) t(i)
  GROUP BY c.vec_id
),
cand AS MATERIALIZED (
  SELECT vec_id, rel FROM rel0 ORDER BY rel DESC, vec_id LIMIT {ncand}
),
pair AS MATERIALIZED (
  SELECT a.vec_id AS pa, b.vec_id AS pb,
         ROUND(
           SUM(CAST(ea.embedding[t.i] AS DOUBLE)
               * CAST(eb.embedding[t.i] AS DOUBLE))
           / (SQRT(SUM(CAST(ea.embedding[t.i] AS DOUBLE)
                       * CAST(ea.embedding[t.i] AS DOUBLE)))
              * SQRT(SUM(CAST(eb.embedding[t.i] AS DOUBLE)
                         * CAST(eb.embedding[t.i] AS DOUBLE)))),
           6) AS sim
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id,
       LATERAL (SELECT unnest(range(1, 65)) AS i) t(i)
  GROUP BY a.vec_id, b.vec_id
),
sel1 AS MATERIALIZED (
  SELECT vec_id, rel, 1 AS rnk,
         FLOOR({lam} * rel * 1000000 + 0.5) / 1000000 AS mmr
  FROM cand ORDER BY rel DESC, vec_id LIMIT 1
)
"""

_MMR_STEP = """
pick{k} AS MATERIALIZED (
  SELECT c.vec_id, c.rel,
         FLOOR(({lam} * c.rel - {one_minus_lam} * MAX(p.sim))
               * 1000000 + 0.5) / 1000000 AS mmr
  FROM cand c
  JOIN pair p ON p.pa = c.vec_id
             AND p.pb IN (SELECT vec_id FROM sel{p})
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{p})
  GROUP BY c.vec_id, c.rel
  ORDER BY mmr DESC, c.vec_id LIMIT 1
),
sel{k} AS MATERIALIZED (
  SELECT vec_id, rel, rnk, mmr FROM sel{p}
  UNION ALL SELECT vec_id, rel, {k}, mmr FROM pick{k}
)
"""


@query(
    "sim_mmr_rerank",
    "WITH "
    + _MMR_COS.format(ncand=_N_CAND, lam=_LAM)
    + ","
    + ",".join(
        _MMR_STEP.format(k=k, p=k - 1, lam=_LAM, one_minus_lam=round(1 - _LAM, 10))
        for k in range(2, _K + 1)
    )
    + f"""
SELECT rnk, vec_id, rel AS relevance, mmr AS mmr_score FROM sel{_K}
""",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-rank: from the 30 candidates
    most cosine-similar to the min-id query vector, greedily pick 8
    maximizing λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s), λ=0.7.

    Scale split: candidate generation is the distributed brute-force
    cosine pass (one broadcast query row against the corpus — the
    same plan as sim_topk_bruteforce; swap in the IVF/LSH variants
    at 100 TB) and the pairwise matrix is a bounded 30×30 self-join;
    the greedy loop then runs on O(k²) DRIVER-side cells — bounded
    by the re-rank window, never the corpus (this is the documented
    bounded-driver contract shared with the IVF codebook and PAVA).
    All similarities are rounded to 6 dp BEFORE any comparison with
    (score, id) tie-breaks, so engine and oracle replay the same
    greedy path decision-for-decision."""
    from whisky_wine_etl_spark.functions.vector import dot, norm

    emb = _t(spark, sf_dir, "embeddings")
    qid = emb.agg(F.min("vec_id").alias("qid"))
    q = (
        emb.join(F.broadcast(qid), emb.vec_id == F.col("qid"))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qv"),
            norm(F.col("embedding")).alias("qn"),
        )
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "vec_id",
            F.round(
                dot(F.col("embedding"), F.col("qv"))
                / (norm(F.col("embedding")) * F.col("qn")),
                6,
            ).alias("rel"),
        )
    )
    wc = W.orderBy(F.col("rel").desc(), "vec_id")
    # two consumers read cand (the rel collect and, via ce, the pairs
    # collect) — without the checkpoint the corpus-wide scored pass +
    # global window runs twice (r13, guide §2.4). eager=False: the rel
    # collect right below is the materializing action.
    cand = (
        scored.withColumn("rk", F.row_number().over(wc))
        .filter(F.col("rk") <= _N_CAND)
        .drop("rk")
        .localCheckpoint(eager=False)
    )
    ce = cand.join(emb, "vec_id").select(
        "vec_id", "rel", "embedding", norm(F.col("embedding")).alias("nn")
    )
    a = ce.select(
        F.col("vec_id").alias("pa"),
        F.col("embedding").alias("ea"),
        F.col("nn").alias("na"),
    )
    b = ce.select(
        F.col("vec_id").alias("pb"),
        F.col("embedding").alias("eb"),
        F.col("nn").alias("nb"),
    )
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("pa") != F.col("pb"))
        .select(
            "pa",
            "pb",
            F.round(
                dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("sim"),
        )
    )
    # bounded driver traffic: 30 rel rows + 870 pair sims (O(k²) in
    # the re-rank window, SF-independent)
    rel = {r["vec_id"]: r["rel"] for r in cand.collect()}
    sim = {(r["pa"], r["pb"]): r["sim"] for r in pairs.collect()}

    import math

    def r6(x: float) -> float:
        # floor(x·1e6 + 0.5)/1e6 on BOTH engines: 0.7·rel − 0.3·pen
        # over 6 dp inputs lands exactly on 7th-dp halves, where
        # Python round (half-even) and SQL ROUND (half-away) disagree
        return math.floor(x * 1e6 + 0.5) / 1e6

    first = min(rel, key=lambda v: (-rel[v], v))
    sel = [(1, first, rel[first], r6(_LAM * rel[first]))]
    chosen = {first}
    for rnk in range(2, _K + 1):
        best = None
        for c in sorted(rel):
            if c in chosen:
                continue
            pen = max(sim[(c, s)] for s in chosen)
            mmr = r6(_LAM * rel[c] - round(1 - _LAM, 10) * pen)
            if best is None or mmr > best[3] or (mmr == best[3] and c < best[1]):
                best = (rnk, c, rel[c], mmr)
        sel.append(best)
        chosen.add(best[1])
    return spark.createDataFrame(
        sel, "rnk int, vec_id long, relevance double, mmr_score double"
    )


@query(
    "ts_periodogram_dft",
    """
WITH d AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS i, v
  FROM (
    SELECT CAST(o_orderdate AS DATE) AS day,
           ROUND(SUM(o_totalprice), 6) AS v
    FROM orders GROUP BY CAST(o_orderdate AS DATE)
  ) s
),
c AS (SELECT i, v - (SELECT AVG(v) FROM d) AS vc FROM d),
p AS (SELECT CAST(range AS INT) AS period FROM range(2, 11)),
w AS (
  SELECT p.period, c.vc,
         ROUND(cos(2 * pi() * CAST(c.i % p.period AS DOUBLE) / p.period), 6)
           AS wc,
         ROUND(sin(2 * pi() * CAST(c.i % p.period AS DOUBLE) / p.period), 6)
           AS ws
  FROM c CROSS JOIN p
)
SELECT period,
       ROUND(
         (POW(SUM(vc * wc), 2) + POW(SUM(vc * ws), 2))
         / (COUNT(*) * SUM(vc * vc)),
         6) AS power_frac
FROM w GROUP BY period
""",
)
def ts_periodogram_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized periodogram of daily revenue at candidate periods
    2..10 days: power_frac(p) = (C_p² + S_p²)/(n·Σv_c²) with C_p =
    Σ v_c·cos(2πi/p), S_p = Σ v_c·sin(2πi/p) on the mean-centered
    series (Parseval-normalized, so fractions are comparable across
    series). A planted weekly cycle shows up as a spike at p=7.

    Scale: the data-sized work is one groupBy to the calendar grain;
    the DFT is a (days × 9)-cell cross join over the bounded daily
    frame — SF-independent, like the other ts_* diagnostics. The
    cos/sin weights are rounded to 6 dp so both engines' libm ulp
    differences cannot reach the aggregate."""
    o = _t(spark, sf_dir, "orders")
    day = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 6).alias("v")
    )
    d = day.select(
        (F.row_number().over(W.orderBy("day")) - 1).alias("i"), "v"
    )
    mean = d.agg(F.avg("v").alias("mv"))
    c = d.crossJoin(F.broadcast(mean)).select(
        "i", (F.col("v") - F.col("mv")).alias("vc")
    )
    p = _t(spark, sf_dir, "orders").sparkSession.range(2, 11).select(
        F.col("id").cast("int").alias("period")
    )
    ang = (
        2
        * F.lit(3.141592653589793)
        * (F.col("i") % F.col("period")).cast("double")
        / F.col("period")
    )
    w = c.crossJoin(F.broadcast(p)).select(
        "period",
        "vc",
        F.round(F.cos(ang), 6).alias("wc"),
        F.round(F.sin(ang), 6).alias("ws"),
    )
    return w.groupBy("period").agg(
        F.round(
            (
                F.pow(F.sum(F.col("vc") * F.col("wc")), 2)
                + F.pow(F.sum(F.col("vc") * F.col("ws")), 2)
            )
            / (F.count(F.lit(1)) * F.sum(F.col("vc") * F.col("vc"))),
            6,
        ).alias("power_frac")
    )
