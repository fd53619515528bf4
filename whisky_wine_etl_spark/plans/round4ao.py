"""Round-4ao: SQL pipe syntax, single-pass Observation metrics,
portable KMV distinct sketch with an exact oracle, incremental
aggregate-state maintenance, and product-quantization ANN.

Registered AFTER round4an so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.materialize import materialize
from whisky_wine_etl_spark.operators import similarity as sim
from whisky_wine_etl_spark.plans.registry import query

# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4.0+): the query reads top-to-bottom as a
# dataflow; Catalyst plans it identically to the nested-SELECT form.
# ---------------------------------------------------------------------------


@query(
    "sql_pipe_segment_revenue",
    """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY c.c_mktsegment
ORDER BY c_mktsegment
""",
)
def sql_pipe_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (`|>` operators, Spark 4.0+) end-to-end:
    FROM → WHERE → JOIN → AGGREGATE → ORDER BY reads as a linear
    dataflow, with both input tables bound as DataFrame args to
    spark.sql (no temp-view registration, no name collisions between
    concurrent queries in one session). The plan is byte-identical to
    the classic nested form — pipe syntax is pure parser sugar, so
    pushdown/broadcast behave exactly as in flagship_q5. Revenue sums
    decimal(18,2) exactly and only then casts to double, so engines
    cannot drift on addition order."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return spark.sql(
        """
        FROM {orders}
        |> WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |> JOIN {customer} ON o_custkey = c_custkey
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS revenue
           GROUP BY c_mktsegment
        |> ORDER BY c_mktsegment
        """,
        orders=orders,
        customer=customer,
    )


# ---------------------------------------------------------------------------
# Observation API: pipeline health metrics ride along with a real
# action instead of costing extra passes.
# ---------------------------------------------------------------------------


@query(
    "diag_observe_ingest",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(SUM(n_chars) AS BIGINT) AS chars_raw,
       CAST(COUNT(*) FILTER (WHERE n_chars BETWEEN 200 AND 5000) AS BIGINT)
         AS n_kept,
       CAST(COALESCE(SUM(n_chars) FILTER (WHERE n_chars BETWEEN 200 AND 5000), 0)
            AS BIGINT) AS chars_kept,
       ROUND(CAST(COUNT(*) FILTER (WHERE n_chars BETWEEN 200 AND 5000)
                  AS DOUBLE) / COUNT(*), 6) AS kept_share
FROM documents
""",
)
def diag_observe_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass ingest metrics via the Observation API: one
    observation on the raw scan, one after the length gate, both
    populated by the SAME noop-sink action — the scan runs ONCE and
    the metrics arrive as named accumulators, the way a production
    ingest job self-reports volumes without a second aggregation pass
    over 100 TB. The returned 1-row frame is built from the observed
    values, so the oracle independently proves the accumulator math
    (a FILTER-clause aggregate over the same table)."""
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")
    obs_raw = Observation("raw")
    obs_kept = Observation("kept")
    gated = (
        docs.observe(
            obs_raw,
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
        .filter(F.col("n_chars").between(200, 5000))
        .observe(
            obs_kept,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).alias("chars"),
        )
    )
    gated.write.format("noop").mode("overwrite").save()
    raw, kept = obs_raw.get, obs_kept.get
    row = (
        int(raw["n"]),
        int(raw["chars"]),
        int(kept["n"]),
        int(kept["chars"]),
        round(kept["n"] / raw["n"], 6),
    )
    return spark.createDataFrame(
        [row],
        "n_raw bigint, chars_raw bigint, n_kept bigint, chars_kept bigint, "
        "kept_share double",
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — a MERGEABLE cardinality
# sketch whose every number both engines can recompute exactly,
# because the hash is md5 (portable) and the estimator reads the
# k-th hash as a 48-bit integer (exact in both engines).
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_SCALE = 255 * (2**48)  # (k-1) * 16^12, exactly representable in double

# DuckDB lacks conv(hex, 16, 10); fold the first 12 hex chars into the
# same 48-bit integer Spark's conv() produces, digit by digit, in
# exact BIGINT arithmetic.
_HEX12 = " + ".join(
    f"(strpos('0123456789abcdef', substr(kth_hex, {i + 1}, 1)) - 1) "
    f"* CAST({16 ** (11 - i)} AS BIGINT)"
    for i in range(12)
)

def bottom_k(frame: DataFrame, k: int = _KMV_K) -> DataFrame:
    """k lexicographically smallest `hx` per `grp`, as a partial
    per-salt top-k then an exact top-k on the ≤16k survivors — k
    smallest of (k smallest per bucket) == global k smallest, and no
    single task ever sorts a whole group's hashes. Shared by the KMV
    cardinality and intersection sketches."""
    salted = frame.withColumn("salt", F.pmod(F.xxhash64("hx"), F.lit(16)))
    wp = Window.partitionBy("grp", "salt").orderBy("hx")
    part = (
        salted.withColumn("prk", F.row_number().over(wp))
        .filter(F.col("prk") <= k)
        .drop("salt", "prk")
    )
    wf = Window.partitionBy("grp").orderBy("hx")
    return part.withColumn("rk", F.row_number().over(wf)).filter(F.col("rk") <= k)


_KMV_SQL = f"""
WITH d AS (
  SELECT DISTINCT l_returnflag AS grp, l_partkey FROM lineitem
),
h AS (
  SELECT grp, md5(CAST(l_partkey AS VARCHAR)) AS hx FROM d
),
ranked AS (
  SELECT grp, hx,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY hx) AS rk
  FROM h
),
groups AS (
  SELECT grp, hx, rk FROM ranked WHERE rk <= {_KMV_K}
  UNION ALL
  SELECT '__all' AS grp, hx,
         ROW_NUMBER() OVER (ORDER BY hx) AS rk
  FROM (SELECT DISTINCT hx FROM h)
),
sk AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_in_sketch,
         MAX(hx) AS kth_hex
  FROM groups WHERE rk <= {_KMV_K}
  GROUP BY grp
),
ex AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_exact FROM h GROUP BY grp
  UNION ALL
  SELECT '__all', CAST(COUNT(DISTINCT hx) AS BIGINT) FROM h
)
SELECT sk.grp,
       ex.n_exact,
       ROUND(CASE WHEN sk.n_in_sketch < {_KMV_K}
                  THEN CAST(sk.n_in_sketch AS DOUBLE)
                  ELSE CAST({_KMV_SCALE} AS DOUBLE) / CAST(({_HEX12}) AS DOUBLE)
             END, 3) AS kmv_est,
       ROUND((CASE WHEN sk.n_in_sketch < {_KMV_K}
                   THEN CAST(sk.n_in_sketch AS DOUBLE)
                   ELSE CAST({_KMV_SCALE} AS DOUBLE) / CAST(({_HEX12}) AS DOUBLE)
              END - ex.n_exact) * 100.0 / ex.n_exact, 2) AS rel_err_pct
FROM sk JOIN ex ON sk.grp = ex.grp
ORDER BY sk.grp
"""


@query("sketch_kmv_distinct", _KMV_SQL)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-count sketch with a
    FULLY EXACT oracle — unlike HLL (`agg_hll_partial_union`'s
    rows-only carve-out), every emitted digit is engine-portable: the
    hash is md5 of the decimal key string, the ranking is
    lexicographic on fixed-width hex, and the estimator (k-1)/v_k
    reads the k-th hash's first 12 hex chars as an exact 48-bit
    integer. Sketches are per-group AND merged: the '__all' row is
    the k smallest of the union of per-group sketches — the
    mergeability that makes bottom-k the standard distributed
    distinct sketch (Bar-Yossef et al. 2002; DataSketches theta).

    Scale shape: the candidate set is pre-shrunk by a PARTIAL top-k —
    rank within (group, 16-way salt) first, keep k per salt bucket,
    then rank the ≤16k survivors per group — so no single task ever
    sorts a whole group's distinct hashes; the final window touches
    O(groups·salt·k) rows. Estimate error vs exact count is emitted
    per row (|rel_err| observed ≈2% at k=256)."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(F.col("l_returnflag").alias("grp"), "l_partkey").distinct()
    # r12: h feeds the per-group sketch AND the merged '__all' sketch
    # (plus the exact-count audit) — materialize the distinct+md5 once
    # (guide §2.4)
    h = materialize(
        d.select("grp", F.md5(F.col("l_partkey").cast("string")).alias("hx")),
        fact_scale=True,
    )
    per_group = bottom_k(h)
    merged = bottom_k(
        h.select(F.lit("__all").alias("grp"), "hx").distinct()
    )
    sk = (
        per_group.unionByName(merged)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_in_sketch"),
            F.max("hx").alias("kth_hex"),
        )
    )
    ex = (
        h.groupBy("grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
        .unionByName(
            h.agg(
                F.lit("__all").alias("grp"),
                F.countDistinct("hx").cast("bigint").alias("n_exact"),
            )
        )
    )
    v48 = F.conv(F.substring("kth_hex", 1, 12), 16, 10).cast("bigint")
    est = F.when(
        F.col("n_in_sketch") < _KMV_K, F.col("n_in_sketch").cast("double")
    ).otherwise(F.lit(float(_KMV_SCALE)) / v48.cast("double"))
    return (
        sk.join(ex, "grp")
        .select(
            "grp",
            "n_exact",
            F.round(est, 3).alias("kmv_est"),
            F.round(
                (est - F.col("n_exact")) * 100.0 / F.col("n_exact"), 2
            ).alias("rel_err_pct"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# Incremental aggregate-state maintenance: the materialized-view /
# lambda-architecture contract — merge(partial(base), partial(delta))
# must equal recompute(base ∪ delta), provably.
# ---------------------------------------------------------------------------


@query(
    "etl_incremental_agg_state",
    """
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 6) AS avg_price
FROM orders
GROUP BY o_custkey
""",
)
def etl_incremental_agg_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a customer-order rollup is
    kept as MERGEABLE state (count, sum, min, max — sum in exact
    decimal(18,2) so merge order cannot produce a different double),
    computed separately over the base partition (orders before
    1997-01-01) and the delta batch (1997+), then merged by re-
    aggregating the two state tables. The oracle recomputes from
    scratch over everything — so a green row IS the proof that
    merge(partial, partial) == recompute, the invariant every
    materialized view / streaming upsert sink relies on. avg derives
    from the merged state (never averaged averages). At 100 TB the
    base state is a compact table refreshed per batch; only the delta
    touches raw data."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "p", F.col("o_totalprice").cast("decimal(18,2)")
    )
    cutoff = F.lit("1997-01-01").cast("timestamp")

    def partial(frame: DataFrame) -> DataFrame:
        return frame.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p").alias("s"),
            F.min("p").alias("mn"),
            F.max("p").alias("mx"),
        )

    base = partial(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n").cast("bigint").alias("n_orders"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        F.col("s").cast("double").alias("sum_price"),
        F.col("mn").cast("double").alias("min_price"),
        F.col("mx").cast("double").alias("max_price"),
        F.round(
            F.col("s").cast("double") / F.col("n_orders"), 6
        ).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# Product-quantization ANN — graduated r10 from rows-only to a
# hash-exact oracle: candidate selection is exact int64 end to end
# (quantized vectors, integer codebook Lloyd's on the deterministic
# sample, integer ADC), and only the final re-rank uses the
# adjudicated rounded fold-cosine.
# ---------------------------------------------------------------------------


def _pq_oracle(
    k: int = 5,
    m: int = 4,
    ks: int = 16,
    n_candidates: int = 128,
    kmeans_iters: int = 4,
    scale: int = 1_000_000,
    dim: int = 64,
    sample_n: int = 4096,
) -> str:
    """DuckDB twin of operators.similarity.pq_topk (r10 graduated
    form). Reproduces the driver-side integer codebook training
    (per-subspace Lloyd's over the lowest-`sample_n` ids: exact int64
    distances, ties to the lower code, round-half-up centroid updates
    via the FLOOR(double-division) bridge — exact for |2S+n| ≤ ~4.4e9,
    see plans/round4c._kmeans_quant_oracle for the argument), then
    corpus codes, integer ADC scoring (m table lookups summed), top
    n_candidates per query by (adc, cand_id), and the bruteforce-
    formula rounded-cosine re-rank."""
    sub = dim // m
    parts = [
        f"""
WITH qv AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {scale} + 0.5)
              AS BIGINT) AS x
  FROM embeddings
),
smp AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {sample_n})
)"""
    ]
    for j in range(m):
        lo, hi = j * sub, (j + 1) * sub
        parts.append(
            f""",
b{j}_0 AS (
  SELECT CAST(s.rn - 1 AS INT) AS code, q.dim, q.x AS c
  FROM smp s JOIN qv q USING (vec_id)
  WHERE s.rn <= {ks} AND q.dim >= {lo} AND q.dim < {hi}
)"""
        )
        prev = f"b{j}_0"
        for i in range(1, kmeans_iters + 1):
            parts.append(
                f""",
d{j}_{i} AS (
  SELECT q.vec_id, c.code, SUM((q.x - c.c) * (q.x - c.c)) AS d2
  FROM qv q JOIN smp s USING (vec_id) JOIN {prev} c ON c.dim = q.dim
  WHERE q.dim >= {lo} AND q.dim < {hi}
  GROUP BY q.vec_id, c.code
),
a{j}_{i} AS (
  SELECT vec_id, code
  FROM (SELECT vec_id, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, code) AS rk
        FROM d{j}_{i})
  WHERE rk = 1
),
s{j}_{i} AS (
  SELECT a.code, q.dim, SUM(q.x) AS s, COUNT(*) AS n
  FROM a{j}_{i} a JOIN qv q USING (vec_id)
  WHERE q.dim >= {lo} AND q.dim < {hi}
  GROUP BY a.code, q.dim
),
b{j}_{i} AS (
  SELECT p.code, p.dim,
         COALESCE(
           CAST(FLOOR((2 * CAST(s.s AS DOUBLE) + s.n)
                      / (2 * CAST(s.n AS DOUBLE))) AS BIGINT),
           p.c) AS c
  FROM {prev} p LEFT JOIN s{j}_{i} s USING (code, dim)
)"""
            )
            prev = f"b{j}_{i}"
        parts.append(
            f""",
cd{j} AS (
  SELECT vec_id, code
  FROM (SELECT q.vec_id, c.code,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY SUM((q.x - c.c) * (q.x - c.c)),
                                           c.code) AS rk
        FROM qv q JOIN {prev} c ON c.dim = q.dim
        WHERE q.dim >= {lo} AND q.dim < {hi}
        GROUP BY q.vec_id, c.code)
  WHERE rk = 1
),
qd{j} AS (
  SELECT q.vec_id AS query_id, c.code,
         SUM((q.x - c.c) * (q.x - c.c)) AS d2
  FROM qv q JOIN {prev} c ON c.dim = q.dim
  WHERE q.vec_id % 50 = 0 AND q.dim >= {lo} AND q.dim < {hi}
  GROUP BY q.vec_id, c.code
)"""
        )
    codes_union = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS sp, code FROM cd{j}" for j in range(m)
    )
    qd_union = " UNION ALL ".join(
        f"SELECT query_id, {j} AS sp, code, d2 FROM qd{j}" for j in range(m)
    )
    parts.append(
        f""",
codes_all AS ({codes_union}),
qd_all AS ({qd_union}),
adc AS (
  SELECT q.query_id, c.vec_id AS cand_id, SUM(q.d2) AS adc
  FROM codes_all c
  JOIN qd_all q ON q.sp = c.sp AND q.code = c.code
  WHERE c.vec_id <> q.query_id
  GROUP BY q.query_id, c.vec_id
),
cands AS (
  SELECT query_id, cand_id
  FROM (SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc, cand_id) AS crk
        FROM adc)
  WHERE crk <= {n_candidates}
),
exact AS (
  SELECT cd.query_id, cd.cand_id,
         ROUND(
           SUM(CAST(eq.embedding[t.i] AS DOUBLE)
               * CAST(ec.embedding[t.i] AS DOUBLE))
           / (SQRT(SUM(CAST(eq.embedding[t.i] AS DOUBLE)
                       * CAST(eq.embedding[t.i] AS DOUBLE)))
              * SQRT(SUM(CAST(ec.embedding[t.i] AS DOUBLE)
                         * CAST(ec.embedding[t.i] AS DOUBLE)))),
           6) AS cos_sim
  FROM cands cd
  JOIN embeddings eq ON eq.vec_id = cd.query_id
  JOIN embeddings ec ON ec.vec_id = cd.cand_id,
       LATERAL (SELECT unnest(range(1, {dim + 1})) AS i) t(i)
  GROUP BY cd.query_id, cd.cand_id
)
SELECT query_id, cand_id, cos_sim, CAST(rk AS INT) AS rk
FROM (SELECT query_id, cand_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, cand_id) AS rk
      FROM exact)
WHERE rk <= {k}
"""
    )
    return "".join(parts)


@query("sim_topk_pq", _pq_oracle())
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via product quantization + asymmetric distance
    computation (see operators/similarity.py:pq_topk): corpus vectors
    compress to m=4 codebook codes, queries score candidates with
    four table lookups in whole-stage codegen over the codes column,
    and only the top-128 ADC candidates are re-ranked with exact
    cosine. Same query set and output contract as sim_topk_bruteforce
    / _lsh / _ivf, completing the ANN family with the compressed-
    domain member (the memory-bound regime where neither LSH buckets
    nor IVF lists fit raw vectors in RAM)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return sim.pq_topk(emb, queries, k=5)
