"""Similarity-search, text-analysis and multimodal query plans."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators import multimodal as mm
from whisky_wine_etl_spark.operators import similarity as sim
from whisky_wine_etl_spark.operators import text as tx
from whisky_wine_etl_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_COS_SCORED = """
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         ROUND(
           SUM(CAST(q.qv[t.i] AS DOUBLE) * CAST(c.embedding[t.i] AS DOUBLE))
           / (SQRT(SUM(CAST(q.qv[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE)))
              * SQRT(SUM(CAST(c.embedding[t.i] AS DOUBLE) * CAST(c.embedding[t.i] AS DOUBLE)))),
           6) AS cos6
  FROM q
  JOIN embeddings c ON c.vec_id <> q.query_id,
       LATERAL (SELECT unnest(range(1, 65)) AS i) t(i)
  GROUP BY q.query_id, c.vec_id
),
ranked AS (
  SELECT query_id, cand_id, cos6,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos6 DESC, cand_id) AS INT) AS rk
  FROM scored
)
"""


@query(
    "sim_topk_bruteforce",
    f"""
WITH {_COS_SCORED}
SELECT query_id, cand_id, cos6 AS cos_sim, rk
FROM ranked WHERE rk <= 5
""",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return sim.brute_force_topk(emb, queries, k=5)


@query("sim_topk_lsh")  # ANN recall is probabilistic → rows-only driver check
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return sim.lsh_topk(emb, queries, k=5)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "text_token_stats",
    """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(length(text) AS INT) AS n_chars_actual,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_unique_tokens,
       -- pinned rounding (r8 audit rule 3): avg token length is a
       -- small-denominator rational that lands EXACTLY on 4-dp halves
       FLOOR(CAST(list_aggregate(list_transform(string_split(text, ' '), x -> length(x)), 'sum') AS DOUBLE)
             / len(string_split(text, ' ')) * 10000 + 0.5) / 10000 AS avg_token_len
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.token_stats(load_table(spark, sf_dir, "documents"))


_STOP = ", ".join(f"'{w}'" for w in tx.ENGLISH_STOPWORDS)


@query(
    "text_quality_score",
    f"""
WITH t AS (
  SELECT doc_id,
         string_split(text, ' ') AS toks,
         length(text) AS n_chars_actual
  FROM documents
),
feat AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
         CAST(len(list_filter(toks, w -> w IN ({_STOP}))) AS DOUBLE)
           / len(toks) AS stop_ratio,
         least(CAST(n_chars_actual AS DOUBLE) / 500.0, 1.0) AS length_credit
  FROM t
)
SELECT doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       -- pinned rounding (r8 audit rule 3): token ratios land EXACTLY
       -- on 4-dp halves (p/32 class) where engine round rules can split
       FLOOR(uniq_ratio * 10000 + 0.5) / 10000 AS unique_ratio,
       FLOOR(stop_ratio * 10000 + 0.5) / 10000 AS stopword_ratio,
       FLOOR((0.4 * length_credit + 0.4 * uniq_ratio
              + 0.2 * least(stop_ratio * 5, 1.0)) * 10000 + 0.5)
         / 10000 AS quality_score
FROM feat
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.quality_score(load_table(spark, sf_dir, "documents"))


def _lang_hits_sql() -> str:
    cols = []
    for lang, words in sorted(tx.LANG_STOPWORDS.items()):
        quoted = ", ".join(f"'{w}'" for w in words)
        cols.append(
            f"CAST(len(list_filter(string_split(text, ' '), w -> w IN ({quoted}))) AS INT)"
            f" AS hits_{lang}"
        )
    return ",\n       ".join(cols)


_LANGS = sorted(tx.LANG_STOPWORDS)
_BEST = "greatest({})".format(", ".join(f"hits_{lang}" for lang in _LANGS))
_PRED = "CASE "
for _lang in _LANGS:
    _PRED += f"WHEN hits_{_lang} = {_BEST} AND {_BEST} > 0 THEN '{_lang}' "
_PRED += "ELSE 'und' END"


@query(
    "text_language_id",
    f"""
WITH hits AS (SELECT doc_id, {_lang_hits_sql()} FROM documents)
SELECT doc_id, {', '.join(f'hits_{lang}' for lang in _LANGS)},
       {_PRED} AS pred_lang
FROM hits
""",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.language_id(load_table(spark, sf_dir, "documents"))


@query(
    "text_fingerprint",
    """
WITH t AS (
  SELECT doc_id, lower(trim(regexp_replace(text, ' +', ' ', 'g'))) AS norm
  FROM documents
),
tk AS (SELECT doc_id, norm, string_split(norm, ' ') AS toks FROM t),
w AS (
  SELECT doc_id, MIN(md5(array_to_string(toks[i.i:i.i+7], ' '))) AS rolling_min_fp
  FROM tk, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 7, 1) + 1)) AS i) i(i)
  GROUP BY doc_id
)
SELECT tk.doc_id, md5(tk.norm) AS doc_md5, w.rolling_min_fp
FROM tk JOIN w ON tk.doc_id = w.doc_id
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.fingerprint(load_table(spark, sf_dir, "documents"))


@query(
    "text_tfidf_top_terms",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS INT) AS rk
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rk FROM ranked WHERE rk <= 3
""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------

_MM_CTE = """
mm AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CASE WHEN doc_id % 2 = 0 THEN 'raw' ELSE 'compressed' END AS fmt,
         CAST(n_chars % 640 AS INT) AS width,
         CAST((doc_id * 7) % 480 AS INT) AS height,
         CAST(doc_id % 5 + 1 AS INT) AS n_frames,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
"""


@query(
    "mm_metadata_stats",
    f"""
WITH {_MM_CTE}
SELECT modality, fmt, COUNT(*) AS n,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       ROUND(AVG(width), 4) AS avg_width,
       ROUND(AVG(height), 4) AS avg_height
FROM mm GROUP BY modality, fmt
""",
)
def mm_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = mm.synthesize_multimodal(load_table(spark, sf_dir, "documents"))
    return t.groupBy(
        F.col("meta.modality").alias("modality"), F.col("meta.fmt").alias("fmt")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.round(F.avg("meta.width"), 4).alias("avg_width"),
        F.round(F.avg("meta.height"), 4).alias("avg_height"),
    )


@query(
    "mm_extract_features",
    """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST(CASE WHEN length(text) = 0 THEN -1 ELSE ascii(substring(text, 1, 1)) END AS INT)
         AS first_byte,
       CAST(octet_length(encode(text)) % 7 AS INT) AS byte_mod
FROM documents
""",
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = mm.synthesize_multimodal(load_table(spark, sf_dir, "documents"))
    return mm.extract_features(t)


@query(
    "mm_frame_samples",
    f"""
WITH {_MM_CTE}
SELECT m.doc_id, m.n_frames, CAST(f.frame_idx AS INT) AS frame_idx
FROM mm m, LATERAL (SELECT unnest(range(0, m.n_frames)) AS frame_idx) f
WHERE m.modality = 'video' AND f.frame_idx % 2 = 0
""",
)
def mm_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = mm.synthesize_multimodal(load_table(spark, sf_dir, "documents"))
    return mm.sample_frames(t, every=2)


@query(
    "text_regex_tokens",
    f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{tx.BPE_ISH_PATTERN}')) AS INT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS INT) AS n_alpha_tokens,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numeric_tokens,
       CAST(len(list_distinct(regexp_extract_all(text, '{tx.BPE_ISH_PATTERN}'))) AS INT)
         AS n_unique_bpe_tokens
FROM documents
""",
)
def text_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tx.regex_tokens(load_table(spark, sf_dir, "documents"))


@query(
    "udaf_embedding_centroid",
    """
SELECT CAST(vec_id % 8 AS BIGINT) AS grp, CAST(g.i AS INT) AS dim_idx,
       ROUND(AVG(CAST(embedding[g.i + 1] AS DOUBLE)), 6) AS centroid_val
FROM embeddings, (SELECT unnest(range(0, 64)) AS i) g(i)
GROUP BY 1, 2
""",
)
def udaf_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined AGGREGATE function surface: per-group embedding
    centroid via a grouped-agg @pandas_udf (Arrow batch per group,
    float64 numpy mean), flattened with posexplode so the oracle
    compares one scalar per (group, dimension). At scale this is the
    shape of learned-index / cluster-centroid maintenance jobs: one
    hash shuffle on the group key, Arrow transfer bounded by group
    count × dim."""
    from whisky_wine_etl_spark.functions.vector import centroid_pandas_udf

    centroid = centroid_pandas_udf()
    emb = load_table(spark, sf_dir, "embeddings")
    agg = emb.groupBy((F.col("vec_id") % 8).cast("bigint").alias("grp")).agg(
        centroid("embedding").alias("c")
    )
    return agg.select("grp", F.posexplode("c").alias("dim_idx", "v")).select(
        "grp",
        F.col("dim_idx").cast("int").alias("dim_idx"),
        F.round("v", 6).alias("centroid_val"),
    )


def _ivf_oracle(
    k: int = 5, n_lists: int = 16, n_probe: int = 4, kmeans_iters: int = 3
) -> str:
    """DuckDB twin of operators.similarity.ivf_topk (r10 graduated
    form): quantized Lloyd's coarse quantizer (shared CTE builder from
    plans/dedup — a cross-module reuse the recheck-derivation
    fingerprint does not track; the 3-SF parity sweep is the net),
    single-list corpus assignment + top-n_probe query probes by exact
    int64 distance, in-list rounded-cosine re-rank with the bruteforce
    oracle's exact formula and tie-break."""
    from whisky_wine_etl_spark.plans.dedup import _quant_kmeans_cte

    return f"""
WITH {_quant_kmeans_cte(n_lists, kmeans_iters, 1_000_000)},
inverted AS (
  SELECT vec_id AS cand_id, cluster AS list_id
  FROM (SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cluster) AS rk
        FROM dfin)
  WHERE rk = 1
),
probes AS (
  SELECT vec_id AS query_id, cluster AS list_id
  FROM (SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cluster) AS rk
        FROM dfin WHERE vec_id % 50 = 0)
  WHERE rk <= {n_probe}
),
scored AS (
  SELECT p.query_id, i.cand_id,
         ROUND(
           SUM(CAST(eq.embedding[t.i] AS DOUBLE)
               * CAST(ec.embedding[t.i] AS DOUBLE))
           / (SQRT(SUM(CAST(eq.embedding[t.i] AS DOUBLE)
                       * CAST(eq.embedding[t.i] AS DOUBLE)))
              * SQRT(SUM(CAST(ec.embedding[t.i] AS DOUBLE)
                         * CAST(ec.embedding[t.i] AS DOUBLE)))),
           6) AS cos_sim
  FROM probes p
  JOIN inverted i ON i.list_id = p.list_id AND i.cand_id <> p.query_id
  JOIN embeddings eq ON eq.vec_id = p.query_id
  JOIN embeddings ec ON ec.vec_id = i.cand_id,
       LATERAL (SELECT unnest(range(1, 65)) AS i) t(i)
  GROUP BY p.query_id, i.cand_id
)
SELECT query_id, cand_id, cos_sim,
       CAST(rk AS INT) AS rk
FROM (SELECT query_id, cand_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, cand_id) AS rk
      FROM scored)
WHERE rk <= {k}
"""


@query("sim_topk_ivf", _ivf_oracle())
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graduated r10 from the rows-only carve-out: with the coarse
    quantizer quantized-exact and the re-rank cosine fold-order-exact
    (operators/similarity.py:ivf_topk), the full IVF pipeline — list
    assignment, probes, scores, ranks — is bit-reproducible in DuckDB
    (_ivf_oracle). Recall vs sim_topk_bruteforce stays pinned in
    tests/test_dedup_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return sim.ivf_topk(emb, queries, k=5)


@query(
    "sim_topk_pandas_udf",
    f"""
WITH {_COS_SCORED}
SELECT query_id, cand_id, cos6 AS cos_sim, rk
FROM ranked WHERE rk <= 5
""",
)
def sim_topk_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k with the cosine computed by an Arrow-batched
    @pandas_udf instead of the JVM zip_with/aggregate fold — SAME
    oracle as sim_topk_bruteforce, proving the two paths agree to the
    rounded digit. NumPy summation order matches the fold (axis-1
    left-to-right), so the doubles agree bit-for-bit in practice."""
    from pyspark.sql import Window as W
    from whisky_wine_etl_spark.functions.vector import cosine_pandas_udf

    cos = cosine_pandas_udf()
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id", "cand_id", F.round(cos(F.col("qv"), F.col("cv")), 6).alias("cos6")
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos6").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "cand_id", F.col("cos6").alias("cos_sim"), "rk")
    )


@query(
    "mm_resize",
    """
WITH mm AS (
  SELECT doc_id, text,
         CAST(n_chars % 640 AS INT) AS width,
         CAST((doc_id * 7) % 480 AS INT) AS height
  FROM documents
),
r AS (
  SELECT doc_id,
         CAST(least(width, 64) AS INT) AS width,
         CAST(least(height, 64) AS INT) AS height,
         least(CAST(least(width, 64) AS BIGINT) * least(height, 64) // 16,
               length(text)) AS n_bytes
  FROM mm
)
SELECT r.doc_id, r.width, r.height,
       CAST(r.n_bytes AS INT) AS n_bytes,
       md5(substr(m.text, 1, CAST(r.n_bytes AS INT))) AS payload_md5
FROM r JOIN mm m ON m.doc_id = r.doc_id
""",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize through Arrow-batched mapInPandas (fake
    resample, real plumbing): dimensions clamped to a 64x64 box,
    payload truncated to w*h/16 bytes; the md5 pins the exact bytes
    the Python stage produced."""
    docs = load_table(spark, sf_dir, "documents")
    resized = mm.resize_payload(mm.synthesize_multimodal(docs))
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.length("payload").cast("int").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


@query(
    "mm_resize_real",
    """
WITH dims AS (
  SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS w,
         CAST(8 + (doc_id * 3) % 7 AS BIGINT) AS h
  FROM documents
),
grid AS (
  SELECT gx.x AS xt, gy.y AS yt
  FROM generate_series(0, 9) gx(x), generate_series(0, 9) gy(y)
),
px AS (
  SELECT d.doc_id,
         (d.doc_id*7  + ((xt*d.w)//10)*3  + ((yt*d.h)//10)*5) % 256
       + (d.doc_id*11 + ((xt*d.w)//10)*13 + ((yt*d.h)//10))   % 256
       + (d.doc_id*3  + ((xt*d.w)//10)    + ((yt*d.h)//10)*17) % 256 AS s
  FROM dims d CROSS JOIN grid
)
SELECT doc_id, CAST(10 AS INT) AS width, CAST(10 AS INT) AS height,
       CAST(374 AS INT) AS n_bytes, CAST(SUM(s) AS BIGINT) AS pixel_sum
FROM px GROUP BY doc_id
""",
)
def mm_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec multimodal resize: build a valid 24-bit BMP per doc
    (pure-Python codec, functions/bmp.py), then decode → nearest-
    resample to 10×10 → re-encode → decode again inside Arrow-batched
    mapInPandas. The oracle reproduces the decoded pixel statistics
    closed-form (pixels are functions of doc_id,x,y and the nearest
    index arithmetic is floor(x·w/10)), so the value-hash pins the
    whole codec round trip: a padding, row-order, or truncation bug
    shifts pixel_sum. n_bytes = 54 header + 10 rows × 32-byte stride
    (30 pixel bytes padded to 4-byte alignment) — padding is live in
    the checked output."""
    docs = load_table(spark, sf_dir, "documents")
    resized = mm.resize_payload_real(mm.synthesize_bmp_corpus(docs))
    return resized.select("doc_id", "width", "height", "n_bytes", "pixel_sum")


@query(
    "func_try_arith",
    """
SELECT o_orderkey,
       ROUND(CASE WHEN o_custkey % 5 = 0 THEN NULL
                  ELSE o_totalprice / CAST(o_custkey % 5 AS DOUBLE) END, 4)
         AS safe_ratio,
       TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
       [o_orderkey, o_custkey][CAST(o_custkey % 4 + 1 AS INT)] AS maybe_elem
FROM orders
""",
)
def func_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic pack: `try_divide` (null on zero divisor),
    `try_cast` (null on malformed), `try_element_at` (null out of
    bounds — 1-based like DuckDB's list index). At scale the point is
    that TRY variants keep ANSI mode ON for the whole job: one bad row
    nulls out instead of killing a 1000-executor stage."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide("o_totalprice", (F.col("o_custkey") % 5).cast("double")), 4
        ).alias("safe_ratio"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
        F.try_element_at(
            F.array("o_orderkey", "o_custkey"), (F.col("o_custkey") % 4 + 1).cast("int")
        ).alias("maybe_elem"),
    )


@query(
    "window_count_distinct_running",
    """
SELECT event_id, user_id,
       CAST(COUNT(DISTINCT event_type)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_types
FROM events
""",
)
def window_count_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-count per key — SQL engines accept
    COUNT(DISTINCT) OVER, Spark does not: the idiomatic translation
    is size(collect_set() OVER), which keeps the distinct state as a
    bounded per-frame set (cardinality = event-type domain, not event
    count). At scale swap collect_set for a HLL sketch column when
    the distinct domain itself is unbounded."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias(
            "n_distinct_types"
        ),
    )
