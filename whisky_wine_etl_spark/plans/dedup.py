"""Deduplication query plans over `documents` / `embeddings`.

Exact dedup, exact n-gram Jaccard (oracle ground truth), MinHash-LSH
and SimHash (approximate — rows-only driver check, recall vs the exact
oracle asserted in tests/), embedding-cosine near-dup (oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators import dedup as dd
from whisky_wine_etl_spark.plans.registry import query

_NORM = "lower(trim(regexp_replace(text, ' +', ' ', 'g')))"

# distinct word-3-gram shingles per doc, as a reusable DuckDB CTE
_SHINGLES_CTE = """
tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i.i:i.i+2], ' ') AS shingle
  FROM tk, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS i) i(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
jac AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ROUND(CAST(COUNT(*) AS DOUBLE) / (sa.n_sh + sb.n_sh - COUNT(*)), 6) AS jaccard
  FROM sh a
  JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN sizes sa ON sa.doc_id = a.doc_id
  JOIN sizes sb ON sb.doc_id = b.doc_id
  GROUP BY a.doc_id, b.doc_id, sa.n_sh, sb.n_sh
)
"""


@query(
    "dedup_exact",
    f"""
WITH uni AS (SELECT * FROM documents UNION ALL SELECT * FROM documents)
SELECT md5({_NORM}) AS text_md5,
       MIN(doc_id) AS doc_id,
       COUNT(*) AS n_copies
FROM uni
GROUP BY 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # duplicate the corpus so the dedup actually collapses something
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(docs.unionAll(docs))


@query(
    "dedup_ngram_jaccard",
    f"""
WITH {_SHINGLES_CTE}
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.jaccard_pairs(docs, threshold=0.5)


@query("dedup_minhash_lsh")  # LSH recall is probabilistic → rows-only driver check
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(docs, threshold=0.5)


@query("dedup_simhash")  # banded Hamming recall is heuristic → rows-only driver check
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dd.simhash_pairs(docs, max_hamming=3)


_COS_PAIRS = """
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(
           SUM(CAST(a.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE))
           / (SQRT(SUM(CAST(a.embedding[t.i] AS DOUBLE) * CAST(a.embedding[t.i] AS DOUBLE)))
              * SQRT(SUM(CAST(b.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE)))),
           4) AS cos_sim
  FROM embeddings a
  JOIN embeddings b ON a.vec_id < b.vec_id,
       LATERAL (SELECT unnest(range(1, 65)) AS i) t(i)
  GROUP BY a.vec_id, b.vec_id
)
"""


@query(
    "dedup_embedding_cosine",
    f"""
WITH {_COS_PAIRS}
SELECT vec_a, vec_b, cos_sim FROM pairs WHERE cos_sim >= 0.4
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dd.embedding_near_dup_pairs(emb, threshold=0.4)


@query("dedup_embedding_cosine_lsh")  # LSH recall probabilistic → rows-only check
def dedup_embedding_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for embedding near-dup: multi-table hyperplane LSH
    buckets (same family as sim_topk_lsh) generate candidate pairs,
    exact cosine verifies — work ∝ bucket collisions, never all pairs.
    The brute-force twin (dedup_embedding_cosine) is the oracle-checked
    ground truth; tests assert recall between the two."""
    from whisky_wine_etl_spark.operators.similarity import lsh_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_near_dup_pairs(emb, threshold=0.4)


@query(
    "dedup_clusters",
    f"""
WITH RECURSIVE {_SHINGLES_CTE},
edges1 AS (SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.5),
edges AS (SELECT src, dst FROM edges1 UNION SELECT dst, src FROM edges1),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
)
SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup GROUPS: connected components over the
    exact-Jaccard pair graph (min reachable id = cluster id), every
    corpus doc covered (singletons included). The oracle computes the
    same transitive closure with a recursive CTE."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs(docs, threshold=0.5)
    return dd.connected_components(pairs, nodes=docs.select("doc_id"))


@query("dedup_clusters_lsh")  # LSH pair recall probabilistic → rows-only check
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB clustering composition: MinHash-LSH candidate pairs
    (work ∝ bucket collisions, never all-pairs) feed the same
    connected-components step as the exact path. `dedup_clusters`
    stays as the oracle-checked twin; tests assert cluster-set recall
    between the two (LSH can only MERGE FEWER docs — its pair set is a
    subset of the exact pairs after the exact-Jaccard verify, so every
    LSH cluster is a refinement of an exact cluster)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
    return dd.connected_components(pairs, nodes=docs.select("doc_id"))


@query("dedup_canonical_summary_lsh")  # LSH recall probabilistic → rows-only
def dedup_canonical_summary_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level dedup outcome over the LSH-fed clusters — the
    summary a 100 TB run would actually produce (same shape as the
    oracle-checked `dedup_canonical_summary`)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
    clusters = dd.connected_components(pairs, nodes=docs.select("doc_id"))
    return clusters.agg(
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct("cluster_id")).alias("n_dropped"),
        F.sum(
            F.when(F.col("doc_id") == F.col("cluster_id"), 1).otherwise(0)
        ).cast("bigint").alias("n_canonical"),
    )


@query(
    "dedup_canonical_summary",
    f"""
WITH RECURSIVE {_SHINGLES_CTE},
edges1 AS (SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= 0.5),
edges AS (SELECT src, dst FROM edges1 UNION SELECT dst, src FROM edges1),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
),
clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a)
SELECT CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) - COUNT(DISTINCT cluster_id) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical
FROM clusters
""",
)
def dedup_canonical_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level dedup outcome: how many docs survive canonical
    (min-id-per-cluster) selection. n_canonical == n_clusters is the
    internal consistency check the oracle enforces."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs(docs, threshold=0.5)
    clusters = dd.connected_components(pairs, nodes=docs.select("doc_id"))
    return clusters.agg(
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct("cluster_id")).alias("n_dropped"),
        F.sum(
            F.when(F.col("doc_id") == F.col("cluster_id"), 1).otherwise(0)
        ).cast("bigint").alias("n_canonical"),
    )


@query("dedup_semantic")  # k-means clustering is not SQL-expressible → rows-only
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: IVF-cluster the embedding space,
    find over-threshold cosine pairs WITHIN clusters only, connect
    into groups, drop all but the min-id representative. The exact
    all-pairs twin (dedup_embedding_cosine) pins recall in
    tests/test_dedup_similarity.py."""
    from whisky_wine_etl_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    # 0.4 matches the exact twin's near-dup regime in this synthetic
    # embedding space (real text-embedding corpora sit nearer 0.95)
    return semantic_dedup(emb, threshold=0.4)
