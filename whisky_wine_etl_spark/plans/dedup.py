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


def _dk_horner(arr: str, idx: str, n: int, p: int, b: int) -> str:
    """DuckDB twin of operators.dedup._horner_expr: Horner-chain hash
    of n consecutive list elements (1-based `idx`), mod prime p, base
    b; out-of-range elements coalesce to 0. Operands are non-negative,
    so % == pmod and the int64 arithmetic is bit-identical."""
    e = f"(COALESCE({arr}[{idx}], 0) % {p})"
    for j in range(1, n):
        e = f"(({e} * {b} + (COALESCE({arr}[{idx} + {j}], 0) % {p})) % {p})"
    return e


def _minhash_pairs_cte(
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 48,
    rows_per_band: int = 3,
    seed: int = 42,
) -> str:
    """DuckDB CTE chain reproducing operators.dedup.minhash_lsh_pairs
    EXACTLY — made possible by r10's engine-portable hash plumbing
    (md5 token hashes + dual Horner shingle combine + Horner band
    buckets; see shingle_hash_arrays' docstring for the bit-identity
    argument). The (a_i, b_i) family is baked in as literal VALUES from
    the same _hash_family(seed) the executors use. Ends with
    `mh_pairs(doc_a, doc_b, jaccard)` — candidates from band-bucket
    collisions, verified with exact Jaccard over the shared shingle
    sets, filtered at the ROUNDED threshold exactly like the Spark
    plan. NOTE: the engine constants (MERSENNE31 etc.) live in
    operators/dedup.py — cross-module, so the recheck-derivation
    fingerprint won't flag a change there; the 3-SF parity sweep is
    the net (documented limitation)."""
    p1, p2 = dd.MERSENNE31, dd.PRIME31B
    b1, b2 = dd.HORNER_B1, dd.HORNER_B2
    fam = dd._hash_family(num_hashes, seed)
    fam_values = ",\n       ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(fam)
    )
    h1 = _dk_horner("tha", "i.i", n, p1, b1)
    h2 = _dk_horner("tha", "i.i", n, p2, b2)
    slots = ", ".join(
        f"MAX(CASE WHEN hi % {rows_per_band} = {s} THEN mhv END) AS s{s}"
        for s in range(rows_per_band)
    )
    bb = f"(s0 % {p1})"
    for s in range(1, rows_per_band):
        bb = f"(({bb} * {b1} + (s{s} % {p1})) % {p1})"
    return f"""
tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tha AS (
  SELECT doc_id,
         list_transform(toks,
           t -> CAST(CONCAT('0x', substr(md5(t), 1, 15)) AS BIGINT)) AS tha
  FROM tk
),
shl AS (
  SELECT DISTINCT doc_id, {h1} * 2147483648 + {h2} AS sh
  FROM tha,
       LATERAL (SELECT unnest(range(1, greatest(len(tha) - {n - 1}, 1) + 1)) AS i) i(i)
),
fam(hi, fa, fb) AS (
  VALUES {fam_values}
),
mh AS (
  SELECT s.doc_id, f.hi, MIN((f.fa * (s.sh % {p1}) + f.fb) % {p1}) AS mhv
  FROM shl s CROSS JOIN fam f
  GROUP BY s.doc_id, f.hi
),
bnd AS (
  SELECT doc_id, hi // {rows_per_band} AS band, {slots}
  FROM mh GROUP BY doc_id, hi // {rows_per_band}
),
buckets AS (SELECT doc_id, band, {bb} AS bucket FROM bnd),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
                AND a.doc_id < b.doc_id
),
sizes_mh AS (SELECT doc_id, COUNT(*) AS n_sh FROM shl GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN shl sa ON sa.doc_id = c.doc_a
  JOIN shl sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  GROUP BY c.doc_a, c.doc_b
),
mh_pairs AS (
  SELECT doc_a, doc_b, jaccard
  FROM (
    SELECT i.doc_a, i.doc_b,
           ROUND(CAST(i.n_common AS DOUBLE)
                 / (za.n_sh + zb.n_sh - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes_mh za ON za.doc_id = i.doc_a
    JOIN sizes_mh zb ON zb.doc_id = i.doc_b
  )
  WHERE jaccard >= {threshold}
)
"""


_MINHASH_PAIRS_CTE = _minhash_pairs_cte()


@query(
    "dedup_minhash_lsh",
    f"""
WITH {_MINHASH_PAIRS_CTE}
SELECT doc_a, doc_b, jaccard FROM mh_pairs
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graduated r10 from the rows-only carve-out: with the hash
    family engine-portable (md5 + Horner mod-p — no xxhash64, no RNG
    at run time), the banded candidate generation AND the exact-
    Jaccard verify are bit-reproducible in DuckDB, so the driver
    hash-gates the full pair set instead of row counts."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(docs, threshold=0.5)


def _simhash_oracle(bits: int = 60, max_hamming: int = 3) -> str:
    """DuckDB twin of operators.dedup.simhash_pairs: md5-top-60-bit
    token hashes (engine-portable), weighted bit sums, sign →
    fingerprint, 4-chunk pigeonhole banding, exact Hamming verify —
    integer arithmetic throughout, so bit-identical to the Spark
    plan."""
    s_cols = ",\n         ".join(
        f"SUM(CASE WHEN ((th >> {j}) & 1) = 1 THEN cnt ELSE -cnt END) AS s_{j}"
        for j in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    chunk_bits = bits // 4
    mask = (1 << chunk_bits) - 1
    chunk_rows = ", ".join(
        f"({i}, (simhash >> {i * chunk_bits}) & {mask})" for i in range(4)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, token, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY doc_id, token
),
th AS (
  SELECT doc_id, cnt,
         CAST(CONCAT('0x', substr(md5(token), 1, 15)) AS BIGINT) AS th
  FROM tok
),
sums AS (
  SELECT doc_id,
         {s_cols}
  FROM th GROUP BY doc_id
),
fp AS (SELECT doc_id, {fp} AS simhash FROM sums),
chunks AS (
  SELECT doc_id, simhash, c.chunk, c.val
  FROM fp, LATERAL (VALUES {chunk_rows}) c(chunk, val)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM chunks a
  JOIN chunks b ON a.chunk = b.chunk AND a.val = b.val
              AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= {max_hamming}
"""


@query("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graduated r10 with the MinHash family: the token hash is the
    engine-portable md5 bridge and every downstream step (weighted bit
    sums, sign fingerprint, chunk banding, Hamming verify) is integer
    arithmetic, so the pair set carries a hash-exact DuckDB oracle
    (_simhash_oracle) instead of the rows-only check."""
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


@query(
    "dedup_clusters_lsh",
    f"""
WITH RECURSIVE {_MINHASH_PAIRS_CTE},
edges1 AS (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs),
edges AS (SELECT src, dst FROM edges1 UNION SELECT dst, src FROM edges1),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
)
SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
""",
)
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB clustering composition: MinHash-LSH candidate pairs
    (work ∝ bucket collisions, never all-pairs) feed the same
    connected-components step as the exact path. `dedup_clusters`
    stays as the exact-Jaccard twin; tests assert cluster-set recall
    between the two (LSH can only MERGE FEWER docs — its pair set is a
    subset of the exact pairs after the exact-Jaccard verify, so every
    LSH cluster is a refinement of an exact cluster). Graduated r10:
    the pair set is engine-reproducible (see dedup_minhash_lsh), and
    connected components over a fixed edge set is deterministic, so
    the oracle runs the same transitive closure recursively."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
    return dd.connected_components(pairs, nodes=docs.select("doc_id"))


@query(
    "dedup_canonical_summary_lsh",
    f"""
WITH RECURSIVE {_MINHASH_PAIRS_CTE},
edges1 AS (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs),
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
       CAST(SUM(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_canonical
FROM clusters
""",
)
def dedup_canonical_summary_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level dedup outcome over the LSH-fed clusters — the
    summary a 100 TB run would actually produce (same shape as the
    exact twin `dedup_canonical_summary`). Graduated r10 with the rest
    of the MinHash family: engine-reproducible pairs → deterministic
    clusters → exact summary."""
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


def _quant_kmeans_cte(k: int, n_iter: int, scale: int) -> str:
    """CTE chain (no WITH keyword) for quantized Lloyd's over the
    embeddings table, ending in `dfin(vec_id, cluster, d2)` — the
    exact int64 distance of every vector to every FINAL centroid.
    Same unrolled integer-exact shape as
    plans/round4c._kmeans_quant_oracle (see there for the bit-identity
    argument). Shared by _semantic_oracle here and the sim_topk_ivf
    oracle in plans/extensions.py — a cross-module reuse the
    recheck-derivation fingerprint does not track (documented
    limitation; the 3-SF parity sweep is the net)."""
    parts = [
        f"""qv AS (
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
)"""
    )
    return "".join(parts)


def _semantic_oracle(
    k: int = 16,
    n_iter: int = 3,
    scale: int = 1_000_000,
    n_probe: int = 3,
    threshold: float = 0.4,
) -> str:
    """DuckDB twin of operators.similarity.semantic_dedup (r10
    graduated form): quantized Lloyd's coarse quantizer
    (_quant_kmeans_cte), top-n_probe list assignment by exact int64
    distance with ties to the lower list, in-list candidate pairs, the
    exact twin's LATERAL-unnest cosine ROUND(.,4) verify,
    recursive-CTE connected components over the over-threshold pairs,
    min-id representative."""
    parts = [
        "\nWITH RECURSIVE ",
        _quant_kmeans_cte(k, n_iter, scale),
    ]
    parts.append(
        f""",
inv AS (
  SELECT vec_id, cluster
  FROM (SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cluster) AS rk
        FROM dfin)
  WHERE rk <= {n_probe}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM inv a JOIN inv b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
),
cosp AS (
  SELECT c.vec_a, c.vec_b,
         ROUND(SUM(CAST(ea.embedding[t.i] AS DOUBLE)
                   * CAST(eb.embedding[t.i] AS DOUBLE))
               / (SQRT(SUM(CAST(ea.embedding[t.i] AS DOUBLE)
                           * CAST(ea.embedding[t.i] AS DOUBLE)))
                  * SQRT(SUM(CAST(eb.embedding[t.i] AS DOUBLE)
                             * CAST(eb.embedding[t.i] AS DOUBLE)))),
               4) AS cos_sim
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.vec_a
  JOIN embeddings eb ON eb.vec_id = c.vec_b,
       LATERAL (SELECT unnest(range(1, 65)) AS i) t(i)
  GROUP BY c.vec_a, c.vec_b
),
edges_t AS (SELECT vec_a, vec_b FROM cosp WHERE cos_sim >= {threshold}),
nodes AS (SELECT vec_a AS v FROM edges_t UNION SELECT vec_b FROM edges_t),
edges AS (SELECT vec_a AS src, vec_b AS dst FROM edges_t
          UNION SELECT vec_b, vec_a FROM edges_t),
reach(a, b) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
),
comp AS (SELECT a AS vec_id, MIN(b) AS rep_id FROM reach GROUP BY a)
SELECT vec_id, rep_id FROM comp WHERE vec_id <> rep_id"""
    )
    return "".join(parts)


@query("dedup_semantic", _semantic_oracle())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: IVF-cluster the embedding space,
    find over-threshold cosine pairs WITHIN clusters only, connect
    into groups, drop all but the min-id representative. The exact
    all-pairs twin (dedup_embedding_cosine) pins recall in
    tests/test_dedup_similarity.py.

    Graduated r10 from the rows-only carve-out: the coarse quantizer
    is distributed QUANTIZED Lloyd's (integer-exact, engine-
    reproducible — see operators/clustering.py), probe assignment is
    exact int64 top-n, and the verify cosine is the exact twin's
    adjudicated ROUND(.,4) fold, so the full removed→representative
    mapping carries a hash-exact DuckDB oracle (_semantic_oracle)."""
    from whisky_wine_etl_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    # 0.4 matches the exact twin's near-dup regime in this synthetic
    # embedding space (real text-embedding corpora sit nearer 0.95)
    return semantic_dedup(emb, threshold=0.4)
