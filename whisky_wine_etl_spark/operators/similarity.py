"""Similarity search over embedding columns (array<float>).

Two paths:
- brute_force_topk: exact cosine top-k per query vector — quadratic,
  JVM-side array math, the correctness baseline and oracle target.
- lsh_topk: random-hyperplane LSH (fixed seed) — signature bucket
  join, exact re-rank within buckets, multiprobe via Hamming-1
  neighbors. The 100 TB path: candidate set ∝ bucket size, never the
  full corpus per query.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd  # top-level so pandas_udf type hints resolve
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from whisky_wine_etl_spark.functions.vector import cosine


def _mat(v: pd.Series, d: int) -> np.ndarray:
    """(n, d) float64 matrix from an Arrow list-column batch.

    An EMPTY Arrow batch is legal (a partition can deliver zero rows
    after a filter) but ``np.array([])`` is 1-D — the downstream
    ``axis=1`` reductions and matmuls would raise (ADVICE r4). Shape
    the empty case explicitly. NULL vectors are excluded by the
    operators' entry-point ``isNotNull`` filters; a RAGGED
    (wrong-length) vector is NOT screened here (ADVICE r5) — it would
    build an object array and fail the downstream matmul loudly. The
    embeddings source contract is fixed-width; callers feeding
    untrusted widths must pre-filter ``size(vec) == d``."""
    if len(v) == 0:
        return np.zeros((0, d), dtype=np.float64)
    return np.array(v.to_list(), dtype=np.float64)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: corpus × queries, rank window per query.
    Rank orders by (rounded cosine desc, candidate id) so results are
    deterministic across engines and partitionings.

    Each side's L2 norm is precomputed ONCE per row before the cross
    join — computing cosine() per pair would fold both norms again for
    every pair (3 array folds instead of 1 on the quadratic path)."""
    from whisky_wine_etl_spark.functions.vector import dot, norm

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot(F.col("query_vec"), F.col("cand_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        # emit the SAME 6dp quantity used for ranking — re-rounding to
        # 4dp double-rounds: a cos6 ending in ...50 is an exact decimal
        # half and HALF_UP/HALF_EVEN engines disagree on it
        .select("query_id", "cand_id", "cos_sim", "rk")
    )


def cosine_fold_udf():
    """Arrow-vectorized cosine that is BIT-IDENTICAL to the JVM
    zip_with/aggregate fold (functions/vector.py) and to an in-order
    SQL SUM: the accumulator loops dimensions in ascending order
    (vectorized across the batch, sequential in j), so each pair sees
    the exact IEEE op sequence acc = (acc + x_j·y_j) — einsum /
    ndarray.sum would use pairwise summation and drift in the last
    ulp. Returns the RAW double; rounding stays JVM-side (F.round) so
    half-up semantics match the adjudicated oracle pattern."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:  # empty Arrow batch (ADVICE r4)
            return pd.Series([], dtype="float64")
        xs = np.array(a.to_list(), dtype=np.float64)
        ys = np.array(b.to_list(), dtype=np.float64)
        num = np.zeros(len(xs))
        na = np.zeros(len(xs))
        nb = np.zeros(len(xs))
        for j in range(xs.shape[1]):
            num += xs[:, j] * ys[:, j]
            na += xs[:, j] * xs[:, j]
            nb += ys[:, j] * ys[:, j]
        return pd.Series(num / (np.sqrt(na) * np.sqrt(nb)))

    return _cos


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k via an IVF (inverted-file) index.

    Build: the coarse quantizer is DISTRIBUTED QUANTIZED Lloyd's
    (operators/clustering.py — integer-exact, engine-reproducible;
    r10, replacing the driver-sample float trainer). Search: one
    distributed scan assigns every corpus vector to its nearest
    centroid by exact int64 quantized distance (ties to the lower
    list); each query probes its `n_probe` nearest centroids (exact
    stable top-n) and re-ranks exactly within those lists only.

    Scale shape: centroids are O(n_lists·dim) ints — shipped in the
    UDF closures (KBs); the corpus is scanned once per Lloyd round
    plus once for assignment; a query touches ~n_probe/n_lists of the
    corpus. No quadratic stage anywhere.

    Scoring runs in Arrow-vectorized pandas UDFs (numpy per batch),
    NOT higher-order-function expressions: HOF lambdas are evaluated
    interpreted per element on the JVM, and measured ~3-5 s per scan
    at a few thousand rows×16 centroids×64 dims, vs milliseconds for
    the same math per Arrow batch. The re-rank cosine is the
    fold-order-exact cosine_fold_udf + JVM ROUND(.,6), so the whole
    pipeline — lists, probes, scores, ranks — is bit-reproducible in
    DuckDB and the query carries a hash-exact oracle (r10 graduation;
    see plans/extensions.py)."""
    from whisky_wine_etl_spark.operators.clustering import (
        kmeans_assign_quantized,
        kmeans_fit_quantized,
        kmeans_probe_lists_quantized,
    )

    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    scale = 1_000_000
    cent = kmeans_fit_quantized(
        corpus, id_col, vec_col, k=n_lists, n_iter=kmeans_iters, scale=scale
    )

    inverted = kmeans_assign_quantized(
        corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec")),
        "cand_vec",
        cent,
        scale,
    ).select("cand_id", "cand_vec", F.col("cluster").alias("list_id"))
    probes = kmeans_probe_lists_quantized(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")),
        "query_vec",
        cent,
        scale,
        n_probe,
    ).select("query_id", "query_vec", F.explode("probe_lists").alias("list_id"))
    scored = (
        inverted.join(F.broadcast(probes), "list_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                cosine_fold_udf()(F.col("query_vec"), F.col("cand_vec")), 6
            ).alias("cos_sim"),
        )
        # no distinct() needed: a candidate lives in exactly one list
        # and probes emits distinct (query, list) pairs, so the join
        # cannot duplicate a (query, candidate) pair
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        # emit the SAME 6dp quantity used for ranking — re-rounding to
        # 4dp double-rounds: a cos6 ending in ...50 is an exact decimal
        # half and HALF_UP/HALF_EVEN engines disagree on it
        .select("query_id", "cand_id", "cos_sim", "rk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _plane_matrix(dim: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    """All tables' hyperplanes stacked: row t*n_planes+j = plane j of
    table t (same per-table seeds as the original expression path;
    signatures match it up to sign flips on near-zero projections —
    the matmul and the old per-element fold sum in different orders,
    so a projection within float summation noise of 0 can land in a
    neighboring bucket. Harmless: every LSH query is rows-only /
    recall-checked, never hash-compared)."""
    rows: list[list[float]] = []
    for t in range(n_tables):
        rows.extend(_hyperplanes(dim, n_planes, seed + 1000 * t))
    return np.array(rows, dtype=np.float64)


def _bucket_udf(dim: int, n_planes: int, n_tables: int, seed: int, multiprobe: bool):
    """Arrow-batched bucket computation for multi-table hyperplane LSH.

    Returns a pandas_udf: embedding -> array<long> of bucket ids —
    one per table (multiprobe=False), or (1 + n_planes) per table
    (own bucket + all Hamming-1 probes) for the query side.

    Why a pandas UDF and not expressions: the previous formulation
    built n_tables × n_planes aggregate-over-zip_with subtrees, each
    embedding a dim-element literal array — ~48 × 64 literals pushed
    through py4j and Catalyst per query. Measured at sf0.01
    (tests box, local[32]): expression path ≈ 4.4 s end-to-end for
    sim_topk_lsh, of which multiple seconds are plan
    construction/optimization; this Arrow path computes all
    signatures as ONE (batch × dim) @ (dim × T·b) matmul per Arrow
    batch and keeps the plan O(1) in n_tables·n_planes·dim — the same
    measured carve-out as IVF scoring (operators/similarity.py
    ivf_topk docstring). Plane matrix is O(T·b·dim) doubles in the
    UDF closure, serialized once per executor."""
    from pyspark.sql.functions import pandas_udf

    p = _plane_matrix(dim, n_planes, n_tables, seed)  # (T*b, dim)
    bases = (np.arange(n_tables, dtype=np.int64) << n_planes)  # (T,)
    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))  # (b,)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        x = _mat(v, dim)  # (n, dim)
        proj = x @ p.T  # (n, T*b)
        bits = (proj > 0).astype(np.int64).reshape(len(x), n_tables, n_planes)
        sig = bits @ weights  # (n, T)
        own = bases[None, :] + sig  # (n, T)
        if not multiprobe:
            return pd.Series(list(own))
        flips = bases[None, :, None] + (sig[:, :, None] ^ weights[None, None, :])
        out = np.concatenate([own[:, :, None], flips], axis=2)  # (n, T, 1+b)
        return pd.Series(list(out.reshape(len(x), -1)))

    return buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: multi-table hyperplane LSH.

    L independent signature tables of b bits each; a query's candidate
    set is the union over tables of (own bucket + Hamming-1 probes),
    re-ranked by exact cosine. Recall ≈ 1-(1-p_bucket)^L — the standard
    amplification that single-table probing can't reach. At 100 TB the
    candidate set stays ∝ L × bucket size (never the corpus), the
    corpus side is shuffled once on (table, bucket), and the probe side
    is broadcast. A pair can collide in up to L buckets, so candidates
    are DISTINCTed before the exact cosine — one cosine per candidate
    pair, never per collision (semantic_dedup's candidate-distinct
    pattern); cand_vec rides through the distinct because the vector
    is a function of the id, which is strictly cheaper than
    re-shuffling the corpus for a join-back, while query_vec re-joins
    from the broadcast query side. Bucket ids (disjoint per table:
    t·2^b + sig) come from one Arrow-batched matmul per side — see
    _bucket_udf for the measured rationale vs the literal-expression
    formulation."""
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    corpus_buckets = _bucket_udf(dim, n_planes, n_tables, seed, multiprobe=False)
    query_buckets = _bucket_udf(dim, n_planes, n_tables, seed, multiprobe=True)
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        F.explode(corpus_buckets(vec_col)).alias("bucket"),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(query_buckets(vec_col)).alias("bucket"),
    )
    cand = (
        c.join(F.broadcast(probes), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", "cand_vec")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"))
    scored = cand.join(F.broadcast(q), "query_id").select(
        "query_id",
        "cand_id",
        F.round(cosine(F.col("query_vec"), F.col("cand_vec")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        # emit the SAME 6dp quantity used for ranking — re-rounding to
        # 4dp double-rounds: a cos6 ending in ...50 is an exact decimal
        # half and HALF_UP/HALF_EVEN engines disagree on it
        .select("query_id", "cand_id", "cos_sim", "rk")
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (cosine ≥ threshold) via multi-table
    hyperplane LSH: bucket-join candidates (a.id < b.id), exact cosine
    verify. The all-pairs brute force (operators/dedup.py
    embedding_near_dup_pairs) is the oracle twin; this is the path
    whose work scales with bucket collisions instead of n². A pair can
    collide in up to n_tables buckets, so the candidate ids are
    DISTINCTed BEFORE the exact cosine (semantic_dedup's pattern) —
    the bucket self-join carries only (id, bucket) and the vectors
    join back once per unique pair. Bucket ids via the Arrow-batched
    matmul (see _bucket_udf)."""
    buckets = _bucket_udf(dim, n_planes, n_tables, seed, multiprobe=False)
    ids = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    bucketed = ids.select("id", F.explode(buckets("vec")).alias("bucket"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"))
        .distinct()
    )
    return (
        cand.join(ids.select(F.col("id").alias("vec_a"), F.col("vec").alias("va")), "vec_a")
        .join(ids.select(F.col("id").alias("vec_b"), F.col("vec").alias("vb")), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )

def _train_centroid_matrix(
    corpus: DataFrame,
    n_lists: int,
    kmeans_iters: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Driver-side IVF centroid training on a deterministic bounded
    sample (lowest-id vectors, FAISS-style): numpy Lloyd iterations
    touch O(sample·dim) values regardless of corpus size. Ties in the
    cosine argmax break toward the HIGHER list id to match the
    distributed assignment UDFs built from the result. Returns the
    row-normalized (n_lists, dim) centroid matrix."""
    sample = (
        corpus.orderBy(id_col)
        .limit(4096)
        .select(F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"))
        .collect()
    )
    x = np.array([r.v for r in sample], dtype=np.float64)  # (n, dim)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cent = x[:n_lists].copy()  # deterministic init: lowest-id vectors
    for _ in range(kmeans_iters):
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        sims = xn @ cn.T
        assign = (sims.shape[1] - 1) - np.argmax(sims[:, ::-1], axis=1)
        for lid in range(n_lists):
            members = x[assign == lid]
            if len(members):
                cent[lid] = members.mean(axis=0)
    return cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_lists: int = 16,
    n_probe: int = 3,
    kmeans_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding
    space (sample-trained IVF k-means), compare pairs ONLY within a
    cluster, connect the over-threshold pairs into groups, keep the
    minimum id per group. Returns one row per REMOVED vector with its
    retained representative: (vec_id, rep_id).

    Scale shape: the only pairwise stage is the within-list self-join
    — bounded by (n_probe·corpus/n_lists)² per list and
    embarrassingly parallel across lists, never corpus². Each vector
    is assigned to its `n_probe` nearest lists (multi-assignment):
    at the near-identical thresholds SemDeDup targets a single
    assignment suffices, but at looser thresholds a pair's endpoints
    can straddle a centroid boundary — probing p lists bounds that
    loss, traded against a p² factor on the per-list quadratic
    (recall vs the exact all-pairs twin is asserted in tests). Raise
    n_lists with corpus growth to hold the per-list constant.

    Graduated r10 to a hash-exact oracle: the coarse quantizer is now
    DISTRIBUTED QUANTIZED Lloyd's (operators/clustering.py — integer-
    exact, engine-reproducible) instead of the driver-sample float
    trainer, multi-probe assignment is top-n_probe by exact int64
    quantized distance (stable argsort, ties to the lower list id),
    and the verify cosine is an Arrow-vectorized twin of the JVM
    aggregate-fold (sequential-in-dimension accumulation — bit-equal;
    see cosine_fold_udf) with the exact twin's adjudicated
    JVM ROUND(.,4), so every stage is either integer-exact or the
    empirically-adjudicated rounded-cosine pattern, and DuckDB
    reproduces the full removed→representative mapping."""
    from whisky_wine_etl_spark.operators.clustering import (
        kmeans_fit_quantized,
        kmeans_probe_lists_quantized,
    )
    from whisky_wine_etl_spark.operators.dedup import connected_components

    cosine_seq_udf = cosine_fold_udf()

    df = df.where(F.col(vec_col).isNotNull())
    scale = 1_000_000
    centroids = kmeans_fit_quantized(
        df, id_col, vec_col, k=n_lists, n_iter=kmeans_iters, scale=scale
    )

    inv = (
        kmeans_probe_lists_quantized(
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
            "vec",
            centroids,
            scale,
            n_probe,
        )
        .select("id", "vec", F.explode("probe_lists").alias("list_id"))
        .persist()
    )
    a, b = inv.alias("a"), inv.alias("b")
    # a pair can share up to n_probe lists → distinct the CANDIDATE ids
    # before the (expensive) exact cosine, not after
    cand = (
        a.join(
            b, (F.col("a.list_id") == F.col("b.list_id")) & (F.col("a.id") < F.col("b.id"))
        )
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"))
        .distinct()
    )
    vecs = inv.select("id", "vec").distinct()
    pairs = (
        cand.join(vecs.select(F.col("id").alias("vec_a"), F.col("vec").alias("va")), "vec_a")
        .join(vecs.select(F.col("id").alias("vec_b"), F.col("vec").alias("vb")), "vec_b")
        .filter(F.round(cosine_seq_udf(F.col("va"), F.col("vb")), 4) >= threshold)
        .select("vec_a", "vec_b")
    )
    comp = connected_components(pairs, id_a="vec_a", id_b="vec_b")
    # comp is materialized (localCheckpoint inside connected_components),
    # so inv's cache has no remaining consumer — release it here rather
    # than leaking one corpus-sized cache per semantic_dedup call into a
    # long-lived session
    inv.unpersist()
    return comp.filter(F.col("vec_id") != F.col("cluster_id")).select(
        "vec_id", F.col("cluster_id").alias("rep_id")
    )


def embedding_norm_stats_arrow(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """L2-norm statistics via mapInArrow — the zero-copy tier below
    Pandas UDFs: batches arrive as pyarrow RecordBatches, the list
    column's flat value buffer reshapes straight into a NumPy matrix
    (no pandas Series materialization, no per-row objects), and one
    vectorized matmul-free pass emits (vec_id, l2_norm, unit_head =
    first component of the unit vector). Variable-length lists are
    handled through the Arrow offsets, so a ragged batch degrades to
    a per-row view instead of reshaping wrong.

    Rounding grain (norm 4dp, head 6dp) follows the repo rule: both
    engines sum the same 64 float32-squared terms in float64; order
    noise ~1e-13 is far under the half-spacing of either grain."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            ids = b.column(0)
            emb = b.column(1)
            flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
            offs = emb.offsets.to_numpy()
            starts, ends = offs[:-1], offs[1:]
            widths = ends - starts
            if len(widths) and (widths == widths[0]).all():
                m = flat[starts[0] : ends[-1]].reshape(len(widths), widths[0])
                sq = (m * m).sum(axis=1)
                heads = m[:, 0]
            else:  # ragged fallback: per-row slices over the same buffer
                sq = np.array([(flat[s:e] ** 2).sum() for s, e in zip(starts, ends)])
                heads = np.array([flat[s] if e > s else 0.0 for s, e in zip(starts, ends)])
            norms = np.sqrt(sq)
            unit_head = heads / np.maximum(norms, 1e-300)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(np.round(norms, 4)), pa.array(np.round(unit_head, 6))],
                names=[id_col, "l2_norm", "unit_head"],
            )

    return df.select(id_col, "embedding").mapInArrow(
        fn, schema=f"{id_col} long, l2_norm double, unit_head double"
    )


def _train_pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ks: int = 16,
    kmeans_iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> np.ndarray:
    """Driver-side product-quantization codebook training (Jégou et
    al. 2011, the FAISS PQ recipe) on the same deterministic bounded
    sample as IVF training: lowest-id vectors split into `m`
    contiguous sub-blocks; per block, `ks` centroids from Lloyd
    iterations (init = first `ks` sample rows, argmin assignment, ties
    toward the LOWER code). Returns an int64 (m, ks, dim//m) matrix.

    QUANTIZED since r10 (the sim_topk_pq graduation): the sample is
    floor(double(x)·scale + 0.5)-quantized and every distance, sum,
    and round-half-up centroid update is exact integer arithmetic —
    deterministic and reproducible in SQL, unlike the earlier
    L2-normalized float recipe whose FP normalization/mean order was
    engine-specific. Dropping the normalization moves ADC candidate
    ranking from cosine-order to raw-L2-order; the exact-cosine
    re-rank of the top n_candidates absorbs the difference (recall
    gates in tests pin it)."""
    import math

    sample = (
        corpus.orderBy(id_col)
        .limit(4096)
        .select(F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"))
        .collect()
    )
    xq = np.array(
        [[math.floor(float(x) * float(scale) + 0.5) for x in r.v] for r in sample],
        dtype=np.int64,
    )
    dim = xq.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = np.empty((m, ks, sub), dtype=np.int64)
    for j in range(m):
        blk = xq[:, j * sub : (j + 1) * sub]
        cent = blk[:ks].copy()
        for _ in range(kmeans_iters):
            d2 = ((blk[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ks):
                members = blk[assign == c]
                if len(members):
                    s = members.sum(axis=0)
                    n = len(members)
                    cent[c] = np.array(
                        [(2 * int(sv) + n) // (2 * n) for sv in s],
                        dtype=np.int64,
                    )
        books[j] = cent
    return books


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    ks: int = 16,
    n_candidates: int = 128,
    kmeans_iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k via product quantization with asymmetric distance
    computation (ADC).

    Index: every corpus vector compresses to `m` sub-space codes
    (m=4, ks=16 → 4 small ints ≈ 2 BYTES of entropy per 256-byte
    vector) assigned by one Arrow-batched scan against the broadcast
    codebooks. Search: each query precomputes its m×ks table of
    sub-distances to every centroid ONCE; the corpus scan then scores
    a row with m array lookups + adds — pure JVM codegen over the
    codes, never touching the raw vectors. The top `n_candidates` by
    ADC are re-ranked with exact cosine, so accuracy degrades to
    recall (measured in tests vs brute force), never to wrong math on
    the emitted rows.

    Scale shape: at 100 TB the codes column IS the resident index
    (16-64x smaller than the vectors); the ADC scan reads only codes,
    and exact vectors are fetched for n_candidates·n_queries rows.
    Graduated r10 to a hash-exact oracle: codebooks, codes, and ADC
    scores are all EXACT INT64 over floor(double(x)·1e6 + 0.5)-
    quantized RAW vectors (see _train_pq_codebooks — the earlier
    L2-normalization was FP and engine-specific, so candidate ranking
    moved from cosine-order to raw-L2-order; the exact-cosine re-rank
    of the top n_candidates absorbs it, recall-gated in tests) and the
    final re-rank is the adjudicated JVM-fold cosine + ROUND(.,6), so
    DuckDB reproduces the emitted rows bit-for-bit
    (plans/round4ao.py:_pq_oracle)."""
    from pyspark.sql.functions import pandas_udf

    from whisky_wine_etl_spark.functions.vector import dot, norm

    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    scale = 1_000_000
    fscale = float(scale)
    books = _train_pq_codebooks(corpus, m, ks, kmeans_iters, vec_col, id_col, scale)
    sub = books.shape[2]

    def _quant_rows(v: pd.Series) -> np.ndarray:
        raw = np.array(v.to_list(), dtype=np.float64)
        return np.floor(raw * fscale + 0.5).astype(np.int64)

    @pandas_udf("array<int>")
    def codes_udf(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # empty Arrow batch (ADVICE r4)
            return pd.Series([], dtype="object")
        xq = _quant_rows(v)
        out = np.empty((len(xq), m), dtype=np.int32)
        for j in range(m):
            blk = xq[:, j * sub : (j + 1) * sub]
            d2 = ((blk[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            out[:, j] = np.argmin(d2, axis=1) + 1  # 1-based for element_at
        return pd.Series(list(out))

    @pandas_udf("array<long>")
    def adc_table_udf(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # empty Arrow batch (ADVICE r4)
            return pd.Series([], dtype="object")
        qn = _quant_rows(v)
        rows = []
        for q in qn:
            tab = np.empty(m * ks, dtype=np.int64)
            for j in range(m):
                blk = q[j * sub : (j + 1) * sub]
                tab[j * ks : (j + 1) * ks] = (
                    (books[j] - blk[None, :]) ** 2
                ).sum(axis=1)
            rows.append(tab)
        return pd.Series(rows)

    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cand_vec"),
        codes_udf(vec_col).alias("codes"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        adc_table_udf(vec_col).alias("adc_tab"),
    )
    # ADC score: m flat-table lookups, evaluated in whole-stage codegen
    # over the codes — the raw candidate vector is never read here.
    adc = sum(
        F.element_at("adc_tab", F.lit(j * ks) + F.element_at("codes", j + 1))
        for j in range(m)
    )
    scored = (
        c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .withColumn("adc", adc)
    )
    wc = W.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("cand_id"))
    cands = scored.withColumn("crk", F.row_number().over(wc)).filter(
        F.col("crk") <= n_candidates
    )
    exact = cands.select(
        "query_id",
        "cand_id",
        F.round(
            dot(F.col("query_vec"), F.col("cand_vec"))
            / (norm(F.col("query_vec")) * norm(F.col("cand_vec"))),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos_sim", "rk")
    )
