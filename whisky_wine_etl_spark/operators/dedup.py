"""Deduplication operators for a training-data pipeline.

Four families over `documents.text` plus one over embeddings:

- exact:        dropDuplicates on a hash of normalized text
- n-gram Jaccard: exact pairwise similarity via an inverted shingle
                index (explode → self-join on shingle → count) — the
                oracle-checkable ground truth
- MinHash+LSH:  deterministic (a*h+b) mod p hash family over the
                engine-portable md5+Horner shingle hashes, banded
                signatures, bucket join → candidate pairs →
                exact-Jaccard verification. The 100 TB path:
                candidates only, never all-pairs.
- SimHash:      60-bit weighted sign fingerprint, 4×15-bit band join,
                Hamming ≤ 3 (pigeonhole guarantees band recall; 15-bit
                chunks give 32768 buckets per band — the r10 20× probe
                showed 8-bit chunks saturate at ~100k docs and go
                O(N²/256))
- embedding:    cosine ≥ τ near-dup pairs (brute force for the oracle;
                the LSH-bucketed scale path lives in similarity.py)

Scale notes: all joins key on short hashes; ultra-frequent shingles
are the skew risk at 100 TB — `max_shingle_freq` drops stop-shingles
from the index (standard prefix-filter; OFF by default to preserve
oracle parity at test scale). Hash family is fixed-seed so plans are
re-runnable and results deterministic across runs/partitionings.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from whisky_wine_etl_spark.functions.vector import cosine
from whisky_wine_etl_spark.materialize import materialize

MERSENNE31 = (1 << 31) - 1  # prime modulus; keeps (a*h+b) inside int64
# Second prime + Horner bases for the engine-portable shingle hash
# (shingle_hash_arrays): two independent mod-p Horner combines packed
# into one 62-bit value — collision odds ~q²/2^62, and every step is
# exact int64 arithmetic both Spark and DuckDB reproduce bit-for-bit.
PRIME31B = 2147483629
HORNER_B1 = 1000003
HORNER_B2 = 999983


def normalized_text(col) -> F.Column:
    return F.lower(F.trim(F.regexp_replace(col, " +", " ")))


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct normalized text (min id wins —
    deterministic, unlike dropDuplicates' arbitrary winner)."""
    key = F.md5(normalized_text(F.col(text_col))).alias("text_md5")
    return (
        df.withColumn("text_md5", key)
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document (explode once).

    The token array is materialized ONCE per row before the
    higher-order transform — inlining split() into the lambda makes
    Spark re-split the text for every shingle position (O(tokens²))."""
    expr = (
        f"transform(sequence(1, greatest(size(__toks) - {n - 1}, 1)), "
        f"i -> array_join(slice(__toks, i, {n}), ' '))"
    )
    return (
        df.select(F.col(id_col), F.split(text_col, " ").alias("__toks"))
        .select(F.col(id_col), F.explode(F.expr(expr)).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_freq: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs with J >= threshold.

    Inverted-index formulation: |A∩B| via self-join on shingle,
    |A∪B| = |A|+|B|-|A∩B|. max_shingle_freq prunes stop-shingles
    (skew control at scale; changes recall only for pairs whose every
    common shingle is ultra-frequent).

    prefix_filter=True enables PPJoin-style prefix filtering, EXACT for
    the given threshold: order every document's shingles by a global
    total order (ascending corpus frequency, then shingle — rarest
    first) and index only each doc's first |d| - ceil(t·|d|) + 1
    shingles. If J(A,B) >= t the two prefixes provably share a
    shingle, so candidate generation only joins on prefix postings,
    and the verify step computes the same exact Jaccard (equality
    with the naive path is pinned in tests at every SF).

    When to flip it on: real corpora — Zipfian vocabulary, long
    documents — where frequent shingles explode the full inverted
    index; the prefix drops them from candidate generation entirely.
    On THIS repo's synthetic corpus (tiny vocabulary, ~100-token
    docs) measured prefix filtering is ~2-3x SLOWER than the naive
    index: nearly every prefix still collides, so the extra
    freq-rank/window/verify stages buy no pruning. Default stays
    False; it is a scale lever, not a universal win."""
    sh = shingles(df, text_col, id_col, n)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").count().filter(F.col("count") <= max_shingle_freq)
        sh = sh.join(freq.select("shingle"), "shingle")
    if not prefix_filter:
        # r12: the (optionally capped) shingle frame feeds three
        # consumers below (sizes + both sides of the intersection
        # self-join) — materialize the explode+distinct once instead
        # of once per consumer (guide §2.4; the prefix path has
        # checkpointed its own sh since r4). Blocks are freed on GC.
        # eager=False (r13): the caller's first action materializes it
        # — persist-once semantics unchanged, one setup job folded.
        # fact_scale: the shingle frame grows with the corpus, so the
        # 100 TB tier is policy-selected (materialize.py).
        sh = materialize(sh, fact_scale=True)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    if prefix_filter:
        sh = sh.localCheckpoint()  # GC-cleaned (ADVICE r4)
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__freq"))
        ranked = sh.join(F.broadcast(freq), "shingle").withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(id_col).orderBy("__freq", "shingle")
            ),
        )
        prefix = ranked.join(sizes, id_col).filter(
            # prefix length = n - ceil(t*n) + 1
            F.col("__rn") <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        ).select(id_col, "shingle")
        a = prefix.alias("a")
        b = prefix.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
            .distinct()
        )
        # exact |A∩B| for candidates only: re-join full postings
        sha = sh.select(F.col(id_col).alias("doc_a"), F.col("shingle").alias("__sha"))
        shb = sh.select(F.col(id_col).alias("__db"), F.col("shingle").alias("__shb"))
        common = (
            cand.join(sha, "doc_a")
            .join(shb, (F.col("doc_b") == F.col("__db")) & (F.col("__sha") == F.col("__shb")))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        common = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    sa = sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n_sh", "n_b")
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _hash_family(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31))
        for _ in range(num_hashes)
    ]


def _horner_expr(arr: str, idx: str, n: int, p: int, b: int) -> str:
    """SQL expr for a Horner-chain hash of `n` consecutive elements of
    long-array `arr` starting at 1-based position `idx`, mod prime `p`
    with base `b`: h = t₀; h = (h·b + t_{j}) mod p. Out-of-range
    elements coalesce to 0 (short documents), matching the oracle's
    NULL-list-index semantics. ANSI-overflow-safe: every operand of the
    multiply is < 2³¹, so products stay < 2⁶² < int64 max."""
    e = f"pmod(coalesce(try_element_at({arr}, {idx}), 0L), {p})"
    for j in range(1, n):
        e = (
            f"pmod({e} * {b}L + "
            f"pmod(coalesce(try_element_at({arr}, {idx} + {j}), 0L), {p}), {p})"
        )
    return e


def shingle_hash_arrays(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Per-document array of distinct hashed word n-grams — a NARROW
    transformation (no explode, no shuffle): every downstream
    MinHash/verification step works on this fixed-width long array.

    ENGINE-PORTABLE since r10 (this is what lets the MinHash-LSH
    family carry hash-exact DuckDB oracles instead of the rows-only
    carve-out): token hash = the top 60 bits of md5 (both engines
    implement standard MD5 and the hex→int bridge exactly), n-gram
    hash = TWO independent Horner chains over the token hashes mod the
    31-bit primes (MERSENNE31, PRIME31B), packed into one 62-bit long
    (h1·2³¹ + h2 — collision odds ~q²/2⁶² for q distinct shingles).
    All post-md5 arithmetic is exact int64 with every multiplicand
    < 2³¹, so Spark under ANSI mode and DuckDB compute identical
    values with no overflow and no FP anywhere.

    The n-gram hash still runs over the n TOKEN HASHES (md5 once per
    token), not over a re-joined string — building a string per
    shingle position allocates ~|doc| short strings per document and
    was the hottest part of the original xxhash64 pass."""
    h1 = _horner_expr("__th", "i", n, MERSENNE31, HORNER_B1)
    h2 = _horner_expr("__th", "i", n, PRIME31B, HORNER_B2)
    expr = (
        f"array_distinct(transform(sequence(1, greatest(size(__th) - {n - 1}, 1)), "
        f"i -> {h1} * 2147483648L + {h2}))"
    )
    return (
        df.select(F.col(id_col), F.split(text_col, " ").alias("__toks"))
        .select(
            F.col(id_col),
            F.expr(
                "transform(__toks, t -> "
                "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
            ).alias("__th"),
        )
        .select(F.col(id_col), F.expr(expr).alias("sh_arr"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 48,
    seed: int = 42,
    sh: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures: base hash = the engine-portable 62-bit
    shingle hash (shingle_hash_arrays: md5 token hashes + dual Horner
    chains) reduced mod p, family h_i = (a_i*h + b_i) mod p; signature
    element i = min over the doc's shingle set.

    Computed entirely as per-row array expressions
    (array_min ∘ transform) over shingle_hash_arrays — a NARROW map
    with zero shuffles, vs the classic explode → groupBy(min×k)
    formulation whose shuffle carries |shingles|×k rows. Pass a
    precomputed `sh` to share the scan with other branches.

    Returns one `mh: array<long>` column (length num_hashes). The
    (a_i, b_i) family travels as DATA via a broadcast 1-row join, and
    the whole signature is ONE nested transform — num_hashes separate
    expression columns made Catalyst optimization + codegen the
    dominant cost (~3.5 s of compile at 48 hashes), the same
    plan-blow-up failure mode as literal-folded IVF centroids."""
    if sh is None:
        sh = shingle_hash_arrays(df, text_col, id_col, n)
    if "hp_arr" not in sh.columns:
        # On the LSH path hp_arr is persisted upstream; standalone,
        # materialize it as a multi-referenced alias — referenced by
        # all num_hashes subtrees, CollapseProject keeps it hoisted
        # (a single-use alias would be inlined and recomputed per hash).
        sh = sh.withColumn(
            "hp_arr", F.expr(f"transform(sh_arr, h -> pmod(h, {MERSENNE31}L))")
        )
    # One subtree per hash (array_min over a transform), wrapped into a
    # single array column. Measured against a nested
    # transform-over-the-family formulation (family as broadcast data):
    # the flat shape executes ~2x faster (single lambda depth, native
    # array_min), at the cost of a one-time larger plan compile.
    return sh.select(
        F.col(id_col),
        F.array(
            *[
                F.expr(
                    f"array_min(transform(hp_arr, h -> pmod({a}L * h + {b}L, {MERSENNE31}L)))"
                )
                for a, b in _hash_family(num_hashes, seed)
            ]
        ).alias("mh"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 48,
    rows_per_band: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH, verified with exact
    Jaccard on the candidate set only.

    With r=3, b=16: P(candidate) = 1-(1-s³)¹⁶ ≈ 0.88 at s=0.5, ≈1.0
    at s≥0.7. The verify step removes false positives, so precision
    is exact; recall is the LSH curve. At 100 TB this touches only
    bucket-colliding pairs — never the quadratic pair space.

    The per-doc shingle-hash array is computed once (narrow, no
    shuffle) and shared by the signature and verification branches
    (persisted so the text isn't re-shingled; MEMORY_AND_DISK,
    spillable)."""
    # persist BOTH the raw shingle hashes (for exact-Jaccard verify)
    # and the mod-p-reduced array (for signatures) — materialized once,
    # so neither branch re-shingles and Catalyst cannot inline the
    # reduction into the per-hash lambda
    sh = (
        shingle_hash_arrays(df, text_col, id_col, n)
        .withColumn("hp_arr", F.expr(f"transform(sh_arr, h -> pmod(h, {MERSENNE31}L))"))
        .transform(lambda d: materialize(d, fact_scale=True))
    )
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes, seed, sh=sh)
    n_bands = num_hashes // rows_per_band
    # band bucket = Horner-chain hash (mod MERSENNE31) of the band's
    # signature slice — engine-portable like the shingle hash, so the
    # DuckDB oracle reproduces the exact candidate set; one posexplode
    # over a small generated array, not n_bands struct exprs.
    # LOCALCHECKPOINTED: the candidate step below is a self-join —
    # unmaterialized, each side would recompute the full signature pass
    # (blocks free on GC, unlike persist — ADVICE r4).
    band_bucket = _horner_expr(
        "mh", f"bi * {rows_per_band} + 1", rows_per_band, MERSENNE31, HORNER_B1
    )
    bands = sigs.select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}), bi -> {band_bucket})"
            )
        ).alias("band", "bucket"),
    )
    bands = materialize(bands, fact_scale=True)
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    # Verify ONLY the candidate pairs: attach each side's shingle-hash
    # array (bounded by doc length, not corpus size) and compute exact
    # Jaccard via array_intersect. Work is O(|candidates|), never the
    # all-pairs inverted-index join — the property that makes LSH the
    # 100 TB path.
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        candidates.join(
            sh.select(F.col(id_col).alias("doc_a"), F.col("sh_arr").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col(id_col).alias("doc_b"), F.col("sh_arr").alias("sh_b")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(n_common / (F.size("sh_a") + F.size("sh_b") - n_common), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60
) -> DataFrame:
    """Weighted SimHash fingerprint: per-token hash, bit j contributes
    +count/-count by its parity; fingerprint bit j is the sign. One
    explode + two groupBys.

    The token hash is the engine-portable md5-top-60-bits (same bridge
    as shingle_hash_arrays) since r10 — every downstream step is
    integer counting, sign tests, and bit arithmetic, so the full
    banded-Hamming pair set is bit-reproducible in DuckDB and
    dedup_simhash carries a hash-exact oracle."""
    tok = (
        df.select(F.col(id_col), F.explode(F.split(text_col, " ")).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "th",
            F.expr("cast(conv(substring(md5(token), 1, 15), 16, 10) as bigint)"),
        )
    )
    bit_sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), j).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
                .otherwise(-F.col("cnt"))
            ).alias(f"s_{j}")
            for j in range(bits)
        ]
    )
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"s_{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << j).cast("long")
        fp = term if fp is None else fp + term
    return bit_sums.select(id_col, fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via 4-chunk
    banding (pigeonhole: ≤3 differing bits ⇒ ≥1 of 4 chunks equal),
    then exact Hamming verification on candidates only."""
    fps = simhash(df, text_col, id_col, bits)
    chunk_bits = bits // 4
    mask = (1 << chunk_bits) - 1
    chunks = fps.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright(F.col("simhash"), i * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "simhash", "cc.chunk", "cc.val")
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine near-dup pairs (the oracle-checkable ground
    truth; LSH-bucketed ANN in similarity.py is the 100 TB path).
    Norms precomputed per row — one fold per pair, not three."""
    from whisky_wine_etl_spark.functions.vector import dot, norm

    sides = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("nrm"),
    )
    a = sides.alias("a")
    b = sides.alias("b")
    cos = F.round(
        dot(F.col("a.vec"), F.col("b.vec")) / (F.col("a.nrm") * F.col("b.nrm")), 4
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("vec_a"),
            F.col("b.id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over a near-dup pair graph: every node gets
    `cluster_id` = the minimum node id reachable from it. This is the
    step that turns pairwise near-dup hits into dedup GROUPS (keep the
    canonical doc per cluster, drop the rest) — pairs alone can't be
    acted on when duplicates come in chains a~b~c.

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels — O(graph diameter)
    rounds, which for the dense, shallow clusters near-dup detection
    produces is a handful (for adversarial long-path graphs swap in
    alternating large-star/small-star (Kiveris et al.), which runs in
    O(log d) and extends directly from this shape). Each round is one
    shuffle join + one groupBy, then `localCheckpoint` on the
    node-sized label frame: without the checkpoint the logical plan
    GROWS once per round and Catalyst re-optimizes the whole history
    every iteration — planning, not data, becomes the bottleneck.
    Labels move monotonically downward (each is replaced by a min that
    includes itself), so convergence is the SUM of labels not changing
    between rounds — one scalar aggregate per round instead of an
    old-vs-new join.
    On a cluster use `sc.setCheckpointDir` + `checkpoint()` for fault
    tolerance instead of the executor-local variant.

    `nodes` (optional) adds isolated vertices (docs with no near-dup
    edge) as singleton clusters so the output covers the whole corpus.
    """
    # both edge directions from ONE pass over pairs (explode of a
    # 2-struct array) — a union of two selects over `pairs` would
    # compute the (expensive) pair join twice on materialization
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    if nodes is not None:
        iso = nodes.select(F.col(nodes.columns[0]).alias("node")).exceptAll(
            labels.select("node")
        )
        singletons = iso.select("node", F.col("node").alias("label"))
    # eager=False: the convergence aggregate on the next line is the
    # round's unavoidable action — let IT materialize the checkpoint
    # (localCheckpoint is persist-based, so the first action computes
    # and pins the blocks; later consumers read them) instead of
    # paying a separate eager job per round (r13, guide §1.2: the
    # per-round fixed cost IS the bottleneck for these node-scale
    # frames — this halves the jobs per round with an identical plan).
    labels = labels.localCheckpoint(eager=False)
    label_sum = labels.agg(F.sum("label")).collect()[0][0]

    converged = False
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh, labels["node"] == neigh["src"], "left")
            .select(
                labels["node"].alias("node"),
                F.least(labels["label"], F.coalesce(neigh["nmin"], labels["label"])).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=False)  # materialized by the sum below
        )
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if new_sum == label_sum:
            converged = True
            break
        label_sum = new_sum

    if not converged:
        # exiting by iteration count means some chain longer than
        # max_iters edges still carries a non-minimal label — the
        # cluster ids would be silently WRONG (split clusters)
        raise RuntimeError(
            f"connected_components did not converge within max_iters={max_iters}: "
            "the graph has a path longer than max_iters. Raise max_iters, or use "
            "large-star/small-star (O(log d) rounds) for long-chain graphs."
        )

    out = labels
    if nodes is not None:
        # singletons' lazy plan still references edges — pin it before
        # the unpersist so exceptAll doesn't recompute the pair join
        # uncached on a later materialization
        out = out.unionByName(singletons.localCheckpoint(eager=True))
    edges.unpersist()
    return out.select(F.col("node").alias(id_a.replace("_a", "_id")), F.col("label").alias("cluster_id"))


def incremental_dedup(
    existing: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup a NEW batch against an already-ingested corpus without
    re-pairing the corpus against itself: the only work proportional
    to history is one distinct-hash projection (at 100 TB that is the
    dedup LEDGER — a bucketed table of md5s maintained across loads,
    so the anti-join co-locates by bucket and never rescans text).
    Within-batch duplicates collapse to the min-id row, exactly like
    exact_dedup, so (ledger ∪ survivors) stays globally exact-deduped
    load after load.

    Returns one row per surviving new hash:
    (text_md5, doc_id = min incoming id, n_batch_copies)."""
    h = F.md5(normalized_text(F.col(text_col)))
    seen = existing.select(h.alias("text_md5")).distinct()
    inc = incoming.select(F.col(id_col), h.alias("text_md5"))
    return (
        inc.join(seen, "text_md5", "left_anti")
        .groupBy("text_md5")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_batch_copies"))
    )


def neardup_against_corpus(
    corpus: DataFrame,
    incoming: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Incremental NEAR-dup rejection: which incoming-batch documents
    are n-gram-Jaccard >= threshold to SOME already-ingested document.
    incremental_dedup's fuzzy counterpart — exact-hash ledgers miss a
    re-crawled page with one edited sentence; this catches it without
    ever re-pairing the corpus against itself.

    Work ∝ shingle collisions BETWEEN the two sides only (inverted-
    index join batch-postings x corpus-postings): the corpus
    contributes one posting list per shingle — at 100 TB that list is
    the maintained SHINGLE LEDGER, bucketed by shingle hash, so each
    load co-locates against it and history text is never rescanned.
    max_shingle_freq is the same stop-shingle cap as jaccard_pairs,
    applied to the CORPUS posting lists (the side whose hot lists
    grow with history); sizes on both sides stay the true set sizes.

    Returns one row per REJECTED incoming doc:
    (doc_id, matched_corpus_id, jaccard) with the best match kept
    (highest Jaccard, ties to the smallest corpus id — deterministic
    for the SQL oracle)."""
    sh_c = shingles(corpus, text_col, id_col, n).withColumnRenamed(id_col, "__cid")
    sh_i = shingles(incoming, text_col, id_col, n).withColumnRenamed(id_col, "__iid")
    size_c = sh_c.groupBy("__cid").agg(F.count(F.lit(1)).alias("__nc"))
    size_i = sh_i.groupBy("__iid").agg(F.count(F.lit(1)).alias("__ni"))
    if max_shingle_freq is not None:
        keep = (
            sh_c.groupBy("shingle")
            .count()
            .filter(F.col("count") <= max_shingle_freq)
            .select("shingle")
        )
        sh_c = sh_c.join(keep, "shingle")
    inter = (
        sh_i.join(sh_c, "shingle")
        .groupBy("__iid", "__cid")
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    scored = (
        inter.join(size_i, "__iid")
        .join(size_c, "__cid")
        .withColumn(
            "jaccard",
            F.round(
                F.col("__common") / (F.col("__ni") + F.col("__nc") - F.col("__common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    best = scored.groupBy("__iid").agg(
        F.max_by(
            F.struct(
                F.col("__cid").alias("matched_corpus_id"), F.col("jaccard")
            ),
            F.struct(F.col("jaccard"), (-F.col("__cid")).alias("__neg")),
        ).alias("__m")
    )
    return best.select(
        F.col("__iid").alias(id_col),
        F.col("__m.matched_corpus_id").alias("matched_corpus_id"),
        F.col("__m.jaccard").alias("jaccard"),
    )


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact overlap-coefficient near-dup: |A∩B| / min(|A|, |B|) over
    distinct word n-gram shingles. Catches CONTAINMENT — a short doc
    quoted wholesale inside a long one — which Jaccard structurally
    misses (|A∩B|/|A∪B| is dragged down by the long doc's extra
    shingles). Same inverted-index shape as jaccard_pairs: one
    shingle self-join for intersections (work ∝ collisions, not
    pairs), two size lookups, threshold filter.

    max_shingle_freq is the same stop-shingle skew lever jaccard_pairs
    carries: on a Zipfian corpus a frequent shingle's posting list
    makes collisions quadratic in its length, and dropping postings
    longer than the cap bounds the self-join at the cost of recall
    only for pairs whose every common shingle is ultra-frequent.
    Sizes are computed BEFORE pruning so the denominator stays the
    true shingle-set size."""
    # r12: the shingle frame feeds sizes, the optional stop-shingle
    # frequency pass, AND both sides of the intersection self-join —
    # materialize the explode+distinct once instead of once per
    # consumer (guide §2.4; same fix as jaccard_pairs). The capped
    # variant re-materializes the pruned frame for the self-join's
    # two sides so the cap's groupBy also runs once.
    # eager=False (r13): the caller's first action materializes the
    # chain — persist-once semantics unchanged, setup jobs folded.
    # fact_scale: shingle frames grow with the corpus (materialize.py).
    sh = materialize(shingles(df, text_col, id_col, n), fact_scale=True)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_freq is not None:
        keep = sh.groupBy("shingle").count().filter(F.col("count") <= max_shingle_freq)
        sh = materialize(sh.join(keep.select("shingle"), "shingle"), fact_scale=True)
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("__n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("__n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "containment",
            F.round(F.col("n_common") / F.least("__n_a", "__n_b"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def connected_components_star(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    same contract as connected_components (cluster_id = min reachable
    node id, optional isolated-node coverage), but O(log n) rounds
    instead of O(diameter): the long-chain graphs that make min-label
    propagation hit its iteration cap and raise are exactly where this
    one converges in a handful of rounds.

    Per round, two phases of one groupBy + one join each:
    - large-star: every node u computes m = min(N(u) ∪ {u}) and
      re-points its LARGER neighbors v > u at m — long tails collapse
      toward small ids without ever disconnecting a component;
    - small-star: on the now high→low edge set, u re-points its
      smaller neighbors AND itself at m — stars flatten.
    The edge multiset is monotonically "improving"; convergence is an
    order-insensitive checksum (count + sum of pair-hashes) going
    stable, one scalar collect per round. Each round localCheckpoints
    the edge frame so the plan does not grow with the iteration count
    (cluster deployments: setCheckpointDir + checkpoint()).
    """
    # eager=False: the isEmpty/checksum action right below is the
    # materializing job (r13 — same job-folding note as
    # connected_components; one job per round instead of two).
    # fact_scale: the input pair graph grows with the corpus.
    edges = materialize(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct(),
        fact_scale=True,
    )

    out_name = id_a.replace("_a", "_id")

    if nodes is not None:
        iso = (
            nodes.select(F.col(nodes.columns[0]).alias("node"))
            .exceptAll(
                edges.select(F.col("src").alias("node"))
                .unionAll(edges.select(F.col("dst").alias("node")))
                .distinct()
            )
            .select("node", F.col("node").alias("label"))
            # eager=False: consumed once, by the final union after
            # convergence — that action materializes it; its plan
            # reads the already-checkpointed edge frame, so deferring
            # re-runs nothing expensive (r13 job folding)
            .localCheckpoint(eager=False)
        )

    def checksum(e: DataFrame) -> tuple:
        # bit_xor, not sum: order-insensitive over the (distinct) edge
        # set and immune to ANSI long-overflow on summed 64-bit hashes
        row = e.agg(
            F.count(F.lit(1)), F.expr("bit_xor(xxhash64(src, dst))")
        ).collect()[0]
        return (row[0], row[1])

    def large_star(e: DataFrame) -> DataFrame:
        sym = (
            e.select("src", "dst")
            .unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .distinct()
        )
        mins = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        return (
            sym.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # input edges point high→low (large-star emits (v, m), m < v)
        mins = e.groupBy("src").agg(F.min("dst").alias("m"))
        repointed = (
            e.join(mins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        self_edges = mins.select("src", F.col("m").alias("dst"))
        return (
            repointed.unionAll(self_edges)
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    prev = checksum(edges)
    converged = edges.isEmpty()
    for _ in range(max_rounds):
        if converged:
            break
        # eager=False: the checksum on the next line materializes it
        edges = small_star(large_star(edges)).localCheckpoint(eager=False)
        cur = checksum(edges)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} rounds — "
            "for a graph on 64-bit ids this bound should never bind; "
            "raise max_rounds only after checking the edge data."
        )

    # converged edge set is a star forest: child → root(min id)
    roots = edges.select(F.col("dst").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    members = edges.select(F.col("src").alias("node"), F.col("dst").alias("label"))
    out = members.unionByName(roots)
    if nodes is not None:
        out = out.unionByName(iso)
    return out.select(F.col("node").alias(out_name), F.col("label").alias("cluster_id"))
