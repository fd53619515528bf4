"""Round-6a additions — the Jaccard-family follow-through VERDICT r5
item 5 asked for.

The r5 verdict marked graph_jaccard_neighbors/_capped perf-weak: both
are Σdeg²-bound on the UNIFORM synthetic co-purchase graph (degrees
38-222 at sf0.1, no hub tail), where the 128-degree cap only shaves
~20% and every sublinear estimator drowns in near-tie rankings (top-50
jaccard 0.072-0.10 over 101M pairs of bulk ~0.005 — measured this
round; an LSH band of r rows catches a 0.07-jaccard pair with
probability 0.07^r, so r=1 floods 20M+ candidates and r=2 recalls
15%). The honest fix is the verdict's OR-branch, demonstrated here:

* ``graph_jaccard_skew_capped`` — the SAME capped-index lever on a
  graph that actually has hubs: a deterministic hub-injection remap
  of lineitem (every 10th partkey collapses onto one of 20 hub ids)
  over a quarter of the orders. Measured shape at sf0.1: degrees
  median 29 / max 2655, and the cap drops EXACTLY the 20 injected
  hubs, cutting index join work 7.8x (1.44e8 -> 1.85e7 rows; 91% on
  the un-subsampled variant). This is where the cap bites — and the
  query is exact-oracle verifiable because the cap and remap are
  mirrored in SQL.
* ``graph_jaccard_brand`` — the Jaccard-family entry that belongs in
  the HEADLINE bench: within-brand co-purchase similarity (top-3 part
  pairs per brand). Restricting endpoints and vias to one brand
  bounds the pair join at Σ_brand Σ deg² ≈ 5.6e5 rows at sf0.1 —
  sub-second, scale-linear in |E|, and a query users actually run
  ("which of OUR products sell together").

Plus ``corpus_duplicate_spans`` (registered later the same round):
exact cross-document duplicate-substring spans at k-token granularity
— the Lee et al. 2022 ExactSubstr dedup level the family lacked (see
its docstring for the shingle-index + gaps-and-islands plan).

All registered LAST (driver's unverified-first ordering keeps the r5
backlog in the front verification slots); all-integer outputs per the
round-6 hash discipline (ratios stay internal to the ORDER BY, where
one IEEE division of exact ints is bit-identical on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.materialize import materialize
from whisky_wine_etl_spark.plans.registry import query

_JACC_CAP = 128


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def skewed_copurchase_lineitem(li: DataFrame) -> DataFrame:
    """Deterministic hub-injection remap for cap demonstrations: every
    partkey divisible by 10 collapses onto hub id
    -1 - ((partkey div 10) % 20), over the l_orderkey % 4 = 0 quarter
    of orders. Hub ids are NEGATIVE (-20..-1) so they live in a space
    disjoint from real partkeys (>= 1) — the r6 version mapped onto
    0..19, silently merging real parts 1..19 into the hubs (ADVICE
    r6). 20 hubs each co-occur with thousands of parts (Σdeg²
    explodes); everyone else keeps quarter-scale degrees (~29 median
    at sf0.1)."""
    return li.filter(F.col("l_orderkey") % 4 == 0).select(
        "l_orderkey",
        F.when(
            F.col("l_partkey") % 10 == 0,
            F.lit(-1) - (F.expr("l_partkey div 10") % 20),
        )
        .otherwise(F.col("l_partkey"))
        .alias("l_partkey"),
    )


@query(
    "graph_jaccard_skew_capped",
    f"""
WITH li AS (
  SELECT DISTINCT l_orderkey,
         CASE WHEN l_partkey % 10 = 0 THEN -1 - ((l_partkey // 10) % 20)
              ELSE l_partkey END AS pk
  FROM lineitem WHERE l_orderkey % 4 = 0
),
e1 AS (
  SELECT a.pk AS src, b.pk AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.pk < b.pk
  GROUP BY 1, 2
),
edges AS (SELECT src, dst FROM e1 UNION ALL SELECT dst, src FROM e1),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
idx AS (
  SELECT e.src, e.dst FROM edges e
  JOIN deg ON deg.node = e.dst
  WHERE deg.d <= {_JACC_CAP}
),
common AS (
  SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM idx a JOIN idx b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src
),
j AS (
  SELECT u, v, c, du.d + dv.d - c AS uni
  FROM common
  JOIN deg du ON du.node = u
  JOIN deg dv ON dv.node = v
),
r AS (
  SELECT u, v, c, uni,
         ROW_NUMBER() OVER (ORDER BY CAST(c AS DOUBLE) / uni DESC, u, v) AS rk
  FROM j
)
SELECT u AS part_a, v AS part_b, c AS common_cnt, uni AS union_cnt
FROM r WHERE rk <= 50
""",
)
def graph_jaccard_skew_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 neighborhood-Jaccard pairs on the HUB-INJECTED
    co-purchase graph with the 128-degree via cap — the cap lever
    demonstrated where it bites (VERDICT r5 item 5). On this graph the
    20 injected hubs are exactly the via-nodes above the cap: dropping
    them from the common-neighbor index cuts the pair join from
    1.44e8 to 1.85e7 rows at sf0.1 (7.8x; tests/test_jaccard_skew_cap
    pins the ratio), while degrees in the denominator stay exact and
    the capped count stays a one-sided lower bound of the true
    overlap. Work bound Σ_(deg≤C) deg² ≤ C·|E| — linear in edges at
    fixed C, hub-proof by construction. Outputs are ALL-INTEGER
    (common/union counts; the jaccard ratio exists only inside the
    ORDER BY as one IEEE division of exact ints, bit-identical on
    both engines — round-6 hash discipline after the cusum red row).
    The remap/cap literals are mirrored in the oracle, so semantics
    are exact (hash-verified), not estimated."""
    from whisky_wine_etl_spark.operators.graph import copurchase_edges

    li = skewed_copurchase_lineitem(
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )
    edges = materialize(
        copurchase_edges(li, both_directions=True), fact_scale=True
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    # allowed-via list is node-count-sized -> broadcast; idx feeds both
    # sides of the pair self-join -> materialize once
    idx = materialize(
        edges.join(
            F.broadcast(
                deg.filter(F.col("d") <= _JACC_CAP).select(F.col("node").alias("dst"))
            ),
            "dst",
        ),
        fact_scale=True,
    )
    a, b = idx.alias("a"), idx.alias("b")
    common = (
        a.join(b, (F.col("a.dst") == F.col("b.dst")) & (F.col("a.src") < F.col("b.src")))
        .groupBy(F.col("a.src").alias("u"), F.col("b.src").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    j = (
        common.join(du, "u")
        .join(dv, "v")
        .select("u", "v", "c", (F.col("du") + F.col("dv") - F.col("c")).alias("uni"))
    )
    # orderBy+limit -> TakeOrderedAndProject: per-partition top-50 +
    # 50-row driver merge, never a single-task global window
    return (
        j.orderBy((F.col("c").cast("double") / F.col("uni")).desc(), "u", "v")
        .limit(50)
        .select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            F.col("c").alias("common_cnt"),
            F.col("uni").alias("union_cnt"),
        )
    )


@query(
    "graph_jaccard_brand",
    """
WITH li AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand AS brand, l.l_partkey
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
e1 AS (
  SELECT a.brand, a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.brand = b.brand
   AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2, 3
),
edges AS (
  SELECT brand, src, dst FROM e1
  UNION ALL SELECT brand, dst, src FROM e1
),
deg AS (
  SELECT brand, src AS node, CAST(COUNT(*) AS BIGINT) AS d
  FROM edges GROUP BY 1, 2
),
common AS (
  SELECT a.brand, a.src AS u, b.src AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM edges a JOIN edges b
    ON a.brand = b.brand AND a.dst = b.dst AND a.src < b.src
  GROUP BY 1, 2, 3
),
j AS (
  SELECT cm.brand, cm.u, cm.v, cm.c, du.d + dv.d - cm.c AS uni
  FROM common cm
  JOIN deg du ON du.brand = cm.brand AND du.node = cm.u
  JOIN deg dv ON dv.brand = cm.brand AND dv.node = cm.v
),
r AS (
  SELECT brand, u, v, c, uni,
         ROW_NUMBER() OVER (
           PARTITION BY brand
           ORDER BY CAST(c AS DOUBLE) / uni DESC, u, v) AS rk
  FROM j
)
SELECT brand, u AS part_a, v AS part_b, c AS common_cnt, uni AS union_cnt
FROM r WHERE rk <= 3
""",
)
def graph_jaccard_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-brand co-purchase Jaccard: top-3 most-similar part pairs
    per brand ("which of OUR products sell together") — the
    Jaccard-family query that belongs in the headline bench. The
    brand restriction is the scale story: endpoints AND via-nodes
    live inside one brand's subgraph, so the common-neighbor join is
    Σ_brand Σ deg_b(n)² ≈ 5.6e5 rows at sf0.1 (degrees ≤16) instead
    of the full graph's 2.9e8 — sub-second, linear in |E| as brands
    multiply, and naturally partition-parallel BY brand. Plan: one
    lineitem⋈part equi-join (AQE decides broadcast; part scales with
    SF so it is not forced), per-(order, brand) basket emission in
    whole-stage codegen (double explode, no fact self-join), one
    (brand, dst) shuffle for the pair join, and a brand-keyed rank
    window (25 partitions — keyed, never global). Outputs all-integer
    (round-6 hash discipline); the jaccard ratio exists only inside
    the per-brand ORDER BY as one exact-int IEEE division."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(
            _t(spark, sf_dir, "part").select(
                F.col("p_partkey").alias("l_partkey"),
                F.col("p_brand").alias("brand"),
            ),
            "l_partkey",
        )
    )
    baskets = li.groupBy("l_orderkey", "brand").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    e1 = (
        baskets.select("brand", F.explode("parts").alias("pa"), "parts")
        .select("brand", "pa", F.explode("parts").alias("pb"))
        .filter(F.col("pa") < F.col("pb"))
        .distinct()
    )
    edges = (
        e1.select(
            "brand", F.col("pa").alias("src"), F.col("pb").alias("dst")
        )
        .unionAll(
            e1.select(
                "brand", F.col("pb").alias("src"), F.col("pa").alias("dst")
            )
        )
        # r12: edges feeds FOUR subtrees (deg→du, deg→dv, and both
        # sides of the common-neighbor self-join); left lazy, the
        # whole lineitem⋈part + basket + explode + distinct pipeline
        # re-ran per consumer (the union defeats runtime exchange
        # reuse). Materializing once measured 7.7 s → 3.8 s median at
        # sf0.1 (guide §2.4: remove repeated upstream work outright).
        # r13: eager=False + policy tier (fact-scale edge frame)
        .transform(lambda d: materialize(d, fact_scale=True))
    )
    deg = edges.groupBy("brand", F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    a, b = edges.alias("a"), edges.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.brand") == F.col("b.brand"))
            & (F.col("a.dst") == F.col("b.dst"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.brand").alias("brand"),
            F.col("a.src").alias("u"),
            F.col("b.src").alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    du = deg.select("brand", F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select("brand", F.col("node").alias("v"), F.col("d").alias("dv"))
    j = (
        common.join(du, ["brand", "u"])
        .join(dv, ["brand", "v"])
        .select(
            "brand", "u", "v", "c", (F.col("du") + F.col("dv") - F.col("c")).alias("uni")
        )
    )
    w = W.partitionBy("brand").orderBy(
        (F.col("c").cast("double") / F.col("uni")).desc(), "u", "v"
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "brand",
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            F.col("c").alias("common_cnt"),
            F.col("uni").alias("union_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# Exact duplicate-SPAN detection (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better", §4 ExactSubstr): find
# the maximal token spans that occur in MORE THAN ONE document. The
# repo's dedup family already handles doc-level (hash/MinHash/SimHash),
# line-level (C4) and chunk-level (CDC) duplication; this is the
# remaining granularity — cross-document repeated SUBSTRINGS inside
# otherwise-unique documents, the form Lee et al. showed matters most
# for LLM training. The suffix-array of the paper is a single-machine
# construct; the Spark-first equivalent is the k-token shingle
# inverted index this engine already uses for n-gram dedup, followed
# by a per-document gaps-and-islands merge of duplicated positions
# into maximal spans.
# ---------------------------------------------------------------------------

_SPAN_K = 8  # span granularity: duplicated runs of >= 8 tokens
_SPAN_DF_CAP = 256  # boilerplate guard: shingles in > CAP docs are dropped


@query(
    "corpus_duplicate_spans",
    f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
  WHERE len(string_split(text, ' ')) >= {_SPAN_K}
),
sh AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(ts[u.i:u.i+{_SPAN_K - 1}], ' ') AS shingle
  FROM tok, LATERAL unnest(range(1, len(ts)-{_SPAN_K - 2})) AS u(i)
),
dup AS (
  SELECT shingle FROM sh GROUP BY shingle
  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {_SPAN_DF_CAP}
),
p AS (
  SELECT s.doc_id, s.pos,
         MAX(s.pos + {_SPAN_K - 1}) OVER (PARTITION BY s.doc_id ORDER BY s.pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM sh s JOIN dup USING (shingle)
),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM p
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {_SPAN_K - 1} AS BIGINT) AS span_end,
       CAST(MAX(pos) + {_SPAN_K} - MIN(pos) AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_dup_shingles
FROM isl GROUP BY doc_id, island
""",
)
def corpus_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated token spans (ExactSubstr dedup
    at k=8 granularity): every position whose 8-token shingle also
    occurs in another document, merged per document into maximal
    [span_start, span_end] token ranges (1-based, inclusive).

    Spark-first plan in three scale-honest stages: (1) shingle
    emission is one whole-stage-codegen pass (split + sequence +
    slice + posexplode — no UDF, no self-join; positions-per-doc is
    length-bounded); (2) the duplicated-shingle set comes from ONE
    map-side-combinable groupBy with the same df-cap lever as the
    n-gram dedup family ({_SPAN_DF_CAP}: a shingle in more documents
    than that is boilerplate whose postings join would be the classic
    Zipf hot key — the cap literal is mirrored in the oracle, so
    semantics stay exact); (3) span merging is the gaps-and-islands
    pattern under DOC-KEYED windows (running max of span end, island
    counter) — never a global window, partition-parallel by document
    at any corpus size. Outputs are ALL-INTEGER (round-6 hash
    discipline). Token positions use 1-based inclusive indexing
    identical in Spark's slice() and DuckDB's list slicing; docs
    shorter than k are filtered on BOTH engines before shingling
    (Spark's sequence() would generate a DESCENDING range for them).
    Reference granularity trail: doc-level = dedup_exact/minhash,
    line-level = corpus_line_dedup, chunk-level = text_cdc_chunks;
    this adds the substring level of Lee et al. 2022."""
    k = _SPAN_K
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ts")
    ).filter(F.size("ts") >= k)
    sh = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(ts)-{k - 1}),"
                f" i -> concat_ws(' ', slice(ts, i, {k})))"
            )
        ).alias("pos0", "shingle"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "shingle")
    # r12: sh feeds the duplicated-shingle aggregate AND the semi-join
    # probe side — materialize the split+posexplode emission once
    # instead of twice (measured 7.9 -> 2.6 s median at sf0.1; guide
    # §2.4)
    sh = materialize(sh, fact_scale=True)
    dup = (
        sh.groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter((F.col("nd") >= 2) & (F.col("nd") <= _SPAN_DF_CAP))
        .select("shingle")
    )
    # The duplicated-shingle set is data-dependent-sized: on a real
    # web corpus it GROWS with corpus size and duplication rate —
    # exactly this operator's target regime — so it must NOT be
    # force-broadcast (VERDICT r6 item 3). Left-semi with no hint:
    # AQE converts to broadcast at runtime when the set is actually
    # small, and falls back to a shuffled semi-join when it is not.
    p = sh.join(dup, "shingle", "left_semi").select("doc_id", "pos")
    w_prev = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = W.partitionBy("doc_id").orderBy("pos")
    isl = p.withColumn(
        "prev_end", F.max(F.col("pos") + (k - 1)).over(w_prev)
    ).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_end").isNull()
                | (F.col("pos") > F.col("prev_end") + 1),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("pos").cast("bigint").alias("span_start"),
        (F.max("pos") + (k - 1)).cast("bigint").alias("span_end"),
        (F.max("pos") + k - F.min("pos")).cast("bigint").alias("span_tokens"),
        F.count(F.lit(1)).alias("n_dup_shingles"),
    ).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "span_start",
        "span_end",
        "span_tokens",
        "n_dup_shingles",
    )
