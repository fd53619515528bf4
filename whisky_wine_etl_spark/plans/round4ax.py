"""Round-4ax: t-closeness privacy audit and weighted shortest paths.

Registered AFTER round4aw so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.

- ``privacy_t_closeness`` completes the k-anonymity / l-diversity /
  DP family with the distribution-distance criterion: for every
  quasi-identifier group, the total-variation distance between the
  group's sensitive-attribute distribution and the global one.
- ``graph_sssp_weighted`` extends graph_bfs_distance (hop counts) to
  WEIGHTED shortest paths via distributed Bellman-Ford with the
  improved-frontier optimization; the oracle is the same relaxation
  unrolled in plain SQL (no recursive CTE — a weighted walk CTE
  enumerates paths and explodes combinatorially; the unrolled
  per-level min-aggregate is polynomial in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "privacy_t_closeness",
    """
WITH j AS (
  SELECT c.c_nationkey AS nation, c.c_mktsegment AS segment,
         o.o_orderpriority AS pr
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM j),
gq AS (
  SELECT pr, CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS q
  FROM j GROUP BY pr
),
grp AS (
  SELECT nation, segment, pr, CAST(COUNT(*) AS DOUBLE) AS cnt
  FROM j GROUP BY nation, segment, pr
),
gt AS (
  SELECT nation, segment, SUM(cnt) AS gn FROM grp GROUP BY nation, segment
)
SELECT g.nation, g.segment,
       CAST(MAX(t.gn) AS BIGINT) AS group_n,
       ROUND(0.5 * (SUM(ABS(g.cnt / t.gn - q.q)) + 1.0 - SUM(q.q)), 6)
         AS t_closeness
FROM grp g
JOIN gt t ON g.nation = t.nation AND g.segment = t.segment
JOIN gq q ON g.pr = q.pr
GROUP BY g.nation, g.segment
""",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al., ICDE'07): per (nation, segment)
    quasi-identifier group, the total-variation distance between the
    group's order-priority distribution and the corpus-wide one.

    The TVD over the full category space folds to present-categories
    only: ``0.5·(Σ_present |p−q| + Σ_absent q)`` and ``Σ_absent q =
    1 − Σ_present q``, so no group×category scaffold join is ever
    materialized — each group aggregates exactly its own observed
    rows. Scale: one shuffle keyed (qi, sensitive) for cell counts,
    one keyed (qi) for the group fold; the global distribution is a
    category-cardinality frame (5 rows) joined broadcast; the total
    is a 1-row crossJoin — zero driver-side data traffic."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey"), F.col("o_orderpriority").alias("pr")
    )
    j = c.join(o, c.c_custkey == o.o_custkey).select("nation", "segment", "pr")

    tot = j.agg(F.count(F.lit(1)).cast("double").alias("n"))
    glob = (
        j.groupBy("pr")
        .agg(F.count(F.lit(1)).cast("double").alias("cq"))
        .crossJoin(F.broadcast(tot))
        .select("pr", (F.col("cq") / F.col("n")).alias("q"))
    )
    grp = j.groupBy("nation", "segment", "pr").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    gt = grp.groupBy("nation", "segment").agg(F.sum("cnt").alias("gn"))
    return (
        grp.join(gt, ["nation", "segment"])
        .join(F.broadcast(glob), "pr")
        .groupBy("nation", "segment")
        .agg(
            F.max("gn").cast("bigint").alias("group_n"),
            F.round(
                0.5
                * (
                    F.sum(F.abs(F.col("cnt") / F.col("gn") - F.col("q")))
                    + F.lit(1.0)
                    - F.sum("q")
                ),
                6,
            ).alias("t_closeness"),
        )
    )


_SSSP_EDGES = """
op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS c
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY pa, pb
),
e AS (
  SELECT pa AS src, pb AS dst, CAST(1 AS DOUBLE) / c AS w FROM pairs
  UNION ALL
  SELECT pb, pa, CAST(1 AS DOUBLE) / c FROM pairs
)
"""

_SSSP_LEVEL = """
d{k} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{p}
    UNION ALL
    SELECT e.dst AS node, d{p}.dist + e.w AS dist
    FROM d{p} JOIN e ON d{p}.node = e.src
  ) u GROUP BY node
)
"""


@query(
    "graph_sssp_weighted",
    "WITH "
    + _SSSP_EDGES
    + """,
s AS (SELECT MIN(src) AS s FROM e),
d0 AS (SELECT s AS node, CAST(0 AS DOUBLE) AS dist FROM s),
"""
    + ",".join(_SSSP_LEVEL.format(k=k, p=k - 1) for k in range(1, 5))
    + """
SELECT node, ROUND(dist, 6) AS dist FROM d4
""",
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (≤ 4 relaxation rounds)
    over the co-purchase graph, edge weight 1/basket-count (stronger
    ties are closer), from the minimum-id part.

    Distributed Bellman-Ford with the improved-frontier optimization:
    round *d* relaxes ONLY nodes whose distance improved in round
    *d−1* (nodes whose best distance is unchanged were already fully
    relaxed when they last improved, so skipping them loses nothing —
    the standard SSSP-on-Pregel invariant). Per round: one
    frontier⋈edges join (frontier broadcast while its exactly-known
    count stays small, shuffle join past the threshold), a map-side
    partial min per dst, and a full-outer min-merge into the distance
    table; localCheckpoint truncates the iterative lineage. Driver
    traffic is one O(1) count per round. The oracle is the identical
    relaxation unrolled level-by-level in SQL — path sums accumulate
    additions in the same order in both engines, so the doubles agree
    bit-for-bit before the 6 dp display rounding."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Weighted pairs via basket emission (copurchase_edges with
    # multiplicity), NOT a fact self-join on orderkey: one orderkey
    # shuffle + codegen pair explode, measured 4.4 s → 2.3 s at sf0.1
    # for the identical (pa, pb, count) multiset (round-5 rewrite; the
    # oracle keeps the relational self-join as ground truth).
    from whisky_wine_etl_spark.operators.graph import copurchase_edges

    pairs = (
        copurchase_edges(li, distinct=False)
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("pa", "pb", (F.lit(1.0) / F.col("c")).alias("w"))
    )
    e = (
        pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst"), "w")
        .unionAll(
            pairs.select(
                F.col("pb").alias("src"), F.col("pa").alias("dst"), "w"
            )
        )
        # eager=False checkpoints throughout (r13): the src scalar and
        # each round's frontier count are the materializing actions —
        # same persist-once semantics, 1 job per round instead of 4
        .localCheckpoint(eager=False)
    )
    src = e.agg(F.min("src")).collect()[0][0]  # O(1) driver scalar

    spark_ = li.sparkSession
    dist = spark_.createDataFrame(
        [(src, 0.0)], "node long, dist double"
    ).localCheckpoint(eager=False)
    frontier = dist
    bcast_limit = 2_000_000
    frontier_n = 1
    for _ in range(4):
        f = F.broadcast(frontier) if frontier_n <= bcast_limit else frontier
        cand = (
            f.join(e, f.node == e.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("d2"),
            )
            .groupBy("node")
            .agg(F.min("d2").alias("d2"))
        )
        merged = (
            dist.join(cand, "node", "full_outer")
            .select(
                "node",
                F.least("dist", "d2").alias("new_dist"),
                F.col("dist").alias("old_dist"),
            )
            .localCheckpoint(eager=False)
        )
        improved = merged.filter(
            F.col("old_dist").isNull()
            | (F.col("new_dist") < F.col("old_dist"))
        ).select("node", F.col("new_dist").alias("dist"))
        dist = merged.select(
            "node", F.col("new_dist").alias("dist")
        ).localCheckpoint(eager=False)
        frontier = improved.localCheckpoint(eager=False)
        # the count materializes frontier and (through its lineage)
        # this round's merged checkpoint in the same job
        frontier_n = frontier.count()
        if frontier_n == 0:
            break
    return dist.select("node", F.round("dist", 6).alias("dist"))
