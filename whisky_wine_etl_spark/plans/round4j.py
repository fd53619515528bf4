"""Round-4j additions: frontier BFS shortest-path distances and a
Zipf power-law fit over the bigram vocabulary.

Registered AFTER round4i (plans.load_all imports this module last) so
the driver's unverified-first ordering keeps the earlier backlog in
the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators.keys import add_running_total
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# BFS shortest-path distances — the traversal primitive (reachability,
# influence radius, fraud rings) that complements the package's other
# iterative graph ops (connected components, pagerank, triangles).
# ---------------------------------------------------------------------------


@query(
    "graph_bfs_distance",
    """
WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
src AS (SELECT MIN(pa) AS s FROM e),
walk(node, dist) AS (
  SELECT s, 0 FROM src
  UNION
  SELECT CASE WHEN w.node = e.pa THEN e.pb ELSE e.pa END, w.dist + 1
  FROM walk w JOIN e ON w.node = e.pa OR w.node = e.pb
  WHERE w.dist < 4
)
SELECT node, CAST(MIN(dist) AS INT) AS dist
FROM walk GROUP BY node
""",
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first shortest-path distance (≤ 4 hops) from the
    minimum-id part to every reachable part in the co-purchase graph,
    by distributed frontier expansion: each round joins the CURRENT
    frontier (not the visited set) to the symmetric edge closure,
    anti-joins the visited set, and localCheckpoints to truncate
    lineage — the per-round work is O(frontier adjacency), the
    classic Pregel BFS shape. Edges come from the shared basket
    builder (operators/graph.py: one orderkey shuffle, no fact-table
    self-join). Driver traffic per round is one
    O(1) count (the loop-termination check). The oracle is DuckDB's
    recursive CTE, which explores (node, dist) pairs — ground truth,
    not a scale plan."""
    from whisky_wine_etl_spark.operators.graph import copurchase_edges

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # symmetric closure via ONE orderkey shuffle (basket combination
    # emission, operators/graph.py) — each round then needs a single
    # frontier⋈edges join instead of a forward + backward pair
    # eager=False checkpoints throughout (r13): every frame here is
    # followed by an unavoidable action (the src scalar, each round's
    # frontier count, the final collect) — let that action materialize
    # the persist-backed checkpoint instead of paying one extra eager
    # job per frame per round; plans and results are identical.
    e = copurchase_edges(li, both_directions=True).localCheckpoint(eager=False)
    # O(1) driver scalar: the BFS source (materializes e)
    src = e.agg(F.min("src")).collect()[0][0]
    spark_ = li.sparkSession
    frontier = spark_.createDataFrame([(src,)], "node long").localCheckpoint(eager=False)
    visited = frontier.withColumn("dist", F.lit(0)).localCheckpoint(eager=False)
    # frontier/visited sizes are known exactly (each round counts),
    # so BROADCAST them while small: the big edge table then streams
    # through a map-side hash join instead of being re-shuffled on
    # src every round — at BFS's typical shape (frontier ≪ edges)
    # this removes the dominant per-round exchange. Falls back to a
    # shuffle join past the threshold (a frontier of tens of millions
    # on a real cluster should not ride the driver).
    bcast_limit = 2_000_000
    frontier_n, visited_n = 1, 1
    for d in range(1, 5):
        f = F.broadcast(frontier) if frontier_n <= bcast_limit else frontier
        v = (
            F.broadcast(visited.select("node"))
            if visited_n <= bcast_limit
            else visited.select("node")
        )
        new = (
            f.join(e, f.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(v, "node", "left_anti")
            .localCheckpoint(eager=False)  # materialized by the count
        )
        frontier_n = new.count()
        if frontier_n == 0:
            break
        visited_n += frontier_n
        visited = (
            visited.unionAll(new.withColumn("dist", F.lit(d)))
            # eager=False: next round's visited-broadcast build (or the
            # final collect) materializes it from checkpointed inputs
            .localCheckpoint(eager=False)
        )
        frontier = new
    return visited.select("node", F.col("dist").cast("int").alias("dist"))


# ---------------------------------------------------------------------------
# Zipf power-law fit — the vocabulary-shape diagnostic for corpus
# health: natural text follows freq ∝ rank^−s with s ≈ 1; generated
# or templated corpora show it immediately in the fitted exponent.
# ---------------------------------------------------------------------------


@query(
    "text_zipf_fit",
    """
WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
),
bg AS (
  SELECT a.t || ' ' || b.t AS g
  FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE a.t <> '' AND b.t <> ''
),
f AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY g),
r AS (
  SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, g) AS BIGINT) AS rnk
  FROM f
)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
       ROUND(regr_slope(ln(c), ln(rnk)), 4) AS zipf_exponent,
       ROUND(regr_intercept(ln(c), ln(rnk)), 4) AS log_intercept,
       ROUND(regr_r2(ln(c), ln(rnk)), 4) AS r2
FROM r
""",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit of ln(freq) against ln(rank) over the bigram
    vocabulary: the Zipf exponent (slope), intercept, and R².

    Scale plan: the corpus collapses to its vocabulary in one
    map-side-combinable aggregate; ranks come from the two-pass
    range-partition running count (operators/keys) with a total
    (count desc, gram) tie-break — no single-task global sort — and
    the regression is one algebraic aggregate over the vocab frame.
    The only floats are ln() of exact integers feeding regr_*, so
    engine drift is limited to summation order inside the covariance
    accumulators (rounded away at 4 dp)."""
    docs = _t(spark, sf_dir, "documents")
    arr = docs.select(F.split("text", " ").alias("w")).filter(F.size("w") >= 2)
    grams = (
        arr.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> named_struct('a', element_at(w, i),"
                    " 'b', element_at(w, i + 1)))"
                )
            ).alias("p")
        )
        .filter((F.col("p.a") != "") & (F.col("p.b") != ""))
        .select(F.concat_ws(" ", "p.a", "p.b").alias("g"))
    )
    f = grams.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ranked = add_running_total(
        f.withColumn("__negc", -F.col("c")).withColumn("__one", F.lit(1)),
        ["__negc", "g"],
        "__one",
        out_col="rnk",
    )
    lc, lr = F.log("c"), F.log("rnk")
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.round(F.regr_slope(lc, lr), 4).alias("zipf_exponent"),
        F.round(F.regr_intercept(lc, lr), 4).alias("log_intercept"),
        F.round(F.regr_r2(lc, lr), 4).alias("r2"),
    )
