#!/usr/bin/env python
"""Phase-level timing of the iterative graph heavies (r12, guide §1.1:
find where the time actually goes before changing anything).

Re-creates each query's plan inline with perf_counter fences at every
materialization boundary (checkpoint / count / collect), so the edge
build, the per-round message passing, and the final collect are timed
separately. Read-only diagnostics; results feed OPTIMIZATION_r12.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from whisky_wine_etl_spark import plans  # noqa: E402
from whisky_wine_etl_spark.catalog import load_table  # noqa: E402
from whisky_wine_etl_spark.operators.graph import copurchase_edges  # noqa: E402
from whisky_wine_etl_spark.session import get_spark  # noqa: E402

T: list[tuple[str, float]] = []
_last = [0.0]


def tick(label: str) -> None:
    now = time.perf_counter()
    T.append((label, now - _last[0]))
    _last[0] = now


def reset() -> None:
    T.clear()
    _last[0] = time.perf_counter()


def report(name: str) -> None:
    total = sum(d for _, d in T)
    print(f"\n== {name}  total {total:.2f}s ==")
    for label, d in T:
        print(f"  {d:6.2f}s  {label}")


def pagerank(spark, sf_dir) -> None:
    reset()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("parts"))
    e1 = (
        baskets.select(F.explode("parts").alias("src"), "parts")
        .select("src", F.explode("parts").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    edges = e1.unionAll(
        e1.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    tick("edge build + checkpoint")
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)
    )
    tick("degree checkpoint")
    n_nodes = deg.count()
    tick("deg count")
    contrib_src = edges.join(
        deg.withColumnRenamed("node", "src"), "src"
    ).localCheckpoint(eager=True)
    tick("contrib_src checkpoint")
    ranks = deg.select("node", F.lit(1.0 / n_nodes).alias("r"))
    for it in range(3):
        ranks = (
            contrib_src.join(
                F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") / F.col("d")).alias("c"))
            .select(
                "node",
                (F.lit(0.15 / n_nodes) + F.lit(0.85) * F.col("c")).alias("r"),
            )
        )
        if it < 2:
            ranks = ranks.localCheckpoint(eager=True)
        tick(f"round {it}")
    ranks.select(
        F.col("node").alias("l_partkey"),
        F.round(F.col("r") * 1000, 6).alias("pagerank_x1000"),
    ).collect()
    tick("final collect")
    report("graph_pagerank_copurchase")


def sssp(spark, sf_dir) -> None:
    reset()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        copurchase_edges(li, distinct=False)
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("pa", "pb", (F.lit(1.0) / F.col("c")).alias("w"))
    )
    e = (
        pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst"), "w")
        .unionAll(pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"), "w"))
        .localCheckpoint(eager=True)
    )
    tick("edge build + checkpoint")
    src = e.agg(F.min("src")).collect()[0][0]
    tick("src scalar")
    spark_ = li.sparkSession
    dist = spark_.createDataFrame([(src, 0.0)], "node long, dist double").localCheckpoint(
        eager=True
    )
    frontier = dist
    frontier_n = 1
    for rnd in range(4):
        f = F.broadcast(frontier) if frontier_n <= 2_000_000 else frontier
        cand = (
            f.join(e, f.node == e.src)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("d2"))
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
            .localCheckpoint(eager=True)
        )
        tick(f"round {rnd}: merged checkpoint")
        improved = merged.filter(
            F.col("old_dist").isNull() | (F.col("new_dist") < F.col("old_dist"))
        ).select("node", F.col("new_dist").alias("dist"))
        dist = merged.select("node", F.col("new_dist").alias("dist")).localCheckpoint(
            eager=True
        )
        frontier = improved.localCheckpoint(eager=True)
        tick(f"round {rnd}: dist+frontier checkpoints")
        frontier_n = frontier.count()
        tick(f"round {rnd}: frontier count ({frontier_n})")
        if frontier_n == 0:
            break
    dist.select("node", F.round("dist", 6).alias("dist")).collect()
    tick("final collect")
    report("graph_sssp_weighted")


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    plans.load_all()
    spark = get_spark(cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    plans.QUERIES["flagship_q5_revenue_by_nation"](spark, sf_dir).collect()  # warmup
    which = (sys.argv[1] if len(sys.argv) > 1 else "pagerank,sssp").split(",")
    for w in which:
        {"pagerank": pagerank, "sssp": sssp}[w](spark, sf_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
