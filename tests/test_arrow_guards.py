"""ADVICE-r4 guard rails: Arrow UDFs must survive empty batches and
null/ragged vectors instead of raising inside numpy."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_kmeans_assign_propagates_nulls_and_handles_ragged(spark):
    from whisky_wine_etl_spark.operators.clustering import kmeans_assign

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, None),            # null vector
            (3, [0.0, 1.0, 5.0]),  # ragged (wrong dim)
            (4, [0.0, 1.0]),
        ],
        "id long, v array<double>",
    )
    out = kmeans_assign(df, "v", [[1.0, 0.0], [0.0, 1.0]]).collect()
    got = {r.id: (r.cluster, r.sq_dist) for r in out}
    assert got[1] == (0, 0.0)
    assert got[4] == (1, 0.0)
    assert got[2][0] is None and got[2][1] is None
    assert got[3][0] is None and got[3][1] is None


def test_kmeans_assign_empty_partitions(spark):
    """A filter that empties some partitions must not crash the UDF
    (np.array([]) has no axis=1 — the original failure)."""
    from whisky_wine_etl_spark.operators.clustering import kmeans_assign

    df = (
        spark.range(100)
        .repartition(8)
        .select("id", F.array(F.col("id") * 1.0, F.lit(0.0)).alias("v"))
        .filter(F.col("id") == 7)  # 7 of 8 partitions end up empty
    )
    out = kmeans_assign(df, "v", [[7.0, 0.0], [0.0, 1.0]]).collect()
    assert len(out) == 1 and out[0].cluster == 0


def test_similarity_mat_helper_shapes_empty_batch():
    from whisky_wine_etl_spark.operators.similarity import _mat

    m = _mat(pd.Series([], dtype=object), 64)
    assert m.shape == (0, 64)
    # downstream ops that broke on 1-D empties must now work
    assert (m * m).sum(axis=1).shape == (0,)


@pytest.mark.parametrize("op", ["ivf", "pq"])
def test_ann_operators_ignore_null_vectors(spark, op):
    """Null embedding rows are dropped at the operator entry, so the
    Arrow batches stay dense and results cover only real vectors."""
    from whisky_wine_etl_spark.operators import similarity as sim

    base = [(i, [float((i * 7 + j) % 13) for j in range(8)]) for i in range(40)]
    rows = base + [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 3)
    fn = sim.ivf_topk if op == "ivf" else sim.pq_topk
    out = fn(df, queries, k=3, vec_col="embedding", id_col="vec_id").collect()
    assert out, "no results"
    ids = {r.cand_id for r in out} | {r.query_id for r in out}
    assert 100 not in ids and 101 not in ids
