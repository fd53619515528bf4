"""r12 optimization guard: the fused Lloyd's update pass
(_kmeans_update_cells_quantized, one mapInPandas crossing) must return
bit-identical (cluster, dim) -> (sum, count) cells to the r11 shape it
replaced (full assignment UDF + posexplode + groupBy), including the
null/ragged-vector exclusion — and therefore identical centroids from
the fit loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from whisky_wine_etl_spark.operators.clustering import (
    _kmeans_update_cells_quantized,
    kmeans_assign_quantized,
    kmeans_fit_quantized,
)

SCALE = 1_000_000


def _legacy_cells(df, vec_col, centroids, scale):
    """The exact r11 update shape (assignment UDF + posexplode +
    groupBy), kept here as the equivalence reference."""
    assigned = kmeans_assign_quantized(df, vec_col, centroids, scale)
    return (
        assigned.filter(F.col("cluster").isNotNull())
        .select("cluster", F.posexplode(vec_col).alias("dim", "xf"))
        .select(
            "cluster",
            "dim",
            F.floor(
                F.col("xf").cast("double") * F.lit(float(scale)) + F.lit(0.5)
            ).alias("x"),
        )
        .groupBy("cluster", "dim")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = []
    for i in range(200):
        rows.append((i, [((i * 37 + j * 11) % 97) / 9.7 for j in range(8)]))
    rows.append((900, None))  # null vector: excluded from the update
    rows.append((901, [1.0, 2.0]))  # ragged vector: excluded too
    # r13 (ADVICE r12 item 2): correct-length vector with NULL
    # *elements* — the legacy posexplode path skipped the element in
    # F.sum but still counted the row in count(1) for every dim; the
    # fused pass must reproduce that cell exactly (mask the sums, keep
    # the count) instead of summing the NaN->int64 garbage cast.
    rows.append((902, [3.0, None, 5.0, None, 7.0, 8.0, 9.0, 1.5]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(7)


def _centroids(df):
    rows = df.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    import math

    return [
        [math.floor(float(x) * float(SCALE) + 0.5) for x in r["embedding"]]
        for r in rows
    ]


def test_fused_cells_match_legacy_shape(vec_df):
    cents = _centroids(vec_df)
    fused = {
        (r["cluster"], r["dim"]): (int(r["s"]), int(r["n"]))
        for r in _kmeans_update_cells_quantized(vec_df, "embedding", cents, SCALE)
    }
    legacy = {
        (r["cluster"], r["dim"]): (int(r["s"]), int(r["n"]))
        for r in _legacy_cells(vec_df, "embedding", cents, SCALE)
    }
    assert fused == legacy


def test_fit_loop_centroids_unchanged_by_fusion(vec_df):
    """End-to-end: the fit loop's centroids equal a hand-run of the
    legacy update chain from the same init."""
    cents = _centroids(vec_df)
    expect = [list(c) for c in cents]
    for _ in range(3):
        cells = _legacy_cells(vec_df, "embedding", expect, SCALE)
        new_c = [list(c) for c in expect]
        for r in cells:
            s, n = int(r["s"]), int(r["n"])
            new_c[r["cluster"]][r["dim"]] = (2 * s + n) // (2 * n)
        expect = new_c
    got = kmeans_fit_quantized(
        vec_df, "vec_id", "embedding", k=4, n_iter=3, scale=SCALE
    )
    assert got == expect
