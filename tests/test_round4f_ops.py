"""Behavior tests for round-4f: foreachBatch upsert query, Spearman
correlation, token entropy."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_foreachbatch_upsert_ran_multiple_batches(spark, tmp_path):
    """The registered query must exercise REAL cross-batch state: the
    versioned store ends with one committed version per micro-batch."""
    import glob
    import hashlib
    import os
    import tempfile

    out = {
        r.user_id: r.max_value
        for r in plans.QUERIES["stream_foreachbatch_upsert"](spark, SF).collect()
    }
    # batch twin
    want = {
        r.user_id: round(r.mx, 4)
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.max("value").alias("mx"))
        .collect()
    }
    assert out == want
    target = os.path.join(
        tempfile.gettempdir(),
        "sg_febupsert_"
        + hashlib.md5(SF.encode()).hexdigest()[:10]
        + "_"
        + hashlib.md5(spark.sparkContext.applicationId.encode()).hexdigest()[:10],
    )
    versions = glob.glob(target + "_versions/v*/_SUCCESS")
    assert len(versions) >= 3  # one committed version per micro-batch


def test_spearman_perfect_monotonic(spark, monkeypatch):
    """y = x³ is perfectly monotonic: spearman 1.0 even though
    pearson < 1."""
    import whisky_wine_etl_spark.plans.round4f as r4f

    orders = spark.createDataFrame(
        [Row(o_custkey=i, o_totalprice=float(i)) for i in range(1, 40)]
    )
    cust = spark.createDataFrame(
        [Row(c_custkey=i, c_acctbal=float(i) ** 3) for i in range(1, 40)]
    )
    monkeypatch.setattr(
        r4f, "load_table",
        lambda spark, sf, name: orders if name == "orders" else cust,
    )
    [res] = plans.QUERIES["stat_spearman_corr"](spark, SF).collect()
    assert res.spearman == pytest.approx(1.0, abs=1e-9)
    assert res.pearson < 1.0


def test_spearman_matches_bruteforce(spark):
    [res] = plans.QUERIES["stat_spearman_corr"](spark, SF).collect()
    rows = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select("o_totalprice", "c_acctbal")
        .collect()
    )
    xs = [r.o_totalprice for r in rows]
    ys = [r.c_acctbal for r in rows]

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(rx)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    sx = math.sqrt(sum((a - mx) ** 2 for a in rx))
    sy = math.sqrt(sum((b - my) ** 2 for b in ry))
    assert res.spearman == pytest.approx(cov / (sx * sy), abs=1e-3)
    assert res.n == n


def test_token_entropy_extremes(spark, monkeypatch):
    import whisky_wine_etl_spark.plans.round4f as r4f

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d", lang="en", source="s", n_chars=7),
            Row(doc_id=2, text="a a a a", lang="en", source="s", n_chars=7),
            Row(doc_id=3, text="a a b b", lang="en", source="s", n_chars=7),
        ]
    )
    monkeypatch.setattr(r4f, "load_table", lambda spark, sf, name: docs)
    out = {r.doc_id: r for r in plans.QUERIES["text_token_entropy"](spark, SF).collect()}
    # uniform over 4 distinct tokens: H = ln 4, norm = 1
    assert out[1].entropy == pytest.approx(math.log(4), abs=1e-5)
    assert out[1].entropy_norm == pytest.approx(1.0, abs=1e-6)
    # single type: H = 0, norm undefined
    assert out[2].entropy == 0.0 and out[2].entropy_norm is None
    # two balanced types: H = ln 2
    assert out[3].entropy == pytest.approx(math.log(2), abs=1e-5)
