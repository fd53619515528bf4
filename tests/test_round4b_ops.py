"""Behavioral tests for the round-4b operators (Gopher repetition
gate, Markov transitions, gaps-and-islands, rolling z-score,
schema-evolution read, watermark-bounded streaming dedup)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.operators.text import repetition_signals

plans.load_all()

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# repetition_signals
# ---------------------------------------------------------------------------


def test_repetition_flags_spam_and_keeps_clean(spark):
    rows = [
        # 12 repeats of one token: dup_token_frac 11/12, top bigram 11/11
        (1, " ".join(["spam"] * 12)),
        # all-distinct tokens
        (2, "the quick brown fox jumps over a lazy dog tonight"),
        # duplicate 10-token line: 20 tokens = line repeated twice
        (3, " ".join(f"w{i}" for i in range(10)) + " " + " ".join(f"w{i}" for i in range(10))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}

    spam = out[1]
    assert abs(spam["dup_token_frac"] - 11 / 12) < 1e-6  # 6-dp rounded output
    assert spam["top_bigram_frac"] == 1.0
    assert spam["keep"] is False

    clean = out[2]
    assert clean["dup_token_frac"] == 0.0
    assert clean["dup_line_frac"] == 0.0
    assert clean["keep"] is True

    lines = out[3]
    assert lines["dup_line_frac"] == 0.5
    assert lines["keep"] is False


def test_repetition_degenerate_docs_do_not_error(spark):
    rows = [(1, "solo"), (2, ""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    # single token: no bigrams -> 0.0, one line -> no dups
    assert got[1]["top_bigram_frac"] == 0.0
    assert got[1]["dup_line_frac"] == 0.0
    # empty string splits to [''] (one token), null text stays null-safe
    assert got[2]["keep"] is True
    assert got[3]["dup_token_frac"] == 0.0


# ---------------------------------------------------------------------------
# events_markov_transitions (operator-level, crafted stream)
# ---------------------------------------------------------------------------


def test_markov_probs_row_normalize(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a -> c  (from a: b once, c... wait a->b, b->a, a->c)
        (1, t0 + dt.timedelta(minutes=0), 1, "a"),
        (2, t0 + dt.timedelta(minutes=1), 1, "b"),
        (3, t0 + dt.timedelta(minutes=2), 1, "a"),
        (4, t0 + dt.timedelta(minutes=3), 1, "c"),
        # user 2: a -> b
        (5, t0, 2, "a"),
        (6, t0 + dt.timedelta(minutes=1), 2, "b"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    df.createOrReplaceTempView("__mk_events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        df.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {(r["from_type"], r["to_type"]): r["n"] for r in trans}
    # transitions: a->b (x2), b->a (x1), a->c (x1)
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1}


def test_markov_registered_probs_sum_to_one(spark):
    df = plans.QUERIES["events_markov_transitions"](spark, SF)
    sums = (
        df.groupBy("from_type").agg(F.round(F.sum("prob"), 4).alias("s")).collect()
    )
    for r in sums:
        assert abs(r["s"] - 1.0) < 2e-3  # 6-dp rounding per cell, ≤5 cells


# ---------------------------------------------------------------------------
# window_gaps_islands (crafted dates)
# ---------------------------------------------------------------------------


def test_gaps_islands_splits_on_missing_day(spark):
    mk = lambda d: dt.datetime(2024, 1, d, 12, 0, 0)
    rows = [
        # user 1 active 1,2,3  then 7,8; duplicate events on day 2
        (1, mk(1), 1), (2, mk(2), 1), (3, mk(2), 1), (4, mk(3), 1),
        (5, mk(7), 1), (6, mk(8), 1),
        # user 2 single day
        (7, mk(5), 2),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    from pyspark.sql import Window as W

    d = df.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    out = (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("grp", F.date_sub(F.col("d"), F.col("rn")))
        .groupBy("user_id", "grp")
        .agg(
            F.min("d").alias("s"),
            F.max("d").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    islands = sorted((r["user_id"], str(r["s"]), str(r["e"]), r["n"]) for r in out)
    assert islands == [
        (1, "2024-01-01", "2024-01-03", 3),
        (1, "2024-01-07", "2024-01-08", 2),
        (2, "2024-01-05", "2024-01-05", 1),
    ]


# ---------------------------------------------------------------------------
# events_anomaly_zscore: the frame must EXCLUDE the current row
# ---------------------------------------------------------------------------


def test_zscore_spike_does_not_mask_itself(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, 10.0 + (0.1 if i % 2 else -0.1))
        for i in range(20)
    ]
    rows.append((99, t0 + dt.timedelta(minutes=30), 1, 50.0))  # spike
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    from pyspark.sql import Window as W

    win = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-23, -1)
    scored = df.select(
        "event_id",
        "value",
        F.avg("value").over(win).alias("mu"),
        F.stddev_samp("value").over(win).alias("sd"),
        F.count(F.lit(1)).over(win).alias("n"),
    ).withColumn("z", (F.col("value") - F.col("mu")) / F.col("sd"))
    spike = scored.filter(F.col("event_id") == 99).collect()[0]
    # prior-only frame: mu ≈ 10, sd ≈ 0.1 -> z enormous. An inclusive
    # frame would fold the spike into mu/sd and shrink z drastically.
    assert spike["n"] == 20
    assert abs(spike["mu"] - 10.0) < 0.01
    assert spike["z"] > 100


# ---------------------------------------------------------------------------
# source_schema_evolution: added column is NULL for old files only
# ---------------------------------------------------------------------------


def test_schema_evolution_null_pattern(spark):
    df = plans.QUERIES["source_schema_evolution"](spark, SF)
    bad_old = df.filter((F.col("v") == 1) & F.col("n_chars").isNotNull()).count()
    bad_new = df.filter((F.col("v") == 2) & F.col("n_chars").isNull()).count()
    assert bad_old == 0 and bad_new == 0
    assert df.schema["v"].dataType.simpleString() == "int"


# ---------------------------------------------------------------------------
# stream_dedup_watermark: injected duplicates collapse
# ---------------------------------------------------------------------------


def test_stream_dedup_collapses_injected_duplicates(spark, tmp_path):
    import os

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(seconds=i), 1, "click", 1.0) for i in range(50)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    land = str(tmp_path / "land")
    os.makedirs(land, exist_ok=True)
    # the same 50 events written twice = exact duplicate arrivals
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "a"))
    df.coalesce(1).write.mode("append").parquet(str(tmp_path / "a"))
    from whisky_wine_etl_spark.streaming import pipelines as sp

    s = sp.file_events_stream(spark, str(tmp_path / "a"))
    deduped = (
        s.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    out = sp.run_to_memory(spark, deduped, "append")
    assert out.count() == 50
    assert out.distinct().count() == 50


# ---------------------------------------------------------------------------
# events_pattern_match: non-overlapping contiguous funnel counting
# ---------------------------------------------------------------------------


def test_pattern_match_counts_non_overlapping_triples(spark):
    t0 = dt.datetime(2024, 1, 1)
    seqs = {
        1: "vcpvcp",  # two complete funnels
        2: "vvcp",    # one (extra leading view)
        3: "vcvcp",   # only the second triple is contiguous
        4: "pcv",     # reversed: none
    }
    rows = []
    initial_to_type = {"v": "view", "c": "click", "p": "purchase"}
    eid = 0
    for uid, s in seqs.items():
        for i, ch in enumerate(s):
            rows.append((eid, t0 + dt.timedelta(minutes=i), uid, initial_to_type[ch]))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    seq = (
        df.groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c"))
                        )
                    ),
                    lambda x: x["c"],
                ),
            ).alias("seq")
        )
        .select(
            "user_id",
            ((F.length("seq") - F.length(F.replace(F.col("seq"), F.lit("vcp")))) / 3)
            .cast("bigint")
            .alias("n"),
        )
        .collect()
    )
    got = {r["user_id"]: r["n"] for r in seq}
    assert got == {1: 2, 2: 1, 3: 1, 4: 0}


# ---------------------------------------------------------------------------
# sim_knn_classify: majority vote with deterministic tie-break
# ---------------------------------------------------------------------------


def test_knn_vote_tie_breaks_to_smallest_label(spark):
    # query vec 0; neighbors: two of label 7 and two of label 3 equally
    # close, one far label 9 -> 2-2 vote among top-4 + 1 for 9; with
    # k=5 the vote is 2 (label 3) vs 2 (label 7) vs 1 (label 9): tie
    # between 3 and 7 must resolve to label 3.
    import math

    def unit(theta):
        v = [0.0] * 8
        v[0] = math.cos(theta)
        v[1] = math.sin(theta)
        return v

    rows = [
        (0, unit(0.0), 0),
        (1, unit(0.05), 7),
        (2, unit(-0.05), 7),
        (3, unit(0.06), 3),
        (4, unit(-0.06), 3),
        (5, unit(1.5), 9),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    from whisky_wine_etl_spark.operators import similarity as sim
    from pyspark.sql import Window as W

    topk = sim.brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=5)
    labels = df.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("cand_label"))
    votes = (
        topk.join(labels, "cand_id")
        .groupBy("query_id", "cand_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    wv = W.partitionBy("query_id").orderBy(F.col("n_votes").desc(), F.col("cand_label"))
    best = votes.withColumn("vr", F.row_number().over(wv)).filter(F.col("vr") == 1).collect()
    assert len(best) == 1
    assert best[0]["cand_label"] == 3
    assert best[0]["n_votes"] == 2


# ---------------------------------------------------------------------------
# z-order layout: correctness of the curve + skipping benefit
# ---------------------------------------------------------------------------


def test_zvalue_matches_python_reference(spark):
    from whisky_wine_etl_spark.functions.zorder import zvalue

    def py_z(vals, bits):
        z = 0
        for d, v in enumerate(vals):
            v &= (1 << bits) - 1
            for i in range(bits):
                z |= ((v >> i) & 1) << (i * len(vals) + d)
        return z

    rows = [(a, b) for a in [0, 1, 5, 1023, 700] for b in [0, 3, 512, 1023]]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", zvalue(F.col("a"), F.col("b"), bits=10).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == py_z([r["a"], r["b"]], 10), (r["a"], r["b"])


def test_zvalue_interleaves_monotonically_per_dim(spark):
    # fixing one dim, z is strictly increasing in the other
    from whisky_wine_etl_spark.functions.zorder import zvalue

    df = spark.createDataFrame([(i,) for i in range(64)], "a long")
    zs = [
        r["z"]
        for r in df.select(zvalue(F.col("a"), F.lit(7), bits=10).alias("z"))
        .orderBy("a")
        .collect()
    ]
    assert zs == sorted(zs) and len(set(zs)) == 64


def test_zorder_layout_tightens_both_dimensions(spark, tmp_path):
    """Per-file value ranges under the z-order layout must be tighter
    in BOTH dimensions than a ts-ordered (layout-agnostic) write —
    the property footer-stats pruning depends on."""
    import glob

    from whisky_wine_etl_spark.operators.layout import zorder_write

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id", "value", "ts"
    )
    lin_dir = str(tmp_path / "linear")
    z_dir = str(tmp_path / "zorder")
    ev.repartitionByRange(8, "ts").drop("ts").write.parquet(lin_dir)
    zorder_write(ev.drop("ts"), ["user_id", "value"], z_dir, n_files=8)

    def avg_span(d, col):
        spans = []
        for f in glob.glob(d + "/part-*.parquet"):
            mn, mx = (
                spark.read.parquet(f)
                .agg(F.min(col), F.max(col))
                .collect()[0]
            )
            spans.append(float(mx) - float(mn))
        return sum(spans) / len(spans)

    # ts-ordered files see the FULL user_id/value range (events arrive
    # interleaved); z-ordered files must cover well under half of it
    assert avg_span(z_dir, "user_id") < 0.5 * avg_span(lin_dir, "user_id")
    assert avg_span(z_dir, "value") < 0.75 * avg_span(lin_dir, "value")


# ---------------------------------------------------------------------------
# property-based: repetition_signals vs a pure-Python reference on
# randomized token streams (small alphabet => lots of repeats)
# ---------------------------------------------------------------------------


def _py_repetition(tokens):
    n = len(tokens)
    dup_tok = 0.0 if n == 0 else 1.0 - len(set(tokens)) / n
    bgs = [f"{tokens[i]} {tokens[i+1]}" for i in range(n - 1)]
    if bgs:
        from collections import Counter

        top_bg = max(Counter(bgs).values()) / len(bgs)
    else:
        top_bg = 0.0
    lines = [" ".join(tokens[i : i + 10]) for i in range(0, n, 10)]
    dup_line = 0.0 if not lines else 1.0 - len(set(lines)) / len(lines)
    return dup_tok, top_bg, dup_line


def test_repetition_property_vs_python_reference(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    alphabet = ["aa", "bb", "cc", "dd"]

    @given(
        st.lists(
            st.lists(st.sampled_from(alphabet), min_size=1, max_size=35),
            min_size=1,
            max_size=12,
        )
    )
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    def inner(docs):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
        for i, toks in enumerate(docs):
            exp = _py_repetition(toks)
            r = got[i]
            for name, e in zip(
                ["dup_token_frac", "top_bigram_frac", "dup_line_frac"], exp
            ):
                assert abs(r[name] - e) < 1e-6, (i, name, r[name], e, toks)

    inner()
