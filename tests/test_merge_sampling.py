"""Unit semantics for merge/upsert, SCD2, deterministic sampling, and
token chunking — tiny synthetic frames where every expected row is
hand-computable. (Oracle parity at data scale lives in
tests/test_oracle_parity.py via the registry.)"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from whisky_wine_etl_spark.operators import merge as mg
from whisky_wine_etl_spark.operators import sampling as smp
from whisky_wine_etl_spark.operators import text as tx


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


# ---------------------------------------------------------------------------
# upsert (SCD1)
# ---------------------------------------------------------------------------


def test_upsert_update_keep_insert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k int, name string, v double"
    )
    got = _rows(mg.upsert(target, source, ["k"]), "k")
    assert got == [
        (1, "a", 10.0),  # untouched
        (2, "B", 99.0),  # updated (source wins)
        (3, "c", 30.0),  # untouched
        (4, "d", 40.0),  # inserted
    ]


def test_upsert_null_in_source_keeps_target_value(spark):
    """Documented caveat: coalesce-merge cannot set a column TO null."""
    target = spark.createDataFrame([(1, "a")], "k int, name string")
    source = spark.createDataFrame([(1, None)], "k int, name string")
    assert _rows(mg.upsert(target, source, ["k"]), "k") == [(1, "a")]


def test_upsert_rejects_schema_mismatch(spark):
    target = spark.createDataFrame([(1, "a")], "k int, name string")
    source = spark.createDataFrame([(1,)], "k int")
    try:
        mg.upsert(target, source, ["k"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------

D = dt.date


def test_scd2_change_delete_insert_history(spark):
    dim = spark.createDataFrame(
        [
            # k=1: history + unchanged current
            (1, "gold", D(2023, 1, 1), D(2024, 1, 1)),
            (1, "silver", D(2024, 1, 1), None),
            # k=2: current, will change
            (2, "gold", D(2024, 1, 1), None),
            # k=3: current, will be deleted
            (3, "bronze", D(2024, 1, 1), None),
        ],
        "k int, seg string, valid_from date, valid_to date",
    )
    snap = spark.createDataFrame(
        [(1, "silver"), (2, "platinum"), (4, "new")], "k int, seg string"
    )
    got = _rows(
        mg.scd2_apply(dim, snap, ["k"], ["seg"], "2024-06-01"), "k", "valid_from"
    )
    assert got == [
        (1, "gold", D(2023, 1, 1), D(2024, 1, 1)),    # history untouched
        (1, "silver", D(2024, 1, 1), None),            # unchanged stays open
        (2, "gold", D(2024, 1, 1), D(2024, 6, 1)),     # changed: closed...
        (2, "platinum", D(2024, 6, 1), None),          # ...and reopened
        (3, "bronze", D(2024, 1, 1), D(2024, 6, 1)),   # deleted: closed only
        (4, "new", D(2024, 6, 1), None),               # new key opened
    ]


def test_scd2_null_tracked_value_transitions(spark):
    """null→value and value→null are real changes (eqNullSafe struct)."""
    dim = spark.createDataFrame(
        [(1, None, D(2024, 1, 1), None), (2, "x", D(2024, 1, 1), None)],
        "k int, seg string, valid_from date, valid_to date",
    )
    snap = spark.createDataFrame([(1, "x"), (2, None)], "k int, seg string")
    got = _rows(mg.scd2_apply(dim, snap, ["k"], ["seg"], "2024-06-01"), "k", "valid_from")
    assert got == [
        (1, None, D(2024, 1, 1), D(2024, 6, 1)),
        (1, "x", D(2024, 6, 1), None),
        (2, "x", D(2024, 1, 1), D(2024, 6, 1)),
        (2, None, D(2024, 6, 1), None),
    ]


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_hash_sample_partitioning_invariant(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in smp.hash_sample(df, "k", pct=10).collect())
    b = sorted(
        r["k"] for r in smp.hash_sample(df.repartition(17, "k"), "k", pct=10).collect()
    )
    assert a == b and 0 < len(a) < 1000  # same rows; plausibly ~10%


def test_hash_sample_fraction_near_target(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    n = smp.hash_sample(df, "k", pct=10).count()
    assert 0.07 <= n / 20000 <= 0.13


def test_stratified_first_n_exact_sizes(spark):
    df = spark.createDataFrame(
        [(g, g * 1000 + i) for g in range(3) for i in range(50)], "g int, k int"
    )
    got = smp.stratified_first_n(df, "g", "k", n=7)
    sizes = {r["g"]: r["n"] for r in got.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert sizes == {0: 7, 1: 7, 2: 7}
    # deterministic pick: rerun yields identical keys
    k1 = sorted(r["k"] for r in got.collect())
    k2 = sorted(r["k"] for r in smp.stratified_first_n(df, "g", "k", n=7).collect())
    assert k1 == k2


def test_train_eval_split_stable_under_growth(spark):
    """A key's split never changes when the corpus grows — the whole
    point of hash-based holdout."""
    small = spark.range(0, 1000).withColumnRenamed("id", "k")
    big = spark.range(0, 10000).withColumnRenamed("id", "k")
    s = {r["k"]: r["split"] for r in smp.train_eval_split(small, "k").collect()}
    b = {r["k"]: r["split"] for r in smp.train_eval_split(big, "k").collect()}
    assert all(b[k] == v for k, v in s.items())
    assert set(b.values()) == {"train", "eval"}


# ---------------------------------------------------------------------------
# token chunking
# ---------------------------------------------------------------------------


def test_chunk_tokens_windows_and_overlap(spark):
    words = [f"w{i}" for i in range(11)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    got = _rows(tx.chunk_tokens(df, window=5, stride=4), "chunk_id")
    # starts 0,4,8 → chunks w0..w4, w4..w8, w8..w10
    import hashlib

    def h(ws):
        return hashlib.md5(" ".join(ws).encode()).hexdigest()

    assert got == [
        (1, 0, 0, 5, h(words[0:5])),
        (1, 1, 4, 5, h(words[4:9])),
        (1, 2, 8, 3, h(words[8:11])),
    ]


def test_chunk_tokens_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "x")], "doc_id int, text string")
    got = _rows(tx.chunk_tokens(df, window=5, stride=4), "doc_id")
    assert [(r[0], r[1], r[3]) for r in got] == [(1, 0, 2), (2, 0, 1)]


# ---------------------------------------------------------------------------
# connected components (dedup clustering)
# ---------------------------------------------------------------------------


def test_connected_components_chain_star_isolated(spark):
    from whisky_wine_etl_spark.operators import dedup as dd

    # chain 1-2-3-4, star 10-{11,12,13}, pair 20-21; 30/31 isolated
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        "doc_a long, doc_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 13, 20, 21, 30, 31]], "doc_id long")
    got = {r["doc_id"]: r["cluster_id"] for r in dd.connected_components(pairs, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20, 30: 30, 31: 31}


def test_connected_components_long_chain_converges(spark):
    from whisky_wine_etl_spark.operators import dedup as dd

    n = 12  # diameter > typical dedup clusters; one label hop per round
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], "doc_a long, doc_b long")
    got = dd.connected_components(pairs, max_iters=15).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert len(got) == n + 1


# ---------------------------------------------------------------------------
# surrogate keys
# ---------------------------------------------------------------------------


def test_surrogate_key_contiguous_and_partition_invariant(spark):
    from whisky_wine_etl_spark.operators.keys import add_surrogate_key

    df = spark.range(0, 3000).withColumnRenamed("id", "k").repartition(13)
    a = {r["k"]: r["sk"] for r in add_surrogate_key(df, ["k"], num_partitions=4).collect()}
    b = {r["k"]: r["sk"] for r in add_surrogate_key(df, ["k"], num_partitions=11).collect()}
    # global rank regardless of partition count; contiguous 1..N
    assert a == b
    assert sorted(a.values()) == list(range(1, 3001))
    assert a[0] == 1 and a[2999] == 3000


def test_upsert_strict_mode_rejects_null_update(spark):
    """reject_null_updates=True fails loudly where the default silently
    keeps the stale target value."""
    import pytest

    target = spark.createDataFrame([(1, "a"), (2, "b")], "k int, name string")
    source = spark.createDataFrame([(1, None)], "k int, name string")
    with pytest.raises(Exception, match="strict mode"):
        mg.upsert(target, source, ["k"], reject_null_updates=True).collect()
    # clean sources still merge fine under strict mode
    ok = spark.createDataFrame([(2, "B"), (3, "c")], "k int, name string")
    got = _rows(mg.upsert(target, ok, ["k"], reject_null_updates=True), "k")
    assert got == [(1, "a"), (2, "B"), (3, "c")]


def test_upsert_strict_mode_catches_null_composite_key_match(spark):
    """A row matched THROUGH a NULL key component (eqNullSafe join)
    must still trip the strict guard: matched-ness comes from the
    presence flags, not key nullness — inferring it from keys[0]
    being non-null would silently skip the reject_null_updates check
    exactly when the first key is NULL."""
    import pytest

    target = spark.createDataFrame(
        [(None, "x", "a"), (1, "y", "b")], "k1 int, k2 string, name string"
    )
    # source matches the (NULL, 'x') key and nulls its value column
    source = spark.createDataFrame(
        [(None, "x", None)], "k1 int, k2 string, name string"
    )
    with pytest.raises(Exception, match="strict mode"):
        mg.upsert(target, source, ["k1", "k2"], reject_null_updates=True).collect()
    # and the non-strict path still merges the NULL-keyed row as a match
    upd = spark.createDataFrame(
        [(None, "x", "A")], "k1 int, k2 string, name string"
    )
    got = _rows(mg.upsert(target, upd, ["k1", "k2"]), "k2")
    assert got == [(None, "x", "A"), (1, "y", "b")]


def test_connected_components_raises_when_not_converged(spark):
    """ADVICE fix: iteration-capped exit must raise, not return split
    clusters silently."""
    import pytest
    from whisky_wine_etl_spark.operators import dedup as dd

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(pairs, max_iters=2)
