"""Behavior/invariant tests for the round-3 operators: incremental
(ledger) dedup, containment pairs, vocabulary top-k, compaction and
ORC round-trips."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators import dedup as dd

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_composes_to_global_exact(spark):
    """The ledger invariant: (existing corpus's exact-dedup hashes) ∪
    (incremental survivors' hashes) must equal the exact-dedup hash
    set of the WHOLE corpus — i.e. batch-at-a-time ingestion with
    incremental_dedup converges to the same deduped state as one
    global pass."""
    docs = load_table(spark, SF, "documents")
    existing = docs.filter(F.col("doc_id") % 4 != 0)
    incoming = docs.filter(F.col("doc_id") % 4 == 0)

    ledger = {r.text_md5 for r in dd.exact_dedup(existing).collect()}
    survivors = {r.text_md5 for r in dd.incremental_dedup(existing, incoming).collect()}
    global_hashes = {r.text_md5 for r in dd.exact_dedup(docs).collect()}

    assert ledger | survivors == global_hashes
    assert not (ledger & survivors)  # survivors are genuinely NEW hashes


def test_incremental_dedup_collapses_within_batch(spark):
    """Duplicates inside the incoming batch collapse to one min-id row
    with the right copy count, even when the hash is new."""
    existing = spark.createDataFrame([Row(doc_id=1, text="old doc")])
    incoming = spark.createDataFrame(
        [
            Row(doc_id=10, text="new doc"),
            Row(doc_id=11, text="New  Doc"),  # same after normalization
            Row(doc_id=12, text="old doc"),  # already in ledger → dropped
        ]
    )
    out = {r.doc_id: r.n_batch_copies for r in dd.incremental_dedup(existing, incoming).collect()}
    assert out == {10: 2}


def test_containment_catches_what_jaccard_misses(spark):
    """A short doc quoted wholesale inside a much longer one has
    containment 1.0 but low Jaccard — the exact reason the overlap
    coefficient exists as a separate detector."""
    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = spark.createDataFrame([Row(doc_id=1, text=short), Row(doc_id=2, text=long)])

    cont = dd.containment_pairs(df, threshold=0.9).collect()
    assert len(cont) == 1 and cont[0].doc_a == 1 and cont[0].doc_b == 2
    assert cont[0].containment == 1.0

    jac = dd.jaccard_pairs(df, threshold=0.5).collect()
    assert jac == []  # Jaccard is diluted far below 0.5 by the long doc


def test_containment_symmetric_inputs_match_jaccard(spark):
    """For equal-size shingle sets, overlap coefficient == Jaccard
    only when the sets are identical; sanity-pin both metrics on an
    exact-duplicate pair."""
    df = spark.createDataFrame(
        [Row(doc_id=1, text="one two three four five"), Row(doc_id=2, text="one two three four five")]
    )
    cont = dd.containment_pairs(df, threshold=0.5).collect()
    jac = dd.jaccard_pairs(df, threshold=0.5).collect()
    assert cont[0].containment == 1.0
    assert jac[0].jaccard == 1.0


def test_vocab_topk_plan_takeordered(spark):
    """Top-k by frequency must compile to TakeOrderedAndProject (no
    global sort of the vocabulary) with a partial aggregation below."""
    from whisky_wine_etl_spark import plans

    plans.load_all()
    df = plans.QUERIES["text_vocab_topk"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    """32 scattered files compact to the byte-target count (1 here)
    with content identical."""
    from whisky_wine_etl_spark.sources import io as sio

    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    docs.repartition(32).write.parquet(src)
    n = sio.compact_parquet(spark, src, dst, target_file_bytes=64 * 1024 * 1024)
    assert n == 1
    import glob

    assert len(glob.glob(dst + "/part-*.parquet")) == 1
    before = {(r.doc_id, r.n_chars) for r in docs.collect()}
    after = {(r.doc_id, r.n_chars) for r in spark.read.parquet(dst).collect()}
    assert before == after


def test_orc_roundtrip_preserves_types(spark, tmp_path):
    """ORC write→read keeps the schema (names, types, nullability for
    data columns) and every value."""
    from whisky_wine_etl_spark.sources import io as sio

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "orc")
    sio.write_orc(docs, path)
    back = sio.read_orc(spark, path)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in docs.schema.fields
    ]
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in docs.collect()}


def test_lateral_topn_decorrelates_to_window_group_limit(spark):
    """The LATERAL ... ORDER BY ... LIMIT subquery must compile to a
    decorrelated window with WindowGroupLimit (partial top-k pushed
    below the shuffle) — never a per-outer-row nested loop."""
    from whisky_wine_etl_spark import plans

    plans.load_all()
    df = plans.QUERIES["sql_lateral_topn_per_nation"](spark, SF)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "WindowGroupLimit" in opt
    assert "LateralJoin" not in opt


def test_containment_stop_shingle_pruning_bounds_recall_only(spark):
    """With a frequency cap, containment keeps every pair that shares
    at least one sub-cap shingle (subset of the exact result, correct
    scores for survivors) — the documented skew/recall trade."""
    docs = load_table(spark, SF, "documents")
    exact = {(r.doc_a, r.doc_b): r.containment for r in dd.containment_pairs(docs, 0.8).collect()}
    pruned = {(r.doc_a, r.doc_b): r.containment for r in dd.containment_pairs(docs, 0.8, max_shingle_freq=50).collect()}
    assert set(pruned) <= set(exact)
    # NOTE: pruning shrinks |A∩B| for survivors too (dropped common
    # shingles), so scores may only DECREASE, never increase
    for pair, c in pruned.items():
        assert c <= exact[pair] + 1e-9


def test_arrow_norm_stats_ragged_lists(spark):
    """The mapInArrow operator must fall back to offset-sliced views
    when a batch's lists are ragged (reshape would be wrong or
    impossible) and still produce exact norms."""
    import math

    from whisky_wine_etl_spark.operators.similarity import embedding_norm_stats_arrow

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [1.0, 2.0, 2.0]), (3, [5.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: (r.l2_norm, r.unit_head) for r in embedding_norm_stats_arrow(df).collect()}
    assert out[1] == (5.0, 0.6)
    assert out[2] == (3.0, round(1.0 / 3.0, 6))
    assert out[3] == (5.0, 1.0)
    assert math.isfinite(out[1][1])


def test_star_cc_matches_label_propagation(spark):
    """Large-star/small-star must produce EXACTLY the clustering of
    min-label propagation on the real near-dup pair graph, including
    singleton coverage."""
    docs = load_table(spark, SF, "documents")
    pairs = dd.jaccard_pairs(docs, 0.5)
    nodes = docs.select("doc_id")
    a = {(r.doc_id, r.cluster_id) for r in dd.connected_components(pairs, nodes=nodes).collect()}
    b = {(r.doc_id, r.cluster_id) for r in dd.connected_components_star(pairs, nodes=nodes).collect()}
    assert a == b


def test_star_cc_converges_on_long_chain(spark):
    """A 400-edge path is exactly the adversarial case: label
    propagation needs O(length) rounds (and raises at its default
    cap), while the star algorithm converges in O(log n) rounds and
    labels the whole chain with its minimum."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(400)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(chain)
    out = dd.connected_components_star(chain).collect()
    assert len(out) == 401
    assert {r.cluster_id for r in out} == {0}


def test_weighted_systematic_picks_proportional_and_exact(spark):
    """Every row's pick count is within 1 of its exact proportional
    share k·w/W (systematic sampling's variance bound), totals sum to
    k, and a row heavier than W/k is ALWAYS picked at least once."""
    from whisky_wine_etl_spark.operators.sampling import weighted_systematic_sample

    docs = load_table(spark, SF, "documents")
    k = 50
    out = weighted_systematic_sample(docs, k=k, weight_col="n_chars").collect()
    total_w = docs.agg(F.sum("n_chars")).collect()[0][0]
    weights = {r.doc_id: r.n_chars for r in docs.collect()}
    picks = {r.doc_id: r.n_picks for r in out}
    assert sum(picks.values()) == k
    for doc_id, w in weights.items():
        share = k * w / total_w
        got = picks.get(doc_id, 0)
        assert abs(got - share) < 1.0 + 1e-9
        if w * k > total_w:
            assert got >= 1


def test_weighted_systematic_rejects_degenerate_weights(spark):
    """Empty input / all-zero weights would interpolate `div 0` into
    the pick expression (silently-empty under default mode, error
    under ANSI); negative weights would corrupt the cumulative tape.
    All three must fail loudly instead."""
    import pytest

    from whisky_wine_etl_spark.operators.sampling import weighted_systematic_sample

    empty = spark.createDataFrame([], "doc_id long, w long")
    with pytest.raises(ValueError, match="total weight"):
        weighted_systematic_sample(empty, k=5, weight_col="w")
    zeros = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, w long")
    with pytest.raises(ValueError, match="total weight"):
        weighted_systematic_sample(zeros, k=5, weight_col="w")
    neg = spark.createDataFrame([(1, 10), (2, -3)], "doc_id long, w long")
    with pytest.raises(ValueError, match="negative weight"):
        weighted_systematic_sample(neg, k=5, weight_col="w")


def test_snapshot_isolation_and_orphan_invisibility(spark, tmp_path):
    """Old versions stay readable after an overwrite (copy-on-write);
    data files never referenced by a manifest are not part of any
    version; the latest pointer advances atomically."""
    import os

    from pyspark.sql import Row

    from whisky_wine_etl_spark.sources import snapshots as snap

    table = str(tmp_path / "t")
    df1 = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=3)])
    df2 = spark.createDataFrame([Row(k=10)])

    assert snap.current_version(table) is None
    v1 = snap.write_snapshot(df1, table, mode="append")
    v2 = snap.write_snapshot(df2, table, mode="overwrite")
    v3 = snap.write_snapshot(df2, table, mode="append")
    assert (v1, v2, v3) == (1, 2, 3)
    assert snap.current_version(table) == 3

    # orphan parquet dropped into the data area: referenced by nothing
    orphan_dir = os.path.join(table, "data", "orphan")
    spark.createDataFrame([Row(k=999)]).write.parquet(orphan_dir)

    read = lambda v: sorted(r.k for r in snap.read_snapshot(spark, table, v).collect())
    assert read(1) == [1, 2, 3]          # still intact after overwrite
    assert read(2) == [10]               # overwrite started fresh
    assert read(3) == [10, 10]           # append on v2's lineage
    assert read(None) == [10, 10]        # latest pointer → v3
    assert all(999 not in read(v) for v in (1, 2, 3))


def test_snapshot_vacuum_keeps_referenced_files_only(spark, tmp_path):
    """Vacuum deletes expired manifests and unreferenced data files;
    kept versions stay byte-identical readable."""
    from pyspark.sql import Row

    from whisky_wine_etl_spark.sources import snapshots as snap

    table = str(tmp_path / "t")
    snap.write_snapshot(spark.createDataFrame([Row(k=1), Row(k=2)]), table)      # v1
    snap.write_snapshot(spark.createDataFrame([Row(k=3)]), table, "overwrite")   # v2
    snap.write_snapshot(spark.createDataFrame([Row(k=4)]), table, "append")      # v3

    stats = snap.vacuum(table, keep_last=2)
    assert stats["deleted_manifests"] == 1  # v1 manifest gone
    assert stats["deleted_files"] >= 1      # v1's unreferenced parquet gone
    # v2 files are shared into v3's lineage → must survive
    assert sorted(r.k for r in snap.read_snapshot(spark, table, 2).collect()) == [3]
    assert sorted(r.k for r in snap.read_snapshot(spark, table, 3).collect()) == [3, 4]
    import pytest

    with pytest.raises(FileNotFoundError):
        snap.read_snapshot(spark, table, 1)


def test_contract_failures_reconcile_with_counters(spark):
    """Per-row contract frame must reconcile with the aggregate
    counter query rule-for-rule on the same corrupted input."""
    from whisky_wine_etl_spark import plans

    plans.load_all()
    per_row = plans.QUERIES["contract_failures_orders"](spark, SF)
    by_rule = {
        r.check_name: r.cnt
        for r in per_row.groupBy("check_name").count().withColumnRenamed("count", "cnt").collect()
    }
    # the corruption plants offenders for every row-local rule
    assert by_rule.get("totalprice_nonneg", 0) > 0
    assert by_rule.get("priority_in_domain", 0) > 0
    assert by_rule.get("orderdate_in_range", 0) > 0
    assert by_rule.get("custkey_fk", 0) > 0
    # every failure row carries the offending value
    assert per_row.filter(F.col("failure_case").isNull()).count() == 0


def test_neardup_against_corpus_catches_edited_recrawl(spark):
    """The fuzzy ingestion gate: an incoming doc that is a corpus doc
    with ONE token edited must be rejected (high Jaccard, best match
    = its source); an unrelated doc survives; an exact copy scores
    1.0. Exact-hash ledgers (incremental_dedup) catch only the third."""
    base = " ".join(f"tok{i}" for i in range(40))
    edited = base.replace("tok20", "EDITED")
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text="completely different words " * 8)]
    )
    incoming = spark.createDataFrame(
        [
            Row(doc_id=10, text=edited),        # re-crawl with one edit
            Row(doc_id=11, text=base),          # exact copy
            Row(doc_id=12, text="fresh new content nothing shares this"),
        ]
    )
    out = {
        r.doc_id: (r.matched_corpus_id, r.jaccard)
        for r in dd.neardup_against_corpus(corpus, incoming, threshold=0.5).collect()
    }
    assert out[11] == (1, 1.0)
    assert out[10][0] == 1 and 0.8 < out[10][1] < 1.0
    assert 12 not in out
    # and the exact ledger would have missed the edited re-crawl
    exact_survivors = {
        r.doc_id for r in dd.incremental_dedup(corpus, incoming).collect()
    }
    assert 10 in exact_survivors
