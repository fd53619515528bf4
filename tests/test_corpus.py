"""Corpus-shaping operator tests: semantics + the plan shapes that
make them safe at scale. Oracle parity for all six registered queries
is covered by tests/test_oracle_parity.py; these pin the properties
the SQL compare can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators import corpus as cp
from whisky_wine_etl_spark import plans

plans.load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_removes_exactly_overlapping_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # shares 5-gram "a b c d e" with eval
            (2, "x y z w v u t"),        # clean
            (3, "c d e f g h"),          # 5-grams overlap doc 10's tail? no
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(10, "q a b c d e")], "doc_id long, text string"
    )
    kept = {r.doc_id for r in cp.decontaminate(docs, eval_set, n=5).collect()}
    assert kept == {2, 3}


def test_decontaminate_uses_semi_and_anti_joins(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    df = cp.decontaminate(
        docs.filter(F.col("doc_id") % 10 != 0), docs.filter(F.col("doc_id") % 10 == 0)
    )
    plan = _plan(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan  # never all-pairs


def test_quality_gate_flags_repetitive_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam " * 49 + "spam"),          # one token = 100% of mass
            (2, " ".join(f"w{i} x{i} other{i}" for i in range(10))),  # varied
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in cp.quality_gate(docs).collect()}
    assert got[1].passes_gate is False and got[1].top_tf == 50
    assert got[2].passes_gate is True
    assert got[2].n_tokens == 30 and got[2].n_unique == 30


def test_redact_pii_replaces_and_counts(spark):
    docs = spark.createDataFrame(
        [(1, "mail bob.smith@corp.io or call 555-1234 now"), (2, "no pii here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in cp.redact_pii(docs).collect()}
    assert (got[1].n_emails, got[1].n_phones) == (1, 1)
    assert (got[2].n_emails, got[2].n_phones) == (0, 0)
    import hashlib

    want = hashlib.md5(b"mail <EMAIL> or call <PHONE> now").hexdigest()
    assert got[1].redacted_md5 == want


def test_mixture_sample_filter_reaches_scan(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    plan = _plan(cp.mixture_sample(docs, {"en": 40}, default_pct=100))
    assert "Exchange" not in plan  # pure scan→filter, no shuffle
    # per-domain rates actually differ
    out = cp.mixture_sample(docs, {"en": 0}, default_pct=100)
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert "en" not in langs and len(langs) >= 2


def test_pack_sequences_is_contiguous_tape(spark):
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    rows = sorted(
        cp.pack_sequences(docs, budget=256, count_col="n_tokens").collect(),
        key=lambda r: r.doc_id,
    )
    tape = 0
    for r in rows:
        assert r.seq_id == tape // 256 and r.seq_offset == tape % 256
        tape += r.n_tokens


def test_pack_sequences_avoids_global_window(spark):
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    plan = _plan(cp.pack_sequences(docs, budget=256, count_col="n_tokens"))
    # the scale trap would appear as Exchange SinglePartition feeding a Window
    assert "SinglePartition" not in plan


def test_global_shuffle_is_permutation(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    rows = cp.global_shuffle(docs, n_shards=8).collect()
    assert len(rows) == docs.count()
    assert len({r.doc_id for r in rows}) == len(rows)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    assert set(by_shard) == set(range(8))
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard


@pytest.mark.parametrize(
    "name",
    [
        "corpus_decontaminate",
        "corpus_quality_gate",
        "corpus_pii_redact",
        "corpus_mixture_sample",
        "corpus_pack_sequences",
        "corpus_global_shuffle",
    ],
)
def test_corpus_queries_stay_jvm_side(spark, name):
    plan = _plan(plans.QUERIES[name](spark, SF_SMALL))
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "ArrowEvalPython" not in plan  # and no pandas UDFs either


def test_token_budget_keeps_greedy_prefix_and_crossing_doc(spark):
    """Docs are taken in hash order per domain until the budget line;
    the doc whose first token is under the line is kept WHOLE even if
    it crosses (epoch semantics, not truncation)."""
    docs = spark.createDataFrame(
        [(i, "en", 10) for i in range(1, 9)] + [(100, "fr", 10)],
        "doc_id long, lang string, n_tokens long",
    )
    out = cp.token_budget_sample(docs, budget=35, count_col="n_tokens").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    # 10-token docs, budget 35 → starts 0,10,20,30 qualify = exactly 4 docs
    assert len(by_lang["en"]) == 4
    assert sorted(r.tape_start for r in by_lang["en"]) == [0, 10, 20, 30]
    # the 4th doc's tape crosses 35 but its start (30) is under the line
    assert max(r.tape_start for r in by_lang["en"]) == 30
    # fr has its own independent tape
    assert [r.tape_start for r in by_lang["fr"]] == [0]


def test_token_budget_windows_are_bucketed_not_domain_wide(spark):
    """The scalable formulation must never window by domain alone —
    every window spec carries the bucket column too."""
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    df = cp.token_budget_sample(docs, budget=2500)
    plan = _plan(df)
    row_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "n_tokens" in ln
    ]
    assert row_windows, "expected a running-sum window over n_tokens"
    assert all("__b" in ln for ln in row_windows)


def test_repeat_upsample_multiplicity(spark):
    docs = spark.createDataFrame(
        [(1, "es"), (2, "zh"), (3, "en")], "doc_id long, lang string"
    )
    rows = cp.repeat_upsample(docs, {"es": 3, "zh": 2}).collect()
    counts = {}
    for r in rows:
        counts[r.doc_id] = counts.get(r.doc_id, 0) + 1
    assert counts == {1: 3, 2: 2, 3: 1}
    assert sorted(r.copy_idx for r in rows if r.doc_id == 1) == [1, 2, 3]


def test_bigram_lm_rank_is_deterministic_on_ties(spark):
    docs = spark.createDataFrame(
        [(1, "en", "b b a a b b"), (2, "en", "a a b b a a")],
        "doc_id long, lang string, text string",
    )
    out = {(r.bigram, r.rnk) for r in cp.bigram_lm_topk(docs, k=3).collect()}
    # "a a" and "b b" tie on count; lexicographic break puts "a a" first
    ranks = dict(out)
    assert ranks["a a"] < ranks["b b"]


def test_corpus_pipeline_plan_shape(spark):
    """The composed pipeline must stay one declarative tree: semi
    joins for gate+dedup, an anti join for decontamination, and no
    cartesian anywhere."""
    df = plans.QUERIES["corpus_pipeline"](spark, SF_SMALL)
    plan = _plan(df)
    assert plan.count("LeftSemi") >= 3  # gate, dedup winners, decontam probe
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_source_drift_tv_matches_hand_computation(spark):
    """TV distance against hand-computed probabilities, including the
    absent-term complement mass (domain A lacks z, B lacks x)."""
    docs = spark.createDataFrame(
        [(1, "A", "x x y"), (2, "B", "y z")],
        "doc_id long, source string, text string",
    )
    out = {r.domain: r.tv_distance for r in cp.source_drift_tv(docs).collect()}
    # corpus: x 2/5, y 2/5, z 1/5
    # A (x 2/3, y 1/3): ½(|2/3−2/5| + |1/3−2/5| + 1/5) = 4/15
    # B (y 1/2, z 1/2): ½(|1/2−2/5| + |1/2−1/5| + 2/5) = 0.4
    assert abs(out["A"] - 4 / 15) < 1e-12
    assert abs(out["B"] - 0.4) < 1e-12


def test_line_dedup_first_occurrence_wins(spark):
    """Span dedup contract: a 10-token line repeated across docs
    survives only in the earliest (doc_id, line_idx) position; unique
    lines and partial tail lines are untouched."""
    from whisky_wine_etl_spark import plans

    plans.load_all()
    span = " ".join(f"s{i}" for i in range(10))      # one full shared line
    uniq1 = " ".join(f"a{i}" for i in range(10))
    uniq2 = " ".join(f"b{i}" for i in range(7))       # partial tail (7 toks)
    docs = spark.createDataFrame(
        [
            (1, span + " " + uniq1),                  # lines: span, uniq1
            (2, span + " " + uniq2),                  # lines: span(dup), uniq2
        ],
        "doc_id long, text string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(d + "/documents.parquet")
        out = {
            r.doc_id: (r.n_lines_kept, r.n_tokens_kept)
            for r in plans.QUERIES["corpus_line_dedup"](spark, d).collect()
        }
    assert out[1] == (2, 20)   # keeps span + uniq1
    assert out[2] == (1, 7)    # span deduped away, keeps only the tail
