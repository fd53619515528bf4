"""Behavior tests for round-4ar: CDC chunking, chunk overlap dedup,
sized output shards."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.plans.round4ar import cdc_chunk_frame

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_cdc_chunks_reassemble_to_document(spark):
    """Chunks concatenated in order must reproduce the document
    exactly (no char lost or duplicated)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ch = cdc_chunk_frame(docs)
    rebuilt = (
        ch.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.sort_array(F.collect_list(F.struct("chunk_idx", "chunk"))),
                                lambda s: s.chunk)
            ).alias("rebuilt")
        )
    )
    j = docs.join(rebuilt, "doc_id", "left")
    bad = j.filter(
        F.coalesce(F.col("rebuilt"), F.lit("")) != F.coalesce(F.col("text"), F.lit(""))
    ).count()
    assert bad == 0


def test_cdc_boundary_shift_locality(spark):
    """Editing the head of a document must leave tail chunks intact —
    the CDC property fixed-size chunking lacks."""
    base = "x" * 5 + "X SOME STABLE CONTENT WITH ENOUGH LENGTH TO CHUNK qrstuvwx" * 3
    edited = "y" * 9 + base  # insertion at the front
    df = spark.createDataFrame([(1, base), (2, edited)], "doc_id long, text string")
    ch = sorted(cdc_chunk_frame(df).collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    c1 = [r.chunk for r in ch if r.doc_id == 1]
    c2 = [r.chunk for r in ch if r.doc_id == 2]
    # the tail chunks must be untouched by the front insertion
    assert len(c1) >= 3 and c1[-3:] == c2[-3:]


def test_chunk_overlap_detects_copied_paragraph(spark, monkeypatch):
    import whisky_wine_etl_spark.plans.round4ar as r4ar

    para = (
        "THE FIRST COPIED SENTENCE CARRIES DISTINCT WORDING ALPHA BETA. "
        "A SECOND DIFFERENT SENTENCE FOLLOWS WITH OTHER TOKENS GAMMA DELTA. "
        "FINALLY A THIRD UNIQUE LINE CLOSES THE PARAGRAPH EPSILON ZETA. "
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="intro one " + para + " outro alpha"),
            Row(doc_id=2, text="different beginning " + para + " other ending"),
            Row(doc_id=3, text="totally unrelated content with no copying at all"),
        ]
    )
    monkeypatch.setattr(r4ar, "load_table", lambda s, sf, n: docs)
    pairs = plans.QUERIES["dedup_chunk_overlap"](spark, SF).collect()
    assert any(r.doc_a == 1 and r.doc_b == 2 for r in pairs)
    assert not any(3 in (r.doc_a, r.doc_b) for r in pairs)


def test_sized_shards_one_file_each_and_near_target(spark):
    rows = plans.QUERIES["layout_sized_shards"](spark, SF).collect()
    assert rows, "no shards produced"
    assert all(r.n_files == 1 for r in rows)
    # every shard except possibly the last holds >= one target of bytes
    # minus one doc's worth of slack; all shard ids contiguous from 0
    ids = sorted(r.shard for r in rows)
    assert ids == list(range(len(ids)))


def test_hof_expression_chunker_agrees_with_arrow_tier(spark):
    """The (slow, reference-only) Catalyst HOF form of the chunker
    must produce identical chunks to the Arrow-tier implementation —
    the two are interchangeable on semantics, the Arrow tier is just
    ~100x faster at corpus scale."""
    from pyspark.sql import functions as F

    import whisky_wine_etl_spark.plans.round4ar as r4ar

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(25)
    )
    hof = docs.select(
        "doc_id",
        F.posexplode(F.expr(r4ar._SPARK_CHUNKS)).alias("chunk_idx", "chunk"),
    )
    arrow = r4ar.cdc_chunk_frame(docs)
    assert hof.exceptAll(arrow).count() == 0
    assert arrow.exceptAll(hof).count() == 0
