"""Behavior tests for round-4m: perceptual-hash image dedup."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import Row

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_identical_pixels_hash_equal(spark):
    """Two payloads encoding the SAME pixels under different doc ids
    must collide at hamming 0."""
    from whisky_wine_etl_spark.functions import bmp

    payload = bmp.encode_bmp(bmp.synth_pixels(5, 12, 10))
    images = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(payload)), Row(doc_id=2, payload=bytearray(payload))]
    )
    hashes = mm.image_ahash_bands(images)
    pairs = mm.ahash_near_dup_pairs(hashes).collect()
    assert [(p.doc_a, p.doc_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_banded_pairs_equal_bruteforce(spark):
    """The banded candidate join must find EXACTLY the all-pairs
    hamming ≤ 3 set (pigeonhole completeness), verified against a
    python brute force over the same hash frame."""
    docs = load_table(spark, SF, "documents").limit(200)
    hashes = mm.image_ahash_bands(mm.synthesize_bmp_corpus(docs)).localCheckpoint()
    hrows = {r.doc_id: (r.b0, r.b1, r.b2, r.b3) for r in hashes.collect()}
    want = set()
    for a, b in itertools.combinations(sorted(hrows), 2):
        ham = sum(bin(x ^ y).count("1") for x, y in zip(hrows[a], hrows[b]))
        if ham <= 3:
            want.add((a, b, ham))
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in mm.ahash_near_dup_pairs(hashes).collect()
    }
    assert got == want
    assert want, "fixture should contain at least one near-dup pair"


def test_radius_guard(spark):
    hashes = spark.createDataFrame([Row(doc_id=1, b0=0, b1=0, b2=0, b3=0)])
    with pytest.raises(ValueError, match="max_hamming <= 3"):
        mm.ahash_near_dup_pairs(hashes, max_hamming=5)


def test_registered_query_runs_on_decoded_bytes(spark):
    """The registered query's hashes really come from decoding the BMP
    payload (not from metadata shortcuts): corrupting one byte of a
    payload changes that image's hash."""
    import numpy as np

    from whisky_wine_etl_spark.functions import bmp

    px = bmp.synth_pixels(7, 10, 9)
    clean = bmp.encode_bmp(px)
    bright = px.copy()
    bright[:4, :, :] = 255  # blow out the top rows → different aHash
    images = spark.createDataFrame(
        [
            Row(doc_id=1, payload=bytearray(clean)),
            Row(doc_id=2, payload=bytearray(bmp.encode_bmp(bright))),
        ]
    )
    h = {r.doc_id: (r.b0, r.b1, r.b2, r.b3) for r in mm.image_ahash_bands(images).collect()}
    assert h[1] != h[2]
