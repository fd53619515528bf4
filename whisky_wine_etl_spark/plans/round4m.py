"""Round-4m additions: perceptual-hash image dedup over the real BMP
codec path.

Registered AFTER round4l (plans.load_all imports this module last) so
the driver's unverified-first ordering keeps the earlier backlog in
the front verification slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Image near-dup via perceptual hash — the multimodal counterpart of
# MinHash/SimHash text dedup: a training-image pipeline dedups on
# aHash/pHash hamming distance, not byte equality. This runs the REAL
# path end-to-end: encode → decode (functions/bmp.py) → hash →
# banded candidate join → exact verify. The closed-form synthetic
# pixels make even the decoded hamming distances SQL-reproducible, so
# unlike the text LSH ops this one carries an EXACT oracle.
# ---------------------------------------------------------------------------


@query(
    "mm_image_phash_dedup",
    """
WITH dims AS (
  SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS w,
         CAST(8 + (doc_id * 3) % 7 AS BIGINT) AS h
  FROM documents
),
grid AS (
  SELECT gx.i AS i, gy.j AS j
  FROM generate_series(0, 7) gx(i), generate_series(0, 7) gy(j)
),
cell AS (
  SELECT d.doc_id, j * 8 + i AS k,
         ((d.doc_id*7  + ((i*d.w)//8)*3  + ((j*d.h)//8)*5)  % 256
        + (d.doc_id*11 + ((i*d.w)//8)*13 + ((j*d.h)//8))    % 256
        + (d.doc_id*3  + ((i*d.w)//8)    + ((j*d.h)//8)*17) % 256) // 3 AS gray
  FROM dims d CROSS JOIN grid
),
tot AS (SELECT doc_id, SUM(gray) AS sg FROM cell GROUP BY doc_id),
bits AS (
  SELECT c.doc_id, c.k,
         CASE WHEN c.gray * 64 > t.sg THEN 1 ELSE 0 END AS b
  FROM cell c JOIN tot t USING (doc_id)
),
hsh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN k // 16 = 0 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS b0,
         CAST(SUM(CASE WHEN k // 16 = 1 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS b1,
         CAST(SUM(CASE WHEN k // 16 = 2 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS b2,
         CAST(SUM(CASE WHEN k // 16 = 3 THEN b * (1 << (k % 16)) ELSE 0 END) AS BIGINT) AS b3
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS INT)
         AS hamming
FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
""",
)
def mm_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs (aHash hamming ≤ 3) over the real
    BMP corpus: every image is encoded and DECODED by the pure-Python
    codec, hashed to an 8×8 average-hash in Arrow batches, and paired
    through the 4×16-bit band join — which pigeonhole-guarantees
    completeness at this radius, so the banded plan must equal the
    oracle's all-pairs scan exactly. Candidate volume is bounded by
    band-bucket occupancy (never |corpus|²); the oracle recomputes
    the decoded pixels closed-form, so any codec or resize-index bug
    breaks parity loudly."""
    from whisky_wine_etl_spark.operators import multimodal as mm

    docs = _t(spark, sf_dir, "documents")
    images = mm.synthesize_bmp_corpus(docs)
    hashes = mm.image_ahash_bands(images).localCheckpoint(eager=True)
    return mm.ahash_near_dup_pairs(hashes, max_hamming=3)
