"""Edge-case parity for the r10 engine-portable hash plumbing.

The synthetic corpus has >= 10 tokens per document, so the driver's
parity sweeps never exercise the short-document path of
shingle_hash_arrays (positions whose +1/+2 token falls off the end and
COALESCEs to 0) or single-token SimHash fingerprints. These tests run
the Spark operators and their DuckDB oracle fragments side by side on
a crafted fixture that covers: 1-token, 2-token, and 3-token docs,
repeated tokens, an empty-string doc, and multi-space runs (split
keeps empty tokens on both engines).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from whisky_wine_etl_spark.operators import dedup as dd

DOCS = [
    (0, "one"),
    (1, "two tokens"),
    (2, "three token doc"),
    (3, "four token doc here"),
    (4, "dup dup dup dup"),
    (5, ""),
    (6, "three token doc"),  # exact duplicate of doc 2
]


@pytest.fixture(scope="module")
def fixture_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    c.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    return c


def test_shingle_hash_arrays_match_duckdb_on_short_docs(fixture_df, con):
    from whisky_wine_etl_spark.plans.dedup import _dk_horner

    got = {
        r.doc_id: sorted(r.sh_arr)
        for r in dd.shingle_hash_arrays(fixture_df).collect()
    }
    h1 = _dk_horner("tha", "i.i", 3, dd.MERSENNE31, dd.HORNER_B1)
    h2 = _dk_horner("tha", "i.i", 3, dd.PRIME31B, dd.HORNER_B2)
    rows = con.execute(
        f"""
        WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        tha AS (
          SELECT doc_id,
                 list_transform(toks,
                   t -> CAST(CONCAT('0x', substr(md5(t), 1, 15)) AS BIGINT)) AS tha
          FROM tk
        ),
        shl AS (
          SELECT DISTINCT doc_id, {h1} * 2147483648 + {h2} AS sh
          FROM tha,
               LATERAL (SELECT unnest(range(1, greatest(len(tha) - 2, 1) + 1)) AS i) i(i)
        )
        SELECT doc_id, sh FROM shl
        """
    ).fetchall()
    want: dict[int, list[int]] = {}
    for doc_id, sh in rows:
        want.setdefault(doc_id, []).append(int(sh))
    want = {k: sorted(v) for k, v in want.items()}
    assert got == want
    # identical docs hash identically; the 1-token and empty docs
    # produce exactly one shingle each (the greatest(...,1) floor)
    assert got[2] == got[6]
    assert len(got[0]) == 1 and len(got[5]) == 1


def test_minhash_lsh_pairs_match_duckdb_on_fixture(fixture_df, con):
    from whisky_wine_etl_spark.plans.dedup import _minhash_pairs_cte

    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dd.minhash_lsh_pairs(fixture_df, threshold=0.5).collect()
    )
    want = sorted(
        (a, b, j)
        for a, b, j in con.execute(
            f"WITH {_minhash_pairs_cte()} SELECT doc_a, doc_b, jaccard FROM mh_pairs"
        ).fetchall()
    )
    assert got == want
    # the exact-duplicate pair must be found with jaccard 1.0
    assert (2, 6, 1.0) in got


def test_simhash_pairs_match_duckdb_on_fixture(fixture_df, con):
    from whisky_wine_etl_spark.plans.dedup import _simhash_oracle

    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in dd.simhash_pairs(fixture_df, max_hamming=3).collect()
    )
    want = sorted(tuple(r) for r in con.execute(_simhash_oracle()).fetchall())
    assert got == want
    assert (2, 6, 0) in got  # exact duplicates at Hamming 0
