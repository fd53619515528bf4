"""Registry mapping query name → (Spark callable, DuckDB oracle SQL).

Driver contract (__spark_entry__.py): each Spark callable takes
(spark, sf_dir) and returns a DataFrame; the oracle SQL is ANSI SQL
DuckDB runs over the same parquet tables (pre-registered views).
Column names must match exactly — alias everything on both sides.

Queries with no SQL-expressible oracle (LSH, streaming state, approx
sketches) register with oracle=None → the driver records a weaker
rows-only check.

Cache policy (revised round 5): a registered query that needs a
multi-referenced intermediate (Q2's regional partsupp, the MinHash
band scan, Q21's late pairs, the graph edge lists) materializes it
with localCheckpoint(), NOT persist() — a persist() inside a
lazy-returning query has no place to unpersist and leaks a
CacheManager entry per call, while localCheckpoint blocks are freed
when the RDD is garbage-collected. persist() remains only where the
operator itself runs the final action and can unpersist before
returning (connected_components, semantic_dedup). Callers running
many queries in one session still clearCache() + gc.collect() between
queries (parity.py and bench.py both do) so checkpoint RDD refs drop
promptly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}

# THE authoritative rows-only carve-out list (VERDICT r4 item 5).
# Every name here registers with oracle=None and gets the driver's
# weaker rows-only check; everything else MUST carry an exact DuckDB
# oracle. tests/test_registry_contract.py asserts this list equals
# the computed set(QUERIES) - set(ORACLES) — keep them in lockstep,
# and keep SURVEY.md pointing HERE instead of restating the list.
ROWS_ONLY_CARVE_OUTS: frozenset[str] = frozenset(
    {
        # approx sketches — outputs are estimator-dependent by design
        # (Spark's DataSketches HLL / KLL and DuckDB's HyperLogLog /
        # t-digest are DIFFERENT estimators; no parameter pinning makes
        # their register/centroid states bit-comparable), so the sketch
        # VALUE can never carry a cross-engine oracle. The driver-
        # verifiable half is the exact twin at the same grain:
        # agg_hll_exact_anchor (r11) is hash-exact and pins the grain
        # agg_hll_partial_union's merge path is tested against (<5%,
        # tests/test_advanced.py); agg_approx_percentile is bounded
        # vs exact percentile the same way.
        "agg_approx_count_distinct",
        "agg_approx_percentile",
        "agg_hll_partial_union",
        # LSH / probabilistic candidate generation — recall vs exact
        # twins is asserted in tests; the candidate set is hash- or
        # FP-sign-dependent. The MinHash family (dedup_minhash_lsh,
        # dedup_clusters_lsh, dedup_canonical_summary_lsh) graduated
        # OUT in r10: its hash plumbing became engine-portable (md5
        # token hashes + Horner mod-p shingle/band combines — exact
        # int64 both engines reproduce), so banded candidates + exact-
        # Jaccard verify carry hash-exact oracles, and dedup_simhash
        # followed (md5 token hash + integer bit arithmetic end to
        # end). The hyperplane-LSH members below stay: their bucket
        # ids are SIGNS of FP dot products, which no cross-engine
        # bit-identity argument covers.
        "dedup_embedding_cosine_lsh",
        "sim_topk_lsh",
        # sample-trained k-means index families — FP-iteration order
        # in centroid training is engine-specific; recall/variance
        # tests vs exact twins bound them.
        # sim_kmeans_lloyd graduated OUT of this set in r10: the
        # registered query is now QUANTIZED Lloyd's (int64-exact
        # distances/sums, integer round-half-up centroids), so there
        # is no FP aggregation order left and an unrolled DuckDB twin
        # is hash-exact (see plans/round4c.py:_kmeans_quant_oracle).
        # dedup_semantic and sim_topk_ivf followed in the same round:
        # quantized-Lloyd's coarse quantizer + exact int64 probe
        # assignment + the adjudicated rounded fold-order-exact cosine.
        # sim_topk_pq also graduated r10: candidate selection is exact
        # int64 (quantized vectors, integer codebooks, integer ADC);
        # only the final re-rank uses the adjudicated rounded cosine.
        "sim_pca_project",
        "sim_topk_mips",
        # ml_isotonic_calibration graduated OUT of this set in r9:
        # weighted-L2 isotonic regression is unique, so the minimax
        # formula over integer prefix sums is an exact SQL twin of the
        # driver-side PAVA (see its docstring for the bit-identity
        # argument)
    }
)


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
