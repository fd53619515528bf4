"""Registry mapping query name → (Spark callable, DuckDB oracle SQL).

Driver contract (__spark_entry__.py): each Spark callable takes
(spark, sf_dir) and returns a DataFrame; the oracle SQL is ANSI SQL
DuckDB runs over the same parquet tables (pre-registered views).
Column names must match exactly — alias everything on both sides.

Queries with no SQL-expressible oracle (LSH, streaming state, approx
sketches) register with oracle=None → the driver records a weaker
rows-only check.

Cache policy: a registered query may persist() intermediates that its
RETURNED (lazy) frame still references — Q2's regional partsupp, the
MinHash band scan, Q21's late pairs. The operator cannot unpersist
those before the caller materializes the result, so the contract is:
callers running many registered queries in one session release them
between queries via spark.catalog.clearCache() (parity.py and
bench.py both do). Operators that materialize internally
(connected_components, semantic_dedup) unpersist their own caches
before returning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
