"""Catalog: load the driver's testdata parquet tables as DataFrames.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
/root/testdata/sf{0.001,0.01,0.1}/.

Scale notes:
- Explicit handling of `events.ts` (TIMESTAMP_NANOS in the parquet
  footer, which Spark's vectorized reader rejects): we flip the
  runtime-settable `spark.sql.legacy.parquet.nanosAsLong` conf, read
  the column as int64 nanos, and convert with integer division to
  microseconds (`ts div 1000`) — exact, no double rounding, matching
  DuckDB's ns→µs truncation so oracle comparisons line up.
- Everything else is a plain columnar parquet scan: Catalyst pushes
  filters and prunes columns into the scan, which is the whole point
  at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) — illegal for Spark's parquet reader.
        # Read nanos as long (runtime-settable legacy conf), then
        # convert exactly: integer `div 1000` → microseconds.
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view for the spark.sql() surface."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
