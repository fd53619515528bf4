"""Round-4al: GDPR-style cascade delete and a file-layout audit over
the `_metadata` hidden columns.

Registered AFTER round4ak so the driver's unverified-first ordering
keeps the earlier backlog in the front verification slots.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.plans.registry import query


@query(
    "etl_cascade_delete",
    """
WITH bl AS (SELECT c_custkey FROM customer WHERE c_acctbal < -900),
del_o AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM bl)),
kept_o AS (SELECT * FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM bl)),
kept_l AS (SELECT * FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM del_o))
SELECT 'customer' AS tbl,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS rows_before,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) - (SELECT CAST(COUNT(*) AS BIGINT) FROM bl) AS rows_after,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bl) AS deleted,
       CAST(0 AS BIGINT) AS orphans
UNION ALL
SELECT 'orders',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM kept_o),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM del_o),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM kept_o o
        WHERE o.o_custkey IN (SELECT c_custkey FROM bl))
UNION ALL
SELECT 'lineitem',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM kept_l),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) - (SELECT CAST(COUNT(*) AS BIGINT) FROM kept_l),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM kept_l l
        WHERE l.l_orderkey IN (SELECT o_orderkey FROM del_o))
ORDER BY tbl
""",
)
def etl_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade: a customer blacklist propagates
    through orders to lineitems via LEFT ANTI joins, and the report
    carries its own proof — per-table before/after/deleted counts
    plus an orphan count the oracle pins at zero.

    The cascade is two anti-joins keyed on the natural FKs (orders
    shuffles once on custkey, lineitem once on orderkey); deleted
    orderkeys travel as a semi-join build side, never a collected
    list. At 100 TB this is the deletion-vector generation pass of a
    compliance pipeline."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bl = cust.filter(F.col("c_acctbal") < -900).select("c_custkey")
    del_o = orders.join(
        bl, orders["o_custkey"] == bl["c_custkey"], "left_semi"
    ).select("o_orderkey")
    kept_o = orders.join(bl, orders["o_custkey"] == bl["c_custkey"], "left_anti")
    kept_l = li.join(del_o, li["l_orderkey"] == del_o["o_orderkey"], "left_anti")

    def cnt(df: DataFrame) -> F.Column:
        return F.lit(df.count()).cast("bigint")

    orphans_o = kept_o.join(
        bl, kept_o["o_custkey"] == bl["c_custkey"], "left_semi"
    ).count()
    orphans_l = kept_l.join(
        del_o, kept_l["l_orderkey"] == del_o["o_orderkey"], "left_semi"
    ).count()
    rows = [
        ("customer", cust.count(), cust.count() - bl.count(), bl.count(), 0),
        ("orders", orders.count(), kept_o.count(), del_o.count(), orphans_o),
        ("lineitem", li.count(), kept_l.count(), li.count() - kept_l.count(), orphans_l),
    ]
    return spark.createDataFrame(
        rows, "tbl string, rows_before long, rows_after long, deleted long, orphans long"
    ).orderBy("tbl")


@query(
    "diag_file_layout_report",
    """
SELECT o_orderpriority AS part_key,
       CAST(1 AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders GROUP BY o_orderpriority ORDER BY part_key
""",
)
def diag_file_layout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-layout audit via the `_metadata` hidden column: write
    orders hive-partitioned by priority (one file per partition —
    repartition on the partition key first), read back, and report
    files-per-partition and rows-per-file from `_metadata.file_path`
    — the small-file detector every table-maintenance job starts
    with. The oracle pins n_files = 1 per partition, so the metadata
    plumbing (not just the row content) is value-verified."""
    tag = (
        hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        + "_"
        + hashlib.md5(spark.sparkContext.applicationId.encode()).hexdigest()[:8]
    )
    dest = os.path.join(tempfile.gettempdir(), f"sg_layoutrep_{tag}")
    marker = dest + ".done"
    if not os.path.exists(marker):
        (
            load_table(spark, sf_dir, "orders")
            .repartition("o_orderpriority")
            .write.mode("overwrite")
            .partitionBy("o_orderpriority")
            .parquet(dest)
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    back = spark.read.parquet(dest).select(
        "o_orderpriority", F.col("_metadata.file_path").alias("fp")
    )
    return (
        back.groupBy(F.col("o_orderpriority").alias("part_key"))
        .agg(
            F.countDistinct("fp").cast("bigint").alias("n_files"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        .orderBy("part_key")
    )
