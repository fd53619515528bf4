"""Behavior tests for round-4al: cascade delete, file-layout audit."""

from __future__ import annotations

from pyspark.sql import Row

from whisky_wine_etl_spark import plans

SF = "/root/testdata/sf0.001"

plans.load_all()


def test_cascade_delete_propagates_and_leaves_no_orphans(spark, monkeypatch):
    """Customer 1 is blacklisted: their order and its lineitems go;
    customer 2's survive untouched."""
    import whisky_wine_etl_spark.plans.round4al as r4al

    cust = spark.createDataFrame(
        [
            Row(c_custkey=1, c_acctbal=-950.0),
            Row(c_custkey=2, c_acctbal=100.0),
        ]
    )
    orders = spark.createDataFrame(
        [Row(o_orderkey=10, o_custkey=1), Row(o_orderkey=20, o_custkey=2)]
    )
    li = spark.createDataFrame(
        [Row(l_orderkey=10)] * 3 + [Row(l_orderkey=20)] * 2
    )
    tables = {"customer": cust, "orders": orders, "lineitem": li}
    monkeypatch.setattr(r4al, "load_table", lambda s, sf, n: tables[n])
    out = {r.tbl: r for r in plans.QUERIES["etl_cascade_delete"](spark, SF).collect()}
    assert (out["customer"].deleted, out["customer"].rows_after) == (1, 1)
    assert (out["orders"].deleted, out["orders"].rows_after) == (1, 1)
    assert (out["lineitem"].deleted, out["lineitem"].rows_after) == (3, 2)
    assert all(r.orphans == 0 for r in out.values())


def test_file_layout_report_counts_real_files(spark):
    """The n_files column comes from _metadata.file_path — verify it
    against the actual files on disk."""
    import glob
    import os

    import whisky_wine_etl_spark.plans.round4al as r4al

    rows = plans.QUERIES["diag_file_layout_report"](spark, SF).collect()
    assert rows
    # locate the written layout dir (marker-keyed)
    import hashlib
    import tempfile

    tag = (
        hashlib.md5(SF.encode()).hexdigest()[:8]
        + "_"
        + hashlib.md5(spark.sparkContext.applicationId.encode()).hexdigest()[:8]
    )
    dest = os.path.join(tempfile.gettempdir(), f"sg_layoutrep_{tag}")
    for r in rows:
        part_dir = os.path.join(dest, f"o_orderpriority={r.part_key}")
        files = glob.glob(os.path.join(part_dir, "*.parquet"))
        assert len(files) == r.n_files == 1
