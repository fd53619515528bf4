"""Round-8a invariants beyond the oracle parity checks: the chaos
sink's on-disk state (zombies visible in data/, invisible to readers;
aborted attempts gone) and the fidelity matrix's per-format type
preservation."""

from __future__ import annotations

import json
import os

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.plans import round8a

plans.load_all()

SF = "/root/testdata/sf0.001"


def test_chaos_sink_zombies_on_disk_but_invisible(spark):
    """After the chaos run: data/ holds manifest+3 files (3 zombies,
    0 aborted leftovers), and no sentinel chaos row reaches a reader."""
    out = plans.QUERIES["stream_sink_exactly_once_chaos"](spark, SF).collect()[0]
    assert out.manifest_parts == 6  # 3 micro-batches x repartition(2)
    assert out.orphan_parts == 3  # one zombie per batch; aborts cleaned

    target = round8a._tmpdir(spark, SF, "mjchaos")
    with open(os.path.join(target, "_MANIFEST")) as f:
        committed = {os.path.basename(e["path"]) for e in json.load(f)["files"]}
    on_disk = set(os.listdir(os.path.join(target, "data")))
    assert committed <= on_disk
    assert len(on_disk - committed) == 3
    back = (
        spark.read.format("manifest_jsonl")
        .schema("event_id long, user_id long, value double")
        .option("path", target)
        .load()
    )
    # the zombie/aborted sentinel rows (event_id -1/-2, value 1e9)
    # must never surface through the manifest reader
    assert back.filter("event_id < 0 OR value >= 1e9").count() == 0


def test_chaos_sink_rerun_is_idempotent(spark):
    """A second call in the same session reads back the same table
    without re-running the stream (manifest guard)."""
    a = plans.QUERIES["stream_sink_exactly_once_chaos"](spark, SF).collect()[0]
    b = plans.QUERIES["stream_sink_exactly_once_chaos"](spark, SF).collect()[0]
    assert a == b


def test_fidelity_matrix_all_formats_exact(spark):
    rows = {
        r.fmt: r
        for r in plans.QUERIES["source_format_fidelity_matrix"](
            spark, SF
        ).collect()
    }
    assert set(rows) == {"parquet", "orc", "csv"}
    for r in rows.values():
        assert r.n_rows == r.n_back == r.n_exact > 0


def test_fidelity_matrix_join_is_hash_keyed(spark):
    """The data-sized fidelity join must hash on the null-safe column
    keys (BroadcastHashJoin/SortMergeJoin), never degrade to a
    nested-loop over orders x orders. The only NestedLoop nodes
    allowed are the 1-row aggregate crossJoins."""
    df = plans.QUERIES["source_format_fidelity_matrix"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # every equality join keyed (null-safe -> coalesce/isnull keys)
    assert "BroadcastHashJoin [coalesce(okey" in plan or (
        "SortMergeJoin [coalesce(okey" in plan
    )
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line  # 1-row aggregate crosses only


def test_fidelity_matrix_csv_readback_preserves_types(spark):
    """The csv leg re-reads with the written schema — assert the frame
    the query builds and the csv read-back agree on every dtype,
    including decimal scale and timestamp-vs-date."""
    plans.QUERIES["source_format_fidelity_matrix"](spark, SF).collect()
    base = round8a._tmpdir(spark, SF, "fidelity")
    d_types = dict(
        [
            ("okey", "bigint"),
            ("cust", "int"),
            ("status", "string"),
            ("price", "double"),
            ("price_dec", "decimal(12,2)"),
            ("odate", "date"),
            ("big_flag", "boolean"),
            ("maybe_prio", "string"),
            ("hostile", "string"),
        ]
    )
    back = (
        spark.read.option("header", True)
        .option("timestampFormat", round8a._TS_FMT)
        .schema(
            "okey bigint, cust int, status string, price double,"
            " price_dec decimal(12,2), odate date, ots timestamp,"
            " big_flag boolean, maybe_prio string, hostile string"
        )
        .csv(os.path.join(base, "csv"))
    )
    got = dict(back.dtypes)
    for col, typ in d_types.items():
        assert got[col] == typ
