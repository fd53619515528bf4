"""Z-order layout: per-file min-max statistics must become narrow on
BOTH indexed dimensions (that is literally what makes parquet skip
files), vs a linear sort which only helps its leading column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.operators import layout


def _avg_file_range(path: str, col: str) -> float:
    spans = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins:
            spans.append(max(maxs) - min(mins))
    return sum(spans) / len(spans)


def test_zorder_narrows_minmax_on_both_dims(spark, tmp_path):
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    full_part = li.agg({"l_partkey": "max"}).collect()[0][0]
    full_supp = li.agg({"l_suppkey": "max"}).collect()[0][0]

    linear = str(tmp_path / "linear")
    li.repartitionByRange(8, "l_partkey").sortWithinPartitions("l_partkey").write.parquet(linear)
    zpath = str(tmp_path / "zorder")
    layout.zorder_write(li, ["l_partkey", "l_suppkey"], zpath, n_files=8)

    # same data
    assert spark.read.parquet(zpath).count() == li.count()

    # linear layout: partkey ranges narrow, suppkey ranges ~full width
    assert _avg_file_range(linear, "l_partkey") < 0.35 * full_part
    assert _avg_file_range(linear, "l_suppkey") > 0.8 * full_supp
    # z-order: BOTH dims substantially narrower than full width
    assert _avg_file_range(zpath, "l_partkey") < 0.6 * full_part
    assert _avg_file_range(zpath, "l_suppkey") < 0.6 * full_supp
