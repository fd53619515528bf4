"""r13 guard (ADVICE r12 item 3 / VERDICT What's-wrong #4): the
catalog's schema/leaf-DataFrame caches must not grow without bound in
a long-lived driver. Pins three properties:

- a REGENERATED file (same path, new mtime/size) REPLACES its cache
  entries in place instead of accreting a new entry per file version;
- total entries stay under the LRU caps however many distinct file
  identities pass through;
- the cached leaf DataFrame is still reused on an identity hit, and a
  regenerated file's data (not a stale plan) is what a fresh load
  returns.
"""

from __future__ import annotations

import os

from whisky_wine_etl_spark import catalog


def _write_table(spark, path: str, n: int) -> None:
    spark.range(n).toDF("c_custkey").write.mode("overwrite").parquet(path)


def test_regenerated_file_replaces_entry_and_serves_new_data(spark, tmp_path):
    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "customer.parquet")

    _write_table(spark, path, 5)
    df1 = catalog.load_table(spark, sf_dir, "customer")
    assert catalog.load_table(spark, sf_dir, "customer") is df1  # identity hit
    n_schema = len(catalog._schema_cache)
    n_df = len(catalog._df_cache)

    _write_table(spark, path, 9)  # regenerate: new mtime_ns/size
    # ensure the identity actually changed (parquet of 9 rows differs)
    df2 = catalog.load_table(spark, sf_dir, "customer")
    assert df2 is not df1
    assert df2.count() == 9
    # replaced in place: no growth from the regeneration
    assert len(catalog._schema_cache) == n_schema
    assert len(catalog._df_cache) == n_df


def test_caches_stay_under_lru_caps(spark, tmp_path, monkeypatch):
    # Shrink the caps so the eviction path runs without writing
    # hundreds of parquet files; load_table reads the module globals
    # at call time.
    monkeypatch.setattr(catalog, "_DF_CACHE_MAX", 4)
    monkeypatch.setattr(catalog, "_SCHEMA_CACHE_MAX", 4)

    for i in range(7):  # 7 distinct paths > both caps
        sf_dir = str(tmp_path / f"sf{i}")
        _write_table(spark, os.path.join(sf_dir, "nation.parquet"), 3)
        catalog.load_table(spark, sf_dir, "nation")

    assert len(catalog._schema_cache) <= 4
    assert len(catalog._df_cache) <= 4
    # most-recently-used survives; the LRU-evicted path is gone
    last = os.path.join(str(tmp_path / "sf6"), "nation.parquet")
    first = os.path.join(str(tmp_path / "sf0"), "nation.parquet")
    assert last in catalog._schema_cache
    assert first not in catalog._schema_cache
    assert (id(spark), last) in catalog._df_cache
    assert (id(spark), first) not in catalog._df_cache


def test_mtime_bump_replaces_identity_in_place(spark, tmp_path):
    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "nation.parquet")
    _write_table(spark, path, 3)
    base_stat = os.stat(path)
    df_old = catalog.load_table(spark, sf_dir, "nation")

    for i in range(1, 20):  # many identities, one path: one slot total
        os.utime(path, ns=(base_stat.st_atime_ns, base_stat.st_mtime_ns + i))
        df_new = catalog.load_table(spark, sf_dir, "nation")
        assert df_new is not df_old
        df_old = df_new

    assert sum(1 for p in catalog._schema_cache if p == path) == 1
    assert sum(1 for (_sid, p) in catalog._df_cache if p == path) == 1
