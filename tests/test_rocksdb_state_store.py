"""RocksDB state store parity: at 100 TB the HDFS-backed in-memory
state store is the wrong backend (state must spill; executor restarts
must reload incrementally), so the scale deployment runs
RocksDBStateStoreProvider. These tests pin that the engine's stateful
streaming results are BACKEND-INDEPENDENT: the same multi-batch
pipelines produce identical rows under RocksDB as under the default
provider. Spark bundles RocksDB since 3.2 — no extra install."""

from __future__ import annotations

import pytest

from whisky_wine_etl_spark import plans

plans.load_all()

SF = "/root/testdata/sf0.001"

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _collect_sorted(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


@pytest.mark.parametrize(
    "name",
    [
        "stream_tumbling_multibatch",   # windowed agg state
        "stream_dedup_watermark",       # dropDuplicates state
        "stream_latest_per_key",        # arbitrary stateful (update mode)
    ],
)
def test_stateful_results_identical_under_rocksdb(spark, name):
    q = plans.QUERIES[name]
    default_rows = _collect_sorted(q(spark, SF))
    prev = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        rocks_rows = _collect_sorted(q(spark, SF))
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev)
    assert default_rows == rocks_rows
    assert len(default_rows) > 0
