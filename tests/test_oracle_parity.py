"""The correctness gate, locally: every registered query with an
oracle must match DuckDB exactly at sf0.001 (the driver runs the same
comparison at sf0.01)."""

from __future__ import annotations

import pytest

from whisky_wine_etl_spark import plans
from whisky_wine_etl_spark.parity import compare, duckdb_connection

plans.load_all()

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duckdb_connection(SF)


@pytest.mark.parametrize("name", sorted(plans.QUERIES))
def test_query_parity(spark, con, name):
    df = plans.QUERIES[name](spark, SF)
    if name in plans.ORACLES:
        ok, msg = compare(df, con, plans.ORACLES[name])
        assert ok, f"{name}: {msg}"
    else:
        # rows-only contract: must at least run and return rows
        assert df.count() > 0, f"{name}: rows-only query returned 0 rows"
