"""EP-1 end-to-end: JSON array in → transform → observe-validation →
CSV + JDBC sinks, one lazy plan (reference DAG parity)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from whisky_wine_etl_spark.etl import run_wine_etl
from whisky_wine_etl_spark.sources import io as sio


def _wine_rows():
    # Note: surviving rows carry no null strings into the sink — the
    # Derby embedded driver rejects Spark's setNull(CLOB) binding for
    # VARCHAR columns (Derby-only quirk; null handling itself is
    # covered by the oracle queries and test_wine_ops). The dropped
    # row still exercises null paths pre-drop.
    return [
        {"points": "91", "title": "Fine red", "description": "a very long description",
         "taster_twitter_handle": "@vino", "price": 25.0, "designation": None,
         "variety": "Red", "region_1": "RA", "region_2": "RB", "province": "P",
         "country": "Portugal", "winery": None, "taster_name": "A"},
        {"points": "N/A", "title": "Bad points row dropped", "description": "x",
         "taster_twitter_handle": None, "price": 10.0, "designation": "d",
         "variety": "White", "region_1": None, "region_2": None, "province": None,
         "country": None, "winery": None, "taster_name": None},
        {"points": "87", "title": "ok", "description": "short", "taster_twitter_handle": None,
         "price": None, "designation": "d2", "variety": "Rose", "region_1": "R1",
         "region_2": "R2", "province": "P", "country": "France", "winery": "W2",
         "taster_name": "B"},
        {"points": "102", "title": "Out of range points", "description": "long enough desc",
         "taster_twitter_handle": "@x@y", "price": 700.0, "designation": "d3",
         "variety": "Red", "region_1": "R9", "region_2": "R9b", "province": "P",
         "country": "US", "winery": "W3", "taster_name": "C"},
    ]


def test_wine_etl_end_to_end(spark, tmp_path):
    src = tmp_path / "wine.json"
    src.write_text(json.dumps(_wine_rows()))
    csv_out = str(tmp_path / "wine_csv")
    db = tmp_path / "etldb"
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

    # Derby's JDBC driver can't bind strings into CLOB columns, so the
    # TEXT-ish description column gets a Derby-safe VARCHAR override
    # (column_types is dialect-specific DDL by design).
    derby_types = {**sio.WINE_JDBC_COLUMN_TYPES, "description": "VARCHAR(4000)"}
    result = run_wine_etl(
        spark, str(src), csv_out=csv_out, jdbc_url=url, jdbc_driver=driver,
        jdbc_column_types=derby_types,
    )

    # row 2 (points 'N/A' → null) dropped by T-2; 3 rows survive
    out = result.transformed
    assert out.count() == 3

    rows = {r.title: r for r in out.collect()}
    assert rows["Fine red"].taster_twitter_handle == "vino"      # T-3+T-4
    assert rows["Fine red"].designation == "unknown"              # T-3
    assert rows["ok"].price == 362.5                              # T-5 median(25, 700)
    assert rows["Fine red"].price_category == "affordable"        # T-7 (20,50]
    assert rows["Out of range points"].price_category == "luxury"
    assert rows["Fine red"].region == "RA"                        # T-8 prefers region_1
    # T-10: lexicographic codes over {France, Portugal, US}
    assert rows["ok"].country_code == 0
    assert rows["Fine red"].country_code == 1
    assert rows["Out of range points"].country_code == 2

    # validation observed during the sink action — non-fatal, counted
    assert result.validation["points_out_of_range"] == 1   # 102
    assert result.validation["country_null"] == 0
    assert result.validation["country_not_allowed"] == 1   # Portugal
    assert result.validation["description_too_short"] == 1  # 'short' (5 chars)

    # both sinks materialized
    back_csv = sio.read_csv(spark, csv_out, infer_schema=True)
    assert back_csv.count() == 3
    back_jdbc = sio.read_jdbc(spark, url, "wine_data", driver=driver)
    assert back_jdbc.count() == 3
    assert back_jdbc.filter(F.col("country") == "Portugal").count() == 1


def test_wine_etl_validation_only(spark, tmp_path):
    src = tmp_path / "wine2.json"
    src.write_text(json.dumps(_wine_rows()))
    result = run_wine_etl(spark, str(src))  # no sinks: noop action
    assert result.validation["points_null"] == 0
    assert result.validation["region_null"] == 0
