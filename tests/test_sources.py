"""Source/sink round-trips (SURVEY.md §2 S-2…S-5).

The JDBC test runs against the Derby embedded driver that ships with
Spark (no server needed) — a real end-to-end
create/append/read-back through the JDBC code path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whisky_wine_etl_spark.catalog import load_table
from whisky_wine_etl_spark.sources import io as sio

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text", "n_chars")


def test_csv_roundtrip(spark, tmp_path):
    df = _docs(spark).limit(100)
    path = str(tmp_path / "csv_out")
    sio.write_csv(df, path)
    back = sio.read_csv(spark, path, schema="doc_id bigint, text string, n_chars bigint")
    assert back.count() == 100
    assert back.schema == df.schema
    assert back.agg(F.sum("n_chars")).first()[0] == df.agg(F.sum("n_chars")).first()[0]


def test_jsonl_roundtrip(spark, tmp_path):
    df = _docs(spark).limit(100)
    path = str(tmp_path / "json_out")
    sio.write_json(df, path)
    back = sio.read_json(spark, path, schema="doc_id bigint, text string, n_chars bigint")
    assert back.count() == 100
    assert back.agg(F.sum("doc_id")).first()[0] == df.agg(F.sum("doc_id")).first()[0]


def test_json_array_multiline(spark, tmp_path):
    """The reference's input shape: ONE file holding a JSON array
    (pd.read_json semantics, wine_etl_kaggle.py:69)."""
    p = tmp_path / "arr.json"
    p.write_text('[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}, {"a": 3, "b": null}]')
    df = sio.read_json(spark, str(p), schema="a bigint, b string", multi_line=True)
    assert df.count() == 3
    assert df.filter(F.col("b").isNull()).count() == 1


def test_parquet_partitioned_write_prunes(spark, tmp_path):
    df = load_table(spark, SF, "orders")
    path = str(tmp_path / "orders_pq")
    sio.write_parquet(df, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    # partition pruning: the physical plan must carry the partition filter
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    expected = df.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_jdbc_append_roundtrip_derby(spark, tmp_path):
    """S-5 end-to-end over Derby embedded: create+append with the
    reference's column type map, read back, append again (if_exists=
    'append' parity), verify the doubled row count."""
    db = tmp_path / "derbydb"
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    wine = spark.createDataFrame(
        [(90, "title one", "a description", 12.5, "cheap", "US", 1),
         (85, "title two", "another desc", 55.0, "midrange", "France", 0)],
        "points int, title string, description string, price double,"
        " price_category string, country string, country_code int",
    )
    sio.write_jdbc_append(
        wine, url, "wine_data", driver=driver,
        column_types=sio.WINE_JDBC_COLUMN_TYPES, num_partitions=1,
    )
    back = sio.read_jdbc(spark, url, "wine_data", driver=driver)
    assert back.count() == 2
    sio.write_jdbc_append(wine, url, "wine_data", driver=driver, num_partitions=1)
    assert sio.read_jdbc(spark, url, "wine_data", driver=driver).count() == 4
    got = {r.country: r.points for r in back.collect()}
    assert got == {"US": 90, "France": 85}


def test_jdbc_column_types_clause():
    clause = sio.column_types_clause(
        sio.WINE_JDBC_COLUMN_TYPES, ["points", "unknown_col", "price_category"]
    )
    assert clause == "points INTEGER, price_category VARCHAR(50)"


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "docs_orc")
    sio.write_orc(docs, path)
    back = sio.read_orc(spark, path)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)
    # filter pushes into the ORC scan
    plan = back.filter(back.doc_id < 10)._sc._jvm.PythonSQLUtils.explainString(
        back.filter(back.doc_id < 10)._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in plan


def test_compact_parquet_merges_small_files(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    docs = _docs(spark)
    docs.repartition(37).write.mode("overwrite").parquet(src)  # 37 tiny files
    import glob

    assert len(glob.glob(src + "/*.parquet")) == 37
    dst = str(tmp_path / "compacted")
    n = sio.compact_parquet(spark, src, dst)
    out_files = glob.glob(dst + "/*.parquet")
    assert len(out_files) == n == 1  # tiny data → single right-sized file
    assert spark.read.parquet(dst).count() == docs.count()


def test_read_csv_requires_explicit_schema(spark, tmp_path):
    """ADVICE fix: schema-explicit policy enforced — inference is an
    opt-in escape hatch, not a silent fallback."""
    import pytest

    path = str(tmp_path / "c.csv")
    spark.createDataFrame([(1, "x")], "a int, b string").write.option(
        "header", "true"
    ).csv(path)
    with pytest.raises(ValueError, match="explicit schema"):
        sio.read_csv(spark, path)
    assert sio.read_csv(spark, path, infer_schema=True).count() == 1


def test_read_csv_permissive_quarantines_bad_rows(spark, tmp_path):
    p = tmp_path / "landing.csv"
    p.write_text(
        "id,price\n"
        "1,9.5\n"
        "2,not_a_number\n"   # malformed double → quarantined
        "3,7.25\n"
    )
    from whisky_wine_etl_spark.sources.io import read_csv_permissive

    df = read_csv_permissive(
        spark, str(p), "id INT, price DOUBLE"
    ).cache()  # cache before splitting good/bad (CSV corrupt-col caveat)
    bad = df.filter("_corrupt_record IS NOT NULL").collect()
    good = df.filter("_corrupt_record IS NULL").collect()
    assert len(bad) == 1 and bad[0].id == 2 and bad[0].price is None
    assert "not_a_number" in bad[0]._corrupt_record  # raw bytes preserved
    assert sorted((r.id, r.price) for r in good) == [(1, 9.5), (3, 7.25)]
    df.unpersist()


def test_read_parquet_evolved_merges_schemas(spark, tmp_path):
    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id LONG, old_col STRING").write.parquet(
        base + "/batch=1"
    )
    spark.createDataFrame([(2, 4.5)], "id LONG, new_col DOUBLE").write.parquet(
        base + "/batch=2"
    )
    from whisky_wine_etl_spark.sources.io import read_parquet_evolved

    df = read_parquet_evolved(spark, base)
    assert {"id", "old_col", "new_col", "batch"} <= set(df.columns)
    rows = {r.id: r for r in df.collect()}
    assert rows[1].old_col == "a" and rows[1].new_col is None
    assert rows[2].new_col == 4.5 and rows[2].old_col is None


def test_postgres_dialect_create_table_rendering(spark):
    """S-5 Postgres parity without a server: render the exact CREATE
    TABLE column list Spark's JDBC writer would execute against the
    reference's Postgres sink (wine_etl_kaggle.py:167-204, dtype map
    :175-194) by driving JdbcUtils.schemaString with the real
    PostgresDialect and our createTableColumnTypes clause. Also pins
    the Derby divergence (STRING→CLOB) that forces the round-trip
    test's VARCHAR override — the two dialects must differ exactly
    where documented."""
    from whisky_wine_etl_spark.operators import wine as wops
    from whisky_wine_etl_spark.plans.wine import wine_input
    from whisky_wine_etl_spark.sources import io as sio

    t = wops.wine_transform(wine_input(spark, "/root/testdata/sf0.001"))
    clause = sio.column_types_clause(sio.WINE_JDBC_COLUMN_TYPES, t.columns)
    jvm = spark._jvm
    ju = getattr(
        jvm.org.apache.spark.sql.execution.datasources.jdbc, "JdbcUtils$"
    ).__getattr__("MODULE$")
    opt = jvm.scala.Option.apply(clause)

    pg = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:postgresql://h/db")
    s_pg = ju.schemaString(pg, t._jdf.schema(), False, opt)
    # SQLAlchemy Text → TEXT; Integer → INTEGER; String(255) → VARCHAR;
    # SmallInteger → SMALLINT (reference dtype map, one per line)
    assert '"description" TEXT' in s_pg
    assert '"points" INTEGER' in s_pg
    assert '"title" VARCHAR(255)' in s_pg
    assert '"price_category" VARCHAR(50)' in s_pg
    assert '"country_code" SMALLINT' in s_pg
    assert '"price" FLOAT4' in s_pg
    assert "CLOB" not in s_pg

    derby = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:derby:memory:x")
    s_derby = ju.schemaString(derby, t._jdf.schema(), False, opt)
    assert '"description" CLOB' in s_derby  # the documented Derby quirk
    assert '"price" REAL' in s_derby
