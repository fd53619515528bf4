"""LIVE Postgres 15 round-trip — closes the round-5 S-5 carve-out.

The reference's real sink is Postgres 15 (docker-compose.yaml:90-105);
earlier rounds proved the path on Derby and render-only Postgres DDL.
The container ships Postgres *server* binaries (but no JDBC jar and no
psycopg), so these tests start a throwaway local cluster and drive the
COPY-based bridge in sources/postgres.py. Skipped cleanly when the
binaries are absent or the server cannot start.

Note: pytest runs as root and initdb refuses root, so the server runs
as the unprivileged ``daemon`` user via ``su`` on a chown'd tmp dir.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest
from pyspark.sql import functions as F

PG_BIN = "/usr/local/bin"
PG_PORT = 54331


def _sh(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "-s", "/bin/bash", "daemon", "-c", cmd],
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/tmp",
    )


@pytest.fixture(scope="session")
def pg_conn():
    from whisky_wine_etl_spark.sources.postgres import have_psql

    if not (have_psql() and os.path.exists(f"{PG_BIN}/initdb")):
        pytest.skip("postgres binaries not available")
    # NOT under tmp_path_factory: pytest's root-owned 0700 parents are
    # untraversable by the unprivileged daemon user the server runs as
    import tempfile

    base_s = tempfile.mkdtemp(prefix="sg_pglive_", dir="/tmp")
    os.chmod(base_s, 0o777)
    shutil.chown(base_s, user="daemon")
    from pathlib import Path

    base = Path(base_s)
    data = base / "data"
    r = _sh(f"{PG_BIN}/initdb -D {data} -A trust")
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[:200]}")
    r = _sh(
        f"{PG_BIN}/pg_ctl -D {data} -l {base}/log"
        f" -o '-p {PG_PORT} -k {base}' start"
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[:200]}")
    yield {"host": str(base), "port": PG_PORT, "user": "daemon"}
    _sh(f"{PG_BIN}/pg_ctl -D {data} -m immediate stop")
    shutil.rmtree(base, ignore_errors=True)


@pytest.fixture()
def pg_scratch(tmp_path):
    # COPY TO runs as the daemon user via psql \copy (client-side, so
    # it writes as root actually — \copy is client-side I/O). Keep one
    # world-writable scratch for both sides.
    os.chmod(tmp_path, 0o777)
    return str(tmp_path)


def test_wine_sink_live_postgres_type_map(spark, pg_conn, pg_scratch):
    """Execute (not just render) the PostgresDialect DDL with the
    reference's dtype map against a real PG 15, then assert the
    information_schema types match wine_etl_kaggle.py:175-194:
    Text->text, Integer->integer, String(255)->varchar(255),
    SmallInteger->smallint, Float->real."""
    from whisky_wine_etl_spark.operators import wine as wops
    from whisky_wine_etl_spark.plans.wine import wine_input
    from whisky_wine_etl_spark.sources import io as sio
    from whisky_wine_etl_spark.sources.postgres import copy_write, run_psql

    t = wops.wine_transform(wine_input(spark, "/root/testdata/sf0.001"))
    clause = sio.column_types_clause(sio.WINE_JDBC_COLUMN_TYPES, t.columns)
    n = copy_write(t, "wine_live", pg_conn, pg_scratch, clause)
    assert n == t.count()

    out = run_psql(
        pg_conn,
        "SELECT column_name, data_type, character_maximum_length"
        " FROM information_schema.columns WHERE table_name='wine_live'",
    )
    types = {}
    for line in out.strip().splitlines():
        name, dtype, maxlen = line.split("|")
        types[name] = (dtype, maxlen)
    assert types["description"][0] == "text"
    assert types["points"][0] == "integer"
    assert types["title"] == ("character varying", "255")
    assert types["price_category"] == ("character varying", "50")
    assert types["country_code"][0] == "smallint"
    assert types["price"][0] == "real"


def test_wine_roundtrip_live_postgres_lossless(spark, pg_conn, pg_scratch):
    """Spark -> COPY in -> COPY out -> Spark equals the original frame
    row-for-row (nulls, embedded quotes/commas/newlines, float32
    values included) — the property the Derby twin
    (source_jdbc_roundtrip) proves in-container, now on the
    reference's actual engine."""
    from whisky_wine_etl_spark.operators import wine as wops
    from whisky_wine_etl_spark.plans.wine import wine_input
    from whisky_wine_etl_spark.sources import io as sio
    from whisky_wine_etl_spark.sources.postgres import copy_read, copy_write

    t = wops.wine_transform(wine_input(spark, "/root/testdata/sf0.001"))
    clause = sio.column_types_clause(sio.WINE_JDBC_COLUMN_TYPES, t.columns)
    copy_write(t, "wine_rt", pg_conn, pg_scratch, clause)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in t.schema)
    back = copy_read(spark, "wine_rt", ddl, pg_conn, pg_scratch).select(
        *t.columns
    )
    assert back.count() == t.count()
    assert back.exceptAll(t).count() == 0
    assert t.exceptAll(back).count() == 0


def test_embedded_newline_rowcount_and_roundtrip(spark, pg_conn, pg_scratch):
    """The ADVICE-r6 case the wine fixture never exercised: quoted
    fields containing embedded newlines (plus commas, doubled quotes,
    and NULL vs empty string). copy_write's returned row count must be
    the SERVER's row count (a newline-bearing field is one row but two
    '\\n's in the CSV payload), and the COPY round-trip must be
    lossless on exactly these values."""
    from whisky_wine_etl_spark.sources.postgres import copy_read, copy_write

    rows = [
        (1, "plain"),
        (2, "line one\nline two"),
        (3, 'quote " comma , and\nnewline'),
        (4, None),
        (5, ""),
        (6, "trailing newline\n"),
    ]
    df = spark.createDataFrame(rows, "id int, body string")
    n = copy_write(df, "nl_rt", pg_conn, pg_scratch)
    assert n == len(rows)  # newline-count would report 8
    back = copy_read(spark, "nl_rt", "id int, body string", pg_conn, pg_scratch)
    assert sorted((r.id, r.body) for r in back.collect()) == sorted(rows)


def test_events_aggregate_pushback_live_postgres(spark, pg_conn, pg_scratch):
    """Timestamps + doubles through the bridge: per-type event counts
    and value sums computed in Spark BEFORE the trip equal the same
    aggregate computed by Postgres AFTER COPY in — cross-engine
    agreement on the loaded bytes, not just Spark's own echo."""
    from whisky_wine_etl_spark.catalog import load_table
    from whisky_wine_etl_spark.sources.postgres import copy_write, run_psql

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    copy_write(ev, "events_live", pg_conn, pg_scratch)
    # Sum integer CENTS on both sides (ADVICE r6): summing rounded
    # doubles in Spark vs exact NUMERIC in Postgres can land on
    # opposite sides of a .005 boundary; exact bigint accumulation
    # cannot. Both engines round the SAME IEEE double value*100 with
    # HALF_UP on its shortest decimal repr, so the per-row cents
    # agree bit-exactly.
    spark_side = {
        (r["event_type"], r["n"], r["cents"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .collect()
    }
    out = run_psql(
        pg_conn,
        "SELECT event_type, COUNT(*),"
        " SUM(CAST(ROUND((value * 100)::numeric) AS BIGINT))"
        ' FROM "events_live" GROUP BY event_type',
    )
    pg_side = set()
    for line in out.strip().splitlines():
        etype, n, s = line.split("|")
        pg_side.add((etype, int(n), int(s)))
    assert pg_side == spark_side
