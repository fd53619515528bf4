"""Live PostgreSQL sink/source via bulk COPY (reference S-5 parity).

The reference's actual sink is Postgres 15 (reference
docker-compose.yaml:90-105; wine_etl_kaggle.py:167-204 writes the
cleaned frame with pandas ``to_sql`` + an explicit SQLAlchemy dtype
map). Rounds 2-5 proved the engine side on embedded Derby and
RENDERED the exact Postgres DDL through Spark's own PostgresDialect
without a server (tests/test_sources.py). This module closes the
carve-out: the container ships Postgres 15 server binaries (no JDBC
driver jar, no psycopg — only ``psql``), so the live bridge is
CSV + COPY, which is also the scale-correct pattern:

* **write**: Spark writes the frame as distributed CSV part-files
  (executor-parallel, RFC-4180 quoting), the table is created from
  the SAME PostgresDialect-rendered DDL the JDBC writer would issue,
  and each part streams through ``psql \\copy`` — Postgres's bulk
  path, the one real pipelines use instead of row INSERTs. On a
  cluster each executor would pipe its own partition through COPY
  (one connection per task, exactly the JDBC writer's topology);
  in-container the driver iterates the part files.
* **read**: ``\\copy (SELECT ...) TO`` CSV, read back with
  ``spark.read.csv`` under an explicit schema — never inferred.

Nothing here depends on proprietary services: Postgres is started
locally by the test fixture (tests/test_postgres_live.py) and skipped
cleanly when the binaries are absent.
"""

from __future__ import annotations

import glob
import os
import subprocess

from pyspark.sql import DataFrame, SparkSession

PSQL = "/usr/bin/psql"


def have_psql() -> bool:
    return os.path.exists(PSQL)


def run_psql(conn: dict, sql: str, *, input_text: str | None = None) -> str:
    """One psql invocation against ``conn`` (host=socket-dir, port,
    user, dbname); raises on nonzero exit with the server's stderr."""
    cmd = [
        PSQL,
        "-h", conn["host"],
        "-p", str(conn["port"]),
        "-U", conn["user"],
        "-d", conn.get("dbname", "postgres"),
        "-v", "ON_ERROR_STOP=1",
        "-qAt",
        "-c", sql,
    ]
    res = subprocess.run(
        cmd, input=input_text, capture_output=True, text=True, timeout=300
    )
    if res.returncode != 0:
        raise RuntimeError(f"psql failed: {res.stderr.strip()[:500]}")
    return res.stdout


def postgres_schema_string(
    spark: SparkSession, df: DataFrame, column_types_clause: str | None = None
) -> str:
    """The exact column list Spark's JDBC writer would CREATE TABLE
    with against a postgresql:// URL — JdbcUtils.schemaString driven
    by the real PostgresDialect (same call path as
    tests/test_sources.py's render-only pin, reference dtype map
    wine_etl_kaggle.py:175-194)."""
    jvm = spark._jvm
    ju = getattr(
        jvm.org.apache.spark.sql.execution.datasources.jdbc, "JdbcUtils$"
    ).__getattr__("MODULE$")
    opt = jvm.scala.Option.apply(column_types_clause)
    pg = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:postgresql://h/db")
    return ju.schemaString(pg, df._jdf.schema(), False, opt)


def copy_write(
    df: DataFrame,
    table: str,
    conn: dict,
    scratch_dir: str,
    column_types_clause: str | None = None,
) -> int:
    """CREATE TABLE from the PostgresDialect DDL, then bulk-COPY the
    frame in via its distributed CSV part-files. Returns rows loaded.

    CSV dialect contract (both directions in this module): RFC-4180 —
    quote=``"``, escape=``"`` (doubled quotes, Spark's non-default but
    COPY's only understanding), NULL = unquoted empty, empty string =
    ``""``. That makes Spark's writer and COPY's reader exact
    inverses, embedded commas/quotes/newlines included."""
    ddl = postgres_schema_string(
        SparkSession.getActiveSession() or df.sparkSession,
        df,
        column_types_clause,
    )
    run_psql(conn, f'DROP TABLE IF EXISTS "{table}"')
    run_psql(conn, f'CREATE TABLE "{table}" ({ddl})')
    out = os.path.join(scratch_dir, f"pgcopy_{table}")
    (
        df.write.mode("overwrite")
        .option("quote", '"')
        .option("escape", '"')
        .option("emptyValue", '""')
        .option("nullValue", "")
        # Spark's CSV writer TRIMS leading/trailing whitespace by
        # default — including a trailing "\n" INSIDE a quoted value —
        # which silently corrupts newline-bearing fields (ADVICE r6
        # fixture gap found exactly this). Lossless bridge => off.
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(out)
    )
    for part in sorted(glob.glob(os.path.join(out, "part-*.csv"))):
        with open(part, encoding="utf-8") as f:
            data = f.read()
        if not data:
            continue
        run_psql(
            conn,
            f'\\copy "{table}" FROM STDIN WITH (FORMAT csv)',
            input_text=data,
        )
    # Rows loaded = the server's own count, NOT a newline count of the
    # CSV payload: a quoted field with an embedded newline is one ROW
    # but two "\n"s, exactly the case this module's RFC-4180 contract
    # supports (ADVICE r6). COUNT(*) is also what a JDBC writer's
    # post-load verification would issue.
    return int(run_psql(conn, f'SELECT COUNT(*) FROM "{table}"').strip())


def copy_read(
    spark: SparkSession, table: str, schema: str, conn: dict, scratch_dir: str
) -> DataFrame:
    """COPY the table out as RFC CSV and read it back with an explicit
    schema (multiLine on: COPY quotes embedded newlines).

    NULL vs empty string: COPY writes NULL as an UNQUOTED empty field
    and '' as a QUOTED ``""``. Spark's reader folds both into
    nullValue unless emptyValue redirects the quoted form, so quoted-
    empty is routed through a one-byte NUL sentinel and mapped back to
    '' — safe because Postgres text values can never contain \\x00."""
    out = os.path.join(scratch_dir, f"pgread_{table}.csv")
    cmd = [
        PSQL,
        "-h", conn["host"],
        "-p", str(conn["port"]),
        "-U", conn["user"],
        "-d", conn.get("dbname", "postgres"),
        "-v", "ON_ERROR_STOP=1",
        "-c", f'\\copy "{table}" TO \'{out}\' WITH (FORMAT csv)',
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    if res.returncode != 0:
        raise RuntimeError(f"psql copy-out failed: {res.stderr.strip()[:500]}")
    sentinel = "\x00"
    df = (
        spark.read.schema(schema)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .option("emptyValue", sentinel)
        .option("nullValue", "")
        .csv(out)
    )
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    return df.select(
        *[
            F.when(F.col(f.name) == sentinel, F.lit("")).otherwise(F.col(f.name)).alias(f.name)
            if isinstance(f.dataType, StringType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )
