"""Sources & sinks (SURVEY.md §2 S-2…S-5), Spark-native.

The reference's I/O surface is: a whole-file JSON array scan, CSV
scan/write between tasks, and a SQLAlchemy `to_sql` append into
Postgres with an explicit column→SQL-type map
(`/root/reference/dags/wine_etl_kaggle.py:69,92-102,167-204`). Here
those become schema-explicit `spark.read` calls (never inference at
scale — one schema mistake on 100 TB is a full re-read) and
`DataFrameWriter` sinks:

- JSON:   `multiLine` for the reference's array-of-objects file shape;
  line-delimited (the scalable default) otherwise. A JSON-array file
  is NOT splittable — one task per file — so landing pipelines should
  prefer JSONL; both are supported.
- CSV:    header on, explicit schema on read.
- JDBC:   `.write.jdbc(mode="append")` with `createTableColumnTypes`
  mirroring the reference's type map verbatim; `batchsize` and
  `numPartitions` replace pandas' row-at-a-time INSERTs.
- Parquet: the engine-managed format — columnar, splittable,
  predicate-pushdown-able; `partitionBy` for layout pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Reference parity: dtype_mapping at wine_etl_kaggle.py:175-194,
# rendered as Spark JDBC createTableColumnTypes (same SQL types).
WINE_JDBC_COLUMN_TYPES: dict[str, str] = {
    "points": "INTEGER",
    "title": "VARCHAR(255)",
    # reference uses SQLAlchemy Text; createTableColumnTypes values must
    # parse as Spark DDL, and STRING renders as TEXT on the Postgres
    # dialect (CLOB on Derby) — same storage semantics
    "description": "STRING",
    "taster_name": "VARCHAR(255)",
    "taster_twitter_handle": "VARCHAR(255)",
    "price": "FLOAT",
    "designation": "VARCHAR(255)",
    "variety": "VARCHAR(255)",
    "region_1": "VARCHAR(255)",
    "region_2": "VARCHAR(255)",
    "province": "VARCHAR(255)",
    "country": "VARCHAR(255)",
    "winery": "VARCHAR(255)",
    "title_length": "INTEGER",
    "description_length": "INTEGER",
    "price_category": "VARCHAR(50)",
    "region": "VARCHAR(255)",
    "country_code": "SMALLINT",
}


def column_types_clause(type_map: dict[str, str], columns: list[str]) -> str:
    """Render createTableColumnTypes for the columns actually present
    (order-preserving; unknown columns fall back to Spark's default
    JDBC mapping by omission)."""
    return ", ".join(f"{c} {type_map[c]}" for c in columns if c in type_map)


def read_json(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    multi_line: bool = False,
) -> DataFrame:
    """S-2: JSON scan. multi_line=True for a whole-file JSON array
    (the reference's Kaggle download shape; unsplittable), False for
    line-delimited JSON (splittable — the at-scale landing format)."""
    reader = spark.read.option("multiLine", str(multi_line).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """S-3: CSV scan, schema-explicit by policy — inference is an
    extra full pass and one schema mistake on 100 TB is a full
    re-read, so a missing schema raises unless the caller OPTS IN with
    infer_schema=True (exploration-only escape hatch)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    else:
        raise ValueError(
            "read_csv requires an explicit schema (pass infer_schema=True "
            "to opt into a full inference pass — exploration only)"
        )
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S-4: CSV sink with header (reference: to_csv(index=False)).
    Whitespace trimming is disabled to match pandas to_csv exactly:
    Spark's writer otherwise strips leading/trailing whitespace —
    including newlines INSIDE quoted values — that to_csv preserves."""
    (
        df.write.mode(mode)
        .option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink (splittable re-ingest format)."""
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Engine-managed table sink. partition_by gives directory-level
    partition pruning on later scans — the 100 TB layout lever."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    column_types: dict[str, str] | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """S-5: JDBC append sink.

    Replaces the reference's row-at-a-time `to_sql` with Spark's
    batched, partition-parallel JDBC writer: each of `num_partitions`
    tasks opens one connection and executes `batchsize`-row inserts.
    `column_types` ↦ createTableColumnTypes (reference dtype map).

    DIALECTS: the full INSERT round-trip is integration-tested against
    embedded Derby (the only JDBC engine in this container), and the
    Postgres rendering — the reference's actual sink
    (wine_etl_kaggle.py:167-204) — is pinned by driving Spark's own
    PostgresDialect through JdbcUtils.schemaString in
    tests/test_sources.py: the exact CREATE TABLE column list the
    writer would execute (STRING→TEXT, FLOAT→FLOAT4, SMALLINT kept)
    is asserted, including where it must diverge from Derby
    (STRING→CLOB there). Only live-connection behavior (null binding,
    batching) rides on the Derby test."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode("append")
    )
    if driver:
        writer = writer.option("driver", driver)
    if column_types:
        writer = writer.option(
            "createTableColumnTypes", column_types_clause(column_types, df.columns)
        )
    if num_partitions:
        writer = writer.option("numPartitions", str(num_partitions))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC source; with partition_column bounds, Spark issues
    range-partitioned parallel reads instead of one serial cursor."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return reader.load()


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — columnar alternative kept API-parallel to parquet;
    same pushdown/pruning behavior at scale (built-in `orc` source)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files
    sized for scan efficiency (~128 MB default — the usual HDFS/object
    -store sweet spot). Streaming sinks and incremental loads produce
    file counts that grow without bound; scan cost at 100 TB is driven
    by file count (listing, open, footer reads) as much as bytes.

    Sizes by the SOURCE's on-disk bytes (sum of data file sizes), not
    row counts, so compression ratio carries over. Returns the target
    file count. Writes to a new directory — object stores have no
    atomic rename; the swap is the caller's (or table format's) move.
    """
    import os

    total = 0
    for root, _dirs, files in os.walk(src_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(src_path)
    # coalesce, not repartition: merging files needs no shuffle
    df.coalesce(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file source for multimodal ingestion: each file becomes
    one row (path, modificationTime, length, content binary) — the
    standard landing shape for image/audio/video payloads before the
    mapInPandas decode stages (operators/multimodal.py).

    Scale notes: the source splits by FILE, so millions of small
    objects parallelize naturally but each file must fit in one task —
    cap individual payloads (spark.sql.sources.binaryFile.maxLength
    guards at 2 GiB) and compact tiny objects upstream. `glob` maps to
    pathGlobFilter so extension filtering happens during listing, not
    after read."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_csv_permissive(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """CSV scan that QUARANTINES malformed rows instead of failing the
    job or silently nulling fields: PERMISSIVE mode routes each
    unparseable line's raw text into `corrupt_col` (appended to the
    caller's schema here) while clean rows parse normally. The at-scale
    landing pattern: filter `corrupt_col IS NOT NULL` to a quarantine
    sink, proceed with the rest — one bad upstream export doesn't kill
    a 1000-executor load, and the bad bytes are preserved for triage.

    Note Spark only materializes the corrupt column for rows it
    actually fails to parse; count checks on it must follow a cache or
    a separate scan (Spark's documented CSV-parser caveat)."""
    full_schema = f"{schema}, {corrupt_col} STRING"
    return (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(full_schema)
        .csv(path)
    )


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with schema evolution: mergeSchema reconciles
    column sets across files written at different pipeline versions
    (added columns read as NULL for older files). Off by default in
    Spark because footer-merging costs at listing time — turn it on
    only for tables that actually evolve, then freeze the merged
    schema into the table definition."""
    return spark.read.option("mergeSchema", "true").parquet(path)
