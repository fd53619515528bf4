"""Structured Streaming pipelines over the `events` table.

Source: the file stream source (`readStream.parquet`) pointed at the
testdata dir with a glob for `events.parquet` — on a cluster this is
the standard landing-directory pattern (new files appear, each
becomes a micro-batch; `maxFilesPerTrigger` bounds batch size).
`events.ts` has shipped as both int64 TIMESTAMP(NANOS) and plain µs
TIMESTAMP_NTZ across driver rounds, so the stream probes the footer
for the ACTUAL raw schema and normalizes exactly like the batch-side
catalog (catalog.normalize_event_ts); run_to_memory keeps
`spark.sql.legacy.parquet.nanosAsLong` set during execution so the
nanos variant still scans.

Pipelines (each has a batch twin in plans/streaming_twins.py that the
DuckDB oracle verifies; the streaming runs themselves execute with
trigger(availableNow=True) into a memory sink):

- tumbling_counts:  1 h tumbling window × event_type, count + sum
- sliding_counts:   1 h window sliding every 30 min
- session_stats:    30-min-gap session windows per user
- distinct_user_event: streaming dedup via dropDuplicatesWithinWatermark

State & scale: windowed aggs keep per-window state bounded by the
watermark (10 min lateness); session windows merge in-state; dedup
state is keyed and watermark-expired. All state is in the state
store, partitioned by key — no driver accumulation.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_sink_counter = itertools.count()


_events_schema_cache: dict[tuple, object] = {}


def _events_raw_schema(spark: SparkSession, sf_dir: str):
    """Probe the events parquet footer for its ACTUAL raw schema —
    `ts` has shipped as both int64 nanos and µs TIMESTAMP_NTZ across
    driver rounds, and a file stream's fixed schema must match the
    file's physical type or the scan nulls/rejects the column.
    Memoized per (path, mtime, size) so the probe isn't re-run on
    every stream definition (measurable in the bench's streaming
    query) but a REGENERATED file — the test driver rewrites the
    parquet, possibly with a different ts physical type, between
    rounds — invalidates the entry instead of serving a stale schema
    that would null or reject the ts column."""
    import os

    path = os.path.join(sf_dir, "events.parquet")
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    if key in _events_schema_cache:
        return _events_schema_cache[key]
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(path).schema
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    _events_schema_cache[key] = schema
    return schema


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    from whisky_wine_etl_spark.catalog import normalize_event_ts

    reader = spark.readStream.schema(_events_raw_schema(spark, sf_dir)).option(
        "pathGlobFilter", "events.parquet"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return normalize_event_ts(reader.parquet(sf_dir))


def file_events_stream(
    spark: SparkSession, directory: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Stream micro-batch-style from a landing directory of parquet
    files with ordinary µs timestamps (used by the late-data tests)."""
    reader = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(directory)


def multibatch_landing(spark: SparkSession, sf_dir: str, n_files: int = 3) -> str:
    """Split the events table into `n_files` time-range-partitioned
    parquet files in a landing dir, mtime-staggered so the file stream
    source (which orders by modification time) processes them oldest
    time range first. With maxFilesPerTrigger=1 each file becomes its
    own micro-batch: state (windows, watermark) must carry across
    batches, which is exactly what single-batch runs can't exercise.

    Range partitioning by ts means max(ts in batch k) <= min(ts in
    batch k+1): no row ever arrives behind the watermark, so nothing
    is dropped and the multi-batch append-mode result stays exactly
    oracle-computable (see stream_tumbling_multibatch)."""
    import glob
    import hashlib
    import os
    import tempfile

    # keyed by (sf_dir, THIS session's app id): stable within a run so
    # repeat calls reuse the same landing dir, but disjoint across
    # concurrent suites on the same sf_dir — without the app id, one
    # suite's overwrite could race another's file-stream listing
    dest = os.path.join(
        tempfile.gettempdir(),
        "sg_multibatch_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        + "_"
        + hashlib.md5(spark.sparkContext.applicationId.encode()).hexdigest()[:10],
    )
    from whisky_wine_etl_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    ev.repartitionByRange(n_files, "ts").write.mode("overwrite").parquet(dest)
    # part file names sort in range order; pin mtimes a minute apart so
    # the source's (mtime, path) ordering is unambiguous
    base = 1_700_000_000
    for i, path in enumerate(sorted(glob.glob(os.path.join(dest, "part-*.parquet")))):
        os.utime(path, (base + 60 * i, base + 60 * i))
    return dest


def embeddings_landing(spark: SparkSession, sf_dir: str, n_files: int = 3) -> str:
    """Split the embeddings table into `n_files` id-range-partitioned
    parquet files in a landing dir — the MODEL-SERVING landing pattern
    (stream_kmeans_assign, plans/round11a.py): a model is fit on the
    static history and NEW vectors arrive as a stream to be scored.
    Same app-id-keyed dir + mtime-stagger contract as
    multibatch_landing (each file becomes its own micro-batch under
    maxFilesPerTrigger=1)."""
    import glob
    import hashlib
    import os
    import tempfile

    dest = os.path.join(
        tempfile.gettempdir(),
        "sg_emblanding_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        + "_"
        + hashlib.md5(spark.sparkContext.applicationId.encode()).hexdigest()[:10],
    )
    from whisky_wine_etl_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb.repartitionByRange(n_files, "vec_id").write.mode("overwrite").parquet(dest)
    base = 1_700_000_000
    for i, path in enumerate(sorted(glob.glob(os.path.join(dest, "part-*.parquet")))):
        os.utime(path, (base + 60 * i, base + 60 * i))
    return dest


def embeddings_file_stream(
    spark: SparkSession, directory: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an embeddings landing dir."""
    reader = spark.readStream.schema("vec_id long, embedding array<float>")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(directory)


def multibatch_landing_with_sentinel(
    spark: SparkSession, sf_dir: str, n_files: int = 3
) -> str:
    """multibatch_landing plus one far-future SENTINEL file (one
    signup + one purchase at 2099-01-01, user_id = −1), mtime-last so
    it forms the final micro-batch. Processing it advances BOTH
    streams' watermarks decades past the real data, which makes the
    stream-stream OUTER join flush every still-unmatched real row
    from state — without it, unmatched rows younger than
    (final watermark − horizon) would be silently withheld and the
    result would not equal the batch left join. Consumers must drop
    user_id < 0 rows."""
    import glob
    import hashlib
    import os
    import tempfile

    src = multibatch_landing(spark, sf_dir, n_files=n_files)
    dest = os.path.join(
        tempfile.gettempdir(),
        "sg_multibatch_sent_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        + "_"
        + hashlib.md5(spark.sparkContext.applicationId.encode()).hexdigest()[:10],
    )
    if not os.path.isdir(dest) or not glob.glob(os.path.join(dest, "part-*.parquet")):
        import shutil

        shutil.rmtree(dest, ignore_errors=True)
        os.makedirs(dest)
        files = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
        for f in files:
            shutil.copy2(f, os.path.join(dest, os.path.basename(f)))
        sent = spark.createDataFrame(
            [
                (-1, "2099-01-01 00:00:00", -1, "signup", 0.0),
                (-2, "2099-01-01 00:00:01", -1, "purchase", 0.0),
            ],
            "event_id long, ts_s string, user_id long, event_type string, value double",
        ).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id", "event_type", "value",
        )
        sent.coalesce(1).write.mode("overwrite").parquet(dest + "_tmp")
        [sf] = glob.glob(os.path.join(dest + "_tmp", "part-*.parquet"))
        sent_path = os.path.join(dest, "part-zz-sentinel.parquet")
        shutil.move(sf, sent_path)
        shutil.rmtree(dest + "_tmp", ignore_errors=True)
        # keep the copied files' staggered mtimes; pin the sentinel last
        base = 1_700_000_000
        os.utime(sent_path, (base + 3600, base + 3600))
    return dest


def stream_stream_left_outer(events: DataFrame, horizon_sec: int = 3600) -> DataFrame:
    """Stream-stream LEFT OUTER join: every signup emits — joined to
    each purchase by the same user within `horizon_sec`, or once with
    NULLs if no purchase ever arrives in the horizon. Same
    state-bounding contract as the inner form (watermarks both sides
    + time-range condition), plus the outer-specific rule: an
    unmatched signup is emitted only when the watermark passes
    signup_ts + horizon — proof no matching purchase can still
    arrive. That makes NULL rows exactly as final as matches, so
    append mode stays correct; it also means results for the newest
    signups are withheld until the watermark clears them (the
    sentinel batch in multibatch_landing_with_sentinel)."""
    s = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"),
        F.col("user_id"),
        F.col("ts").alias("signup_ts"),
    ).withWatermark("signup_ts", "10 minutes")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", "10 minutes")
    j = s.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (
            F.col("purchase_ts")
            < F.col("signup_ts") + F.expr(f"INTERVAL {horizon_sec} SECONDS")
        ),
        "leftOuter",
    )
    return j.select(
        "signup_event_id",
        "user_id",
        (F.col("purchase_ts").cast("long") - F.col("signup_ts").cast("long")).alias(
            "dt_sec"
        ),
        F.round("purchase_value", 4).alias("purchase_value"),
    )


def stream_stream_full_outer(events: DataFrame, horizon_sec: int = 3600) -> DataFrame:
    """Stream-stream FULL OUTER join: every signup AND every purchase
    emits exactly once — as a matched pair when a same-user purchase
    lands within `horizon_sec` of the signup, else NULL-padded from
    whichever side stays unmatched. Distinct from the left-outer form
    (stream_stream_left_outer) in the second eviction rule: an
    unmatched PURCHASE is also state, emitted only when the watermark
    proves no late signup can still open a horizon containing it
    (the condition bounds signup_ts ∈ (purchase_ts − horizon,
    purchase_ts], so purchase-side state is droppable once the signup
    watermark passes purchase_ts). Both NULL rows are proofs, so
    append mode stays exact; the far-future sentinel batch flushes
    BOTH sides' tails. State is bounded by watermark + horizon on
    each side — at 100 TB that is the property that lets two
    unbounded firehoses join with O(horizon · rate) memory."""
    s = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"),
        F.col("user_id"),
        F.col("ts").alias("signup_ts"),
    ).withWatermark("signup_ts", "10 minutes")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", "10 minutes")
    j = s.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (
            F.col("purchase_ts")
            < F.col("signup_ts") + F.expr(f"INTERVAL {horizon_sec} SECONDS")
        ),
        "fullOuter",
    )
    return j.select(
        "signup_event_id",
        "purchase_event_id",
        F.coalesce("user_id", "p_user_id").alias("user_id"),
        (F.col("purchase_ts").cast("long") - F.col("signup_ts").cast("long")).alias(
            "dt_sec"
        ),
        F.floor(F.col("purchase_value") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("value_4dp"),
    )


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window.start").alias("wstart"),
            F.col("window.end").alias("wend"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window.start").alias("wstart"),
            F.col("window.end").alias("wend"),
            "n",
            "sum_value",
        )
    )


def session_stats(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def distinct_user_event(events: DataFrame, watermark: str = "90 days") -> DataFrame:
    """Streaming dedup: first occurrence of each (user_id, event_type).
    Key-only projection keeps the output deterministic regardless of
    arrival order; the generous watermark bounds state while covering
    the whole test window."""
    return (
        events.select("user_id", "event_type", "ts")
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


def enrich_with_segment(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a customer
    dimension (user_id → market segment) and aggregate per (segment,
    event_type). The static side is planned per micro-batch — Spark
    re-resolves it each trigger, so a slowly-refreshed dim view works
    without restarting the query; being small it broadcasts, so the
    stream side never shuffles for the join.

    Windowless streaming aggregation → run in complete mode."""
    d = dim.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        events.join(F.broadcast(d), "user_id", "left")
        .withColumn("segment", F.coalesce("segment", F.lit("unknown")))
        .groupBy("segment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def stream_stream_attribution(events: DataFrame, horizon_sec: int = 3600) -> DataFrame:
    """Stream-stream inner join: purchases attributed to the same
    user's signup within `horizon_sec`. BOTH sides are unbounded, so
    correctness requires (a) watermarks on both streams and (b) a
    time-range join condition — together they bound how long either
    side's rows stay in state: a signup can be dropped once the
    watermark passes signup_ts + horizon, a purchase once its own
    event time passes. Without the range condition state grows forever
    and Spark rejects the query in append mode.

    Emits one row per (signup, purchase) match — append-mode safe
    (matches are final once emitted). The batch twin/oracle is the
    plain theta join."""
    s = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"),
        F.col("user_id"),
        F.col("ts").alias("signup_ts"),
    ).withWatermark("signup_ts", "10 minutes")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", "10 minutes")
    j = s.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (F.col("purchase_ts") < F.col("signup_ts") + F.expr(f"INTERVAL {horizon_sec} SECONDS")),
        "inner",
    )
    return j.select(
        "signup_event_id",
        "user_id",
        (F.col("purchase_ts").cast("long") - F.col("signup_ts").cast("long")).alias("dt_sec"),
        F.round("purchase_value", 4).alias("purchase_value"),
    )


def run_foreach_batch_max_upsert(
    spark: SparkSession,
    stream_df: DataFrame,
    target_path: str,
    keys: list[str],
    value_col: str = "value",
) -> None:
    """foreachBatch sink: maintain a keyed table of the MAX value seen
    per key, reduce-merged into a parquet target each micro-batch —
    the standard "streaming upsert into a store the engine can't MERGE
    into" pattern.

    Each batch is reduced to one row per key before the merge
    (map-side agg), so the merge join is bounded by distinct keys, not
    batch rows. The merge itself is union + groupBy-max — NOT the SCD1
    upsert operator, whose source-WINS coalesce semantics would let a
    later batch's smaller value overwrite the running max; a
    reduction-merge must combine with the aggregate's own function.
    max() is commutative/associative, so the final table is identical
    no matter how the stream was micro-batched — asserted in tests
    against the batch groupBy twin.

    Durability: state is kept in VERSIONED parquet dirs
    (`{target_path}_versions/v{batch_id}`), never overwriting the dir
    being read — the read-then-overwrite-same-path pattern loses the
    whole table if an executor recomputes after the dir is cleared.
    "First batch" is decided by an explicit filesystem check for a
    committed (_SUCCESS-marked) earlier version — any actual read
    error fails the batch loudly instead of silently restarting state
    from the current partial. A retried batch id merges over the last
    version BELOW it, so retries are idempotent. After the stream
    drains, the latest version is published to `target_path`. At scale
    this is where a transactional table format (Delta/Iceberg MERGE)
    slots in; this is the plain-parquet equivalent.
    """
    versions_dir = target_path + "_versions"

    def _hadoop(sess: SparkSession, path: str):
        jvm = sess._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        return jvm, jpath, jpath.getFileSystem(sess._jsc.hadoopConfiguration())

    def _latest_version(sess: SparkSession, below: int | None = None) -> int | None:
        """Highest committed version id (< below if given), via an
        explicit existence check — NOT exception-driven."""
        jvm, vroot, fs = _hadoop(sess, versions_dir)
        if not fs.exists(vroot):
            return None
        ids = []
        for st in fs.listStatus(vroot):
            name = st.getPath().getName()
            if not name.startswith("v"):
                continue
            vid = int(name[1:])
            if below is not None and vid >= below:
                continue
            if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{versions_dir}/{name}/_SUCCESS")):
                ids.append(vid)
        return max(ids) if ids else None

    def handle(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession
        partial = batch.groupBy(*keys).agg(F.max(value_col).alias(value_col))
        prev = _latest_version(sess, below=batch_id)
        if prev is None:
            merged = partial
        else:
            # a read failure here is a real error and fails the batch
            target = sess.read.parquet(f"{versions_dir}/v{prev}")
            merged = (
                target.unionByName(partial)
                .groupBy(*keys)
                .agg(F.max(value_col).alias(value_col))
            )
        merged.write.mode("overwrite").parquet(f"{versions_dir}/v{batch_id}")

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .option("checkpointLocation", target_path + "_chk")
        .start()
    )
    q.awaitTermination()
    q.stop()
    final = _latest_version(spark)
    if final is not None:
        # publish: source and destination are different dirs, so the
        # copy never reads the path it is clearing
        spark.read.parquet(f"{versions_dir}/v{final}").write.mode("overwrite").parquet(
            target_path
        )


def _ephemeral_checkpoint_dir(spark: SparkSession, sink: str) -> str | None:
    """Per-query checkpoint dir on the RAM disk, if one exists.

    An availableNow verification run writes hundreds of tiny offset/
    commit/state files and then throws the checkpoint away — on this
    box /tmp is ext4 and that file churn IS the streaming floor
    (measured at sf0.1/local[32]: the 8 hottest stream queries drop
    30.4 s -> 22.0 s, pyds_stream_range alone 5.7 -> 2.1 s, when the
    checkpoint moves to tmpfs). A real deployment points its RESUMABLE
    queries at durable storage — this path is only for run-to-
    completion-and-discard execution, which is why queries that prove
    resume semantics (stream_checkpoint_resume, foreachBatch upsert)
    pass their own explicit durable location and never come through
    here.

    Guards (ADVICE r6): tmpfs is typically capped at ~50% RAM, so fall
    back to the default temp checkpoint when the RAM disk has < 256
    MiB free rather than fail a larger-SF or concurrent run with
    ENOSPC; and prune sg_chk_* dirs left by hard-killed runs (they
    otherwise sit in RAM until reboot). Staleness is age-based (> 1 h
    untouched), NOT ownership-based: a concurrent live session's dir
    must survive, and an availableNow checkpoint that has gone an
    hour without a write is certainly dead. Liveness is the NEWEST
    mtime anywhere under the dir (ADVICE r7): streaming commits land
    in nested <sink>/offsets|commits files that never refresh the top
    directory's mtime, so judging by the top dir alone would rmtree a
    long-lived concurrent run's checkpoint mid-query."""
    import os
    import shutil
    import time

    base = os.environ.get("SPARK_GRAFT_STREAM_CHK_BASE", "/dev/shm")
    if not os.path.isdir(base) or not os.access(base, os.W_OK):
        return None
    app = spark.sparkContext.applicationId

    def _touched_since(root: str, cutoff: float) -> bool:
        """True as soon as ANY entry under root is newer than cutoff —
        a live checkpoint has fresh offset/commit files near the top,
        so the common (live) case returns after a handful of stats
        instead of walking hundreds of state-store files."""
        if os.path.getmtime(root) >= cutoff:
            return True
        for dirpath, dirnames, filenames in os.walk(root):
            for entry in dirnames + filenames:
                try:
                    if os.path.getmtime(os.path.join(dirpath, entry)) >= cutoff:
                        return True
                except OSError:
                    continue  # file vanished mid-walk (live query)
        return False

    try:
        cutoff = time.time() - 3600
        for d in os.listdir(base):
            p = os.path.join(base, d)
            if (
                d.startswith("sg_chk_")
                and d != f"sg_chk_{app}"
                and not _touched_since(p, cutoff)
            ):
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    try:
        if shutil.disk_usage(base).free < 256 * 1024 * 1024:
            return None
    except OSError:
        return None
    return os.path.join(base, f"sg_chk_{app}", sink)


def run_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    output_mode: str,
    name: str | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into
    a memory sink and return the sink as a batch DataFrame."""
    sink = name or f"stream_sink_{next(_sink_counter)}"
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # State-store count is fixed by shuffle.partitions at the query's
    # first run, and each store pays per-micro-batch instantiation +
    # commit overhead, so the right number tracks STATE SIZE, not core
    # count: at test SF the whole state is kilobytes and 8 stores beat
    # 32 by >3x on the stream-stream joins (measured: 18.9s -> 5.6s at
    # sf0.1); a 100 TB deployment raises SPARK_GRAFT_STREAM_SHUFFLE so
    # each store's state still fits an executor. Results are exact
    # aggregations/joins — partition count never changes their values.
    import os as _os

    state_parts = int(_os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8"))
    if int(prev_shuffle) > state_parts:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_parts))
    chk = _ephemeral_checkpoint_dir(spark, sink)
    try:
        writer = (
            stream_df.writeStream.format("memory")
            .queryName(sink)
            .outputMode(output_mode)
            .trigger(availableNow=True)
        )
        if chk is not None:
            writer = writer.option("checkpointLocation", chk)
        q = writer.start()
        q.awaitTermination()
        q.stop()
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        if chk is not None:
            import contextlib
            import os
            import shutil

            shutil.rmtree(chk, ignore_errors=True)
            with contextlib.suppress(OSError):  # non-empty: other query live
                os.rmdir(os.path.dirname(chk))
    return spark.table(sink)
