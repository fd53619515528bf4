"""Custom connector via the Python Data Source API (Spark 4,
`pyspark.sql.datasource`): a deterministic arithmetic event generator
with partitioned parallel reads, Arrow-batched output, and row-range
filter pushdown.

Why this exists: the reference's only "source" beyond files is an
out-of-band HTTP download glued on with driver-side code
(/root/reference/dags/wine_etl_kaggle.py:46-64 downloads Kaggle JSON
before any dataframe exists). The Spark-native shape for "a custom
place data comes from" is a DataSource plugin: schema declared up
front, `partitions()` so every executor reads its own slice in
parallel, `read()` yielding Arrow RecordBatches (vectorized, no
per-row Python), and `pushFilters()` so Catalyst-pushed predicates
prune work INSIDE the source — the same pushdown contract a parquet
scan honors, here reaching Python code (new in Spark 4.1).

Contents are closed-form (multiplicative hash of the row index), so a
SQL oracle can recompute every cell and hash-verify the connector end
to end: partition math, Arrow conversion, and pushdown pruning all
have to be value-exact, not just row-count-plausible.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

# Knuth multiplicative hash; mod 2^31 keeps every intermediate far
# inside int64 so the SQL oracle's BIGINT arithmetic is overflow-free.
MULT = 2654435761
MOD = 2_147_483_648

SCHEMA_DDL = "row_id bigint, user_id bigint, event_type string, value double"


@dataclass
class RangePartition(InputPartition):
    start: int
    end: int


class RangeEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_partitions = int(options.get("n_partitions", 8))
        # row-range after pushdown; starts as the whole table
        self.lo = 0
        self.hi = self.n_rows

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Narrow [lo, hi) from row_id comparisons; everything else is
        returned unsupported so Spark re-applies it post-scan. Bounds
        only ever SHRINK, so keeping a conjunct pushed AND letting
        Spark re-check it would be redundant, not wrong — the API
        contract is that returned filters are the ones the source
        does NOT handle."""
        unsupported = []
        for f in filters:
            ok = isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and f.attribute == ("row_id",)
            if not ok:
                unsupported.append(f)
                continue
            v = int(f.value)
            if isinstance(f, GreaterThan):
                self.lo = max(self.lo, v + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, v)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, v)
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, v + 1)
            else:  # EqualTo
                self.lo = max(self.lo, v)
                self.hi = min(self.hi, v + 1)
        return unsupported

    def partitions(self):
        span = max(self.hi - self.lo, 0)
        n = max(1, min(self.n_partitions, span))
        step = -(-span // n) if span else 1  # ceil
        return [
            RangePartition(lo, min(lo + step, self.hi))
            for lo in range(self.lo, self.hi, step)
        ] or [RangePartition(self.lo, self.lo)]

    def read(self, partition: RangePartition):
        # executor-side: vectorized numpy → one Arrow batch, zero
        # per-row Python
        import numpy as np
        import pyarrow as pa

        i = np.arange(partition.start, partition.end, dtype=np.int64)
        h = (i * MULT) % MOD
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(i),
                pa.array(h % 1000),
                pa.array(np.char.add("type_", (h % 5).astype("U1"))),
                pa.array((h % 10_000) / 100.0),
            ],
            names=["row_id", "user_id", "event_type", "value"],
        )


class RangeEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "range_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> RangeEventsReader:
        return RangeEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "RangeEventsStreamReader":
        return RangeEventsStreamReader(self.options)


class RangeEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same connector: offsets are row indices,
    each read() call returns the next `batch_size` rows as one
    micro-batch until `n_rows` is exhausted (then the offset stops
    advancing and the stream has no more available data).
    readBetweenOffsets replays any [start, end) deterministically —
    the exactly-once recovery contract — because rows are closed-form
    in the index, state-free by construction."""

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 10_000))
        self.batch_size = int(options.get("batch_size", self.n_rows))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        s = int(start["i"])
        e = min(s + self.batch_size, self.n_rows)
        return iter(self._rows(s, e)), {"i": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["i"]), int(end["i"])))

    @staticmethod
    def _rows(s: int, e: int) -> list[tuple]:
        # a LIST iterator, not a generator: Spark's prefetching cache
        # copy.copy()s the returned iterator, which generators reject
        return [
            (i, h % 1000, f"type_{h % 5}", (h % 10_000) / 100.0)
            for i in range(s, e)
            for h in ((i * MULT) % MOD,)
        ]


# ---------------------------------------------------------------------------
# Write side of the API: a manifest-committed JSONL table. The commit
# protocol is the part that matters at scale — object stores have no
# atomic directory rename, so "which files are part of the table" must
# be a single atomic manifest write, never a directory listing.
# Executors write uncommitted part files and return commit messages;
# only the driver's commit() publishes them into _MANIFEST; abort()
# deletes the orphans. Readers trust the manifest exclusively, so a
# crashed job's stragglers are invisible by construction.
# ---------------------------------------------------------------------------


@dataclass
class JsonlCommitMessage(WriterCommitMessage):
    path: str
    count: int


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> JsonlCommitMessage:
        # executor-side: one uncommitted part file per task
        import json
        import os
        import uuid

        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)
        fname = os.path.join(self.path, "data", f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return JsonlCommitMessage(path=fname, count=n)

    def commit(self, messages) -> None:
        # driver-side, runs once, after every task succeeded: publish
        # atomically via write-temp-then-rename of the manifest
        import json
        import os

        manifest = os.path.join(self.path, "_MANIFEST")
        entries = []
        if not self.overwrite and os.path.exists(manifest):
            with open(manifest) as f:
                entries = json.load(f)["files"]
        entries.extend(
            {"path": m.path, "count": m.count} for m in messages if m is not None
        )
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"files": entries}, f)
        os.replace(tmp, manifest)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


@dataclass
class JsonlFilePartition(InputPartition):
    path: str


class ManifestJsonlReader(DataSourceReader):
    def __init__(self, schema, options: dict) -> None:
        self.schema = schema
        self.path = options["path"]

    def partitions(self):
        import json
        import os

        manifest = os.path.join(self.path, "_MANIFEST")
        with open(manifest) as f:
            files = json.load(f)["files"]
        # one partition per COMMITTED file — stragglers in data/ that
        # never made the manifest are not part of the table
        return [JsonlFilePartition(e["path"]) for e in files]

    def read(self, partition: JsonlFilePartition):
        import json

        names = [f.name for f in self.schema.fields]
        with open(partition.path) as f:
            for line in f:
                d = json.loads(line)
                yield tuple(d.get(n) for n in names)


class ManifestJsonlDataSource(DataSource):
    """`manifest_jsonl` format: schema comes from the user
    (.schema(...) on read; the written frame on write)."""

    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def schema(self) -> str:
        raise NotImplementedError(
            "manifest_jsonl requires an explicit .schema(...) on read"
        )

    def reader(self, schema) -> ManifestJsonlReader:
        return ManifestJsonlReader(schema, self.options)

    def writer(self, schema, overwrite: bool) -> ManifestJsonlWriter:
        return ManifestJsonlWriter(self.options, overwrite)
