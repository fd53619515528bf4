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
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
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
