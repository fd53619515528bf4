"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running anomaly detection: an event is anomalous when its
value exceeds `factor` × the running mean of that user's PRIOR events
(event-time order, ties by event_id). The running (count, sum) lives
in the state store keyed by user, so the decision is identical whether
the user's history arrived in one micro-batch or across many — that
cross-batch carry is exactly what the state store exists for.

Arrow-batched pandas per group (not per row); state is two scalars per
user. Output semantics are deterministic given event-time ordering, so
when the whole input is one batch the DuckDB oracle can verify it with
a window function — a stronger check than rows-only for a custom
stateful op.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, event_id long, value double, anomalous boolean"
STATE_SCHEMA = "cnt long, sm double"


def _flag_anomalies(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    factor: float,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    cnt, sm = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        flags = []
        for v in pdf["value"]:
            flags.append(cnt > 0 and v > factor * (sm / cnt))
            cnt += 1
            sm += float(v)
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": pdf["event_id"].to_numpy(),
                "value": pdf["value"].to_numpy(),
                "anomalous": flags,
            }
        )
    state.update((cnt, sm))


def running_anomalies(events: DataFrame, factor: float = 2.0) -> DataFrame:
    """events (streaming): ts, user_id, event_id, value →
    one flagged row per event, state carried per user across batches."""

    def fn(key, pdfs, state):
        return _flag_anomalies(key, pdfs, state, factor)

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Same operator on Spark 4's transformWithStateInPandas — the successor
# API: state lives in named, schema'd handles (value/list/map + timers)
# instead of one opaque tuple, so an operator can hold several state
# shapes and the store can evolve them independently.
#
# Environment gate: TWS runs a separate Python state-server worker
# that speaks protobuf; containers without google.protobuf can import
# and PLAN this operator but the stream crashes at start. It is
# therefore not a registered driver query here; its equivalence to the
# applyInPandasWithState twin is pinned by a test that skips where
# protobuf is absent (tests/test_streaming.py).
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningAnomalyProcessor(StatefulProcessor):
    """ValueState twin of `_flag_anomalies`: per-user running
    (count, sum) persisted across micro-batches; an event is anomalous
    when value > factor × mean of that user's PRIOR events. Output is
    row-for-row identical to the applyInPandasWithState path (pinned
    in tests), so the same DuckDB window-function oracle verifies
    both."""

    def __init__(self, factor: float = 2.0) -> None:
        self._factor = factor

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "cnt long, sm double")

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        cnt, sm = self._agg.get() if self._agg.exists() else (0, 0.0)
        for pdf in rows:
            pdf = pdf.sort_values(["ts", "event_id"])
            flags = []
            for v in pdf["value"]:
                flags.append(cnt > 0 and v > self._factor * (sm / cnt))
                cnt += 1
                sm += float(v)
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": pdf["event_id"].to_numpy(),
                    "value": pdf["value"].to_numpy(),
                    "anomalous": flags,
                }
            )
        self._agg.update((cnt, sm))

    def close(self) -> None:
        pass


def running_anomalies_tws(events: DataFrame, factor: float = 2.0) -> DataFrame:
    """events (streaming) → per-event anomaly flags via
    transformWithStateInPandas (timeMode="none": no watermark-driven
    state expiry; the state is two scalars per user, bounded by the
    user population exactly like the applyInPandasWithState twin)."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningAnomalyProcessor(factor),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
