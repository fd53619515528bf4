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
