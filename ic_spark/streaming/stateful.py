"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming surface (its scan is Bounded —
iceberg_file_task_scan.rs:93-98); this is part of the declared engine
extension (SURVEY.md §2.2): arbitrary per-key state machines over an
unbounded stream, with watermark-driven timeouts bounding state.

Operator: per-user running aggregate (event count, value sum, last
event time).  Each micro-batch updates the key's state; a key whose
watermark timeout fires emits a final row and clears state — the
pattern for sessionization, fraud counters, CDC reconciliation, etc.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        # Part of STATE, not recomputed per batch: a late-but-in-
        # watermark event would otherwise move the emitted "last event
        # time" BACKWARDS while the counters advance (r9 review find).
        # (Changing the state schema requires a fresh checkpoint, as
        # with any Structured Streaming state evolution.)
        StructField("last_ts", TimestampType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_user_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
):
    """Fold each micro-batch's rows for this user into running state."""
    (user_id,) = key
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if not pd.isna(batch_max):
            if hasattr(batch_max, "to_pydatetime"):
                batch_max = batch_max.to_pydatetime()
            last_ts = (
                batch_max if last_ts is None else max(last_ts, batch_max)
            )
    state.update((n, float(total), last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [round(total, 4)],
            "last_ts": [last_ts],
        }
    )


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running totals as a stateful stream transform.

    Emits the updated running total for every user seen in each
    micro-batch (update-style output).  State is per-user two numbers —
    bounded by cardinality of users, not event volume; combine with a
    ProcessingTime/EventTime timeout to expire idle keys at scale.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
