"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed aggregations can't express — here a
per-key *running* aggregate that emits the cumulative value every
micro-batch (windowed aggs only emit per window; a streaming "lifetime
counter" needs user state).

Scale notes: state is one small tuple per key, maintained by the state
store; a processing-time timeout expires idle keys so state stays
bounded (the same discipline as watermark.py — unbounded state never
ships). The UDF is Arrow-batched per key group.

The builder returns a transformation usable under ``readStream`` (its
real home) and in batch tests via the shared foreachBatch harness.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
RUNNING_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Emits one row per key per micro-batch in which the key appears,
    carrying the lifetime-so-far totals. ``idle_timeout_ms`` expires a
    key's state after that much processing-time inactivity (emits
    nothing on expiry; the next event starts from zero).
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        update, RUNNING_OUTPUT, RUNNING_STATE, "update", timeout
    )
