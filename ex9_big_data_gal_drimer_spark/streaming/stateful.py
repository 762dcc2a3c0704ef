"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10: "applyInPandasWithState for custom stateful
operators").

running_user_totals: per-user running event count / value sum that
survives across micro-batches — the minimal custom-state shape
(anything Spark's built-in windowed aggs can't express starts here:
per-key counters, custom sessionization, pattern detection).

State is one (count, total) pair per user — bounded by key
cardinality; pair with a state TTL (GroupStateTimeout) for unbounded
key spaces in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("total_value", DoubleType())]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _make_update(ttl_ms: int | None):
    """Build the state-update fn; with a TTL, idle keys' state is
    dropped when the processing-time timeout fires (bounded state for
    unbounded key spaces — without it, one (count,total) pair per
    ever-seen user lives forever)."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # idle past TTL: evict; totals restart if the key returns
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return update


def running_user_totals(events: DataFrame, state_ttl_ms: int | None = None) -> DataFrame:
    """Streaming: per-user running totals with explicit state.  Batch
    frames fall back to a plain aggregation (same output).

    ``state_ttl_ms`` arms a processing-time timeout per key: users
    idle longer than the TTL have their state evicted (the production
    setting for unbounded key cardinality)."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(state_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
