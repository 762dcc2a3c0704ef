"""Grouped-map time-series resampling (applyInPandas).

Aligning irregular event streams onto a regular time grid with
forward-fill is the canonical per-key custom operator: the per-group
logic (build a grid, as-of match the latest observation) is what a
data scientist writes in pandas, and `groupBy(key).applyInPandas`
runs exactly that function per key, distributed — one shuffle on the
key, Arrow-batched both ways, no row-at-a-time Python.

This is the third pandas-op tier in the engine, completing the set:
mapInPandas (stateless stream over batches — similarity.vectorized_topk,
multimodal feature extraction), applyInPandasWithState (streaming
stateful — streaming.stateful), and applyInPandas (batch grouped-map,
here).

Scale: state per task is one group's rows plus its grid — bounded by
the span/frequency ratio, not the corpus.  Skewed keys (one user with
a year of events) are the risk; AQE skew-split does not apply inside
a grouped-map, so pathological keys should be range-split upstream
(split the span, resample the pieces, concatenate — forward-fill only
needs one pre-boundary row carried over).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def resample_hourly_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key hourly grid from floor(min ts) to floor(max ts), each
    grid point carrying the value of the latest event at-or-before it
    (NULL before the first event — typically the first grid point).

    Determinism requires unique (key, ts) pairs (true for the events
    corpus, pinned in latest_event_per_user): with duplicate
    timestamps the as-of winner would be engine-dependent.

    The output schema is derived from the input: the key keeps its own
    type and ``filled_value`` keeps the value column's type (rather
    than hardcoding long/double, which would rely on silent Arrow
    coercion for any other input).  Only the grid column is fixed
    (timestamp_ntz, hourly).
    """
    in_schema = {f.name: f.dataType.simpleString() for f in events.schema.fields}
    out_schema = (
        f"{key_col} {in_schema[key_col]}, hour_ts timestamp_ntz, "
        f"filled_value {in_schema[value_col]}"
    )

    def fill(pdf):
        import pandas as pd

        pdf = pdf.sort_values(ts_col)
        # Arrow hands Spark's timestamp_ntz over as datetime64[us];
        # pandas merge_asof insists both keys share one unit.
        ts = pdf[ts_col].astype("datetime64[ns]")
        grid = pd.date_range(ts.min().floor("h"), ts.max().floor("h"), freq="h")
        obs = pd.DataFrame({"__ts": ts, "filled_value": pdf[value_col]})
        out = pd.merge_asof(
            pd.DataFrame({"hour_ts": grid}),
            obs,
            left_on="hour_ts",
            right_on="__ts",
            direction="backward",
        )
        out[key_col] = pdf[key_col].iloc[0]
        return out[[key_col, "hour_ts", "filled_value"]]

    # Explicit-count repartition on the key: the grouped-map stage is
    # CPU-bound Python, not bytes — left to AQE, the few-MB shuffle
    # coalesces to ONE post-shuffle partition and every group runs
    # serially in a single task (measured 8.5s vs ~1s at sf0.1).  An
    # explicit numPartitions is exempt from AQE coalescing, and the
    # grouped-map reuses the hash distribution, so no second exchange.
    par = events.sparkSession.sparkContext.defaultParallelism
    return (
        events.select(key_col, ts_col, value_col)
        .repartition(par, key_col)
        .groupBy(key_col)
        .applyInPandas(fill, out_schema)
    )
