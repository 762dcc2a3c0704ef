"""Grouped-map skew mitigation (operators/resample.py chunk_hours —
round-10 verdict ask #4): the range-split path must be row-identical
to the single-group path, including across chunk boundaries, on
event-less chunks (carry-only fill), and at boundary-exact
timestamps.  The headline test plants ONE user holding ~half the
events (the documented pathological shape) and asserts exact
equality.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ex9_big_data_gal_drimer_spark.operators.resample import (
    resample_hourly_ffill,
    resample_hourly_ffill_native,
)


def _write_events(tmp_path, rows):
    """rows: list of (user_id, ts, value)."""
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    path = tmp_path / "events.parquet"
    pq.write_table(table, str(path))
    return str(path)


def _collect(df):
    return sorted(
        ((r.user_id, r.hour_ts, r.filled_value) for r in df.collect()),
        key=lambda t: (t[0], t[1]),
    )


def test_native_equals_grouped_map(spark, tmp_path):
    """The relational twin (sequence grid + running last(ignorenulls)
    window — round-14, resample_user_hourly's plan) must be
    row-identical to the applyInPandas form, including NULL-value
    observations (forward-fill NULL, never a stale value), events
    exactly on the hour (inclusive as-of match), and grid points
    before the first observation (NULL fill).  Schema must match too
    (hour_ts stays timestamp_ntz)."""
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(50):  # irregular stride drifting over hours
        rows.append((1, base + dt.timedelta(minutes=97 * i), float(i)))
    rows.append((2, base + dt.timedelta(hours=1), 5.0))  # exactly on the hour
    rows.append((2, base + dt.timedelta(hours=3, minutes=30), None))  # NULL obs
    rows.append((2, base + dt.timedelta(hours=6, minutes=1), 7.0))
    rows.append((3, base + dt.timedelta(minutes=59), 1.0))  # single event
    _write_events(tmp_path, rows)
    ev = spark.read.parquet(str(tmp_path / "events.parquet"))

    pandas_form = resample_hourly_ffill(ev)
    native_form = resample_hourly_ffill_native(ev)
    assert native_form.schema == pandas_form.schema
    assert _collect(native_form) == _collect(pandas_form)


def test_chunked_equals_unsplit_on_planted_skew(spark, tmp_path):
    """One user holds ~half the events across a 3-week span; with
    chunk_hours=48 that key spreads over ~11 grouped-map tasks.  The
    chunked result must equal the single-group result row-for-row."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    # The whale: 240 events over 20 days (irregular 2h2m stride so
    # events drift across hour and chunk boundaries).
    for i in range(240):
        rows.append((1, base + dt.timedelta(minutes=122 * i), float(i)))
    # 24 normal users with ~10 events each inside the same window.
    for u in range(2, 26):
        for i in range(10):
            rows.append(
                (u, base + dt.timedelta(hours=7 * i + u, minutes=u), float(u * 100 + i))
            )
    _write_events(tmp_path, rows)
    ev = spark.read.parquet(str(tmp_path / "events.parquet"))

    plain = _collect(resample_hourly_ffill(ev))
    chunked = _collect(resample_hourly_ffill(ev, chunk_hours=48))
    assert len(plain) > 0
    assert chunked == plain


def test_chunked_fills_eventless_chunks_from_carry(spark, tmp_path):
    """Two events 10 days apart with chunk_hours=24: eight interior
    chunks hold NO events and must forward-fill entirely from the
    carried observation."""
    t0 = dt.datetime(2024, 5, 1, 6, 30)
    t1 = dt.datetime(2024, 5, 11, 6, 0)  # exactly on a grid hour
    _write_events(tmp_path, [(7, t0, 1.5), (7, t1, 9.5)])
    ev = spark.read.parquet(str(tmp_path / "events.parquet"))

    plain = _collect(resample_hourly_ffill(ev))
    chunked = _collect(resample_hourly_ffill(ev, chunk_hours=24))
    assert chunked == plain
    # Shape pin: one grid row per hour, first at floor(t0) — which
    # precedes the 06:30 first event, so it is NULL by the documented
    # before-first-event rule — last at floor(t1); every interior
    # point forward-fills 1.5 across the eight event-less chunks.
    assert len(chunked) == 241
    assert chunked[0] == (7, dt.datetime(2024, 5, 1, 6, 0), None)
    assert chunked[-1] == (7, dt.datetime(2024, 5, 11, 6, 0), 9.5)
    assert all(v == 1.5 for _, ts, v in chunked[1:-1])


def test_chunked_boundary_exact_timestamps(spark, tmp_path):
    """Events landing exactly ON a chunk-boundary hour belong to the
    opening chunk; the prior chunk's last grid point still fills from
    the older observation."""
    rows = [
        (3, dt.datetime(2024, 2, 1, 0, 0), 10.0),   # chunk 0 start
        (3, dt.datetime(2024, 2, 2, 0, 0), 20.0),   # exactly on the 24h boundary
        (3, dt.datetime(2024, 2, 2, 5, 0), 30.0),
    ]
    _write_events(tmp_path, rows)
    ev = spark.read.parquet(str(tmp_path / "events.parquet"))

    plain = _collect(resample_hourly_ffill(ev))
    chunked = _collect(resample_hourly_ffill(ev, chunk_hours=24))
    assert chunked == plain
    by_ts = {ts: v for _, ts, v in chunked}
    assert by_ts[dt.datetime(2024, 2, 1, 23, 0)] == 10.0  # last pre-boundary hour
    assert by_ts[dt.datetime(2024, 2, 2, 0, 0)] == 20.0   # boundary hour: new obs
    assert by_ts[dt.datetime(2024, 2, 2, 5, 0)] == 30.0


def test_chunked_rejects_nonpositive_chunk(spark, tmp_path):
    _write_events(tmp_path, [(1, dt.datetime(2024, 1, 1), 1.0)])
    ev = spark.read.parquet(str(tmp_path / "events.parquet"))
    with pytest.raises(ValueError, match="chunk_hours"):
        resample_hourly_ffill(ev, chunk_hours=0)


def _write_events_typed(tmp_path, rows, value_type):
    """rows: list of (user_id, ts, value_or_None) with an explicit
    Arrow value type (nullable)."""
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "value": pa.array([r[2] for r in rows], value_type),
        }
    )
    path = tmp_path / "events.parquet"
    pq.write_table(table, str(path))
    return str(path)


def test_chunked_null_value_carry_fills_null(spark, tmp_path):
    """Round-11 ADVICE repro: a chunk whose LATEST observation's value
    is genuinely NULL.  The old separate-column carry skipped the NULL
    value (last ignorenulls) while the carry timestamp advanced, so
    the next (event-less) chunk forward-filled a STALE non-NULL value.
    The struct carry must fill NULL, identical to the plain path."""
    rows = [
        (5, dt.datetime(2024, 3, 1, 1, 0), 10.0),
        (5, dt.datetime(2024, 3, 1, 20, 0), None),  # chunk 0's latest: NULL
        # chunk 1 (Mar 2) has no events; chunk 2 closes the span.
        (5, dt.datetime(2024, 3, 3, 4, 0), 30.0),
    ]
    _write_events_typed(tmp_path, rows, pa.float64())
    ev = spark.read.parquet(str(tmp_path / "events.parquet"))

    plain = _collect(resample_hourly_ffill(ev))
    chunked = _collect(resample_hourly_ffill(ev, chunk_hours=24))
    assert chunked == plain
    by_ts = {ts: v for _, ts, v in chunked}
    assert by_ts[dt.datetime(2024, 3, 1, 19, 0)] == 10.0
    # From the NULL observation until the next real one: NULL, not 10.0.
    assert by_ts[dt.datetime(2024, 3, 1, 20, 0)] is None
    assert by_ts[dt.datetime(2024, 3, 2, 12, 0)] is None   # event-less chunk
    assert by_ts[dt.datetime(2024, 3, 3, 3, 0)] is None
    assert by_ts[dt.datetime(2024, 3, 3, 4, 0)] == 30.0


def test_chunked_nullable_int_values(spark, tmp_path):
    """Round-11 ADVICE repro: nullable INTEGER value column.  The old
    to_numpy round-trip turned NULLs into NaN and crashed casting back
    to int; the Arrow take() path must keep the long type and emit
    true NULLs."""
    rows = [
        (9, dt.datetime(2024, 4, 1, 0, 30), 7),
        (9, dt.datetime(2024, 4, 1, 6, 30), None),
        (9, dt.datetime(2024, 4, 2, 3, 0), 42),  # exactly on a grid hour
    ]
    _write_events_typed(tmp_path, rows, pa.int64())
    ev = spark.read.parquet(str(tmp_path / "events.parquet"))

    chunked = resample_hourly_ffill(ev, chunk_hours=12)
    assert dict(chunked.dtypes)["filled_value"] == "bigint"
    by_ts = {r.hour_ts: r.filled_value for r in chunked.collect()}
    assert by_ts[dt.datetime(2024, 4, 1, 0, 0)] is None    # before first obs
    assert by_ts[dt.datetime(2024, 4, 1, 5, 0)] == 7
    assert by_ts[dt.datetime(2024, 4, 1, 7, 0)] is None    # NULL obs carried
    assert by_ts[dt.datetime(2024, 4, 2, 0, 0)] is None    # across the boundary
    assert by_ts[dt.datetime(2024, 4, 2, 3, 0)] == 42


def test_chunked_duplicate_ts_tiebreak_consistent(spark, tmp_path):
    """Round-11 ADVICE (low): with duplicate (key, ts) pairs the
    boundary carry must agree with the in-chunk fill.  Both now break
    ties on the VALUE (max), so the duplicate pair at 22:00 fills the
    same winner at 23:00 (in-chunk) and throughout the next, event-less
    chunk (carry)."""
    rows = [
        (4, dt.datetime(2024, 6, 1, 22, 0), 1.0),
        (4, dt.datetime(2024, 6, 1, 22, 0), 2.0),  # duplicate ts, larger value
        (4, dt.datetime(2024, 6, 3, 1, 0), 9.0),
    ]
    _write_events(tmp_path, rows)
    ev = spark.read.parquet(str(tmp_path / "events.parquet"))

    chunked = _collect(resample_hourly_ffill(ev, chunk_hours=24))
    by_ts = {ts: v for _, ts, v in chunked}
    in_chunk = by_ts[dt.datetime(2024, 6, 1, 23, 0)]
    carried = by_ts[dt.datetime(2024, 6, 2, 12, 0)]
    assert in_chunk == carried == 2.0
