"""Structured Streaming smoke tests (SURVEY.md §2.10 / phase 5).

The streaming transformations share column expressions with the
oracle-checked batch queries; these tests verify the streaming
machinery itself: the file source feeds them, watermarks/output modes
are accepted, and the streamed result equals the batch result once the
source is exhausted (availableNow trigger; complete output mode for
the window aggs — append mode correctly withholds windows the
watermark has not passed yet, which at end-of-stream is the tail).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.catalog import load_table
from ex9_big_data_gal_drimer_spark.streaming.windows import (
    dedup_within_watermark,
    read_events_stream,
    run_to_memory_sink,
    session_stats,
    tumbling_counts,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    return str(d)


def _run_and_fetch(spark, stream_df, name, mode="append"):
    q = run_to_memory_sink(stream_df, name, output_mode=mode)
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_tumbling_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    got = _run_and_fetch(
        spark, tumbling_counts(stream), "t_tumbling", mode="complete"
    ).collect()
    batch = tumbling_counts(load_table(spark, SF_DIR, "events")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))


def test_streaming_session_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = _run_and_fetch(
        spark, session_stats(stream), "t_session", mode="complete"
    ).collect()
    batch = session_stats(load_table(spark, SF_DIR, "events")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))


def test_streaming_dedup(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = _run_and_fetch(spark, dedup_within_watermark(stream), "t_dedup").count()
    batch = load_table(spark, SF_DIR, "events").dropDuplicates(["event_id"]).count()
    assert got == batch


def test_stream_stream_join_matches_batch(spark, events_dir):
    """Stream-stream interval join (watermarked both sides, bounded
    state) must emit exactly the batch range-join's pairs once the
    availableNow source drains."""
    from ex9_big_data_gal_drimer_spark.streaming.windows import (
        click_purchase_within,
    )

    stream = read_events_stream(spark, events_dir)
    got = _run_and_fetch(
        spark, click_purchase_within(stream), "t_ss_join", mode="append"
    ).collect()
    batch = click_purchase_within(load_table(spark, SF_DIR, "events")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(got) > 0


def test_stream_static_enrich_matches_batch(spark, events_dir):
    """Stream-static broadcast enrichment: stateless, no watermark
    needed, and row-for-row equal to the batch join."""
    from ex9_big_data_gal_drimer_spark.streaming.windows import (
        enrich_with_dimensions,
    )

    customer = load_table(spark, SF_DIR, "customer")
    nation = load_table(spark, SF_DIR, "nation")
    stream = read_events_stream(spark, events_dir)
    got = _run_and_fetch(
        spark,
        enrich_with_dimensions(stream, customer, nation).select(
            "event_id", "nation"
        ),
        "t_enrich",
    ).collect()
    batch = enrich_with_dimensions(
        load_table(spark, SF_DIR, "events"), customer, nation
    ).select("event_id", "nation").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(got) > 0


def test_stateful_ttl_smoke(spark, events_dir):
    """running_user_totals with a state TTL: the ProcessingTimeTimeout
    wiring must run end-to-end and, within one availableNow pass (no
    idle gaps), produce the same totals as the batch aggregation."""
    from ex9_big_data_gal_drimer_spark.streaming.stateful import (
        running_user_totals,
    )

    stream = read_events_stream(spark, events_dir)
    q = run_to_memory_sink(
        running_user_totals(stream, state_ttl_ms=60_000),
        "t_ttl_totals",
        output_mode="update",
    )
    q.awaitTermination(120)
    # update mode re-emits a key on every batch it appears in; the
    # LAST emission per user is the running total
    last: dict[int, tuple] = {}
    for row in spark.sql("SELECT * FROM t_ttl_totals").collect():
        last[row.user_id] = (row.n_events, row.total_value)
    batch = {
        r.user_id: (r.n_events, r.total_value)
        for r in running_user_totals(load_table(spark, SF_DIR, "events")).collect()
    }
    assert last == batch


def test_rocksdb_state_store(spark, events_dir):
    """The session-window aggregation must run (and match batch) on
    the RocksDB state store provider — the bounded-memory state
    backend a 100 TB streaming deployment uses instead of the default
    in-memory HDFS-backed provider."""
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key)
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        stream = read_events_stream(spark, events_dir)
        got = _run_and_fetch(
            spark, session_stats(stream), "t_rocksdb_session", mode="complete"
        ).collect()
        batch = session_stats(load_table(spark, SF_DIR, "events")).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    finally:
        spark.conf.set(key, saved)


def test_stream_outer_join_matched_and_horizon(spark, events_dir):
    """LEFT-OUTER stream-stream interval join: matched pairs must
    equal the batch left join's matched pairs exactly; null-padded
    rows may only appear once the watermark passes a click's whole
    join window, so (a) every streamed null row is a batch null row,
    and (b) within the conservative horizon (max_ts - watermark -
    bound - slack) streamed nulls are COMPLETE."""
    import datetime

    from ex9_big_data_gal_drimer_spark.streaming.windows import (
        click_purchase_outer,
    )

    stream = read_events_stream(spark, events_dir)
    got = _run_and_fetch(
        spark, click_purchase_outer(stream), "t_ss_outer", mode="append"
    ).collect()
    batch = click_purchase_outer(load_table(spark, SF_DIR, "events")).collect()

    matched_s = sorted(tuple(r) for r in got if r["purchase_ts"] is not None)
    matched_b = sorted(tuple(r) for r in batch if r["purchase_ts"] is not None)
    assert matched_s == matched_b and len(matched_s) > 0

    nulls_s = {tuple(r) for r in got if r["purchase_ts"] is None}
    nulls_b = {tuple(r) for r in batch if r["purchase_ts"] is None}
    assert nulls_s <= nulls_b
    max_ts = max(r["click_ts"] for r in batch)
    horizon = max_ts - datetime.timedelta(minutes=45)
    expected = {t for t in nulls_b if t[2] <= horizon}
    got_h = {t for t in nulls_s if t[2] <= horizon}
    assert got_h == expected


def test_transform_with_state_matches_batch(spark, events_dir):
    """transformWithStateInPandas (Spark-4 arbitrary state): after the
    availableNow source drains, each user's LAST emitted running
    (count, total, peak) row equals the batch aggregation.  Skipped
    where the API's protobuf dependency is absent (this container);
    the batch fallback is asserted either way."""
    from ex9_big_data_gal_drimer_spark.streaming.stateful import (
        running_user_stats_tws,
        tws_available,
    )

    batch_df = running_user_stats_tws(load_table(spark, SF_DIR, "events"))
    assert batch_df.columns == [
        "user_id", "n_events", "total_value", "peak_value",
    ]
    assert batch_df.count() > 0
    if not tws_available():
        pytest.skip("google.protobuf absent: transformWithState "
                    "driver worker cannot start in this container")

    stream = read_events_stream(spark, events_dir)
    got_df = _run_and_fetch(
        spark, running_user_stats_tws(stream), "t_tws", mode="update"
    )
    # update mode re-emits per batch; keep each user's final row
    # (max n_events is the last state).
    rows = got_df.collect()
    final: dict = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    got = {
        u: (r["n_events"], r["total_value"], r["peak_value"])
        for u, r in final.items()
    }
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"], r["peak_value"])
        for r in running_user_stats_tws(
            load_table(spark, SF_DIR, "events")
        ).collect()
    }
    assert got == batch and len(got) > 0


def test_watermark_drops_late_rows_and_accounts_for_them(spark, tmp_path):
    """Late-data accounting: rows older than the watermark horizon are
    DROPPED (not silently aggregated), and the drop is observable in
    the progress metrics (numRowsDroppedByWatermark) — the
    monitorability contract late-arriving data needs at scale.

    Three micro-batches (maxFilesPerTrigger=1): batch 0 establishes
    the watermark, batch 1 advances and COMMITS it (the late filter
    applies the committed watermark — rows arriving in the very batch
    after the one that raised it can still sneak in), batch 2 delivers
    events hours older.  The stale rows must not reach the result and
    must be counted as dropped."""
    import datetime as dt
    import time

    src = tmp_path / "late_src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_file(name, rows):
        spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp, value double"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))
        time.sleep(1.1)  # file source orders batches by mtime

    write_file(
        "a.parquet",
        [(1, "click", base + dt.timedelta(minutes=m), 1.0) for m in range(5)],
    )
    write_file("b.parquet", [(4, "click", base + dt.timedelta(minutes=6), 1.0)])
    write_file(
        "c.parquet",
        [
            (2, "click", base - dt.timedelta(hours=5), 1.0),
            (3, "click", base - dt.timedelta(hours=6), 1.0),
        ],
    )

    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("late_drop_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 2, f"expected 2 late rows dropped, saw {dropped}"
    got = spark.sql(
        "SELECT window.start AS start, n FROM late_drop_counts"
    ).collect()
    # only the 12:00 window was ever emitted; the stale rows
    # contributed nothing
    assert {r.start for r in got} == {dt.datetime(2024, 1, 1, 12, 0)}
    assert max(r.n for r in got) == 6
