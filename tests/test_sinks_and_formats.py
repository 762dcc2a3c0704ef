"""foreachBatch sink + JSONL/ORC format round-trips.

The sink test drives the full streaming path: file source → windowed
aggregation → foreachBatch partitioned-parquet sink → batch read-back
equal to the batch aggregation.  The format tests pin that a
write/read round-trip through each format is lossless for the
testdata schemas (timestamps included).
"""

from __future__ import annotations

import shutil

import pytest

from ex9_big_data_gal_drimer_spark.catalog import load_table
from ex9_big_data_gal_drimer_spark.sources.formats import (
    read_jsonl,
    read_orc,
    write_jsonl,
    write_orc,
)
from ex9_big_data_gal_drimer_spark.streaming.sinks import (
    read_batch_partitioned,
    stream_to_partitioned_parquet,
)
from ex9_big_data_gal_drimer_spark.streaming.windows import (
    read_events_stream,
    tumbling_counts,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_sink_src")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    return str(d)


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_foreachbatch_sink_roundtrip(spark, events_dir, tmp_path):
    """Stream → tumbling agg → foreachBatch parquet sink; reading the
    sink back yields exactly the batch aggregation (complete-mode
    totals arrive because availableNow drains the source)."""
    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")
    stream = read_events_stream(spark, events_dir)
    # complete mode: every trigger re-emits full totals; with a single
    # availableNow pass the one batch written IS the final answer.
    agg = tumbling_counts(stream)
    q = (
        agg.writeStream.foreachBatch(
            lambda batch_df, batch_id: batch_df.write.mode("overwrite").parquet(
                f"{out}/_batch_id={batch_id}"
            )
        )
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = read_batch_partitioned(spark, out)
    batch = tumbling_counts(load_table(spark, SF_DIR, "events"))
    assert _sorted_rows(got) == _sorted_rows(batch)


def test_foreachbatch_append_sink(spark, events_dir, tmp_path):
    """Append-mode raw passthrough through stream_to_partitioned_parquet:
    every source row lands in the sink exactly once."""
    out = str(tmp_path / "raw_out")
    ckpt = str(tmp_path / "raw_ckpt")
    stream = read_events_stream(spark, events_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    q = stream_to_partitioned_parquet(stream, out, ckpt)
    q.awaitTermination(120)

    got = read_batch_partitioned(spark, out)
    batch = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    assert got.count() == batch.count()
    assert _sorted_rows(got.select("event_id")) == _sorted_rows(
        batch.select("event_id")
    )


def test_jsonl_roundtrip_events(spark, tmp_path):
    """JSONL write → schema-explicit read is lossless for the events
    table (timestamps survive the ISO-8601 round-trip)."""
    events = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_jsonl")
    write_jsonl(events, path)
    back = read_jsonl(spark, path, events.schema)
    assert back.schema == events.schema
    assert _sorted_rows(back) == _sorted_rows(events)


def test_orc_roundtrip_orders(spark, tmp_path):
    """ORC write → read is lossless for orders, and the ORC scan gets
    the same Catalyst treatment as parquet: pushed filters + pruned
    read schema."""
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert _sorted_rows(back) == _sorted_rows(orders)

    pruned = back.filter(back.o_orderstatus == "F").select("o_orderkey")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" in plan  # filter reached the scan
    # pruned read schema: only the two referenced columns are read
    scan_line = next(l for l in plan.splitlines() if "FileScan orc" in l)
    assert "o_totalprice" not in scan_line


def test_stream_merge_upsert_sink_accumulates_and_skips_replays(spark, tmp_path):
    """foreachBatch MERGE sink: two micro-batches accumulate into one
    keys-sized snapshot equal to the batch aggregate of all input;
    re-running the stream against a FRESH checkpoint (same batch ids
    re-delivered) must leave the state byte-identical — the
    _applied_batch marker makes merge-accumulate idempotent under
    at-least-once delivery."""
    import shutil

    from pyspark.sql import functions as F

    from ex9_big_data_gal_drimer_spark.catalog import load_table
    from ex9_big_data_gal_drimer_spark.streaming.sinks import (
        read_merge_state,
        stream_merge_upsert_sink,
    )
    from ex9_big_data_gal_drimer_spark.streaming.windows import (
        read_events_stream,
    )

    from conftest import SF_DIR

    src = tmp_path / "events_src"
    src.mkdir()
    # Two source files -> two micro-batches (maxFilesPerTrigger=1);
    # the duplicate file doubles every key's partials, exercising the
    # matched-accumulate branch for every key in batch 2.
    shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "b.parquet")
    state = str(tmp_path / "state")

    q = stream_merge_upsert_sink(
        read_events_stream(spark, str(src)), state, str(tmp_path / "ckpt1")
    )
    q.awaitTermination(120)

    got = {
        r["user_id"]: (round(r["total_value"], 6), r["n_events"])
        for r in read_merge_state(spark, state).collect()
    }
    expect = {
        r["user_id"]: (round(2 * r["tv"], 6), 2 * r["ne"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("tv"), F.count(F.lit(1)).alias("ne"))
        .collect()
    }
    assert got == expect and len(got) > 0

    # Replay: fresh checkpoint re-delivers batches 0 and 1 with the
    # same ids; the marker must skip both.
    q2 = stream_merge_upsert_sink(
        read_events_stream(spark, str(src)), state, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    again = {
        r["user_id"]: (round(r["total_value"], 6), r["n_events"])
        for r in read_merge_state(spark, state).collect()
    }
    assert again == got


def test_stream_merge_sink_recovers_parked_snapshot(spark, tmp_path):
    """Crash-window recovery: a death between the two directory
    renames leaves the snapshot parked at _old_batch_* with no data
    dir.  The next run must restore it BEFORE evaluating the
    redelivered batches — the marker inside the restored snapshot
    then skips them, leaving state byte-identical."""
    import os
    import shutil

    from ex9_big_data_gal_drimer_spark.streaming.sinks import (
        read_merge_state,
        stream_merge_upsert_sink,
    )
    from ex9_big_data_gal_drimer_spark.streaming.windows import (
        read_events_stream,
    )

    from conftest import SF_DIR

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")
    state = str(tmp_path / "state")

    q = stream_merge_upsert_sink(
        read_events_stream(spark, str(src)), state, str(tmp_path / "ck1")
    )
    q.awaitTermination(120)
    before = sorted(map(tuple, read_merge_state(spark, state).collect()))

    # Simulate the mid-swap crash: previous snapshot parked, no data.
    os.rename(os.path.join(state, "data"), os.path.join(state, "_old_batch_7"))

    q2 = stream_merge_upsert_sink(
        read_events_stream(spark, str(src)), state, str(tmp_path / "ck2")
    )
    q2.awaitTermination(120)
    after = sorted(map(tuple, read_merge_state(spark, state).collect()))
    assert after == before and len(after) > 0
    assert not os.path.exists(os.path.join(state, "_old_batch_7"))


def test_xml_roundtrip_orders(spark, tmp_path):
    """XML (Spark-4 built-in) write → schema-explicit read is lossless
    for orders, timestamps included."""
    from ex9_big_data_gal_drimer_spark.sources.formats import (
        read_xml,
        write_xml,
    )

    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_xml")
    write_xml(orders, path, row_tag="order")
    back = read_xml(spark, path, orders.schema, row_tag="order")
    assert back.schema == orders.schema
    assert _sorted_rows(back) == _sorted_rows(orders)
