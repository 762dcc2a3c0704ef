"""State Data Source (streaming/state_reader.py): checkpointed
streaming state read back as DataFrames, including point-in-time
reads across micro-batches."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.catalog import load_table
from ex9_big_data_gal_drimer_spark.streaming.state_reader import (
    read_operator_state,
    state_metadata,
)
from ex9_big_data_gal_drimer_spark.streaming.windows import read_events_stream

from conftest import SF_DIR


@pytest.fixture(scope="module")
def two_batch_state(spark, tmp_path_factory):
    """Run the same update-mode count aggregation over TWO
    micro-batches (a second copy of the events file lands between
    runs), sharing one checkpoint."""
    src = tmp_path_factory.mktemp("state_src")
    ckpt = str(tmp_path_factory.mktemp("state_ckpt"))

    def run_batch() -> None:
        agg = (
            read_events_stream(spark, str(src))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # memory sink cannot recover a checkpoint; a no-op foreachBatch
        # sink can, and state is all this fixture cares about
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(lambda batch_df, batch_id: batch_df.count())
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")
    run_batch()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "b.parquet")
    run_batch()
    return ckpt


def test_state_metadata_inventory(spark, two_batch_state):
    meta = state_metadata(spark, two_batch_state).collect()
    assert len(meta) == 1
    row = meta[0]
    assert row.operatorName == "stateStoreSave"
    assert row.minBatchId == 0 and row.maxBatchId == 1


def test_latest_state_matches_batch_twice(spark, two_batch_state):
    """After two identical file drops the state counts are exactly
    2× the batch counts — verified from the CHECKPOINT alone, with
    no running query."""
    # NB: the value struct carries the AGGREGATION BUFFER's field
    # name ("count"), not the query's output alias — state schemas are
    # physical, another thing this source makes visible
    state = {
        r.event_type: r["count"]
        for r in read_operator_state(spark, two_batch_state).collect()
    }
    batch = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert state == {k: 2 * v for k, v in batch.items()}


def test_point_in_time_state_read(spark, two_batch_state):
    """batchId pins the historical version: batch 0 holds the 1×
    counts, the latest holds 2× — state time travel."""
    v0 = {
        r.event_type: r["count"]
        for r in read_operator_state(
            spark, two_batch_state, batch_id=0
        ).collect()
    }
    v1 = {
        r.event_type: r["count"]
        for r in read_operator_state(spark, two_batch_state).collect()
    }
    assert set(v0) == set(v1)
    assert all(v1[k] == 2 * v0[k] for k in v0)


def test_unflattened_schema_is_key_value_structs(spark, two_batch_state):
    df = read_operator_state(spark, two_batch_state, flatten=False)
    names = [f.name for f in df.schema.fields]
    assert names[:2] == ["key", "value"]
    assert df.schema["key"].dataType.typeName() == "struct"


def test_registry_state_operator_inventory(spark):
    """The driver-visible batch twin (plans/queries_streaming_state):
    runs a checkpointed windowed agg, then inventories its state."""
    from ex9_big_data_gal_drimer_spark.plans import QUERIES

    rows = QUERIES["state_operator_inventory"](spark, SF_DIR).collect()
    assert len(rows) >= 1
    r = rows[0]
    assert r.operator_id == 0 and r.operator_name == "stateStoreSave"
    assert r.n_state_keys >= 0
    # memoized pipeline: second invocation must not re-run the stream
    rows2 = QUERIES["state_operator_inventory"](spark, SF_DIR).collect()
    assert [tuple(x) for x in rows2] == [tuple(x) for x in rows]


def test_registry_merge_sink_totals_equal_batch(spark):
    """The MERGE sink's maintained snapshot must equal the plain batch
    groupBy over the same events (its oracle contract)."""
    from ex9_big_data_gal_drimer_spark.plans import QUERIES

    got = {
        r.user_id: (r.total_value, r.n_events)
        for r in QUERIES["merge_sink_upsert_totals"](spark, SF_DIR).collect()
    }
    want = {
        r.user_id: (r.tv, r.n)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("tv"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
