"""Streaming state as a queryable table — the State Data Source
(Spark 4 ``statestore`` / ``state-metadata`` formats).

Running stateful pipelines accumulate opaque per-key state under the
checkpoint; when a 100 TB deployment misbehaves ("why is this key's
aggregate wrong?", "how big is the state really?") the options used
to be printf or state-store surgery.  The state data source turns
the checkpoint into DataFrames instead:

- ``state_metadata``: one row per stateful operator — name, store,
  partition count, batch-id range — the map of WHAT state exists;
- ``read_operator_state``: the keys and values themselves, readable
  at any retained batch id (point-in-time debugging of state
  evolution between micro-batches).

Both are plain batch scans over checkpoint files: no running query
is needed, nothing is locked, and the scan parallelizes over state
partitions like any other source.  Pairs with the engine's stateful
operators (streaming/stateful.py, streaming/windows.py) and the
RocksDB provider pin (tests/test_streaming.py) as the observability
half of the streaming-state story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Stateful-operator inventory of a checkpoint: operatorId/name,
    store name, partition count, [minBatchId, maxBatchId] retained."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_operator_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
    flatten: bool = True,
) -> DataFrame:
    """Read one operator's state store as (key…, value…) rows.

    ``batch_id`` pins a historical micro-batch (state time travel —
    any version still retained under the checkpoint); default is the
    latest committed batch.  ``flatten=True`` spreads the key/value
    structs into top-level columns for direct querying."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    df = reader.load(checkpoint)
    if not flatten:
        return df
    return df.select(F.col("key.*"), F.col("value.*"), "partition_id")
