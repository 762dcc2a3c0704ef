"""Streaming sinks beyond the memory sink: foreachBatch into a
queryable table.

The built-in file sink can only APPEND; real pipelines usually want
each micro-batch upserted/merged into a catalog table.  foreachBatch
is the Structured Streaming escape hatch for that: the sink function
receives (batch DataFrame, batch_id) and can use the full batch write
API.

Exactly-once story: foreachBatch is at-least-once — after a crash the
last batch may be re-delivered with the SAME batch_id.  Writing each
batch to a partition directory named by batch_id makes the retry
overwrite its own partial output instead of duplicating it
(idempotent-by-batch-id, the standard foreachBatch recipe).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def stream_to_partitioned_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> "pyspark.sql.streaming.StreamingQuery":
    """Sink a streaming DataFrame into ``out_dir`` as parquet, one
    Hive-style partition per micro-batch (``_batch_id=N/``), via
    foreachBatch.  A redelivered batch overwrites exactly its own
    partition — idempotent under at-least-once delivery.

    Scale: each micro-batch write is a normal distributed parquet
    write (no driver collect); readers see a standard partitioned
    dataset and can prune on ``_batch_id`` if they only want the tail.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"_batch_id={batch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_batch_partitioned(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read everything a stream_to_partitioned_parquet sink has
    written, dropping the bookkeeping partition column."""
    return spark.read.option("basePath", out_dir).parquet(out_dir).drop("_batch_id")
