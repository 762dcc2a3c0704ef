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


def stream_merge_upsert_sink(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    value_col: str = "value",
) -> "pyspark.sql.streaming.StreamingQuery":
    """Continuously-maintained state table: each micro-batch is
    aggregated to (key, partial_sum, partial_count) and MERGED into a
    persistent parquet snapshot with `operators.merge.merge_apply` —
    matched keys ACCUMULATE (sum+sum, count+count), new keys insert.
    The streaming twin of the batch `incremental_agg_maintenance`
    contract (sum/count are mergeable; derived metrics compute at
    read time), and the foreachBatch + MERGE pattern a table-format
    sink (Delta/Iceberg) runs in production.

    Exactly-once: merge-accumulate is NOT naturally idempotent (a
    redelivered batch would double-add), so the snapshot directory
    records the last applied batch id (`_applied_batch`) and replays
    are skipped — state transitions are transactional via
    write-to-temp + atomic directory rename.

    Scale: per batch ONE map-side pre-aggregation of the micro-batch
    + one key-shuffled merge join against the snapshot; the snapshot
    is keys-sized, not events-sized.
    """
    import shutil

    from ..operators.merge import merge_apply
    from pyspark.sql import functions as F

    spark = stream_df.sparkSession
    marker = os.path.join(state_dir, "_applied_batch")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(marker):
            with open(marker) as fh:
                if batch_id <= int(fh.read().strip()):
                    return  # redelivered batch: already merged
        batch_agg = batch_df.groupBy(key).agg(
            F.sum(value_col).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        data_dir = os.path.join(state_dir, "data")
        if os.path.exists(os.path.join(data_dir, "_SUCCESS")):
            base = spark.read.parquet(data_dir)
        else:
            base = spark.createDataFrame(
                [], f"{key} LONG, total_value DOUBLE, n_events LONG"
            )
        changes = batch_agg.withColumn("op", F.lit("U"))
        merged = merge_apply(
            base,
            changes,
            key=key,
            # Matched keys accumulate; inserts take the batch partials.
            set_cols={
                "total_value": F.col("b.total_value") + F.col("c.total_value"),
                "n_events": F.col("b.n_events") + F.col("c.n_events"),
            },
            insert_cols={
                "total_value": F.col("c.total_value"),
                "n_events": F.col("c.n_events"),
            },
        ).drop("row_status")
        tmp = os.path.join(state_dir, f"_tmp_batch_{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        old = os.path.join(state_dir, f"_old_batch_{batch_id}")
        if os.path.exists(data_dir):
            os.rename(data_dir, old)
        os.rename(tmp, data_dir)
        shutil.rmtree(old, ignore_errors=True)
        with open(marker, "w") as fh:
            fh.write(str(batch_id))

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_merge_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read the snapshot a stream_merge_upsert_sink maintains."""
    return spark.read.parquet(os.path.join(state_dir, "data"))
