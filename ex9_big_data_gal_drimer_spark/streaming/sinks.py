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
    redelivered batch would double-add), so the last applied batch id
    is committed INSIDE the snapshot directory itself
    (`data/_applied_batch`, underscore-prefixed so parquet readers
    skip it) and the whole snapshot+marker publishes in ONE directory
    rename — a crash can never observe new data without its marker or
    vice versa, and a crash between the two renames is recovered by
    restoring the parked previous snapshot before the replayed batch
    is re-evaluated.

    Scale: per batch ONE map-side pre-aggregation of the micro-batch
    + one key-shuffled merge join against the snapshot; the snapshot
    is keys-sized, not events-sized.
    """
    import shutil

    from ..operators.merge import merge_apply
    from pyspark.sql import functions as F

    spark = stream_df.sparkSession
    data_dir = os.path.join(state_dir, "data")

    def _applied_batch(d: str) -> int:
        # The marker lives INSIDE the snapshot dir (underscore-prefixed
        # → invisible to parquet readers, like _SUCCESS), so snapshot
        # content and its batch id commit in the SAME directory rename
        # — there is no window where one exists without the other.  A
        # MISSING marker means a virgin state dir (-1); a marker that
        # exists but cannot be parsed is corruption and must fail loud
        # (silently treating it as -1 would re-apply the last batch).
        path = os.path.join(d, "_applied_batch")
        try:
            with open(path) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return -1

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # Crash recovery: a death between the two renames leaves the
        # previous snapshot parked at _old_batch_* with no data dir —
        # restore the NEWEST parked snapshot (numeric batch order; a
        # lexicographic pick would prefer _old_batch_1 over
        # _old_batch_10 and resurrect ancient state).
        if not os.path.exists(data_dir):
            parked = [
                (int(name.rsplit("_", 1)[-1]), name)
                for name in (
                    os.listdir(state_dir) if os.path.exists(state_dir) else []
                )
                if name.startswith("_old_batch_")
            ]
            if parked:
                _, newest = max(parked)
                os.rename(os.path.join(state_dir, newest), data_dir)
        if batch_id <= _applied_batch(data_dir):
            return  # redelivered batch: already merged
        batch_agg = batch_df.groupBy(key).agg(
            F.sum(value_col).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
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
        # Commit the batch id INTO the new snapshot before the swap:
        # the rename below publishes data + marker atomically.
        with open(os.path.join(tmp, "_applied_batch"), "w") as fh:
            fh.write(str(batch_id))
        old = os.path.join(state_dir, f"_old_batch_{batch_id}")
        if os.path.exists(data_dir):
            os.rename(data_dir, old)
        os.rename(tmp, data_dir)
        # Clean ALL residue, not just this batch's: a prior crash (or
        # failed rmtree) may have stranded older parked/temp dirs that
        # would otherwise confuse a future recovery.
        for name in os.listdir(state_dir):
            if name.startswith(("_old_batch_", "_tmp_batch_")):
                shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_merge_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read the snapshot a stream_merge_upsert_sink maintains."""
    return spark.read.parquet(os.path.join(state_dir, "data"))
