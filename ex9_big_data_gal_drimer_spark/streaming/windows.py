"""Streaming window operators over an events-shaped stream.

The reference has no streaming (SURVEY.md §2.10); this is the additive
Structured Streaming surface.  Each transformation reuses the SAME
column expressions as the batch queries in plans.queries_events — the
function takes any events-shaped DataFrame, batch or streaming, so the
batch forms remain the DuckDB-oracle-checkable truth and the streaming
forms add watermarking/output-mode on top.

At scale: watermark bounds state; tumbling/sliding aggs keep one state
row per (window, key); session windows merge state per key;
dropDuplicatesWithinWatermark bounds the dedup state to the watermark
horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import normalize_nano_timestamps
from ..session import configure


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a directory of events parquet files
    (smoke/testing rig; in production this is a Kafka/Kinesis source
    with the same schema — everything downstream is source-agnostic).

    The directory must contain only events-shaped files.  The stream
    uses the RAW file schema and applies the batch catalog's timestamp
    normalization afterwards — events.ts has shipped both as INT64
    TIMESTAMP(NANOS) (LongType under nanosAsLong) and TIMESTAMP(MICROS)
    (timestamp_ntz) across testdata generations; either way the stream
    needs TIMESTAMP (LTZ) for watermarks.
    """
    configure(spark)
    raw_schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return normalize_nano_timestamps(stream, ("ts",), ntz=False)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling window counts per event type; watermark bounds state
    and admits late events up to the horizon."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_stats(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Session windows per user (same expression as the batch oracle
    query events_session_10m)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming dedup with bounded state: duplicates arriving within
    the watermark horizon are dropped; batch frames fall back to plain
    dropDuplicates (same result set on static data)."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def click_purchase_within(
    events: DataFrame,
    bound: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: every (click → purchase) pair by
    the same user with the purchase inside ``bound`` after the click.

    Streaming: both sides carry watermarks and the join condition has
    the time bound Spark needs to size the join state — each side
    keeps only ``watermark + bound`` of history, so state is bounded
    regardless of stream length.  Batch: the identical expressions
    plan as a plain range join, which keeps the batch form
    DuckDB-oracle-checkable (events_click_purchase_join).
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {bound}")),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def click_purchase_outer(
    events: DataFrame,
    bound: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """LEFT-OUTER stream-stream interval join: every click, paired
    with each same-user purchase inside ``bound`` after it — or a
    NULL purchase side if none arrives.  The outer side is what
    funnel/abandonment analytics need (the inner variant above can't
    see non-converting clicks).

    Streaming semantics: outer joins additionally require the
    watermark to PASS before a null-padded row can be emitted (Spark
    must prove no matching purchase can still arrive), so unmatched
    clicks near the head of the stream trail the matched output by
    ``watermark + bound`` — bounded state, delayed nulls.  Batch
    callers get a plain left range join with identical expressions
    (DuckDB-oracle-checked via events_click_nonconverting).
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {bound}")),
        "left_outer",
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def enrich_with_dimensions(
    events: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """STREAM-STATIC enrichment join: each event joined to its
    customer row and nation name.  Both dimension sides are static
    batch DataFrames and explicitly broadcast, so a streaming fact
    side needs no watermark and the join keeps NO state — each
    micro-batch is enriched map-side against the broadcast tables.
    Batch callers get the identical plan (the DuckDB-oracle-checked
    events_enriched_by_nation builds its rollup on this).

    Scale: the broadcast re-ships per executor, not per micro-batch;
    for dimensions too big to broadcast the scale path is a
    slowly-changing-dimension join against a bucketed table, same
    call signature.
    """
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), F.col("c_nationkey").alias("_nk")
    ).join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("_nk"), "n_name")),
        "_nk",
    ).select("user_id", F.col("n_name").alias("nation"))
    return events.join(F.broadcast(dim), "user_id")


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> "pyspark.sql.streaming.StreamingQuery":
    """Run a streaming transformation into an in-memory sink (tests)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
