"""As-of join query (custom operator; DuckDB native ASOF JOIN oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.asof import asof_join
from .registry import register


@register(
    "asof_latest_purchase",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(p.value) AS BIGINT) AS n_with_prior_purchase,
           ROUND(AVG(p.value), 2) AS avg_latest_purchase_value
    FROM events e
    ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def asof_latest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: every event sees the user's latest purchase
    value at-or-before its timestamp (operators.asof — union+window,
    one shuffle, linear).  The oracle is DuckDB's native ASOF JOIN."""
    events = table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        events.select("event_id", "user_id", "ts", "event_type"),
        purchases,
        key="user_id",
        ts="ts",
        payload_cols=["value"],
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("asof_value").alias("n_with_prior_purchase"),
            F.round(F.avg("asof_value"), 2).alias("avg_latest_purchase_value"),
        )
        .orderBy("event_type")
    )
