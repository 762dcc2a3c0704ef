"""Range join + multi-resolution rollup cascade queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import local_df, table
from ..operators.rangejoin import range_join_bucketed
from .registry import register

#: Price bands [lo, hi) — static dimension, same literals in the oracle.
PRICE_BANDS = [
    ("band_0_100k", 0.0, 100_000.0),
    ("band_100k_200k", 100_000.0, 200_000.0),
    ("band_200k_300k", 200_000.0, 300_000.0),
    ("band_300k_400k", 300_000.0, 400_000.0),
    ("band_400k_up", 400_000.0, 1_000_000_000.0),
]


@register(
    "range_join_price_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
        ('band_0_100k', 0.0, 100000.0),
        ('band_100k_200k', 100000.0, 200000.0),
        ('band_200k_300k', 200000.0, 300000.0),
        ('band_300k_400k', 300000.0, 400000.0),
        ('band_400k_up', 400000.0, 1000000000.0))
    SELECT b.band,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_price
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    ORDER BY b.band
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via the bucketized equi-join operator
    (operators.rangejoin).  The band table is tiny here — a broadcast
    theta-join would also work — but the plan shape is the one that
    survives when BOTH sides are large (IP-geolocation ranges, genomic
    intervals): equi-join on bucket, exact refine after."""
    orders = table(spark, sf_dir, "orders")
    bands = local_df(spark, PRICE_BANDS, "band string, lo double, hi double")
    joined = range_join_bucketed(
        orders.select("o_orderkey", "o_totalprice"),
        bands,
        point_col="o_totalprice",
        lo_col="lo",
        hi_col="hi",
        bucket_width=100_000.0,
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("band")
    )


@register(
    "events_rollup_cascade",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL 1 DAY, ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY day
    """,
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: the day rollup is
    computed FROM the hour rollup, not from raw events (counts and sums
    compose).  At 100 TB each resolution is a materialized table
    refreshed incrementally; queries hit the coarsest table that
    answers them.  The oracle aggregates raw directly — equal results
    prove the cascade composes."""
    events = table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    return (
        hourly.groupBy(F.date_trunc("day", F.col("hour")).cast("date").alias("day"))
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("total_value"),
        )
        .orderBy("day")
    )
