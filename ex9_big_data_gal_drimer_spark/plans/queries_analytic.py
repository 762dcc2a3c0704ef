"""Analytic-window depth: explicit frames and per-key sequence
analysis (SURVEY.md §2.5 additive surface).

The reference's two window sites (RANK / FIRST_VALUE, reference
main.py:104-105) both use the default frame; this tranche exercises
the frame clause itself — RANGE frames keyed on event time (the
time-series rolling aggregate) and ROWS frames (the fixed-width
moving average) — plus LAG-based gap analysis running partitioned
over the raw fact table rather than a post-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from .registry import register

_SECONDS_PER_DAY = 86_400


@register(
    "rolling_revenue_frames",
    oracle="""
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', o_orderdate) AS DATE) AS day,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY 1
    )
    SELECT day, revenue,
           ROUND(SUM(revenue) OVER (
               ORDER BY day
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ), 2) AS rev_7d,
           ROUND(AVG(revenue) OVER (
               ORDER BY day
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 2) AS ma_3row
    FROM daily
    ORDER BY day
    """,
)
def rolling_revenue_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frames over the daily revenue series: a 7-day
    RANGE frame (calendar-aware — days missing from the data still
    age out of the window) and a 3-row ROWS frame (fixed width
    regardless of calendar gaps).  The two differ exactly where the
    series has holes, which is why both exist.

    Spark's rangeBetween needs a numeric ordering key, so the date is
    keyed as unix_date (days since epoch) and the frame is [-6, 0]
    days; DuckDB orders the DATE directly with an INTERVAL frame —
    identical windows.

    Scale: both windows are unpartitioned but run on post-aggregate
    daily rows (≤ #days — the same safety argument as q4, enforced
    for every registered query by test_plan_audit); the heavy input
    is reduced by the groupBy first.
    """
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w_range = (
        Window.orderBy(F.unix_date(F.col("day"))).rangeBetween(-6, 0)
    )
    w_rows = Window.orderBy("day").rowsBetween(-2, 0)
    return (
        daily.select(
            "day",
            "revenue",
            F.round(F.sum("revenue").over(w_range), 2).alias("rev_7d"),
            F.round(F.avg("revenue").over(w_rows), 2).alias("ma_3row"),
        )
        .orderBy("day")
    )


@register(
    "customer_order_gaps",
    oracle="""
    WITH seq AS (
        SELECT o_custkey,
               DATE_DIFF('day',
                         LAG(o_orderdate) OVER (
                             PARTITION BY o_custkey ORDER BY o_orderdate),
                         o_orderdate) AS gap_days
        FROM orders
    )
    SELECT o_custkey AS custkey,
           COUNT(*) + 1 AS n_orders,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
           ROUND(AVG(gap_days), 2) AS avg_gap_days
    FROM seq
    WHERE gap_days IS NOT NULL
    GROUP BY 1
    ORDER BY max_gap_days DESC, custkey
    LIMIT 20
    """,
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key sequence analysis on the raw fact table: the day-gaps
    between each customer's consecutive orders (LAG over a window
    PARTITIONED by the key — one shuffle on o_custkey, per-partition
    sort, no global sort), then the customers with the longest dry
    spells.

    Tie-safety: ordering only by o_orderdate makes LAG ambiguous
    between equal timestamps, but consecutive differences of a sorted
    multiset are permutation-invariant, so the gap MULTISET (and
    max/avg over it) is deterministic either way.

    Scale: this is the canonical "sessionize a 100 TB event log"
    shape — hash-partition by key, sort within partition; skewed keys
    are the risk and AQE skew-split handles the shuffle side.
    """
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_orders"),
            F.max("gap_days").cast("long").alias("max_gap_days"),
            F.round(F.avg("gap_days"), 2).alias("avg_gap_days"),
        )
        .orderBy(F.desc("max_gap_days"), "custkey")
        .limit(20)
    )


@register(
    "resample_user_hourly",
    oracle="""
    WITH spans AS (
        SELECT user_id,
               DATE_TRUNC('hour', MIN(ts)) AS h0,
               DATE_TRUNC('hour', MAX(ts)) AS h1
        FROM events GROUP BY 1
    ), grid AS (
        SELECT user_id,
               UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
        FROM spans
    ), filled AS (
        SELECT g.user_id, g.hour_ts, e.value
        FROM grid g ASOF LEFT JOIN events e
          ON g.user_id = e.user_id AND g.hour_ts >= e.ts
    )
    SELECT user_id,
           COUNT(*) AS n_hours,
           COUNT(value) AS n_filled,
           ROUND(SUM(value), 2) AS total_filled_value
    FROM filled
    GROUP BY 1
    ORDER BY user_id
    LIMIT 50
    """,
)
def resample_user_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with forward-fill, NATIVE plan (round-14,
    guide §4.1): per-key grid via sequence+explode and the as-of fill
    via a running last(ignorenulls) window — no Python boundary.  The
    oracle reproduces the semantics with generate_series + ASOF join.

    The grouped-map pandas tier keeps its exemplar in
    resample_user_hourly_chunked (applyInArrow per (key, chunk));
    this query's applyInPandas form measured ~0.8 s of pure per-group
    Python at sf0.1 where the relational twin is row-identical
    (tests/test_resample_skew.py pins native ≡ applyInPandas exactly)
    and runs in whole-stage codegen.
    """
    from ..operators.resample import resample_hourly_ffill_native

    filled = resample_hourly_ffill_native(table(spark, sf_dir, "events"))
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.count("filled_value").alias("n_filled"),
            F.round(F.sum("filled_value"), 2).alias("total_filled_value"),
        )
        .orderBy("user_id")
        .limit(50)
    )


@register(
    "events_enriched_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           e.event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(e.value), 2) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_enriched_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the STREAM-STATIC enrichment join
    (streaming.windows.enrich_with_dimensions): every event joined to
    the customer dimension and rolled up per nation × event type.
    The identical column expressions run as a streaming enrichment —
    a stream joined to broadcast static dimensions needs no
    watermark and keeps no join state.

    Scale: the fact side never shuffles for the join (both dims are
    broadcast); the single shuffle is the final aggregation on
    (nation, event_type) — 125 groups.
    """
    from ..streaming.windows import enrich_with_dimensions

    enriched = enrich_with_dimensions(
        table(spark, sf_dir, "events"),
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "nation"),
    )
    return (
        enriched.groupBy("nation", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("nation", "event_type")
    )


@register(
    "ewma_user_value",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               array_agg(value ORDER BY ts, event_id, value) AS vs
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vs) AS BIGINT) AS n_events,
           ROUND(list_reduce(vs,
                 (acc, x) -> CAST(0.3 AS DOUBLE) * x
                           + CAST(0.7 AS DOUBLE) * acc), 4) AS ewma_value
    FROM seq
    ORDER BY ewma_value DESC, user_id
    LIMIT 15
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values
    (alpha = 0.3), seeded with the first observation — the recency-
    weighted health/engagement score a monitoring rollup keeps per
    key.  EWMA is a SEQUENTIAL recurrence (each step depends on the
    previous), so no windowed SUM expresses it; the engine form is
    collect-per-key + a JVM `aggregate` fold over the time-ordered
    array — a per-KEY sequential scan, fully parallel ACROSS keys.

    Scale: state per key is that key's event list — bounded by
    per-user activity, not corpus size (same contract as the grouped-
    map resample).  For unbounded keys the streaming twin is
    applyInPandasWithState keeping just the running scalar.  The
    oracle runs the identical fold with DuckDB's list_reduce; both
    folds evaluate in the same time order — the oracle's ORDER BY
    carries value as a final tie-break to mirror sort_array's full
    struct ordering even if (ts, event_id) ever duplicates — so
    values agree to float precision."""
    events = table(spark, sf_dir, "events")
    seq = (
        events.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq")
        )
    )
    vals = F.transform(F.col("seq"), lambda s: s["value"])
    ewma = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            F.lit(0.3) * x + F.lit(0.7) * acc
        ),
    )
    return (
        seq.select(
            "user_id",
            F.size("seq").cast("long").alias("n_events"),
            F.round(ewma, 4).alias("ewma_value"),
        )
        .orderBy(F.desc("ewma_value"), "user_id")
        .limit(15)
    )
