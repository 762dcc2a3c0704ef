"""Event-time window aggregations, batch form (SURVEY.md §2.10, phase 5).

The reference has no streaming surface; these are the batch-equivalent
forms of the Structured Streaming operators (the streaming wrappers in
``ex9_big_data_gal_drimer_spark.streaming`` reuse the same column
expressions over ``readStream``).  Batch form keeps them
DuckDB-oracle-checkable: `F.window` ≡ `time_bucket`, session windows ≡
gaps-and-islands SQL.

Determinism notes:
- events.ts is naive (UTC) microsecond precision after catalog
  normalization; both engines bucket on the same epoch-aligned grid.
- Session boundary: Spark's session window is [start, last_event+gap),
  end-exclusive, so an event exactly `gap` after the previous one
  starts a NEW session — the oracle uses `>=` to match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import register


@register(
    "events_tumbling_1h",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type: `F.window` in batch mode
    — identical expression works under readStream with a watermark."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
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
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sliding_1h_30m",
    oracle="""
    WITH bucketed AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS b, value FROM events
    ), expanded AS (
        SELECT b AS window_start, value FROM bucketed
        UNION ALL
        SELECT b - INTERVAL 30 MINUTE AS window_start, value FROM bucketed
    )
    SELECT window_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM expanded
    GROUP BY window_start
    ORDER BY window_start
    """,
)
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): every event lands in
    2 windows.  The oracle expands each event into its two window
    starts explicitly — same semantics Spark's window-expand physical
    node applies."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"), "n_events", "total_value"
        )
        .orderBy("window_start")
    )


@register(
    "events_session_10m",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 10 MINUTE AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def events_session_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user via F.session_window.
    The oracle is the classic gaps-and-islands rewrite; Spark's session
    end = last event + gap, end-exclusive."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "10 minutes"), "user_id")
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
        .orderBy("user_id", "session_start")
    )


@register(
    "event_type_rates",
    oracle="""
    WITH per_type AS (
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(AVG(value), 2) AS avg_value
        FROM events
        GROUP BY event_type
    ), total AS (
        SELECT CAST(SUM(n_events) AS BIGINT) AS total_events FROM per_type
    )
    SELECT event_type, n_events, n_users, avg_value,
           ROUND(n_events * 100.0 / total_events, 2) AS pct_of_all
    FROM per_type, total
    ORDER BY n_events DESC, event_type
    """,
)
def event_type_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type mix: per-group distinct users + percent-of-all-events
    (the reference's percent-of-total pattern on the stream table)."""
    events = table(spark, sf_dir, "events")
    from ..operators.relational import percent_of_total

    per_type = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.avg("value"), 2).alias("avg_value"),
    )
    return (
        percent_of_total(per_type, "n_events", pct_col="pct_of_all")
        .select("event_type", "n_events", "n_users", "avg_value", "pct_of_all")
        .orderBy(F.desc("n_events"), "event_type")
    )


@register(
    "events_click_purchase_join",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    ), purch AS (
        SELECT user_id, ts AS purchase_ts, value FROM events
        WHERE event_type = 'purchase'
    )
    SELECT c.user_id,
           COUNT(*) AS n_pairs,
           CAST(FLOOR(MIN(epoch(p.purchase_ts - c.click_ts))) AS BIGINT)
               AS min_delay_s,
           ROUND(SUM(p.value), 2) AS total_purchase_value
    FROM clicks c
    JOIN purch p
      ON c.user_id = p.user_id
     AND p.purchase_ts >= c.click_ts
     AND p.purchase_ts <= c.click_ts + INTERVAL 10 MINUTE
    GROUP BY c.user_id
    ORDER BY 1
    """,
)
def events_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stream-stream interval join
    (streaming.windows.click_purchase_within): click→purchase pairs by
    the same user within 10 minutes, aggregated per user.  In
    streaming mode the identical expressions run as a watermarked
    stream-stream join with bounded state; in batch they plan as an
    equi-join on user with a range predicate — both sides shuffle on
    user_id once, no cartesian anywhere."""
    from ..streaming.windows import click_purchase_within

    pairs = click_purchase_within(table(spark, sf_dir, "events"), bound="10 minutes")
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(
                F.expr("timestampdiff(SECOND, click_ts, purchase_ts)")
            ).alias("min_delay_s"),
            F.round(F.sum("purchase_value"), 2).alias("total_purchase_value"),
        )
        .orderBy("user_id")
    )


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id,
           arg_max(event_type, ts) AS last_event_type,
           MAX(ts) AS last_ts,
           ROUND(arg_max(value, ts), 2) AS last_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    LIMIT 100
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style keep-latest-per-key dedup as ONE hash aggregate
    (max_by ≡ arg_max) — no window, no sort, one shuffle on the key.
    The row_number()-window form needs a per-key sort; at 100 TB the
    aggregate form is strictly cheaper and AQE-skew-splittable.
    Tie-break: events.ts values are unique per user in this corpus
    (max_by/arg_max are otherwise tie-nondeterministic)."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.max_by("event_type", "ts").alias("last_event_type"),
            F.max("ts").alias("last_ts"),
            F.round(F.max_by("value", "ts"), 2).alias("last_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
        .limit(100)
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
          AND e.ts <= v.t_view + INTERVAL 1 DAY
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          AND e.ts <= c.t_click + INTERVAL 1 DAY
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
           (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click,
           ROUND((SELECT COUNT(*) FROM c) * 1.0
                 / (SELECT COUNT(*) FROM v), 4) AS view_to_click_rate,
           ROUND((SELECT COUNT(*) FROM p) * 1.0
                 / (SELECT COUNT(*) FROM c), 4) AS click_to_purchase_rate,
           ROUND((SELECT COUNT(*) FROM p) * 1.0
                 / (SELECT COUNT(DISTINCT user_id) FROM events), 4)
               AS overall_conversion
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step conversion funnel: first view → first click within
    1 day after it → first purchase within 1 day after that click,
    per user; one summary
    row of step counts and conversion rates.  The ORDER constraint is
    what distinguishes a funnel from three filters — each step's
    timestamp must exceed the previous step's, so step N is a
    min-aggregate over events later than step N-1's min.

    Plan shape: three equi-joins on user_id, each input pre-filtered
    to ONE event type (the filter pushes to the scan), each stage a
    map-side-combining min-aggregate; step outputs are user-level (≤
    |users| rows) and broadcast forward.  The five 1-row totals attach
    via broadcast cross joins (J1) — no shuffle is ever wider than
    distinct users.  At 100 TB this is the standard cascading-funnel
    plan: each step's input shrinks monotonically.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    one = lambda df, name: F.broadcast(df.agg(F.count(F.lit(1)).alias(name)))  # noqa: E731
    return (
        ev.agg(F.countDistinct("user_id").alias("n_users"))
        .crossJoin(one(v, "n_viewed"))
        .crossJoin(one(c, "n_clicked_after_view"))
        .crossJoin(one(p, "n_purchased_after_click"))
        .select(
            "n_users",
            "n_viewed",
            "n_clicked_after_view",
            "n_purchased_after_click",
            F.round(F.col("n_clicked_after_view") / F.col("n_viewed"), 4).alias(
                "view_to_click_rate"
            ),
            F.round(
                F.col("n_purchased_after_click") / F.col("n_clicked_after_view"), 4
            ).alias("click_to_purchase_rate"),
            F.round(F.col("n_purchased_after_click") / F.col("n_users"), 4).alias(
                "overall_conversion"
            ),
        )
    )


@register(
    "events_click_nonconverting",
    oracle="""
    WITH clicks AS (
        SELECT event_id AS click_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ), purch AS (
        SELECT user_id, ts AS purchase_ts FROM events
        WHERE event_type = 'purchase'
    ), per_click AS (
        SELECT c.user_id, c.click_id,
               MAX(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS converted
        FROM clicks c
        LEFT JOIN purch p
          ON c.user_id = p.user_id
         AND p.purchase_ts >= c.click_ts
         AND p.purchase_ts <= c.click_ts + INTERVAL 10 MINUTE
        GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_clicks,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(SUM(converted) * 1.0 / COUNT(*), 4) AS conv_rate
    FROM per_click GROUP BY user_id ORDER BY user_id
    """,
)
def events_click_nonconverting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the LEFT-OUTER stream-stream interval join
    (streaming.windows.click_purchase_outer): per-user click counts,
    converted-click counts (a purchase within 10 minutes), and the
    conversion rate — the abandonment metric the INNER interval join
    (events_click_purchase_join) structurally cannot produce, since
    non-converting clicks only exist on the outer side.  Streaming
    mode runs the identical expressions with watermarks on both
    sides; null-padded rows wait for the watermark to pass (bounded
    state, delayed nulls — tests/test_streaming.py pins the
    within-horizon prefix equals batch)."""
    from ..streaming.windows import click_purchase_outer

    pairs = click_purchase_outer(table(spark, sf_dir, "events"))
    per_click = pairs.groupBy("user_id", "click_id").agg(
        F.max(
            F.when(F.col("purchase_ts").isNotNull(), 1).otherwise(0)
        ).alias("converted")
    )
    return (
        per_click.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum("converted").alias("n_converted"),
            F.round(F.sum("converted") / F.count(F.lit(1)), 4).alias("conv_rate"),
        )
        .orderBy("user_id")
    )
