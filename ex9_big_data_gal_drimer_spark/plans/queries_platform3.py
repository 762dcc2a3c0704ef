"""Platform observability / governance tranche, round 7.

Ten operators a 100 TB training-data platform runs as standing jobs,
each with an exact DuckDB oracle:

- privacy: l-diversity audit (attribute-disclosure complement to the
  round-6 k-anonymity audit), DP contribution-clipping audit (the
  sensitivity-bounding prep every user-level DP release needs);
- optimizer observability: ANALYZE-style table/column stats profile
  and a join-cardinality estimate-vs-actual audit (the NDV formula a
  cost-based optimizer uses, validated against the measured join);
- ANN observability: IVF cell-balance audit (load skew of the
  bucketed probe path) and int8 scalar-quantization error audit;
- corpus economics: marginal-novelty curve over ingestion batches and
  a cross-source fingerprint-overlap (contamination) matrix;
- time-series: day-of-week seasonality index from exact integer
  cents, and per-type inter-arrival percentiles at value grain.

Cross-engine float determinism uses only tricks already proven in
this suite (queries_platform2.py, queries_analytics5.py): exact
BIGINT sufficient statistics divided once at the end, FLOOR(x+0.5)
instead of ROUND inside quantization, explicit left folds
(``F.aggregate`` ≡ DuckDB ``list_reduce(list_prepend(0.0, ...))``),
order-free MIN/MAX over per-row deterministic doubles, and integer
order statistics over (value, count) grains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions import cosine_similarity
from .registry import register


# ---------------------------------------------------------------------------
# privacy / governance
# ---------------------------------------------------------------------------


@register(
    "l_diversity_audit",
    oracle="""
    WITH qi AS (
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
        FROM (
            SELECT c_nationkey,
                   CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
                   c_mktsegment
            FROM customer
        )
        GROUP BY c_nationkey, bal_bucket
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           MIN(l) AS min_l,
           CAST(SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_homogeneous,
           CAST(SUM(CASE WHEN l = 1 THEN k ELSE 0 END) AS BIGINT)
               AS rows_at_risk,
           ROUND(100.0 * CAST(SUM(CASE WHEN l = 1 THEN k ELSE 0 END)
                              AS DOUBLE) / SUM(k), 4) AS pct_at_risk
    FROM qi
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity screen, the attribute-disclosure complement of
    `k_anonymity_audit` (queries_platform2.py): within each
    quasi-identifier group (nation, $1000 balance bucket), how many
    DISTINCT values does the sensitive attribute (market segment)
    take?  A group can be k-anonymous yet homogeneous (l=1): every
    member's segment is disclosed.  Reports per nation the group
    count, minimum l, homogeneous groups, and the row share at risk.

    Scale: one distinct-aggregate at QI grain (partial-aggregable
    Expand), one rollup to the 25-nation grain — no joins, no
    windows."""
    c = table(spark, sf_dir, "customer")
    qi = (
        c.select(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000).alias("bal_bucket"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "bal_bucket")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("c_mktsegment").alias("l"),
        )
    )
    return (
        qi.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").alias("n_rows"),
            F.min("l").alias("min_l"),
            F.sum(F.when(F.col("l") == 1, 1).otherwise(0)).alias(
                "n_homogeneous"
            ),
            F.sum(F.when(F.col("l") == 1, F.col("k")).otherwise(0)).alias(
                "rows_at_risk"
            ),
        )
        .select(
            "c_nationkey",
            "n_groups",
            "n_rows",
            "min_l",
            "n_homogeneous",
            "rows_at_risk",
            F.round(
                100.0 * F.col("rows_at_risk") / F.col("n_rows"), 4
            ).alias("pct_at_risk"),
        )
        .orderBy("c_nationkey")
    )


_DP_MAX_ORDERS = 8
_DP_MAX_CENTS = 200_000_000  # $2M per-user spend cap


@register(
    "dp_clipping_audit",
    oracle=f"""
    WITH per_user AS (
        SELECT c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_custkey, c.c_mktsegment
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_orders) AS BIGINT) AS raw_orders,
           CAST(SUM(LEAST(n_orders, {_DP_MAX_ORDERS})) AS BIGINT)
               AS clipped_orders,
           CAST(SUM(CASE WHEN n_orders > {_DP_MAX_ORDERS}
                         OR cents > {_DP_MAX_CENTS}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_users_clipped,
           ROUND(100.0 * (1.0 - CAST(SUM(LEAST(n_orders, {_DP_MAX_ORDERS}))
                                     AS DOUBLE) / SUM(n_orders)), 4)
               AS orders_bias_pct,
           ROUND(100.0 * (1.0 - CAST(SUM(LEAST(cents, {_DP_MAX_CENTS}))
                                     AS DOUBLE) / SUM(cents)), 4)
               AS spend_bias_pct
    FROM per_user
    GROUP BY segment
    ORDER BY segment
    """,
)
def dp_clipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy prep audit: user-level DP bounds each
    user's contribution before noise is calibrated — clip every
    customer to at most 8 orders and $2M spend, and measure the bias
    the clipping itself introduces per market segment (clipped users,
    % of orders and spend lost).  The platform tunes the caps to
    balance clipping bias against the noise scale they buy.

    Determinism: spend is exact integer cents (FLOOR(x*100+0.5), the
    suite's ROUND-free idiom); all sums are BIGINT; the two bias
    ratios are single divisions of exact integers.

    Scale: orders⋈customer is a key-aligned shuffle join (customer
    broadcastable well past sf1); per-user grain is bounded by the
    customer count, then a 5-row rollup."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    per_user = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("cents"),
        )
    )
    cap_n, cap_c = F.lit(_DP_MAX_ORDERS), F.lit(_DP_MAX_CENTS)
    return (
        per_user.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_orders").alias("raw_orders"),
            F.sum(F.least(F.col("n_orders"), cap_n)).alias("clipped_orders"),
            F.sum(
                F.when(
                    (F.col("n_orders") > cap_n) | (F.col("cents") > cap_c), 1
                ).otherwise(0)
            ).alias("n_users_clipped"),
            F.sum(F.least(F.col("cents"), cap_c)).alias("_clip_cents"),
            F.sum("cents").alias("_raw_cents"),
        )
        .select(
            "segment",
            "n_users",
            "raw_orders",
            "clipped_orders",
            "n_users_clipped",
            F.round(
                100.0
                * (
                    1.0
                    - F.col("clipped_orders").cast("double")
                    / F.col("raw_orders")
                ),
                4,
            ).alias("orders_bias_pct"),
            F.round(
                100.0
                * (
                    1.0
                    - F.col("_clip_cents").cast("double") / F.col("_raw_cents")
                ),
                4,
            ).alias("spend_bias_pct"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# optimizer observability
# ---------------------------------------------------------------------------

#: (table, [profiled columns]) — the dimension/fact key and category
#: columns a cost-based optimizer needs NDVs for.
_STATS_COLUMNS = [
    ("orders", ["o_custkey", "o_orderstatus", "o_orderpriority"]),
    ("customer", ["c_mktsegment", "c_nationkey"]),
    ("documents", ["lang", "source"]),
    ("events", ["event_type", "user_id"]),
]


def _stats_oracle() -> str:
    legs = []
    for tname, cols in _STATS_COLUMNS:
        for col in cols:
            legs.append(
                f"""
        SELECT '{tname}' AS table_name, '{col}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls
        FROM {tname}"""
            )
    union = "\n        UNION ALL".join(legs)
    return f"""
    WITH stats AS ({union}
    )
    SELECT table_name, column_name, n_rows, n_distinct, n_nulls,
           ROUND(100.0 * CAST(n_distinct AS DOUBLE) / n_rows, 4)
               AS distinct_pct
    FROM stats
    ORDER BY table_name, column_name
    """


@register("table_stats_profile", oracle=_stats_oracle())
def table_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style statistics profile: exact row count, NDV, and
    null count for every optimizer-relevant column of four tables —
    the inputs a cost-based optimizer's join-ordering and
    broadcast-threshold decisions consume (and the ground truth an
    approximate-NDV sketch is validated against).

    Scale: ONE scan per table computes all of its columns' stats in a
    single multi-distinct aggregate (Catalyst Expand — one pass, no
    per-column rescans), then a zero-shuffle `stack` unpivots the
    1-row aggregate into (table, column) rows.  Four scans total for
    nine column profiles."""
    parts = []
    for tname, cols in _STATS_COLUMNS:
        t = table(spark, sf_dir, tname)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for i, col in enumerate(cols):
            aggs.append(F.countDistinct(col).alias(f"ndv_{i}"))
            aggs.append(
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"nulls_{i}")
            )
        one = t.agg(*aggs)
        stack_args = ", ".join(
            f"'{col}', ndv_{i}, nulls_{i}" for i, col in enumerate(cols)
        )
        parts.append(
            one.select(
                F.lit(tname).alias("table_name"),
                F.expr(
                    f"stack({len(cols)}, {stack_args}) "
                    "AS (column_name, n_distinct, n_nulls)"
                ),
                "n_rows",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "table_name",
        "column_name",
        "n_rows",
        "n_distinct",
        "n_nulls",
        F.round(
            100.0 * F.col("n_distinct").cast("double") / F.col("n_rows"), 4
        ).alias("distinct_pct"),
    ).orderBy("table_name", "column_name")


@register(
    "join_cardinality_audit",
    oracle="""
    WITH legs AS (
        SELECT 'orders_x_lineitem' AS join_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_left,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_right,
               (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
                FROM orders) AS ndv_left,
               (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
                FROM lineitem) AS ndv_right,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM orders o JOIN lineitem l
                  ON o.o_orderkey = l.l_orderkey) AS actual_rows
        UNION ALL
        SELECT 'customer_x_orders',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
               (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
                FROM customer),
               (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
                FROM orders),
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM customer c JOIN orders o
                  ON c.c_custkey = o.o_custkey)
    )
    SELECT join_name, n_left, n_right, ndv_left, ndv_right,
           CAST(FLOOR(CAST(n_left AS DOUBLE) * n_right
                      / GREATEST(ndv_left, ndv_right)) AS BIGINT)
               AS est_rows,
           actual_rows,
           ROUND(FLOOR(CAST(n_left AS DOUBLE) * n_right
                       / GREATEST(ndv_left, ndv_right))
                 / actual_rows, 6) AS est_over_actual
    FROM legs
    ORDER BY join_name
    """,
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBO validation: the textbook equi-join cardinality estimate
    |R|x|S| / max(ndv_R, ndv_S) against the MEASURED join output for
    the two fact joins — the number a cost-based optimizer trusts
    when it orders a 100 TB join tree, here audited so stats drift
    (stale NDVs after ingest) is caught as est/actual moving away
    from 1.

    Determinism: every statistic is an exact BIGINT; the estimate is
    one double multiply-divide of exact integers FLOORed back to
    BIGINT (identical IEEE ops both engines).

    Scale: per leg, two single-pass aggregates (count+NDV per side)
    and the measured join itself — the join is the expensive probe,
    and it is the same key-aligned shuffle the production queries
    run; everything else attaches as 1-row broadcasts."""

    def leg(name: str, left: DataFrame, lkey: str, right: DataFrame, rkey: str):
        lstats = left.agg(
            F.count(F.lit(1)).alias("n_left"),
            F.countDistinct(lkey).alias("ndv_left"),
        )
        rstats = right.agg(
            F.count(F.lit(1)).alias("n_right"),
            F.countDistinct(rkey).alias("ndv_right"),
        )
        actual = (
            left.join(right, left[lkey] == right[rkey])
            .agg(F.count(F.lit(1)).alias("actual_rows"))
        )
        est = F.floor(
            F.col("n_left").cast("double")
            * F.col("n_right")
            / F.greatest("ndv_left", "ndv_right")
        )
        return (
            lstats.crossJoin(rstats)
            .crossJoin(actual)
            .select(
                F.lit(name).alias("join_name"),
                "n_left",
                "n_right",
                "ndv_left",
                "ndv_right",
                est.cast("long").alias("est_rows"),
                "actual_rows",
                F.round(est / F.col("actual_rows"), 6).alias(
                    "est_over_actual"
                ),
            )
        )

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")
    return (
        leg("orders_x_lineitem", o, "o_orderkey", li, "l_orderkey")
        .unionByName(leg("customer_x_orders", c, "c_custkey", o, "o_custkey"))
        .orderBy("join_name")
    )


# ---------------------------------------------------------------------------
# time series
# ---------------------------------------------------------------------------


@register(
    "dow_seasonality_index",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderdate
    ), by_dow AS (
        SELECT CAST(EXTRACT(dow FROM d) AS BIGINT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM daily GROUP BY dow
    ), tot AS (
        SELECT dow, n_days, cents,
               CAST(SUM(n_days) OVER () AS BIGINT) AS tot_days,
               CAST(SUM(cents) OVER () AS BIGINT) AS tot_cents
        FROM by_dow
    )
    SELECT dow, n_days,
           ROUND(CAST(cents AS DOUBLE) / 100, 2) AS revenue,
           ROUND((CAST(cents AS DOUBLE) / n_days)
                 / (CAST(tot_cents AS DOUBLE) / tot_days), 6)
               AS seasonality_index
    FROM tot
    ORDER BY dow
    """,
)
def dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: average daily revenue per
    day-of-week relative to the overall average daily revenue — the
    multiplicative seasonal index a forecasting pipeline divides out
    before trend fitting (and the lag-7 structure behind
    `daily_revenue_autocorr`, queries_platform2.py).

    Determinism: daily revenue is exact integer cents; the index is a
    ratio of two exact-integer averages, divided once as doubles.
    Day-of-week parity: Spark `dayofweek` is 1=Sunday, DuckDB
    `EXTRACT(dow)` is 0=Sunday — the Spark side subtracts 1.

    Scale: date-grain aggregate (bounded by the calendar, ~2400 rows
    at any SF), a 7-row rollup, and an unpartitioned window over
    those 7 rows (plan-audit compliant: window above aggregate)."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).alias("cents")
    )
    by_dow = daily.groupBy(
        (F.dayofweek("d") - 1).cast("long").alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cents").alias("cents"),
    )
    w = Window.partitionBy()
    tot = by_dow.select(
        "dow",
        "n_days",
        "cents",
        F.sum("n_days").over(w).alias("tot_days"),
        F.sum("cents").over(w).alias("tot_cents"),
    )
    return tot.select(
        "dow",
        "n_days",
        F.round(F.col("cents").cast("double") / 100, 2).alias("revenue"),
        F.round(
            (F.col("cents").cast("double") / F.col("n_days"))
            / (F.col("tot_cents").cast("double") / F.col("tot_days")),
            6,
        ).alias("seasonality_index"),
    ).orderBy("dow")


@register(
    "event_interarrival_profile",
    oracle="""
    WITH ordered AS (
        SELECT event_type,
               (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)))
               // 1000000 AS gap_s
        FROM events
    ), g AS (
        SELECT event_type, gap_s, CAST(COUNT(*) AS BIGINT) AS n
        FROM ordered WHERE gap_s IS NOT NULL
        GROUP BY event_type, gap_s
    ), w AS (
        SELECT event_type, gap_s, n,
               CAST(SUM(n) OVER (
                   PARTITION BY event_type ORDER BY gap_s
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        FROM g
    )
    SELECT event_type,
           MAX(tot) AS n_gaps,
           MIN(CASE WHEN cum >= (tot + 1) // 2 THEN gap_s END) AS p50_s,
           MIN(CASE WHEN cum >= (9 * tot + 9) // 10 THEN gap_s END) AS p90_s,
           MIN(CASE WHEN cum >= (99 * tot + 99) // 100 THEN gap_s END)
               AS p99_s,
           MAX(gap_s) AS max_gap_s
    FROM w
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival-time percentiles (p50/p90/p99 in
    whole seconds) across user event streams — the latency profile
    that sizes streaming watermarks and session-gap thresholds
    (events_session_10m's 10-minute gap should sit above p90 of
    in-session inter-arrival).

    Determinism: gaps are exact integer seconds (epoch-microsecond
    difference, floor-divided); percentiles are ORDER-STATISTIC picks
    (smallest gap whose cumulative count reaches ceil(q*n), all
    integer arithmetic) — the suite's established interpolation-free
    idiom.

    Scale: the lag window partitions by user (parallel, bounded per
    user); percentile windows run at (type, distinct gap) grain —
    bounded by the gap-value domain, not the event count."""
    ev = table(spark, sf_dir, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(wlag).cast("timestamp"))
            )
            / F.lit(1000000)
        )
        .cast("long")
        .alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    g = gaps.groupBy("event_type", "gap_s").agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("event_type")
    w = g.select(
        "event_type",
        "gap_s",
        "n",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wtot).alias("tot"),
    )

    def pick(k_expr: str):
        # order-statistic pick: smallest gap whose cumulative count
        # reaches the integer rank k (ceil via (a*n + a) div b)
        return F.min(
            F.when(F.col("cum") >= F.expr(k_expr), F.col("gap_s"))
        )

    return (
        w.groupBy("event_type")
        .agg(
            F.max("tot").alias("n_gaps"),
            pick("(tot + 1) div 2").alias("p50_s"),
            pick("(9 * tot + 9) div 10").alias("p90_s"),
            pick("(99 * tot + 99) div 100").alias("p99_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ANN observability
# ---------------------------------------------------------------------------


@register(
    "ivf_cell_balance_audit",
    oracle="""
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (
        SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id < 8
    ),
    assign AS (
        SELECT vec_id, c_id FROM (
            SELECT e.vec_id, c.c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.c_id
                   ) AS rn
            FROM emb e CROSS JOIN cent c
        ) WHERE rn = 1
    ),
    cells AS (
        SELECT c_id, CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM assign GROUP BY c_id
    )
    SELECT c_id, n_vecs,
           ROUND(100.0 * CAST(n_vecs AS DOUBLE)
                 / SUM(n_vecs) OVER (), 4) AS share_pct,
           ROUND(CAST(n_vecs AS DOUBLE) * 8
                 / SUM(n_vecs) OVER (), 4) AS load_factor
    FROM cells
    ORDER BY c_id
    """,
)
def ivf_cell_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index load-balance audit: per-cell population share and
    load factor (cell size / ideal uniform size) for the fixed-
    centroid IVF layout that `knn_ivf_oracle_fixed_centroids`
    (queries_ann_oracle.py) serves from.  A cell with load_factor 3
    makes every probe touching it 3x the uniform cost — exactly the
    skew an IVF deployment re-trains or splits cells to fix; this
    audit is the standing monitor that triggers that re-train.

    Determinism: assignment reuses the banked oracle's mechanics —
    identical sequential-fold cosine both engines, ROW_NUMBER
    tie-broken by centroid id.

    Scale: centroids broadcast (model-sized), one corpus pass
    assigns, cell grain is k rows; the windows run over k=8 rows."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    sim = cosine_similarity(F.col("v"), F.col("cv"))
    rn = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("c_id"))
    )
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select("vec_id", "c_id", sim.alias("sim"))
        .select("vec_id", "c_id", rn.alias("rn"))
        .filter(F.col("rn") == 1)
    )
    cells = assign.groupBy("c_id").agg(F.count(F.lit(1)).alias("n_vecs"))
    w = Window.partitionBy()
    return (
        cells.select(
            "c_id",
            "n_vecs",
            F.round(
                100.0 * F.col("n_vecs").cast("double")
                / F.sum("n_vecs").over(w),
                4,
            ).alias("share_pct"),
            # load vs uniform over ALL k=8 layout cells (a cell that
            # empties out must INFLATE the others' load, so the
            # divisor is the layout k, not the occupied-cell count)
            F.round(
                F.col("n_vecs").cast("double")
                * F.lit(8)
                / F.sum("n_vecs").over(w),
                4,
            ).alias("load_factor"),
        )
        .orderBy("c_id")
    )


@register(
    "sq_quantization_error_audit",
    oracle="""
    WITH per_vec AS (
        SELECT label,
               list_max(list_transform(
                   CAST(embedding AS DOUBLE[]),
                   x -> abs(x - FLOOR(x * 127 + 0.5) / 127))) AS max_err,
               list_reduce(
                   list_prepend(0.0, list_transform(
                       CAST(embedding AS DOUBLE[]),
                       x -> (x - FLOOR(x * 127 + 0.5) / 127)
                            * (x - FLOOR(x * 127 + 0.5) / 127))),
                   (acc, x) -> acc + x)
                   / len(embedding) AS mse
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(MIN(mse) * 1000000, 4) AS min_mse_ppm,
           ROUND(MAX(mse) * 1000000, 4) AS max_mse_ppm,
           ROUND(MAX(max_err) * 1000, 6) AS max_abs_err_milli
    FROM per_vec
    GROUP BY label
    ORDER BY label
    """,
)
def sq_quantization_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar-quantization error audit for the SQ ANN tier
    (operators/similarity.py): quantize each embedding coordinate to
    round(x*127)/127, and report per label the worst per-vector MSE
    (in ppm) and the worst absolute coordinate error — the
    recall-loss budget the SQ index trades for 4x memory.  A label
    whose max error jumps after an embedding-model update is the
    signal to re-scale the quantizer.

    Determinism: quantization uses FLOOR(x*127+0.5) in BOTH engines
    (never ROUND — FLOOR of the identical double expression is
    rounding-mode-proof because the two engines evaluate the same
    IEEE-754 operation, whereas ROUND's half-even vs half-away
    behavior differs); per-vector MSE is the explicit left fold
    (F.aggregate ≡ list_reduce over a 0.0-prepended list); the label
    rollup uses only order-free MIN/MAX — no cross-row float sums
    anywhere.

    Scale: embarrassingly parallel single pass, no shuffle wider
    than the 10-label rollup."""
    emb = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    err = lambda x: x - F.floor(x * 127 + F.lit(0.5)) / 127  # noqa: E731
    max_err = F.array_max(F.transform(v, lambda x: F.abs(err(x))))
    mse = F.aggregate(
        F.transform(v, lambda x: err(x) * err(x)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size("embedding")
    return (
        emb.select("label", max_err.alias("max_err"), mse.alias("mse"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.min("mse") * 1000000, 4).alias("min_mse_ppm"),
            F.round(F.max("mse") * 1000000, 4).alias("max_mse_ppm"),
            F.round(F.max("max_err") * 1000, 6).alias("max_abs_err_milli"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# corpus economics
# ---------------------------------------------------------------------------

def _fp_spark() -> "F.Column":
    """Shared fingerprint: md5 of the first two lowercased whitespace
    tokens — coarse enough to collide at every SF (exact text hashes
    are unique below sf0.1), the granularity template/boilerplate
    contamination shows up at.  A function, not a module constant:
    Column construction needs an active SparkContext."""
    return F.md5(
        F.array_join(F.slice(F.split(F.lower(F.col("text")), " "), 1, 2), " ")
    )


_FP_SQL = (
    "md5(array_to_string(list_slice(string_split(LOWER(text), ' '), 1, 2)"
    ", ' '))"
)


@register(
    "corpus_novelty_curve",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id // 100 AS batch,
               md5(text) AS exact_h,
               {_FP_SQL} AS fp
        FROM documents
    ), per_batch AS (
        SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM docs GROUP BY batch
    ), first_exact AS (
        SELECT MIN(batch) AS batch FROM docs GROUP BY exact_h
    ), new_exact AS (
        SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_new_exact
        FROM first_exact GROUP BY batch
    ), first_fp AS (
        SELECT MIN(batch) AS batch FROM docs GROUP BY fp
    ), new_fp AS (
        SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_new_fp
        FROM first_fp GROUP BY batch
    ), joined AS (
        SELECT p.batch, p.n_docs,
               COALESCE(e.n_new_exact, 0) AS n_new_exact,
               COALESCE(f.n_new_fp, 0) AS n_new_fp
        FROM per_batch p
        LEFT JOIN new_exact e ON p.batch = e.batch
        LEFT JOIN new_fp f ON p.batch = f.batch
    )
    SELECT batch, n_docs, n_new_exact, n_new_fp,
           ROUND(100.0 * CAST(n_new_fp AS DOUBLE) / n_docs, 4)
               AS fp_novelty_pct,
           ROUND(100.0 * CAST(SUM(n_new_fp) OVER (
                     ORDER BY batch ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / SUM(n_docs) OVER (
                     ORDER BY batch ROWS UNBOUNDED PRECEDING), 4)
               AS cum_fp_novelty_pct
    FROM joined
    ORDER BY batch
    """,
)
def corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-novelty curve over ingestion batches (doc_id blocks of
    100): per batch, how many documents are first-seen at exact-hash
    granularity and at template-fingerprint granularity (first-2-token
    md5), plus the cumulative fingerprint novelty rate.  This is the
    "marginal value of new data" economics a 100 TB crawl pipeline
    watches: when cum_fp_novelty flattens, additional ingestion buys
    boilerplate, not content — the signal to rebalance sources.

    Scale: fingerprints are one projection pass; first-seen is a
    MIN-aggregate per hash (partial-aggregable); the cumulative
    window runs over batch grain (rows = corpus/100-block count).
    At 100 TB the fingerprint projection is materialized once and
    all three aggregates share it."""
    docs = table(spark, sf_dir, "documents").select(
        # integer division on BOTH sides (oracle: doc_id // 100) so the
        # parity holds for ids beyond 2^53, where double division stops
        # being exact (round-7 ADVICE, trimmed per round-8 ADVICE)
        F.expr("doc_id div 100").alias("batch"),
        F.md5("text").alias("exact_h"),
        _fp_spark().alias("fp"),
    )
    per_batch = docs.groupBy("batch").agg(F.count(F.lit(1)).alias("n_docs"))
    new_exact = (
        docs.groupBy("exact_h")
        .agg(F.min("batch").alias("batch"))
        .groupBy("batch")
        .agg(F.count(F.lit(1)).alias("n_new_exact"))
    )
    new_fp = (
        docs.groupBy("fp")
        .agg(F.min("batch").alias("batch"))
        .groupBy("batch")
        .agg(F.count(F.lit(1)).alias("n_new_fp"))
    )
    joined = (
        per_batch.join(new_exact, "batch", "left")
        .join(new_fp, "batch", "left")
        .select(
            "batch",
            "n_docs",
            F.coalesce("n_new_exact", F.lit(0)).alias("n_new_exact"),
            F.coalesce("n_new_fp", F.lit(0)).alias("n_new_fp"),
        )
    )
    wcum = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "batch",
        "n_docs",
        "n_new_exact",
        "n_new_fp",
        F.round(
            100.0 * F.col("n_new_fp").cast("double") / F.col("n_docs"), 4
        ).alias("fp_novelty_pct"),
        F.round(
            100.0
            * F.sum("n_new_fp").over(wcum).cast("double")
            / F.sum("n_docs").over(wcum),
            4,
        ).alias("cum_fp_novelty_pct"),
    ).orderBy("batch")


@register(
    "cross_source_fingerprint_overlap",
    oracle=f"""
    WITH fps AS (
        SELECT DISTINCT source, {_FP_SQL} AS fp FROM documents
    ), per_source AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_fp
        FROM fps GROUP BY source
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fp,
           ROUND(100.0 * CAST(COUNT(*) AS DOUBLE)
                 / LEAST(MIN(pa.n_fp), MIN(pb.n_fp)), 4)
               AS pct_of_smaller
    FROM fps a
    JOIN fps b ON a.fp = b.fp AND a.source < b.source
    JOIN per_source pa ON pa.source = a.source
    JOIN per_source pb ON pb.source = b.source
    GROUP BY a.source, b.source
    ORDER BY source_a, source_b
    """,
)
def cross_source_fingerprint_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, the
    number of shared template fingerprints (first-2-token md5) and
    the overlap as a share of the smaller source's fingerprint
    vocabulary.  High overlap between nominally independent sources
    means the dedup stage must run ACROSS them (and the source-
    stratified split in `group_aware_split` would otherwise leak) —
    the per-pair screen that decides the dedup scope.

    Scale: the join is an equi-join ON the fingerprint — candidate
    pairs are generated per shared fingerprint, never all-pairs of
    documents; per-source vocab sizes broadcast onto the pair
    grain."""
    fps = (
        table(spark, sf_dir, "documents")
        .select("source", _fp_spark().alias("fp"))
        .distinct()
    )
    per_source = fps.groupBy("source").agg(F.count(F.lit(1)).alias("n_fp"))
    a = fps.alias("a")
    b = fps.alias("b")
    pairs = a.join(
        b,
        (F.col("a.fp") == F.col("b.fp"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
    )
    pa = per_source.select(
        F.col("source").alias("source_a"), F.col("n_fp").alias("n_fp_a")
    )
    pb = per_source.select(
        F.col("source").alias("source_b"), F.col("n_fp").alias("n_fp_b")
    )
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fp"))
        .join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared_fp",
            F.round(
                100.0 * F.col("n_shared_fp").cast("double")
                / F.least("n_fp_a", "n_fp_b"),
                4,
            ).alias("pct_of_smaller"),
        )
        .orderBy("source_a", "source_b")
    )
