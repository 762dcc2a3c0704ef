"""Round-5 analytics additions: behavioral paths and time-weighted
state (user journeys), inferential statistics (Welch t-test, Pearson
correlation matrix), inequality/forensic audits (Gini, Benford), and
corpus governance entropy.  Extends SURVEY.md §2.4/§2.5 the same way
queries_analytics4.py did — every query oracle-checked from day one.

Scale notes (100 TB): all fact-table passes are partial-aggregable
groupBys or keyed windows (per-user, per-nation — parallel across
keys, bounded per key); the only unpartitioned windows run above
aggregates with at most a few hundred rows (digit histogram, source
rollup).  Float-ordered ranks follow the suite contract: orderings
only over ROUND()ed sums (queries_tpch2.py), so engine ulps cannot
flip a rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from .registry import register


@register(
    "user_path_top10",
    oracle="""
    WITH r AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    p AS (
        SELECT user_id,
               MIN(CASE WHEN rn = 1 THEN event_type END) || '>' ||
               MIN(CASE WHEN rn = 2 THEN event_type END) || '>' ||
               MIN(CASE WHEN rn = 3 THEN event_type END) AS path
        FROM r WHERE rn <= 3
        GROUP BY user_id
        HAVING COUNT(*) = 3
    )
    SELECT path, COUNT(*) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path NULLS LAST
    LIMIT 10
    """,
)
def user_path_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 opening user journeys: each user's first three events
    (time-ordered, event_id tie-break) concatenated into a path
    string, counted across users.  The product-analytics "where do
    sessions start" view.  One keyed window over the facts, then a
    path-grain rollup — partial-aggregable, path cardinality bounded
    by |event_types|^3."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    p = (
        r.groupBy("user_id")
        .agg(
            # F.concat, not concat_ws: NULL-propagating like the oracle's
            # `||`, so a NULL event_type yields a NULL path in BOTH engines
            # instead of a silently shortened path here (round-5 ADVICE).
            F.concat(
                F.min(F.when(F.col("rn") == 1, F.col("event_type"))),
                F.lit(">"),
                F.min(F.when(F.col("rn") == 2, F.col("event_type"))),
                F.lit(">"),
                F.min(F.when(F.col("rn") == 3, F.col("event_type"))),
            ).alias("path"),
            F.count(F.lit(1)).alias("k"),
        )
        .filter(F.col("k") == 3)
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        # asc_nulls_last pins the tie-break for the NULL-path group
        # (a NULL event_type propagates through F.concat) to DuckDB's
        # default NULLS LAST — Spark's ASC default is NULLS FIRST.
        .orderBy(F.desc("n_users"), F.asc_nulls_last("path"))
        .limit(10)
    )


@register(
    "time_weighted_avg_value",
    oracle="""
    WITH s AS (
        SELECT user_id, value,
               EXTRACT(EPOCH FROM
                   LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) - ts)
                   AS dt
        FROM events
    )
    SELECT user_id, ROUND(SUM(value * dt) / SUM(dt), 2) AS twa_value
    FROM s WHERE dt IS NOT NULL AND dt > 0
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average event value per user: each value is held
    until the user's next event (LEAD), weighted by the holding
    duration — the portfolio/telemetry estimator that plain AVG gets
    wrong when sampling is irregular.  Keyed window + one rollup."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    s = ev.select(
        "user_id",
        "value",
        ((F.lead(micros).over(w) - micros) / 1e6).alias("dt"),
    )
    return (
        s.filter(F.col("dt").isNotNull() & (F.col("dt") > 0))
        .groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 2).alias(
                "twa_value"
            )
        )
        .orderBy("user_id")
    )


@register(
    "welch_ttest_purchase_view",
    oracle="""
    SELECT
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_purchase,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_view,
        ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END)
              - AVG(CASE WHEN event_type = 'view' THEN value END), 4)
            AS mean_diff,
        ROUND((AVG(CASE WHEN event_type = 'purchase' THEN value END)
               - AVG(CASE WHEN event_type = 'view' THEN value END))
              / SQRT(VAR_SAMP(CASE WHEN event_type = 'purchase' THEN value END)
                     / SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     + VAR_SAMP(CASE WHEN event_type = 'view' THEN value END)
                     / SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)),
              4) AS t_stat
    FROM events
    WHERE event_type IN ('purchase', 'view')
    """,
)
def welch_ttest_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic comparing purchase vs view
    event values — the A/B-readout primitive.  ONE conditional
    aggregate pass (no join, no subquery): counts, means, and sample
    variances of both arms come out of the same partial-aggregable
    scan."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    is_p = F.when(F.col("event_type") == "purchase", F.col("value"))
    is_v = F.when(F.col("event_type") == "view", F.col("value"))
    one_p = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    one_v = F.when(F.col("event_type") == "view", 1).otherwise(0)
    agg = ev.agg(
        F.sum(one_p).cast("long").alias("n_purchase"),
        F.sum(one_v).cast("long").alias("n_view"),
        F.avg(is_p).alias("mp"),
        F.avg(is_v).alias("mv"),
        F.var_samp(is_p).alias("vp"),
        F.var_samp(is_v).alias("vv"),
    )
    se = F.sqrt(
        F.col("vp") / F.col("n_purchase") + F.col("vv") / F.col("n_view")
    )
    return agg.select(
        "n_purchase",
        "n_view",
        F.round(F.col("mp") - F.col("mv"), 4).alias("mean_diff"),
        F.round((F.col("mp") - F.col("mv")) / se, 4).alias("t_stat"),
    )


@register(
    "gini_revenue_by_nation",
    oracle="""
    WITH cr AS (
        SELECT c.c_nationkey, o.o_custkey,
               ROUND(SUM(o.o_totalprice), 2) AS rev
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT n.n_name AS nation, cr.rev,
               ROW_NUMBER() OVER (PARTITION BY n.n_name
                                  ORDER BY cr.rev, cr.o_custkey) AS i,
               COUNT(*) OVER (PARTITION BY n.n_name) AS nc,
               SUM(cr.rev) OVER (PARTITION BY n.n_name) AS tot
        FROM cr JOIN nation n ON n.n_nationkey = cr.c_nationkey
    )
    SELECT nation, CAST(nc AS BIGINT) AS n_customers,
           ROUND(2.0 * SUM(i * rev) / (nc * tot) - (nc + 1.0) / nc, 4)
               AS gini
    FROM ranked
    GROUP BY nation, nc, tot
    ORDER BY nation
    """,
)
def gini_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-revenue concentration per nation
    (the rank-sum identity G = 2·Σ i·x_i / (n·Σx) − (n+1)/n over
    ascending-ranked revenues) — the inequality audit behind the
    Pareto view.  Rank runs over ROUND()ed per-customer sums
    (customer-grain, far smaller than the fact table) with a key
    tie-break, per the suite's float-ordering contract."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    cr = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), "rev", "o_custkey")
    )
    wp = Window.partitionBy("nation")
    ranked = cr.select(
        "nation",
        "rev",
        F.row_number()
        .over(Window.partitionBy("nation").orderBy("rev", "o_custkey"))
        .alias("i"),
        F.count(F.lit(1)).over(wp).alias("nc"),
        F.sum("rev").over(wp).alias("tot"),
    )
    return (
        ranked.groupBy("nation", "nc", "tot")
        .agg(
            F.round(
                2.0 * F.sum(F.col("i") * F.col("rev")) / (F.col("nc") * F.col("tot"))
                - (F.col("nc") + 1.0) / F.col("nc"),
                4,
            ).alias("gini")
        )
        .select("nation", F.col("nc").cast("long").alias("n_customers"), "gini")
        .orderBy("nation")
    )


@register(
    "benford_first_digit_audit",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit)
    SELECT digit, CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / SUM(n) OVER (), 4) AS observed_p,
           ROUND(LOG10(1.0 + 1.0 / digit), 4) AS benford_p,
           ROUND(POWER(n * 1.0 / SUM(n) OVER ()
                       - LOG10(1.0 + 1.0 / digit), 2)
                 / LOG10(1.0 + 1.0 / digit) * SUM(n) OVER (), 4)
               AS chi2_term
    FROM c
    ORDER BY digit
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensic audit of order totals: observed
    first-digit frequencies vs log10(1+1/d) expectation with the
    per-digit chi-square contribution — the fraud/data-generation
    smoke test.  One digit-grain rollup; the unpartitioned window
    runs over the 9-row aggregate."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = F.sum("n").over(Window.partitionBy())
    obs = F.col("n") / tot
    exp = F.log10(1.0 + 1.0 / F.col("digit"))
    return c.select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.round(obs, 4).alias("observed_p"),
        F.round(exp, 4).alias("benford_p"),
        F.round(F.pow(obs - exp, 2) / exp * tot, 4).alias("chi2_term"),
    ).orderBy("digit")


@register(
    "numeric_corr_matrix_lineitem",
    oracle="""
    SELECT col_a, col_b, corr_v FROM (
        SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
               ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_v
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', 'l_discount',
               ROUND(corr(l_quantity, l_discount), 4) FROM lineitem
        UNION ALL
        SELECT 'l_quantity', 'l_tax',
               ROUND(corr(l_quantity, l_tax), 4) FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount',
               ROUND(corr(l_extendedprice, l_discount), 4) FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', 'l_tax',
               ROUND(corr(l_extendedprice, l_tax), 4) FROM lineitem
        UNION ALL
        SELECT 'l_discount', 'l_tax',
               ROUND(corr(l_discount, l_tax), 4) FROM lineitem
    ) ORDER BY col_a, col_b
    """,
)
def numeric_corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of the four lineitem
    numeric measures, long form — the feature-screening pass before
    any model fit.  ONE scan computes all six coefficients as
    parallel aggregates (the oracle's six scans are DuckDB-side
    only); stack() unpivots the 1-row aggregate JVM-side.  Pearson is
    built from covar_samp/stddev with a zero-variance guard because
    Spark's ANSI corr() raises DIVIDE_BY_ZERO on a constant column
    where DuckDB's corr() returns NULL (pinned in test_round5)."""
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]

    def corr(a: str, b: str):
        denom = F.stddev_samp(a) * F.stddev_samp(b)
        return F.round(
            F.when(denom > 0, F.covar_samp(a, b) / denom), 4
        )

    agg = li.agg(
        *[corr(a, b).alias(f"c{i}") for i, (a, b) in enumerate(pairs)]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', c{i}" for i, (a, b) in enumerate(pairs)
    )
    return agg.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr_v)"
    ).orderBy("col_a", "col_b")


@register(
    "lang_entropy_by_source",
    oracle="""
    WITH c AS (
        SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
    ),
    p AS (
        SELECT source, n * 1.0 / SUM(n) OVER (PARTITION BY source) AS p
        FROM c
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(-SUM(p * LOG2(p)), 4) AS lang_entropy
    FROM p
    GROUP BY source
    ORDER BY source
    """,
)
def lang_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's language mix — the corpus
    governance signal for monolingual-collapse or crawl-contamination
    per provenance bucket.  The windows run over the (source, lang)
    aggregate (≤ |sources|·|langs| rows), never the corpus."""
    docs = table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source")
    p = F.col("n") / F.sum("n").over(w)
    return (
        c.select("source", "lang", (p * F.log2(p)).alias("term"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.round(-F.sum("term"), 4).alias("lang_entropy"),
        )
        .orderBy("source")
    )


@register(
    "daily_revenue_gapfill_interp",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               FLOOR(SUM(o_totalprice * 100) + 0.5) / 100.0 AS rev
        FROM orders GROUP BY 1
    ),
    cal AS (
        SELECT CAST(unnest(generate_series(MIN(day), MAX(day),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM daily
    ),
    j AS (SELECT c.day, d.rev FROM cal c LEFT JOIN daily d USING (day)),
    f AS (
        SELECT day, rev,
               LAST_VALUE(rev IGNORE NULLS) OVER (
                   ORDER BY day ROWS UNBOUNDED PRECEDING) AS prev_rev,
               LAST_VALUE(CASE WHEN rev IS NOT NULL THEN day END
                          IGNORE NULLS) OVER (
                   ORDER BY day ROWS UNBOUNDED PRECEDING) AS prev_day,
               FIRST_VALUE(rev IGNORE NULLS) OVER (
                   ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_rev,
               FIRST_VALUE(CASE WHEN rev IS NOT NULL THEN day END
                           IGNORE NULLS) OVER (
                   ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_day
        FROM j
    )
    SELECT day,
           COALESCE(rev,
                    FLOOR((prev_rev + (next_rev - prev_rev)
                           * (day - prev_day) / (next_day - prev_day))
                          * 100 + 0.5) / 100.0) AS revenue,
           CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS filled
    FROM f
    ORDER BY day
    """,
)
def daily_revenue_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill with linear interpolation: the daily revenue
    series densified over the full min..max date range, missing days
    reconstructed from the nearest real neighbors (the time-series
    regularization step before any rolling model).  The sf0.01 orders
    calendar has 6 genuinely missing days.  Calendar generation is a
    1-row sequence() explode; the fill windows run over day-grain
    aggregate rows (~2 years = ~750), never the fact table."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(
        # SUM(price*100) is integer-valued, so FLOOR(x+0.5) recovers the
        # exact cent total in both engines regardless of accumulation
        # order — ROUND(SUM(price),2) can split on an ulp at .xx5.
        (F.floor(F.sum(F.col("o_totalprice") * 100) + 0.5) / 100.0).alias("rev")
    )
    cal = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(F.explode(F.sequence("d0", "d1")).alias("day"))
    j = cal.join(daily, "day", "left")
    wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    real_day = F.when(F.col("rev").isNotNull(), F.col("day"))
    f = j.select(
        "day",
        "rev",
        F.last("rev", ignorenulls=True).over(wp).alias("prev_rev"),
        F.last(real_day, ignorenulls=True).over(wp).alias("prev_day"),
        F.first("rev", ignorenulls=True).over(wn).alias("next_rev"),
        F.first(real_day, ignorenulls=True).over(wn).alias("next_day"),
    )
    interp = F.col("prev_rev") + (F.col("next_rev") - F.col("prev_rev")) * F.datediff(
        "day", "prev_day"
    ) / F.datediff("next_day", "prev_day")
    # FLOOR(x*100 + 0.5)/100 instead of ROUND: identical half-handling
    # in both engines (Spark ROUND is BigDecimal HALF_UP of the exact
    # double, DuckDB rounds the decimal repr — they disagree on .xx5).
    interp2 = F.floor(interp * 100 + 0.5) / 100.0
    return f.select(
        "day",
        F.coalesce(F.col("rev"), interp2).alias("revenue"),
        F.when(F.col("rev").isNull(), 1).otherwise(0).alias("filled"),
    ).orderBy("day")


@register(
    "daily_revenue_moving_median",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               FLOOR(SUM(o_totalprice * 100) + 0.5) / 100.0 AS rev
        FROM orders GROUP BY 1
    )
    SELECT day, rev,
           FLOOR(MEDIAN(rev) OVER (
               ORDER BY day
               RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
               * 100 + 0.5) / 100.0 AS med7
    FROM daily
    ORDER BY day
    """,
)
def daily_revenue_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing moving MEDIAN of daily revenue — the
    outlier-robust smoother (a holistic aggregate, which Spark windows
    cannot frame — INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC — so the
    trailing week is materialized as a bounded day-range self-join
    over the ~750-row day-grain aggregate, then MEDIAN runs as a
    grouped aggregate; the DuckDB oracle states the same semantics as
    a framed window).  Medians of ROUND()ed sums are order statistics,
    so both engines pick identical values."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(
        # SUM(price*100) is integer-valued, so FLOOR(x+0.5) recovers the
        # exact cent total in both engines regardless of accumulation
        # order — ROUND(SUM(price),2) can split on an ulp at .xx5.
        (F.floor(F.sum(F.col("o_totalprice") * 100) + 0.5) / 100.0).alias("rev")
    )
    win = daily.select(F.col("day").alias("wday"), F.col("rev").alias("wrev"))
    return (
        daily.join(
            F.broadcast(win),
            (F.col("wday") >= F.date_sub("day", 6)) & (F.col("wday") <= F.col("day")),
        )
        .groupBy("day", "rev")
        .agg((F.floor(F.median("wrev") * 100 + 0.5) / 100.0).alias("med7"))
        .orderBy("day")
    )


@register(
    "user_active_day_streaks",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    g AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
        FROM d
    ),
    s AS (
        SELECT user_id, MIN(day) AS start_day, MAX(day) AS end_day,
               CAST(COUNT(*) AS BIGINT) AS streak_len
        FROM g GROUP BY user_id, grp
    )
    SELECT user_id, start_day, end_day, streak_len
    FROM s
    ORDER BY streak_len DESC, user_id, start_day
    LIMIT 20
    """,
)
def user_active_day_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: the 20 longest consecutive-active-day streaks
    across users, via the classic day − ROW_NUMBER() group key (a
    constant within each unbroken run).  Day-grain dedup first, so the
    window rides user×day rows, not raw events."""
    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.select(
        "user_id",
        "day",
        F.date_sub("day", F.row_number().over(w)).alias("grp"),
    )
    return (
        g.groupBy("user_id", "grp")
        .agg(
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
            F.count(F.lit(1)).alias("streak_len"),
        )
        .select("user_id", "start_day", "end_day", "streak_len")
        .orderBy(F.desc("streak_len"), "user_id", "start_day")
        .limit(20)
    )


@register(
    "basket_lift_top_pairs",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    t AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    bc AS (SELECT p_brand, COUNT(*) AS nb FROM ob GROUP BY 1),
    pairs AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS nab
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, CAST(nab AS BIGINT) AS n_both,
           ROUND(nab * 1.0 / t.n_orders, 4) AS support,
           ROUND(nab * 1.0 / ca.nb, 4) AS confidence,
           ROUND(nab * 1.0 * t.n_orders / (ca.nb * cb.nb), 4) AS lift
    FROM pairs
    JOIN bc ca ON ca.p_brand = brand_a
    JOIN bc cb ON cb.p_brand = brand_b
    CROSS JOIN t
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 20
    """,
)
def basket_lift_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets of part
    brands: support, confidence, and the top-20 pairs by lift —
    extends part_cooccurrence_top20 with the normalized association
    strength.  Baskets are brand-sets aggregated per order in ONE
    shuffle; pairs come from chained explodes over each basket array
    (map-side, bounded by brands-per-order², never corpus all-pairs);
    the 1-row total broadcasts.  Lift values are integer ratios
    computed identically in both engines, so the ordering cannot
    flip."""
    li = table(spark, sf_dir, "lineitem")
    pt = table(spark, sf_dir, "part")
    # One basket-build shuffle: collect_set(brand) per order replaces
    # the old distinct + keyed self-join (which shipped the (order,
    # brand) stream through three exchanges — 21 MB, the suite's worst
    # shuffler in SHUFFLE_r05).  Pair generation is two chained
    # explodes over the basket array — map-side, no shuffle — and the
    # pair rollup's map-side combine ships only (brand_a, brand_b)
    # partial counts, bounded by |brands|² per task.
    baskets = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.collect_set("p_brand").alias("brands"))
    )
    t = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    ob = baskets.select(
        "l_orderkey", F.explode("brands").alias("p_brand")
    )
    bc = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("nb"))
    pairs = (
        baskets.select(F.explode("brands").alias("brand_a"), "brands")
        .select("brand_a", F.explode("brands").alias("brand_b"))
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("nab"))
    )
    # The per-brand count renames stay OUTSIDE the broadcast subtrees:
    # renaming inside them made the two build sides canonically
    # different, so ReuseExchange rebuilt the whole basket pipeline for
    # each (round-13, guide §2.4 — same fix as bloom_filter_fp_audit);
    # with bare `bc` on both sides the second build is a
    # ReusedExchange.
    ca, cb = bc.alias("ca"), bc.alias("cb")
    return (
        pairs.join(F.broadcast(ca), F.col("brand_a") == F.col("ca.p_brand"))
        .join(F.broadcast(cb), F.col("brand_b") == F.col("cb.p_brand"))
        .crossJoin(F.broadcast(t))
        .select(
            "brand_a",
            "brand_b",
            F.col("nab").cast("long").alias("n_both"),
            F.round(F.col("nab") * 1.0 / F.col("n_orders"), 4).alias("support"),
            F.round(F.col("nab") * 1.0 / F.col("ca.nb"), 4).alias("confidence"),
            F.round(
                F.col("nab") * 1.0 * F.col("n_orders")
                / (F.col("ca.nb") * F.col("cb.nb")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(20)
    )


@register(
    "quantity_weighted_median_price",
    oracle="""
    WITH g AS (
        SELECT l_returnflag, l_extendedprice,
               CAST(SUM(l_quantity) AS DOUBLE) AS qty
        FROM lineitem GROUP BY l_returnflag, l_extendedprice
    ),
    w AS (
        SELECT l_returnflag, l_extendedprice,
               SUM(qty) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice
                   ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(qty) OVER (PARTITION BY l_returnflag) AS tot
        FROM g
    )
    SELECT l_returnflag,
           ROUND(MIN(l_extendedprice), 2) AS weighted_median_price
    FROM w WHERE cum >= tot / 2
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def quantity_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of extended price per return flag: the
    first price (ascending) whose cumulative quantity reaches half the
    flag's total — the inventory-weighted price center plain MEDIAN
    misses.  Two-phase bucketed plan (round-8 verdict #5): phase A
    partial-aggregates quantities into fixed-width price bins
    (floor(price/100), ~1k bins over the TPC-H price range), runs the
    cumulative window over BIN grain (a few thousand rows at every
    sf), and extracts per flag the boundary bin — the first bin whose
    bin-cumulative reaches half the total — together with the exact
    cumulative below it.  Phase B broadcast-joins that 3-row boundary
    table back and refines EXACTLY within the boundary bin only
    (~1/1000 of the fact table), so no window ever sorts the near-
    distinct (flag, price) grain that made the previous plan the #3
    shuffler (1.19 M window records → a few thousand).  Equivalence
    is exact: floor(p/100) is monotone in p (IEEE division and floor
    are both monotone), so bins are contiguous price intervals; the
    oracle's first crossing price lies in the first bin whose
    cumulative reaches tot/2, and within it cum_below + in-bin
    cumulative equals the global cumulative.  Quantities are
    integer-valued doubles, so every running sum is exact in both
    engines and tot/2 is an exact x.0/x.5 — the boundary test cannot
    flip."""
    li = table(spark, sf_dir, "lineitem")
    pbin = F.floor(F.col("l_extendedprice") / 100.0)
    bins = li.groupBy("l_returnflag", pbin.alias("pb")).agg(
        F.sum("l_quantity").cast("double").alias("qty")
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("pb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("l_returnflag")
    b = bins.select(
        "l_returnflag",
        "pb",
        "qty",
        F.sum("qty").over(wcum).alias("cum"),
        F.sum("qty").over(wtot).alias("tot"),
    )
    # Boundary bin per flag: min pb among bins whose cumulative reaches
    # tot/2.  cum is monotone in pb within a flag, so min(cum) and
    # min_by(qty, pb) both describe that same boundary row; the exact
    # cumulative strictly below the bin is cum - qty.
    boundary = (
        b.filter(F.col("cum") >= F.col("tot") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.min("pb").alias("pb"),
            (F.min("cum") - F.min_by("qty", "pb")).alias("cum_below"),
            F.min("tot").alias("tot"),
        )
        .withColumnRenamed("l_returnflag", "b_flag")
    )
    refine = li.join(
        F.broadcast(boundary),
        (F.col("l_returnflag") == F.col("b_flag")) & (pbin == F.col("pb")),
    ).groupBy("l_returnflag", "l_extendedprice", "cum_below", "tot").agg(
        F.sum("l_quantity").cast("double").alias("qty")
    )
    wcum_p = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        refine.select(
            "l_returnflag",
            "l_extendedprice",
            (F.col("cum_below") + F.sum("qty").over(wcum_p)).alias("cum"),
            "tot",
        )
        .filter(F.col("cum") >= F.col("tot") / 2)
        .groupBy("l_returnflag")
        .agg(F.round(F.min("l_extendedprice"), 2).alias("weighted_median_price"))
        .orderBy("l_returnflag")
    )


@register(
    "hash_bucket_balance_audit",
    oracle="""
    WITH b AS (
        SELECT CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)
                    AS BIGINT) % 32 AS bucket,
               o_custkey
        FROM orders
    ),
    c AS (
        SELECT bucket, COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS nk
        FROM b GROUP BY bucket
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(n AS BIGINT) AS n_rows,
           CAST(nk AS BIGINT) AS n_keys,
           ROUND(n * 32.0 / SUM(n) OVER (), 4) AS load_factor
    FROM c
    ORDER BY bucket
    """,
)
def hash_bucket_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-partition balance audit: orders hashed into 32 buckets
    by md5(o_custkey) with per-bucket row/key counts and the load
    factor vs the uniform ideal — the pre-flight skew check for any
    repartition/bucketing plan (companion to join_key_skew_audit,
    which profiles the raw key histogram).  md5 keeps the bucket
    assignment reproducible in the DuckDB oracle; the production
    path would use Spark's own hash() the same way."""
    from .queries_dedup_oracle import _md5int

    o = table(spark, sf_dir, "orders")
    b = o.select(
        (_md5int(F.col("o_custkey").cast("string")) % 32).alias("bucket"),
        "o_custkey",
    )
    c = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_custkey").alias("nk"),
    )
    return c.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("n").cast("long").alias("n_rows"),
        F.col("nk").cast("long").alias("n_keys"),
        F.round(
            F.col("n") * 32.0 / F.sum("n").over(Window.partitionBy()), 4
        ).alias("load_factor"),
    ).orderBy("bucket")


@register(
    "acctbal_percentile_profile",
    oracle="""
    WITH g AS (
        SELECT c_mktsegment, c_acctbal, COUNT(*) AS n
        FROM customer GROUP BY c_mktsegment, c_acctbal
    ),
    w AS (
        SELECT c_mktsegment, c_acctbal, n,
               SUM(n) OVER (
                   PARTITION BY c_mktsegment ORDER BY c_acctbal
                   ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(n) OVER (PARTITION BY c_mktsegment) AS tot
        FROM g
    )
    SELECT c_mktsegment,
           CAST(LEAST((cum - n) * 10 // tot, 9) AS INTEGER) AS decile,
           CAST(SUM(n) AS BIGINT) AS n_customers,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal
    FROM w
    GROUP BY c_mktsegment, decile
    ORDER BY c_mktsegment, decile
    """,
)
def acctbal_percentile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment account-balance DECILE profile: customers bucketed
    by their within-segment balance percentile into ten bands, with
    per-band counts and balance ranges.  Re-grained per the round-5
    verdict (#4): the old form ran PERCENT_RANK over every raw
    customer row partitioned five ways and emitted one row per
    customer — both the sort skew and the result grew with the data.
    This form aggregates to (segment, distinct balance) FIRST — a
    partial-aggregable shuffle, grain bounded by the balance domain
    (~1.1 M cents-granular values) regardless of row count — then the
    cumulative window runs above that aggregate (plan-audit
    discipline) and the output is a fixed ≤ 5×10 rows.  The decile is
    integer arithmetic ((rows strictly below) * 10 DIV total), so no
    float boundary can flip a bucket between engines."""
    c = table(spark, sf_dir, "customer")
    g = c.groupBy("c_mktsegment", "c_acctbal").agg(
        F.count(F.lit(1)).alias("n")
    )
    wcum = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("c_mktsegment")
    w = g.select(
        "c_mktsegment",
        "c_acctbal",
        "n",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wtot).alias("tot"),
    )
    return (
        w.select(
            "c_mktsegment",
            F.least(
                F.expr("(cum - n) * 10 div tot"), F.lit(9)
            ).cast("int").alias("decile"),
            "c_acctbal",
            "n",
        )
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.sum("n").cast("long").alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("c_mktsegment", "decile")
    )
