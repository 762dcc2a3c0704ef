"""Round-4 analytics additions: behavioral/event analytics (gap
sessionization, cohort retention, anomaly z-scores, lateness audit,
RFM), financial distribution analytics (Pareto concentration, YoY
growth, balance deciles), and corpus statistics for training-data
curation (Zipf slope, type-token ratio, token-length histogram,
embedding-norm outliers).  Generalizes SURVEY.md §2.4 (aggregations)
/ §2.5 (windows) and extends the §2.11 X4 text-analysis tier with
corpus-health statistics.  All oracle-checked (driver-window
candidates from day one — round-3 verdict ask #6).

Scale notes (100 TB): every query is either a keyed window (partition
by user/nation/label — parallel across keys, bounded per key) or a
partial-aggregable groupBy; the only total-order windows (deciles,
Zipf ranks, RFM quartiles) run on post-aggregate rows (users,
distinct words, customers), orders of magnitude smaller than the
fact tables, and would switch to approx_percentile binning at
extreme cardinalities (the documented trade — see
quantiles_approx_scale_variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions import tokens
from .registry import register


@register(
    "sessionize_events_gap",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, value,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events
    ), flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN prev_ts IS NULL
                         OR ts > prev_ts + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM ordered
    ), sess AS (
        SELECT user_id, ts, value,
               CAST(SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           ROUND(EXTRACT(EPOCH FROM MAX(ts) - MIN(ts)), 3) AS duration_sec,
           ROUND(SUM(value), 2) AS total_value
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def sessionize_events_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-sessionization (30-min inactivity): the classic
    lag→boundary-flag→running-sum pattern.  The batch twin of the
    streaming session window (events_session_10m) with explicit
    session ids and per-session stats.  Both windows partition by
    user_id — parallel across users, sort bounded per user; the
    session rollup reuses the same hash partitioning."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        "value",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "session_id"
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                (
                    F.unix_micros(F.max("ts").cast("timestamp"))
                    - F.unix_micros(F.min("ts").cast("timestamp"))
                )
                / 1e6,
                3,
            ).alias("duration_sec"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "event_retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS active_week
        FROM events
    )
    SELECT f.cohort_week,
           CAST((a.active_week - f.cohort_week) / 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_users
    FROM first_seen f
    JOIN activity a ON f.user_id = a.user_id
    GROUP BY f.cohort_week, week_offset
    ORDER BY f.cohort_week, week_offset
    """,
)
def event_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week,
    counted per week-offset of later activity.  Two partial-aggregable
    passes over events plus one user-keyed join — both sides are
    user-grained (≪ event-grained), and the join key is the group key,
    so the shuffle is already aligned."""
    ev = table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .select(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n,
           ROUND((n - AVG(n) OVER (PARTITION BY event_type))
                 / STDDEV_SAMP(n) OVER (PARTITION BY event_type), 4) AS z
    FROM daily
    ORDER BY event_type, day
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: per-type daily event counts scored as
    z-scores against the type's own mean/stddev.  The window runs on
    post-aggregate (type, day) rows — one day-count shuffle over the
    facts, then a per-type window over ~30 rows/type regardless of
    corpus size."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    return daily.select(
        "event_type",
        "day",
        "n",
        F.round(
            (F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w), 4
        ).alias("z"),
    ).orderBy("event_type", "day")


@register(
    "orders_running_share_pareto",
    oracle="""
    WITH cust_rev AS (
        SELECT c.c_nationkey, o.o_custkey, SUM(o.o_totalprice) AS rev
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), ranked AS (
        SELECT n.n_name AS nation, cr.rev, cr.o_custkey,
               SUM(cr.rev) OVER (PARTITION BY n.n_name
                                 ORDER BY cr.rev DESC, cr.o_custkey
                                 ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cr.rev) OVER (PARTITION BY n.n_name) AS tot
        FROM cust_rev cr JOIN nation n ON n.n_nationkey = cr.c_nationkey
    )
    SELECT nation, COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN ROUND(cum - rev, 2) < ROUND(0.8 * tot, 2)
                         THEN 1 ELSE 0 END)
                AS BIGINT) AS n_top80,
           ROUND(MAX(tot), 2) AS total_revenue
    FROM ranked
    GROUP BY nation
    ORDER BY nation
    """,
)
def orders_running_share_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto 80/20): per nation, how many
    customers carry 80 % of revenue.  Customer-grain aggregate first
    (partial-agg over orders), then a per-nation running-sum window
    over customer rows — bounded per nation, parallel across
    nations."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    cust_rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), "rev", "o_custkey")
    )
    wcum = (
        Window.partitionBy("nation")
        .orderBy(F.desc("rev"), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("nation")
    ranked = cust_rev.select(
        "nation",
        "rev",
        F.sum("rev").over(wcum).alias("cum"),
        F.sum("rev").over(wtot).alias("tot"),
    )
    return (
        ranked.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(
                F.when(
                    F.round(F.col("cum") - F.col("rev"), 2)
                    < F.round(0.8 * F.col("tot"), 2),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_top80"),
            F.round(F.max("tot"), 2).alias("total_revenue"),
        )
        .orderBy("nation")
    )


@register(
    "orders_yoy_growth_by_nation",
    oracle="""
    WITH yearly AS (
        SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS yr,
               ROUND(SUM(o.o_totalprice), 2) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
    )
    SELECT nation, yr, revenue,
           ROUND(100.0 * (revenue - LAG(revenue) OVER w)
                 / LAG(revenue) OVER w, 2) AS yoy_pct
    FROM yearly
    WINDOW w AS (PARTITION BY nation ORDER BY yr)
    ORDER BY nation, yr
    """,
)
def orders_yoy_growth_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation: partitioned LAG over
    post-aggregate (nation, year) rows — ≤ #nations × #years rows in
    the window stage no matter the fact size."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    yearly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("nation").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "nation",
        "yr",
        "revenue",
        F.round(100.0 * (F.col("revenue") - prev) / prev, 2).alias("yoy_pct"),
    ).orderBy("nation", "yr")


@register(
    "customer_balance_deciles",
    oracle="""
    WITH g AS (
        SELECT c_acctbal, COUNT(*) AS cnt FROM customer GROUP BY c_acctbal
    ), c AS (
        SELECT c_acctbal, cnt,
               SUM(cnt) OVER (ORDER BY c_acctbal
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER () AS total
        FROM g
    )
    SELECT CAST(FLOOR(10.0 * (cum - cnt) / total) AS BIGINT) + 1 AS decile,
           CAST(SUM(cnt) AS BIGINT) AS n_customers,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal,
           ROUND(SUM(c_acctbal * cnt) / SUM(cnt), 2) AS avg_bal
    FROM c GROUP BY decile ORDER BY decile
    """,
)
def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance decile table built the scale-safe way: the raw
    rows aggregate to (distinct balance, count) FIRST, then the only
    unpartitioned window (cumulative count) runs over those
    post-aggregate rows — ≤ #distinct values regardless of row count,
    satisfying the §4 plan discipline a raw-row NTILE would violate.
    A row's decile is its cumulative start position ×10/total (ties
    share a decile by construction).  At extreme value cardinality the
    same report degrades to approx_percentile cut-points +
    width_bucket (the histogram_order_totals pattern)."""
    c = table(spark, sf_dir, "customer")
    g = c.groupBy("c_acctbal").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("c_acctbal").rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.partitionBy(F.lit(1))
    d = g.select(
        "c_acctbal",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("total"),
    )
    decile = (
        F.floor(10.0 * (F.col("cum") - F.col("cnt")) / F.col("total")) + 1
    ).cast("long")
    return (
        d.groupBy(decile.alias("decile"))
        .agg(
            F.sum("cnt").cast("long").alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(
                F.sum(F.col("c_acctbal") * F.col("cnt")) / F.sum("cnt"), 2
            ).alias("avg_bal"),
        )
        .orderBy("decile")
    )


@register(
    "doc_zipf_slope",
    oracle="""
    WITH wf AS (
        SELECT word, COUNT(*) AS freq
        FROM (
            SELECT UNNEST(string_split(LOWER(text), ' ')) AS word
            FROM documents
        )
        WHERE TRIM(word) != ''
        GROUP BY word
    ), ranked AS (
        SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rnk
        FROM wf
    )
    SELECT ROUND(REGR_SLOPE(LN(freq), LN(rnk)), 4) AS zipf_slope,
           COUNT(*) AS n_words
    FROM ranked WHERE rnk <= 100
    """,
)
def doc_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf-law fit: OLS slope of log(freq) vs log(rank) over
    the top-100 words (natural language ≈ −1; a strong deviation flags
    synthetic/templated corpora — a standard training-data health
    check).  Word counts partial-aggregate; the rank window touches
    only distinct words; regr_slope is a single JVM aggregate."""
    docs = table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .filter(F.trim("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = wf.select(
        "freq",
        F.row_number().over(Window.orderBy(F.desc("freq"), "word")).alias("rnk"),
    ).filter(F.col("rnk") <= 100)
    return ranked.agg(
        F.round(F.regr_slope(F.log("freq"), F.log("rnk")), 4).alias("zipf_slope"),
        F.count(F.lit(1)).alias("n_words"),
    )


@register(
    "doc_type_token_ratio",
    oracle="""
    SELECT lang,
           COUNT(DISTINCT word) AS vocab_size,
           COUNT(*) AS n_tokens,
           ROUND(COUNT(DISTINCT word) * 1.0 / COUNT(*), 4) AS ttr
    FROM (
        SELECT lang, UNNEST(string_split(LOWER(text), ' ')) AS word
        FROM documents
    )
    WHERE TRIM(word) != ''
    GROUP BY lang
    ORDER BY lang
    """,
)
def doc_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per language: type-token ratio (vocabulary /
    tokens).  A low TTR flags repetitive machine-generated text; used
    alongside the Gopher repetition gates.  Token explode fans out
    map-side; the per-lang count-distinct is Spark's two-phase
    partial-distinct aggregation."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(tokens(F.col("text"))).alias("word")).filter(
        F.trim("word") != ""
    )
    return (
        toks.groupBy("lang")
        .agg(
            F.countDistinct("word").alias("vocab_size"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .select(
            "lang",
            "vocab_size",
            "n_tokens",
            F.round(F.col("vocab_size") * 1.0 / F.col("n_tokens"), 4).alias("ttr"),
        )
        .orderBy("lang")
    )


@register(
    "token_length_buckets",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               LEN(LIST_FILTER(string_split(text, ' '),
                               x -> TRIM(x) != '')) AS n_tokens
        FROM documents
    )
    SELECT CAST(FLOOR(n_tokens / 16) * 16 AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM t
    GROUP BY bucket_lo
    ORDER BY bucket_lo
    """,
)
def token_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram (16-token buckets): the pre-packing
    length profile a training pipeline derives before choosing a
    context length / packing strategy (pack_sequences' input
    statistics).  Pure map-side token count + one bucket rollup — no
    explode, no window."""
    docs = table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), " "), lambda x: F.trim(x) != "")
    )
    return (
        docs.select(n_tokens.alias("n_tokens"))
        .groupBy(
            (F.floor(F.col("n_tokens") / 16) * 16).cast("long").alias("bucket_lo")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("bucket_lo")
    )


@register(
    "embedding_norm_outliers",
    oracle="""
    WITH norms AS (
        SELECT label,
               SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
        FROM embeddings
    ), stats AS (
        SELECT label, norm,
               AVG(norm) OVER (PARTITION BY label) AS mu,
               STDDEV_SAMP(norm) OVER (PARTITION BY label) AS sigma
        FROM norms
    )
    SELECT label, COUNT(*) AS n_vectors,
           ROUND(AVG(norm), 4) AS mean_norm,
           ROUND(STDDEV_SAMP(norm), 4) AS std_norm,
           CAST(SUM(CASE WHEN ABS(norm - mu) > 2 * sigma THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM stats
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene: per-label L2-norm distribution + 2σ outlier
    counts (degenerate/corrupted vectors surface as norm outliers
    before they poison ANN indexes).  The norm is a JVM higher-order
    aggregate over the array column — no UDF; the window runs per
    label on scalar rows."""
    emb = table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    norms = emb.select("label", norm.alias("norm"))
    w = Window.partitionBy("label")
    stats = norms.select(
        "label",
        "norm",
        F.avg("norm").over(w).alias("mu"),
        F.stddev_samp("norm").over(w).alias("sigma"),
    )
    return (
        stats.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("norm"), 4).alias("mean_norm"),
            F.round(F.stddev_samp("norm"), 4).alias("std_norm"),
            F.sum(
                F.when(
                    F.abs(F.col("norm") - F.col("mu")) > 2 * F.col("sigma"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("label")
    )


@register(
    "late_event_lateness_audit",
    oracle="""
    WITH arr AS (
        SELECT event_type, ts,
               MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_max
        FROM events
    )
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN prev_max > ts THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           ROUND(MAX(CASE WHEN prev_max > ts
                          THEN EXTRACT(EPOCH FROM prev_max - ts)
                          ELSE 0 END), 3) AS max_lateness_sec
    FROM arr
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def late_event_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order arrival audit: with event_id as the arrival order,
    an event is late if an earlier-arriving event of the same user has
    a greater timestamp.  This measures exactly the disorder a
    streaming watermark must absorb — the batch query that picks the
    withWatermark() delay for the §2.10 streaming suite.  Per-user
    running max, then a per-type rollup."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = ev.select(
        "event_type", "ts", F.max("ts").over(w).alias("prev_max")
    )
    late = F.col("prev_max") > F.col("ts")
    return (
        arr.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
            F.round(
                F.max(
                    F.when(
                        late,
                        (
                            F.unix_micros(F.col("prev_max").cast("timestamp"))
                            - F.unix_micros(F.col("ts").cast("timestamp"))
                        )
                        / 1e6,
                    ).otherwise(0.0)
                ),
                3,
            ).alias("max_lateness_sec"),
        )
        .orderBy("event_type")
    )


@register(
    "user_rfm_segmentation",
    oracle="""
    WITH p AS (
        SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS freq,
               ROUND(SUM(value), 2) AS monetary
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ), rfm AS (
        SELECT NTILE(4) OVER (ORDER BY last_ts DESC, user_id) AS r_q,
               NTILE(4) OVER (ORDER BY freq DESC, user_id) AS f_q,
               NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_q
        FROM p
    )
    SELECT r_q, f_q, m_q, COUNT(*) AS n_users
    FROM rfm GROUP BY r_q, f_q, m_q
    ORDER BY r_q, f_q, m_q
    """,
)
def user_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation from purchase events: recency/frequency/
    monetary quartiles (NTILE with deterministic tie-breaks) and the
    segment-size matrix.  The quartile windows run over user-grain
    rows (one per purchasing user); at extreme user counts the same
    cuts come from approx_percentile thresholds."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    p = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("freq"),
        F.round(F.sum("value"), 2).alias("monetary"),
    )
    rfm = p.select(
        F.ntile(4).over(Window.orderBy(F.desc("last_ts"), "user_id")).alias("r_q"),
        F.ntile(4).over(Window.orderBy(F.desc("freq"), "user_id")).alias("f_q"),
        F.ntile(4).over(Window.orderBy(F.desc("monetary"), "user_id")).alias("m_q"),
    )
    return (
        rfm.groupBy("r_q", "f_q", "m_q")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("r_q", "f_q", "m_q")
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    )
    SELECT from_type, to_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_type), 4) AS p
    FROM trans
    ORDER BY from_type, to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov
    audit): LEAD over each user's time-ordered stream pairs every
    event with its successor, one rollup counts (from → to), and the
    row-conditional probability is a window over the 25-cell
    aggregate.  The product-analytics path view (where do users go
    after a click?) and the generative sanity-check for synthetic
    event streams.  Deterministic: LEAD orders by (ts, event_id) —
    unique — and p is a ratio of exact counts.  Scale: the only
    corpus-sized exchange is the user_id window partition (bounded
    per-user sort, parallel across users); the matrix itself is
    |event_types|² rows."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy("from_type"))
    return (
        trans.select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / total, 4).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )
