"""Platform / governance operators, round-6 tail: k-anonymity audit,
runtime-filter (Bloom) effectiveness audit, time-series
autocorrelation from exact integer sums, and Markov next-event
entropy with sequential-fold determinism.

Each shape is one a 100 TB training-data platform runs routinely —
privacy-risk screening before release, join runtime-filter sizing,
revenue-series diagnostics, and behavioral-model training/scoring —
and each carries an exact DuckDB oracle.  Cross-engine float
determinism comes from three tricks already proven in this suite:
exact integer/HUGEINT-decimal sums cast to double only for the final
scalar formula (autocorrelation), the md5 60-bit hash family shared
verbatim by both engines (Bloom positions), and left-fold summation
over an explicitly sorted small array (entropy; Spark ``F.aggregate``
≡ DuckDB ``list_reduce``, both left folds, identical term order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from .registry import register


@register(
    "k_anonymity_audit",
    oracle="""
    WITH qi AS (
        SELECT c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM (
            SELECT c_mktsegment, c_nationkey,
                   CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket
            FROM customer
        )
        GROUP BY c_mktsegment, c_nationkey, bal_bucket
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           MIN(k) AS min_k,
           CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_singletons,
           CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
               AS rows_at_risk,
           ROUND(100.0 * CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END)
                              AS DOUBLE) / SUM(k), 4) AS pct_at_risk
    FROM qi
    GROUP BY segment
    ORDER BY segment
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-risk screen before a data release: group customers by
    a quasi-identifier tuple (nation, market segment, $1000 balance
    bucket) and report, per segment, the k-anonymity profile — group
    count, minimum k, singleton groups (k=1, i.e. re-identifiable
    rows), and the share of rows in groups below the k=5 threshold.

    Scale: two hash aggregations (QI grain, then segment grain) —
    both partial-aggregable, no window, no join; the QI grain is the
    only shuffle wider than the 5-segment output.  The same plan runs
    unchanged over any column set a release policy names."""
    c = table(spark, sf_dir, "customer")
    qi = (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey"),
            F.floor(F.col("c_acctbal") / 1000).alias("bal_bucket"),
        )
        .groupBy("segment", "c_nationkey", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    return (
        qi.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").alias("n_rows"),
            F.min("k").alias("min_k"),
            F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).alias("n_singletons"),
            F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0)).alias(
                "rows_at_risk"
            ),
        )
        .select(
            "segment",
            "n_groups",
            "n_rows",
            "min_k",
            "n_singletons",
            "rows_at_risk",
            F.round(
                100.0 * F.col("rows_at_risk") / F.col("n_rows"), 4
            ).alias("pct_at_risk"),
        )
        .orderBy("segment")
    )


def _md5pos(col: Column, salt: str, m: int) -> Column:
    """md5-derived Bloom bit position in [0, m) — the suite's shared
    60-bit md5 hash family (see queries_dedup_oracle), identical in
    DuckDB as ``CAST('0x' || substr(md5(x || salt), 1, 15) AS BIGINT)
    % m``."""
    h = F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % m


def _bloom_oracle_leg(m: int) -> str:
    def pos(salt: str) -> str:
        return (
            "CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || "
            f"'{salt}'), 1, 15) AS BIGINT) % {m}"
        )

    return f"""
        SELECT {m} AS m_bits,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM members)
                   AS n_members,
               (SELECT CAST(COUNT(DISTINCT p) AS BIGINT) FROM (
                    SELECT {pos('#1')} AS p FROM members
                    UNION ALL SELECT {pos('#2')} AS p FROM members))
                   AS bits_set,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM probes)
                   AS n_probes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM probes pr
                WHERE {pos('#1')} IN
                      (SELECT {pos('#1')} FROM members
                       UNION SELECT {pos('#2')} FROM members)
                  AND {pos('#2')} IN
                      (SELECT {pos('#1')} FROM members
                       UNION SELECT {pos('#2')} FROM members))
                   AS n_false_pos
    """


@register(
    "bloom_filter_fp_audit",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT o_custkey AS c_custkey FROM orders
    ), probes AS (
        -- offset from the MEASURED max member key (round-6 ADVICE):
        -- a fixed literal range is only non-member at small SFs
        SELECT (SELECT MAX(c_custkey) FROM members) + 1 + range
                   AS c_custkey
        FROM range(0, 2000)
    ), legs AS (
        {_bloom_oracle_leg(4096)}
        UNION ALL
        {_bloom_oracle_leg(65536)}
    )
    SELECT m_bits, n_members, bits_set,
           ROUND(CAST(bits_set AS DOUBLE) / m_bits, 4) AS fill_ratio,
           n_probes, n_false_pos,
           ROUND(CAST(n_false_pos AS DOUBLE) / n_probes, 4) AS fp_rate
    FROM legs
    ORDER BY m_bits
    """,
)
def bloom_filter_fp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter sizing audit: simulate the Bloom filter a join
    runtime filter would build over the orders-side custkeys (k=2 md5
    hash functions, m in (4096, 65536) bits), then probe it with
    2000 KNOWN non-member keys (a synthetic range offset past the
    MEASURED max member key, so every probe hit is a false positive
    by construction at ANY scale factor) and measure the realized
    false-positive rate and bit-array fill.  An undersized filter
    saturates (fill -> 1, fp -> 1) — exactly what this audit
    surfaces before a 100 TB scan ships a useless filter to every
    executor; the measured fp_rate is engine-exact because both
    engines share the md5 bit positions.

    Scale: members are one distinct over the fact's join key; each
    leg's bit set is ≤ m distinct ints (broadcast), and the FP test
    is two broadcast semi-joins on the probe side — no all-pairs
    work anywhere."""
    o = table(spark, sf_dir, "orders")
    members = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    # Probe keys start past the measured max member key — non-membership
    # holds at any SF (round-6 ADVICE).  The 1-row max aggregate is a
    # broadcast attach onto a 2000-row synthetic range.
    max_key = members.agg(F.max("c_custkey").alias("max_key"))
    # One partition for the 2000-row synthetic range (a bare
    # spark.range fans out defaultParallelism=32 near-empty tasks per
    # leg — round-13, guide §1.2).
    probes = (
        spark.range(0, 2000, 1, 1)
        .crossJoin(F.broadcast(max_key))
        .select((F.col("max_key") + 1 + F.col("id")).alias("c_custkey"))
    )

    legs = []
    for m in (4096, 65536):
        mem_pos = members.select(
            _md5pos(F.col("c_custkey"), "#1", m).alias("p")
        ).unionAll(
            members.select(_md5pos(F.col("c_custkey"), "#2", m).alias("p"))
        ).distinct()
        pr = probes.select(
            "c_custkey",
            _md5pos(F.col("c_custkey"), "#1", m).alias("p1"),
            _md5pos(F.col("c_custkey"), "#2", m).alias("p2"),
        )
        # The rename stays OUTSIDE the broadcast subtree: a
        # withColumnRenamed INSIDE it made the two p1/p2 build sides
        # canonically different, so ReuseExchange could not share them
        # and each semi-join re-scanned orders and rebuilt the bit set
        # (round-13, guide §2.4/§7.2 — duplicated subtrees).  With the
        # bare `mem_pos` on both build sides the second broadcast is a
        # ReusedExchange.
        m1, m2 = mem_pos.alias("m1"), mem_pos.alias("m2")
        fp = (
            pr.join(
                F.broadcast(m1), F.col("p1") == m1["p"], "left_semi"
            )
            .join(
                F.broadcast(m2), F.col("p2") == m2["p"], "left_semi"
            )
            .agg(F.count(F.lit(1)).alias("n_false_pos"))
        )
        leg = (
            members.agg(F.count(F.lit(1)).alias("n_members"))
            .crossJoin(mem_pos.agg(F.count(F.lit(1)).alias("bits_set")))
            .crossJoin(probes.agg(F.count(F.lit(1)).alias("n_probes")))
            .crossJoin(fp)
            .select(
                F.lit(m).alias("m_bits"),
                "n_members",
                "bits_set",
                F.round(F.col("bits_set") / F.lit(float(m)), 4).alias(
                    "fill_ratio"
                ),
                "n_probes",
                "n_false_pos",
                F.round(
                    F.col("n_false_pos") / F.col("n_probes").cast("double"), 4
                ).alias("fp_rate"),
            )
        )
        legs.append(leg)
    return legs[0].unionByName(legs[1]).orderBy("m_bits")


_CORR_SQL = """
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderdate
    ), lagged AS (
        SELECT cents AS x,
               LAG(cents, 1) OVER (ORDER BY d) AS y1,
               LAG(cents, 7) OVER (ORDER BY d) AS y7
        FROM daily
    ), pairs AS (
        SELECT 1 AS lag, x, y1 AS y FROM lagged WHERE y1 IS NOT NULL
        UNION ALL
        SELECT 7 AS lag, x, y7 AS y FROM lagged WHERE y7 IS NOT NULL
    ), sums AS (
        SELECT lag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
                    AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
                    AS DOUBLE) AS syy
        FROM pairs GROUP BY lag
    )
    SELECT lag, CAST(n AS BIGINT) AS n_pairs,
           ROUND((n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)),
                 6) AS autocorr
    FROM sums
    ORDER BY lag
"""


@register("daily_revenue_autocorr", oracle=_CORR_SQL)
def daily_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series diagnostics: lag-1 and lag-7 autocorrelation of
    the daily revenue series (is there day-over-day momentum? a
    weekly cycle?).  The Pearson r is computed from EXACT integer
    sums — daily revenue as BIGINT cents, the five sufficient
    statistics (Σx, Σy, Σxy, Σx², Σy²) accumulated in decimal(38,0)
    (Spark) / HUGEINT (DuckDB) so no float summation order exists —
    and only the final closed-form r is double math, identical in
    both engines on identical exact inputs.

    Scale: one partial-aggregable date-grain aggregation, one
    unpartitioned-window lag pass over the ~2.4 K-row daily series
    (above the aggregate — the plan-audit-sanctioned shape), and a
    5-number reduce per lag.  The day-grain series stays ~2.4 K rows
    at any fact size."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        F.col("cents").alias("x"),
        F.lag("cents", 1).over(w).alias("y1"),
        F.lag("cents", 7).over(w).alias("y7"),
    )
    pairs = lagged.select(
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("lag"), F.col("x"), F.col("y1").alias("y")),
                F.struct(F.lit(7).alias("lag"), F.col("x"), F.col("y7").alias("y")),
            )
        ).alias("e")
    ).select("e.*").filter(F.col("y").isNotNull())
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x") * dec("y")).cast("double").alias("sxy"),
        F.sum(dec("x") * dec("x")).cast("double").alias("sxx"),
        F.sum(dec("y") * dec("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return sums.select(
        "lag",
        n.cast("long").alias("n_pairs"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("autocorr"),
    ).orderBy("lag")


@register(
    "markov_next_event_entropy",
    oracle="""
    WITH trans AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ), counts AS (
        SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
        FROM trans WHERE nxt IS NOT NULL
        GROUP BY cur, nxt
    ), probs AS (
        SELECT cur, nxt, n,
               CAST(SUM(n) OVER (PARTITION BY cur) AS BIGINT) AS n_out,
               CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY cur) AS p
        FROM counts
    )
    SELECT cur,
           MAX(n_out) AS n_out,
           CAST(COUNT(*) AS BIGINT) AS n_next_symbols,
           ROUND(CAST(list_reduce(
               list_prepend(0.0, list(-p * log2(p) ORDER BY nxt)),
               (a, b) -> a + b) AS DOUBLE), 4) AS entropy_bits
    FROM probs
    GROUP BY cur
    ORDER BY cur
    """,
)
def markov_next_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov model trained on every user's event stream
    (maximum-likelihood transition probabilities from exact counts),
    reported as the next-symbol entropy per current event type — the
    bits/event a sequence model must beat, and the quantitative form
    of the event-transition matrix.  The ≤5-term entropy sum is a
    LEFT FOLD over the nxt-sorted term list in both engines (Spark
    ``F.aggregate``, DuckDB ``list_reduce`` with a prepended 0.0
    init), so float summation order is pinned, not assumed.

    Scale: the lead() window is partitioned by user_id over raw
    events (keyed, millions of small partitions — the sessionize
    shape); everything after runs at the ≤25-row (cur, nxt) grain."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = trans.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    probs = counts.select(
        "cur",
        "nxt",
        "n",
        F.sum("n").over(Window.partitionBy("cur")).alias("n_out"),
    ).withColumn("p", F.col("n") / F.col("n_out").cast("double"))
    terms = F.array_sort(
        F.collect_list(F.struct(F.col("nxt"), (-F.col("p") * F.log2("p")).alias("t")))
    )
    return (
        probs.groupBy("cur")
        .agg(
            F.max("n_out").alias("n_out"),
            F.count(F.lit(1)).alias("n_next_symbols"),
            F.round(
                F.aggregate(
                    terms, F.lit(0.0), lambda acc, s: acc + s["t"]
                ),
                4,
            ).alias("entropy_bits"),
        )
        .orderBy("cur")
    )
