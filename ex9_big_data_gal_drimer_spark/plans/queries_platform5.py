"""Round-11 additions — the interval-JOIN family plus two operator
twins, all registered ROWS-ONLY with STAGED oracles (the 200-row
oracle capacity is exactly full after the round-11 promotions; staged
oracles run the full differential at every pytest via
tests/test_staged_oracles.py — the permanent growth mode).

Families added:

- **calendar-banded interval alignment** (`intransit_inventory_by_week`)
  — the scale form of a range join: per-row intervals exploded onto
  fixed calendar bands so the join/aggregate key is an EQUI key.
  Complements round-10's sweep line (which answers peak/level
  questions); banding answers per-band membership rollups.
- **pair-emitting interval overlap join**
  (`overlapping_shipments_pairs`) — emits the matched pairs
  themselves, key-bounded by the order equi-key so the quadratic
  term is per-order line count (≤7), never the relation size.
- **weighted bottom-k sampling** (`weighted_sample_orders_md5`) —
  Cohen–Kaplan weighted bottom-k sketch with deterministic md5 ranks,
  the cross-engine-checkable twin of seeded weighted sampling (the
  training-data "mix corpora by weight" primitive).
- **chunked grouped-map twin** (`resample_user_hourly_chunked`) —
  the round-11 skew-mitigation path of operators/resample.py driven
  through the SAME relational ASOF oracle as the banked
  resample_user_hourly, so grouped-map ≡ range-split grouped-map ≡
  declarative SQL stays differentially pinned forever.

The transit interval is SYNTHESIZED (the star schema carries one
date per lineitem): end = l_shipdate + (l_quantity % 14 + 1) days —
a deterministic integer-day span both engines compute identically
(quantities are integral; shipdates are midnight timestamps).  The
operator evidence is the interval algebra, not the column provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from .registry import register

#: Synthesized transit span in days: quantity is integral 1..50, so
#: the span is 1..14 days and the week-band explode factor is ≤3.
_SPAN_SQL = "CAST(l_quantity AS INT) % 14 + 1"


def _transit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem with its synthesized transit interval [start, end]."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        F.col("l_shipdate").alias("start_ts"),
        F.expr(f"timestampadd(DAY, {_SPAN_SQL}, l_shipdate)").alias("end_ts"),
    )


@register(
    "intransit_inventory_by_week",
    staged_oracle="""
    WITH spans AS (
        SELECT l_quantity, l_extendedprice,
               l_shipdate AS start_ts,
               l_shipdate + INTERVAL 1 DAY * (CAST(l_quantity AS INT) % 14 + 1)
                   AS end_ts
        FROM lineitem
    ), banded AS (
        SELECT UNNEST(generate_series(
                   date_trunc('week', start_ts),
                   date_trunc('week', end_ts),
                   INTERVAL 7 DAY)) AS week,
               l_quantity, l_extendedprice
        FROM spans
    )
    SELECT week,
           CAST(COUNT(*) AS BIGINT) AS n_in_transit,
           ROUND(SUM(l_quantity), 2) AS qty_in_transit,
           ROUND(SUM(l_extendedprice), 2) AS value_in_transit
    FROM banded
    GROUP BY week
    ORDER BY week
    """,
)
def intransit_inventory_by_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-banded interval alignment: every lineitem's transit
    interval is exploded onto the Monday-start weeks it overlaps, then
    rolled up per week — "how much inventory was in transit in each
    calendar week".

    This is the scale pattern for range joins against a calendar:
    instead of an inequality join (band.start <= x.end AND x.start <=
    band.end — a cross-ish join no hash engine executes well), each
    interval emits its covered band keys (explode factor bounded by
    span/band = ≤3 here) and the join/aggregate runs on an EQUI key.
    One map-side-combinable shuffle on week; no inequality predicate
    anywhere in the executed plan.  At 100 TB the same shape holds:
    the explode multiplies rows by the bounded span ratio, and weeks
    (the group key) stay calendar-sized.
    """
    spans = _transit(spark, sf_dir)
    banded = spans.select(
        F.explode(
            F.expr(
                "sequence(date_trunc('week', start_ts),"
                " date_trunc('week', end_ts), interval 7 days)"
            )
        ).alias("week"),
        "l_quantity",
        "l_extendedprice",
    )
    return (
        banded.groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_in_transit"),
            F.round(F.sum("l_quantity"), 2).alias("qty_in_transit"),
            F.round(F.sum("l_extendedprice"), 2).alias("value_in_transit"),
        )
        .orderBy("week")
    )


@register(
    "overlapping_shipments_pairs",
    staged_oracle="""
    WITH spans AS (
        SELECT l_orderkey, l_linenumber, l_returnflag,
               l_shipdate AS start_ts,
               l_shipdate + INTERVAL 1 DAY * (CAST(l_quantity AS INT) % 14 + 1)
                   AS end_ts
        FROM lineitem
    ), pairs AS (
        SELECT LEAST(a.l_returnflag, b.l_returnflag) AS flag_a,
               GREATEST(a.l_returnflag, b.l_returnflag) AS flag_b,
               date_diff('day',
                         GREATEST(a.start_ts, b.start_ts),
                         LEAST(a.end_ts, b.end_ts)) + 1 AS overlap_days
        FROM spans a JOIN spans b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_linenumber < b.l_linenumber
         AND a.start_ts <= b.end_ts AND b.start_ts <= a.end_ts
    )
    SELECT flag_a, flag_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(overlap_days), 2) AS avg_overlap_days
    FROM pairs
    GROUP BY flag_a, flag_b
    ORDER BY flag_a, flag_b
    """,
)
def overlapping_shipments_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-emitting interval overlap join: same-order lineitem pairs
    whose transit intervals overlap (inclusive endpoints), rolled up
    by the unordered return-flag pair with the mean overlap length.

    The join key is the ORDER equi-key — the overlap inequality is a
    post-join filter, so the executed plan is a plain shuffled hash
    join whose quadratic term is the per-order line count (≤7 lines ⇒
    ≤21 candidate pairs per order), never the relation size.  This is
    the within-group overlap-join discipline: a general interval join
    without an equi-key would instead band both sides
    (intransit_inventory_by_week's pattern) and dedupe matches.
    ``l_linenumber <`` keeps each unordered pair once and excludes
    self-pairs; LEAST/GREATEST canonicalize the flag pair.
    """
    spans = _transit(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "start_ts", "end_ts"
    )
    a, b_ = spans.alias("a"), spans.alias("b")
    pairs = a.join(
        b_,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
        & (F.col("a.start_ts") <= F.col("b.end_ts"))
        & (F.col("b.start_ts") <= F.col("a.end_ts")),
    ).select(
        F.least("a.l_returnflag", "b.l_returnflag").alias("flag_a"),
        F.greatest("a.l_returnflag", "b.l_returnflag").alias("flag_b"),
        (
            F.datediff(
                F.least("a.end_ts", "b.end_ts"),
                F.greatest("a.start_ts", "b.start_ts"),
            )
            + 1
        ).alias("overlap_days"),
    )
    return (
        pairs.groupBy("flag_a", "flag_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("overlap_days"), 2).alias("avg_overlap_days"),
        )
        .orderBy("flag_a", "flag_b")
    )


@register(
    "weighted_sample_orders_md5",
    staged_oracle="""
    WITH scored AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                    ::BIGINT AS DOUBLE) / o_totalprice AS score
        FROM orders
    ), ranked AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY score, o_orderkey) AS rn
        FROM scored
    )
    SELECT o_orderkey, o_orderpriority,
           ROUND(o_totalprice, 2) AS total_price
    FROM ranked WHERE rn <= 20
    ORDER BY o_orderpriority, o_orderkey
    """,
)
def weighted_sample_orders_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted bottom-k sample, 20 per priority stratum: rank =
    hash_unit / weight (Cohen & Kaplan's bottom-k sketch with priority
    ranks), so selection probability grows with o_totalprice — the
    deterministic cross-engine twin of seeded weighted sampling and
    the "mix corpora by weight" primitive a training-data pipeline
    draws with.

    The rank hash is the first 8 md5 hex digits as an exact 32-bit
    integer (both engines parse hex identically), divided by the
    weight — ONE IEEE double division per row, bit-identical across
    engines, so membership is hash-checkable (no libm log/pow, whose
    last-ulp differences could flip a boundary row).  The explicit
    o_orderkey tiebreak makes the window total even if two scores
    ever collide.

    Scale: Catalyst's rank-limit pushdown plans this as two-phase
    WindowGroupLimit — each input partition pre-trims to its local
    bottom-20 per stratum BEFORE the exchange (plan-pinned in
    tests/test_plan_audit_platform5.py), so the shuffle carries
    ~20·partitions rows per stratum, not the stratum: the bottom-k
    two-phase refinement for free, membership unchanged because ranks
    are deterministic.
    """
    o = table(spark, sf_dir, "orders")
    score = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.col("o_totalprice")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        score.asc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


@register(
    "quantile_sketch_rollup",
    staged_oracle="""
    WITH binned AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               date_trunc('day', o_orderdate) AS day,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000 AS bin,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders
        GROUP BY 1, 2, 3
    ), merged AS (
        SELECT month, bin, CAST(SUM(cnt) AS BIGINT) AS cnt
        FROM binned GROUP BY 1, 2
    ), cdf AS (
        SELECT month, bin, cnt,
               SUM(cnt) OVER (PARTITION BY month ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY month) AS tot
        FROM merged
    ), est AS (
        SELECT month,
               CAST(MAX(tot) AS BIGINT) AS n_orders,
               ROUND((MIN(CASE WHEN cum >= CAST(CEIL(0.5 * tot) AS BIGINT)
                               THEN bin END) + 1) * 1000.0, 2) AS est_p50,
               ROUND((MIN(CASE WHEN cum >= CAST(CEIL(0.9 * tot) AS BIGINT)
                               THEN bin END) + 1) * 1000.0, 2) AS est_p90
        FROM cdf GROUP BY month
    ), ranked AS (
        SELECT date_trunc('month', o_orderdate) AS month, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY date_trunc('month', o_orderdate)
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY date_trunc('month', o_orderdate))
                   AS n
        FROM orders
    ), exact AS (
        SELECT month,
               ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                              THEN o_totalprice END), 2) AS exact_p50,
               ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                              THEN o_totalprice END), 2) AS exact_p90
        FROM ranked GROUP BY month
    )
    SELECT e.month, e.n_orders,
           e.est_p50, x.exact_p50,
           (e.est_p50 - x.exact_p50 >= 0 AND e.est_p50 - x.exact_p50 <= 1000)
               AS p50_within_bin,
           e.est_p90, x.exact_p90,
           (e.est_p90 - x.exact_p90 >= 0 AND e.est_p90 - x.exact_p90 <= 1000)
               AS p90_within_bin
    FROM est e JOIN exact x ON e.month = x.month
    ORDER BY e.month
    """,
)
def quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketch — the quantile member of the
    mergeable-sketch family next to the banked HLL distinct rollup
    (hll_sketch_rollup) and frequent-items rollup
    (word_topk_sketch_rollup): day-grain equi-width histograms over
    INTEGER CENTS (``round(price*100) DIV 100000`` — $1000 bins, all
    integer math so both engines bin identically; no libm log-binning
    near bin edges) are MERGED to month grain by count addition — the
    literal sketch-merge visible in the plan as the second aggregate —
    then each month's p50/p90 estimate reads the binned CDF.  The
    query audits itself against the exact rank-based quantiles: the
    estimate is the upper edge of the bin holding the exact value, so
    ``0 <= est - exact <= bin_width`` must hold for every month — the
    error-bound contract emitted as booleans the differential checks.

    Scale: the day sketch is a map-side-combinable groupBy on
    (month, day, bin) — at 100 TB the stored artifact per day is the
    ≤600-row histogram, and ANY period rolls up by adding counts
    (week, month, lifetime) without touching raw data again; the CDF
    windows run at bin grain (calendar × 600 rows).  The exact branch
    exists only for the audit; production reads the sketch alone.
    """
    o = table(spark, sf_dir, "orders")
    # F.trunc returns DATE, matching DuckDB's date_trunc('month', ts)
    # (which yields DATE for calendar granularities)
    month = F.trunc(F.col("o_orderdate"), "month")
    binned = (
        o.select(
            month.alias("month"),
            F.date_trunc("day", F.col("o_orderdate")).alias("day"),
            F.expr(
                "CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV 100000"
            ).alias("bin"),
        )
        .groupBy("month", "day", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = binned.groupBy("month", "bin").agg(F.sum("cnt").alias("cnt"))
    w_cum = (
        Window.partitionBy("month")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("month")
    cdf = merged.select(
        "month",
        "bin",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_tot).alias("tot"),
    )
    est = cdf.groupBy("month").agg(
        F.max("tot").alias("n_orders"),
        F.round(
            (
                F.min(
                    F.when(
                        F.col("cum") >= F.ceil(0.5 * F.col("tot")).cast("long"),
                        F.col("bin"),
                    )
                )
                + 1
            )
            * 1000.0,
            2,
        ).alias("est_p50"),
        F.round(
            (
                F.min(
                    F.when(
                        F.col("cum") >= F.ceil(0.9 * F.col("tot")).cast("long"),
                        F.col("bin"),
                    )
                )
                + 1
            )
            * 1000.0,
            2,
        ).alias("est_p90"),
    )
    w_rank = Window.partitionBy("month").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        month.alias("month"), "o_totalprice", "o_orderkey"
    ).select(
        "month",
        "o_totalprice",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_tot).alias("n"),
    )
    exact = ranked.groupBy("month").agg(
        F.round(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long"),
                    F.col("o_totalprice"),
                )
            ),
            2,
        ).alias("exact_p50"),
        F.round(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.9 * F.col("n")).cast("long"),
                    F.col("o_totalprice"),
                )
            ),
            2,
        ).alias("exact_p90"),
    )
    d50 = F.col("est_p50") - F.col("exact_p50")
    d90 = F.col("est_p90") - F.col("exact_p90")
    return (
        est.join(exact, "month")
        .select(
            "month",
            "n_orders",
            "est_p50",
            "exact_p50",
            ((d50 >= 0) & (d50 <= 1000)).alias("p50_within_bin"),
            "est_p90",
            "exact_p90",
            ((d90 >= 0) & (d90 <= 1000)).alias("p90_within_bin"),
        )
        .orderBy("month")
    )


@register(
    "resample_user_hourly_chunked",
    staged_oracle="""
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
def resample_user_hourly_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RANGE-SPLIT grouped-map (operators/resample.py
    ``chunk_hours=168`` — the round-11 skew mitigation) driven through
    the SAME relational ASOF oracle as the banked
    resample_user_hourly: grouped-map ≡ chunked grouped-map ≡
    declarative SQL, differentially pinned at every pytest.  Weekly
    chunks split each user's span across parallel tasks with one
    carried observation per boundary, so per-task state is bounded by
    the chunk grid (168 rows) instead of the user's whole span — the
    shape that survives one user holding a year of events at 100 TB.
    """
    from ..operators.resample import resample_hourly_ffill

    filled = resample_hourly_ffill(
        table(spark, sf_dir, "events"), chunk_hours=168
    )
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
