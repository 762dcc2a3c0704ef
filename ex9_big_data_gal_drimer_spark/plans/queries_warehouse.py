"""Warehouse-maintenance + profiling queries: CDC merge, SCD2
history, one-pass column profiling, co-occurrence mining, exact
histograms.

These extend the reference's append-only materialization pipeline
(reference main.py:150-220 only ever CTAS-overwrites) with the
mutation and data-understanding operations a long-lived 100 TB
warehouse needs; each is expressed as a single declarative plan with
a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import register


@register(
    "cdc_merge_customers",
    oracle="""
    WITH changes AS (
        SELECT o_custkey AS c_custkey,
               CASE WHEN o_custkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
               ROUND(SUM(o_totalprice), 2) AS new_acctbal
        FROM orders WHERE o_custkey % 3 <> 0 GROUP BY o_custkey
    ),
    inserts AS (
        SELECT -c_custkey AS c_custkey, 'I' AS op,
               ROUND(new_acctbal / 10, 2) AS new_acctbal
        FROM changes WHERE op = 'U' AND c_custkey % 97 = 0
    ),
    chg AS (SELECT * FROM changes UNION ALL SELECT * FROM inserts),
    merged AS (
        SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
               CASE WHEN b.c_custkey IS NOT NULL AND c.c_custkey IS NOT NULL
                         AND c.op <> 'D' THEN c.new_acctbal
                    WHEN b.c_custkey IS NULL THEN c.new_acctbal
                    ELSE b.c_acctbal END AS c_acctbal,
               CASE WHEN b.c_custkey IS NOT NULL AND c.c_custkey IS NOT NULL
                         AND c.op <> 'D' THEN 'updated'
                    WHEN b.c_custkey IS NULL THEN 'inserted'
                    ELSE 'kept' END AS row_status
        FROM customer b FULL JOIN chg c ON b.c_custkey = c.c_custkey
        WHERE NOT (b.c_custkey IS NOT NULL AND c.c_custkey IS NOT NULL
                   AND c.op = 'D')
          AND NOT (b.c_custkey IS NULL AND c.op = 'D')
    )
    SELECT row_status, COUNT(*) AS n_rows,
           ROUND(SUM(c_acctbal), 2) AS total_acctbal,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM merged GROUP BY row_status ORDER BY row_status
    """,
)
def cdc_merge_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE (upsert+delete) applied to the customer snapshot —
    operators/merge.py::merge_apply.  The change set is derived
    deterministically from orders with modulus routing so EVERY merge
    branch is populated at every scale factor: customers ≡0 (mod 3)
    get no change row (kept), ≡0 (mod 11) among the rest are deletes,
    the remainder are balance updates, and every 97th updated key
    also ships a synthetic insert under the NEGATED key (TPC-H keys
    are positive at every SF, so synthetic keys can never collide
    with real ones — an additive offset would at ~SF 7, breaking the
    change set's one-row-per-key contract).  Returns the per-status
    audit rollup of
    the merged snapshot (the verification row a MERGE job emits), so
    the driver hash covers row routing AND payload arithmetic."""
    from ..operators.merge import merge_apply

    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 3 != 0)
    changes = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("new_acctbal"))
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 11 == 0, "D").otherwise("U").alias("op"),
            "new_acctbal",
        )
    )
    inserts = changes.filter(
        (F.col("op") == "U") & (F.col("c_custkey") % 97 == 0)
    ).select(
        (-F.col("c_custkey")).alias("c_custkey"),
        F.lit("I").alias("op"),
        F.round(F.col("new_acctbal") / 10, 2).alias("new_acctbal"),
    )
    merged = merge_apply(
        customer,
        changes.unionByName(inserts),
        key="c_custkey",
        set_cols={"c_acctbal": F.col("c.new_acctbal")},
        insert_cols={"c_acctbal": F.col("c.new_acctbal")},
    )
    return (
        merged.groupBy("row_status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("row_status")
    )


@register(
    "scd2_priority_history",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
               LAG(o_orderpriority) OVER
                   (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders WHERE o_custkey < 200
    ),
    starts AS (
        SELECT * FROM seq WHERE prev IS NULL OR prev <> o_orderpriority
    )
    SELECT o_custkey AS custkey, o_orderpriority AS priority,
           CAST(o_orderdate AS DATE) AS valid_from,
           CAST(LEAD(o_orderdate) OVER
                (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS DATE) AS valid_to
    FROM starts
    ORDER BY custkey, valid_from
    """,
)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history — operators/merge.py::
    scd2_intervals.  Each customer's order-priority stream collapses
    into validity intervals (change-point on LAG, close on LEAD);
    NULL valid_to marks the current interval.  The custkey predicate
    is applied AT THE SCAN (pushed filter), so the window pass only
    shuffles the slice — the pattern that keeps per-key history
    rebuilds cheap at 100 TB (combine with partition pruning on the
    change-date column for incremental rebuilds)."""
    from ..operators.merge import scd2_intervals

    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
    )
    iv = scd2_intervals(
        orders,
        key="o_custkey",
        ts_col="o_orderdate",
        value_col="o_orderpriority",
        tiebreak_col="o_orderkey",
    )
    return iv.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
    ).orderBy("custkey", "valid_from")


@register(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_custkey' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS n_nulls,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(ROUND(MIN(o_totalprice), 2) AS VARCHAR),
           CAST(ROUND(MAX(o_totalprice), 2) AS VARCHAR)
    FROM orders
    ORDER BY column_name
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (ANALYZE-style data understanding):
    rows/nulls/distinct/min/max for four orders columns, one branch
    per column unioned into one result.

    Plan choice: one single-distinct aggregate PER COLUMN, unioned —
    NOT one multi-distinct aggregate over all four.  A multi-distinct
    aggregate lowers to an Expand that duplicates every row once per
    DISTINCT clause (4× rows through the shuffle); the per-column
    branches instead each scan with column pruning (each branch's
    parquet ReadSchema is exactly its one column, so the four
    branches TOGETHER read the same bytes one wide scan would — the
    columnar-storage identity), keep Spark's efficient
    single-distinct two-level aggregation, and run as independent
    union legs.  Measured 2.3× faster at sf0.1 (1.35 s → 0.59 s);
    on a ROW-oriented source the tradeoff flips and the one-scan
    Expand form wins — that's a storage-format decision, not a row-
    count one.  Numeric min/max round before the string cast so both
    engines format identically."""
    orders = table(spark, sf_dir, "orders")

    def branch(col: str, numeric: bool) -> DataFrame:
        mn, mx = F.min(col), F.max(col)
        if numeric:
            mn, mx = F.round(mn, 2), F.round(mx, 2)
        return orders.agg(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            mn.cast("string").alias("min_value"),
            mx.cast("string").alias("max_value"),
        )

    cols = [
        ("o_custkey", True),
        ("o_orderstatus", False),
        ("o_orderpriority", False),
        ("o_totalprice", True),
    ]
    out = branch(*cols[0])
    for c, num in cols[1:]:
        out = out.unionByName(branch(c, num))
    return out.orderBy("column_name")


@register(
    "part_cooccurrence_top20",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def part_cooccurrence_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence mining (market-basket): part pairs appearing in
    the same order, top 20 by support.  Baskets are built with ONE
    ``collect_list`` aggregation keyed on l_orderkey (the sole wide
    exchange — the alternative keyed self-join ships the stream
    through two exchanges plus a sort-merge join; controlled A/B at
    sf1, warm median of 3: basket 4.35 s vs join 4.83 s, and one
    exchange vs two is the posture that matters at cluster scale);
    pair
    generation is two chained map-side explodes over each basket
    array, quadratic only WITHIN an order (baskets are small by
    construction) and multiplicity-preserving (list×list, exactly the
    lineitem-pair count of the join form); the pair counts combine
    map-side before the final TakeOrderedAndProject.  The same shape
    computes token/document co-occurrence for embedding-training
    corpora."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_list("l_partkey").alias("parts")
    )
    return (
        baskets.select(F.explode("parts").alias("part_a"), "parts")
        .select("part_a", F.explode("parts").alias("part_b"))
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "histogram_order_totals",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS INT) AS bin,
           CAST(FLOOR(o_totalprice / 50000) AS INT) * 50000.0 AS bin_low,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY 1, 2 ORDER BY bin
    """,
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-width histogram of order totals (50k bins) — the
    deterministic complement to the approx-percentile sketches
    (order_price_quantiles / quantiles_approx_scale_variant).  Pure
    map-side binning + combine: one scan, one k-row shuffle, scale
    cost independent of data skew because the bin key is bounded by
    the value domain, not the row count."""
    orders = table(spark, sf_dir, "orders")
    bin_ = F.floor(F.col("o_totalprice") / 50000).cast("int")
    return (
        orders.groupBy(
            bin_.alias("bin"), (bin_ * 50000.0).alias("bin_low")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("bin")
    )


@register(
    "snapshot_diff_customers",
    oracle="""
    WITH newsnap AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0
                    THEN ROUND(c_acctbal + 100, 2) ELSE c_acctbal END
                   AS c_acctbal
        FROM customer WHERE c_custkey % 13 <> 0
        UNION ALL
        SELECT -c_custkey, ROUND(c_acctbal / 2, 2)
        FROM customer WHERE c_custkey % 31 = 0
    ),
    diff AS (
        SELECT COALESCE(n.c_custkey, o.c_custkey) AS c_custkey,
               CASE WHEN o.c_custkey IS NULL THEN 'I'
                    WHEN n.c_custkey IS NULL THEN 'D'
                    WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal THEN 'U'
               END AS op
        FROM customer o FULL JOIN newsnap n ON o.c_custkey = n.c_custkey
    )
    SELECT op, CAST(COUNT(*) AS BIGINT) AS n_changes,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM diff WHERE op IS NOT NULL GROUP BY op ORDER BY op
    """,
)
def snapshot_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC feed generation — operators/merge.py::snapshot_diff, the
    inverse of cdc_merge_customers' merge_apply.  A perturbed
    customer snapshot (every 13th key dropped, every 7th balance
    bumped, every 31st key re-inserted negated) diffs against the
    original into a minimal change feed; the audit rollup counts
    I/U/D rows (unchanged keys emit NOTHING — the feed is
    change-sized).  The merge∘diff round-trip law (applying the feed
    reproduces the new snapshot exactly) is property-tested in
    tests/test_warehouse.py."""
    from ..operators.merge import snapshot_diff

    old = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    changed = old.filter(F.col("c_custkey") % 13 != 0).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 7 == 0, F.round(F.col("c_acctbal") + 100, 2)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    inserted = old.filter(F.col("c_custkey") % 31 == 0).select(
        (-F.col("c_custkey")).alias("c_custkey"),
        F.round(F.col("c_acctbal") / 2, 2).alias("c_acctbal"),
    )
    new = changed.unionByName(inserted)
    feed = snapshot_diff(old, new, key="c_custkey", payload_cols=["c_acctbal"])
    return (
        feed.groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("op")
    )


@register(
    "dq_contract_orders",
    oracle="""
    SELECT 'custkey_not_null' AS check_name,
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orderkey_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'custkey_in_customer', CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'status_accepted_values', CAST(COUNT(*) AS BIGINT)
    FROM orders
    WHERE o_orderstatus NOT IN ('O', 'F', 'P')
    UNION ALL
    SELECT 'totalprice_positive', CAST(COUNT(*) AS BIGINT)
    FROM orders
    WHERE o_totalprice <= 0
    UNION ALL
    SELECT 'freshness_pre_1998', CAST(COUNT(*) AS BIGINT)
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ORDER BY check_name
    """,
)
def dq_contract_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality contract over the orders feed (the dbt-test /
    Great-Expectations tier): five declarative checks — non-null key,
    primary-key uniqueness, referential integrity into customer,
    accepted status values, positive amounts — each reported as a
    violation COUNT so the contract is a monitorable metric, not a
    boolean that hides magnitude.

    Scale shape: every check is a filter+count (map-side combinable)
    or a single-distinct aggregate; referential integrity is a LEFT
    ANTI join that broadcasts or shuffles on the key like any equi-
    join — no check is more expensive than one pass over the fact.
    A CI gate asserts all counts are 0; here the counts ARE the
    oracle-checked values (0 on conforming TPC-H data, and the
    accepted-values / FK checks would surface real drift)."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("n_violations").cast("long"),
        )

    not_null = orders.agg(
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("n_violations")
    )
    unique = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_violations")
    )
    orphans = (
        orders.filter(F.col("o_custkey").isNotNull())
        .join(
            customer,
            orders["o_custkey"] == customer["c_custkey"],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    accepted = orders.filter(
        ~F.col("o_orderstatus").isin("O", "F", "P")
    ).agg(F.count(F.lit(1)).alias("n_violations"))
    positive = orders.filter(F.col("o_totalprice") <= 0).agg(
        F.count(F.lit(1)).alias("n_violations")
    )
    # freshness is a deliberately NON-ZERO metric on this data: an
    # all-zero contract would hash-match any bug that also returns 0
    fresh = orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).agg(F.count(F.lit(1)).alias("n_violations"))
    out = check("custkey_not_null", not_null)
    for name, df in [
        ("orderkey_unique", unique),
        ("custkey_in_customer", orphans),
        ("status_accepted_values", accepted),
        ("totalprice_positive", positive),
        ("freshness_pre_1998", fresh),
    ]:
        out = out.unionByName(check(name, df))
    return out.orderBy("check_name")
