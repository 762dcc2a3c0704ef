"""Second tranche of relational coverage (SURVEY.md §2.6 O3/O4, §2.7
U1, §2.8 date functions, §2.4 grouping-sets + approx variants)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import register_views, table
from ..operators.relational import others_bucket
from ..operators.sampling import (
    sample_by_fractions,
    seeded_sample_n,
    stratified_sample,
)
from .registry import register


@register(
    "nation_orders_others_bucket",
    oracle="""
    WITH counts AS (
        SELECT n.n_name AS nation, COUNT(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ), ranked AS (
        SELECT nation, n_orders,
               ROW_NUMBER() OVER (ORDER BY n_orders DESC, nation) AS rn
        FROM counts
    )
    SELECT CASE WHEN rn <= 5 THEN nation ELSE 'Others' END AS nation,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders
    FROM ranked
    GROUP BY 1
    ORDER BY n_orders DESC
    """,
)
def nation_orders_others_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/O4/U1 (reference main.py:174-179): top-5 nations by order
    count with everything else folded into one 'Others' row — the
    reference's pandas concat done as a window + re-group (one pass,
    no driver-side rows)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    counts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        others_bucket(counts, "nation", "n_orders", 5, tiebreak_cols=("nation",))
        .withColumn("n_orders", F.col("n_orders").cast("long"))
        .orderBy(F.desc("n_orders"))
    )


@register(
    "union_high_value_customers",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_sources FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000
        UNION ALL
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
    )
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def union_high_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 union surface: two qualifying customer sets concatenated
    (unionByName ≡ UNION ALL) then counted — distinguishes the
    bag-union from the set-union the INTERSECT/EXCEPT query covers."""
    o = table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000).select("o_custkey").distinct()
    urgent = (
        o.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 300000)
        )
        .select("o_custkey")
        .distinct()
    )
    return (
        big.unionByName(urgent)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_sources"))
        .orderBy("o_custkey")
    )


@register(
    "orders_date_parts",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS order_quarter,
           COUNT(*) AS n_orders,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY 1, 2
    ORDER BY order_year, order_quarter
    """,
)
def orders_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction (year/quarter) — additive temporal surface
    (the reference has no date columns, SURVEY.md §2.8)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("order_year", "order_quarter")
    )


@register(
    "grouping_sets_sql",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY status, priority
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the spark.sql surface (the
    engine's SQL entry point — same ANSI text runs on both engines)."""
    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY status, priority
        """
    )


@register("seeded_sample_orders")
def seeded_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 (reference main.py:257-258): seeded exact-n uniform sample
    of a QUERY RESULT — the reference's actual use (it samples each
    query's ≤full result before persisting, never a raw fact table).
    The global sort-by-rand therefore only ever sees post-aggregate
    data (#days rows here); sampling a raw 100 TB fact table uses
    stratified_sample_orders / sample_fractions_lineitem instead
    (sampling.py scale note).  Rows-only: RNGs differ across engines;
    determinism and quota are pinned by tests."""
    daily = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )
    return seeded_sample_n(daily, 500, seed=42)


@register("stratified_sample_orders")
def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 (reference main.py:259-262, dead code there — first-class
    here): exact quota-per-stratum sample, 100 rows per order
    priority.  One shuffle on the stratum key; each stratum's
    rand-ordered row_number window runs inside its partition, so
    strata parallelize.  Rows-only (seeded RNG); quota + determinism
    pinned by tests/test_sampling_queries.py."""
    return stratified_sample(
        table(spark, sf_dir, "orders"), ["o_orderpriority"], 100, seed=42
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@register(
    "sample_md5_topn_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(o_totalprice, 2) AS total_price
    FROM (
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders
        ORDER BY md5(CAST(o_orderkey AS VARCHAR))
        LIMIT 200
    )
    ORDER BY o_orderkey
    """,
)
def sample_md5_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1's ORACLE-CHECKABLE twin (round-5 verdict #5): the 200 orders
    with the smallest md5(o_orderkey) — a deterministic hash-order
    sample both engines compute bit-identically, unlike F.rand(42)
    whose stream matches no DuckDB RNG (seeded_sample_orders stays the
    production tier).  Statistically uniform: md5 scrambles key order,
    so the selected set is an unbiased 200-row draw, reproducible
    forever and append-stable (new keys displace old ones only by hash
    order).  Plan: TakeOrderedAndProject — per-partition top-200 then
    a 200·P-row driver merge, no global sort, 100 TB-safe.
    Reference seed: main.py:257-258 (seeded result sampling)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.md5(F.col("o_orderkey").cast("string")).alias("__h"),
        )
        .orderBy("__h")
        .limit(200)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "sample_md5_stratified_orders",
    oracle="""
    WITH r AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY md5(CAST(o_orderkey AS VARCHAR))) AS rn
        FROM orders
    )
    SELECT o_orderkey, o_orderpriority,
           ROUND(o_totalprice, 2) AS total_price
    FROM r WHERE rn <= 40
    ORDER BY o_orderpriority, o_orderkey
    """,
)
def sample_md5_stratified_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2's ORACLE-CHECKABLE twin: exact 40-per-priority quota drawn
    by smallest md5(o_orderkey) within each stratum — same window
    shape as stratified_sample_orders (the F.rand production tier)
    but reproducible across engines, so the driver banks a hash-green
    row for the §2.9 stratified operator.  One shuffle on the stratum
    key; md5 is unique per key so no tie can flip membership.
    Reference seed: main.py:259-262 (stratified variant)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string"))
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


@register("sample_fractions_lineitem")
def sample_fractions_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB sampling default: fraction-per-stratum ``sampleBy``
    — one map-side Bernoulli pass, NO shuffle, no sort, scales to any
    input size.  Rows-only (count is binomial, not exact; seed makes
    it deterministic per partition layout)."""
    li = table(spark, sf_dir, "lineitem")
    sampled = sample_by_fractions(
        li, "l_returnflag", {"A": 0.01, "N": 0.01, "R": 0.01}, seed=42
    )
    return (
        sampled.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("l_returnflag")
    )


@register("approx_distinct_scale_variant")
def approx_distinct_scale_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1's 100 TB variant: approx_count_distinct (HLL++) next to the
    exact count — rows-only (HLL sketches are engine-specific).  At
    scale the approx form replaces the exact Expand-based plan wherever
    ±2% error is acceptable.

    The exact and approx aggregates run as separate one-row jobs
    joined at the end: combining an exact multi-DISTINCT with plain
    aggregates in one pass makes Catalyst's Expand rewrite multiply
    every input row through the HLL updates too (measured 2-3× slower
    than the two-pass form).

    Round-14 (guide §1.2 — don't compute what you throw away): the
    orderkey HLL now updates over the DEDUPED key set that the exact
    count builds anyway — an HLL sketch is a function of the value
    SET, so the estimate is bit-identical while the full-row pass
    updates one sketch (l_partkey) instead of two."""
    li = table(spark, sf_dir, "lineitem")
    keys = li.select("l_orderkey").where(F.col("l_orderkey").isNotNull()).distinct()
    exact = keys.agg(
        F.count(F.lit(1)).alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
    )
    approx = li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
    )
    return exact.crossJoin(F.broadcast(approx))
