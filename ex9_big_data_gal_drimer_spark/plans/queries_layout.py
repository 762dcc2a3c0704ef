"""Driver-visible partition-pruned scan (SURVEY.md §4 data skipping).

Like the bucketed join, the layout write happens at plan construction
(tmp-backed path, idempotent overwrite); the oracle recomputes the
same window straight from the unpartitioned table, so the pruned
layout must be value-identical to a full scan + filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.layout import PART_COL, ingest_partitioned, read_partitioned
from .registry import register


@register(
    "partitioned_scan_pruning",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-07-01'
    GROUP BY 1
    ORDER BY 1
    """,
)
def partitioned_scan_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue for 1996 H1 read from the date-partitioned
    layout: the month predicate is a PARTITION filter, so the scan
    touches 6 of ~84 directories and skips the rest entirely — the
    time-window data-skipping a 100 TB fact table depends on
    (tests/test_layout.py pins PartitionFilters in the plan and the
    value parity vs the full-scan oracle here)."""
    path = ingest_partitioned(spark, sf_dir)
    li = read_partitioned(spark, path)
    return (
        li.filter(F.col(PART_COL).between("1996-01", "1996-06"))
        .groupBy(F.col(PART_COL).alias("ship_month"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
        )
        .orderBy("ship_month")
    )


@register(
    "sorted_layout_rowgroup_skip",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-03-01'
      AND l_shipdate <  TIMESTAMP '1995-04-01'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def sorted_layout_rowgroup_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-month scan over the SORT-CLUSTERED lineitem layout
    (sources/layout.py::ingest_sorted): the l_shipdate predicate is a
    pushed parquet filter, and because the files are globally
    range-ordered on that column, only the row groups whose [min,max]
    straddle March 1995 are decoded — row-group skipping, the
    within-file twin of partition pruning (partitioned_scan_pruning).
    tests/test_layout.py reads the parquet footers directly and pins
    that the fraction of row groups intersecting the predicate is a
    small minority in this layout but ~all of them in an unsorted
    copy of the same rows."""
    from ..sources.layout import ingest_sorted

    path = ingest_sorted(spark, sf_dir)
    li = spark.read.parquet(path)
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-03-01")
            & (F.col("l_shipdate") < "1995-04-01")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "zorder_layout_skip",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-03-01'
      AND l_shipdate <  TIMESTAMP '1995-06-01'
      AND l_partkey BETWEEN 1000 AND 3000
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def zorder_layout_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-predicate scan (time range AND part-id range) over the
    Z-ORDER-clustered lineitem layout (sources/layout.py::
    ingest_zordered): bit-interleaved (l_shipdate, l_partkey) ranks
    give row-group locality on BOTH columns, so each pushed filter
    skips independently — a compound (a, b) sort would prune only on
    `a`.  tests/test_layout.py reads the footers and pins that BOTH
    columns' intersecting row-group fractions are minorities in this
    layout, while the single-column sorted layout prunes only its own
    sort column."""
    from ..sources.layout import ingest_zordered

    path = ingest_zordered(spark, sf_dir)
    li = spark.read.parquet(path)
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-03-01")
            & (F.col("l_shipdate") < "1995-06-01")
            & (F.col("l_partkey").between(1000, 3000))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "schema_evolution_scan",
    oracle="""
    WITH unioned AS (
        SELECT o_orderkey, o_totalprice, o_orderdate,
               CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 'online' ELSE 'store' END
               END AS o_channel
        FROM orders
    )
    SELECT COALESCE(o_channel, 'pre_channel') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM unioned
    GROUP BY 1
    ORDER BY 1
    """,
)
def schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read (SURVEY.md §2.1 source-surface
    generalization): the orders table written in two generations —
    pre-1998 without, 1998+ WITH a late-added ``o_channel`` column
    (sources/layout.py::ingest_evolving) — is read back as ONE
    relation via ``mergeSchema=true``; v1 rows surface NULL for the
    late column and roll up under 'pre_channel'.  The oracle
    recomputes the same union from the unevolved base table, so the
    merged scan must be value-identical to history + new data.  At
    100 TB this is the no-rewrite column-add path: schema merge is
    footer-only work per file, data files are untouched."""
    from ..sources.layout import ingest_evolving

    v1, v2 = ingest_evolving(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(v1, v2)
    return (
        merged.groupBy(
            F.coalesce(F.col("o_channel"), F.lit("pre_channel")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("channel")
    )


@register(
    "layout_file_audit",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           CAST(1 AS BIGINT) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
)
def layout_file_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-grain observability over the date-partitioned layout: rows
    and FILE COUNT per partition directory via input_file_name() — the
    small-files detector a 100 TB table runs nightly (query cost
    tracks file count; a partition fragmenting into hundreds of files
    is the signal to run sources/layout.py::compact).  The oracle pins
    the layout's design invariant from the BASE table: exactly ONE
    file per partition (ingest_partitioned repartitions by the
    partition column before writing) and the full row count per month
    — if the write ever fragments, n_files here diverges from the
    oracle's literal 1 and the hash check fails."""
    from ..sources.layout import ingest_partitioned, read_partitioned

    path = ingest_partitioned(spark, sf_dir)
    li = read_partitioned(spark, path)
    return (
        li.select(F.col(PART_COL).alias("ship_month"), F.input_file_name().alias("f"))
        .groupBy("ship_month")
        .agg(
            F.countDistinct("f").alias("n_files"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("ship_month")
    )
