"""Spark-4 SQL-surface tier: native recursive CTE, catalog SQL UDFs,
and built-in linear-regression aggregates.

Three capabilities the reference gets "for free" from DuckDB's SQL
dialect (reference main.py delegates every query to DuckDB SQL) that
Spark only recently grew natively — each registered here as an
oracle-checked query so the parity is value-hashed, not claimed:

- ``WITH RECURSIVE`` (Spark 4.0, SPARK-24497): iteration inside ONE
  declarative plan — no driver loop, no localCheckpoint;
- SQL UDFs (``CREATE FUNCTION … RETURN expr``): user abstractions
  that inline into Catalyst and stay inside whole-stage codegen —
  unlike Python UDFs there is no serialization boundary at all;
- ``regr_slope`` / ``regr_intercept`` / ``regr_r2``: single-pass
  distributed least squares as plain aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from .registry import register


@register(
    "recursive_month_series",
    oracle="""
    WITH RECURSIVE series(m, max_m) AS (
        SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE),
               CAST(date_trunc('month', MAX(o_orderdate)) AS DATE)
        FROM orders
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE), max_m
        FROM series WHERE m < max_m
    ),
    monthly AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS ym,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY 1
    )
    SELECT strftime(series.m, '%Y-%m') AS order_month,
           COALESCE(monthly.n, 0) AS n_orders,
           COALESCE(monthly.total, 0.0) AS total_price
    FROM series LEFT JOIN monthly ON strftime(series.m, '%Y-%m') = monthly.ym
    ORDER BY order_month
    """,
)
def recursive_month_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free monthly revenue calendar via a NATIVE recursive CTE
    (Spark 4.0): the anchor row carries (first_month, last_month),
    the recursive member advances one month until the bound, and a
    left join zero-fills months with no orders — the time-series
    densification every dashboard needs, with the series generated
    INSIDE the plan instead of a driver-side loop.

    The recursion depth is bounded by the calendar span (≤ ~80 rounds
    here), independent of row count — at 100 TB the orders scan is
    the cost; the recursion is metadata-sized.  Contrast with
    operators/graph.py's connected components, where the fixpoint
    depends on DATA and a driver loop with explicit convergence
    checks is the honest form."""
    register_views(spark, sf_dir, tables=("orders",))
    # cteRecursionLevelLimit (one level per calendar month) is raised
    # engine-wide in session.RUNTIME_CONF, applied by register_views'
    # configure() call — no per-query session mutation here
    return spark.sql(
        """
        WITH RECURSIVE series AS (
            SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS m,
                   CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS max_m
            FROM orders
            UNION ALL
            SELECT add_months(m, 1) AS m, max_m
            FROM series WHERE m < max_m
        ),
        monthly AS (
            SELECT date_format(o_orderdate, 'yyyy-MM') AS ym,
                   COUNT(*) AS n,
                   ROUND(SUM(o_totalprice), 2) AS total
            FROM orders GROUP BY 1
        )
        SELECT date_format(series.m, 'yyyy-MM') AS order_month,
               COALESCE(monthly.n, 0L) AS n_orders,
               COALESCE(monthly.total, 0.0D) AS total_price
        FROM series LEFT JOIN monthly
          ON date_format(series.m, 'yyyy-MM') = monthly.ym
        ORDER BY order_month
        """
    )


@register(
    "sql_udf_doc_score",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(
               LEAST(1.0, LENGTH(text) / 500.0) *
               (0.5 + 0.5 * (LENGTH(TRIM(text)) > 0)::INT)
           ), 4) AS avg_score
    FROM documents
    GROUP BY lang ORDER BY lang
    """,
)
def sql_udf_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document scoring through a SQL UDF (Spark 4.0 ``CREATE
    FUNCTION … RETURN expr``): the scoring rule is a named, reusable
    catalog object, yet it INLINES into the plan — the optimized plan
    shows the expanded expression inside WholeStageCodegen, with no
    eval boundary (pinned by tests/test_spark4_sql.py).  This is the
    abstraction tier between raw inline expressions and Pandas UDFs:
    named like a UDF, costed like an expression.  The oracle spells
    the identical arithmetic inline — same values, proving the UDF is
    pure sugar."""
    register_views(spark, sf_dir, tables=("documents",))
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION doc_len_score(t STRING)
        RETURNS DOUBLE
        RETURN LEAST(1.0, LENGTH(t) / 500.0) *
               (0.5 + 0.5 * CAST(LENGTH(TRIM(t)) > 0 AS INT))
        """
    )
    return spark.sql(
        """
        SELECT lang,
               COUNT(*) AS n_docs,
               ROUND(AVG(doc_len_score(text)), 4) AS avg_score
        FROM documents
        GROUP BY lang ORDER BY lang
        """
    )


@register(
    "price_size_regression",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(regr_slope(p_retailprice, p_size), 4) AS slope,
           ROUND(regr_intercept(p_retailprice, p_size), 4) AS intercept,
           ROUND(regr_r2(p_retailprice, p_size), 4) AS r2,
           ROUND(corr(p_retailprice, p_size), 4) AS pearson_r
    FROM part
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def price_size_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand least-squares fit of retail price against size with
    the ANSI regression aggregates (regr_slope / regr_intercept /
    regr_r2, Spark 3.5+) — a full distributed linear regression in
    ONE partial-aggregable pass (each aggregate reduces to running
    sums of x, y, x², y², xy, so map-side combine applies and the
    shuffle carries 6 numbers per brand regardless of row count: the
    normal-equations form of the 100 TB trend fit).  The oracle runs
    DuckDB's identically-named aggregates."""
    register_views(spark, sf_dir, tables=("part",))
    return spark.sql(
        """
        SELECT p_brand,
               COUNT(*) AS n_parts,
               ROUND(regr_slope(p_retailprice, p_size), 4) AS slope,
               ROUND(regr_intercept(p_retailprice, p_size), 4) AS intercept,
               ROUND(regr_r2(p_retailprice, p_size), 4) AS r2,
               ROUND(corr(p_retailprice, p_size), 4) AS pearson_r
        FROM part
        GROUP BY p_brand ORDER BY p_brand
        """
    )
