"""Statistical aggregate surface (SURVEY.md §2.4 additive)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import register


@register(
    "lineitem_price_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(STDDEV_SAMP(l_extendedprice), 2) AS stddev_price,
           ROUND(VAR_SAMP(l_discount), 6) AS var_discount,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def lineitem_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation/covariance)
    — single-pass moment computation per group, identical
    sample-form definitions in both engines.  (Skewness is excluded:
    Spark computes the population form g1 where DuckDB bias-corrects
    to the sample form G1 — a documented engine divergence.)"""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("stddev_price"),
            F.round(F.var_samp("l_discount"), 6).alias("var_discount"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
        )
        .orderBy("l_returnflag")
    )
