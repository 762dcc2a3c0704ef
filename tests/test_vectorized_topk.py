"""Arrow-vectorized KNN must agree exactly with the JVM-expression
brute force (same rounding, same tiebreaks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.catalog import table
from ex9_big_data_gal_drimer_spark.operators.similarity import (
    brute_force_topk,
    vectorized_topk,
)

from conftest import SF_DIR


def test_vectorized_matches_expression_form(spark):
    emb = table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    exact = sorted(map(tuple, brute_force_topk(emb, q, k=5).collect()))
    vec = sorted(map(tuple, vectorized_topk(emb, q.toPandas(), k=5).collect()))
    assert exact == vec
