"""Embedding-space dedup (north star: "embedding-cosine near-dup")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import cosine_similarity
from .registry import register


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), pairs AS (
        SELECT a.label, a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
               ROUND(list_cosine_similarity(a.v, b.v), 4) AS cosine_sim
        FROM e a
        JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT label, vec_id_a, vec_id_b, cosine_sim
    FROM pairs
    ORDER BY cosine_sim DESC, vec_id_a, vec_id_b
    LIMIT 10
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection: the most-similar same-label
    vector pairs (a real dedup pass drops pairs above a threshold; this
    corpus plants none, so the query surfaces the ranking instead —
    same plan either way).

    Label blocking bounds the pair count; at 100 TB the blocking key
    becomes the hyperplane-LSH bucket (operators.similarity) and the
    exact cosine runs on candidates only.  Probe side repartitioned —
    single-file sources otherwise serialize the pair evaluation.
    """
    par = spark.sparkContext.defaultParallelism
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.repartition(par, F.col("vec_id")).alias("a")
    b = e.alias("b")
    sim = F.round(cosine_similarity(F.col("a.v"), F.col("b.v")), 4)
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            sim.alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), "vec_id_a", "vec_id_b")
        .limit(10)
    )
