"""Oracle-checked IVF probe (SURVEY.md §2.11 X3 similarity tier).

The production IVF paths (operators/similarity.py knn_ivf_cosine /
knn_ivf_trained) are rows-only at the driver: their cell assignment
depends on sampled / k-means-trained centroids.  This twin pins the
IVF *query mechanics* — assign, probe, candidate-restricted exact
re-rank — with DETERMINISTIC centroids (the first 8 vectors by
vec_id), so the full index pipeline is reproducible in ANSI SQL and
hash-checked at the driver gate.

Oracle determinism: every cosine is the same sequential left-to-right
fold in both engines (functions.cosine_similarity ≡ DuckDB
list_cosine_similarity over DOUBLE[]) — bit-identical doubles, so the
argmin/argmax windows cannot flip (the queries_embeddings2.py
precedent).

Scale notes (100 TB): this is the serving topology the trained tier
uses — centroids broadcast (model-sized, k×dim), ONE pass assigns
every corpus vector to its cell (corpus × k broadcast join, linear),
probes are an equi-join on cell id (only nprobe/k of the corpus is
scanned per query), and the exact re-rank touches candidates only.
Vector payloads stay out of the candidate fan-out until the re-rank
join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions import cosine_similarity
from .registry import register


@register(
    "knn_ivf_oracle_fixed_centroids",
    oracle="""
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (
        SELECT vec_id AS c_id, v AS cv FROM emb WHERE vec_id < 8
    ),
    assign AS (
        SELECT vec_id, c_id FROM (
            SELECT e.vec_id, c.c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.c_id
                   ) AS rn
            FROM emb e CROSS JOIN cent c
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 10),
    probe AS (
        SELECT query_id, c_id FROM (
            SELECT q.query_id, c.c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.c_id
                   ) AS rn
            FROM q CROSS JOIN cent c
        ) WHERE rn <= 2
    ),
    cand AS (
        SELECT p.query_id, a.vec_id
        FROM probe p JOIN assign a ON a.c_id = p.c_id
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, rank, neighbor_id, sim FROM (
        SELECT c.query_id,
               ROW_NUMBER() OVER (
                   PARTITION BY c.query_id
                   ORDER BY list_cosine_similarity(q.qv, e.v) DESC, c.vec_id
               ) AS rank,
               c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.qv, e.v), 4) AS sim
        FROM cand c
        JOIN q ON q.query_id = c.query_id
        JOIN emb e ON e.vec_id = c.vec_id
    ) WHERE rank <= 3
    ORDER BY query_id, rank
    """,
)
def knn_ivf_oracle_fixed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-3 ANN with fixed centroids (vec_id < 8), nprobe=2,
    oracle-checked end to end: one broadcast pass assigns every vector
    to its nearest centroid cell, each of the 10 query vectors probes
    its 2 nearest cells, and the exact cosine re-rank runs over cell
    candidates only.  Driver-checkable twin of ``knn_ivf_cosine`` /
    ``knn_ivf_trained`` (operators/similarity.py:93,257 — rows-only
    because their centroids are sampled/trained)."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("csim"), "c_id"
    )
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "c_id",
            cosine_similarity(F.col("v"), F.col("cv")).alias("csim"),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "c_id")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("csim"), "c_id")
    probe = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id", "c_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("csim"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= 2)
        .select("query_id", "c_id")
    )
    cand = probe.join(assign, "c_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = cosine_similarity(F.col("qv"), F.col("v"))
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), "vec_id")
    return (
        cand.join(F.broadcast(q), "query_id")
        .join(emb, "vec_id")
        .select("query_id", "vec_id", sim.alias("sim_raw"))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            F.round("sim_raw", 4).alias("sim"),
        )
        .orderBy("query_id", "rank")
    )
