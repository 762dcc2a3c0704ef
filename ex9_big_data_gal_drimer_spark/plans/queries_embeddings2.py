"""Embedding-space training ops round 2 — contrastive-learning and
index-compression audits over the embeddings table (SURVEY.md §2.11
X3 tier; no reference counterpart — these are the north-star
similarity-search components the build brief names as first-class).

- ``hard_negative_mining``: per query vector, the top positive
  (same-label) and top hard-negative (different-label) neighbor plus
  the margin between them — the batch-mining step every contrastive /
  embedding-finetune pipeline runs, and the audit that catches label
  noise (negative ranked above positive ⇒ margin < 0).
- ``embedding_quantization_error``: exact per-label reconstruction
  error of int8 symmetric scalar quantization — the oracle-checked
  audit row for the SQ serving tier (knn_sq_cosine itself is
  rows-only; this pins the quantizer's arithmetic against ANSI SQL).

Oracle determinism: cosine similarities are computed as SEQUENTIAL
left-to-right folds in both engines (Spark ``F.aggregate`` over the
array vs DuckDB ``list_cosine_similarity`` over DOUBLE[]) — identical
operation order ⇒ bit-identical doubles, so rank-1 selection cannot
flip; the int8 code uses FLOOR(x+0.5) (identical in both engines)
instead of engine-specific ROUND half-modes.

Scale notes (100 TB): the query side is a 10-row broadcast (the
knn_* contract); the corpus side streams through one projection —
no corpus×corpus pair ever materializes; rank-1 extraction is a
partitioned window over the 10×|corpus| similarity relation (at real
scale the same mining runs over ANN candidates from the IVF/PQ tiers
instead of the exact relation — operators/similarity.py — and this
exact form is its recall oracle).  The quantization audit is two
partial-aggs (per-dim scale, per-label error) over one posexplode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import cosine_similarity
from .registry import register


@register(
    "hard_negative_mining",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
               label AS qlabel
        FROM embeddings WHERE vec_id < 10
    ),
    pairs AS (
        SELECT q.query_id, q.qlabel, e.vec_id AS neighbor_id, e.label,
               list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id, (label = qlabel)
            ORDER BY sim DESC, neighbor_id
        ) AS rn
        FROM pairs
    )
    SELECT query_id,
           MAX(CASE WHEN label = qlabel THEN neighbor_id END) AS pos_id,
           ROUND(MAX(CASE WHEN label = qlabel THEN sim END), 4) AS pos_sim,
           MAX(CASE WHEN label <> qlabel THEN neighbor_id END) AS neg_id,
           ROUND(MAX(CASE WHEN label <> qlabel THEN sim END), 4) AS neg_sim,
           ROUND(MAX(CASE WHEN label = qlabel THEN sim END)
                 - MAX(CASE WHEN label <> qlabel THEN sim END), 4) AS margin
    FROM ranked
    WHERE rn = 1
    GROUP BY query_id
    ORDER BY query_id
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-batch mining: for each of the 10 query vectors,
    the nearest SAME-label neighbor (positive), the nearest
    DIFFERENT-label neighbor (the hard negative), and the margin —
    negative margins flag label noise / impossible triplets before
    they poison a finetune.  Corpus streams once against the
    broadcast 10-row query side; rank-1 per (query, polarity) is a
    partitioned window with a unique (sim DESC, neighbor_id)
    order."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    pairs = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (F.col("label") == F.col("qlabel")).alias("is_pos"),
        cosine_similarity(F.col("qv"), F.col("v")).alias("sim"),
    )
    w = Window.partitionBy("query_id", "is_pos").orderBy(
        F.desc("sim"), "neighbor_id"
    )
    top = pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    pos_sim = F.max(F.when(F.col("is_pos"), F.col("sim")))
    neg_sim = F.max(F.when(~F.col("is_pos"), F.col("sim")))
    return (
        top.groupBy("query_id")
        .agg(
            F.max(F.when(F.col("is_pos"), F.col("neighbor_id"))).alias("pos_id"),
            F.round(pos_sim, 4).alias("pos_sim"),
            F.max(F.when(~F.col("is_pos"), F.col("neighbor_id"))).alias("neg_id"),
            F.round(neg_sim, 4).alias("neg_sim"),
            F.round(pos_sim - neg_sim, 4).alias("margin"),
        )
        .orderBy("query_id")
    )


@register(
    "embedding_quantization_error",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, pos, CAST(embedding[pos] AS DOUBLE) AS x
        FROM embeddings, generate_series(1, 64) AS t(pos)
    ),
    scales AS (
        SELECT pos, GREATEST(MAX(ABS(x)), 1e-12) AS scale FROM e GROUP BY pos
    ),
    recon AS (
        SELECT e.vec_id, e.label,
               ABS(e.x - (FLOOR(e.x / s.scale * 127.0 + 0.5) * s.scale / 127.0))
                   AS err
        FROM e JOIN scales s ON s.pos = e.pos
    )
    SELECT label,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vectors,
           ROUND(AVG(err), 6) AS avg_abs_err,
           ROUND(MAX(err), 6) AS max_abs_err
    FROM recon
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric scalar-quantization reconstruction error per
    label — the compression-vs-fidelity audit shipped alongside the
    SQ serving tier (knn_sq_cosine): per-dim scale = max |x| (exact,
    no accumulation), code = FLOOR(x/scale·127 + 0.5) (engine-
    identical rounding), error aggregated per label.  Two partial
    aggs over one posexplode; the per-dim scale table (64 rows)
    broadcasts.  At 100 TB the same audit runs over a sample — the
    arithmetic is the part worth pinning against ANSI SQL."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select("vec_id", "label", (F.col("pos") + 1).alias("pos"), F.col("col").alias("x"))
    scales = emb.groupBy("pos").agg(
        F.greatest(F.max(F.abs(F.col("x"))), F.lit(1e-12)).alias("scale")
    )
    err = (
        emb.join(F.broadcast(scales), "pos")
        .select(
            "vec_id",
            "label",
            F.abs(
                F.col("x")
                - F.floor(F.col("x") / F.col("scale") * 127.0 + 0.5)
                * F.col("scale")
                / 127.0
            ).alias("err"),
        )
    )
    return (
        err.groupBy("label")
        .agg(
            F.countDistinct("vec_id").alias("n_vectors"),
            F.round(F.avg("err"), 6).alias("avg_abs_err"),
            F.round(F.max("err"), 6).alias("max_abs_err"),
        )
        .orderBy("label")
    )
