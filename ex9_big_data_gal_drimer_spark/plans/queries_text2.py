"""Text-analysis tranche 2 (X4): BPE-ish token counting + composite
quality scoring, oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.text import bpe_token_count, quality_score
from .registry import register


@register(
    "bpe_token_stats",
    oracle="""
    WITH per_doc AS (
        SELECT lang,
               len(regexp_extract_all(LOWER(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS n_bpe,
               LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_ws
        FROM documents
        WHERE LENGTH(text) > 0
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           ROUND(AVG(n_bpe), 2) AS avg_bpe_tokens,
           ROUND(AVG(CAST(n_bpe AS DOUBLE) / n_ws), 4) AS bpe_per_ws_token
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 token counting, BPE-ish regex flavor: alnum runs + single
    punctuation units (the pre-tokenization a byte-pair tokenizer
    sees), next to the whitespace count (reference idiom, main.py:116)
    — the ratio estimates tokenizer fertility per language."""
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_bpe = bpe_token_count(F.col("text"))
    n_ws = F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", "")) + 1
    return (
        docs.select("lang", n_bpe.alias("n_bpe"), n_ws.alias("n_ws"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe").cast("long").alias("total_bpe_tokens"),
            F.round(F.avg("n_bpe"), 2).alias("avg_bpe_tokens"),
            F.round(F.avg(F.col("n_bpe").cast("double") / F.col("n_ws")), 4).alias(
                "bpe_per_ws_token"
            ),
        )
        .orderBy("lang")
    )


#: DuckDB scalar twin of operators.text.quality_score (over a column
#: named ``text``) — shared by every oracle that gates on the
#: composite quality heuristic (here, queries_curation3.py).
QUALITY_Q_SQL = """ROUND(
                 0.4 * LEAST(1.0, CAST(len(string_split(LOWER(text), ' ')) AS DOUBLE) / 100.0)
               + 0.3 * (1.0 - COALESCE(
                     CASE WHEN LENGTH(text) > 0 THEN
                       CAST(LENGTH(REGEXP_REPLACE(LOWER(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                         / LENGTH(text) END, 1.0))
               + 0.3 * LEAST(1.0, COALESCE(
                     CASE WHEN len(string_split(LOWER(text), ' ')) > 0 THEN
                       CAST(len(list_filter(string_split(LOWER(text), ' '),
                            t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
                         / len(string_split(LOWER(text), ' ')) END, 0.0) * 5.0)
               , 4)"""


@register(
    "doc_quality_scores",
    oracle=f"""
    WITH scored AS (
        SELECT source,
               {QUALITY_Q_SQL} AS q
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG(q), 4) AS avg_quality,
           ROUND(MIN(q), 4) AS min_quality,
           ROUND(MAX(q), 4) AS max_quality
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 quality gate: composite length/cleanliness/stopword score per
    doc (operators.text.quality_score), aggregated per source — the
    shape of a pre-training corpus quality dashboard."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("source", quality_score(F.col("text")).alias("q"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
            F.round(F.min("q"), 4).alias("min_quality"),
            F.round(F.max("q"), 4).alias("max_quality"),
        )
        .orderBy("source")
    )
