"""Connected-components dedup grouping (recursive-CTE oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.dedup import ngram_jaccard_pairs
from ..operators.graph import connected_components
from .registry import register


@register(
    "dedup_connected_components",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, lang, n_chars // 50 AS len_bucket,
               string_split(LOWER(text), ' ') AS t
        FROM documents
    ), shingled AS (
        SELECT doc_id, lang, len_bucket,
               CASE WHEN len(t) >= 3
                    THEN list_distinct([list_aggr(t[i:i+2], 'string_agg', ' ')
                                        for i in range(1, len(t) - 1)])
                    ELSE [list_aggr(t, 'string_agg', ' ')]
               END AS sh
        FROM toks
    ), pairs AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM shingled a
        JOIN shingled b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket
             AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(a.sh || b.sh)) >= 0.5
    ), sym AS (
        SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
    ), reach AS (
        SELECT a AS node, b AS reachable FROM sym
        UNION
        SELECT r.node, s.b FROM reach r JOIN sym s ON r.reachable = s.a
    )
    SELECT node AS doc_id,
           CAST(LEAST(node, MIN(reachable)) AS BIGINT) AS component
    FROM reach
    GROUP BY node
    ORDER BY doc_id
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup grouping: connected components of the near-dup
    pair graph (A~B, B~C ⇒ one group even when A!~C) via distributed
    min-label propagation (operators.graph).  The oracle walks the
    same graph with a recursive CTE.  Keep-one-per-component = keep
    doc_id == component."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "len_bucket", (F.col("n_chars") / F.lit(50)).cast("long")
    )
    # Cache the pair edge set: it is the expensive part (inverted-index
    # self-join) and the CC loop's initial checkpoint re-materializes
    # it on every rebuild of this query.  CacheManager keys on the
    # logical plan, so repeated calls share one entry — the same
    # pattern as the posting-list cache inside ngram_jaccard_pairs.
    pairs = ngram_jaccard_pairs(
        docs, block_cols=("lang", "len_bucket"), shingle_k=3, threshold=0.5
    ).cache()
    return (
        connected_components(pairs)
        .select(F.col("node").alias("doc_id"), F.col("component").cast("long"))
        .orderBy("doc_id")
    )
