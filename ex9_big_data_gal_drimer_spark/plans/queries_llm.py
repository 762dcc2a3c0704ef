"""LLM-data-pipeline operators (SURVEY.md §2.11, north-star X1-X5).

Training-data-pipeline surface over `documents` and `embeddings`:

- X1 exact dedup (hash-groupBy on normalized text),
- X2 near-dup dedup: blocked n-gram Jaccard (oracle-checked) and
  MinHash-LSH (scale path; registered rows-only in queries_llm_lsh),
- X3 similarity search: brute-force cosine top-k (oracle-checked
  baseline; LSH-bucketed variant is the scale path),
- X4 text analysis: token stats, word frequency, language mix,
  quality scoring, fingerprinting.

Scale design: every query here avoids an unblocked quadratic
self-join.  Near-dup candidate generation is blocked on
(lang, length-bucket) — at 100 TB the same structure holds with
MinHash band buckets as the blocking key (see dedup_minhash_lsh).
All text expressions are JVM-side built-ins; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions import cosine_similarity, tokens
from .registry import register


@register(
    "dedup_exact_docs",
    oracle="""
    WITH groups AS (
        SELECT md5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fingerprint,
               CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents
        GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_unique_docs,
           CAST(SUM(n_copies) AS BIGINT) AS n_total_docs,
           CAST(SUM(n_copies - 1) AS BIGINT) AS n_removed,
           CAST(COUNT(CASE WHEN n_copies > 1 THEN 1 END) AS BIGINT) AS n_dup_groups
    FROM groups
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact dedup: normalize (lowercase, collapse whitespace) →
    fingerprint → keep min doc_id per group.  One hash-shuffle on the
    fingerprint; the same plan dedups 100 TB (generalizes the
    reference's COUNT(DISTINCT HotelCode), main.py:36)."""
    docs = table(spark, sf_dir, "documents")
    fingerprint = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    groups = docs.groupBy(fingerprint.alias("fingerprint")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_unique_docs"),
        F.sum("n_copies").cast("long").alias("n_total_docs"),
        F.sum(F.col("n_copies") - 1).cast("long").alias("n_removed"),
        F.count(F.when(F.col("n_copies") > 1, 1)).alias("n_dup_groups"),
    )


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
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
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(a.sh || b.sh)), 4) AS jaccard_sim
    FROM shingled a
    JOIN shingled b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
         AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(a.sh || b.sh)) >= 0.5
    ORDER BY doc_id_a, doc_id_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 near-dup pairs: 3-word-shingle Jaccard >= 0.5 within
    (lang, length-bucket) blocks.

    Blocking bounds the candidate set, and the implementation
    (operators.dedup.ngram_jaccard_pairs) is an inverted-index plan:
    explode shingles → equi-join on (block, shingle) → |A∩B| as a
    count — no per-pair array ops, no cross join anywhere.  Recall
    loss at bucket boundaries is identical in the oracle by
    construction.  At 100 TB the blocking key becomes MinHash band
    buckets (see dedup_minhash_lsh) — same join shape.
    """
    from ..operators.dedup import ngram_jaccard_pairs

    docs = table(spark, sf_dir, "documents").withColumn(
        "len_bucket", (F.col("n_chars") / F.lit(50)).cast("long")
    )
    return ngram_jaccard_pairs(
        docs, block_cols=("lang", "len_bucket"), shingle_k=3, threshold=0.5
    ).orderBy("doc_id_a", "doc_id_b")


@register(
    "dedup_ngram_prefix",
    oracle="""
    WITH toks AS (
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
    )
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(a.sh || b.sh)), 4) AS jaccard_sim
    FROM shingled a
    JOIN shingled b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
         AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(a.sh || b.sh)) >= 0.5
    ORDER BY doc_id_a, doc_id_b
    """,
)
def dedup_ngram_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 near-dup pairs via PREFIX FILTERING — result-identical to
    dedup_ngram_jaccard (same oracle) with the similarity-join
    literature's candidate reduction: only each doc's first
    floor((1-t)|sh|)+1 shingles (under a global xxhash64 order) enter
    the inverted index; the prefix-filter theorem guarantees no
    qualifying pair is missed.  At t=0.5 this halves the index and
    ~quarters candidate pairs; at higher thresholds the cut is
    dramatic (t=0.8 → ~25×) — the knob that keeps exact similarity
    self-joins feasible at 100 TB.  Verification computes exact
    Jaccard on the (small) candidate set only."""
    from ..operators.dedup import ngram_jaccard_pairs_prefix

    docs = table(spark, sf_dir, "documents").withColumn(
        "len_bucket", (F.col("n_chars") / F.lit(50)).cast("long")
    )
    return ngram_jaccard_pairs_prefix(
        docs, block_cols=("lang", "len_bucket"), shingle_k=3, threshold=0.5
    ).orderBy("doc_id_a", "doc_id_b")


@register(
    "knn_bruteforce_cosine",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10
    ), pairs AS (
        SELECT q.query_id, e.vec_id,
               ROUND(list_cosine_similarity(q.qv, e.v), 4) AS sim
        FROM q, e
        WHERE e.vec_id != q.query_id
    ), ranked AS (
        SELECT query_id, vec_id AS neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id) AS rnk
        FROM pairs
    )
    SELECT query_id, neighbor_id, sim, rnk
    FROM ranked
    WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 similarity search baseline: brute-force cosine top-5 for 10
    query vectors.  The query side is broadcast (tiny); cosine is a
    JVM-side zip_with/aggregate fold — no UDF; ranking is on the
    ROUNDed similarity with vec_id tiebreak so float noise can't flip
    the order vs the oracle.  The IVF/LSH variant for full KNN-graph
    workloads is `similarity.lsh_cosine_topk`."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    sim = F.round(cosine_similarity(F.col("qv"), F.col("v")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .orderBy("query_id", "rnk")
    )


@register(
    "text_quality_by_source",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           ROUND(AVG(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1), 2)
               AS avg_tokens,
           ROUND(AVG(CAST(LENGTH(REGEXP_REPLACE(text, '[a-z0-9 ]', '', 'g'))
                          AS DOUBLE) / LENGTH(text)), 4) AS avg_nonalnum_ratio
    FROM documents
    WHERE LENGTH(text) > 0
    GROUP BY source
    ORDER BY source
    """,
)
def text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 quality scoring: length/token/punctuation-ratio heuristics
    per source — the standard pre-training quality gates, all JVM-side
    string expressions (token idiom from reference main.py:116)."""
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_tokens = F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", "")) + 1
    nonalnum = F.length(F.regexp_replace(F.col("text"), "[a-z0-9 ]", "")).cast(
        "double"
    ) / F.length("text")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg(n_tokens), 2).alias("avg_tokens"),
            F.round(F.avg(nonalnum), 4).alias("avg_nonalnum_ratio"),
        )
        .orderBy("source")
    )


@register(
    "word_freq_top20",
    oracle="""
    SELECT word,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM (
        SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS word
        FROM documents
    )
    WHERE TRIM(word) != ''
    GROUP BY word
    ORDER BY n_occurrences DESC, word
    LIMIT 20
    """,
)
def word_freq_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 tokenize→explode→count (the wordcount shape): top-20 tokens.
    explode fans out rows map-side; the count aggregates with partial
    (map-side combine), so the shuffle carries one row per (word,
    partition), not per token occurrence."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
        .filter(F.trim("word") != "")
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "word")
        .limit(20)
    )


@register(
    "lang_distribution",
    oracle="""
    WITH c AS (
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang
    ), t AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM c
    )
    SELECT lang, n_docs, total_chars,
           ROUND(n_docs * 100.0 / total, 2) AS pct_docs
    FROM c, t
    ORDER BY n_docs DESC, lang
    """,
)
def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 language mix with percent-of-corpus (reference
    percent-of-total pattern, main.py:49, on the documents table)."""
    from ..operators.relational import percent_of_total

    docs = table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    return (
        percent_of_total(c, "n_docs", pct_col="pct_docs")
        .select("lang", "n_docs", "total_chars", "pct_docs")
        .orderBy(F.desc("n_docs"), "lang")
    )


@register(
    "doc_fingerprint_stats",
    oracle="""
    WITH fp AS (
        SELECT doc_id, source,
               md5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT fingerprint) AS n_unique_fingerprints
    FROM fp
    GROUP BY source
    ORDER BY source
    """,
)
def doc_fingerprint_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 document fingerprinting: normalized-text md5 per doc, distinct
    fingerprints per source (duplicate-rate monitoring)."""
    docs = table(spark, sf_dir, "documents")
    fingerprint = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    return (
        docs.select("source", fingerprint.alias("fingerprint"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_unique_fingerprints"),
        )
        .orderBy("source")
    )


@register(
    "embedding_stats_by_label",
    oracle="""
    WITH norms AS (
        SELECT label,
               sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                            x -> x * x))) AS l2
        FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vectors,
           ROUND(AVG(l2), 4) AS avg_l2_norm,
           ROUND(MIN(l2), 4) AS min_l2_norm,
           ROUND(MAX(l2), 4) AS max_l2_norm
    FROM norms
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_stats_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 support: per-label L2-norm stats over the embedding column —
    array math via JVM-side aggregate fold, no UDF."""
    from ..functions import l2_norm

    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label", l2_norm(F.col("embedding").cast("array<double>")).alias("l2")
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("l2"), 4).alias("avg_l2_norm"),
            F.round(F.min("l2"), 4).alias("min_l2_norm"),
            F.round(F.max("l2"), 4).alias("max_l2_norm"),
        )
        .orderBy("label")
    )
