"""End-to-end training-corpus curation (SURVEY.md §2.11 composite).

The individual X-operators (quality scoring, exact dedup, near-dup
pairs) each have their own registered query; this module chains them
the way a real pre-training data pipeline does and reports the
per-stage funnel — the artifact a data-curation run actually ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import query_persist, table
from .registry import register


@register(
    "chunk_documents",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split(LOWER(text), ' ') AS t
        FROM documents
    ), chunks AS (
        SELECT doc_id, source, u.s, t[u.s+1:u.s+16] AS chunk
        FROM toks, UNNEST(range(0, len(t), 8)) AS u(s)
    )
    SELECT source,
           COUNT(*) AS n_chunks,
           COUNT(DISTINCT doc_id) AS n_docs,
           ROUND(AVG(len(chunk)), 2) AS avg_chunk_tokens,
           CAST(COUNT(CASE WHEN len(chunk) = 16 THEN 1 END) AS BIGINT)
               AS n_full_chunks
    FROM chunks
    GROUP BY 1
    ORDER BY 1
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the context-window prep op
    of a training pipeline: each doc's token stream cut into 16-token
    windows with stride 8 (50% overlap), summarized per source.

    Entirely JVM-side: `sequence` generates the window starts,
    `explode` fans them out map-side, `slice` cuts each window — no
    UDF, no shuffle until the final per-source aggregate (which
    combines map-side).  At 100 TB chunk rows never materialize
    wholesale: the explode feeds the consumer (tokenizer/writer)
    within the same stage.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.split(F.lower(F.col("text")), " ").alias("t")
    )
    starts = F.sequence(F.lit(0), F.size("t") - 1, F.lit(8))
    chunk_len = F.size(F.slice(F.col("t"), F.col("s") + 1, F.lit(16)))
    return (
        toks.select("doc_id", "source", "t", F.explode(starts).alias("s"))
        .select("doc_id", "source", chunk_len.alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.round(F.avg("n_tok"), 2).alias("avg_chunk_tokens"),
            F.count(F.when(F.col("n_tok") == 16, 1)).alias("n_full_chunks"),
        )
        .orderBy("source")
    )


@register(
    "curate_training_corpus",
    oracle="""
    WITH quality AS (
        SELECT * FROM documents
        WHERE n_chars >= 100
          AND CAST(LENGTH(REGEXP_REPLACE(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
              / LENGTH(text) <= 0.05
    ), keep AS (
        SELECT MIN(doc_id) AS doc_id
        FROM quality
        GROUP BY md5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')))
    ), exact AS (
        SELECT q.* FROM quality q WHERE q.doc_id IN (SELECT doc_id FROM keep)
    ), toks AS (
        SELECT doc_id, lang, n_chars // 50 AS len_bucket,
               string_split(LOWER(text), ' ') AS t
        FROM exact
    ), shingled AS (
        SELECT doc_id, lang, len_bucket,
               CASE WHEN len(t) >= 3
                    THEN list_distinct([list_aggr(t[i:i+2], 'string_agg', ' ')
                                        for i in range(1, len(t) - 1)])
                    ELSE [list_aggr(t, 'string_agg', ' ')]
               END AS sh
        FROM toks
    ), dup_pairs AS (
        SELECT b.doc_id AS drop_id
        FROM shingled a
        JOIN shingled b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket
             AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(a.sh || b.sh)) >= 0.5
    ), final AS (
        SELECT e.* FROM exact e
        WHERE NOT EXISTS (SELECT 1 FROM dup_pairs p WHERE p.drop_id = e.doc_id)
    )
    SELECT r.lang,
           r.n_raw,
           CAST(COALESCE(q.n, 0) AS BIGINT) AS n_quality,
           CAST(COALESCE(x.n, 0) AS BIGINT) AS n_exact,
           CAST(COALESCE(f.n, 0) AS BIGINT) AS n_final,
           CAST(COALESCE(f.chars, 0) AS BIGINT) AS total_chars_final
    FROM (SELECT lang, COUNT(*) AS n_raw FROM documents GROUP BY 1) r
    LEFT JOIN (SELECT lang, COUNT(*) AS n FROM quality GROUP BY 1) q USING (lang)
    LEFT JOIN (SELECT lang, COUNT(*) AS n FROM exact GROUP BY 1) x USING (lang)
    LEFT JOIN (SELECT lang, COUNT(*) AS n,
                      CAST(SUM(n_chars) AS BIGINT) AS chars
               FROM final GROUP BY 1) f USING (lang)
    ORDER BY r.lang
    """,
)
def curate_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation funnel, per language: raw → quality gate
    (length + punctuation-ratio) → exact dedup (normalized-md5,
    keep min id) → near-dup removal (shingle-Jaccard ≥ 0.5 within
    (lang, length-bucket) blocks, drop higher id) → retained corpus.

    Every stage is the registered standalone operator applied in
    sequence; the output is the stage-by-stage count funnel a
    curation run reports.

    Scale: quality gating is map-side; exact dedup is one fingerprint
    shuffle; the near-dup stage is the inverted-index self-join
    (operators.dedup.ngram_jaccard_pairs) running on the already-
    reduced corpus — the cheapest-first ordering that a 100 TB pass
    requires (each stage shrinks the next stage's input).  The four
    per-stage per-lang aggregates are all on ≤ |langs| rows and
    broadcast-join back together.
    """
    from ..operators.dedup import exact_dedup, ngram_jaccard_pairs

    docs = table(spark, sf_dir, "documents")

    punct_ratio = F.length(
        F.regexp_replace(F.col("text"), "[a-z0-9 ]", "")
    ).cast("double") / F.length("text")
    quality = docs.filter((F.col("n_chars") >= 100) & (punct_ratio <= 0.05))

    keep = exact_dedup(quality).select(F.col("keep_doc_id").alias("doc_id"))
    # Persisted (round-14, guide §2.4): three funnel legs read the
    # exact-dedup survivors (the near-dup pair stage, the per-stage
    # n_exact aggregate, and the final left-anti) — uncached, each
    # re-ran the quality filter + fingerprint aggregate + semi-join.
    exact = query_persist(quality.join(keep, "doc_id", "left_semi"))

    pairs = ngram_jaccard_pairs(
        exact.withColumn("len_bucket", (F.col("n_chars") / F.lit(50)).cast("long")),
        block_cols=("lang", "len_bucket"),
        shingle_k=3,
        threshold=0.5,
    )
    drops = pairs.select(F.col("doc_id_b").alias("doc_id")).distinct()
    final = exact.join(drops, "doc_id", "left_anti")

    def per_lang(df: DataFrame, col: str, with_chars: bool = False) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias(col)]
        if with_chars:
            aggs.append(F.sum("n_chars").cast("long").alias("chars"))
        return df.groupBy("lang").agg(*aggs)

    zero = F.lit(0).cast("long")
    funnel = (
        per_lang(docs, "n_raw")
        .join(F.broadcast(per_lang(quality, "n_q")), "lang", "left")
        .join(F.broadcast(per_lang(exact, "n_x")), "lang", "left")
        .join(F.broadcast(per_lang(final, "n_f", with_chars=True)), "lang", "left")
    )
    return funnel.select(
        "lang",
        "n_raw",
        F.coalesce(F.col("n_q"), zero).alias("n_quality"),
        F.coalesce(F.col("n_x"), zero).alias("n_exact"),
        F.coalesce(F.col("n_f"), zero).alias("n_final"),
        F.coalesce(F.col("chars"), zero).alias("total_chars_final"),
    ).orderBy("lang")
