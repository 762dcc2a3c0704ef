"""Statistical language-model scoring + canonical-document selection
— the two curation steps between raw quality heuristics
(doc_quality_scores) and the dedup tiers: score documents against a
corpus-trained model, and pick WHICH copy of a duplicate to keep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import register


@register(
    "doc_bigram_logprob",
    oracle="""
    WITH c AS (
        SELECT doc_id, lang, LOWER(text) AS t FROM documents
        WHERE LENGTH(text) >= 2
    ),
    bi AS (
        SELECT c.doc_id, c.lang, SUBSTR(c.t, CAST(u.i AS INT), 2) AS bg
        FROM c, UNNEST(range(1, LENGTH(c.t))) AS u(i)
    ),
    model AS (SELECT bg, COUNT(*) AS cnt FROM bi GROUP BY bg),
    total AS (SELECT SUM(cnt) AS n FROM model),
    scored AS (
        SELECT bi.doc_id, bi.lang,
               AVG(LN(model.cnt) - LN(total.n)) AS doc_lp
        FROM bi JOIN model USING (bg) CROSS JOIN total
        GROUP BY bi.doc_id, bi.lang
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(doc_lp), 4) AS avg_logprob,
           ROUND(MIN(doc_lp), 4) AS min_logprob
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained character-bigram LM as a perplexity-proxy
    quality signal (the statistical step past doc_quality_scores'
    length/punct heuristics — the KenLM-filter pattern with the LM
    induced from the corpus itself, so no external model file).

    Train and score in one declarative plan: explode each document
    into character bigrams (sequence + posexplode + substr — JVM
    expressions, no UDF), count bigrams corpus-wide (the model is the
    count table: vocabulary is bounded by charset², broadcastable by
    construction), then score each document as the mean log
    probability of its bigrams and roll up per language.  Low-scoring
    documents are the gibberish/mojibake candidates a curation funnel
    drops.

    Scale: the explode is map-side (rows × avg_len fan-out feeding a
    partial agg); the model join broadcasts; per-doc scoring is one
    hash agg on doc_id.  Nothing holds state beyond the bounded
    bigram table."""
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 2)
        .select("doc_id", "lang", F.lower(F.col("text")).alias("t"))
    )
    # posexplode the 1..len-1 positions, then slice the bigram.
    bi = (
        docs.select(
            "doc_id",
            "lang",
            "t",
            F.posexplode(F.sequence(F.lit(1), F.length("t") - 1)).alias(
                "_i", "pos"
            ),
        )
        .select("doc_id", "lang", F.expr("substr(t, pos, 2)").alias("bg"))
    )
    model = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
    total = model.agg(F.sum("cnt").alias("n"))
    scored = (
        bi.join(F.broadcast(model), "bg")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(F.avg(F.log("cnt") - F.log("n")).alias("doc_lp"))
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("doc_lp"), 4).alias("avg_logprob"),
            F.round(F.min("doc_lp"), 4).alias("min_logprob"),
        )
        .orderBy("lang")
    )


@register(
    "dedup_keep_best_doc",
    oracle="""
    WITH f AS (
        SELECT doc_id, n_chars,
               md5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')))
                   AS fingerprint
        FROM documents
    ),
    ranked AS (
        SELECT fingerprint, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY fingerprint
                                  ORDER BY n_chars DESC, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY fingerprint) AS nc
        FROM f
    )
    SELECT fingerprint, CAST(nc AS BIGINT) AS n_copies,
           doc_id AS keep_doc_id, n_chars AS keep_n_chars
    FROM ranked WHERE rn = 1 AND nc > 1
    ORDER BY n_copies DESC, fingerprint LIMIT 20
    """,
)
def dedup_keep_best_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection: exact-dup groups keep
    their BEST copy (longest text, ties → smallest doc_id) instead of
    dedup_exact_docs' arbitrary min-id — the policy step a real
    curation pipeline runs between candidate grouping and the drop
    list (the same max_by slots any quality score as the key).

    Plan: ONE hash aggregate with max_by over (n_chars, -doc_id) — no
    per-group window, no sort of the corpus; the oracle states the
    same selection as a window rank.  Top 20 dup groups by copy count
    (deterministic tiebreak on fingerprint)."""
    docs = table(spark, sf_dir, "documents")
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    best = F.max_by(
        F.struct(F.col("doc_id"), F.col("n_chars")),
        F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nid")),
    )
    return (
        docs.groupBy(fp.alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            best.alias("__best"),
        )
        .filter(F.col("n_copies") > 1)
        .select(
            "fingerprint",
            "n_copies",
            F.col("__best.doc_id").alias("keep_doc_id"),
            F.col("__best.n_chars").alias("keep_n_chars"),
        )
        .orderBy(F.desc("n_copies"), "fingerprint")
        .limit(20)
    )
