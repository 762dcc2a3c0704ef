"""Relevance-scoring tranche of the text-analysis tier (SURVEY.md
§2.11 X4): TF-IDF term weighting and BM25 document ranking.

Both are pure DataFrame expressions over the explode→groupBy inverted
index the dedup tier already uses — one shuffle to build (doc, term)
counts, one broadcast of the tiny per-term document frequencies, no
UDFs.  At 100 TB the same plans hold: df/idf is a ~vocabulary-sized
table (broadcastable), tf is a map-side explode + one hash shuffle.

The reference seed is the `%booking%` URL-match analytics
(reference main.py:81) — "which documents match these terms, ranked"
generalized to proper relevance scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import tokens
from .registry import register

#: Fixed query terms for the BM25 ranking demo (common corpus terms).
BM25_QUERY_TERMS = ("spark", "join", "filter")

_K1 = 1.2
_B = 0.75


def _doc_terms(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf, dl): term frequency + document length."""
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.trim("term") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.join(dl, "doc_id")


@register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE TRIM(term) != '' GROUP BY doc_id, term
    ), df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks
        WHERE TRIM(term) != '' GROUP BY term
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term,
           ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS tfidf
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    ORDER BY tfidf DESC, tf.doc_id, tf.term
    LIMIT 20
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: TF-IDF with smoothed idf = ln((N+1)/(df+1)); global top-20
    (doc, term) cells.  df is vocabulary-sized → broadcast join; the
    1-row corpus count attaches like the reference's percent-of-total
    cross join (reference main.py:50)."""
    docs = table(spark, sf_dir, "documents")
    terms = _doc_terms(docs)
    df_tbl = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tfidf = F.round(
        F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 4
    )
    return (
        terms.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "term", tfidf.alias("tfidf"))
        .orderBy(F.desc("tfidf"), "doc_id", "term")
        .limit(20)
    )


@register(
    "bm25_rank_docs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE TRIM(term) != '' GROUP BY doc_id, term
    ), dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks
        WHERE TRIM(term) != '' GROUP BY doc_id
    ), stats AS (
        SELECT COUNT(*) AS n_docs,
               (SELECT AVG(dl) FROM dl) AS avgdl
        FROM documents
    ), idf AS (
        SELECT term,
               LN((stats.n_docs - df + 0.5) / (df + 0.5) + 1.0) AS idf
        FROM (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks
              WHERE TRIM(term) != '' GROUP BY term) d
        CROSS JOIN stats
        WHERE term IN {BM25_QUERY_TERMS!r}
    )
    SELECT tf.doc_id,
           ROUND(SUM(idf.idf * tf.tf * ({_K1} + 1.0) /
                     (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))), 4)
               AS bm25
    FROM tf
    JOIN idf ON tf.term = idf.term
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id
    LIMIT 10
    """,
)
def bm25_rank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: Okapi BM25 (k1=1.2, b=0.75) ranking the corpus against a
    fixed term set; top-10 docs.  Same inverted-index shape as TF-IDF
    plus the per-doc length normalization; the corpus stats (N, avgdl)
    are a broadcast 1-row aggregate."""
    docs = table(spark, sf_dir, "documents")
    terms = _doc_terms(docs)
    df_tbl = (
        terms.filter(F.col("term").isin(*BM25_QUERY_TERMS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        terms.select("doc_id", "dl")
        .dropDuplicates(["doc_id"])
        .agg(F.avg("dl").alias("avgdl"))
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    score = idf * F.col("tf") * (_K1 + 1.0) / (
        F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
    )
    return (
        terms.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(10)
    )


@register(
    "phrase_search_positional",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, string_split(LOWER(text), ' ') AS w
        FROM documents
    ),
    hits AS (
        SELECT doc_id, lang,
               CAST(len([i FOR i IN range(1, len(w))
                         IF w[CAST(i AS INT)] = 'merge'
                            AND w[CAST(i AS INT) + 1] = 'data'])
                    AS BIGINT) AS n_occ
        FROM t
    )
    SELECT lang,
           CAST(COUNT(*) FILTER (n_occ > 0) AS BIGINT) AS n_docs,
           CAST(SUM(n_occ) AS BIGINT) AS n_occurrences
    FROM hits
    GROUP BY lang ORDER BY lang
    """,
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("merge data") through a POSITIONAL
    inverted index — the retrieval primitive BM25 ranking
    (bm25_rank_docs) can't express: posexplode(tokens) builds
    postings (doc_id, pos, token); the phrase is an equi-join between
    the two token-filtered posting slices on (doc_id, adjacent
    positions).

    Scale shape: each phrase term filters its posting slice BEFORE
    the join (selectivity = term frequency, pushed to the index
    scan); the join is equi on doc_id + position arithmetic — never
    a text re-scan.  A persisted postings table amortizes the build
    across queries (build once, search many — the layout ingest
    pattern of sources/layout.py applied to text).  The oracle counts
    adjacent-token matches with a per-document list comprehension —
    same semantics, no index, and immune to the substring false
    matches a LIKE '%…%' restatement would admit."""
    docs = table(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "token"),
    )
    p0 = postings.filter(F.col("token") == "merge").alias("p0")
    p1 = postings.filter(F.col("token") == "data").alias("p1")
    matches = p0.join(
        p1,
        (F.col("p0.doc_id") == F.col("p1.doc_id"))
        & (F.col("p1.pos") == F.col("p0.pos") + 1),
    ).select(F.col("p0.doc_id").alias("doc_id"), F.col("p0.lang").alias("lang"))
    per_doc = matches.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    all_docs = docs.select("doc_id", "lang").join(
        per_doc.select("doc_id", "n_occ"), "doc_id", "left"
    ).withColumn("n_occ", F.coalesce(F.col("n_occ"), F.lit(0)))
    return (
        all_docs.groupBy("lang")
        .agg(
            F.sum((F.col("n_occ") > 0).cast("long")).alias("n_docs"),
            F.sum("n_occ").alias("n_occurrences"),
        )
        .orderBy("lang")
    )
