"""Curation guardrails round 2: PII redaction, repetition-quality
gating, and train/eval decontamination (SURVEY.md §2.11 X4 extensions).

Three passes every large-scale pre-training pipeline runs that the
round-2 registry did not yet cover.  All three are oracle-checked:
the regex dialect is the RE2-compatible subset shared by Java and
DuckDB, and shingle/bigram construction mirrors the dedup operators'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import query_persist, table
from ..functions import tokens, word_shingles
from ..operators.privacy import pii_counts, redact_pii
from ..operators.text import distinct_token_ratio, dup_bigram_fraction
from .registry import register


@register(
    "pii_redaction_audit",
    oracle="""
    WITH blobs AS (
        SELECT c_mktsegment,
               c_name
               || CASE WHEN c_custkey % 2 = 0
                       THEN ' email user' || c_custkey || '@example.com'
                       ELSE '' END
               || CASE WHEN c_acctbal > 1000
                       THEN ' call +1-555-' ||
                            lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS contact
        FROM customer
    ), redacted AS (
        SELECT c_mktsegment,
               len(regexp_extract_all(contact,
                   '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS n_email,
               len(regexp_extract_all(contact,
                   '\\+[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{4}')) AS n_phone,
               regexp_replace(regexp_replace(contact,
                   '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '[EMAIL]', 'g'),
                   '\\+[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{4}', '[PHONE]', 'g')
                   AS clean
        FROM blobs
    )
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_rows,
           CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
           CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
           CAST(SUM(len(regexp_extract_all(clean,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}'))
             + len(regexp_extract_all(clean,
               '\\+[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{4}'))) AS BIGINT)
               AS residual_matches,
           ROUND(AVG(len(clean)), 2) AS avg_clean_len
    FROM redacted
    GROUP BY 1
    ORDER BY 1
    """,
)
def pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit: per market segment, how many emails/phones the
    redaction operator masked, and a proof-of-scrub residual count
    (re-running detection on the redacted text must find 0 matches).

    The testdata carries no natural PII, so the query synthesizes a
    deterministic contact blob from customer columns (identically in
    the oracle) — the operator under test is the detection+redaction
    pass (operators/privacy.py), which is map-side regex work only:
    one scan, no shuffle until the per-segment rollup, the exact cost
    shape a 100 TB scrub needs.
    """
    cust = table(spark, sf_dir, "customer")
    contact = F.concat(
        F.col("c_name"),
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.concat(
                F.lit(" email user"),
                F.col("c_custkey").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("c_acctbal") > 1000,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    blobs = cust.select(F.col("c_mktsegment").alias("segment"), contact.alias("contact"))
    n_email, n_phone = pii_counts(F.col("contact"))
    res_email, res_phone = pii_counts(F.col("clean"))
    redacted = blobs.select(
        "segment",
        n_email.alias("n_email"),
        n_phone.alias("n_phone"),
        redact_pii(F.col("contact")).alias("clean"),
    )
    return (
        redacted.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_email").cast("long").alias("emails_redacted"),
            F.sum("n_phone").cast("long").alias("phones_redacted"),
            F.sum(res_email + res_phone).cast("long").alias("residual_matches"),
            F.round(F.avg(F.length("clean")), 2).alias("avg_clean_len"),
        )
        .orderBy("segment")
    )


@register(
    "doc_repetition_quality",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split(LOWER(text), ' ') AS t
        FROM documents
    ), per_doc AS (
        SELECT doc_id, source,
               CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
               CASE WHEN len(t) >= 2 THEN
                   1.0 - CAST(len(list_distinct(
                       [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
                   )) AS DOUBLE) / (len(t) - 1)
               END AS dup_bigram
        FROM toks
    ), top_tok AS (
        SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_frac
        FROM (
            SELECT doc_id, u.tok, COUNT(*) AS c
            FROM toks, UNNEST(t) AS u(tok)
            GROUP BY doc_id, u.tok
        )
        GROUP BY doc_id
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG(ttr), 4) AS avg_ttr,
           ROUND(AVG(dup_bigram), 4) AS avg_dup_bigram,
           ROUND(AVG(top_frac), 4) AS avg_top_token_frac,
           CAST(COUNT(CASE WHEN top_frac > 0.15 THEN 1 END) AS BIGINT)
               AS n_flagged
    FROM per_doc JOIN top_tok USING (doc_id)
    GROUP BY source
    ORDER BY source
    """,
)
def doc_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate, summarized per source: type-token
    ratio, duplicated-bigram fraction, and most-frequent-token mass
    per doc; `n_flagged` counts docs whose top token exceeds 15% of
    the text (the classic boilerplate/spam signal).

    TTR and bigram duplication are pure array expressions (map-side,
    in-scan).  Top-token mass needs per-(doc, token) counts — one
    explode + two map-side-combining aggregates keyed on doc_id, so
    the shuffle volume is ~vocab-per-doc rows, not corpus text.  At
    100 TB the flagged set feeds the curation funnel's quality gate.
    """
    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "source", tokens(F.col("text")).alias("t"))
    per_doc = base.select(
        "doc_id",
        "source",
        distinct_token_ratio(F.col("t")).alias("ttr"),
        dup_bigram_fraction(F.col("t")).alias("dup_bigram"),
    )
    top_tok = (
        base.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c").cast("double") / F.sum("c")).alias("top_frac"))
    )
    return (
        per_doc.join(top_tok, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ttr"), 4).alias("avg_ttr"),
            F.round(F.avg("dup_bigram"), 4).alias("avg_dup_bigram"),
            F.round(F.avg("top_frac"), 4).alias("avg_top_token_frac"),
            F.count(F.when(F.col("top_frac") > 0.15, 1)).alias("n_flagged"),
        )
        .orderBy("source")
    )


@register(
    "decontaminate_against_eval",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, source, string_split(LOWER(text), ' ') AS t
        FROM documents
    ), sh AS (
        SELECT doc_id, lang, source,
               CASE WHEN len(t) >= 3
                    THEN list_distinct([list_aggr(t[i:i+2], 'string_agg', ' ')
                                        for i in range(1, len(t) - 1)])
                    ELSE [list_aggr(t, 'string_agg', ' ')]
               END AS sh
        FROM toks
    ), eval_sh AS (
        SELECT DISTINCT u.s FROM sh, UNNEST(sh.sh) AS u(s)
        WHERE source = 'src0'
    ), train AS (
        SELECT * FROM sh WHERE source != 'src0'
    ), contam AS (
        SELECT DISTINCT t.doc_id, t.lang
        FROM train t, UNNEST(t.sh) AS u(s)
        WHERE u.s IN (SELECT s FROM eval_sh)
    )
    SELECT tr.lang,
           tr.n_train,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_contaminated,
           ROUND(CAST(COALESCE(c.n, 0) AS DOUBLE) / tr.n_train, 4)
               AS contamination_rate
    FROM (SELECT lang, COUNT(*) AS n_train FROM train GROUP BY 1) tr
    LEFT JOIN (SELECT lang, COUNT(*) AS n FROM contam GROUP BY 1) c
        USING (lang)
    ORDER BY tr.lang
    """,
)
def decontaminate_against_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag training docs sharing any
    3-word shingle with the held-out eval set (source 'src0' stands in
    for the benchmark corpus), reported as a per-language contamination
    rate — the audit run before any pre-training job ships.

    Plan shape: the eval side collapses to its DISTINCT shingle set
    and broadcasts (benchmark suites are tiny next to a 100 TB train
    corpus — this is the canonical small-side broadcast); train docs
    explode their shingles and left-semi-join the broadcast set, then
    dedup on doc_id.  No all-pairs comparison exists anywhere — cost
    is one train-corpus scan + a hash probe per shingle.
    """
    docs = table(spark, sf_dir, "documents")
    # Persisted (round-14, guide §2.4): the eval-side distinct and the
    # train-side explode each re-ran the corpus tokenize+shingle chain
    # otherwise; one map-side fill serves both (array grain — no
    # Generate in the fill plan, see operators/dedup.py round-14 note).
    sh = query_persist(
        docs.select(
            "doc_id",
            "lang",
            "source",
            word_shingles(tokens(F.col("text")), 3).alias("sh"),
        )
    )
    eval_sh = (
        sh.filter(F.col("source") == "src0")
        .select(F.explode("sh").alias("shingle"))
        .distinct()
    )
    train = sh.filter(F.col("source") != "src0")
    contam = (
        train.select("doc_id", "lang", F.explode("sh").alias("shingle"))
        .join(F.broadcast(eval_sh), "shingle", "left_semi")
        .select("doc_id", "lang")
        .distinct()
    )
    n_train = train.groupBy("lang").agg(F.count(F.lit(1)).alias("n_train"))
    n_contam = contam.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    zero = F.lit(0).cast("long")
    return (
        n_train.join(F.broadcast(n_contam), "lang", "left")
        .select(
            "lang",
            "n_train",
            F.coalesce(F.col("n"), zero).alias("n_contaminated"),
            F.round(
                F.coalesce(F.col("n"), zero).cast("double") / F.col("n_train"), 4
            ).alias("contamination_rate"),
        )
        .orderBy("lang")
    )


@register(
    "ngram_duplication_audit",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, string_split(LOWER(text), ' ') AS w
        FROM documents
    ),
    g AS (
        SELECT doc_id, lang,
               array_to_string(w[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS gram
        FROM toks, UNNEST(range(1, len(w) - 3)) AS u(i)
        WHERE len(w) >= 5
    ),
    per AS (
        SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS n_occ,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM g GROUP BY lang, gram
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_dup_grams,
           CAST(SUM(n_occ) AS BIGINT) AS dup_occurrences,
           CAST(MAX(n_docs) AS BIGINT) AS max_docs_sharing
    FROM per WHERE n_docs >= 2
    GROUP BY lang ORDER BY lang
    """,
)
def ngram_duplication_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-5-gram audit — the corpus-level
    signal behind exact-substring deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"):
    how many distinct word 5-grams occur in MORE THAN ONE document,
    and how much total text they account for, per language.

    Unlike the Jaccard/MinHash tiers (whole-document similarity,
    operators/dedup.py) this measures PHRASE-level leakage — boiler-
    plate, licenses, templates — that survives document-level dedup.

    Shape: every occurrence (not distinct-per-doc) explodes to one
    (lang, gram) row; ONE hash aggregate counts occurrences and
    distinct docs per gram; a second bounded aggregate rolls up per
    language.  Both stages partial-aggregate map-side; nothing is
    quadratic — cost is O(total tokens), the same as a word count.
    At 100 TB the gram domain is large but the shuffle is the
    already-combined (gram, counts) stream, and a frequency floor
    (HAVING n_docs >= 2) is applied before the rollup."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    grams = F.when(
        F.size(toks) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 4),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 5)),
        ),
    ).otherwise(F.array())
    per_gram = (
        docs.select("doc_id", "lang", F.explode(grams).alias("gram"))
        .groupBy("lang", "gram")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return (
        per_gram.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_dup_grams"),
            F.sum("n_occ").alias("dup_occurrences"),
            F.max("n_docs").alias("max_docs_sharing"),
        )
        .orderBy("lang")
    )
