"""Training-data pipeline operators beyond the reference surface:
deterministic dataset splitting, sequence packing, leakage detection.

These are the operations a pretraining corpus pipeline runs after
dedup/quality (queries_llm, queries_curation): assign every document a
stable train/val/test split, pack documents into token-budget batches,
and prove the splits don't leak content into each other.  All three
are pure JVM expressions with ANSI-SQL oracles.

Scale notes (100 TB): the split assignment is a stateless map over a
content hash — no shuffle, no RNG, reproducible across reruns and
engines (the property that matters when the corpus is rebuilt
incrementally: a doc's split NEVER changes).  Packing windows
partition by language, so state is bounded per partition; the leakage
check is a fingerprint self-join — one shuffle on the hash, the same
plan as exact dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from .registry import register

#: First 8 hex chars of the md5 of the (trimmed) text → 32-bit int.
#: Content-addressed, not id-addressed: re-ingesting the same document
#: under a new id lands in the same split.
_BUCKETS = 100


def _split_bucket(text_col: str):
    return (
        F.conv(F.substring(F.md5(F.trim(F.col(text_col))), 1, 8), 16, 10)
        .cast("long")
        % _BUCKETS
    )


def _split_label(text_col: str):
    b = _split_bucket(text_col)
    return (
        F.when(b < 80, "train").when(b < 90, "validation").otherwise("test")
    )


_ORACLE_BUCKET = (
    "CAST(('0x' || substring(md5(trim(text)), 1, 8)) AS BIGINT) % 100"
)


@register(
    "dataset_split_assign",
    oracle=f"""
    WITH assigned AS (
        SELECT lang,
               CASE WHEN {_ORACLE_BUCKET} < 80 THEN 'train'
                    WHEN {_ORACLE_BUCKET} < 90 THEN 'validation'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM assigned
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment from a content
    hash (md5 prefix → bucket 0-99).  Stateless map — no shuffle until
    the reporting groupBy, no RNG seed to version; both engines derive
    the identical bucket from the identical bytes, which is exactly
    the reproducibility contract a corpus rebuild needs."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(_split_label("text").alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


@register(
    "pack_sequences",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               LENGTH(trim(text)) - LENGTH(REPLACE(trim(text), ' ', '')) + 1
                   AS n_tokens
        FROM documents
    ), offsets AS (
        SELECT lang, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS tok_offset
        FROM toks
    )
    SELECT lang,
           CAST(tok_offset // 512 AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM offsets
    GROUP BY lang, batch_id
    ORDER BY lang, batch_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for batch assembly: documents are laid out in a
    stable order (doc_id) per language and cut into 512-token batches
    by CUMULATIVE OFFSET — batch_id = floor(exclusive-prefix-sum /
    budget).  One window per lang partition (bounded state, streams at
    any scale), no driver loop; contrast with greedy bin-packing,
    which is inherently sequential.  Batches may overhang the budget
    by at most one document — the standard packing-with-overflow
    layout pretraining loaders use."""
    docs = table(spark, sf_dir, "documents")
    n_tokens = (
        F.length(F.trim(F.col("text")))
        - F.length(F.regexp_replace(F.trim(F.col("text")), " ", ""))
        + 1
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = docs.select(
        "lang",
        n_tokens.alias("n_tokens"),
        F.coalesce(F.sum(n_tokens).over(w), F.lit(0)).alias("offset"),
    )
    return (
        offsets.select(
            "lang",
            F.floor(F.col("offset") / 512).cast("long").alias("batch_id"),
            "n_tokens",
        )
        .groupBy("lang", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("lang", "batch_id")
    )


@register(
    "split_leakage_check",
    oracle=f"""
    WITH assigned AS (
        SELECT md5(lower(trim(text))) AS fingerprint,
               CASE WHEN {_ORACLE_BUCKET} < 80 THEN 'train'
                    WHEN {_ORACLE_BUCKET} < 90 THEN 'validation'
                    ELSE 'test' END AS split
        FROM documents
    ), per_fp AS (
        SELECT fingerprint,
               COUNT(DISTINCT split) AS n_splits,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM assigned
        GROUP BY fingerprint
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_texts,
           CAST(COUNT(CASE WHEN n_splits > 1 THEN 1 END) AS BIGINT)
               AS n_leaked_texts,
           CAST(SUM(CASE WHEN n_splits > 1 THEN n_copies ELSE 0 END) AS BIGINT)
               AS n_leaked_docs
    FROM per_fp
    """,
)
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: a normalized-text fingerprint
    that appears in MORE THAN ONE split is leakage (possible here only
    via near-identical docs whose raw bytes hash to different buckets
    but normalize to the same fingerprint — exactly the case that
    poisons held-out evaluation).  One fingerprint groupBy (the exact-
    dedup plan) + a global rollup; at 100 TB this runs as a by-product
    of the dedup pass."""
    docs = table(spark, sf_dir, "documents")
    per_fp = (
        docs.select(
            F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
            _split_label("text").alias("split"),
        )
        .groupBy("fingerprint")
        .agg(
            F.countDistinct("split").alias("n_splits"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
    leaked = F.when(F.col("n_splits") > 1, 1)
    return per_fp.agg(
        F.count(F.lit(1)).alias("n_distinct_texts"),
        F.count(leaked).alias("n_leaked_texts"),
        F.sum(F.when(F.col("n_splits") > 1, F.col("n_copies")).otherwise(0))
        .cast("long")
        .alias("n_leaked_docs"),
    )


@register(
    "training_mix_by_lang",
    oracle="""
    WITH sampled AS (
        SELECT lang, n_chars,
               CASE WHEN lang = 'en' THEN 2 ELSE 1 END AS n_repeats
        FROM documents
        WHERE doc_id % 10 < CASE WHEN lang = 'en' THEN 8 ELSE 4 END
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs_sampled,
           CAST(SUM(n_repeats) AS BIGINT) AS n_docs_in_mix,
           CAST(SUM(n_chars * n_repeats) AS BIGINT) AS chars_in_mix
    FROM sampled GROUP BY lang ORDER BY lang
    """,
)
def training_mix_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction: per-language sampling quotas (en
    keeps 8/10 docs, other languages 4/10) plus epoch upsampling (en
    repeats 2×) — the two knobs every pretraining data recipe turns
    (domain/language weighting and repeat factors).  Selection is
    DETERMINISTIC (doc_id modulus, no RNG), so the mix is
    reproducible AND the oracle checks it exactly; the scale default
    for non-reproducible proportions is `sampleBy`
    (sample_fractions_lineitem).  Upsampling is explode(sequence) —
    rows fan out map-side, no shuffle until the audit rollup; the
    emitted audit (docs sampled, docs in mix after repeats, chars in
    mix) is what a mix-builder job reports against its token-budget
    targets."""
    docs = table(spark, sf_dir, "documents")
    quota = F.when(F.col("lang") == "en", 8).otherwise(4)
    repeats = F.when(F.col("lang") == "en", 2).otherwise(1)
    mix = (
        docs.filter(F.col("doc_id") % 10 < quota)
        .withColumn("n_repeats", repeats)
        .withColumn("__epoch", F.explode(F.sequence(F.lit(1), F.col("n_repeats"))))
    )
    return (
        mix.groupBy("lang")
        .agg(
            (F.count(F.lit(1)) / F.first("n_repeats")).cast("long").alias(
                "n_docs_sampled"
            ),
            F.count(F.lit(1)).alias("n_docs_in_mix"),
            F.sum("n_chars").alias("chars_in_mix"),
        )
        .orderBy("lang")
    )


@register(
    "group_aware_split",
    oracle=None,  # assembled below — needs the CC oracle prelude
)
def group_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-leakage-free dataset split: documents are split
    train/validation/test by the content hash of their dup-GROUP's
    representative (min doc_id of the connected component), so two
    near-duplicate documents can NEVER land in different splits —
    the leakage mode `dataset_split_assign`'s per-document hash
    cannot prevent (exact dups hash identically; near-dups don't).

    Composition of registered operators: near-dup pair graph
    (inverted-index Jaccard) → connected components → component
    representative's text hashed with the SAME bucket rule as the
    per-document split.  Singleton documents are their own
    representative, so their assignment is unchanged.  The output
    reports, per split: docs, groups, and how many docs were PULLED
    ACROSS from their individual-hash split by group gravity
    (n_reassigned > 0 proves the operator actually moved something).

    Scale: the pair graph + CC are the registered scale paths; the
    representative join is one equi-join on component id; everything
    else is the stateless hash map of dataset_split_assign."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.graph import connected_components

    blocked = table(spark, sf_dir, "documents").withColumn(
        "len_bucket", (F.col("n_chars") / F.lit(50)).cast("long")
    )
    # NOT persisted (round-14): the CC loop's lazy localCheckpoint
    # reads the pair pipeline exactly once per run — a cache here has
    # one consumer and is pure fill overhead under the charge-per-run
    # harness (cross-query warm sharing is released between runs).
    pairs = ngram_jaccard_pairs(
        blocked, block_cols=("lang", "len_bucket"), shingle_k=3, threshold=0.5
    )
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").cast("long")
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    full = docs.join(comp, "doc_id", "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col("doc_id"))
    )
    rep = docs.select(
        F.col("doc_id").alias("component"), F.col("text").alias("rep_text")
    )
    labeled = full.join(rep, "component").select(
        "doc_id",
        "component",
        _split_label("rep_text").alias("split"),
        _split_label("text").alias("own_split"),
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("component").alias("n_groups"),
            F.sum(
                (F.col("own_split") != F.col("split")).cast("long")
            ).alias("n_reassigned"),
        )
        .orderBy("split")
    )


# The oracle shares the recursive-CTE pair-graph prelude with
# dedup_connected_components and applies the identical group-
# representative split rule in SQL.
from .queries_graph import CC_ORACLE_CTES  # noqa: E402
from .registry import ORACLES  # noqa: E402

_REP_BUCKET = (
    "CAST(('0x' || substring(md5(trim(rep_text)), 1, 8)) AS BIGINT) % 100"
)
_OWN_BUCKET = (
    "CAST(('0x' || substring(md5(trim(f.text)), 1, 8)) AS BIGINT) % 100"
)

ORACLES["group_aware_split"] = (
    CC_ORACLE_CTES
    + f"""
    , full_assign AS (
        SELECT d.doc_id, d.text,
               COALESCE(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    ),
    labeled AS (
        SELECT f.doc_id, f.component,
               CASE WHEN {_REP_BUCKET} < 80 THEN 'train'
                    WHEN {_REP_BUCKET} < 90 THEN 'validation'
                    ELSE 'test' END AS split,
               CASE WHEN {_OWN_BUCKET} < 80 THEN 'train'
                    WHEN {_OWN_BUCKET} < 90 THEN 'validation'
                    ELSE 'test' END AS own_split
        FROM full_assign f
        JOIN (SELECT doc_id, text AS rep_text FROM documents) r
          ON r.doc_id = f.component
    )
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT component) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN own_split <> split THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reassigned
    FROM labeled
    GROUP BY split ORDER BY split
    """
)
