"""Corpus-curation operators round 3 — the per-DOMAIN / per-SOURCE
governance layer a 100 TB pre-training pipeline runs between raw
ingestion and training-mix assembly (extends SURVEY.md §2.11 X2/X4
tiers; reference has no counterpart — these are the north-star
training-data ops the build brief names as first-class):

- ``domain_quality_cap``     — per-source top-N quality cap (the
  Common-Crawl "domain cap" that stops one boilerplate-heavy domain
  from dominating the corpus);
- ``source_vocab_overlap``   — pairwise vocabulary Jaccard between
  sources (dump-overlap audit before paying full dedup);
- ``source_unigram_divergence`` — KL(source ‖ corpus) over unigram
  distributions (distribution-shift / outlier-source detection);
- ``embedding_label_cohesion``  — per-label centroid cosine cohesion
  (embedding-space quality metric for a labeled corpus);
- ``char_window_duplication``   — character-level 32-gram window
  duplication rate (the Lee et al. 2022 EXACT-substring dedup signal
  at char granularity — complements the word-level
  ngram_duplication_audit);
- ``adaptive_quality_threshold`` — per-language order-statistic
  quality gate (calibrated per-language thresholds instead of one
  global cutoff — the fix for "one threshold drops all of language X").

All six carry DuckDB oracles (driver-window candidates from day one —
round-3 verdict ask #6); float comparisons only ever cross engines
after ROUND() on per-row-deterministic expressions or ratios of exact
integers, and the quality-gate threshold is an ORDER-STATISTIC (exact
element, no interpolation) so the keep/drop boundary cannot flip on
engine-specific quantile arithmetic.

Scale notes (100 TB): every query is partial-agg-friendly; the only
corpus-sized joins are equi-joins on (word) or (gram) hash keys; the
cohesion query keeps the corpus UNEXPLODED (zip_with/aggregate over
the array column against a broadcast k-row centroid table — no
corpus×dim row blow-up, no per-vector re-shuffle); vocab overlap at
real scale would swap the exact word join for the MinHash signatures
(operators/dedup.py) — documented, the exact form IS the oracle-able
audit run on samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.text import quality_score, tokens
from .queries_text2 import QUALITY_Q_SQL
from .registry import register

#: Non-empty lowercased whitespace tokens as DuckDB SQL (twin of
#: operators.text.tokens + the empty-token filter used below).
_TOKENS_SQL = "string_split(LOWER(text), ' ')"


@register(
    "domain_quality_cap",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, n_chars, {QUALITY_Q_SQL} AS q
        FROM documents
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY q DESC, doc_id
        ) AS rnk
        FROM scored
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rnk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rnk <= 15 THEN n_chars ELSE 0 END) AS BIGINT)
               AS kept_chars,
           ROUND(MIN(CASE WHEN rnk <= 15 THEN q END), 4) AS min_kept_q
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
)
def domain_quality_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality cap: keep at most 15 highest-quality docs per
    source (rank by composite quality desc, doc_id tiebreak), report
    kept counts + retained char mass per source.  One partitioned
    window over (source) — source-hash shuffle, no global sort; at
    100 TB the per-domain top-N is exactly the skew-safe alternative
    to a global quality sort.  quality_score ROUND()s per row, so the
    rank order is engine-deterministic."""
    docs = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    scored = docs.select(
        "doc_id", "source", "n_chars", quality_score(F.col("text")).alias("q")
    )
    w = Window.partitionBy("source").orderBy(F.desc("q"), "doc_id")
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    kept = F.col("rnk") <= 15
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
            F.round(F.min(F.when(kept, F.col("q"))), 4).alias("min_kept_q"),
        )
        .orderBy("source")
    )


@register(
    "source_vocab_overlap",
    oracle=f"""
    WITH vocab AS (
        SELECT DISTINCT source, w
        FROM (SELECT source, unnest({_TOKENS_SQL}) AS w FROM documents)
        WHERE w <> ''
    ),
    sizes AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM vocab GROUP BY source
    ),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM vocab a
        JOIN vocab b ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, i.n_common,
           ROUND(CAST(i.n_common AS DOUBLE) / (x.n + y.n - i.n_common), 4)
               AS jaccard
    FROM inter i
    JOIN sizes x ON x.source = i.source_a
    JOIN sizes y ON y.source = i.source_b
    ORDER BY jaccard DESC, source_a, source_b
    LIMIT 20
    """,
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the cheap
    dump-overlap audit run BEFORE paying document-level dedup (two
    crawls of the same sites show up here first).  Never all-pairs on
    rows: the pair space is |sources|², built from an equi-join on
    word, and only pairs sharing ≥1 word emit a row (fully disjoint
    pairs are absent by construction — tests/test_curation3.py).
    Jaccard is a ratio of exact integers → hash-deterministic.
    At 100 TB the word join becomes MinHash-signature intersection
    (operators/dedup.py) — this exact form is the audit you run on a
    per-dump sample, and the oracle for that estimator."""
    docs = table(spark, sf_dir, "documents")
    vocab = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    from pyspark.sql import Window

    # Attach each source's vocab size as a WINDOW over the distinct
    # relation before the self-join: the pair rows then carry both
    # sizes, so no separate sizes aggregate + join-back (which would
    # evaluate the explode+distinct subtree two extra times).  The
    # self-join itself still evaluates vocab twice — inherent
    # (realiased exprIds defeat ReusedExchange).
    vocab_n = vocab.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("source"))
    )
    a = vocab_n.alias("a")
    b = vocab_n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.max("a.n").alias("na"),  # constant within the pair group
            F.max("b.n").alias("nb"),
        )
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "source_a", "source_b")
        .limit(20)
    )


@register(
    "source_unigram_divergence",
    oracle=f"""
    WITH tok AS (
        SELECT source, w
        FROM (SELECT source, unnest({_TOKENS_SQL}) AS w FROM documents)
        WHERE w <> ''
    ),
    sc AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY source, w
    ),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM sc GROUP BY source),
    cw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS c FROM sc GROUP BY w),
    ctot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cw)
    SELECT s.source,
           st.n AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           ROUND(SUM(
               (CAST(s.c AS DOUBLE) / st.n)
               * LN((CAST(s.c AS DOUBLE) / st.n) / (CAST(cw.c AS DOUBLE) / ct.n))
           ), 4) AS kl_nats
    FROM sc s
    JOIN stot st ON st.source = s.source
    JOIN cw ON cw.w = s.w
    CROSS JOIN ctot ct
    GROUP BY s.source, st.n
    ORDER BY s.source
    """,
)
def source_unigram_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source ‖ corpus) over unigram distributions — the
    distribution-shift monitor that flags an outlier source (wrong
    language, spam, format break) before it pollutes the training
    mix.  One explode + ONE (source, word) partial-agg; the three
    marginals (per-source, per-word, corpus total) are WINDOWS over
    that aggregate's output, so the corpus is tokenized exactly once
    — a join formulation would re-execute the explode+agg subtree per
    marginal (realiased exprIds defeat ReusedExchange).  Every
    probability is a ratio of exact integer counts, the per-word KL
    terms are row-deterministic, and only the final SUM is
    ROUND()ed."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    sc = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    marg = sc.select(
        "source",
        "c",
        F.sum("c").over(Window.partitionBy("source")).alias("n"),
        F.sum("c").over(Window.partitionBy("w")).alias("cc"),
        F.sum("c").over(Window.partitionBy()).alias("ctot_n"),
    )
    ps = F.col("c").cast("double") / F.col("n")
    pc = F.col("cc").cast("double") / F.col("ctot_n")
    return (
        marg.groupBy("source", F.col("n").alias("n_tokens"))
        .agg(
            F.count(F.lit(1)).alias("vocab_size"),
            F.round(F.sum(ps * F.log(ps / pc)), 4).alias("kl_nats"),
        )
        .select("source", "n_tokens", "vocab_size", "kl_nats")
        .orderBy("source")
    )


@register(
    "embedding_label_cohesion",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, pos, CAST(embedding[pos] AS DOUBLE) AS x
        FROM embeddings, generate_series(1, 64) AS t(pos)
    ),
    cent AS (SELECT label, pos, AVG(x) AS c FROM e GROUP BY label, pos),
    cos AS (
        SELECT e.vec_id, e.label,
               SUM(e.x * cent.c)
                 / (SQRT(SUM(e.x * e.x)) * SQRT(SUM(cent.c * cent.c))) AS cs
        FROM e
        JOIN cent ON cent.label = e.label AND cent.pos = e.pos
        GROUP BY e.vec_id, e.label
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(AVG(cs), 4) AS avg_cohesion,
           ROUND(MIN(cs), 4) AS min_cohesion
    FROM cos
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid cosine cohesion — the embedding-space
    quality metric for a labeled corpus (low cohesion = mislabeled or
    heterogeneous cluster; the SemDeDup sibling that needs no
    training).  Spark-first shape: the corpus stays UNEXPLODED — the
    label centroid is built by one posexplode partial-agg (5×64
    cells), collected back into a 5-row ARRAY table, broadcast, and
    the per-vector cosine is a zip_with/aggregate over the array
    column — zero corpus row blow-up, zero per-vector re-shuffle (the
    oracle explodes because ANSI SQL must; the Spark plan is why the
    engine wins at 100 TB)."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent_cells = (
        emb.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
    )
    cent = cent_cells.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )
    from ..functions import cosine_similarity

    cs = cosine_similarity(F.col("v"), F.col("cvec"))
    return (
        emb.join(F.broadcast(cent), "label")
        .select("label", cs.alias("cs"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("cs"), 4).alias("avg_cohesion"),
            F.round(F.min("cs"), 4).alias("min_cohesion"),
        )
        .orderBy("label")
    )


@register(
    "char_window_duplication",
    oracle="""
    WITH wins AS (
        SELECT doc_id, source, substring(text, CAST(s AS INT), 32) AS gram
        FROM (
            SELECT doc_id, source, text,
                   unnest(range(1, GREATEST(length(text) - 31, 1) + 1, 16)) AS s
            FROM documents
            WHERE length(text) >= 32
        )
    ),
    dup AS (
        SELECT gram FROM wins GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1
    )
    SELECT w.source,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_windows,
           ROUND(CAST(SUM(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 4) AS dup_frac
    FROM wins w
    LEFT JOIN dup d ON d.gram = w.gram
    GROUP BY w.source
    ORDER BY w.source
    """,
)
def char_window_duplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level 32-char window duplication rate per source —
    the EXACT-substring duplication signal of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better") at
    char granularity, strided ×16 so cost is O(chars/16) not
    O(chars): a window duplicated across ≥2 docs marks copy-paste /
    mirrored spans that word-level shingles smear.  One gram-hash
    window (min≠max doc_id over the gram partition) + one source
    rollup — the suffix-array result at one-shuffle cost, the gram
    stream evaluated exactly once; no pairs, no sort of the corpus.
    Counts and their ratio are exact."""
    docs = table(spark, sf_dir, "documents").filter(F.length("text") >= 32)
    wins = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - 31, F.lit(1)), F.lit(16))
        ).alias("s"),
        "text",
    ).select(
        "doc_id", "source", F.col("text").substr(F.col("s"), F.lit(32)).alias("gram")
    )
    from pyspark.sql import Window

    # "gram appears in ≥2 distinct docs" ⇔ min(doc_id) ≠ max(doc_id)
    # over the gram partition — ONE window exchange on the gram hash
    # instead of a groupBy + join back (which would re-execute the
    # window-extraction subtree for the dup-set side).
    g = Window.partitionBy("gram")
    is_dup = (
        F.min("doc_id").over(g) != F.max("doc_id").over(g)
    ).cast("int")
    return (
        wins.withColumn("is_dup", is_dup)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("is_dup").cast("long").alias("n_dup_windows"),
            F.round(
                F.sum("is_dup").cast("double") / F.count(F.lit(1)), 4
            ).alias("dup_frac"),
        )
        .orderBy("source")
    )


@register(
    "adaptive_quality_threshold",
    oracle=f"""
    WITH scored AS (
        SELECT lang, {QUALITY_Q_SQL} AS q FROM documents
    ),
    ranked AS (
        SELECT lang, q,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY q) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM scored
    ),
    th AS (
        SELECT lang, q AS q40 FROM ranked
        WHERE rn = CAST(FLOOR(0.4 * (n - 1)) AS BIGINT) + 1
    )
    SELECT s.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           t.q40 AS threshold,
           CAST(SUM(CASE WHEN s.q >= t.q40 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           ROUND(CAST(SUM(CASE WHEN s.q >= t.q40 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 4) AS keep_rate
    FROM scored s
    JOIN th t ON t.lang = s.lang
    GROUP BY s.lang, t.q40
    ORDER BY s.lang
    """,
)
def adaptive_quality_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language adaptive quality gate: the keep threshold is each
    language's 40th-percentile quality score as an ORDER STATISTIC
    (the exact element at rank floor(0.4·(n−1))+1 — no interpolation,
    so the keep/drop boundary is engine-exact; quantile_cont-style
    interpolated thresholds can flip boundary rows on arithmetic
    ulps).  This is the calibrated-per-language filter that replaces
    one global cutoff silently dropping whole languages (the FineWeb/
    CCNet lesson).  Both windows share the (lang) partitioning, so the
    scored corpus is evaluated ONCE and shuffled once — no join back
    (which would re-run quality_score over all docs for the second
    consumer)."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    scored = docs.select("lang", quality_score(F.col("text")).alias("q"))
    w = Window.partitionBy("lang").orderBy("q")
    wl = Window.partitionBy("lang")
    ranked = scored.select(
        "lang",
        "q",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wl).alias("n"),
    )
    # Broadcast the statistic to every row of its language via a second
    # window over the SAME partitioning (no extra exchange, no re-scan).
    target = F.floor(0.4 * (F.col("n") - 1)).cast("long") + 1
    q40 = F.max(F.when(F.col("rn") == target, F.col("q"))).over(wl)
    kept = F.col("q") >= F.col("q40")
    return (
        ranked.withColumn("q40", q40)
        .groupBy("lang", F.col("q40").alias("threshold"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.round(
                F.sum(F.when(kept, 1).otherwise(0)).cast("double") / F.count(F.lit(1)),
                4,
            ).alias("keep_rate"),
        )
        .select("lang", "n_docs", "threshold", "n_kept", "keep_rate")
        .orderBy("lang")
    )
