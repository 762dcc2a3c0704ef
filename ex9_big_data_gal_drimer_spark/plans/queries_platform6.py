"""Round-12 additions — the frontier tiers the round-11 verdict
named next, all registered ROWS-ONLY with STAGED oracles (the 200-row
oracle capacity is permanently full; staged oracles run the full
differential at every pytest via tests/test_staged_oracles.py — the
permanent growth mode).

- **span-level duplicate REMOVAL** (`dedup_remove_spans`) — the apply
  tier char_window_duplication was missing: duplicated ≥32-char
  windows are CUT out of documents (Lee et al. 2022 exact-substring
  dedup), emitting rewritten docs (pinned by md5) + per-doc
  bytes-removed.  Operator: operators/dedup.py::remove_duplicate_spans.
- **HTML → text extraction** (`html_text_extract`) — crawl-shaped
  ingestion, the missing first stage of the LLM pipeline: tag /
  script / boilerplate strip + entity decode with JVM regexp_replace
  (no Python row UDF), the DuckDB oracle sharing the identical regex
  set (precedent: pii_redaction_audit).  Pages are SYNTHESIZED
  deterministically from the documents table inside the query (both
  engines build the same page string), so the differential pins the
  extraction, not a fixture file.  Operator: operators/html.py.
- **distributed BPE merge-table training** (`bpe_train_merges`) —
  bpe_token_stats consumes a fixed vocab; this trains one: 3
  fixed-budget merge rounds (precedent: pagerank_part_cooccurrence's
  fixed-round iteration), oracle = DuckDB unrolled CTE rounds.
  Operator: operators/bpe.py.
- **BPE segmentation apply** (`bpe_apply_segment`) — the other half
  of the lifecycle: the trained merge table segments the FULL corpus
  vocabulary (|vocab| cost, not |corpus|) and rolls up per-source
  token/compression statistics; the oracle shares the training CTE
  chain verbatim so train and apply cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import local_df, query_persist, table
from ..operators.bpe import chars_to_seq, train_bpe_merges
from ..operators.html import extract_text, extract_text_sql
from .registry import register


@register(
    "dedup_remove_spans",
    staged_oracle="""
    WITH tiles AS (
        SELECT doc_id, source, length(text) AS orig_len, s,
               substring(text, CAST(s AS INT), 32) AS gram
        FROM (SELECT doc_id, source, text,
                     unnest(range(1, length(text) + 1, 32)) AS s
              FROM documents WHERE length(text) >= 1)
    ), marked AS (
        SELECT *, COUNT(*) OVER (PARTITION BY gram) > 1 AS dup FROM tiles
    ), rebuilt AS (
        SELECT doc_id, source, CAST(orig_len AS BIGINT) AS orig_len,
               CAST(COUNT(*) AS BIGINT) AS n_tiles,
               CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tiles_removed,
               COALESCE(string_agg(CASE WHEN NOT dup THEN gram END,
                                   '' ORDER BY s), '') AS new_text
        FROM marked GROUP BY doc_id, source, orig_len
    )
    SELECT doc_id, source, orig_len, n_tiles, n_tiles_removed,
           CAST(length(new_text) AS BIGINT) AS new_len,
           CAST(orig_len - length(new_text) AS BIGINT) AS bytes_removed,
           md5(new_text) AS new_md5
    FROM rebuilt ORDER BY doc_id
    """,
)
def dedup_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplicate removal over the documents corpus: every
    32-char tile whose exact text occurs ≥2 times in the tiled corpus
    is cut, and the rewritten document is pinned by md5 so the
    differential proves the RECONSTRUCTION, not just the counts.  See
    operators/dedup.py::remove_duplicate_spans for the plan shape
    (one gram-window exchange + one per-doc ordered rebuild — no
    pairs, no corpus sort, state bounded by max doc length)."""
    from ..operators.dedup import remove_duplicate_spans

    docs = table(spark, sf_dir, "documents")
    rewritten = remove_duplicate_spans(docs, window=32)
    return rewritten.select(
        "doc_id",
        "source",
        "orig_len",
        "n_tiles",
        "n_tiles_removed",
        F.length("new_text").cast("long").alias("new_len"),
        (F.col("orig_len") - F.length("new_text")).cast("long").alias(
            "bytes_removed"
        ),
        F.md5("new_text").alias("new_md5"),
    ).orderBy("doc_id")


#: The synthesized page: boilerplate (script/style/nav/footer) wraps
#: the document text plus an entity-bearing paragraph.  Both engines
#: build the IDENTICAL string; the Spark side below mirrors it
#: fragment-for-fragment.
_PAGE_SQL = (
    "'<html><head><script type=\"text/javascript\">var page_id = '"
    " || CAST(doc_id AS VARCHAR) || '; track();</script>"
    "<style>body { margin: 0; }</style>"
    "<title>Doc ' || CAST(doc_id AS VARCHAR) || '</title></head><body>"
    "<nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>"
    "<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text || "
    "'</p><p>Tom &amp; Jerry &lt;3 &nbsp;&gt;</p>"
    "<footer>(c) 2026 Example Corp. All rights reserved.</footer>"
    "</body></html>'"
)

_PAGE_FRAGMENTS = (
    '<html><head><script type="text/javascript">var page_id = ',
    "; track();</script><style>body { margin: 0; }</style><title>Doc ",
    "</title></head><body>"
    '<nav><a href="/">Home</a> | <a href="/about">About</a></nav>'
    "<h1>Doc ",
    "</h1><p>",
    "</p><p>Tom &amp; Jerry &lt;3 &nbsp;&gt;</p>"
    "<footer>(c) 2026 Example Corp. All rights reserved.</footer>"
    "</body></html>",
)


def synthesize_page(doc_id: F.Column, text: F.Column) -> F.Column:
    """The Spark twin of ``_PAGE_SQL``."""
    did = doc_id.cast("string")
    f = [F.lit(s) for s in _PAGE_FRAGMENTS]
    return F.concat(f[0], did, f[1], did, f[2], did, f[3], text, f[4])


@register(
    "html_text_extract",
    staged_oracle=f"""
    WITH pages AS (
        SELECT source, text, {_PAGE_SQL} AS html FROM documents
    ), ex AS (
        SELECT source, text, {extract_text_sql('html')} AS extracted
        FROM pages
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(extracted)) AS BIGINT) AS total_chars,
           ROUND(AVG(CAST(length(extracted) AS DOUBLE) / length(text)), 4)
               AS avg_ratio,
           CAST(SUM(CASE WHEN contains(extracted, 'Tom & Jerry <3 >')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_entity_ok,
           CAST(SUM(CAST(('0x' || substring(md5(extracted), 1, 8)) AS BIGINT))
               AS BIGINT) AS fp_sum
    FROM ex GROUP BY source ORDER BY source
    """,
)
def html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction over synthesized crawl pages: script /
    style / nav / footer content removed wholesale, remaining tags
    stripped, entities decoded, whitespace collapsed — one chain of
    JVM column expressions (operators/html.py), map-side only.  The
    per-source rollup pins n_docs, total extracted chars, the
    extracted/original length ratio, an entity-decode flag, and an
    order-insensitive md5-prefix fingerprint SUM of the extracted
    text — so the differential proves the extracted STRINGS match
    byte-for-byte across engines, not just their lengths."""
    docs = table(spark, sf_dir, "documents")
    ex = docs.select(
        "source",
        "text",
        extract_text(synthesize_page(F.col("doc_id"), F.col("text"))).alias(
            "extracted"
        ),
    )
    fp = F.conv(F.substring(F.md5("extracted"), 1, 8), 16, 10).cast("long")
    return (
        ex.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("extracted").cast("long")).alias("total_chars"),
            F.round(
                F.avg(F.length("extracted").cast("double") / F.length("text")),
                4,
            ).alias("avg_ratio"),
            F.sum(
                F.contains(F.col("extracted"), F.lit("Tom & Jerry <3 >"))
                .cast("long")
            ).alias("n_entity_ok"),
            F.sum(fp).alias("fp_sum"),
        )
        .orderBy("source")
    )


def _bpe_round_cte(n: int) -> str:
    return f"""
    p{n} AS (
        SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS pc FROM (
            SELECT cnt, toks[i] AS l, toks[i + 1] AS r FROM (
                SELECT cnt, string_split(trim(seq), ' ') AS toks,
                       unnest(range(1, len(string_split(trim(seq), ' '))))
                           AS i
                FROM seq{n - 1}
            )
        ) GROUP BY l, r
    ),
    b{n} AS (SELECT l, r, pc FROM p{n} ORDER BY pc DESC, l, r LIMIT 1),
    seq{n} AS (
        SELECT w, cnt,
               replace(replace(seq, ' ' || b.l || ' ' || b.r || ' ',
                                    ' ' || b.l || b.r || ' '),
                              ' ' || b.l || ' ' || b.r || ' ',
                              ' ' || b.l || b.r || ' ') AS seq
        FROM seq{n - 1}, b{n} b
    )"""


def bpe_train_ctes(src: str = "documents", text_col: str = "text") -> str:
    """The 3-round training CTE chain (words → seq0 → p/b/seq 1..3)
    over any source relation — shared VERBATIM by the train query
    (reads b1..b3), the apply query (reads b1..b3 to segment the full
    vocabulary), and the round-13 pipeline composite (trains over the
    DEDUPED corpus) — one definition, so the oracles cannot drift."""
    return (
        f"""
    words AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            SELECT unnest(string_split_regex(lower({text_col}), '[^a-z]+'))
                       AS w
            FROM {src}
        ) WHERE length(w) >= 1
        GROUP BY w ORDER BY cnt DESC, w LIMIT 500
    ),
    seq0 AS (
        SELECT w, cnt,
               ' ' || array_to_string(
                   list_transform(range(1, length(w) + 1),
                                  i -> substring(w, CAST(i AS INT), 1)), ' ')
               || ' ' AS seq
        FROM words
    ),"""
        + ",".join(_bpe_round_cte(n) for n in (1, 2, 3))
    )


_BPE_TRAIN_CTES = bpe_train_ctes()


@register(
    "bpe_train_merges",
    staged_oracle=f"""
    WITH {_BPE_TRAIN_CTES}
    SELECT * FROM (
        SELECT 1 AS round, l AS lhs, r AS rhs, pc AS pair_count,
               l || r AS merged FROM b1
        UNION ALL SELECT 2, l, r, pc, l || r FROM b2
        UNION ALL SELECT 3, l, r, pc, l || r FROM b3
    ) ORDER BY round
    """,
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge-table training, 3 rounds over the top-500
    word-frequency table of the documents corpus (ties at the top-500
    boundary and at the argmax both break lexicographically, so the
    merge table is engine-exact).  The corpus-scale work is ONE word
    count; each round runs over the persisted vocabulary-sized
    relation and collects exactly one argmax row
    (ITERATIVE_CONSTRUCTION) — see operators/bpe.py for the merge-step
    semantics the DuckDB oracle unrolls."""
    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
        )
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(500)
    )
    # No persist: training collects the vocabulary ONCE and runs the
    # merge rounds driver-side (round-14, operators/bpe.py) — the
    # relation has a single consumer.
    seqs = words.select(
        "w", "cnt", chars_to_seq(F.col("w")).alias("seq")
    )
    merges = train_bpe_merges(seqs, rounds=3, require_all=True)
    # local_df, not createDataFrame(list): the latter parallelizes the
    # 3-row result into 32 partitions and its collect was ~0.8 s of
    # this query's ~1.2 s (round-13, guide §1.2).
    return local_df(
        spark,
        merges,
        "round int, lhs string, rhs string, pair_count bigint, merged string",
    ).orderBy("round")


def _bpe_apply_cte(n: int) -> str:
    return f"""
    vocab{n} AS (
        SELECT w,
               replace(replace(seq, ' ' || b.l || ' ' || b.r || ' ',
                                    ' ' || b.l || b.r || ' '),
                              ' ' || b.l || ' ' || b.r || ' ',
                              ' ' || b.l || b.r || ' ') AS seq
        FROM vocab{n - 1}, b{n} b
    )"""


@register(
    "bpe_apply_segment",
    staged_oracle=f"""
    WITH {_BPE_TRAIN_CTES},
    occ AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            SELECT source,
                   unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents
        ) WHERE length(w) >= 1 GROUP BY source, w
    ),
    vocab0 AS (
        SELECT DISTINCT w,
               ' ' || array_to_string(
                   list_transform(range(1, length(w) + 1),
                                  i -> substring(w, CAST(i AS INT), 1)), ' ')
               || ' ' AS seq
        FROM occ
    ),{",".join(_bpe_apply_cte(n) for n in (1, 2, 3))},
    tok AS (
        SELECT w, CAST(len(string_split(trim(seq), ' ')) AS BIGINT)
                   AS n_tokens
        FROM vocab3
    )
    SELECT o.source,
           CAST(SUM(o.cnt) AS BIGINT) AS n_word_occurrences,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
           CAST(SUM(length(o.w) * o.cnt) AS BIGINT) AS chars_total,
           CAST(SUM(t.n_tokens * o.cnt) AS BIGINT) AS tokens_total,
           ROUND(CAST(SUM(length(o.w) * o.cnt) AS DOUBLE)
                 / SUM(t.n_tokens * o.cnt), 4) AS chars_per_token
    FROM occ o JOIN tok t ON t.w = o.w
    GROUP BY o.source ORDER BY o.source
    """,
)
def bpe_apply_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of the BPE lifecycle: train the 3-round merge
    table (identically to `bpe_train_merges`), then segment the FULL
    corpus vocabulary with it and roll up per-source token statistics
    — occurrences, distinct words, chars, post-merge tokens, and the
    chars-per-token compression the tokenizer achieves.

    Scale shape: two corpus-scale aggregations (the training word
    count and the per-(source, word) occurrence count — both
    map-side-combinable), then everything else is vocabulary-sized:
    the merge rewrite is a chain of literal `replace` expressions over
    the DISTINCT-word relation (operators/bpe.py::apply_bpe_merges),
    joined back to the occurrence counts on the word equi-key.  No
    per-document re-segmentation: a word segments the same way
    everywhere, so the corpus-wide apply costs |vocab|, not |corpus|
    — the property that makes tokenizer application tractable at
    100 TB."""
    from ..operators.bpe import apply_bpe_merges

    docs = table(spark, sf_dir, "documents")
    # Persisted: occ feeds the training word count, the distinct-word
    # segmentation leg AND the final per-source rollup join — without
    # the persist the corpus-scale explode+aggregate re-executed once
    # per consumer (round-13, guide §2.4).  Per-(source, word) grain,
    # vocabulary-sized — same intermediate contract as seqs below.
    occ = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
        )
        .filter(F.length("w") >= 1)
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    occ = query_persist(occ)
    words = (
        occ.groupBy("w")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(500)
    )
    # No persist: training collects the vocabulary ONCE and runs the
    # merge rounds driver-side (round-14, operators/bpe.py).
    seqs = words.select(
        "w", "cnt", chars_to_seq(F.col("w")).alias("seq")
    )
    merges = train_bpe_merges(seqs, rounds=3, require_all=True)
    tok = occ.select("w").distinct().select(
        "w",
        F.size(
            F.split(
                F.trim(apply_bpe_merges(chars_to_seq(F.col("w")), merges)),
                " ",
            )
        ).cast("long").alias("n_tokens"),
    )
    return (
        occ.join(tok, "w")
        .groupBy("source")
        .agg(
            F.sum("cnt").alias("n_word_occurrences"),
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.sum(F.length("w").cast("long") * F.col("cnt")).alias(
                "chars_total"
            ),
            F.sum(F.col("n_tokens") * F.col("cnt")).alias("tokens_total"),
            F.round(
                F.sum(F.length("w").cast("long") * F.col("cnt")).cast(
                    "double"
                )
                / F.sum(F.col("n_tokens") * F.col("cnt")),
                4,
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )
