"""Oracle-checked twins of the sketch-dedup tiers (SURVEY.md §2.11 X2).

The production MinHash-LSH / SimHash operators (operators/dedup.py)
hash with xxhash64 — JVM-only, so their outputs can only be pinned by
recall-vs-exact property tests (rows-only at the driver).  These twins
swap the hash family for **md5**, which Spark and DuckDB implement
identically (RFC 1321, lowercase hex), making the ENTIRE pipeline —
shingling, minhash, banding, candidate generation, verification —
bit-reproducible across engines and therefore hash-checkable at the
driver gate.  Same algorithm, same shuffle topology, different hash
family; the xxhash64 tier stays the fast path (one 64-bit lane vs a
16-byte digest + hex/decimal conversion per shingle).

Hash-family bridge used by every query here:
``md5int(s) = CAST(CONV(SUBSTR(md5(s),1,15),16,10) AS BIGINT)`` (Spark)
≡ ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)`` (DuckDB) — 60 bits,
non-negative, fits BIGINT in both engines.

Scale notes (100 TB): identical to the production tier —
(doc, shingle, hash-slot) rows are linear in corpus tokens and
partial-aggregable to the k-slot signature; banding joins are
equi-joins on (band, key) buckets, never all-pairs; verification only
touches LSH candidates.  SimHash band-join on nibble positions is the
standard Hamming-LSH decomposition (r-bit blocks ⇒ catches all pairs
with Hamming distance < #blocks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import query_persist, table
from ..functions import tokens, word_shingles
from .registry import register

#: hashes per signature / LSH bands (r = 2 rows per band)
_K = 8
_BANDS = 4


def _md5int(col: Column) -> Column:
    """60-bit integer from the md5 hex digest — identical in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh): the per-doc ARRAY of distinct 3-word shingles,
    persisted — the family's one corpus-tokenization pass.

    Round-14 grain change (values untouched): word_shingles is
    array_distinct, so exploding it already yields unique (doc_id, s)
    rows — the old exploded+``.distinct()`` cache paid a full exchange
    to dedupe rows that were unique by construction, and the Generate
    in its fill plan made InferFiltersFromGenerate push a
    size(shingles(text)) > 0 predicate down to the scan, re-running
    the whole tokenize+shingle chain inside the filter.  Caching the
    arrays removes both: the fill is one map-side projection, per-doc
    counts become ``size(sh)``, the signature becomes a map-side
    array fold, and the exact-intersection join explodes the stored
    arrays on demand.  Registered via query_persist: the bench
    releases it between timed runs, so each query's number charges
    its own materialization (round-13 verdict #2)."""
    return query_persist(
        table(spark, sf_dir, "documents").select(
            "doc_id", word_shingles(tokens("text"), 3).alias("sh")
        )
    )


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s): distinct shingle rows, exploded from the cached
    per-doc arrays (unique by word_shingles' array_distinct)."""
    return _exploded(_doc_shingles(spark, sf_dir))


def _exploded(doc_sh: DataFrame) -> DataFrame:
    """Explode an already-persisted per-doc shingle relation — callers
    holding a ``_doc_shingles`` handle use this instead of a second
    ``_shingles`` call, which would re-run ``query_persist`` on an
    identical plan (a no-op for the CacheManager but one
    "already cached" WARN + a py4j round-trip per construction)."""
    return doc_sh.select("doc_id", F.explode("sh").alias("s"))


def _signature(doc_sh: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh7): the K-slot md5 MinHash signature, WIDE —
    computed entirely map-side over the cached per-doc shingle arrays
    (round-14): slot i is array_min(transform(sh, s -> md5int(i:s))),
    the same minimum over the same hash strings the round-13
    groupBy(doc_id)+K×min() computed, with ZERO exchanges (the
    round-12 form had exploded ×8 and aggregated twice).  word_shingles
    arrays are never empty (short docs collapse to the whole-text
    shingle), so array_min never returns NULL.

    Persisted (round-13): the signature feeds the band explode AND
    both slot-agreement broadcast sides; the fill is now one map-side
    projection over the shingle cache."""
    def slot(i: int):
        # one-arg closure: a two-parameter lambda would be treated by
        # F.transform as the (element, index) form, binding i to the
        # array-index column
        prefix = f"{i}:"
        return lambda s: _md5int(F.concat(F.lit(prefix), s))

    return query_persist(
        doc_sh.select(
            "doc_id",
            *[
                F.array_min(F.transform(F.col("sh"), slot(i))).alias(f"mh{i}")
                for i in range(_K)
            ],
        )
    )


def _band_buckets(sig: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key): r=2 minhash slots folded per band.

    Map-side only over the wide signature — the fold that used to be a
    groupBy(doc_id, band_id) aggregation (an exchange of K rows/doc) is
    now a 4-element explode of column expressions (zero exchanges);
    band_key text is unchanged: concat(mh_{2i}, '_', mh_{2i+1})."""
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.concat(
                    F.col(f"mh{2 * i}").cast("string"),
                    F.lit("_"),
                    F.col(f"mh{2 * i + 1}").cast("string"),
                ).alias("band_key"),
            )
            for i in range(_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(bands).alias("bk")).select(
        "doc_id", "bk.band_id", "bk.band_key"
    )


def _candidates(bands: DataFrame) -> DataFrame:
    """(doc_a, doc_b): distinct pairs sharing at least one band bucket."""
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band_id", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band_id", "band_key"
    )
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# Shared oracle CTE prologue: shingles -> signature -> bands -> candidates,
# the exact SQL mirror of the DataFrame pipeline above.  DuckDB list
# slices are INCLUSIVE (ts[i:i+2] = 3 tokens); short docs fall back to
# the whole-text shingle exactly like functions.word_shingles.
_ORACLE_PRELUDE = """
    WITH tok AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, unnest(
            CASE WHEN len(ts) >= 3
                 THEN [array_to_string(ts[i:i+2], ' ')
                       for i in range(1, len(ts) - 1)]
                 ELSE [array_to_string(ts, ' ')] END) AS s
        FROM tok
    ),
    slots AS (
        SELECT doc_id, s, unnest(range(0, 8)) AS hi FROM sh
    ),
    sig AS (
        SELECT doc_id, hi,
               MIN(CAST('0x' || substr(md5(CAST(hi AS VARCHAR) || ':' || s),
                                       1, 15) AS BIGINT)) AS mh
        FROM slots GROUP BY doc_id, hi
    ),
    bands AS (
        SELECT doc_id, CAST(hi // 2 AS INTEGER) AS band_id,
               CAST(MIN(CASE WHEN hi % 2 = 0 THEN mh END) AS VARCHAR)
               || '_' ||
               CAST(MIN(CASE WHEN hi % 2 = 1 THEN mh END) AS VARCHAR)
                   AS band_key
        FROM sig GROUP BY doc_id, hi // 2
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
"""


@register(
    "minhash_lsh_oracle_md5",
    oracle=_ORACLE_PRELUDE
    + """,
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS i
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(i.i * 1.0 / (ca.n + cb.n - i.i), 4) AS jaccard
    FROM inter i
    JOIN cnt ca ON ca.doc_id = i.doc_a
    JOIN cnt cb ON cb.doc_id = i.doc_b
    WHERE i.i * 1.0 / (ca.n + cb.n - i.i) >= 0.5
    ORDER BY i.doc_a, i.doc_b
    """,
)
def minhash_lsh_oracle_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection, oracle-checked:
    3-word shingles → 8-slot md5 MinHash → 4 bands × 2 rows →
    band-bucket candidate join → exact-Jaccard verification at 0.5.
    The driver-checkable twin of ``dedup_minhash_lsh``
    (operators/dedup.py:211, rows-only by hash family); reference has
    no dedup surface — build-brief X2 tier.  The sf0.01 corpus plants
    24 exact + 1 near duplicate pair, all emitted here."""
    doc_sh = _doc_shingles(spark, sf_dir)
    sh = _exploded(doc_sh)
    cand = _candidates(_band_buckets(_signature(doc_sh)))
    # per-doc shingle count map-side from the cached arrays: size(sh)
    # equals the old exploded groupBy count (arrays are distinct by
    # construction) with no aggregation at all (round-14).
    cnt = doc_sh.select("doc_id", F.size("sh").alias("n"))
    shb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    inter = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            shb,
            (cand["doc_b"] == shb["doc_b"]) & (F.col("s") == shb["s_b"]),
        )
        .groupBy(F.col("doc_a"), cand["doc_b"])
        .agg(F.count(F.lit(1)).alias("i"))
    )
    # Renames via join conditions, not inside the per-doc count's two
    # join legs: a rename inside each leg made the builds canonically
    # different, re-aggregating the shingle counts twice per run
    # (round-13, guide §2.4 — the bloom/basket ReuseExchange fix).
    ca, cb = cnt.alias("ca"), cnt.alias("cb")
    j = F.col("i") / (F.col("ca.n") + F.col("cb.n") - F.col("i"))
    return (
        inter.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(j >= 0.5)
        .select("doc_a", "doc_b", F.round(j, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@register(
    "minhash_estimate_quality_md5",
    oracle=_ORACLE_PRELUDE
    + """,
    agree AS (
        SELECT c.doc_a, c.doc_b,
               SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) * 1.0 / 8
                   AS est_jaccard
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.doc_a
        JOIN sig sb ON sb.doc_id = c.doc_b AND sb.hi = sa.hi
        GROUP BY c.doc_a, c.doc_b
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS i
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT g.doc_a, g.doc_b,
           ROUND(g.est_jaccard, 4) AS est_jaccard,
           ROUND(COALESCE(i.i, 0) * 1.0 / (ca.n + cb.n - COALESCE(i.i, 0)), 4)
               AS true_jaccard,
           ROUND(ABS(g.est_jaccard
                     - COALESCE(i.i, 0) * 1.0
                       / (ca.n + cb.n - COALESCE(i.i, 0))), 4) AS abs_err
    FROM agree g
    LEFT JOIN inter i ON i.doc_a = g.doc_a AND i.doc_b = g.doc_b
    JOIN cnt ca ON ca.doc_id = g.doc_a
    JOIN cnt cb ON cb.doc_id = g.doc_b
    ORDER BY g.doc_a, g.doc_b
    """,
)
def minhash_estimate_quality_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-quality audit: for every LSH candidate pair,
    the signature-agreement estimate (matching slots / 8) against the
    exact shingle Jaccard, with the absolute estimation error — the
    monitoring row that validates a deployed sketch's accuracy budget.
    Cross-engine deterministic via the md5 hash family (see module
    docstring)."""
    doc_sh = _doc_shingles(spark, sf_dir)
    sh = _exploded(doc_sh)
    sig = _signature(doc_sh)
    cand = _candidates(_band_buckets(sig))
    # Slot agreement over the WIDE signature: one broadcast join per
    # side and a scalar expression — the exploded form's sig⋈sig
    # SortMergeJoin on (doc_b, hi) plus the 8×-row re-aggregation are
    # gone (guide §2.4); the sum of per-slot equality indicators over 8
    # columns is the same integer the old F.sum computed.
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(_K)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(_K)],
    )
    n_match = sum(
        (
            F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
            for i in range(_K)
        ),
        start=F.lit(0),
    )
    agree = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (n_match / _K).alias("est_jaccard"))
    )
    # per-doc shingle count map-side from the cached arrays (round-14,
    # same as minhash_lsh_oracle_md5).
    cnt = doc_sh.select("doc_id", F.size("sh").alias("n"))
    shb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    inter = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            shb,
            (cand["doc_b"] == shb["doc_b"]) & (F.col("s") == shb["s_b"]),
        )
        .groupBy(F.col("doc_a"), cand["doc_b"])
        .agg(F.count(F.lit(1)).alias("i"))
    )
    # Same ReuseExchange discipline as minhash_lsh_oracle_md5: the
    # per-doc count joins rename via the join condition so both legs
    # share one build.
    ca, cb = cnt.alias("ca"), cnt.alias("cb")
    truej = F.coalesce(F.col("i"), F.lit(0)) / (
        F.col("ca.n") + F.col("cb.n") - F.coalesce(F.col("i"), F.lit(0))
    )
    return (
        agree.join(inter, ["doc_a", "doc_b"], "left")
        .join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round("est_jaccard", 4).alias("est_jaccard"),
            F.round(truej, 4).alias("true_jaccard"),
            F.round(F.abs(F.col("est_jaccard") - truej), 4).alias("abs_err"),
        )
        .orderBy("doc_a", "doc_b")
    )


@register(
    "simhash_hamming_oracle_md5",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ),
    wc AS (
        SELECT doc_id, w, COUNT(*) AS cnt,
               CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 4294967296 AS hm
        FROM tok GROUP BY doc_id, w
    ),
    bits AS (
        SELECT doc_id, unnest(range(0, 32)) AS b, cnt, hm FROM wc
    ),
    sigbit AS (
        SELECT doc_id, b,
               CASE WHEN SUM(cnt * (2 * (CAST(FLOOR(hm / POWER(2, b)) AS BIGINT)
                                         % 2) - 1)) >= 0
                    THEN 1 ELSE 0 END AS bit
        FROM bits GROUP BY doc_id, b
    ),
    sig AS (
        SELECT doc_id,
               CAST(SUM(bit * CAST(POWER(2, b) AS BIGINT)) AS BIGINT) AS sh
        FROM sigbit GROUP BY doc_id
    ),
    nib AS (
        SELECT doc_id, sh, unnest(range(0, 4)) AS n FROM sig
    ),
    keyed AS (
        SELECT doc_id, sh, n,
               CAST(FLOOR(sh / POWER(256, n)) AS BIGINT) % 256 AS nv
        FROM nib
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.sh AS sa, b.sh AS sb
        FROM keyed a JOIN keyed b
          ON a.n = b.n AND a.nv = b.nv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= 1
    ORDER BY doc_a, doc_b
    """,
)
def simhash_hamming_oracle_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection, oracle-checked: 32-bit count-weighted
    md5 SimHash per document, byte-block Hamming-LSH (4 blocks of 8
    bits — any pair within Hamming distance 3 shares ≥1 intact block,
    the pigeonhole guarantee), XOR+popcount verification at distance
    ≤ 1 (the sf0.01 corpus's candidate Hamming distribution has 8
    pairs at 0 / 45 at 1, then a word-soup noise floor from 2 up —
    the threshold sits in that gap).  Driver-checkable twin of ``dedup_simhash``
    (operators/dedup.py:286, rows-only by hash family).  Integer bit
    votes make the sign rule exactly reproducible — no float ties."""
    docs = table(spark, sf_dir, "documents")
    wc = (
        docs.select("doc_id", F.explode(tokens("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "doc_id",
            "cnt",
            (_md5int(F.col("w")) % F.lit(4294967296).cast("long")).alias("hm"),
        )
    )
    # Round-13 shape (guide §2.3/§2.4): the original exploded every
    # (doc, word) row into 32 bit rows — 32× the aggregation input —
    # and then re-aggregated the 32 sign bits per doc (two exchanges).
    # The 32 bit votes are independent column expressions over the same
    # word hash, so ONE groupBy(doc_id) with 32 sums produces the
    # identical signature from the raw rows with one exchange.
    # shiftright(hm, b) % 2 ≡ floor(hm / 2^b) % 2 for the non-negative
    # 32-bit hm, so each vote is the exact integer the old form summed.
    def vote(b: int) -> Column:
        return 2 * (F.shiftright(F.col("hm"), b) % 2) - 1

    votes = wc.groupBy("doc_id").agg(
        *[
            F.sum(F.col("cnt") * vote(b)).alias(f"v{b}")
            for b in range(32)
        ]
    )
    sh_expr = sum(
        (
            F.when(F.col(f"v{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(32)
        ),
        start=F.lit(0),
    ).cast("long")
    sig = votes.select("doc_id", sh_expr.alias("sh"))
    # Nibble keys map-side from the wide signature (the explode is over
    # 4 column-expression structs, not an aggregation input).
    keyed = sig.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("n"),
                        (F.shiftright(F.col("sh"), 8 * n) % 256).alias("nv"),
                    )
                    for n in range(4)
                ]
            )
        ).alias("k"),
    ).select("doc_id", "sh", "k.n", "k.nv")
    a = keyed.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa"), "n", "nv")
    b = keyed.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb"), "n", "nv")
    cand = (
        a.join(b, ["n", "nv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sa", "sb")
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.filter(ham <= 1)
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )


@register(
    "edit_distance_verify_lsh",
    oracle=_ORACLE_PRELUDE
    + """
    SELECT c.doc_a, c.doc_b,
           length(ta.text) AS len_a, length(tb.text) AS len_b,
           CASE WHEN levenshtein(ta.text, tb.text) <= 64
                THEN levenshtein(ta.text, tb.text) ELSE -1 END
               AS edit_distance,
           CASE WHEN levenshtein(ta.text, tb.text) <= 64
                THEN ROUND(1.0 - CAST(levenshtein(ta.text, tb.text)
                                      AS DOUBLE)
                           / GREATEST(length(ta.text), length(tb.text)), 4)
           END AS edit_similarity
    FROM cand c
    JOIN documents ta ON ta.doc_id = c.doc_a
    JOIN documents tb ON tb.doc_id = c.doc_b
    ORDER BY c.doc_a, c.doc_b
    """,
)
def edit_distance_verify_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The levenshtein verify tier run the way 100 TB runs it: ONLY on
    MinHash-LSH candidate pairs, never on exhaustive blocks.  This is
    the registered proof of the scale path `levenshtein_similar_parts`
    documents — that query's brand-blocked form is the bounded-input
    oracle tier (quadratic within blocks by construction, the suite's
    one superlinear sf1 pole); here candidate generation is the banded
    md5-MinHash equi-join (linear in corpus shingles), and the O(n·k)
    early-exit edit distance touches exactly the LSH survivors.  The
    bounded form returns -1 above k=64, with edit similarity
    1 − d/max(len) for verified pairs — both engine-exact (unit-cost
    Levenshtein is deterministic; the ratio is one double division).

    Scale: shingle→signature→band legs are partial-aggregable; the
    candidate join is an equi-join on (band, key); the text join back
    is two keyed joins shipping only candidate doc_ids against the
    corpus — no text ever moves for non-candidates."""
    cand = _candidates(_band_buckets(_signature(_doc_shingles(spark, sf_dir))))
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    ta = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    tb = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")
    )
    dist = F.levenshtein(F.col("text_a"), F.col("text_b"), 64)
    sim = F.when(
        F.col("edit_distance") >= 0,
        F.round(
            1.0
            - F.col("edit_distance")
            / F.greatest(F.col("len_a"), F.col("len_b")).cast("double"),
            4,
        ),
    )
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.length("text_a").alias("len_a"),
            F.length("text_b").alias("len_b"),
            dist.alias("edit_distance"),
        )
        .withColumn("edit_similarity", sim)
        .orderBy("doc_a", "doc_b")
    )
