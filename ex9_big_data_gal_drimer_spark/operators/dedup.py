"""Deduplication operators (SURVEY.md §2.11 X1/X2).

Four tiers, increasing scale-tolerance:

1. exact_dedup        — hash-groupBy on normalized text; one shuffle.
2. ngram_jaccard_pairs — blocked all-pairs Jaccard; exact within
   blocks, quadratic *per block* (fine when blocks are bounded).
3. minhash_lsh_pairs  — MinHash signatures + banded LSH; candidate
   pairs grow ~linearly with data, the 100 TB path.
4. simhash_pairs      — 64-bit SimHash; near-dup = small Hamming
   distance; bucketed by rotated prefixes.

All are pure DataFrame/JVM expressions — no Python UDFs — so they run
inside whole-stage codegen and survive AQE re-planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import query_persist
from ..functions import (
    band_hashes,
    jaccard,
    minhash_signature,
    tokens,
    word_shingles,
)

#: Normalization used by every text-dedup tier: lowercase + collapse
#: whitespace (mirrors the reference's TRIM usage, main.py:118,147).
def normalized_text(col: F.Column) -> F.Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per normalized-text group.

    Returns the deduplicated id set (`keep_doc_id`) with group sizes.
    One hash-shuffle on the md5 fingerprint; at 100 TB the fingerprint
    groupBy is the canonical exact-dedup plan (no sort, no window).
    """
    return (
        df.groupBy(F.md5(normalized_text(F.col(text_col))).alias("fingerprint"))
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle-Jaccard near-dup pairs within blocks, via an
    inverted index.

    Shape: explode distinct shingles → self-equi-join on (block,
    shingle) → |A∩B| is a pair COUNT, |A∪B| = |A|+|B|-|A∩B| from
    carried sizes.  No per-pair array operations ever execute: pairs
    sharing zero shingles never meet, and the join+count parallelize
    on the shingle hash.  (A direct all-pairs array_intersect form ran
    40 s at sf0.1 — per-pair array ops on AQE-coalesced partitions
    serialize; this form is the 100 TB-shaped plan.)
    """
    # The source is often a few big parquet files → few input
    # partitions; fan out BEFORE the (interpreted-HOF) shingle work or
    # it runs serially.  Cheap: one narrow shuffle of the raw rows.
    par = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.repartition(par, F.col(id_col))
        .select(
            F.col(id_col).alias("doc_id"),
            *[F.col(c) for c in block_cols],
            word_shingles(tokens(F.col(text_col)), shingle_k).alias("sh"),
        )
        .select("doc_id", *block_cols, F.size("sh").alias("n_sh"), "sh")
    )
    # Cache the per-doc shingle ARRAYS and explode ABOVE the cache
    # (round-14): both self-join sides still share one tokenize/shingle
    # pass, but the fill plan no longer contains a Generate — exploding
    # below the cache made InferFiltersFromGenerate push a
    # size(shingles(text)) > 0 filter through the repartition exchange
    # down to the scan, re-evaluating the whole tokenize+shingle chain
    # per row inside the filter (the built-in-expression analogue of
    # guide §4.4's duplicated-UDF pushdown).  The explode above the
    # cache re-slices stored arrays (cheap), and its inferred filter
    # tests the stored column.  The array grain also stores each doc's
    # (id, blocks, n_sh) once instead of once per shingle.
    base = query_persist(base)
    posting = base.select(
        "doc_id", *block_cols, "n_sh", F.explode("sh").alias("shingle")
    )
    a, b = posting.alias("a"), posting.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    union = (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_inter")).cast("double")
    sim = F.col("n_inter").cast("double") / union
    return (
        a.join(b, cond)
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.n_sh").alias("n_sh_a"),
            F.col("b.n_sh").alias("n_sh_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .filter(sim >= threshold)
        .select("doc_id_a", "doc_id_b", F.round(sim, 4).alias("jaccard_sim"))
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT shingle-Jaccard pairs via prefix filtering — the
    similarity-join literature's candidate reduction, result-identical
    to :func:`ngram_jaccard_pairs`.

    Prefix-filter theorem: order each doc's shingle set by any global
    total order (xxhash64 here — stable, needs no corpus statistics);
    if J(A,B) >= t, the first ``floor((1-t)·|A|)+1`` shingles of A and
    of B must share at least one element.  So the inverted index posts
    only each doc's PREFIX shingles — at t=0.5 that halves the index
    and roughly quarters the candidate pairs; at t=0.8 it cuts ~25×.
    Candidates are verified with the exact Jaccard over the full
    (cached) shingle arrays — per-pair array ops, but only on the
    filtered candidate set, which is the point.

    Use this form when the threshold is high or the corpus is large;
    the plain inverted index computes intersections as join-match
    counts and wins when most pairs are candidates anyway.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.repartition(par, F.col(id_col))
        .select(
            F.col(id_col).alias("doc_id"),
            *[F.col(c) for c in block_cols],
            word_shingles(tokens(F.col(text_col)), shingle_k).alias("raw_sh"),
        )
        .filter(F.size("raw_sh") > 0)
        .withColumn(
            "sh",
            F.expr(
                "transform(array_sort(transform(raw_sh,"
                " s -> struct(xxhash64(s) AS h, s AS s))), x -> x.s)"
            ),
        )
        .withColumn("n_sh", F.size("sh"))
        .withColumn(
            "prefix",
            F.expr(
                f"slice(sh, 1, CAST(floor((1.0 - {threshold}) * size(sh)) AS INT) + 1)"
            ),
        )
        .drop("raw_sh")
    )
    # both candidate sides + the verify join read this
    base = query_persist(base)
    posting = base.select(
        "doc_id", *block_cols, F.explode("prefix").alias("shingle")
    )
    a, b = posting.alias("a"), posting.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cand = (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    sides = base.select("doc_id", "sh", "n_sh")
    pairs = (
        cand.join(
            sides.select(
                F.col("doc_id").alias("doc_id_a"),
                F.col("sh").alias("sh_a"),
                F.col("n_sh").alias("n_a"),
            ),
            "doc_id_a",
        )
        .join(
            sides.select(
                F.col("doc_id").alias("doc_id_b"),
                F.col("sh").alias("sh_b"),
                F.col("n_sh").alias("n_b"),
            ),
            "doc_id_b",
        )
    )
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    sim = n_inter.cast("double") / (
        F.col("n_a") + F.col("n_b") - n_inter
    ).cast("double")
    return pairs.filter(sim >= threshold).select(
        "doc_id_a", "doc_id_b", F.round(sim, 4).alias("jaccard_sim")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded-LSH near-dup pairs, verified by exact Jaccard.

    Plan shape (the part that matters at 100 TB):
      1. signatures: one narrow map-side pass per doc (no shuffle);
      2. explode to (band_id, band_hash) — num_bands rows per doc;
      3. self-join on the band bucket — candidates only ever meet
         inside a bucket, so the join is an equi-join Catalyst can
         hash-partition; no cross product exists anywhere;
      4. distinct candidate pairs → exact-Jaccard verify on the
         (much smaller) candidate set.

    With 16 hashes / 4 bands (r=4), P[candidate] = 1-(1-j^4)^4:
    j=0.5 → 23%, j=0.8 → 87%, j=0.9 → 96% — tuned for high-precision
    near-dup detection; raise num_hashes for higher recall at lower j.
    """
    rows_per_band = num_hashes // num_bands
    par = df.sparkSession.sparkContext.defaultParallelism
    # First shuffle parallelizes the shingle build across cores; the
    # second materializes `sh` behind an exchange so the 16 signature
    # lambdas read the stored array instead of re-deriving the shingles
    # per hash (projection collapse would otherwise inline it).
    docs = (
        df.repartition(par, F.col(id_col))
        .select(
            F.col(id_col).alias("doc_id"),
            word_shingles(tokens(F.col(text_col)), shingle_k).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .repartition(par, F.col("doc_id"))
    )

    # Cache (doc_id, sh, band-hash ARRAY) and posexplode ABOVE the
    # cache (round-14): both candidate-join sides share one
    # shingle+16-minhash pass as before, but the fill plan carries no
    # Generate (whose inferred size>0 filter re-ran the whole chain in
    # the scan filter) and stores each doc's `sh` array once instead
    # of once per band row.
    base = query_persist(
        docs.select(
            "doc_id",
            "sh",
            band_hashes(
                minhash_signature(F.col("sh"), num_hashes),
                num_bands,
                rows_per_band,
            ).alias("bh"),
        )
    )
    sigs = base.select(
        "doc_id", "sh", F.posexplode("bh").alias("band_id", "band_hash")
    )

    a, b = sigs.alias("a"), sigs.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )

    sim = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        candidates.filter(sim >= threshold)
        .select("doc_id_a", "doc_id_b", F.round(sim, 4).alias("jaccard_sim"))
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_blocks: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs via the block-permutation trick.

    64-bit SimHash per doc over k-word shingle features (shingles, not
    unigrams — unigram features are weakly discriminative on
    small-vocabulary corpora): sign-sum of feature hashes per bit,
    computed as 64 JVM-side aggregates (sum of ±1 per bit) — no UDF.
    Pairs within Hamming distance `max_hamming` are found by splitting
    the fingerprint into `num_blocks` 16-bit blocks: any pair within
    distance d < num_blocks shares ≥1 exact block (pigeonhole), so the
    candidate join is an equi-join on (block_id, block_value).
    """
    feats = word_shingles(tokens(F.col(text_col)), shingle_k)
    par = df.sparkSession.sparkContext.defaultParallelism
    docs = (
        df.repartition(par, F.col(id_col))
        .select(F.col(id_col).alias("doc_id"), feats.alias("toks"))
        .filter(F.size("toks") > 0)
    )

    bits_per_block = 64 // num_blocks
    # Explode features and compute the 64 per-bit ±1 sums as ONE
    # whole-stage-codegen HashAggregate (64 cheap SUM exprs over a long
    # column).  Formulating the bit sums as nested higher-order lambdas
    # instead re-evaluates the feature/hash subtree once per outer
    # lambda element — observed 64× per-row recompute, minutes at sf0.1.
    hashed = docs.select(
        "doc_id", F.explode(F.expr("transform(toks, t -> xxhash64(t))")).alias("h")
    )
    bit_sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {bit}) & 1 = 1"), 1).otherwise(-1)
            ).alias(f"s{bit}")
            for bit in range(64)
        ]
    )
    bits = F.array(
        *[F.when(F.col(f"s{bit}") > 0, 1).otherwise(0) for bit in range(64)]
    )
    fp = bit_sums.select("doc_id", bits.alias("bits")).select(
        "doc_id",
        "bits",
        F.expr(
            f"transform(sequence(0, {num_blocks - 1}), blk -> "
            f"  aggregate(sequence(0, {bits_per_block - 1}), CAST(0 AS BIGINT), "
            f"    (acc, i) -> acc + element_at(bits, blk * {bits_per_block} + i + 1) "
            f"                      * shiftleft(CAST(1 AS BIGINT), i)))"
        ).alias("blocks"),
    )

    # Cache the per-doc fingerprints: the candidate self-join otherwise
    # re-runs the explode + 64-sum aggregation for each side (observed:
    # 6 HashAggregates in the plan, no exchange reuse).  The cached set
    # is one row per doc (bits + blocks arrays) — tiny relative to the
    # corpus; Spark's LRU evicts it under pressure.
    fp = query_persist(fp)
    buckets = fp.select(
        "doc_id", "bits", F.posexplode("blocks").alias("block_id", "block_value")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    hamming = F.expr(
        "aggregate(zip_with(a.bits, b.bits, (x, y) -> IF(x = y, 0, 1)), 0, (acc, d) -> acc + d)"
    )
    return (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_value") == F.col("b.block_value"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def remove_duplicate_spans(
    docs: DataFrame,
    window: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Span-level duplicate REMOVAL — the apply tier of the exact
    substring duplication signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"; measurement twin:
    char_window_duplication in plans/queries_curation3.py).

    Each document is tiled into consecutive non-overlapping
    ``window``-char blocks (last block may be shorter); a block whose
    exact text occurs ≥2 times anywhere in the tiled corpus (across
    OR within documents) is cut, and the surviving blocks are
    re-concatenated in order.  Non-overlapping tiling is what makes
    removal well-defined distributively: overlapping matches (the
    suffix-array formulation) need cross-row span stitching, while
    tiles partition the byte range so every byte has exactly one
    keep/cut verdict and the rewrite is a per-doc ordered reduce.

    Plan: one exchange on the tile text (window count over the gram
    partition — groupBy+join-back would re-execute the tiling subtree
    for the dup-set side), then one exchange on the doc id for the
    ordered rebuild (collect_list of (offset, tile) structs,
    array_sort, concat).  Per-task state is one document's tiles —
    bounded by max doc length, never the corpus.  At 100 TB both
    shuffles are equi-key and map-side-combinable; no pairs, no
    corpus sort, no driver-side data.

    Returns one row per input doc with at least one character: id,
    ``keep_cols``, ``orig_len``, ``n_tiles``, ``n_tiles_removed``,
    ``new_text``.  Empty/NULL-text docs own no tiles and are EXCLUDED
    from the output (the DuckDB oracle mirrors the same filter);
    callers reconciling against the source corpus should treat a
    missing id as an empty input, not a fully-removed one.
    """
    from pyspark.sql.window import Window

    base = docs.filter(F.length(text_col) >= 1)
    tiles = base.select(
        id_col,
        *keep_cols,
        F.length(text_col).cast("long").alias("orig_len"),
        F.explode(
            F.sequence(F.lit(1), F.length(text_col), F.lit(window))
        ).alias("s"),
        text_col,
    ).select(
        id_col,
        *keep_cols,
        "orig_len",
        "s",
        F.col(text_col).substr(F.col("s"), F.lit(window)).alias("gram"),
    )
    g = Window.partitionBy("gram")
    marked = tiles.withColumn("dup", F.count(F.lit(1)).over(g) > 1)
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(~F.col("dup"), F.struct("s", "gram"))
                )
            ),
            lambda t: t["gram"],
        ),
        "",
    )
    return marked.groupBy(id_col, *keep_cols, "orig_len").agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.sum(F.col("dup").cast("long")).alias("n_tiles_removed"),
        kept_text.alias("new_text"),
    )


def cdc_chunk_starts(
    text_col: F.Column,
    avg_size: int = 64,
    max_size: int = 256,
    hash_width: int = 8,
) -> F.Column:
    """Content-defined chunk START positions (1-based, sorted, always
    beginning with 1) for a text column — the alignment-robust twin of
    fixed-offset tiling (round-12 verdict ask #3; gear/rolling-hash
    CDC as in LBFS, Muthitacharoen et al. SOSP 2001, and FastCDC, Xia
    et al. ATC 2016, re-expressed as per-position local hashing so the
    whole computation is ONE JVM array expression, no Python UDF and
    no cross-row state).

    A cut is placed before position ``i`` whenever the Murmur3 hash of
    the ``hash_width`` characters ENDING at ``i-1`` is 0 mod
    ``avg_size`` — a purely LOCAL condition, so a passage duplicated
    at DIFFERENT offsets in two documents chunks identically past its
    first fully-formed window (fixed tiles only match when offsets
    agree mod the tile width).  Cuts are then densified with forced
    boundaries every ``max_size`` chars WITHIN each content-defined
    span: the forced cuts are relative to the preceding content cut,
    so they inherit its shift-invariance.  Expected chunk length is
    ``avg_size``; a hard minimum is deliberately NOT enforced (greedy
    minimum-length suppression is sequential state — callers instead
    ignore sub-``min_dup_len`` chunks at the duplicate-marking step,
    which keeps every position's verdict independent).

    NOTE for hot paths: this single-expression form re-inlines the
    expensive content-cut subtree at every lambda reference (Catalyst
    duplicates expression trees, and codegen CSE does not reach into
    higher-order-function lambdas), turning O(n) hashing into
    O(n·chunks) per doc.  :func:`remove_duplicate_spans_cdc` therefore
    STAGES the same two steps (:func:`cdc_content_starts` →
    :func:`cdc_densify_starts`) as aliased columns across separate
    projections, which CollapseProject keeps un-merged because each
    alias is referenced more than once.  This convenience wrapper is
    for tests and ad-hoc use on small inputs.
    """
    return cdc_densify_starts(
        cdc_content_starts(text_col, avg_size, hash_width),
        F.length(text_col),
        max_size,
    )


def cdc_content_starts(
    text_col: F.Column, avg_size: int = 64, hash_width: int = 8
) -> F.Column:
    """Content-defined start positions (1 plus every gear-condition
    cut) — the O(n)-hashing half of :func:`cdc_chunk_starts`."""
    n = F.length(text_col)
    # Content cuts exist only where the hash window is fully formed
    # (i > hash_width) — Spark's sequence(a, b) is DESCENDING when
    # a > b, so the short-text case must be gated explicitly.
    content_cuts = F.when(
        n >= hash_width + 1,
        F.filter(
            F.sequence(F.lit(hash_width + 1), n),
            lambda i: F.pmod(
                F.hash(text_col.substr(i - hash_width, F.lit(hash_width))),
                F.lit(avg_size),
            )
            == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    return F.concat(F.array(F.lit(1)), content_cuts)


def cdc_densify_starts(
    starts0: F.Column, n: F.Column, max_size: int = 256
) -> F.Column:
    """Densify content starts with forced cuts every ``max_size``
    chars inside each span; the last span ends at ``n``
    (try_element_at is 1-based; j is the 0-based lambda index, so the
    NEXT start is element 2 past it)."""
    return F.flatten(
        F.transform(
            starts0,
            lambda s, j: F.sequence(
                s,
                F.coalesce(F.try_element_at(starts0, j + 2), n + 1) - 1,
                F.lit(max_size),
            ),
        )
    )


def _gear_table():
    """Deterministic 256-entry uint64 gear table (seeded from sha256,
    no RNG state) — the per-byte mixing constants of the vectorized
    CDC hash."""
    import hashlib as _hl

    import numpy as np

    return np.array(
        [
            int.from_bytes(
                _hl.sha256(b"ex9-cdc-gear-%d" % i).digest()[:8], "big"
            )
            for i in range(256)
        ],
        dtype=np.uint64,
    )


def cdc_starts_py(
    text: str,
    avg_size: int = 64,
    max_size: int = 256,
    hash_width: int = 8,
) -> list[int]:
    """Vectorized (numpy) content-defined chunk starts for one text —
    the PRODUCTION tier of the CDC boundary computation.

    Same contract as :func:`cdc_chunk_starts` (1-based sorted starts
    beginning with 1; a cut before position ``i`` is a function of the
    ``hash_width`` chars ending at ``i-1``; forced cuts every
    ``max_size`` within each content span) but with a gear window
    hash — ``W[e] = Σ_k GEAR[cp[e-k] & 0xFF] << k`` over codepoints —
    that numpy computes as ``hash_width`` shifted adds over the whole
    document at once.  The JVM-expression twin hashes each window with
    an interpreted per-position lambda (higher-order functions are
    CodegenFallback), measured ~50× slower per char; per-byte work
    this shape belongs in the Arrow tier, the same boundary the media
    decoders use.  The two tiers use different hash families, so their
    chunkings differ in WHERE they cut but share every CDC property
    (local condition → shift invariance, expected ``avg_size``,
    ``max_size`` bound)."""
    import numpy as np

    global _GEAR
    if _GEAR is None:
        _GEAR = _gear_table()
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    n = len(cps)
    cuts: list[int] = []
    if n >= hash_width + 1:
        g = _GEAR[(cps & 0xFF).astype(np.intp)] ^ cps.astype(np.uint64)
        # W[e] (window ENDING at 0-based e, e >= hash_width-1) =
        # sum_k g[e-k] << k  — hash_width shifted adds, wraparound ok.
        m = n - hash_width + 1
        w = np.zeros(m, dtype=np.uint64)
        for k in range(hash_width):
            w += g[hash_width - 1 - k : n - k] << np.uint64(k)
        # cut before 1-based i = e + hash_width + 1, valid while i <= n
        es = np.nonzero(w % np.uint64(avg_size) == 0)[0]
        cuts = [int(e) + hash_width + 1 for e in es if e + hash_width + 1 <= n]
    starts0 = [1] + cuts
    out: list[int] = []
    for idx, s in enumerate(starts0):
        nxt = starts0[idx + 1] if idx + 1 < len(starts0) else n + 1
        out.extend(range(s, nxt, max_size))
    return out


_GEAR = None  # populated lazily on executors (numpy import cost)


def _cdc_starts_udf(avg_size: int, max_size: int, hash_width: int):
    """Arrow-batched pandas_udf computing per-doc CDC chunk starts."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def starts(texts):
        return texts.map(
            lambda t: cdc_starts_py(t, avg_size, max_size, hash_width)
        )

    # real type objects: the module-wide `from __future__ import
    # annotations` would stringify inline hints, and pandas is only
    # imported locally, so pandas_udf's hint inference couldn't
    # resolve them.
    starts.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(starts, "array<int>")


def remove_duplicate_spans_cdc(
    docs: DataFrame,
    avg_size: int = 64,
    max_size: int = 256,
    min_dup_len: int = 16,
    hash_width: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = ("source",),
    chunker: str = "arrow",
) -> DataFrame:
    """Alignment-robust span-level duplicate removal: the
    content-defined-chunking twin of :func:`remove_duplicate_spans`
    (round-12 verdict ask #3).  Fixed-offset tiles only catch a
    duplicated passage when its copies land at equal offsets modulo
    the tile width; CDC boundaries are functions of local content, so
    SHIFTED duplicate passages chunk identically and are caught.

    Plan shape is IDENTICAL to the fixed-tile form — chunking is a
    pure per-doc map (one array expression), then the same two
    equi-key exchanges: a count window over the chunk-text partition
    to mark duplicates, and a per-doc ordered rebuild
    (collect_list(struct(s, chunk)), array_sort, concat).  Per-task
    state stays bounded by max doc length; no pairs, no corpus sort,
    no driver-side data — the decade-scaling profile of the fixed
    tiler is preserved.

    A duplicated chunk is CUT only when it is at least
    ``min_dup_len`` chars: with variable boundaries, very short
    chunks ("e ", "th") are trivially corpus-frequent, and cutting
    them would shred unrelated text (the fixed tiler needs no such
    guard because every tile is full-width).  Returns the same
    columns as the fixed form: id, ``keep_cols``, ``orig_len``,
    ``n_chunks``, ``n_chunks_removed``, ``new_text``; empty/NULL-text
    docs are excluded (they own no chunks).

    ``chunker`` picks the boundary tier: ``"arrow"`` (default) is the
    vectorized gear hash (:func:`cdc_starts_py` via one Arrow-batched
    pandas_udf — the production path; per-char rolling work is the
    media-decoder boundary, ~10× the JVM lambda's throughput here);
    ``"expr"`` is the pure-JVM expression twin
    (:func:`cdc_content_starts` + :func:`cdc_densify_starts`) with no
    Python dependency.  Both are local-window CDC; they differ only in
    hash family, i.e. WHERE they cut.
    """
    from pyspark.sql.window import Window

    # Stage the boundary arrays as ALIASED COLUMNS across separate
    # projections: each alias is referenced twice downstream (lambda
    # body + transform argument), so CollapseProject keeps the
    # projections apart and the expensive content-cut hashing runs
    # exactly ONCE per row.  Inlining everything as one expression
    # re-evaluates the O(n)-hash subtree per chunk — measured 9.4 s vs
    # ~0.8 s for this query at sf0.1.
    n = F.length("_cdc_t")
    base = docs.filter(F.length(text_col) >= 1).select(
        id_col,
        *keep_cols,
        F.length(text_col).cast("long").alias("orig_len"),
        F.col(text_col).alias("_cdc_t"),
    )
    if chunker == "arrow":
        staged = base.withColumn(
            "_cdc_b",
            _cdc_starts_udf(avg_size, max_size, hash_width)(
                F.col("_cdc_t")
            ),
        )
    elif chunker == "expr":
        staged = base.withColumn(
            "_cdc_b0",
            cdc_content_starts(F.col("_cdc_t"), avg_size, hash_width),
        ).withColumn(
            "_cdc_b", cdc_densify_starts(F.col("_cdc_b0"), n, max_size)
        )
    else:
        raise ValueError(f"unknown chunker tier: {chunker!r}")
    chunked = staged.select(
        id_col,
        *keep_cols,
        "orig_len",
        F.explode(
            F.transform(
                F.col("_cdc_b"),
                lambda s, j: F.struct(
                    s.alias("s"),
                    F.col("_cdc_t")
                    .substr(
                        s,
                        F.coalesce(
                            F.try_element_at(F.col("_cdc_b"), j + 2), n + 1
                        )
                        - s,
                    )
                    .alias("chunk"),
                ),
            )
        ).alias("c"),
    ).select(id_col, *keep_cols, "orig_len", "c.s", "c.chunk")
    g = Window.partitionBy("chunk")
    marked = chunked.withColumn(
        "dup",
        (F.count(F.lit(1)).over(g) > 1)
        & (F.length("chunk") >= min_dup_len),
    )
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(~F.col("dup"), F.struct("s", "chunk"))
                )
            ),
            lambda t: t["chunk"],
        ),
        "",
    )
    return marked.groupBy(id_col, *keep_cols, "orig_len").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("dup").cast("long")).alias("n_chunks_removed"),
        kept_text.alias("new_text"),
    )
