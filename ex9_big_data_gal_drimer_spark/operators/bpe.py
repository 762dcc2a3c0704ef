"""Distributed BPE merge-table TRAINING (the missing half of the
tokenizer story: ``bpe_token_stats`` in plans/queries_llm2.py consumes
a fixed vocabulary; this trains one).

Classic byte-pair-encoding training (Sennrich et al. 2016) over a
word-frequency table: each round counts adjacent symbol pairs weighted
by word frequency, picks the most frequent pair (ties broken
lexicographically so the result is engine-exact), and merges that pair
everywhere.  The distributed shape mirrors the fixed-budget iteration
precedent (pagerank_part_cooccurrence): the ONE corpus-scale job is
the initial word count; every training round then runs over the
vocabulary-sized (word, count) relation — at 100 TB the rounds cost
the same as at 1 GB because the vocabulary, not the corpus, is the
working set.  The per-round driver traffic is exactly one argmax row
(model-sized collect — ITERATIVE_CONSTRUCTION), never data.

Merge-step semantics (pinned so the DuckDB oracle can unroll the SAME
computation): symbol sequences are space-separated strings padded with
one leading/trailing space; merging pair (l, r) applies
``replace(' l r ', ' lr ')`` TWICE.  Plain SQL ``replace`` is
leftmost-non-overlapping, so one pass misses every second occurrence
of an overlapping run (the shared boundary space is consumed); the
second pass catches them.  Two passes are the documented semantics on
both engines — deterministic and identical, which is what the
differential needs (for the alternating-run corner cases this can
differ from strict leftmost BPE greediness, a tokenizer-variant
freedom real implementations also take).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, functions as F


def chars_to_seq(word_col: F.Column) -> F.Column:
    """' c h a r s ' — the padded space-separated symbol string."""
    return F.concat(
        F.lit(" "),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.length(word_col)),
                lambda i: word_col.substr(i, F.lit(1)),
            ),
            " ",
        ),
        F.lit(" "),
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """(l, r, pc): adjacent-symbol pair counts weighted by word count."""
    return (
        seqs.select("cnt", F.split(F.trim(F.col("seq")), " ").alias("toks"))
        # A fully merged word is ONE token and emits no pairs.  The
        # filter is load-bearing for cross-engine parity: Spark's
        # sequence(1, 0) yields the DESCENDING [1, 0], while DuckDB's
        # range(1, 1) is empty.
        .filter(F.size("toks") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i-1] AS l, toks[i] AS r))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("pc"))
    )


def train_bpe_merges(
    seqs: DataFrame, rounds: int, *, require_all: bool = False
) -> list[Row]:
    """Run ``rounds`` BPE merge rounds over a (w, cnt, seq) DataFrame
    (``seq`` as produced by :func:`chars_to_seq`); returns one Row per
    round: (round, lhs, rhs, pair_count, merged).

    ``seqs`` should be persisted by the caller: each round's pair
    count re-evaluates the (vocabulary-sized) relation with the merge
    rewrites chained on top.

    ``require_all=True`` raises if the vocabulary merges out before
    ``rounds`` completes.  Callers whose differential oracle unrolls
    exactly ``rounds`` CTE rounds (the staged BPE queries) need the
    degenerate-corpus case to fail LOUDLY: the unrolled oracle's
    cross-join against an empty argmax collapses to an empty relation
    while the engine would keep producing rows (round-12 ADVICE,
    queries_platform6.py:210).
    """
    merges: list[Row] = []
    for rnd in range(1, rounds + 1):
        best = (
            _pair_counts(seqs)
            .orderBy(F.col("pc").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:  # vocabulary fully merged — nothing left to count
            if require_all:
                raise ValueError(
                    f"BPE vocabulary merged out after {rnd - 1} of "
                    f"{rounds} rounds; the unrolled differential oracle "
                    "assumes every round produces a merge"
                )
            break
        b = best[0]
        merges.append(
            Row(
                round=rnd,
                lhs=b.l,
                rhs=b.r,
                pair_count=int(b.pc),
                merged=b.l + b.r,
            )
        )
        pat = F.lit(f" {b.l} {b.r} ")
        rep = F.lit(f" {b.l}{b.r} ")
        seqs = seqs.withColumn(
            "seq", F.replace(F.replace(F.col("seq"), pat, rep), pat, rep)
        )
    return merges


def apply_bpe_merges(seq_col: F.Column, merges: list[Row]) -> F.Column:
    """Apply a trained merge table to a padded symbol-string column —
    the SEGMENTATION half of the lifecycle (train → apply).  Each
    merge is the same double leftmost-non-overlapping replace the
    training rounds used, applied in training order, so segmenting the
    training corpus reproduces the training-end sequences exactly."""
    out = seq_col
    for m in merges:
        pat = F.lit(f" {m.lhs} {m.rhs} ")
        rep = F.lit(f" {m.merged} ")
        out = F.replace(F.replace(out, pat, rep), pat, rep)
    return out
