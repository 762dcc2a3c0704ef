"""Distributed BPE merge-table TRAINING (the missing half of the
tokenizer story: ``bpe_token_stats`` in plans/queries_llm2.py consumes
a fixed vocabulary; this trains one).

Classic byte-pair-encoding training (Sennrich et al. 2016) over a
word-frequency table: each round counts adjacent symbol pairs weighted
by word frequency, picks the most frequent pair (ties broken
lexicographically so the result is engine-exact), and merges that pair
everywhere.  The ONE corpus-scale job is the initial word count; the
training rounds then run DRIVER-SIDE over the collected
vocabulary-sized (count, seq) table — at 100 TB training costs the
same as at 1 GB because the vocabulary, not the corpus, is the
working set, and a top-500 vocabulary is model state, not data
(the k-means-centroids precedent in operators/clustering.py).  The
driver traffic is exactly one vocabulary collect
(ITERATIVE_CONSTRUCTION), never corpus data.

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


def train_bpe_merges(
    seqs: DataFrame, rounds: int, *, require_all: bool = False
) -> list[Row]:
    """Run ``rounds`` BPE merge rounds over a (w, cnt, seq) DataFrame
    (``seq`` as produced by :func:`chars_to_seq`); returns one Row per
    round: (round, lhs, rhs, pair_count, merged).

    The vocabulary is collected ONCE (it is model-sized by
    construction: every caller feeds a top-N word table) and the merge
    rounds run driver-side over the collected (cnt, seq) pairs — the
    same model-state-lives-on-the-driver contract as the k-means
    centroids in operators/clustering.py.  The round-13 form instead
    ran one distributed argmax job per round over the persisted
    relation; with a 500-row vocabulary each round was pure per-job
    floor — Catalyst re-analysis of the full corpus lineage plus job
    scheduling, ~0.25 s/round against ~1 ms of driver arithmetic
    (round-14, guide §1.2: the cheapest shuffle is the one the
    vocabulary-sized working set never needed).  The driver arithmetic
    is exact, not approximate: Python ``str.replace`` is the same
    leftmost-non-overlapping all-occurrences scan as SQL ``replace``,
    integer pair counts are exact in both, and the (pc DESC, l ASC,
    r ASC) tie-break compares code points in both (UTF-8 byte order ==
    code-point order).  A fully merged word is ONE token and emits no
    pairs — the same boundary the old distributed form pinned with its
    size(toks) >= 2 filter.

    ``require_all=True`` raises if the vocabulary merges out before
    ``rounds`` completes.  Callers whose differential oracle unrolls
    exactly ``rounds`` CTE rounds (the staged BPE queries) need the
    degenerate-corpus case to fail LOUDLY: the unrolled oracle's
    cross-join against an empty argmax collapses to an empty relation
    while the engine would keep producing rows (round-12 ADVICE,
    queries_platform6.py:210).
    """
    vocab = [(int(r[0]), r[1]) for r in seqs.select("cnt", "seq").collect()]
    merges: list[Row] = []
    for rnd in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for cnt, seq in vocab:
            toks = seq.strip(" ").split(" ")
            if len(toks) < 2:
                continue
            for i in range(len(toks) - 1):
                key = (toks[i], toks[i + 1])
                counts[key] = counts.get(key, 0) + cnt
        if not counts:  # vocabulary fully merged — nothing left to count
            if require_all:
                raise ValueError(
                    f"BPE vocabulary merged out after {rnd - 1} of "
                    f"{rounds} rounds; the unrolled differential oracle "
                    "assumes every round produces a merge"
                )
            break
        (lhs, rhs), pc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(
            Row(
                round=rnd,
                lhs=lhs,
                rhs=rhs,
                pair_count=int(pc),
                merged=lhs + rhs,
            )
        )
        pat, rep = f" {lhs} {rhs} ", f" {lhs}{rhs} "
        vocab = [
            (cnt, seq.replace(pat, rep).replace(pat, rep))
            for cnt, seq in vocab
        ]
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
