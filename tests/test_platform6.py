"""Round-12 frontier operators: span-level duplicate removal
(operators/dedup.py::remove_duplicate_spans), HTML → text extraction
(operators/html.py), and distributed BPE merge training
(operators/bpe.py).  The cross-engine differentials live in
tests/test_staged_oracles.py; these tests pin the SEMANTICS on
crafted inputs (planted spans, crafted pages, hand-computed merges).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.operators.bpe import (
    chars_to_seq,
    train_bpe_merges,
)
from ex9_big_data_gal_drimer_spark.operators.dedup import (
    remove_duplicate_spans,
)
from ex9_big_data_gal_drimer_spark.operators.html import extract_text


# ---------------------------------------------------------------- spans


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, "src", t) for i, t in enumerate(texts)],
        schema="doc_id long, source string, text string",
    )


def test_planted_duplicate_span_is_cut(spark):
    """A 32-char span planted in two docs is cut from BOTH; the
    surrounding unique text survives byte-for-byte."""
    span = "X" * 32  # one exact tile when planted at a tile boundary
    a = "a" * 32 + span + "b" * 32
    b = "c" * 32 + span + "d" * 32
    out = {
        r.doc_id: r
        for r in remove_duplicate_spans(_docs(spark, [a, b]), window=32).collect()
    }
    assert out[0].new_text == "a" * 32 + "b" * 32
    assert out[1].new_text == "c" * 32 + "d" * 32
    assert out[0].n_tiles == 3 and out[0].n_tiles_removed == 1
    assert out[0].orig_len == 96


def test_unique_docs_pass_through_unchanged(spark):
    texts = ["alpha " * 20, "beta " * 25, "short"]
    rows = remove_duplicate_spans(_docs(spark, texts), window=32).collect()
    by_id = {r.doc_id: r for r in rows}
    for i, t in enumerate(texts):
        assert by_id[i].new_text == t
        assert by_id[i].n_tiles_removed == 0
        assert by_id[i].orig_len == len(t)


def test_within_doc_repetition_is_cut(spark):
    """The duplication test counts OCCURRENCES, not distinct docs: a
    tile repeated inside ONE document is duplicated too (the Gopher /
    Lee-et-al repetition case) — both copies are cut."""
    span = "R" * 32
    t = span + span + "tail"
    (row,) = remove_duplicate_spans(_docs(spark, [t]), window=32).collect()
    assert row.new_text == "tail"
    assert row.n_tiles == 3 and row.n_tiles_removed == 2


def test_partial_tail_tile_participates(spark):
    """The final sub-32-char tile is a tile like any other: two docs
    ending in the same short tail lose it."""
    a = "a" * 32 + "same-tail"
    b = "b" * 32 + "same-tail"
    rows = remove_duplicate_spans(_docs(spark, [a, b]), window=32).collect()
    assert {r.new_text for r in rows} == {"a" * 32, "b" * 32}


def test_fully_duplicated_doc_rewrites_to_empty(spark):
    a = "Z" * 64
    rows = remove_duplicate_spans(_docs(spark, [a, a]), window=32).collect()
    assert all(r.new_text == "" for r in rows)
    assert all(r.n_tiles_removed == r.n_tiles == 2 for r in rows)


# ----------------------------------------------------------------- html


def _extract_one(spark, html):
    df = spark.createDataFrame([(html,)], schema="html string")
    return df.select(extract_text(F.col("html")).alias("t")).first().t


def test_html_strip_tags_keep_content(spark):
    assert (
        _extract_one(spark, "<p>Hello <b>bold</b> world</p>")
        == "Hello bold world"
    )


def test_html_boilerplate_blocks_removed_wholesale(spark):
    page = (
        "<script>var x = 'CODE';</script><style>.c{color:red}</style>"
        "<nav>Home | About</nav><p>real text</p>"
        "<footer>copyright BOILER</footer>"
    )
    out = _extract_one(spark, page)
    assert out == "real text"
    for leak in ("CODE", "color", "Home", "BOILER"):
        assert leak not in out


def test_html_multiline_script_removed(spark):
    page = "<script>\nline1();\nline2();\n</script><p>kept</p>"
    assert _extract_one(spark, page) == "kept"


def test_html_entities_decoded_single_pass(spark):
    # &amp; decodes LAST: double-escaped &amp;lt; must yield literal
    # "&lt;", not "<".
    assert _extract_one(spark, "a &lt;b&gt; &amp; c &nbsp;d") == "a <b> & c d"
    assert _extract_one(spark, "x &amp;lt; y") == "x &lt; y"


def test_html_whitespace_collapsed(spark):
    assert (
        _extract_one(spark, "<div>a\n\n  b\t\tc</div> <p> d </p>")
        == "a b c d"
    )


# ------------------------------------------------------------------ bpe


def _seqs(spark, word_counts):
    df = spark.createDataFrame(
        list(word_counts.items()), schema="w string, cnt long"
    )
    return df.select("w", "cnt", chars_to_seq(F.col("w")).alias("seq"))


def test_bpe_hand_computed_merges(spark):
    """Sennrich-style toy corpus: {'low':5,'lower':2,'newest':6,
    'widest':3}.  Hand-computed first merges: (e,s) 9 -> (es,t) 9 ->
    (l,o) 7."""
    merges = train_bpe_merges(
        _seqs(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3}),
        rounds=3,
    )
    got = [(m.lhs, m.rhs, m.pair_count, m.merged) for m in merges]
    assert got == [("e", "s", 9, "es"), ("es", "t", 9, "est"), ("l", "o", 7, "lo")]


def test_bpe_tie_breaks_lexicographically(spark):
    """'ab':1 and 'cd':1 — pairs (a,b) and (c,d) tie at 1; (a,b) wins."""
    merges = train_bpe_merges(_seqs(spark, {"ab": 1, "cd": 1}), rounds=1)
    assert (merges[0].lhs, merges[0].rhs) == ("a", "b")


def test_bpe_overlapping_run_merges_via_double_replace(spark):
    """'aaaa':1 — merging (a,a) must produce (aa)(aa), i.e. the pair
    count for round 2 sees (aa,aa); one naive replace pass would leave
    ' aa a a ' and round 2 would see (aa,a) instead."""
    merges = train_bpe_merges(_seqs(spark, {"aaaa": 10}), rounds=2)
    assert (merges[0].lhs, merges[0].rhs) == ("a", "a")
    assert (merges[1].lhs, merges[1].rhs) == ("aa", "aa")


def test_bpe_stops_when_fully_merged(spark):
    """A single 2-char word exhausts after one merge; the loop must
    stop instead of erroring on an empty pair relation."""
    merges = train_bpe_merges(_seqs(spark, {"hi": 3}), rounds=5)
    assert len(merges) == 1
    assert merges[0].merged == "hi"


def test_bpe_require_all_raises_on_degenerate_corpus(spark):
    """require_all=True (the staged-oracle call sites) must FAIL LOUDLY
    when the vocabulary merges out early — the unrolled DuckDB CTE
    rounds assume every round produces a merge, so a silent short
    table would diverge from the oracle instead of flagging the edge
    (round-12 ADVICE)."""
    import pytest

    with pytest.raises(ValueError, match="merged out after 1 of 5"):
        train_bpe_merges(_seqs(spark, {"hi": 3}), rounds=5, require_all=True)


def test_bpe_apply_reproduces_training_sequences(spark):
    """Segmenting the training corpus with the trained merge table
    reproduces the training-end token counts: 'newest' -> n e w est
    (4 tokens) after the (e,s)+(es,t) merges, 'low' -> lo w (2)."""
    from ex9_big_data_gal_drimer_spark.operators.bpe import apply_bpe_merges

    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    seqs = _seqs(spark, wc).persist()
    merges = train_bpe_merges(seqs, rounds=3)
    seqs.unpersist()
    out = {
        r.w: r.n
        for r in _seqs(spark, wc)
        .select(
            "w",
            F.size(
                F.split(F.trim(apply_bpe_merges(F.col("seq"), merges)), " ")
            ).alias("n"),
        )
        .collect()
    }
    assert out == {"low": 2, "lower": 4, "newest": 4, "widest": 4}
