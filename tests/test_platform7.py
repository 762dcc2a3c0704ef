"""Round-13 frontier tier (plans/queries_platform7.py): semantics and
plan pins for the content-defined-chunking span dedup twin.

The CDC tier's whole reason to exist is the fixed tiler's blind spot
(round-12 verdict "What's missing" #3): a passage duplicated at
offsets that differ by anything ≢ 0 (mod 32) is invisible to
fixed-offset tiles.  The recall-floor tests plant exactly that case
and require CDC to cut most of the passage from BOTH copies while the
fixed tiler cuts none of it — plus the invariance properties (unique
text untouched, short common chunks never cut, boundaries shift with
content, plan shape identical to the fixed twin)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.operators.dedup import (
    cdc_chunk_starts,
    remove_duplicate_spans,
    remove_duplicate_spans_cdc,
)
from ex9_big_data_gal_drimer_spark.plans import QUERIES
from ex9_big_data_gal_drimer_spark.plans.audit import (
    count_exchanges,
    executed_plan,
    has_cartesian,
)

from conftest import SF_DIR


def _aperiodic(tag: str, n_hexes: int) -> str:
    """Deterministic non-repeating text (n_hexes * 32 chars)."""
    return "".join(
        hashlib.md5(f"{tag}{i}".encode()).hexdigest() for i in range(n_hexes)
    )


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, "src", t) for i, t in enumerate(texts)],
        schema="doc_id int, source string, text string",
    )


import pytest


@pytest.mark.parametrize("chunker", ["arrow", "expr"])
def test_shifted_duplicate_passage_recall_floor(spark, chunker):
    """THE case the CDC tier exists for: a 2048-char passage planted at
    offsets 163 and 96 (shift 67 ≢ 0 mod 32, so no 32-char tile of one
    copy aligns with the other).  The fixed tiler must miss it
    entirely; BOTH CDC tiers (vectorized gear hash / JVM expression)
    must cut ≥80% of the passage bytes from BOTH copies and leave the
    unrelated doc untouched."""
    passage = _aperiodic("p", 64)  # 2048 chars
    a = _aperiodic("a", 5) + "@#!" + passage + _aperiodic("a2", 4)
    b = _aperiodic("b", 3) + passage + _aperiodic("b2", 5) + "x" * 8
    c = _aperiodic("c", 6)
    docs = _docs(spark, [a, b, c])

    fixed = {
        r.doc_id: r for r in remove_duplicate_spans(docs, window=32).collect()
    }
    cdc = {
        r.doc_id: r
        for r in remove_duplicate_spans_cdc(docs, chunker=chunker).collect()
    }

    for d in (1, 2):
        assert fixed[d].orig_len - len(fixed[d].new_text) == 0, (
            "fixture must be a fixed-tiler blind spot"
        )
        removed = cdc[d].orig_len - len(cdc[d].new_text)
        assert removed >= 0.8 * len(passage), (d, removed)
        # everything cut must come FROM the passage: the unique
        # affixes survive verbatim at both ends
        assert cdc[d].new_text.startswith(_aperiodic("a" if d == 1 else "b", 1)[:32])
    assert cdc[3].new_text == c and cdc[3].n_chunks_removed == 0


def test_unique_docs_pass_through_unchanged(spark):
    texts = [_aperiodic(f"u{i}", 8) for i in range(4)]
    rows = remove_duplicate_spans_cdc(_docs(spark, texts)).collect()
    assert len(rows) == 4
    assert all(r.n_chunks_removed == 0 for r in rows)
    assert sorted(r.new_text for r in rows) == sorted(texts)


def test_short_common_chunks_are_never_cut(spark):
    """Sub-min_dup_len chunks ('the ', 'a ') are trivially
    corpus-frequent; cutting them would shred unrelated text.  Two
    docs sharing only short words must both survive intact."""
    a = _aperiodic("s1", 4) + " the " + _aperiodic("s2", 4)
    b = _aperiodic("s3", 4) + " the " + _aperiodic("s4", 4)
    rows = {
        r.doc_id: r
        for r in remove_duplicate_spans_cdc(
            _docs(spark, [a, b]), min_dup_len=16
        ).collect()
    }
    assert rows[1].new_text == a
    assert rows[2].new_text == b


def test_within_doc_repetition_is_cut(spark):
    """A passage repeated INSIDE one document duplicates its own
    chunks; interior chunks must be cut from both occurrences."""
    passage = _aperiodic("r", 32)  # 1024 chars
    t = _aperiodic("pre", 2) + passage + _aperiodic("mid", 2) + passage
    (row,) = remove_duplicate_spans_cdc(_docs(spark, [t])).collect()
    removed = row.orig_len - len(row.new_text)
    assert removed >= 2 * 0.7 * len(passage), removed
    assert row.new_text.startswith(_aperiodic("pre", 1)[:32])


def test_empty_and_null_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "s", "x" * 300), (2, "s", ""), (3, "s", None)],
        schema="doc_id int, source string, text string",
    )
    rows = remove_duplicate_spans_cdc(docs).collect()
    assert [r.doc_id for r in rows] == [1]


def test_chunk_starts_shift_invariant_past_first_window(spark):
    """The boundary condition hashes the 8 chars ENDING before each
    position, so prepending a prefix must not move any boundary that
    falls ≥ hash_width chars into the shared suffix — the property
    fixed-offset tiling lacks."""
    body = _aperiodic("inv", 16)  # 512 chars
    prefix = _aperiodic("pf", 3)  # 96 chars
    df = spark.createDataFrame(
        [(0, body), (96, prefix + body)], "shift int, text string"
    )
    rows = df.select(
        "shift", cdc_chunk_starts(F.col("text")).alias("starts")
    ).collect()
    by_shift = {r.shift: r.starts for r in rows}
    base = {s for s in by_shift[0] if s > 8}
    shifted = {s - 96 for s in by_shift[96] if s - 96 > 8}
    # every interior boundary of the unshifted body reappears at the
    # same CONTENT position in the shifted copy (extra boundaries may
    # exist near the splice from the prefix's own content cuts /
    # max-size densification — those don't hurt recall)
    assert base <= shifted, (sorted(base - shifted))


def test_chunks_partition_the_text(spark):
    """Chunk starts are 1, strictly increasing, gaps ≤ max_size, and
    rebuilding with NOTHING marked duplicate reproduces the text —
    i.e. chunking is a true partition of the byte range."""
    texts = [_aperiodic(f"pt{i}", 5 + i) for i in range(3)] + ["ab"]
    df = _docs(spark, texts)
    rows = df.select(
        "text",
        cdc_chunk_starts(F.col("text"), max_size=256).alias("starts"),
    ).collect()
    for r in rows:
        starts = list(r.starts)
        assert starts[0] == 1
        assert starts == sorted(set(starts))
        bounds = starts + [len(r.text) + 1]
        assert all(
            1 <= bounds[i + 1] - bounds[i] <= 256
            for i in range(len(starts))
        )


def test_arrow_chunker_properties():
    """The vectorized gear-hash tier (cdc_starts_py — the query's
    production path) holds the same CDC contract as the JVM twin:
    partition of the byte range, max-size bound, and shift invariance
    past the first full window — all checkable without Spark."""
    from ex9_big_data_gal_drimer_spark.operators.dedup import cdc_starts_py

    for tag, hexes in (("pa", 4), ("pb", 17), ("pc", 1)):
        t = _aperiodic(tag, hexes)
        st = cdc_starts_py(t)
        assert st[0] == 1 and st == sorted(set(st))
        bounds = st + [len(t) + 1]
        assert all(
            1 <= bounds[i + 1] - bounds[i] <= 256 for i in range(len(st))
        ), (tag, st)
    assert cdc_starts_py("ab") == [1]  # shorter than the hash window
    body = _aperiodic("inv2", 16)
    base = {s for s in cdc_starts_py(body) if s > 8}
    shifted = {
        s - 97 for s in cdc_starts_py("q" * 97 + body) if s - 97 > 8
    }
    assert base <= shifted, sorted(base - shifted)
    # boundaries actually fire at the expected ~1/avg_size rate
    long_text = _aperiodic("rate", 64)  # 2048 chars
    n_cuts = len(cdc_starts_py(long_text))
    assert 8 <= n_cuts <= 128, n_cuts


def test_cdc_query_plan_matches_fixed_twin(spark):
    """The registered CDC query must keep the fixed twin's plan shape:
    chunk-text exchange + per-doc rebuild + presentation sort, no
    joins, no cartesian.  Boundary hashing is the ONE Arrow-batched
    pandas_udf (the vectorized production tier — per-char rolling
    work at the media-decoder boundary); never a row-at-a-time Python
    UDF."""
    df = QUERIES["dedup_remove_spans_cdc"](spark, SF_DIR)
    plan = executed_plan(df)
    assert count_exchanges(df) == 3, plan
    assert plan.count("hashpartitioning(chunk") == 1, plan
    assert plan.count("hashpartitioning(doc_id") == 1, plan
    assert "Join" not in plan, plan
    assert not has_cartesian(df), plan
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("ArrowEvalPython") == 1, plan


def test_cdc_expr_tier_is_pure_jvm(spark):
    """The "expr" tier stays Python-free (the no-dependency twin) and
    keeps the identical two-exchange shape."""
    from ex9_big_data_gal_drimer_spark.catalog import table

    docs = table(spark, SF_DIR, "documents")
    df = remove_duplicate_spans_cdc(docs, chunker="expr")
    plan = executed_plan(df)
    assert count_exchanges(df) == 2, plan  # no presentation sort here
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "Join" not in plan, plan


def test_cdc_query_runs_on_testdata(spark):
    rows = QUERIES["dedup_remove_spans_cdc"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r.new_len + r.bytes_removed == r.orig_len
        assert 0 <= r.n_chunks_removed <= r.n_chunks


def test_llm_pipeline_funnel_invariants(spark):
    """Stage-by-stage sanity of the composed pipeline (the staged
    differential proves engine/oracle equality; this pins the FUNNEL
    SEMANTICS): monotone doc counts through the filters, chars never
    grow through span removal, token totals conserved from
    segmentation through packing and splitting."""
    st = {
        r.stage: (r.n_rows, r.measure)
        for r in QUERIES["llm_pipeline_e2e"](spark, SF_DIR).collect()
    }
    assert st["0_raw"][0] == st["1_extract"][0]
    assert st["2_quality"][0] <= st["1_extract"][0]
    assert st["3_span_dedup"][0] == st["2_quality"][0]  # rewrites, not drops
    assert st["3_span_dedup"][1] <= st["2_quality"][1]  # chars only shrink
    assert st["4_doc_dedup"][0] <= st["3_span_dedup"][0]
    assert st["5_bpe_segment"][0] <= st["4_doc_dedup"][0]
    # packing and splitting conserve the token total
    assert st["6_pack"][1] == st["5_bpe_segment"][1]
    assert st["6_pack"][0] <= st["5_bpe_segment"][0]
    split_rows = [v for k, v in st.items() if k.startswith("7_split_")]
    assert sum(v[0] for v in split_rows) == st["5_bpe_segment"][0]
    assert sum(v[1] for v in split_rows) == st["5_bpe_segment"][1]


def test_llm_pipeline_doc_dedup_stage_fires_on_planted_dups(spark):
    """sf0.001 has no exact post-span-rewrite duplicates, so stage 4
    passes through; prove the dedup stage actually DROPS rows by
    running the same kept-min-id window logic on a corpus with a
    planted exact duplicate pair."""
    from pyspark.sql.window import Window

    spans = spark.createDataFrame(
        [(1, "en", "same text"), (2, "en", "same text"), (3, "en", "other")],
        schema="doc_id int, lang string, new_text string",
    )
    wn = Window.partitionBy(F.md5("new_text")).orderBy("doc_id")
    kept = (
        spans.withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]
