"""Property-based tests (hypothesis) for the round-12 operators.

Invariants that must hold at any scale:

- span removal PARTITIONS every document's bytes: kept + removed
  tile lengths always reconstruct the original length, and a corpus
  with no repeated tiles passes through byte-identical;
- the FLAC encode→decode loop is bit-exact for arbitrary int16
  signals at arbitrary block sizes (the lossless contract the
  transparency audit asserts at zero deviation);
- the BPE double-replace merge step leaves NO un-merged occurrence
  of the merged pair behind (the reason two passes are the documented
  semantics: one leftmost-non-overlapping pass provably can miss
  alternate occurrences of an overlapping run, a second pass cannot
  — remaining occurrences after pass one are separated by merged
  tokens and cannot overlap).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ex9_big_data_gal_drimer_spark.operators.dedup import (
    remove_duplicate_spans,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.text(alphabet="abcxyz ", min_size=1, max_size=120),
    min_size=1,
    max_size=6,
)


@given(docs=texts)
@SLOW
def test_span_removal_partitions_bytes(spark, docs):
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(docs)],
        schema="doc_id long, source string, text string",
    )
    rows = remove_duplicate_spans(df, window=8).collect()
    assert len(rows) == len(docs)
    for r in rows:
        orig = docs[r.doc_id]
        assert r.orig_len == len(orig)
        # kept text is a subsequence of whole tiles: length bookkeeping
        # must partition the doc exactly
        removed = r.orig_len - len(r.new_text)
        assert 0 <= removed <= r.orig_len
        assert r.n_tiles_removed <= r.n_tiles
        if r.n_tiles_removed == 0:
            assert r.new_text == orig


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=400,
    ),
    blocksize=st.integers(min_value=16, max_value=64),
)
@settings(max_examples=25, deadline=None)
def test_flac_roundtrip_bit_exact(samples, blocksize):
    import numpy as np

    from ex9_big_data_gal_drimer_spark.operators.multimodal import (
        decode_flac_samples,
    )
    from ex9_big_data_gal_drimer_spark.operators.udtf_media import flac_encode

    enc = flac_encode([samples], rate=8000, blocksize=blocksize)
    dec = decode_flac_samples(enc)
    assert dec is not None
    mono, rate = dec
    assert rate == 8000
    assert np.array_equal(mono, np.asarray(samples, dtype=np.float64) / 32768.0)


@given(
    toks=st.lists(
        st.sampled_from(["a", "b", "ab", "c"]), min_size=1, max_size=20
    )
)
@settings(max_examples=60, deadline=None)
def test_bpe_double_replace_leaves_no_pair(toks):
    """Pure-string twin of the merge step (same semantics both engines
    run): after replace×2 of ' a b ' -> ' ab ', no ' a b ' remains."""
    seq = " " + " ".join(toks) + " "
    pat, rep = " a b ", " ab "
    once = seq.replace(pat, rep)
    twice = once.replace(pat, rep)
    assert pat not in twice
    # and the merge only ever rewrites (a, b) adjacencies — token
    # multiset is otherwise preserved
    assert twice.count(" ") <= seq.count(" ")
