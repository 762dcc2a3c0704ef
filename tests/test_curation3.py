"""Planted-behavior evidence for the corpus-governance operators
(plans/queries_curation3.py).  The registry sweep already pins every
query against its DuckDB oracle on the driver corpus; these tests add
the NON-trivial semantics on constructed tables: caps actually cap,
duplicated spans actually register, the order-statistic threshold
picks the documented element, cohesion separates tight from loose
labels — each with an oracle differential on the same planted table
where the oracle is cheap to run.
"""

from __future__ import annotations

import duckdb
import pytest

from ex9_big_data_gal_drimer_spark.plans import ORACLES, QUERIES


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _duck_view(sf_dir, name="documents"):
    con = duckdb.connect()
    # Spark writes a directory; DuckDB needs the part-file glob
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet/*.parquet'"
    )
    return con


def test_domain_quality_cap_actually_caps(spark, tmp_path):
    """A 20-doc source must keep exactly 15 (the cap), a 3-doc source
    keeps all 3; kept docs are the highest-quality ones."""
    rows = []
    # big source: quality rises with doc_id (longer text => higher
    # length term), so the kept set is the 15 LONGEST docs
    for i in range(20):
        rows.append(
            (i, "the of and " * (2 + i), "en", "big", len("the of and " * (2 + i)))
        )
    for i in range(3):
        rows.append((100 + i, "a to in " * 5, "en", "small", 40))
    sf_dir = _write_documents(spark, tmp_path, rows)

    got = {r.source: r for r in QUERIES["domain_quality_cap"](spark, sf_dir).collect()}
    assert got["big"].n_docs == 20 and got["big"].n_kept == 15
    assert got["small"].n_docs == 3 and got["small"].n_kept == 3
    # kept char mass = the 15 longest docs' n_chars (docs 5..19)
    want_chars = sum(len("the of and " * (2 + i)) for i in range(5, 20))
    assert got["big"].kept_chars == want_chars

    con = _duck_view(sf_dir)
    want = con.execute(ORACLES["domain_quality_cap"]).fetchall()
    have = sorted(tuple(r) for r in got.values())
    assert have == sorted(want)


def test_char_window_duplication_planted_spans(spark, tmp_path):
    """Two docs with identical text must register duplicated windows;
    a doc with unique text must not."""
    shared = "x y z " * 30  # 180 chars, every strided window shared
    unique = "q w e r t y u i o p " * 9
    rows = [
        (1, shared, "en", "dup_src", len(shared)),
        (2, shared, "en", "dup_src", len(shared)),
        (3, unique, "en", "clean_src", len(unique)),
    ]
    sf_dir = _write_documents(spark, tmp_path, rows)

    got = {
        r.source: r for r in QUERIES["char_window_duplication"](spark, sf_dir).collect()
    }
    assert got["dup_src"].n_dup_windows == got["dup_src"].n_windows > 0
    assert got["dup_src"].dup_frac == 1.0
    assert got["clean_src"].n_dup_windows == 0 and got["clean_src"].dup_frac == 0.0

    con = _duck_view(sf_dir)
    want = con.execute(ORACLES["char_window_duplication"]).fetchall()
    assert sorted(tuple(r) for r in got.values()) == sorted(want)


def test_adaptive_threshold_is_the_documented_order_statistic(spark, tmp_path):
    """5 docs with strictly increasing quality: rank floor(0.4*(5-1))+1
    = 2, so the threshold is the 2nd-lowest score and exactly 4 of 5
    docs pass the >= gate."""
    rows = [
        (i, "the of and to in " * (1 + 3 * i), "en", "s", 10) for i in range(5)
    ]
    sf_dir = _write_documents(spark, tmp_path, rows)

    [row] = QUERIES["adaptive_quality_threshold"](spark, sf_dir).collect()
    assert row.n_docs == 5 and row.n_kept == 4

    con = _duck_view(sf_dir)
    want = con.execute(ORACLES["adaptive_quality_threshold"]).fetchall()
    assert [tuple(row)] == want


def test_vocab_overlap_identical_vs_disjoint(spark, tmp_path):
    """Identical-vocabulary sources score jaccard 1.0; fully disjoint
    pairs emit NO row (the audit reports overlapping pairs only —
    inner join on word)."""
    rows = [
        (1, "alpha beta gamma", "en", "s1", 16),
        (2, "gamma beta alpha alpha", "en", "s2", 22),
        (3, "delta epsilon", "en", "s3", 13),
    ]
    sf_dir = _write_documents(spark, tmp_path, rows)

    got = {
        (r.source_a, r.source_b): r
        for r in QUERIES["source_vocab_overlap"](spark, sf_dir).collect()
    }
    assert got[("s1", "s2")].jaccard == 1.0 and got[("s1", "s2")].n_common == 3
    assert ("s1", "s3") not in got and ("s2", "s3") not in got

    con = _duck_view(sf_dir)
    want = con.execute(ORACLES["source_vocab_overlap"]).fetchall()
    assert sorted(tuple(r) for r in got.values()) == sorted(want)


def test_unigram_divergence_flags_the_skewed_source(spark, tmp_path):
    """Two sources mirroring the corpus mix sit near KL≈0; a
    single-word source diverges hardest."""
    balanced = "a b c d " * 10
    rows = [
        (1, balanced, "en", "s1", len(balanced)),
        (2, balanced, "en", "s2", len(balanced)),
        (3, "zzz " * 40, "en", "skewed", 160),
    ]
    sf_dir = _write_documents(spark, tmp_path, rows)

    got = {
        r.source: r for r in QUERIES["source_unigram_divergence"](spark, sf_dir).collect()
    }
    assert got["skewed"].kl_nats > got["s1"].kl_nats
    assert got["skewed"].kl_nats > 0.5  # ln(120/40-ish mass shift)

    con = _duck_view(sf_dir)
    want = con.execute(ORACLES["source_unigram_divergence"]).fetchall()
    assert sorted(tuple(r) for r in got.values()) == sorted(want)


def test_embedding_cohesion_tight_label_beats_loose(spark, tmp_path):
    """A label of identical vectors has cohesion 1.0; a label of
    near-orthogonal vectors scores lower; oracle differential on the
    planted table."""
    tight = [[1.0] + [0.0] * 63] * 4
    loose = []
    for i in range(4):
        v = [0.0] * 64
        v[i * 8] = 1.0
        loose.append(v)
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(tight)]
    rows += [(10 + i, [float(x) for x in v], 1) for i, v in enumerate(loose)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    sf_dir = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    got = {
        r.label: r for r in QUERIES["embedding_label_cohesion"](spark, sf_dir).collect()
    }
    assert got[0].avg_cohesion == pytest.approx(1.0)
    assert got[1].avg_cohesion < 0.9
    assert got[0].n_vectors == got[1].n_vectors == 4

    con = _duck_view(sf_dir, "embeddings")
    want = con.execute(ORACLES["embedding_label_cohesion"]).fetchall()
    assert sorted(tuple(r) for r in got.values()) == sorted(want)
