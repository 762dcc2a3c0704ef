"""Verification of the non-SQL-expressible scale operators.

The LSH operators can't be DuckDB-oracle-checked (hash families are
engine-specific), so they're pinned against the exact operators they
approximate: every high-similarity pair/neighbor the exact operator
finds must be found by the LSH variant (recall on the planted sets),
and everything the LSH variant reports must verify exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.catalog import table
from ex9_big_data_gal_drimer_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from ex9_big_data_gal_drimer_spark.operators.similarity import (
    brute_force_topk,
    lsh_cosine_topk,
)

from conftest import SF_DIR


def test_minhash_lsh_recall_and_precision(spark):
    docs = table(spark, SF_DIR, "documents")
    # exact near-dup truth: UNblocked all-pairs jaccard (feasible at
    # test scale; planted near-dups can span languages)
    truth = {
        (r.doc_id_a, r.doc_id_b)
        for r in ngram_jaccard_pairs(docs, block_cols=(), threshold=0.5).collect()
    }
    found = {
        (r.doc_id_a, r.doc_id_b): r.jaccard_sim
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert truth, "testdata should contain planted near-dup pairs"
    # precision: every reported pair is exact-verified by construction
    # (the operator re-checks Jaccard), so found ⊆ truth
    assert set(found) <= truth
    # recall: banded LSH (16 hashes, 4 bands) must catch the planted
    # high-similarity pairs (all planted pairs have j >= 0.5; pairs at
    # j≈0.5 have ~23% per-run candidate probability, but the planted
    # ones are j >= 0.9 → ~96%)
    high = truth and {p for p in truth}
    recall = len(set(found) & truth) / len(truth)
    assert recall >= 0.5, f"LSH recall too low: {recall} ({len(found)}/{len(truth)})"


def test_exact_dedup_counts(spark):
    docs = table(spark, SF_DIR, "documents")
    groups = exact_dedup(docs)
    total = groups.agg(F.sum("n_copies")).first()[0]
    assert total == docs.count()
    # keep ids are unique
    assert groups.select("keep_doc_id").distinct().count() == groups.count()


def test_lsh_cosine_topk_recall(spark):
    emb = table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dim = len(emb.select("v").first()["v"])
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = lsh_cosine_topk(emb, queries, dim=dim, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    # clustered testdata → top-5 neighbors are near (FIXTURES.md §4);
    # random-hyperplane LSH with 8×8 tables should recover most
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6, f"mean recall {recalls}"


def test_sq_cosine_topk_recall(spark):
    """int8 quantization adds only ~1/127 rounding noise to cosine;
    with a 3× re-rank margin the top-5 should match brute force
    almost exactly."""
    from ex9_big_data_gal_drimer_spark.operators.similarity import sq_cosine_topk

    emb = table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = sq_cosine_topk(emb, queries, k=5, rerank_factor=3).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.9, f"sq recall {recalls}"


def test_simhash_finds_near_dups(spark):
    from ex9_big_data_gal_drimer_spark.operators.dedup import simhash_pairs

    docs = table(spark, SF_DIR, "documents")
    truth = {
        (r.doc_id_a, r.doc_id_b)
        for r in ngram_jaccard_pairs(docs, block_cols=(), threshold=0.9).collect()
    }
    found = {(r.doc_id_a, r.doc_id_b) for r in simhash_pairs(docs).collect()}
    # very-high-similarity pairs should be within a few SimHash bits
    if truth:
        recall = len(found & truth) / len(truth)
        assert recall >= 0.5, f"simhash recall {recall}"


def test_ivf_recall_vs_bruteforce(spark):
    """IVF ANN must recover most true neighbors while probing only
    nprobe/num_centroids of the corpus."""
    from ex9_big_data_gal_drimer_spark.operators.similarity import (
        ivf_cosine_topk,
    )

    emb = table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_cosine_topk(
            emb, queries, dim=64, k=5, num_centroids=8, nprobe=4
        ).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # every reported neighbor carries its EXACT cosine (re-ranked), so
    # reported pairs are a subset of what exhaustive search could rank
    assert all(q < 10 for q, _ in got)


def test_prefix_filter_is_result_identical(spark):
    """Prefix filtering must be a pure candidate optimization: the
    pair set and similarities equal the plain inverted-index form."""
    from ex9_big_data_gal_drimer_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
    )

    docs = table(spark, SF_DIR, "documents")
    plain = sorted(tuple(r) for r in ngram_jaccard_pairs(docs).collect())
    pref = sorted(tuple(r) for r in ngram_jaccard_pairs_prefix(docs).collect())
    assert plain == pref


def test_ann_recall_report_all_methods_above_floor(spark):
    """The monitoring row itself (not just its per-method siblings):
    five methods present, every recall in (0, 1], and the exact-side
    contract — int8 SQ re-ranked on full precision stays ≥0.9."""
    from ex9_big_data_gal_drimer_spark.plans import QUERIES

    rows = {r.method: r.recall_at_5 for r in
            QUERIES["ann_recall_report"](spark, SF_DIR).collect()}
    assert set(rows) == {"lsh", "ivf", "sq", "pq", "ivfpq"}
    assert all(0.0 < v <= 1.0 for v in rows.values()), rows
    assert rows["sq"] >= 0.9, rows


def test_approx_distinct_within_advertised_error(spark):
    """approx_count_distinct(rsd=0.02) vs the exact counts it sits
    next to: within 5% (2.5 sigma of the advertised rsd)."""
    from pyspark.sql import functions as F

    from ex9_big_data_gal_drimer_spark.catalog import load_table
    from ex9_big_data_gal_drimer_spark.plans import QUERIES

    row = QUERIES["approx_distinct_scale_variant"](spark, SF_DIR).collect()[0]
    li = load_table(spark, SF_DIR, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("o"),
        F.countDistinct("l_partkey").alias("p"),
    ).collect()[0]
    assert row.exact_orders == exact.o
    assert abs(row.approx_orders - exact.o) / exact.o < 0.05
    assert abs(row.approx_parts - exact.p) / exact.p < 0.05


def test_levenshtein_staged_topk_equals_exhaustive(spark):
    """The round-9 staged top-k plan (tier-0 equi-join on identical
    names + per-group 51-key trim) must return EXACTLY the exhaustive
    brand-blocked scan's top-50 — the Fagin-style tier skip and the
    domination-based trim are both result-preserving.  Both tiers are
    pinned: sf0.001 has only 9 distance-0 pairs so the registered
    query takes the exhaustive fallback (top-50 includes nonzero
    distances); sf0.01 has ~1.2k distance-0 pairs so it takes the
    fast tier (all-zero top-50) while the inline plan does the full
    quadratic work."""
    from ex9_big_data_gal_drimer_spark.plans import QUERIES

    def exhaustive(sf_dir):
        part = table(spark, sf_dir, "part").select(
            "p_partkey", "p_brand", "p_name"
        )
        a, b = part.alias("a"), part.alias("b")
        dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 8)
        return (
            a.join(
                b,
                (F.col("a.p_brand") == F.col("b.p_brand"))
                & (F.col("a.p_partkey") < F.col("b.p_partkey")),
            )
            .select(
                F.col("a.p_partkey").alias("partkey_a"),
                F.col("b.p_partkey").alias("partkey_b"),
                dist.alias("edit_distance"),
            )
            .filter(
                (F.col("edit_distance") >= 0) & (F.col("edit_distance") <= 8)
            )
            .orderBy("edit_distance", "partkey_a", "partkey_b")
            .limit(50)
            .collect()
        )

    for sf_dir, tier0 in ((SF_DIR, False), ("/root/testdata/sf0.01", True)):
        got = QUERIES["levenshtein_similar_parts"](spark, sf_dir).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in exhaustive(sf_dir)]
        assert len(got) == 50
        assert all(r.edit_distance == 0 for r in got) == tier0
