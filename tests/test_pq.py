"""Product Quantization ANN tests (operators/pq.py): compression
contract, determinism, and recall against the exact brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.catalog import table
from ex9_big_data_gal_drimer_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_fit,
)
from ex9_big_data_gal_drimer_spark.plans import QUERIES

from conftest import SF_DIR

DIM, M, NCODES = 64, 16, 256


def _emb(spark):
    return table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def test_pq_codes_compress_and_are_deterministic(spark):
    emb = _emb(spark)
    books = pq_fit(emb, DIM, m=M, k=NCODES)
    assert len(books) == M and all(len(b) == NCODES for b in books)
    assert all(len(c) == DIM // M for b in books for c in b)
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
    assert len(codes) == emb.count()
    assert all(
        len(cs) == M and all(0 <= c < NCODES for c in cs)
        for cs in codes.values()
    )
    again = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, pq_fit(emb, DIM, m=M, k=NCODES)).collect()
    }
    assert again == codes  # hash-ordered sample init → same model


def test_pq_adc_recall_vs_bruteforce(spark):
    """Re-ranked PQ top-5 must recover a solid majority of the exact
    top-5 (weakly clustered corpus; rerank_factor=4 candidates are
    exact-cosine re-ranked, so errors come only from ADC's candidate
    proposal)."""
    from ex9_big_data_gal_drimer_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    exact = brute_force_topk(emb, queries, k=5)
    approx = pq_adc_topk(emb, queries, dim=DIM, m=M, k=5, rerank_factor=4)

    def by_query(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    e, a = by_query(exact), by_query(approx)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.7, f"PQ recall too low: {mean_recall}"


def test_pq_query_shape(spark):
    df = QUERIES["knn_pq_adc"](spark, SF_DIR)
    rows = df.collect()
    assert df.columns == ["query_id", "neighbor_id", "sim", "rnk"]
    assert len(rows) == 50  # 10 queries × top-5
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_ivfpq_recall_and_shape(spark):
    """IVF routing on top of PQ may only LOSE candidates the probes
    miss; with nprobe=half the lists plus exact re-rank, recall vs
    brute force must stay useful and the output shape must match the
    other knn tiers."""
    from ex9_big_data_gal_drimer_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    exact = brute_force_topk(emb, queries, k=5)
    got = QUERIES["knn_ivfpq_cosine"](spark, SF_DIR)
    rows = got.collect()
    assert got.columns == ["query_id", "neighbor_id", "sim", "rnk"]
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(per_q) == 10 and all(len(v) == 5 for v in per_q.values())
    e: dict = {}
    for r in exact.collect():
        e.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(e[q] & per_q.get(q, set())) / len(e[q]) for q in e]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.4, f"IVF-PQ recall too low: {mean_recall}"
