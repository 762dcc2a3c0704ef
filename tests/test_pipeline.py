"""Pipeline tests: materialize→sample→export chain (SURVEY.md §5).

Asserts the reference's pipeline invariants: sample rowcount =
min(500, |result|), schema equality between result and sample tables,
seed determinism across reruns, SQLite export round-trip.
"""

from __future__ import annotations

import os
import sqlite3

import pytest

from ex9_big_data_gal_drimer_spark.catalog import table
from ex9_big_data_gal_drimer_spark.operators.sampling import (
    sample_by_fractions,
    seeded_sample_n,
    stratified_sample,
)
from ex9_big_data_gal_drimer_spark.pipeline import (
    export_samples_to_sqlite,
    generate_documentation,
    materialize_query,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def materialized(spark):
    orders = table(spark, SF_DIR, "orders")
    results_t, sample_t = materialize_query(spark, "test_orders", orders)
    yield results_t, sample_t
    spark.sql(f"DROP TABLE IF EXISTS {results_t}")
    spark.sql(f"DROP TABLE IF EXISTS {sample_t}")


def test_materialize_counts_and_schema(spark, materialized):
    results_t, sample_t = materialized
    orders = table(spark, SF_DIR, "orders")
    full = spark.table(results_t)
    sample = spark.table(sample_t)
    assert full.count() == orders.count()
    assert sample.count() == min(500, orders.count())
    assert full.schema == sample.schema


def test_seeded_sample_determinism(spark):
    orders = table(spark, SF_DIR, "orders")
    a = sorted(r.o_orderkey for r in seeded_sample_n(orders, 100, seed=7).collect())
    b = sorted(r.o_orderkey for r in seeded_sample_n(orders, 100, seed=7).collect())
    c = sorted(r.o_orderkey for r in seeded_sample_n(orders, 100, seed=8).collect())
    assert a == b, "same seed must give the same sample"
    assert a != c, "different seeds should differ"
    assert len(a) == 100


def test_stratified_sample_quota(spark):
    orders = table(spark, SF_DIR, "orders")
    sample = stratified_sample(orders, ["o_orderstatus"], 50, seed=42)
    counts = {
        r.o_orderstatus: r["count"]
        for r in sample.groupBy("o_orderstatus").count().collect()
    }
    full_counts = {
        r.o_orderstatus: r["count"]
        for r in orders.groupBy("o_orderstatus").count().collect()
    }
    for status, n in counts.items():
        assert n == min(50, full_counts[status])


def test_sample_by_fractions(spark):
    orders = table(spark, SF_DIR, "orders")
    sample = sample_by_fractions(orders, "o_orderstatus", {"F": 0.1, "O": 0.1}, seed=42)
    # P status never sampled; fractions approximate
    statuses = {r.o_orderstatus for r in sample.select("o_orderstatus").distinct().collect()}
    assert "P" not in statuses


def test_sqlite_export_roundtrip(spark, materialized, tmp_path):
    _, sample_t = materialized
    db = str(tmp_path / "serve.db")
    exported = export_samples_to_sqlite(spark, db)
    assert sample_t in exported
    with sqlite3.connect(db) as conn:
        n = conn.execute(f"SELECT COUNT(*) FROM {sample_t}").fetchone()[0]
    assert n == spark.table(sample_t).count()


def test_documentation(spark, materialized, tmp_path):
    out = generate_documentation(spark, str(tmp_path / "docs.md"))
    text = open(out).read()
    assert "test_orders_results" in text
    assert "o_orderkey" in text


def test_materialize_observed_metrics(spark, tmp_path):
    """Write-time Observation: the row count arrives with the write
    action (no second scan) and matches the materialized table."""
    from ex9_big_data_gal_drimer_spark.catalog import load_table
    from ex9_big_data_gal_drimer_spark.pipeline import materialize_query

    from conftest import SF_DIR

    nation = load_table(spark, SF_DIR, "nation")
    metrics: dict = {}
    results_t, sample_t = materialize_query(
        spark, "test_obs_nation", nation, metrics=metrics
    )
    try:
        assert metrics["rows"] == spark.table(results_t).count() == 25
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {results_t}")
        spark.sql(f"DROP TABLE IF EXISTS {sample_t}")
