"""Semantic tests for the round-7 observability/governance tranche
(queries_platform3): conservation laws, probability/error bounds, and
formula cross-checks the DuckDB differential sweep cannot express.
Engine-vs-oracle equality for all ten queries is covered by
test_oracle_parity's registry sweep."""

from __future__ import annotations

import pytest

from ex9_big_data_gal_drimer_spark.plans.queries_platform3 import (
    _DP_MAX_ORDERS,
    corpus_novelty_curve,
    cross_source_fingerprint_overlap,
    dow_seasonality_index,
    dp_clipping_audit,
    event_interarrival_profile,
    ivf_cell_balance_audit,
    join_cardinality_audit,
    l_diversity_audit,
    sq_quantization_error_audit,
    table_stats_profile,
)

from conftest import SF_DIR


def test_l_diversity_conservation_and_bounds(spark, duck):
    rows = l_diversity_audit(spark, SF_DIR).collect()
    n_customers, n_segments = duck.execute(
        "SELECT COUNT(*), COUNT(DISTINCT c_mktsegment) FROM customer"
    ).fetchone()
    assert sum(r["n_rows"] for r in rows) == n_customers
    for r in rows:
        # l is a distinct count over a nonempty group, capped by the
        # sensitive-attribute domain
        assert 1 <= r["min_l"] <= n_segments
        assert r["n_homogeneous"] <= r["n_groups"]
        assert r["rows_at_risk"] <= r["n_rows"]
        assert 0.0 <= r["pct_at_risk"] <= 100.0


def test_dp_clipping_conservation_and_caps(spark, duck):
    rows = dp_clipping_audit(spark, SF_DIR).collect()
    n_buyers = duck.execute(
        "SELECT COUNT(DISTINCT o_custkey) FROM orders"
    ).fetchone()[0]
    assert sum(r["n_users"] for r in rows) == n_buyers
    for r in rows:
        assert r["clipped_orders"] <= r["raw_orders"]
        # the clipped total respects the per-user cap exactly
        assert r["clipped_orders"] <= r["n_users"] * _DP_MAX_ORDERS
        assert 0 <= r["n_users_clipped"] <= r["n_users"]
        assert 0.0 <= r["orders_bias_pct"] <= 100.0
        assert 0.0 <= r["spend_bias_pct"] <= 100.0


def test_table_stats_bounds_match_catalog(spark, duck):
    rows = table_stats_profile(spark, SF_DIR).collect()
    assert len(rows) == 9
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_rows"]
        assert 0 <= r["n_nulls"] <= r["n_rows"]
    by_table = {r["table_name"]: r["n_rows"] for r in rows}
    for t in ("orders", "customer", "documents", "events"):
        expect = duck.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
        assert by_table[t] == expect


def test_join_cardinality_fk_joins_are_exact(spark, duck):
    """Both audited joins are FK joins in this schema, so the actual
    output equals the fact side and the NDV estimate reproduces it
    exactly — est_over_actual must be 1 (the drift-free baseline the
    audit alerts against)."""
    rows = {r["join_name"]: r for r in join_cardinality_audit(spark, SF_DIR).collect()}
    n_li = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    n_o = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    assert rows["orders_x_lineitem"]["actual_rows"] == n_li
    assert rows["customer_x_orders"]["actual_rows"] == n_o
    for r in rows.values():
        # est = |R||S|/max(ndv): recompute driver-side
        est = (r["n_left"] * r["n_right"]) // max(r["ndv_left"], r["ndv_right"])
        assert r["est_rows"] == est
        assert r["est_over_actual"] == pytest.approx(
            r["est_rows"] / r["actual_rows"], abs=1e-6
        )


def test_dow_seasonality_weighted_mean_is_one(spark, duck):
    rows = dow_seasonality_index(spark, SF_DIR).collect()
    assert {r["dow"] for r in rows} <= set(range(7))
    n_dates = duck.execute(
        "SELECT COUNT(DISTINCT o_orderdate) FROM orders"
    ).fetchone()[0]
    tot_days = sum(r["n_days"] for r in rows)
    assert tot_days == n_dates
    # the day-weighted mean of a multiplicative seasonal index is 1
    weighted = sum(r["seasonality_index"] * r["n_days"] for r in rows) / tot_days
    assert weighted == pytest.approx(1.0, abs=1e-3)


def test_interarrival_percentiles_ordered_and_conserved(spark, duck):
    rows = event_interarrival_profile(spark, SF_DIR).collect()
    n_events, n_users = duck.execute(
        "SELECT COUNT(*), COUNT(DISTINCT user_id) FROM events"
    ).fetchone()
    # each user's first event has no predecessor: gaps = events - users
    assert sum(r["n_gaps"] for r in rows) == n_events - n_users
    for r in rows:
        assert 0 <= r["p50_s"] <= r["p90_s"] <= r["p99_s"] <= r["max_gap_s"]


def test_ivf_cell_balance_partitions_the_corpus(spark, duck):
    rows = ivf_cell_balance_audit(spark, SF_DIR).collect()
    n_vecs = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    assert sum(r["n_vecs"] for r in rows) == n_vecs  # assignment is total
    assert len(rows) <= 8 and all(0 <= r["c_id"] < 8 for r in rows)
    assert sum(r["share_pct"] for r in rows) == pytest.approx(100.0, abs=0.01)
    # load_factor_i = n_i * 8 / N, so the loads always sum to the
    # layout k — even when some cells are empty (their missing rows
    # are exactly what inflates the others)
    assert sum(r["load_factor"] for r in rows) == pytest.approx(8.0, abs=0.01)
    assert all(r["load_factor"] > 0 for r in rows)


def test_sq_error_within_analytic_bounds(spark):
    """int8 SQ on values in [-1, 1] has per-coordinate error at most
    1/(2*127); MSE at most that squared."""
    rows = sq_quantization_error_audit(spark, SF_DIR).collect()
    half_step_milli = 1000.0 / (2 * 127)
    for r in rows:
        assert 0.0 <= r["max_abs_err_milli"] <= half_step_milli + 1e-9
        assert 0.0 <= r["min_mse_ppm"] <= r["max_mse_ppm"]
        assert r["max_mse_ppm"] <= (half_step_milli ** 2) + 1e-9  # ppm vs milli^2: same 1e-6 scale


def test_novelty_curve_conserves_distincts(spark, duck):
    rows = corpus_novelty_curve(spark, SF_DIR).collect()
    n_docs, n_exact, n_fp = duck.execute(
        """SELECT COUNT(*), COUNT(DISTINCT md5(text)),
                  COUNT(DISTINCT md5(array_to_string(
                      list_slice(string_split(LOWER(text), ' '), 1, 2), ' ')))
           FROM documents"""
    ).fetchone()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # every distinct hash is first-seen in exactly one batch
    assert sum(r["n_new_exact"] for r in rows) == n_exact
    assert sum(r["n_new_fp"] for r in rows) == n_fp
    for r in rows:
        # the fingerprint is coarser than the exact hash
        assert 0 <= r["n_new_fp"] <= r["n_new_exact"] <= r["n_docs"]
        assert 0.0 <= r["fp_novelty_pct"] <= 100.0
        assert 0.0 <= r["cum_fp_novelty_pct"] <= 100.0


def test_cross_source_overlap_is_upper_triangle(spark):
    rows = cross_source_fingerprint_overlap(spark, SF_DIR).collect()
    assert rows, "template fingerprints must collide across sources"
    seen = set()
    for r in rows:
        assert r["source_a"] < r["source_b"]  # each pair reported once
        assert (r["source_a"], r["source_b"]) not in seen
        seen.add((r["source_a"], r["source_b"]))
        assert r["n_shared_fp"] >= 1
        assert 0.0 < r["pct_of_smaller"] <= 100.0
