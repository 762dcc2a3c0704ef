"""Semantic tests for the round-6 platform/governance tail
(queries_platform2): invariants the DuckDB differential check cannot
express — probability bounds, conservation laws, and the Bloom
filter's no-false-negative guarantee.  Engine-vs-oracle equality is
covered for all four queries by test_oracle_parity's registry sweep.
"""

from __future__ import annotations

import math

import pytest

from ex9_big_data_gal_drimer_spark.plans.queries_platform2 import (
    bloom_filter_fp_audit,
    daily_revenue_autocorr,
    k_anonymity_audit,
    markov_next_event_entropy,
)

from conftest import SF_DIR


def test_k_anonymity_conserves_rows_and_bounds(spark, duck):
    rows = {r["segment"]: r for r in k_anonymity_audit(spark, SF_DIR).collect()}
    n_customers = duck.execute("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert sum(r["n_rows"] for r in rows.values()) == n_customers
    for r in rows.values():
        assert 1 <= r["min_k"]
        assert r["n_singletons"] <= r["n_groups"]
        # singleton rows are a subset of the at-risk rows (k=1 < 5)
        assert r["n_singletons"] <= r["rows_at_risk"] <= r["n_rows"]
        assert 0.0 <= r["pct_at_risk"] <= 100.0


def test_bloom_audit_rates_and_monotonicity(spark):
    rows = {r["m_bits"]: r for r in bloom_filter_fp_audit(spark, SF_DIR).collect()}
    assert set(rows) == {4096, 65536}
    for m, r in rows.items():
        # k=2 hashes over n members set at most 2n distinct bits
        assert r["bits_set"] <= min(2 * r["n_members"], m)
        assert 0.0 <= r["fill_ratio"] <= 1.0
        assert r["n_probes"] == 2000
        assert 0 <= r["n_false_pos"] <= r["n_probes"]
        # the probe range is disjoint from every custkey, so the FP
        # rate is measured purely on true non-members
    # a 16x larger filter can only reduce the false-positive rate
    assert rows[65536]["fp_rate"] <= rows[4096]["fp_rate"]
    # both legs audit the same member/probe sets
    assert rows[65536]["n_members"] == rows[4096]["n_members"]
    assert rows[65536]["n_probes"] == rows[4096]["n_probes"]


def test_bloom_members_have_no_false_negatives(spark):
    """Every member's two bit positions are in the bit set by
    construction — re-deriving membership through the same filter
    must accept 100% of members (the Bloom guarantee)."""
    from pyspark.sql import functions as F

    from ex9_big_data_gal_drimer_spark.catalog import table
    from ex9_big_data_gal_drimer_spark.plans.queries_platform2 import _md5pos

    m = 4096
    members = (
        table(spark, SF_DIR, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    bits = (
        members.select(_md5pos(F.col("c_custkey"), "#1", m).alias("p"))
        .unionAll(members.select(_md5pos(F.col("c_custkey"), "#2", m).alias("p")))
        .distinct()
    )
    accepted = (
        members.select(
            "c_custkey",
            _md5pos(F.col("c_custkey"), "#1", m).alias("p1"),
            _md5pos(F.col("c_custkey"), "#2", m).alias("p2"),
        )
        .join(bits.withColumnRenamed("p", "p1"), "p1", "left_semi")
        .join(bits.withColumnRenamed("p", "p2"), "p2", "left_semi")
        .count()
    )
    assert accepted == members.count()


def test_autocorr_within_pearson_bounds(spark):
    rows = {r["lag"]: r for r in daily_revenue_autocorr(spark, SF_DIR).collect()}
    assert set(rows) == {1, 7}
    n_days_minus = rows[1]["n_pairs"]
    assert rows[7]["n_pairs"] == n_days_minus - 6
    for r in rows.values():
        assert -1.0 <= r["autocorr"] <= 1.0


def test_markov_entropy_bounds(spark):
    rows = markov_next_event_entropy(spark, SF_DIR).collect()
    assert rows, "expected at least one current-event row"
    for r in rows:
        # 0 <= H <= log2(#next symbols), the entropy range
        assert -1e-9 <= r["entropy_bits"] <= math.log2(r["n_next_symbols"]) + 1e-9
        assert r["n_out"] >= r["n_next_symbols"] >= 1


def test_markov_entropy_matches_plain_float_sum(spark):
    """The fold-summed entropy equals a driver-side recomputation from
    raw transition counts (tolerance covers summation-order only)."""
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from ex9_big_data_gal_drimer_spark.catalog import table

    ev = (
        table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    counts: Counter = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    totals: Counter = Counter()
    for (a, _), n in counts.items():
        totals[a] += n
    expected = {}
    for a in totals:
        expected[a] = sum(
            -(n / totals[a]) * math.log2(n / totals[a])
            for (x, _), n in sorted(counts.items())
            if x == a
        )
    got = {r["cur"]: r["entropy_bits"] for r in
           markov_next_event_entropy(spark, SF_DIR).collect()}
    assert set(got) == set(expected)
    for a in expected:
        assert got[a] == pytest.approx(expected[a], abs=5e-4)
