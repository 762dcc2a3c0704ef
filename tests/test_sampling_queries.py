"""Registered sampling queries: determinism, quotas, and scale shape
(SURVEY.md §2.9 R1/R2 + the fraction-based 100 TB default).
"""

from __future__ import annotations

from ex9_big_data_gal_drimer_spark.plans import QUERIES
from ex9_big_data_gal_drimer_spark.plans.audit import count_exchanges

from conftest import SF_DIR


def _rows(spark, name):
    return [tuple(r) for r in QUERIES[name](spark, SF_DIR).collect()]


def test_seeded_sample_is_deterministic_and_post_agg(spark):
    a = _rows(spark, "seeded_sample_orders")
    b = _rows(spark, "seeded_sample_orders")
    assert sorted(a) == sorted(b), "same seed must give the same sample"
    # exact-n when the aggregate has >= n groups, else all groups
    n_days = (
        QUERIES["seeded_sample_orders"](spark, SF_DIR).sparkSession.read.parquet(
            f"{SF_DIR}/orders.parquet"
        ).select("o_orderdate").distinct().count()
    )
    assert len(a) == min(500, n_days)


def test_stratified_sample_quota_and_determinism(spark):
    a = _rows(spark, "stratified_sample_orders")
    assert sorted(a) == sorted(_rows(spark, "stratified_sample_orders"))
    from collections import Counter

    per = Counter(r[1] for r in a)
    assert len(per) == 5, "expected all five priorities"
    assert all(c <= 100 for c in per.values()), f"quota exceeded: {per}"
    # sf0.001 orders has ~1.5k rows -> every stratum should fill or
    # nearly fill its quota; no stratum may be empty
    assert all(c > 0 for c in per.values())


def test_fraction_sample_is_shuffle_free(spark):
    """sampleBy must stay a map-side pass: no exchange below the final
    count aggregation's shuffle."""
    df = QUERIES["sample_fractions_lineitem"](spark, SF_DIR)
    # the whole query has exactly the one agg shuffle (+AQE final sort
    # may add a single-partition exchange); the SAMPLE itself adds none
    assert count_exchanges(df) <= 2
    a = _rows(spark, "sample_fractions_lineitem")
    assert sorted(a) == sorted(_rows(spark, "sample_fractions_lineitem"))

def test_md5_topn_sample_matches_duckdb(spark, duck):
    """The hash-order twin is bit-identical across engines: same 200
    keys DuckDB selects by the same md5 ordering."""
    got = sorted(_rows(spark, "sample_md5_topn_orders"))
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            SELECT o_orderkey, o_orderpriority, ROUND(o_totalprice, 2)
            FROM (
                SELECT * FROM '{SF_DIR}/orders.parquet'
                ORDER BY md5(CAST(o_orderkey AS VARCHAR)) LIMIT 200
            ) ORDER BY o_orderkey
            """
        ).fetchall()
    )
    assert got == want


def test_md5_stratified_sample_quota_and_determinism(spark):
    from collections import Counter

    a = _rows(spark, "sample_md5_stratified_orders")
    assert a == _rows(spark, "sample_md5_stratified_orders")
    per = Counter(r[1] for r in a)
    assert len(per) == 5 and all(c <= 40 for c in per.values())
    assert all(c > 0 for c in per.values())


def test_md5_topn_plan_is_take_ordered(spark):
    """The scale path must be per-partition top-n (TakeOrderedAndProject),
    not a global sort."""
    df = QUERIES["sample_md5_topn_orders"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
