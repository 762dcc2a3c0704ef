"""Physical-plan property tests — the scale guarantees, pinned.

These don't run the queries; they assert the PLANS have the shape the
100 TB design requires: no cartesian products anywhere, pruned scans,
pushed filters, shuffle-free bucketed joins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.plans import QUERIES
from ex9_big_data_gal_drimer_spark.plans.audit import (
    count_exchanges,
    has_cartesian,
    pushed_filters,
    scan_read_schemas,
    unpartitioned_window_violations,
)
from ex9_big_data_gal_drimer_spark.sources.bucketed import (
    bucketed_join,
    ingest_bucketed,
)

from conftest import SF_DIR

#: Queries whose tiny broadcast-total / query-side cross joins are
#: intentional (broadcast nested-loop over ≤1-row / ≤10-row sides,
#: never a shuffled cartesian).
BROADCAST_CROSS_OK = {"knn_bruteforce_cosine", "approx_distinct_scale_variant"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_products(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert not has_cartesian(df), f"{name} plans a CartesianProduct"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_unpartitioned_windows_only_above_aggregates(name, spark):
    """SURVEY.md §4: a Window without partitionBy funnels everything to
    one partition — allowed only over post-aggregate (≤ #groups) data."""
    df = QUERIES[name](spark, SF_DIR)
    bad = unpartitioned_window_violations(df)
    assert not bad, f"{name} has unpartitioned window over raw data: {bad}"


#: Iterative algorithms whose fixpoint loop genuinely must run actions
#: at build time (VERDICT r1 / driver contract: "iterative algorithms"
#: are the acknowledged exception to lazy construction).
#: Queries that run actions during CONSTRUCTION by documented design:
#: the CC fixpoint loop, the sketch-store parquet write, and the
#: vectorized top-k's 10-row query-vector collect (ships in the task
#: closure).  bench.py times these including construction.
from ex9_big_data_gal_drimer_spark.plans.registry import (  # noqa: E402
    ITERATIVE_CONSTRUCTION as ITERATIVE_OK,
)


def test_no_action_during_query_construction(spark):
    """Building a registered query must never launch a Spark job
    (VERDICT r1: knn_lsh_cosine probed vector width with .first() at
    plan-build time).  Dimensions/constants come from table contracts,
    not runtime probes.  First build of each query warms the catalog's
    per-table schema memo (one parquet-footer job per table, once per
    session); after that, construction is fully lazy."""
    for name, fn in sorted(QUERIES.items()):
        fn(spark, SF_DIR)  # warm schema memo + any per-query constants
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or ())
    for name, fn in sorted(QUERIES.items()):
        if name in ITERATIVE_OK:
            continue
        fn(spark, SF_DIR)
        after = set(tracker.getJobIdsForGroup(None) or ())
        assert after == before, f"{name} launched Spark job(s) during construction"


def test_column_pruning_reaches_scan(spark):
    df = QUERIES["q1_nation_order_stats"](spark, SF_DIR)
    schemas = scan_read_schemas(df)
    assert schemas, "expected file scans"
    # q1 reads orders through the shared q1/q2/q4/q6 cached base
    # (queries_parity._BASE_COLS): the scan must carry the base's four
    # orders columns and NOTHING else — o_orderstatus and o_orderdate
    # (unused by any of the four sharing queries) must be pruned away.
    orders_scans = [s for s in schemas if "o_orderkey" in s]
    assert orders_scans and all(
        "o_orderstatus" not in s and "o_orderdate" not in s for s in orders_scans
    ), f"orders scan reads unused columns: {orders_scans}"


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["pricing_summary"](spark, SF_DIR)
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), f"no shipdate pushdown: {pushed}"


def test_partition_pruning(spark, tmp_path):
    """Partitioned-parquet writes enable partition pruning: a filter on
    the partition column reads only matching directories (SURVEY.md §4
    'partition pruning ... free if declarative')."""
    from ex9_big_data_gal_drimer_spark.catalog import table
    from ex9_big_data_gal_drimer_spark.plans.audit import formatted_plan

    out = str(tmp_path / "orders_part")
    table(spark, SF_DIR, "orders").write.partitionBy("o_orderstatus").parquet(out)
    df = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = formatted_plan(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and any("o_orderstatus" in l for l in pf), f"no partition pruning: {pf}"
    assert df.count() > 0


def test_bucketed_join_is_shuffle_free(spark):
    ingest_bucketed(spark, SF_DIR, num_buckets=4)
    try:
        joined = bucketed_join(spark)
        assert joined.count() > 0
        n = count_exchanges(joined)
        assert n == 0, f"bucketed join still shuffles ({n} exchanges)"
        # contrast: the same join over plain parquet shuffles
        from ex9_big_data_gal_drimer_spark.catalog import table

        o, c = table(spark, SF_DIR, "orders"), table(spark, SF_DIR, "customer")
        # disable auto-broadcast so the contrast join can't cheat
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plain = o.join(c, o.o_custkey == c.c_custkey)
            assert count_exchanges(plain) >= 2, "expected shuffles on plain join"
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        for t in ("orders_bucketed", "customer_bucketed"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_runtime_bloom_filter_injects(spark):
    """Runtime bloom-filter join pruning (SURVEY.md §4 scale lever):
    when a selective filter sits on the build side of a shuffle join,
    Catalyst injects a bloom-filter semi-filter on the probe side so
    the big scan drops non-joining rows BEFORE the shuffle.  Pinned
    here with the size thresholds lowered to fire at test scale (the
    defaults target multi-GB scans)."""
    from ex9_big_data_gal_drimer_spark.catalog import load_table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF_DIR, "lineitem")
        orders = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower(), "no runtime bloom filter injected"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_bucketed_q21_fact_never_shuffles(spark):
    """tpch_q21_bucketed's contract: with lineitem/orders bucketed on
    the order key, the per-order aggregate and both fact joins consume
    the bucket clustering — the only shuffle exchanges left are the
    supplier-grain rollup and the final sort (≤2), versus ≥3 for the
    plain form with broadcasts disabled."""
    q = QUERIES["tpch_q21_bucketed"](spark, SF_DIR)
    n = count_exchanges(q)
    assert n <= 2, f"bucketed q21 shuffles the fact ({n} exchanges)"
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = QUERIES["tpch_q21_last_shippers"](spark, SF_DIR)
        assert count_exchanges(plain) >= 3, "plain q21 should shuffle the fact"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
