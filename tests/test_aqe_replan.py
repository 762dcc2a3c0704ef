"""AQE runtime re-planning evidence (SURVEY.md §4 plan guarantees).

Static planning can only see file-size estimates; a filtered
dimension's TRUE size exists only at runtime.  This pins Spark's
adaptive runtime broadcast conversion — the mechanism that rescues
exactly the 100 TB case where a dim table is huge on disk but tiny
after its predicate, so a static planner would shuffle the fact side
for nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.catalog import table

from conftest import SF_DIR


def test_aqe_converts_shuffle_join_to_broadcast_at_runtime(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Disable STATIC broadcast entirely; allow only the ADAPTIVE
        # threshold, so a BroadcastHashJoin in the final plan can have
        # come only from AQE's runtime size observation.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", 10 * 1024 * 1024
        )
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        orders = table(spark, SF_DIR, "orders")
        cust = (
            table(spark, SF_DIR, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .filter(F.col("c_acctbal") > 9000)
        )
        j = (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .count()
        )
        initial = j._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in initial, (
            "static plan already broadcast — dim too small to exercise AQE"
        )
        rows = j.collect()
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "BroadcastHashJoin" in final, (
            "AQE did not convert the shuffle join after observing the "
            "filtered dim's runtime size"
        )
        assert rows and all(r["count"] > 0 for r in rows)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
