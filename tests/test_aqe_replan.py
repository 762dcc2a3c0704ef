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


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join splitting: a hot join key whose partition dwarfs
    the others is split into parallel sub-partitions at runtime (the
    final plan's SortMergeJoin carries ``skew=true``) — the built-in
    complement to the explicit salted-join operator
    (operators/skew.py), and the mechanism that keeps one hot user /
    hot document from serializing a 1000-executor join."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # force a sort-merge join so there is a shuffle to skew-split
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.shuffle.partitions", "8")

        from pyspark.sql import functions as F

        # 200k rows on ONE key vs ~100 rows on each of 1000 others
        left = spark.range(0, 201_000).select(
            F.when(F.col("id") < 200_000, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") * 2).alias("payload"),
        )
        right = spark.range(0, 2000).select(
            (F.col("id") % 1000).alias("k"),
            F.col("id").alias("r_payload"),
        )
        # NB: a groupBy on the join key downstream would REQUIRE the
        # hash distribution the split breaks, and AQE then refuses to
        # skew-split (by design); the global aggregate has no such
        # distribution requirement
        # sum(payload) keeps the 16-byte rows through the shuffle —
        # count alone lets column pruning shrink the hot partition's
        # (constant-key) shuffle blocks below any realistic threshold
        j = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
        )
        rows = j.collect()
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, (
            "AQE did not mark the hot partition for skew splitting:\n"
            + final[:1500]
        )
        # correctness unchanged by the split: every left row matches
        # its key's two right-side copies
        assert rows[0].n == 201_000 * 2
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
