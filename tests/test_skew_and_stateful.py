"""Salted-join equivalence + custom stateful streaming operator."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.catalog import table
from ex9_big_data_gal_drimer_spark.operators.skew import salted_join
from ex9_big_data_gal_drimer_spark.streaming.stateful import running_user_totals
from ex9_big_data_gal_drimer_spark.streaming.windows import read_events_stream

from conftest import SF_DIR


def test_salted_join_equals_plain_join(spark):
    orders = table(spark, SF_DIR, "orders")
    customer = table(spark, SF_DIR, "customer")
    plain = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s"))
    )
    salted = (
        salted_join(orders, customer, "o_custkey", "c_custkey", num_salts=8,
                    salt_from="o_orderkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    # one hot key dominating the fact side
    fact = spark.range(10000).select(
        F.lit(1).alias("k"), F.col("id").alias("row_id")
    )
    dim = spark.createDataFrame([(1, "hot")], "k long, name string")
    out = salted_join(fact, dim, "k", "k", num_salts=8, salt_from="row_id")
    assert out.count() == 10000
    # the salt actually spreads: >1 distinct salt bucket was used
    from ex9_big_data_gal_drimer_spark.operators.skew import with_salt

    n_buckets = (
        with_salt(fact, "row_id", 8).select("__salt").distinct().count()
    )
    assert n_buckets == 8


def test_running_user_totals_stream_matches_batch(spark, tmp_path):
    d = tmp_path / "events"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    stream = read_events_stream(spark, str(d))
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            # update mode emits one row per (batch, user); keep the last
            "SELECT * FROM t_state"
        ).collect()
    }
    batch = {
        r.user_id: (r.n_events, r.total_value)
        for r in running_user_totals(table(spark, SF_DIR, "events")).collect()
    }
    # with maxFilesPerTrigger=1 and one file there is a single batch, so
    # the memory sink holds exactly the final state per user
    assert got == batch
