"""Planted-table pins for the TPC-H completion set's documented
semantics: Q15's rank()=1 must keep TIES exactly like the oracle's
`= MAX` predicate, and the schema-evolution read must surface NULL
for the late-added column on old-generation rows.
"""

from __future__ import annotations

import datetime

import duckdb

from ex9_big_data_gal_drimer_spark.plans import ORACLES, QUERIES


def test_q15_rank_keeps_ties_like_max(spark, tmp_path):
    """Two suppliers with identical (rounded) window revenue must BOTH
    be returned — rank(), not row_number(), mirrors `= (SELECT MAX)`."""
    ship = datetime.datetime(1997, 2, 1)
    li_rows = [
        # suppliers 1 and 2 tie at 100.00 revenue; supplier 3 trails
        (1, 101, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", ship),
        (2, 102, 2, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", ship),
        (3, 103, 3, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", ship),
    ]
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz",
    )
    # supplier ids must be bigint to match the join
    sup = spark.createDataFrame(
        [(1, "Supplier#1", 0, 0.0), (2, "Supplier#2", 0, 0.0), (3, "Supplier#3", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    sf_dir = str(tmp_path)
    li.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/lineitem.parquet")
    sup.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/supplier.parquet")

    got = QUERIES["tpch_q15_top_supplier"](spark, sf_dir).collect()
    assert sorted(r.s_suppkey for r in got) == [1, 2]  # BOTH tied suppliers
    assert all(r.total_revenue == 100.0 for r in got)

    con = duckdb.connect()
    for t in ("lineitem", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
        )
    want = con.execute(ORACLES["tpch_q15_top_supplier"]).fetchall()
    assert sorted(tuple(r) for r in got) == sorted(want)


def test_schema_evolution_old_rows_surface_null_channel(spark, tmp_path):
    """Rows written before the o_channel column existed must roll up
    under 'pre_channel' (mergeSchema surfaces NULL), and the split is
    exactly the 1998-01-01 generation boundary."""
    rows = [
        (1, 10, "O", 100.0, datetime.datetime(1997, 6, 1), "1-URGENT"),
        (2, 11, "O", 200.0, datetime.datetime(1997, 7, 1), "5-LOW"),
        (3, 12, "O", 300.0, datetime.datetime(1998, 6, 1), "1-URGENT"),
        (4, 13, "O", 400.0, datetime.datetime(1999, 1, 1), "5-LOW"),
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    sf_dir = str(tmp_path)
    orders.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/orders.parquet")

    got = {r.channel: r for r in QUERIES["schema_evolution_scan"](spark, sf_dir).collect()}
    assert got["pre_channel"].n_orders == 2 and got["pre_channel"].revenue == 300.0
    assert got["online"].n_orders == 1 and got["online"].revenue == 300.0
    assert got["store"].n_orders == 1 and got["store"].revenue == 400.0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet/*.parquet'"
    )
    want = con.execute(ORACLES["schema_evolution_scan"]).fetchall()
    assert sorted(tuple(r) for r in got.values()) == sorted(want)
