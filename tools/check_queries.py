#!/usr/bin/env python
"""Spot-check named queries against their DuckDB oracles with the
exact driver-gate semantics (tools/preflight.compare_result — shared
with the window preflight so the two can never diverge).

Usage: python tools/check_queries.py name1 name2 ...  [--sf DIR]
"""

from __future__ import annotations

import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from ex9_big_data_gal_drimer_spark.catalog import TABLES  # noqa: E402
from tools.preflight import compare_result, driver_canon  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf_dir = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1
    spark = (
        SparkSession.builder.master("local[8]").appName("check").getOrCreate()
    )
    import __spark_entry__ as entry_mod

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = 0
    for name in names:
        if name not in queries:
            print(f"?? {name}: not registered")
            bad += 1
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                driver_canon(list(sdf.columns), srows)
                print(f"-- {name}: rows-only, {len(srows)} rows (canon ok)")
                continue
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            verdict, detail = compare_result(
                list(sdf.columns), srows, ocols, orows
            )
            if verdict == "ok":
                print(f"ok {name}: {detail}")
            else:
                print(f"XX {name}: {detail}")
                bad += 1
        except Exception as ex:  # noqa: BLE001
            print(f"XX {name}: ERROR {str(ex)[:300]}")
            bad += 1
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
