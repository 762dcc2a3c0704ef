#!/usr/bin/env python
"""Spot-check named queries against their DuckDB oracles with the
driver-style canon (tools/preflight.driver_canon).

Usage: python tools/check_queries.py name1 name2 ...  [--sf DIR]
"""

from __future__ import annotations

import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from ex9_big_data_gal_drimer_spark.catalog import TABLES  # noqa: E402
from tools.preflight import _values_equal, driver_canon  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
    spark = (
        SparkSession.builder.master("local[8]").appName("check").getOrCreate()
    )
    import __spark_entry__ as entry_mod

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = 0
    for name in args:
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
            if sorted(sdf.columns) != sorted(ocols):
                print(f"XX {name}: schema {sorted(sdf.columns)} vs {sorted(ocols)}")
                bad += 1
                continue
            s = driver_canon(list(sdf.columns), srows)
            o = driver_canon(list(ocols), [tuple(r) for r in orows])
            if len(s) != len(o):
                print(f"XX {name}: rows {len(s)} vs {len(o)}")
                bad += 1
                continue
            mism = [
                (x, y)
                for x, y in zip(s, o)
                if not all(_values_equal(a, b) for a, b in zip(x, y))
            ]
            if mism:
                print(f"XX {name}: {len(mism)} mismatched rows; e.g. {mism[0]}")
                bad += 1
            else:
                print(f"ok {name}: {len(s)} rows")
        except Exception as ex:  # noqa: BLE001
            print(f"XX {name}: ERROR {str(ex)[:300]}")
            bad += 1
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
