#!/usr/bin/env python
"""Measure the DuckDB same-sf baseline: run every registered oracle
SQL in-process over views on the sf parquet and record warm medians.

This produces DUCKDB_SF01.json — the concrete numbers BASELINE.md's
"within 2× at the same sf" bar is graded against (the reference
publishes no timings; its engine IS DuckDB, so DuckDB on identical
input is the faithful stand-in).

Usage: python tools/duckdb_baseline.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import duckdb

sys.path.insert(0, ".")
from ex9_big_data_gal_drimer_spark.catalog import TABLES  # noqa: E402
from ex9_big_data_gal_drimer_spark.plans import ORACLES  # noqa: E402

REPEATS = 3


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "DUCKDB_SF01.json"
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    times: dict[str, float] = {}
    for name, sql in sorted(ORACLES.items()):
        con.execute(sql).fetchall()  # warm (IO cache, plan)
        samples = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            samples.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(samples), 4)
        print(f"{times[name]:9.4f}  {name}", file=sys.stderr)

    out = {
        "engine": "duckdb",
        "threads": 32,
        "sf": sf,
        "method": f"warm median of {REPEATS}, in-proc, views over parquet",
        "suite_seconds": round(sum(times.values()), 3),
        "queries": times,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"suite_seconds": out["suite_seconds"], "n": len(times)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
