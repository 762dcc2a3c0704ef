#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": N, "unit": "sec",
   "queries": {...per-query sec...}, "sf": 0.1}

Timing starts after the SparkSession exists (the JVM+session floor is a
fixed cost the suite amortizes, mirroring the reference's single DuckDB
connection, reference main.py:236); each query is one Spark action on
an already-small result (collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

from ex9_big_data_gal_drimer_spark.plans import QUERIES
from ex9_big_data_gal_drimer_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    spark = get_spark(app_name="ex9-bench")

    times: dict[str, float] = {}
    for name, fn in sorted(QUERIES.items()):
        # BASELINE.md methodology: warm timings (mean of N after one
        # untimed warmup run that pays codegen/classload once).
        fn(spark, sf_dir).collect()
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        times[name] = round(sum(samples) / len(samples), 3)

    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
