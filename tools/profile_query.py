#!/usr/bin/env python
"""Per-query profiling harness for optimization round 13.

Usage: python tools/profile_query.py q1 q2 ... [--explain] [--sf DIR]

Replicates bench.py methodology exactly (cached tables, AQE off,
4 shuffle partitions, Arrow collect, warmup + median of 3) for a
subset of queries, optionally dumping .explain("formatted") to
plans/r13/<query>_<tag>.txt.
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ex9_big_data_gal_drimer_spark.catalog import (
    cache_tables,
    release_query_caches,
)
from ex9_big_data_gal_drimer_spark.plans import QUERIES
from ex9_big_data_gal_drimer_spark.plans.registry import ITERATIVE_CONSTRUCTION
from ex9_big_data_gal_drimer_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="ex9-profile")
    spark.conf.set("spark.sql.shuffle.partitions",
                   os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4"))
    spark.conf.set("spark.sql.adaptive.enabled",
                   os.environ.get("SPARK_GRAFT_BENCH_AQE", "false"))
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    t0 = time.perf_counter()
    cache_tables(spark, args.sf)
    print(f"setup {time.perf_counter()-t0:.2f}s", file=sys.stderr)

    def fetch(df):
        return df.toArrow().to_pandas()

    for name in args.names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if args.explain:
            import contextlib
            import io

            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                               "plans", "r13", f"{name}_{args.tag}.txt")
            with open(out, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {out}", file=sys.stderr)
        fetch(fn(spark, args.sf))  # warmup
        samples = []
        jobs = []
        for i in range(args.repeats):
            # bench.py methodology: query-created caches are released
            # before every timed run so their fill cost is charged.
            release_query_caches()
            spark.sparkContext.setJobGroup(f"{name}#{i}", name)
            if name in ITERATIVE_CONSTRUCTION:
                t0 = time.perf_counter()
                fetch(fn(spark, args.sf))
            else:
                df = fn(spark, args.sf)
                t0 = time.perf_counter()
                fetch(df)
            samples.append(time.perf_counter() - t0)
            tracker = spark.sparkContext.statusTracker()
            jobs.append(len(tracker.getJobIdsForGroup(f"{name}#{i}")))
            spark.sparkContext._jsc.clearJobGroup()
        med = statistics.median(samples)
        print(
            f"{name}: median {med:.3f}s  runs={[round(s,3) for s in samples]}"
            f"  jobs/run={jobs}"
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
