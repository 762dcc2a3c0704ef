#!/usr/bin/env python
"""Event-log job/stage attribution for one or more queries.

Usage: python tools/joblog.py q1 [q2 ...] [--runs 2]

Replicates bench.py methodology (cached tables, AQE off, 4 shuffle
partitions, Arrow collect, warmup then timed runs) with the Spark
event log enabled, then prints per-run job timelines: job id, duration,
number of tasks, and the first line of the job's call site — enough to
attribute wall time to actions (collects, broadcast builds, cache
fills) without the history server.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG_DIR = "/tmp/ex9_eventlog"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    os.makedirs(LOG_DIR, exist_ok=True)

    from ex9_big_data_gal_drimer_spark.catalog import cache_tables
    from ex9_big_data_gal_drimer_spark.plans import QUERIES
    from ex9_big_data_gal_drimer_spark.session import get_spark

    spark = get_spark(
        app_name="ex9-joblog",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": LOG_DIR,
            "spark.eventLog.compress": "false",
        },
    )
    spark.conf.set("spark.sql.shuffle.partitions",
                   os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    app_id = spark.sparkContext.applicationId
    cache_tables(spark, args.sf)

    def fetch(df):
        return df.toArrow().to_pandas()

    marks = []  # (name, run, t_start_ms, t_end_ms, wall_s)
    from ex9_big_data_gal_drimer_spark.catalog import release_query_caches

    for name in args.names:
        fn = QUERIES[name]
        fetch(fn(spark, args.sf))  # warmup
        for r in range(args.runs):
            # bench.py methodology: query-created caches are released
            # before every timed run so their fill cost is charged.
            release_query_caches()
            spark.sparkContext.setJobDescription(f"{name}#run{r}")
            t0 = time.time() * 1000
            tw = time.perf_counter()
            fetch(fn(spark, args.sf))
            wall = time.perf_counter() - tw
            marks.append((name, r, t0, time.time() * 1000, wall))
    spark.stop()

    # parse the event log
    path = os.path.join(LOG_DIR, app_id)
    if not os.path.exists(path):
        cands = [
            os.path.join(LOG_DIR, f)
            for f in os.listdir(LOG_DIR)
            if app_id in f
        ]
        path = cands[0] if cands else path
    if os.path.isdir(path):  # rolling event-log layout (eventlog_v2_*)
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if "events" in f
        )
    else:
        parts = [path]
    jobs = {}   # id -> dict
    stages = {}  # id -> dict

    def lines():
        for p in parts:
            with open(p) as fh:
                yield from fh

    for line in lines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": props.get("spark.job.description", ""),
                "callsite": props.get("callSite.short", ""),
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                "ntasks": sum(s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", [])),
            }
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si.get("Stage Name", ""),
                "dur": (si.get("Completion Time", 0) - si.get("Submission Time", 0)),
                "ntasks": si.get("Number of Tasks", 0),
            }

    for name, r, t0, t1, wall in marks:
        print(f"\n=== {name} run{r}: wall {wall:.3f}s ===")
        for jid in sorted(jobs):
            j = jobs[jid]
            if j["start"] >= t0 and j["start"] <= t1:
                dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
                print(f"  job {jid}: {dur:6.3f}s  tasks={j['ntasks']:3d}  {j['callsite'][:60]}")
                for sid in j["stages"]:
                    s = stages.get(sid)
                    if s and s["dur"] > 100:
                        print(f"      stage {sid}: {s['dur']/1000.0:6.3f}s tasks={s['ntasks']:3d}  {s['name'][:70]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
