#!/bin/bash
# Late-round-10 artifact refresh after queries_analytics6.py landed
# (registry 227 -> 230).  Same legs as close_round.sh MINUS the DuckDB
# baseline: the three additions are rows-only with STAGED oracles, so
# the registered oracle set — the baseline's input — is unchanged.
# Run sequentially; nothing else may touch Spark while this runs.
set -e
cd "$(dirname "$0")/.."
R=r10
echo "=== bench sf0.1 -> BENCH_FULL_${R}.json ==="
SPARK_GRAFT_BENCH_OUT=BENCH_FULL_${R}.json python bench.py > /tmp/bench_${R}.json
echo "=== shuffle audit -> SHUFFLE_${R}.json ==="
python tools/shuffle_audit.py /root/testdata/sf0.1 SHUFFLE_${R}.json
echo "=== sf1 shuffle audit -> SHUFFLE_sf1_${R}.json ==="
python tools/shuffle_audit.py data/sf1 SHUFFLE_sf1_${R}.json
echo "=== full-registry preflight -> CORRECTNESS_LOCAL_${R}.json ==="
python tools/preflight.py /root/testdata/sf0.01 999 CORRECTNESS_LOCAL_${R}.json
echo "=== vintage gate ==="
python tools/preflight.py --check-vintage
echo "=== scaling benches ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_BENCH_OUT=SCALING_sf0_001.json python bench.py > /tmp/scaling_001_${R}.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_BENCH_OUT=SCALING_sf0_01.json python bench.py > /tmp/scaling_01_${R}.json
SPARK_DRIVER_MEMORY=16g SPARK_GRAFT_SF_DIR=data/sf1 SPARK_GRAFT_BENCH_OUT=SCALING_sf1.json python bench.py > /tmp/scaling_1_${R}.json
echo "=== summary + consistency gate ==="
python tools/summarize_artifacts.py ${R}
echo "=== RECHAIN DONE ==="
