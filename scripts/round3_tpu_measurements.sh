#!/bin/sh
# Round-3 pending TPU measurements (run when the axon tunnel is up):
#   1. hooked non-Newtonian pipeline bench (VERDICT item 2 target >= 650 MLUPS)
#   2. IBM large-cloud (1e5 points) performance rows (VERDICT item 9)
#   3. headline bench.py re-confirmation
# Each writes a log under /tmp; transfer the numbers into
# docs/PERFORMANCE.md "Round 3 measurements".
set -x
cd "$(dirname "$0")/.."
timeout 2400 python -u scripts/bench_hooked.py --n 256 --calls 20 \
    > /tmp/r3_bench_hooked.log 2>&1
timeout 1800 python -u scripts/make_ibm_performance_tables.py \
    --n 96 --points 100000 --steps 5 --diracs phi2 --methods original \
    > /tmp/r3_ibm_1e5.log 2>&1
timeout 1200 python -u scripts/make_ibm_performance_tables.py \
    --n 64 --points 32768 --steps 5 --diracs phi2 --methods modified,original \
    > /tmp/r3_ibm_32k.log 2>&1
timeout 1200 python -u bench.py > /tmp/r3_bench.log 2>&1
tail -n 5 /tmp/r3_bench_hooked.log /tmp/r3_ibm_1e5.log /tmp/r3_ibm_32k.log /tmp/r3_bench.log
