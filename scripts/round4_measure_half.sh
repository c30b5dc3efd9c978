#!/bin/sh
# Round-4 phase-2 measurements: FP16S half storage (added after the main
# watcher - scripts/round4_measure_on_recovery.sh - was armed; editing a
# running sh script mid-execution is unsafe, so the additions live here).
#
# Waits for the main battery to finish (/tmp/r4_measure_done) - or, if the
# main watcher is not running, probes the backend itself - then measures:
#   1. f16 half-storage bench with its own autotune sweep -> r4_bench_half.log
#   2. bf16 half-storage bench (cached winner)            -> r4_bench_bf16.log
#   3. on-chip accuracy + speed-ratio check               -> r4_half_check.log
# Run me in the background: sh scripts/round4_measure_half.sh
set -x
cd "$(dirname "$0")/.."
OUT=docs/measurements/r4
mkdir -p "$OUT"

while true; do
    if [ -f /tmp/r4_measure_done ]; then
        break
    fi
    if ! kill -0 "$(cat /tmp/r4_watcher.pid 2>/dev/null)" 2>/dev/null; then
        # main watcher gone: probe the backend ourselves
        if timeout 180 python -c "import jax; d=jax.devices()[0]; assert d.platform != 'cpu', d" \
            > /tmp/r4_half_probe.log 2>&1; then
            break
        fi
    fi
    sleep 240
done

timeout 2400 env TNL_BENCH_HALF=f16 TNL_BENCH_AUTOTUNE=1 python -u bench.py \
    > "$OUT/r4_bench_half.log" 2>&1
timeout 1500 env TNL_BENCH_HALF=bf16 python -u bench.py \
    > "$OUT/r4_bench_bf16.log" 2>&1
timeout 1800 python -u scripts/check_half_tpu.py --n 256 --pairs 5 \
    > "$OUT/r4_half_check.log" 2>&1

# 4. converged duct error with half vs full storage (the accuracy claim
#    that matters: does 16-bit at-rest storage move the steady-state
#    L1/L2 error against the analytic solution?)
timeout 2400 python -u -m tnl_lbm_tpu.apps.sim_2 3 --streaming AA \
    --use-fused --pair-dispatch on --results-dir /tmp/r4_half_acc \
    > "$OUT/r4_duct_full.log" 2>&1
timeout 2400 python -u -m tnl_lbm_tpu.apps.sim_2 3 --storage f16 \
    --results-dir /tmp/r4_half_acc > "$OUT/r4_duct_f16.log" 2>&1
tail -n 1 "$OUT/r4_duct_full.log" "$OUT/r4_duct_f16.log"

date > /tmp/r4_half_done
tail -n 4 "$OUT"/r4_bench_half.log "$OUT"/r4_bench_bf16.log \
    "$OUT"/r4_half_check.log
