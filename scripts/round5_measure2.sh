#!/bin/sh
# Round-5 battery #2: post-halo-rework measurements.
#
# The in-kernel halo change (commit af31065) shifted the kernel cost
# model (autotune cache keys bumped to pair2|hk5|...), fixed the 512^3
# OOM, and the IBM sparse rework needs its first on-chip numbers.
# Same incremental-commit discipline as round5_measure.sh.
set -x
cd "$(dirname "$0")/.."
OUT=docs/measurements/r5
mkdir -p "$OUT"

commit() {
    for i in 1 2 3 4 5; do
        if git add -A "$OUT" 2>>"$OUT/commit_err.log" \
           && git commit -q -m "$1" -- "$OUT" 2>>"$OUT/commit_err.log"; then
            return 0
        fi
        sleep 7
    done
    echo "commit failed: $1" >> "$OUT/commit_err.log"
}

# 1. fresh f32 autotune sweep against the halo-rework kernel
timeout 3600 env TNL_BENCH_AUTOTUNE=1 python -u bench.py \
    > "$OUT/r5_bench_tuned2.log" 2>&1
cp "$HOME/.cache/tnl_lbm_tpu/autotune.json" "$OUT/autotune_cache.json" 2>/dev/null
commit "r5 measurements: post-halo-rework autotune sweep + tuned bench"

# 2. bf16 half-storage autotuned bench (f16 is Mosaic-rejected, skip it)
timeout 3600 env TNL_BENCH_AUTOTUNE=1 TNL_BENCH_HALF=bf16 python -u bench.py \
    > "$OUT/r5_bench_half_bf16.log" 2>&1
cp "$HOME/.cache/tnl_lbm_tpu/autotune.json" "$OUT/autotune_cache.json" 2>/dev/null
commit "r5 measurements: post-halo-rework bf16 autotuned bench"

# 3. 512^3 single-chip bf16 capacity demo (no-macro, i8 map, in-kernel halos)
timeout 1800 python -u scripts/demo_half_512.py --n 512 --pairs 10 \
    > "$OUT/r5_demo512.log" 2>&1
commit "r5 measurements: 512^3 single-chip bf16 capacity demo"

# 4. IBM at reference scale (VERDICT r4 item 2 'Done' criterion):
#    1e5 points on the 96^3 sphere, original (node-space Gram) + the 32k
#    modified (ELLPACK hat-A) rows that used to take a 206 s dense build
timeout 2400 python -u scripts/make_ibm_performance_tables.py \
    --n 96 --points 100000 --steps 10 --diracs phi2 --methods original \
    > "$OUT/r5_ibm_1e5.log" 2>&1
commit "r5 measurements: IBM 1e5-point rows (sparse rework)"
timeout 1800 python -u scripts/make_ibm_performance_tables.py \
    --n 64 --points 32768 --steps 10 --diracs phi2 --methods modified,original \
    > "$OUT/r5_ibm_32k.log" 2>&1
timeout 1800 python -u scripts/make_ibm_performance_tables.py \
    --n 48 --points 4000 --steps 10 \
    > "$OUT/r5_ibm_4k_all.log" 2>&1
commit "r5 measurements: IBM 32k + full dirac-x-method tables"

# 5. anatomy of the halo-rework kernel (should show the 1.4 ms copy gone)
timeout 1500 python -u scripts/profile_anatomy.py --n 256 --steps 10 \
    --use-fused --streaming AA --outdir /tmp/r5_anatomy3 \
    > "$OUT/r5_anatomy2.log" 2>&1
cp /tmp/r5_anatomy3/anatomy.json "$OUT/r5_anatomy2_summary.json" 2>/dev/null
commit "r5 measurements: trace anatomy after in-kernel halos"

# 6. hooked bench (unchanged path - for the scoreboard's sake)
timeout 2400 python -u scripts/bench_hooked.py --n 256 --calls 20 \
    > "$OUT/r5_bench_hooked2.log" 2>&1
commit "r5 measurements: hooked bench after halo rework"

date > /tmp/r5_measure2_done
tail -n 3 "$OUT"/r5_bench_tuned2.log "$OUT"/r5_bench_half_bf16.log \
    "$OUT"/r5_demo512.log "$OUT"/r5_ibm_1e5.log "$OUT"/r5_ibm_32k.log \
    "$OUT"/r5_anatomy2.log
