#!/bin/sh
# Round-5 TPU measurement battery (VERDICT r4 items 1, 3, 5).
#
# Round-4 lessons baked in:
#   - every artifact is written into the repo AND git-committed the
#     moment it lands (r4 lost the battery's tail to an uncommitted
#     working tree),
#   - the golden sweep runs IN-PROCESS with an incrementally-flushed CSV
#     (r4's subprocess sweep completed 1/108 rows, all compile time, and
#     wrote nothing),
#   - the autotune sweep's per-candidate table (including WHY candidates
#     failed) is copied into the repo (r4 left it in ~/.cache).
#
# Run me in the background from the repo root:
#   sh scripts/round5_measure.sh
set -x
cd "$(dirname "$0")/.."
OUT=docs/measurements/r5
mkdir -p "$OUT"

# serialize git index access against the interactive session
commit() {
    # pathspec-limited commit: never sweeps up the interactive session's
    # staged work; retries ride out index.lock contention
    for i in 1 2 3 4 5; do
        if git add -A "$OUT" tests/golden 2>>"$OUT/commit_err.log" \
           && git commit -q -m "$1" -- "$OUT" tests/golden 2>>"$OUT/commit_err.log"; then
            return 0
        fi
        sleep 7
    done
    echo "commit failed: $1" >> "$OUT/commit_err.log"
}

# tunnel probe (fail fast if it dropped since launch)
if ! timeout 240 python -c "import jax; d=jax.devices()[0]; assert d.platform != 'cpu', d" \
    > "$OUT/r5_probe.log" 2>&1; then
    date > "$OUT/tunnel_down_at.txt"
    commit "r5 battery: tunnel down at launch"
    exit 1
fi
date > "$OUT/started_at.txt"

# 1. headline (adopts the r4-cached autotune winner for this chip)
timeout 1500 python -u bench.py > "$OUT/r5_bench.log" 2>&1
commit "r5 measurements: headline bench"

# 2. fresh autotune sweep incl. traffic variants; persist the
#    per-candidate table (now records failure reasons) into the repo
timeout 3600 env TNL_BENCH_AUTOTUNE=1 python -u bench.py \
    > "$OUT/r5_bench_tuned.log" 2>&1
cp "$HOME/.cache/tnl_lbm_tpu/autotune.json" "$OUT/autotune_cache.json" 2>/dev/null
commit "r5 measurements: autotuned bench + per-candidate sweep table"

# 3. trace anatomy of the production pair2 on the real chip
#    (r4's attempt died on a sys.path bug; the shim is in place and
#    tests/test_scripts_smoke.py imports every script CLI)
timeout 1500 python -u scripts/profile_anatomy.py --n 256 --steps 10 \
    --use-fused --streaming AA --outdir /tmp/r5_anatomy \
    > "$OUT/r5_anatomy.log" 2>&1
cp /tmp/r5_anatomy/anatomy.json "$OUT/r5_anatomy_summary.json" 2>/dev/null
commit "r5 measurements: real-chip pair2 trace anatomy"

# 4. FP16S on chip: accuracy envelope + speed ratio at 256^3, autotuned
#    half benches, and the 512^3-on-one-chip capacity demo
timeout 1800 python -u scripts/check_half_tpu.py --n 256 --pairs 5 \
    > "$OUT/r5_half_check.log" 2>&1
commit "r5 measurements: FP16S on-chip accuracy + speed ratio"
timeout 3600 env TNL_BENCH_AUTOTUNE=1 TNL_BENCH_HALF=f16 python -u bench.py \
    > "$OUT/r5_bench_half_f16.log" 2>&1
timeout 2400 env TNL_BENCH_AUTOTUNE=1 TNL_BENCH_HALF=bf16 python -u bench.py \
    > "$OUT/r5_bench_half_bf16.log" 2>&1
cp "$HOME/.cache/tnl_lbm_tpu/autotune.json" "$OUT/autotune_cache.json" 2>/dev/null
timeout 1800 python -u scripts/demo_half_512.py --n 512 --pairs 10 \
    > "$OUT/r5_demo512.log" 2>&1
commit "r5 measurements: FP16S autotuned benches + 512^3 single-chip demo"

# 5. hooked (non-Newtonian) bench
timeout 2400 python -u scripts/bench_hooked.py --n 256 --calls 20 \
    > "$OUT/r5_bench_hooked.log" 2>&1
commit "r5 measurements: hooked non-Newtonian bench"

# 6. full 54x2 golden sweep, IN-PROCESS (one compile serves every row),
#    CSV flushed row-by-row; commit the partial CSV every ~3 minutes in
#    the background so even a killed sweep leaves committed rows
python scripts/make_golden_geometries.py /tmp/r5_golden_geos \
    > "$OUT/r5_golden_gen.log" 2>&1
(
    while [ ! -f /tmp/r5_golden_done ]; do
        sleep 180
        if [ -f "$OUT/r5_golden.csv" ]; then
            commit "r5 measurements: golden sweep progress ($(wc -l < "$OUT/r5_golden.csv") rows)"
        fi
    done
) &
CSVWATCH=$!
timeout 10000 python -u scripts/run_all_geometries.py /tmp/r5_golden_geos \
    --in-process --final-time 0.4 --run-root /tmp/r5_golden_runs \
    --csv "$OUT/r5_golden.csv" > "$OUT/r5_golden.log" 2>&1
touch /tmp/r5_golden_done
wait $CSVWATCH 2>/dev/null
# adopt as the committed golden corpus when the sweep completed (109 = header + 108)
if [ "$(wc -l < "$OUT/r5_golden.csv")" -ge 109 ]; then
    cp "$OUT/r5_golden.csv" tests/golden/geometry_ke_values_tpu.csv
fi
commit "r5 measurements: full 108-row TPU golden sweep"

date > /tmp/r5_measure_done
tail -n 3 "$OUT"/r5_bench.log "$OUT"/r5_bench_tuned.log "$OUT"/r5_anatomy.log \
    "$OUT"/r5_half_check.log "$OUT"/r5_demo512.log "$OUT"/r5_bench_hooked.log \
    "$OUT"/r5_golden.log
