#!/bin/sh
# Round-5 battery #3: the items battery #2 never reached before the
# snapshot (it stopped after the 512^3 demo started): on-chip IBM rows
# for the sparse rework (VERDICT r4 item 2 "Done" criterion), trace
# anatomy of the halo-rework kernel, a completed 512^3 demo, and the
# hooked bench for the scoreboard. Incremental commits throughout.
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

# 1. IBM at reference scale: 1e5 points (round-4 number to beat: 16.5 s/step)
timeout 2400 python -u scripts/make_ibm_performance_tables.py \
    --n 96 --points 100000 --steps 10 --diracs phi2 --methods original \
    > "$OUT/r5_ibm_1e5.log" 2>&1
commit "r5 measurements: IBM 1e5-point rows (sparse rework)"

# 2. IBM 32k (round-4: 206 s dense build, 193 ms/step) + small full table
timeout 1800 python -u scripts/make_ibm_performance_tables.py \
    --n 64 --points 32768 --steps 10 --diracs phi2 --methods modified,original \
    > "$OUT/r5_ibm_32k.log" 2>&1
commit "r5 measurements: IBM 32k rows (sparse rework)"
timeout 1800 python -u scripts/make_ibm_performance_tables.py \
    --n 48 --points 4000 --steps 10 \
    > "$OUT/r5_ibm_4k_all.log" 2>&1
commit "r5 measurements: IBM full dirac-x-method table at 4k"

# 3. anatomy of the halo-rework kernel (expect the ~12 ms DUS/slice halo
#    ops from r5_anatomy_summary.json to be gone)
timeout 1500 python -u scripts/profile_anatomy.py --n 256 --steps 10 \
    --use-fused --streaming AA --outdir /tmp/r5_anatomy3 \
    > "$OUT/r5_anatomy2.log" 2>&1
cp /tmp/r5_anatomy3/anatomy.json "$OUT/r5_anatomy2_summary.json" 2>/dev/null
commit "r5 measurements: trace anatomy after in-kernel halos"

# 4. 512^3 single-chip bf16 capacity demo, to completion this time
timeout 1800 python -u scripts/demo_half_512.py --n 512 --pairs 10 \
    > "$OUT/r5_demo512.log" 2>&1
commit "r5 measurements: 512^3 single-chip bf16 capacity demo (complete)"

# 5. hooked bench after halo rework (scoreboard)
timeout 2400 python -u scripts/bench_hooked.py --n 256 --calls 20 \
    > "$OUT/r5_bench_hooked2.log" 2>&1
commit "r5 measurements: hooked bench after halo rework"

date > /tmp/r5_measure3_done
tail -n 3 "$OUT"/r5_ibm_1e5.log "$OUT"/r5_ibm_32k.log \
    "$OUT"/r5_ibm_4k_all.log "$OUT"/r5_anatomy2.log \
    "$OUT"/r5_demo512.log "$OUT"/r5_bench_hooked2.log
