"""Headline benchmark: MLUPS/chip for D3Q27 cumulant DNS.

Replicates the reference's GLUPS accounting: LUPS = X*Y*Z * iterations /
compute_time with the kernel-only timer (reference: state.hpp:1302-1309,
BASELINE.md "GLUPS formula").  Config matches BASELINE.json: 256^3 square
duct, D3Q27 well-conditioned cumulant collision, float32, A-A in-place
streaming (reference streaming_AA.h) via the one-kernel Pallas pair
(tnl_lbm_tpu/kernels/fused_aa.py:make_fused_pair2_aa):

- one windowed 2-halo read per tile, even (same-site) cascade on the
  consumed y-band, odd pull+collide+push on its 1-halo ring entirely in
  VMEM, one interior write - the intermediate field never touches HBM,
- K-slot cross-program prefetch overlaps input DMA, compute and output
  DMA across the whole grid,
- no in/out buffer aliasing: aliasing a Pallas kernel's output onto its
  input HBM buffer costs ~1.8x bandwidth on v5e (fused_aa.py docstring).

Fallback chain: pair2 -> two-kernel pair (make_fused_pair_aa) -> XLA
step; each compile-probed so a Mosaic regression falls through loudly
(stderr) rather than silently posting the slow path's number.

Baseline derivation (the reference repo publishes no absolute numbers -
BASELINE.md): published TNL-LBM-class single-GPU throughput for the D3Q27
cumulant kernel is ~1.9 GLUPS on an A100 (HBM-bandwidth-bound at ~2 TB/s,
~230 B/site/step effective).  Scaling by memory bandwidth to this TPU chip
(v5e, ~0.82 TB/s) gives ~1000 MLUPS as the per-chip parity target:
vs_baseline = MLUPS / 1000.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

BASELINE_MLUPS = 1000.0


def _backend_responsive(timeout_s: int = 180) -> bool:
    """Probe backend init in a SUBPROCESS with a hard timeout: when the
    axon TPU tunnel is down, jax.devices() blocks for tens of minutes
    before failing - the bench must fail fast with an honest JSON line
    instead (round-3 outage: tunnel unavailable for 10+ hours)."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # bounded retry: a flapping tunnel at measurement time should not zero
    # the scoreboard - probe up to 3 times over ~5 minutes before giving up
    # (round-3 lesson; the long-haul retry loop is the round-4 watcher,
    # scripts/round4_measure_on_recovery.sh)
    responsive = False
    for attempt in range(3):
        if _backend_responsive():
            responsive = True
            break
        if attempt < 2:
            time.sleep(60)
    if not responsive:
        print(json.dumps({
            "metric": "MLUPS/chip (D3Q27 cumulant-well, pair2, 256^3, f32)",
            "value": 0.0,
            "unit": "MLUPS",
            "vs_baseline": 0.0,
            "error": "TPU backend unavailable (axon tunnel down); last "
                     "recorded measurement: 2109.0 MLUPS, see "
                     "docs/PERFORMANCE.md",
        }))
        return

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from tnl_lbm_tpu.kernels.fused import supports
    from tnl_lbm_tpu.kernels.fused_aa import (
        make_fused_pair2_aa,
        make_fused_pair_aa,
        to_padded_aa,
    )
    from tnl_lbm_tpu.sim import initial_dfs, make_step

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    n = 256 if on_tpu else 32
    shape = (n, n, n)
    cfg, dom = ge._flagship(shape)
    force = jnp.asarray([1e-6, 0.0, 0.0], cfg.compute_dtype)

    advance_pair = None
    init_state = None
    if on_tpu and supports(dom):
        cfg_aa = dataclasses.replace(cfg, streaming="AA")
        from tnl_lbm_tpu.kernels.autotune import normalize_pair2, pair2_build_opts

        # TNL_BENCH_HALF=1|f16|bf16: measure the FP16S half-storage pair
        # (explicit opt-in - different accuracy class, never the headline;
        # see kernels/fused_aa.py store_dtype).  Falls through to the f32
        # chain on Mosaic rejection.
        half_env = os.environ.get("TNL_BENCH_HALF", "")
        store = {"": None, "0": None, "1": jnp.float16, "f16": jnp.float16,
                 "bf16": jnp.bfloat16}[half_env]
        tile, k, mode = (8, 32), 2, ""  # round-3 sweep winner on the v5e chip
        if os.environ.get("TNL_BENCH_AUTOTUNE") == "1":
            # re-measure tile geometry + traffic variants on THIS chip
            # (reference block_size_optimizer analog, kernels/autotune.py)
            from tnl_lbm_tpu.kernels.autotune import tune_pair2

            tx, ty, k, mode = tune_pair2(cfg_aa, dom, store_dtype=store)
            tile = (tx, ty)
        else:
            # adopt (never measure) a winner a previous autotune pass
            # recorded for this chip+shape - the round-4 recovery watcher
            # runs the TNL_BENCH_AUTOTUNE=1 sweep, and the driver's plain
            # bench run should benefit from it
            from tnl_lbm_tpu.kernels.autotune import (
                cached_winner,
                pair2_cache_key,
            )

            hit = cached_winner(pair2_cache_key(dom, cfg_aa, store))
            if hit is not None:
                tx, ty, k, mode = normalize_pair2(hit)
                tile = (tx, ty)
        try:
            # one-kernel pair: both parities in VMEM per tile, single
            # windowed read + interior write per 2 steps
            pair2 = make_fused_pair2_aa(cfg_aa, dom, tile=tile,
                                        tiles_per_program=k,
                                        store_dtype=store,
                                        **pair2_build_opts(mode))
            kernel_name = "pallas-fused-AA-pair2" + (f"[{mode}]" if mode else "")
            if store is not None:
                kernel_name += f"[store={jnp.dtype(store).name}]"
            # no donation: in/out are same-shape, XLA would alias them and
            # aliased in/out DMA costs ~1.8x bandwidth
            advance_pair = jax.jit(lambda f: pair2(f, 0.02, force=force)[0])
            steps_per_call = 2
            cfg = cfg_aa
            init_state = to_padded_aa(initial_dfs(cfg, dom), dom.periodic,
                                      store_dtype=store)
            # force the compile now so a Mosaic failure falls back cleanly
            _probe = advance_pair(init_state)
            float(_probe[0, 2, 8, 0])
            del _probe
        except Exception as exc:  # unknown hardware/Mosaic regression
            import sys

            print(f"pair2 path failed ({type(exc).__name__}); trying two-kernel pair",
                  file=sys.stderr, flush=True)
            advance_pair = None
        if advance_pair is None:
            try:
                # persistent-pad two-kernel pair: even kernel writes straight
                # into the odd kernel's padded layout
                pair = make_fused_pair_aa(cfg_aa, dom, tile_even=(8, 16),
                                          k_even=4, tile_odd=(8, 32), k_odd=3)
                kernel_name = "pallas-fused-AA-pair"
                advance_pair = jax.jit(lambda f: pair(f, 0.02, force=force)[0],
                                       donate_argnums=0)
                steps_per_call = 2
                cfg = cfg_aa
                init_state = initial_dfs(cfg, dom)
                _probe = advance_pair(init_state)
                float(_probe[0, 2, 8, 0])
                del _probe
            except Exception as exc:
                import sys

                print(f"pallas path failed ({type(exc).__name__}); falling back to XLA",
                      file=sys.stderr, flush=True)
                advance_pair = None
    if advance_pair is None:
        step = make_step(cfg, dom)
        kernel_name = "xla"
        advance_pair = jax.jit(lambda f: step(f, 0.02, force=force)[0],
                               donate_argnums=0)
        steps_per_call = 1
        init_state = initial_dfs(cfg, dom)

    f = init_state
    f = advance_pair(f)  # compile + warm both parities
    float(f[0, 2, 8, 0])

    calls = 50 if on_tpu else 10
    t0 = time.perf_counter()
    for _ in range(calls):
        f = advance_pair(f)
    v = float(f[0, 2, 8, 0])  # forces completion (block_until_ready does
    # not actually block through the remote-TPU tunnel)
    dt = time.perf_counter() - t0
    assert v == v, "NaN in benchmark output"

    iters = calls * steps_per_call
    mlups = shape[0] * shape[1] * shape[2] * iters / dt / 1e6

    # distributed-kernel compile smoke: a 1-device Mesh shard_map around the
    # fused A-A pair must go through Mosaic on this chip (VERDICT r1 item 7;
    # CPU interpret mode cannot see hardware-only mis-compiles)
    sharded_compile = "skipped (cpu)"
    if on_tpu:
        try:
            import numpy as _np
            from jax.sharding import Mesh

            from tnl_lbm_tpu.parallel.sharded import (
                ShardPlan,
                make_sharded_fused_step_aa,
            )
            from tnl_lbm_tpu.sim import initial_dfs as _idfs

            cfg_s, dom_s = ge._flagship((16, 16, 128))
            cfg_s = dataclasses.replace(cfg_s, streaming="AA")
            plan_s = ShardPlan(
                mesh=Mesh(_np.asarray(jax.devices()[:1]), ("x",)),
                spatial_axes=("x", None, None),
            )
            step_s = make_sharded_fused_step_aa(
                cfg_s, dom_s, plan_s, tile_even=(8, 8), tile_odd=(8, 8))
            fs = plan_s.shard_field(_idfs(cfg_s, dom_s), like_f=True)
            ms = plan_s.shard_field(jnp.asarray(dom_s.map, jnp.int32), like_f=False)
            for par in (0, 1):
                fs, rs, _ = step_s(fs, ms, 0.02, force=force, parity=par)
            assert bool(jnp.isfinite(rs).all())
            sharded_compile = "ok"
        except Exception as exc:
            sharded_compile = f"FAILED: {type(exc).__name__}"

    print(json.dumps({
        "metric": f"MLUPS/chip (D3Q27 cumulant-well, {kernel_name}, {n}^3, f32 compute, {dev.platform})",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / BASELINE_MLUPS, 3),
        "sharded_compile": sharded_compile,
    }))


if __name__ == "__main__":
    main()
