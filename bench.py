"""Headline benchmark: MLUPS/chip for D3Q27 cumulant DNS.

Replicates the reference's GLUPS accounting: LUPS = X*Y*Z * iterations /
compute_time with the kernel-only timer (reference: state.hpp:1302-1309,
BASELINE.md "GLUPS formula").  Config matches BASELINE.json: 256^3 square
duct, D3Q27 cumulant collision, A-A streaming (single DF buffer, in-place
via XLA buffer donation), float32.

Baseline derivation (the reference repo publishes no absolute numbers -
BASELINE.md): published TNL-LBM-class single-GPU throughput for the D3Q27
cumulant kernel is ~1.9 GLUPS on an A100 (HBM-bandwidth-bound at ~2 TB/s,
~230 B/site/step effective).  Scaling by memory bandwidth to this TPU chip
(v5e, ~0.82 TB/s) gives ~1000 MLUPS as the per-chip parity target:
vs_baseline = MLUPS / 1000.
"""

from __future__ import annotations

import json
import time

BASELINE_MLUPS = 1000.0


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from tnl_lbm_tpu.sim import initial_dfs, make_step

    dev = jax.devices()[0]
    n = 256 if dev.platform != "cpu" else 64
    shape = (n, n, n)
    cfg, dom = ge._flagship(shape)
    # A-A pattern: single DF buffer, donated in-place update
    import dataclasses

    cfg = dataclasses.replace(cfg, streaming="AA")
    step = make_step(cfg, dom)
    force = jnp.asarray([1e-6, 0.0, 0.0], cfg.compute_dtype)

    step_even = jax.jit(lambda f: step(f, 0.02, force=force, parity=0)[0], donate_argnums=0)
    step_odd = jax.jit(lambda f: step(f, 0.02, force=force, parity=1)[0], donate_argnums=0)

    f = initial_dfs(cfg, dom)
    # warmup + compile
    f = step_even(f)
    f = step_odd(f)
    jax.block_until_ready(f)

    iters = 100 if dev.platform != "cpu" else 10
    t0 = time.perf_counter()
    for _ in range(iters // 2):
        f = step_even(f)
        f = step_odd(f)
    jax.block_until_ready(f)
    dt = time.perf_counter() - t0

    mlups = shape[0] * shape[1] * shape[2] * iters / dt / 1e6
    print(json.dumps({
        "metric": f"MLUPS/chip (D3Q27 cumulant, A-A, {n}^3, f32, {dev.platform})",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / BASELINE_MLUPS, 3),
    }))


if __name__ == "__main__":
    main()
