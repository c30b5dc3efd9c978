"""Headline benchmark: MLUPS/chip for D3Q27 cumulant DNS.

Replicates the reference's GLUPS accounting: LUPS = X*Y*Z * iterations /
compute_time with the kernel-only timer (reference: state.hpp:1302-1309,
BASELINE.md "GLUPS formula").  Config matches BASELINE.json: 256^3 square
duct, D3Q27 well-conditioned cumulant collision, float32, using the Pallas
fused collide-and-stream kernel (tnl_lbm_tpu/kernels/fused.py) with XLA
buffer donation (A-B pattern; donation reuses the DF buffer in place, which
is the A-A pattern's memory win realized the XLA way - SURVEY.md section 7
"Hard parts").

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
    from tnl_lbm_tpu.kernels.fused import make_fused_step, supports
    from tnl_lbm_tpu.sim import initial_dfs, make_step

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    n = 256 if on_tpu else 32
    shape = (n, n, n)
    cfg, dom = ge._flagship(shape)
    force = jnp.asarray([1e-6, 0.0, 0.0], cfg.compute_dtype)

    if on_tpu and supports(dom):
        step = make_fused_step(cfg, dom, tile=(4, 8), tiles_per_program=2)
        kernel_name = "pallas-fused"
    else:
        step = make_step(cfg, dom)
        kernel_name = "xla"

    jstep = jax.jit(lambda f: step(f, 0.02, force=force)[0], donate_argnums=0)

    f = initial_dfs(cfg, dom)
    f = jstep(f)  # compile + warm
    float(f[0, 0, 0, 0])

    iters = 100 if on_tpu else 10
    t0 = time.perf_counter()
    for _ in range(iters):
        f = jstep(f)
    v = float(f[0, 0, 0, 0])  # forces completion
    dt = time.perf_counter() - t0
    assert v == v, "NaN in benchmark output"

    mlups = shape[0] * shape[1] * shape[2] * iters / dt / 1e6
    print(json.dumps({
        "metric": f"MLUPS/chip (D3Q27 cumulant-well, {kernel_name}, {n}^3, f32, {dev.platform})",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / BASELINE_MLUPS, 3),
    }))


if __name__ == "__main__":
    main()
