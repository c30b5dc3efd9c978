#!/usr/bin/env python3
"""Benchmark the forcing-hook (non-Newtonian) fused pipeline on the chip.

Measures ms/step and MLUPS for the hooked production path
(kernels/hooked.py: Pallas u* pre-pass + single-kernel Pallas NN forcing +
force-field fused kernel) in both streaming patterns, plus the pure
(unhooked) fused step for the overhead ratio.  The reference's hooked
pipeline costs ~2x its pure kernel (VERDICT r2); this script tracks ours.

Timing protocol (docs/PERFORMANCE.md): chain the state through the calls
and force completion with a host scalar fetch - block_until_ready does not
reliably block through the remote-TPU tunnel.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(adv_by_parity, f, calls: int):
    n_par = len(adv_by_parity)
    f = adv_by_parity[0](f)
    if n_par > 1:
        f = adv_by_parity[1](f)
    float(f[0, 2, 8, 0])  # compile + warm both parities
    t0 = time.perf_counter()
    for c in range(calls):
        f = adv_by_parity[c % n_par](f)
    v = float(f[0, 2, 8, 0])
    dt = time.perf_counter() - t0
    assert v == v, "NaN in benchmark output"
    return dt / calls


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--calls", type=int, default=20)
    p.add_argument("--patterns", default="AA,AB")
    p.add_argument("--tiles", default=None,
                   help="comma list of TXxTYxK single-kernel NN tile "
                        "geometries to sweep (e.g. 8x16x2,16x32x1); the "
                        "default build uses (8,16) K=2.  The odd-parity "
                        "window is (tx+8)x(ty+16): at (8,16) that is a 4x "
                        "read amplification, at (16,32) 2.25x - tile "
                        "geometry is the single biggest lever on the "
                        "hooked step's HBM traffic")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from tnl_lbm_tpu.kernels.fused import make_fused_step
    from tnl_lbm_tpu.kernels.fused_aa import make_fused_step_aa
    from tnl_lbm_tpu.kernels.hooked import make_hooked_fused_step
    from tnl_lbm_tpu.ops import non_newtonian as nn
    from tnl_lbm_tpu.sim import initial_dfs

    n = args.n
    cfg, dom = ge._flagship((n, n, n))
    model = nn.CarreauYasuda(nu0=0.1, lam=1.0, a=2.0, n=0.5)
    hook = nn.make_nn_forcing_hook(model, periodic=tuple(dom.periodic))
    force = jnp.asarray([1e-6, 0.0, 0.0], cfg.compute_dtype)

    cases = [("pure", None, {}),
             ("hooked-NN-single", hook, {}),
             ("hooked-NN-pipeline", hook, {"single_kernel": False})]
    if args.tiles:
        cases = []
        for spec in args.tiles.split(","):
            fields = [int(v) for v in spec.split("x")]
            tx, ty, k = fields[:3]
            kw = {"tile": (tx, ty), "tiles_per_program": k}
            if len(fields) > 3:  # TXxTYxKxBUDGET_MB: lift the VMEM fit cap
                kw["vmem_budget"] = fields[3] * 2**20
            cases.append((f"hooked-NN-single[{spec}]", hook, kw))

    for streaming in args.patterns.split(","):
        parities = (0, 1) if streaming == "AA" else (0,)
        for label, fh, kw in cases:
            cfgh = dataclasses.replace(cfg, streaming=streaming,
                                       forcing_hook=fh)
            if fh is not None:
                step = make_hooked_fused_step(cfgh, dom, **kw)
            elif streaming == "AA":
                step = make_fused_step_aa(cfgh, dom)
            else:
                step = make_fused_step(cfgh, dom)
            jits = [jax.jit(
                lambda f, p=p, step=step: step(f, 0.02, force=force,
                                               parity=p)[0])
                for p in parities]
            t = measure(jits, initial_dfs(cfgh, dom), args.calls)
            print(f"{streaming} {label}: {t * 1e3:.2f} ms/step -> "
                  f"{n ** 3 / t / 1e6:.0f} MLUPS", flush=True)


if __name__ == "__main__":
    main()
