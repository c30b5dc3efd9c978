#!/usr/bin/env python3
"""512^3 D3Q27 cumulant DNS on ONE chip via FP16S half storage.

The capacity claim from docs/PERFORMANCE.md: at-rest f16 DFs cost
27 * 512^3 * 2 B = 7.25 GB, which fits a single 16 GB v5e - f32 storage
(14.5 GB per buffer) cannot even hold one non-aliased copy.  This script
builds the production pair2 kernel with ``store_dtype=float16`` at
512^3, initializes the state AT REST IN HALF PRECISION under jit (no
f32-resident transient), runs a few pairs and prints MLUPS.

The non-aliased in/out variant (fastest per-byte on v5e, see
kernels/fused_aa.py) needs ~15 GB peak; if it does not fit, the script
falls back to donated (aliased) buffers and says so.

Reference analog: TraitsSP/DP precision policy (defs.h:118-119) - the
reference has no half-storage tier at all; this demonstrates capability
beyond it.

Usage: python scripts/demo_half_512.py [--n 512] [--pairs 10] [--store f16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--pairs", type=int, default=10)
    # bf16 default: this toolchain's Mosaic rejects f16 at-rest windows
    # outright ("Unsupported type in mosaic dialect: 'f16'", measured in
    # docs/measurements/r5/r5_half_check.log) - the FP16S tier on TPU is
    # bfloat16
    ap.add_argument("--store", default="bf16", choices=["f16", "bf16"])
    args = ap.parse_args()

    import dataclasses
    import os

    import jax

    # the axon remote-TPU plugin re-registers itself over the JAX_PLATFORMS
    # env var; only jax.config wins (same dance as tests/conftest.py) - so a
    # CPU smoke run of this script actually stays on CPU
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from tnl_lbm_tpu.kernels.fused_aa import make_fused_pair2_aa, to_padded_aa

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{getattr(dev, 'device_kind', '?')}")
    n = args.n
    store = {"f16": jnp.float16, "bf16": jnp.bfloat16}[args.store]

    cfg, dom = ge._flagship((n, n, n))
    cfg = dataclasses.replace(cfg, streaming="AA")
    force = jnp.asarray([1e-6, 0.0, 0.0], cfg.compute_dtype)
    w = np.asarray([float(x) for x in cfg.lat.w], np.float32)

    # equilibrium-at-rest init fully inside jit: the f32 broadcast fuses
    # into the half-precision materialization, so device memory only ever
    # holds the 2-byte padded state (~7.5 GB at 512^3), never an f32 copy
    @jax.jit
    def init():
        f = jnp.broadcast_to(
            jnp.asarray(w)[:, None, None, None], (len(w), n, n, n))
        return to_padded_aa(f, dom.periodic, store_dtype=store)

    f = init()
    f.block_until_ready()
    gib = f.size * f.dtype.itemsize / 2**30
    print(f"padded state: {f.shape} {f.dtype} = {gib:.2f} GiB at rest")

    from tnl_lbm_tpu.kernels.fused_aa import pad_map_pair2

    # capacity-demo build: no rho/u output fields (they would cost another
    # 2.1 GB at 512^3) and the int8 map window (the padded i32 map alone
    # is 0.56 GB); state advance is all the capacity claim needs
    pair2 = make_fused_pair2_aa(cfg, dom, store_dtype=store,
                                with_macro=False, map_mode="i8")
    # the geometry map rides as a jit ARGUMENT: closed over, the 512^3
    # padded map is a >70 MB HLO constant and the remote compile request
    # exceeds the tunnel's size limit (HTTP 413)
    map_dev = jax.device_put(jnp.asarray(
        pad_map_pair2(dom.map, dom.periodic, f.shape[-1]), jnp.int8))

    adv = None
    for donate, label in ((None, "non-aliased in/out"), (0, "donated (aliased)")):
        try:
            cand = jax.jit(lambda x, mp: pair2(x, 0.02, force=force,
                                               map_pad_in=mp)[0],
                           donate_argnums=() if donate is None else (0,))
            f2 = cand(f, map_dev)
            float(f2[0, 2, 8, 0])
            adv, f = (lambda x: cand(x, map_dev)), f2
            print(f"buffer mode: {label}")
            break
        except Exception as exc:
            print(f"{label} failed: {type(exc).__name__}: {str(exc)[:300]}")
            if donate is not None:
                raise
            # free the failed attempt's buffers before re-init
            import gc

            f = None
            if "f2" in dir():
                del f2
            gc.collect()
            f = init()  # donated fallback needs a fresh state
    assert adv is not None

    t0 = time.perf_counter()
    for _ in range(args.pairs):
        f = adv(f)
    v = float(f[0, 2, 8, 0])
    dt = time.perf_counter() - t0
    assert np.isfinite(v), v
    mlups = n ** 3 * 2 * args.pairs / dt / 1e6
    print(f"512^3-class FP16S demo: n={n} store={args.store} "
          f"{dt / args.pairs * 1e3:.1f} ms/pair -> {mlups:.1f} MLUPS")


if __name__ == "__main__":
    main()
