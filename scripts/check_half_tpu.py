"""On-chip validation of FP16S half storage (kernels/fused_aa.py
store_dtype): run the f32 pair2 and the f16/bf16 pair2 side by side on the
real TPU and print the velocity deviation after N pairs.

Interpret-mode tests (tests/test_fused_kernel.py) already pin the
numerics; this script confirms the Mosaic lowering of the 16-bit DMA
windows + widen/narrow converts produces the same storage-rounding
envelope on hardware, and measures the speed ratio.

Usage: python scripts/check_half_tpu.py [--n 128] [--pairs 5]
"""

from __future__ import annotations

import argparse
import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--timing-calls", type=int, default=20)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from tnl_lbm_tpu.kernels.fused_aa import (
        from_padded_aa,
        make_fused_pair2_aa,
        to_padded_aa,
    )
    from tnl_lbm_tpu.sim import initial_dfs

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{getattr(dev, 'device_kind', '?')}")
    cfg, dom = ge._flagship((args.n, args.n, args.n))
    cfg = dataclasses.replace(cfg, streaming="AA")
    force = jnp.asarray([1e-5, 0.0, 0.0], cfg.compute_dtype)
    f0 = initial_dfs(cfg, dom)

    def run(store):
        pair = make_fused_pair2_aa(cfg, dom, store_dtype=store)
        jp = jax.jit(lambda f: pair(f, 0.02, force=force))
        fp = to_padded_aa(f0, dom.periodic, store_dtype=store)
        for _ in range(args.pairs):
            fp, rho, u = jp(fp)
        u = np.asarray(u, np.float64)
        # timing: state-advance only
        adv = jax.jit(lambda f: pair(f, 0.02, force=force)[0])
        fp2 = adv(fp)
        float(fp2[0, 2, 8, 0])
        t0 = time.perf_counter()
        for _ in range(args.timing_calls):
            fp2 = adv(fp2)
        float(fp2[0, 2, 8, 0])
        dt = (time.perf_counter() - t0) / args.timing_calls
        return u, dt

    u32, t32 = run(None)
    scale = np.abs(u32).max()
    print(f"f32 pair2: {t32 * 1e3:.2f} ms/pair, |u|max={scale:.3e}")
    for store, name in ((jnp.float16, "f16"), (jnp.bfloat16, "bf16")):
        try:
            uh, th = run(store)
        except Exception as exc:
            print(f"{name}: BUILD/RUN FAILED: {type(exc).__name__}: {exc}")
            continue
        du = np.abs(uh - u32).max()
        print(f"{name} pair2: {th * 1e3:.2f} ms/pair ({t32 / th:.2f}x), "
              f"max|du|={du:.3e} ({du / max(scale, 1e-30):.2e} of |u|max) "
              f"after {2 * args.pairs} steps")


if __name__ == "__main__":
    main()
