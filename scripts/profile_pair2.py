"""Time the rebuilt one-kernel A-A pair (pair2) on the real chip.

Usage: python scripts/profile_pair2.py [tx,ty,K[,nomacro]] ...
Default sweep if no args.  Two-kernel production pair reference: 27.9 ms.
"""
import dataclasses
import sys
if "-h" in sys.argv or "--help" in sys.argv:
    print(__doc__ or "")
    raise SystemExit(0)
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge  # noqa: E402
from tnl_lbm_tpu.kernels.fused_aa import (  # noqa: E402
    make_fused_pair2_aa, to_padded_aa,
)
from tnl_lbm_tpu.sim import initial_dfs  # noqa: E402

n = 256
cfg, dom = ge._flagship((n, n, n))
force = jnp.asarray([1e-6, 0.0, 0.0], jnp.float32)
cfg_aa = dataclasses.replace(cfg, streaming="AA")


def timeit(label, fn, f0, iters=40):
    f = fn(f0)
    float(jax.tree.leaves(f)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        f = fn(f)
    v = float(jax.tree.leaves(f)[0].ravel()[0])
    assert v == v, "NaN"
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1e3:8.2f} ms/pair {2*n**3/dt/1e6:8.1f} MLUPS",
          flush=True)
    return dt


if len(sys.argv) > 1:
    configs = []
    for a in sys.argv[1:]:
        parts = a.split(",")
        configs.append(((int(parts[0]), int(parts[1])), int(parts[2]),
                        "nomacro" not in parts,
                        ("sub" if "sub" in parts else ("full" if "full" in parts else "aligned")),
                        "none" if "nodma" in parts else "full"))
else:
    configs = [((8, 32), 2, True, "aligned", "full")]

fp0 = to_padded_aa(initial_dfs(cfg_aa, dom), dom.periodic)
for tile, k, macro, band, dma in configs:
    try:
        pair2 = make_fused_pair2_aa(cfg_aa, dom, tile=tile,
                                    tiles_per_program=k, with_macro=macro,
                                    even_band=band, _debug_dma=dma)
        # NO donation: pair2's in/out are same-shape; XLA would alias them
        # and aliased in/out DMA costs ~1.8x bandwidth
        jp = jax.jit(lambda f: pair2(f, 0.02, force=force)[0])
        timeit(f"pair2 {tile} K={k} macro={macro} band={band} dma={dma}", jp, fp0)
    except Exception as e:
        print(f"pair2 {tile} K={k} macro={macro} band={band} dma={dma} FAILED: "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
