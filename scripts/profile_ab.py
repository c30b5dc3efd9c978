"""Tile sweep for the A-B fused kernel with the raised VMEM limit."""
import sys
if "-h" in sys.argv or "--help" in sys.argv:
    print(__doc__ or "")
    raise SystemExit(0)
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge  # noqa: E402
from tnl_lbm_tpu.kernels.fused import make_fused_step  # noqa: E402
from tnl_lbm_tpu.sim import initial_dfs  # noqa: E402

n = 256
cfg, dom = ge._flagship((n, n, n))
force = jnp.asarray([1e-6, 0.0, 0.0], jnp.float32)


def timeit(label, fn, iters=50):
    f = initial_dfs(cfg, dom)
    f = fn(f)
    float(f[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        f = fn(f)
    float(f[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:32s} {dt*1e3:8.2f} ms {n**3/dt/1e6:8.1f} MLUPS", flush=True)
    return dt


for tile, k in [((8, 16), 6), ((4, 16), 8), ((8, 16), 8), ((4, 16), 16), ((8, 8), 8)]:
    try:
        step = make_fused_step(cfg, dom, tile=tile, tiles_per_program=k)
        j = jax.jit(lambda f: step(f, 0.02, force=force)[0], donate_argnums=0)
        timeit(f"AB {tile} K={k}", j)
    except Exception as e:
        print(f"AB {tile} K={k} FAILED: {type(e).__name__}: {str(e)[:150]}", flush=True)
