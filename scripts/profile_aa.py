"""Time the A-A fused pair on the real chip vs the A-B fused step."""
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
from tnl_lbm_tpu.kernels.fused_aa import make_fused_step_aa  # noqa: E402
from tnl_lbm_tpu.sim import initial_dfs  # noqa: E402
import dataclasses  # noqa: E402

n = 256
cfg, dom = ge._flagship((n, n, n))
force = jnp.asarray([1e-6, 0.0, 0.0], jnp.float32)
cfg_aa = dataclasses.replace(cfg, streaming="AA")


def timeit(label, fn, iters=50):
    f = initial_dfs(cfg, dom)
    f = fn(f)
    float(f[0, 2, 8, 0])
    f = initial_dfs(cfg, dom)
    f = fn(f)  # warm both parities if pair
    t0 = time.perf_counter()
    for _ in range(iters):
        f = fn(f)
    float(f[0, 2, 8, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:40s} {dt*1e3:8.2f} ms {n**3/dt/1e6:8.1f} MLUPS")
    return dt


# A-B baseline
step_ab = make_fused_step(cfg, dom, tile=(4, 8), tiles_per_program=2)
jab = jax.jit(lambda f: step_ab(f, 0.02, force=force)[0], donate_argnums=0)
timeit("AB fused (4,8)x2", jab)

best = {}
for te, to, k, macro in [
    ((8, 32), (8, 16), 4, True),
    ((8, 16), (8, 16), 6, True),
    ((8, 32), (8, 32), 2, True),
    ((8, 32), (8, 32), 4, True),
    ((8, 32), (16, 16), 2, True),
]:
    try:
        step_aa = make_fused_step_aa(cfg_aa, dom, tile_even=te, tile_odd=to,
                                     tiles_per_program=k, with_macro=macro)
        je = jax.jit(lambda f: step_aa(f, 0.02, force=force, parity=0)[0])
        jo = jax.jit(lambda f: step_aa(f, 0.02, force=force, parity=1)[0], donate_argnums=0)
        de = best.get(("e", te, macro)) or timeit(f"AA even {te} macro={macro}", je)
        best[("e", te, macro)] = de
        do = timeit(f"AA odd {to} K={k} macro={macro}", jo)
        pair = (de + do) / 2
        print(f"  -> pair avg {pair*1e3:8.2f} ms {n**3/pair/1e6:8.1f} MLUPS")
    except Exception as e:
        print(f"AA {te}/{to} K={k} FAILED: {type(e).__name__}: {str(e)[:160]}")
