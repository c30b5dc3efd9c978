"""Time the forcing-hook (non-Newtonian) fused path on the real chip.

Round-2 baseline: hooked A-A 51.7 ms/step = 325 MLUPS, A-B 159 MLUPS,
XLA step 125 MLUPS (docs/PERFORMANCE.md).  Round 3 adds the Pallas u*
pre-pass for A-B (kernels/hooked.py macro_only) and the folded cumulant
cascade - this script re-measures all three.

Usage: python scripts/profile_hooked.py [n]
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
from tnl_lbm_tpu.kernels.hooked import make_hooked_fused_step  # noqa: E402
from tnl_lbm_tpu.ops.non_newtonian import (  # noqa: E402
    CarreauYasuda, make_nn_forcing_hook,
)
from tnl_lbm_tpu.sim import initial_dfs, make_step  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
cfg0, dom = ge._flagship((n, n, n))
model = CarreauYasuda(nu0=0.1, lam=1.0, a=2.0, n=0.5)
hook = make_nn_forcing_hook(model)
force = jnp.asarray([1e-6, 0.0, 0.0], jnp.float32)


def timeit(label, fn, f0, iters=20, steps_per_call=1):
    f = fn(f0)
    jax.block_until_ready(f)
    t0 = time.perf_counter()
    for _ in range(iters):
        f = fn(f)
    jax.block_until_ready(f)
    dt = (time.perf_counter() - t0) / iters / steps_per_call
    print(f"{label:40s} {dt*1e3:8.2f} ms/step {n**3/dt/1e6:8.1f} MLUPS",
          flush=True)


for streaming in ("AB", "AA"):
    cfg = dataclasses.replace(cfg0, streaming=streaming, forcing_hook=hook)
    step = make_hooked_fused_step(cfg, dom)
    f0 = initial_dfs(cfg, dom)
    if streaming == "AA":
        j0 = jax.jit(lambda f: step(f, 0.02, force=force, parity=0)[0])
        j1 = jax.jit(lambda f: step(f, 0.02, force=force, parity=1)[0])
        timeit(f"hooked fused {streaming} (even+odd avg)",
               lambda f: j1(j0(f)), f0, iters=10, steps_per_call=2)
    else:
        j = jax.jit(lambda f: step(f, 0.02, force=force)[0])
        timeit(f"hooked fused {streaming}", j, f0)

cfg = dataclasses.replace(cfg0, forcing_hook=hook)
step_x = make_step(cfg, dom)
jx = jax.jit(lambda f: step_x(f, 0.02, force=force)[0])
timeit("hooked XLA AB", jx, initial_dfs(cfg, dom), iters=5)
