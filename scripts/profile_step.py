"""Decompose the TPU step cost: collision vs streaming vs full step.

Run on the real chip: python scripts/profile_step.py [n]
"""

import sys
if "-h" in sys.argv or "--help" in sys.argv:
    print(__doc__ or "")
    raise SystemExit(0)
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.models import D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops import equilibrium as eqlib
from tnl_lbm_tpu.ops import moments as mom
from tnl_lbm_tpu.ops import streaming as stream


def timed(name, fn, f, iters=30):
    f = f + jnp.float32(0)  # fresh buffer (donation below consumes it)
    run = jax.jit(lambda f: jax.lax.fori_loop(0, iters, lambda i, f: fn(f), f), donate_argnums=0)
    f2 = run(f)  # compile + warm
    jax.block_until_ready(f2)
    t0 = time.perf_counter()
    f3 = run(f2)
    jax.block_until_ready(f3)
    dt = time.perf_counter() - t0
    n = f.shape[1] * f.shape[2] * f.shape[3]
    mlups = n * iters / dt / 1e6
    gbps = n * iters * 27 * 4 * 2 / dt / 1e9
    print(f"{name:28s} {dt/iters*1e3:8.2f} ms/step  {mlups:8.1f} MLUPS  {gbps:6.1f} GB/s(min)")


def main(n=128):
    shape = (n, n, n)
    periodic = (True, True, True)
    f = eqlib.eq_well(D3Q27, jnp.ones(shape, jnp.float32), jnp.zeros((3,) + shape, jnp.float32)).astype(jnp.float32)
    print("device:", jax.devices()[0], "shape:", f.shape, "dtype:", f.dtype)

    def collide_only(f):
        rho, u = mom.density_velocity(D3Q27, f, well=True)
        return col.collide_cum(D3Q27, f, rho, u, 0.02, well=True)

    def stream_pad(f):
        return stream.pull(D3Q27, stream.pad_halo(f, periodic), shape)

    def stream_roll(f):
        rows = []
        for q in range(27):
            g = f[q]
            for a in range(3):
                c = int(D3Q27.c[q][a])
                if c:
                    g = jnp.roll(g, c, axis=a)
            rows.append(g)
        return jnp.stack(rows)

    def full_ab(f):
        f_in = stream_pad(f)
        rho, u = mom.density_velocity(D3Q27, f_in, well=True)
        return col.collide_cum(D3Q27, f_in, rho, u, 0.02, well=True)

    def full_ab_roll(f):
        f_in = stream_roll(f)
        rho, u = mom.density_velocity(D3Q27, f_in, well=True)
        return col.collide_cum(D3Q27, f_in, rho, u, 0.02, well=True)

    def copy_only(f):
        return f + jnp.float32(1e-12)

    timed("copy (roofline probe)", copy_only, f)
    timed("collide only", collide_only, f)
    timed("stream only (pad+slice)", stream_pad, f)
    timed("stream only (rolls)", stream_roll, f)
    timed("full AB (pad+slice)", full_ab, f)
    timed("full AB (rolls)", full_ab_roll, f)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
