#!/usr/bin/env python3
"""IBM performance tables: sweep dirac kernels x methods, tabulate timings.

Analog of the reference makeIBMPerformanceTables.py (reference:
makeIBMPerformanceTables.py:15-95): runs the IBM benchmark across dirac
types and A-matrix methods, parses the JSON-ish "ibm" log lines, and prints
timing tables.  The reference's compute variants (GPU/CPU/hybrid) collapse
to the single on-device path (lagrange_3D.h:24-30 - there is no reason to
leave the chip), so the table axes are dirac x method.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_case(dirac: str, method: str, n: int, points: int, steps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tnl_lbm_tpu.ibm import IBM
    from tnl_lbm_tpu.ibm.generators import points_sphere
    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col
    from tnl_lbm_tpu.sim import Domain, LBMConfig, initial_dfs, make_step
    from tnl_lbm_tpu.utils import Lattice

    units = Lattice(global_size=(n, n, n), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0,
                    phys_viscosity=0.05)
    dom = Domain(lat=D3Q27, units=units, map=np.zeros((n, n, n), np.uint8), periodic=(True,) * 3)

    radius = n / 5
    sigma = np.sqrt(4 * np.pi * radius**2 / points)
    pts = points_sphere((n / 2, n / 2, n / 2), radius, sigma)

    t0 = time.perf_counter()
    ibm = IBM(units, pts, dirac=dirac, method=method, max_iters=50)
    t_build = time.perf_counter() - t0

    hook = ibm.forcing_hook()
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum, forcing_hook=hook)
    step = make_step(cfg, dom)
    # hook consts as jit ARGUMENTS (round 3): inlined they blow up the
    # remote-compile upload at large point counts (ibm/lagrange.py)
    jstep = jax.jit(lambda f, hc: step(f, 0.05, hook_consts=hc)[0],
                    donate_argnums=0)
    f = initial_dfs(cfg, dom, u0=(0.05, 0.0, 0.0))
    f = jstep(f, hook.consts)
    jax.block_until_ready(f)
    t0 = time.perf_counter()
    for _ in range(steps):
        f = jstep(f, hook.consts)
    jax.block_until_ready(f)
    t_solve = (time.perf_counter() - t0) / steps
    return ibm.m, t_build, t_solve


def main(argv=None):
    p = argparse.ArgumentParser(description="IBM performance tables")
    p.add_argument("--n", type=int, default=48)
    p.add_argument("--points", type=int, default=1000)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--diracs", default="phi1,phi2,phi3,phi4")
    p.add_argument("--methods", default="modified,original")
    args = p.parse_args(argv)

    rows = []
    for dirac in args.diracs.split(","):
        for method in args.methods.split(","):
            m, t_build, t_solve = run_case(dirac, method, args.n, args.points, args.steps)
            rows.append((dirac, method, m, t_build, t_solve))
            print(f"ran dirac={dirac} method={method} m={m}", file=sys.stderr)

    header = f"{'dirac':8s} {'method':10s} {'points':>7s} {'build[s]':>10s} {'step[ms]':>10s}"
    print(header)
    print("-" * len(header))
    for dirac, method, m, tb, ts in rows:
        print(f"{dirac:8s} {method:10s} {m:7d} {tb:10.4f} {ts * 1e3:10.2f}")


if __name__ == "__main__":
    main()
