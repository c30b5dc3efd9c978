#!/usr/bin/env python3
"""Capture a jax.profiler trace of the production step and reduce it to the
measured wall-time split (compute / comm-overlapped / comm-exposed / copy).

The analog of the reference's per-run timer battery + MPI bandwidth lines
(reference include/lbm3d/state.hpp:1285-1300, lbm.hpp:238-279), and the
measurement VERDICT r3 asked for: it validates the "overlap is free on TPU"
design argument and the ``predicted_weak_scaling`` model against a real
trace instead of assumptions.

Usage:
  python scripts/profile_anatomy.py [--n 256] [--steps 20] [--sharded]
      [--use-fused] [--streaming AA] [--outdir /tmp/anatomy]

On a multi-chip mesh (or the virtual-CPU mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``)
the sharded run also prints the modeled-vs-measured comm comparison.
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--sharded", action="store_true")
    p.add_argument("--use-fused", action="store_true")
    p.add_argument("--streaming", choices=["AB", "AA"], default="AB")
    p.add_argument("--outdir", default="/tmp/anatomy")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col
    from tnl_lbm_tpu.ops import equilibrium as eqlib
    from tnl_lbm_tpu.sim import Domain, LBMConfig, make_step
    from tnl_lbm_tpu.utils import Lattice
    from tnl_lbm_tpu.utils.trace_analysis import (
        format_anatomy,
        step_anatomy,
    )

    n = args.n
    shape = (n, n, n)
    units = Lattice(shape, (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=np.zeros(shape, np.uint8),
                 periodic=(True,) * 3)
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum,
                    streaming=args.streaming)
    f = eqlib.eq_quadratic(D3Q27, jnp.ones(shape, jnp.float32),
                           jnp.zeros((3,) + shape, jnp.float32))
    force = jnp.array([1e-5, 0.0, 0.0], jnp.float32)

    plan = None
    steps_per_call = 1
    if args.sharded:
        from tnl_lbm_tpu.parallel.sharded import choose_plan, make_sharded_step

        plan = choose_plan(dom)
        step = make_sharded_step(cfg, dom, plan)
        f = plan.shard_field(f, like_f=True)
        mp = plan.shard_field(jnp.asarray(dom.map), like_f=False)
        jstep = jax.jit(lambda f, p: step(f, mp, 0.02, force=force,
                                          parity=p)[0])
    elif args.use_fused and args.streaming == "AA":
        # the PRODUCTION kernel: one-kernel A-A pair (2 steps/dispatch)
        from tnl_lbm_tpu.kernels.fused_aa import (
            make_fused_pair2_aa,
            pad_map_pair2,
            to_padded_aa,
        )

        pair2 = make_fused_pair2_aa(cfg, dom)
        f = to_padded_aa(f, dom.periodic)
        mp_dev = jnp.asarray(pad_map_pair2(dom.map, dom.periodic, f.shape[-1]))
        inner = jax.jit(lambda x, mp: pair2(x, 0.02, force=force,
                                            map_pad_in=mp)[0])
        jstep = lambda x, p: inner(x, mp_dev)  # noqa: E731
        steps_per_call = 2
    elif args.use_fused:
        from tnl_lbm_tpu.kernels.fused import make_fused_step

        step = make_fused_step(cfg, dom)
        jstep = jax.jit(lambda f, p: step(f, 0.02, force=force, parity=p)[0])
    else:
        step = make_step(cfg, dom)
        jstep = jax.jit(lambda f, p: step(f, 0.02, force=force, parity=p)[0])

    # warm/compile both parities
    f = jstep(f, 0)
    if args.streaming == "AA":
        f = jstep(f, 1)
    jax.block_until_ready(f)

    outdir = Path(args.outdir)
    t0 = time.perf_counter()
    with jax.profiler.trace(str(outdir)):
        for i in range(args.steps):
            f = jstep(f, i % 2 if args.streaming == "AA" else 0)
        jax.block_until_ready(f)
    wall = time.perf_counter() - t0
    step_s = wall / (args.steps * steps_per_call)
    mlups = n ** 3 / step_s / 1e6
    print(f"device={jax.devices()[0].platform} n={n} steps={args.steps} "
          f"{step_s * 1e3:.2f} ms/step  {mlups:.1f} MLUPS")

    a = step_anatomy(outdir)
    a["wall_ms_per_step"] = step_s * 1e3
    a["mlups"] = mlups
    print(format_anatomy(a))
    for name, ms in a["top_ops_ms"].items():
        print(f"  {ms:10.2f} ms  {name[:70]}")

    if plan is not None:
        from tnl_lbm_tpu.parallel.profiling import (
            halo_traffic,
            predicted_weak_scaling,
        )

        ht = halo_traffic(dom, plan)
        eff = predicted_weak_scaling(dom, plan, step_s)
        meas_comm_ms = a["comm_ms"] / args.steps
        print(f"halo traffic model: {ht.bytes_per_step_per_device / 1e6:.2f} "
              f"MB/device/step; modeled weak-scaling eff {eff * 100:.1f}%")
        print(f"trace-measured comm: {meas_comm_ms:.3f} ms/step, "
              f"{a['overlap_fraction'] * 100:.0f}% overlapped "
              f"({a['comm_exposed_ms'] / args.steps:.3f} ms/step exposed)")
        a["modeled_weak_scaling_eff"] = eff
        a["modeled_halo_bytes_per_device_per_step"] = (
            ht.bytes_per_step_per_device)

    with open(outdir / "anatomy.json", "w") as fh:
        json.dump(a, fh, indent=1)
    print(f"summary -> {outdir / 'anatomy.json'}")


if __name__ == "__main__":
    main()
