#!/usr/bin/env python3
"""Measure the multi-process (multi-host analog) per-step overhead.

The weak-scaling model (parallel/profiling.py:predicted_weak_scaling) has a
DCN tier whose constants were spec-sheet assumptions.  This script measures
the software cost of crossing a PROCESS boundary on this box: the same
8-device sharded simulation runs once as 1 process x 8 virtual CPU devices
and once as 2 processes x 4 devices (jax.distributed over localhost - the
gRPC/serialization path multi-host runs pay, minus the physical wire).  The
difference is the measured per-step cross-process overhead; with the slab
bytes known, that yields an effective same-box "DCN" bandwidth floor to
annotate the model with.

Reference analog: the reference logs its measured MPI bandwidth every 100
iterations (lbm.hpp:238-279) instead of assuming NIC spec numbers.

Usage: python scripts/measure_multiprocess_overhead.py
           [--size 64 32 32] [--steps 40] [--json OUT]

(self-spawns its worker processes; runs on the virtual CPU platform)
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_case(rank: int, nprocs: int, port: str, size, steps: int):
    """Build the sharded sim over the global 8-device mesh and time steps.

    rank < 0 means single-process mode (8 local devices, no distributed
    runtime).  Returns seconds per step (steady state, best-of-3 windows).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")

    if rank >= 0:
        from tnl_lbm_tpu.parallel import distributed as dist

        dist.initialize(f"localhost:{port}", num_processes=nprocs,
                        process_id=rank)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col
    from tnl_lbm_tpu.ops.boundary import GEO
    from tnl_lbm_tpu.parallel.sharded import ShardPlan
    from tnl_lbm_tpu.sim import Domain, LBMConfig
    from tnl_lbm_tpu.sim.state import Simulation
    from tnl_lbm_tpu.utils import Lattice

    X, Y, Z = size
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, True))
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_srt,
                    compute_dtype=jnp.float32)

    devs = sorted(jax.devices(), key=lambda d: d.id)
    assert len(devs) == 8, devs
    mesh = Mesh(np.array(devs).reshape(8, 1), ("x", "y"))
    plan = ShardPlan(mesh=mesh, spatial_axes=("x", "y", None))

    class Sim(Simulation):
        def body_force(self, t):
            return np.array([1e-6, 0.0, 0.0])

    sim = Sim(cfg, dom, sim_id=f"mpov{nprocs}", plan=plan,
              results_parent=os.environ.get("TMPDIR", "/tmp"),
              phys_final_time=1e9)
    sim.sim_init()
    sim._advance(5)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sim._advance(steps)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[64, 32, 32])
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--json", default=None)
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--port", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=4")
        t = run_case(args.worker, 2, args.port, args.size, args.steps)
        print(json.dumps({"rank": args.worker, "s_per_step": t}))
        return

    # ---- case A: one process, 8 devices
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    t1 = run_case(-1, 1, "", args.size, args.steps)

    # ---- case B: 2 processes x 4 devices over localhost gRPC
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parent.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(rank), "--port",
             str(port), "--size", *map(str, args.size),
             "--steps", str(args.steps)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for rank in range(2)
    ]
    t2 = 0.0
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=1200)
        assert p.returncode == 0, f"worker {rank} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith('{"rank"')][-1]
        t2 = max(t2, json.loads(line)["s_per_step"])

    X, Y, Z = args.size
    # one process-boundary cut, full-Q slabs both ways (the conservative
    # Pallas-path accounting of predicted_weak_scaling with subset=False)
    slab_bytes = 2 * 27 * Y * Z * 4
    overhead = max(t2 - t1, 0.0)
    eff_gbps = (slab_bytes / overhead / 1e9) if overhead > 0 else float("inf")
    result = {
        "size": args.size, "steps": args.steps,
        "s_per_step_1proc_8dev": round(t1, 6),
        "s_per_step_2proc_4dev": round(t2, 6),
        "cross_process_overhead_s": round(overhead, 6),
        "boundary_slab_bytes": slab_bytes,
        "effective_gbps_same_box": round(eff_gbps, 3),
        "note": "same-box gRPC: software floor of the DCN tier - a real "
                "multi-host run adds the wire on top",
    }
    print(json.dumps(result))
    if args.json:
        Path(args.json).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
