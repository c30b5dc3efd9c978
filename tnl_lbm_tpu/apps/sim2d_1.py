"""sim2d_1: 2D channel flow past a wall-with-hole (D2Q9 CLBM).

Analog of reference sim_2D/sim2d_1.cu:1-206 - the smallest configuration,
runnable at lattice resolution 1 on CPU (the reference documents
``./build/sim_2D/sim2d_1 4`` as its minimal smoke test, README.md:74-77).

Usage: python -m tnl_lbm_tpu.apps.sim2d_1 [resolution]
"""

from __future__ import annotations

import argparse

import numpy as np

from tnl_lbm_tpu.models import D2Q9
from tnl_lbm_tpu.ops import collision_2d as col2
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig
from tnl_lbm_tpu.sim.obstacles import set_boundary_x, set_boundary_y
from tnl_lbm_tpu.sim.state import PRINT, VTK2D, Simulation
from tnl_lbm_tpu.utils import Lattice


class Sim2D1(Simulation):
    lbm_inflow_vx: float = 0.0

    def update_inflow(self, phys_time):
        return np.array([self.lbm_inflow_vx, 0.0])


def build(resolution: int = 1, final_time: float = 0.5, results_parent=".",
          use_fused: bool = False, sharded: bool = False):
    X = 128 * resolution
    Y = 32 * resolution
    lbm_viscosity = 1e-5  # reference sim2d_1.cu:123
    phys_height = 0.41
    phys_viscosity = 1.5e-5
    phys_velocity = 1.0
    phys_dl = phys_height / (Y - 2)
    phys_dt = lbm_viscosity / phys_viscosity * phys_dl * phys_dl

    units = Lattice(
        global_size=(X, Y), phys_origin=(0.0, 0.0),
        phys_dl=phys_dl, phys_dt=phys_dt, phys_viscosity=phys_viscosity,
    )
    dom = Domain(lat=D2Q9, units=units, map=np.zeros((X, Y), np.uint8))
    set_boundary_x(dom, 0, GEO.INFLOW)
    set_boundary_x(dom, X - 1, GEO.OUTFLOW_RIGHT)
    set_boundary_y(dom, 0, GEO.WALL)
    set_boundary_y(dom, Y - 1, GEO.WALL)

    # wall with a hole
    cx = int(np.floor(0.20 / phys_dl))
    width = max(Y // 10, 1)
    for px in range(cx, min(cx + width + 1, X)):
        for py in range(1, Y - 1):
            if not (Y * 4 // 10 <= py <= Y * 6 // 10):
                dom.map[px, py] = int(GEO.WALL)

    cfg = LBMConfig(lat=D2Q9, collision=col2.collide_clbm_2d)
    sim = Sim2D1(
        cfg, dom,
        sim_id=f"sim2d_1_res{resolution:02d}",
        results_parent=results_parent,
        phys_final_time=final_time,
        use_fused=use_fused,
        plan=_plan(sharded, dom),
    )
    sim.lbm_inflow_vx = units.phys2lbm_velocity(phys_velocity)
    sim.cnt[PRINT].period = 0.01
    sim.cnt[VTK2D].period = 0.05
    from tnl_lbm_tpu.sim.state import Probe2DCut

    sim.probes_2d.append(Probe2DCut(axis=0, name="cut_X", position=X // 2))
    return sim


def _plan(sharded: bool, dom):
    if not sharded:
        return None
    from tnl_lbm_tpu.parallel.sharded import choose_plan

    return choose_plan(dom)


def main(argv=None):
    p = argparse.ArgumentParser("sim2d_1", description="2D channel with wall-with-hole (D2Q9 CLBM)")
    p.add_argument("resolution", type=int, nargs="?", default=1)
    p.add_argument("--final-time", type=float, default=0.5)
    p.add_argument("--results-dir", default=".")
    p.add_argument("--use-fused", action="store_true")
    p.add_argument("--sharded", action="store_true",
                   help="shard the lattice over all available devices")
    args = p.parse_args(argv)
    sim = build(args.resolution, args.final_time, args.results_dir,
                use_fused=args.use_fused, sharded=args.sharded)
    sim.run()


if __name__ == "__main__":
    main()
