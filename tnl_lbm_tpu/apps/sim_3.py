"""sim_3: 3D flow past a sphere at a given Reynolds number.

Analog of reference sim_NSE/sim_3.cu: rasterized solid sphere in a channel,
D3Q27 cumulant, equilibrium inflow, interpolated outflow.

Usage: python -m tnl_lbm_tpu.apps.sim_3 [resolution] [--re RE]
"""

from __future__ import annotations

import argparse

import numpy as np

from tnl_lbm_tpu.models import D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig
from tnl_lbm_tpu.sim.obstacles import draw_sphere, set_boundary_x, set_boundary_y, set_boundary_z
from tnl_lbm_tpu.sim.state import PRINT, VTK2D, Probe2DCut, Simulation
from tnl_lbm_tpu.utils import Lattice


class Sim3(Simulation):
    lbm_inflow_vx: float = 0.0

    def update_inflow(self, phys_time):
        return np.array([self.lbm_inflow_vx, 0.0, 0.0])


def build(resolution: int = 1, re: float = 100.0, final_time: float = 1.0,
          results_parent=".", use_fused: bool = True,
          sharded: bool = False):
    X = 128 * resolution
    Y = Z = 32 * resolution
    lbm_viscosity = 1e-2
    phys_height = 0.41
    phys_dl = phys_height / (Y - 2)
    phys_velocity = 1.0
    sphere_d = 0.1 * phys_height * 2  # diameter ~ 1/5 of height
    phys_viscosity = phys_velocity * sphere_d / re
    phys_dt = lbm_viscosity / phys_viscosity * phys_dl * phys_dl

    units = Lattice(
        global_size=(X, Y, Z), phys_origin=(0.0, 0.0, 0.0),
        phys_dl=phys_dl, phys_dt=phys_dt, phys_viscosity=phys_viscosity,
    )
    dom = Domain(lat=D3Q27, units=units, map=np.zeros((X, Y, Z), np.uint8))
    set_boundary_x(dom, 0, GEO.INFLOW)
    set_boundary_x(dom, X - 1, GEO.OUTFLOW_RIGHT_INTERP)
    for axis_set in ((1, set_boundary_y), (2, set_boundary_z)):
        _, setter = axis_set
        setter(dom, 0, GEO.WALL)
        setter(dom, (Y if setter is set_boundary_y else Z) - 1, GEO.WALL)

    cx = 0.2 * (X * units.phys_dl)
    cy = 0.5 * (Y * units.phys_dl)
    cz = 0.5 * (Z * units.phys_dl)
    draw_sphere(dom, (cx, cy, cz), sphere_d / 2, GEO.WALL)

    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum)
    sim = Sim3(
        cfg, dom,
        sim_id=f"sim_3_res{resolution:02d}_re{int(re)}",
        steps_per_dispatch=10,
        results_parent=results_parent,
        phys_final_time=final_time,
        use_fused=use_fused,
        plan=_plan(sharded, dom),
    )
    sim.lbm_inflow_vx = units.phys2lbm_velocity(phys_velocity)
    sim.cnt[PRINT].period = final_time / 100
    sim.cnt[VTK2D].period = final_time / 10
    sim.probes_2d.append(Probe2DCut(axis=2, name="cut_Z", position=Z // 2))
    return sim


def _plan(sharded: bool, dom):
    if not sharded:
        return None
    from tnl_lbm_tpu.parallel.sharded import choose_plan

    return choose_plan(dom)


def main(argv=None):
    p = argparse.ArgumentParser("sim_3", description="3D flow past a sphere (D3Q27 cumulant)")
    p.add_argument("resolution", type=int, nargs="?", default=1)
    p.add_argument("--re", type=float, default=100.0)
    p.add_argument("--sharded", action="store_true",
                   help="shard the lattice over all available devices")
    p.add_argument("--final-time", type=float, default=1.0)
    p.add_argument("--results-dir", default=".")
    p.add_argument("--no-fused", action="store_true")
    args = p.parse_args(argv)
    sim = build(args.resolution, args.re, args.final_time, args.results_dir,
                use_fused=not args.no_fused, sharded=args.sharded)
    sim.run()


if __name__ == "__main__":
    main()
