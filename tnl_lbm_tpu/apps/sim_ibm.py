"""sim_ibm: 3D channel flow past an immersed-boundary cylinder.

Analog of the reference's IBM-coupled simulations (reference
lagrange_3D.hpp + obstacles_ibm.h:69-131 cylinder setup): a Lagrangian point
cylinder immersed in a D3Q27 channel, Wu-Shu velocity-correction forces
solved each step inside the fused step's forcing hook, with
- Lagrangian point cloud written as VTK POLYDATA alongside the 3D cuts
  (reference vtk_writer.h + state.hpp:76-113 writeVTKs_points), and
- the integrated body force (drag) logged to the "ibm" logger each PRINT
  period (reference lagrange_3D.hpp:862-890 integrateForce).

Usage: python -m tnl_lbm_tpu.apps.sim_ibm [resolution] [--dirac phi2]
"""

from __future__ import annotations

import argparse

import numpy as np

from tnl_lbm_tpu.ibm import IBM
from tnl_lbm_tpu.ibm.generators import points_cylinder
from tnl_lbm_tpu.io.vtk import write_points_vtk
from tnl_lbm_tpu.models import D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig
from tnl_lbm_tpu.sim.obstacles import set_boundary_x, set_boundary_y, set_boundary_z
from tnl_lbm_tpu.sim.state import PRINT, PROBE1, VTK2D, Probe2DCut, Simulation


class SimIBM(Simulation):
    """Channel + IBM cylinder; writes the point cloud with each 2D cut."""

    lbm_inflow_vx: float = 0.0
    ibm: IBM | None = None

    def update_inflow(self, phys_time):
        return np.array([self.lbm_inflow_vx, 0.0, 0.0])

    def probe1(self):
        # drag diagnostic: integrate the spread force over the lattice
        # (reference lagrange_3D.hpp:862-890 integrateForce)
        if self.ibm is not None and self.u is not None:
            import jax.numpy as jnp

            rho = self.rho if self.rho is not None else jnp.ones(self.domain.shape)
            force = self.ibm.compute_forces(self.u, rho)
            fx, fy, fz = self.ibm.integrate_force(force)
            self.ibm.log.info(
                '{"ibm": "integrateForce", "iteration": %d, "fx": %.6e, "fy": %.6e, "fz": %.6e}',
                self.iterations, fx, fy, fz,
            )

    def _write_vtk_2d(self):
        super()._write_vtk_2d()
        if self.ibm is not None:
            d = self.results_dir / "ibm_points"
            d.mkdir(parents=True, exist_ok=True)
            write_points_vtk(
                d / f"points_{self.cnt[VTK2D].count:05d}.vtk",
                self.ibm.points_phys, time=self.phys_time(),
            )


def build(resolution: int = 1, dirac: str = "phi2", method: str = "modified",
          final_time: float = 0.5, results_parent=".", use_fused: bool = True,
          sharded: bool = False):
    from tnl_lbm_tpu.utils import Lattice

    X = 96 * resolution
    Y = 32 * resolution
    Z = 32 * resolution
    lbm_viscosity = 5e-3
    phys_height = 0.41
    phys_dl = phys_height / (Y - 2)
    phys_velocity = 1.0
    cyl_d = 0.25 * phys_height
    re = 100.0
    phys_viscosity = phys_velocity * cyl_d / re
    phys_dt = lbm_viscosity / phys_viscosity * phys_dl * phys_dl

    units = Lattice(
        global_size=(X, Y, Z), phys_origin=(0.0, 0.0, 0.0),
        phys_dl=phys_dl, phys_dt=phys_dt, phys_viscosity=phys_viscosity,
    )
    dom = Domain(lat=D3Q27, units=units, map=np.zeros((X, Y, Z), np.uint8))
    set_boundary_x(dom, 0, GEO.INFLOW)
    set_boundary_x(dom, X - 1, GEO.OUTFLOW_EQ)
    set_boundary_y(dom, 0, GEO.WALL)
    set_boundary_y(dom, Y - 1, GEO.WALL)
    set_boundary_z(dom, 0, GEO.WALL)
    set_boundary_z(dom, Z - 1, GEO.WALL)

    # Lagrangian cylinder spanning the z-extent, centered at 1/4 channel
    cx = 0.25 * X * phys_dl
    cy = 0.5 * Y * phys_dl
    cz = 0.5 * Z * phys_dl
    sigma = 0.7 * phys_dl  # point spacing < dl (reference obstacles_ibm.h:90)
    pts = points_cylinder((cx, cy, cz), cyl_d, (Z - 4) * phys_dl, sigma, axis=2)
    ibm = IBM(units, pts, dirac=dirac, method=method)
    lo, hi = ibm.min_max_spacing()
    ibm.log.info(
        '{"ibm": "setup", "points": %d, "min_spacing": %.4e, "max_spacing": %.4e}',
        ibm.m, lo, hi,
    )

    plan = None
    if sharded:
        from tnl_lbm_tpu.parallel.sharded import choose_plan

        # shard-aware IBM: ownership-partitioned interpolate/spread + psum
        # inside shard_map (ibm/lagrange.py sharded_hook)
        plan = choose_plan(dom)
        hook = ibm.sharded_hook(plan, dom.shape)
    else:
        hook = ibm.forcing_hook()
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum, forcing_hook=hook)
    sim = SimIBM(
        cfg, dom,
        sim_id=f"sim_ibm_res{resolution:02d}_{dirac}_{method}",
        results_parent=results_parent,
        phys_final_time=final_time,
        # IBM rides the fused Pallas path: u* pass + hook + force-field
        # kernel (kernels/hooked.py); falls back to XLA when unsupported
        use_fused=use_fused,
        plan=plan,
    )
    sim.ibm = ibm
    sim.lbm_inflow_vx = units.phys2lbm_velocity(phys_velocity)
    sim.cnt[PRINT].period = final_time / 50
    sim.cnt[PROBE1].period = final_time / 50
    sim.cnt[VTK2D].period = final_time / 10
    sim.probes_2d.append(Probe2DCut(axis=2, name="cut_Z", position=Z // 2))
    return sim


def main(argv=None):
    p = argparse.ArgumentParser("sim_ibm", description="channel flow past an IBM cylinder")
    p.add_argument("resolution", type=int, nargs="?", default=1)
    p.add_argument("--dirac", default="phi2", choices=["phi1", "phi2", "phi3", "phi4"])
    p.add_argument("--method", default="modified", choices=["modified", "original"])
    p.add_argument("--sharded", action="store_true",
                   help="shard the lattice over all available devices")
    p.add_argument("--final-time", type=float, default=0.5)
    p.add_argument("--results-dir", default=".")
    p.add_argument("--no-fused", action="store_true",
                   help="force the XLA step (skip the Pallas kernels)")
    args = p.parse_args(argv)
    sim = build(args.resolution, args.dirac, args.method, args.final_time,
                args.results_dir, use_fused=not args.no_fused,
                sharded=args.sharded)
    sim.run()


if __name__ == "__main__":
    main()
