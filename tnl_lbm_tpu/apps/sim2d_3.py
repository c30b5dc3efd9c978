"""sim2d_3: minimal 2D geometry channel -> single KE-integral value.

Analog of reference sim_2D/sim2d_3.cu: loads a geometry file (per-cell type
+ Bouzidi thetas), runs a D2Q9 CLBM channel with parabolic inflow for 4
physical seconds, and writes the instantaneous kinetic-energy integral over
the ROI x in [0.5 X, 0.75 X), y interior, to ``values/value_<geom>`` - the
single-number regression output consumed by run_all_geometries
(reference sim2d_3.cu:221-260).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from tnl_lbm_tpu.io.geometry import load_geometry_file
from tnl_lbm_tpu.models import D2Q9
from tnl_lbm_tpu.ops import collision_2d as col2
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig
from tnl_lbm_tpu.sim.obstacles import set_boundary_x, set_boundary_y
from tnl_lbm_tpu.sim.state import Simulation
from tnl_lbm_tpu.utils import Lattice
from tnl_lbm_tpu.utils.fileutils import mkdir_p


class Sim2D3(Simulation):
    u_max_lbm: float = 0.0
    value_path: Path | None = None

    def update_inflow(self, phys_time):
        # parabolic profile between the walls (reference sim2d_3.cu:36-56)
        Y = self.domain.shape[1]
        y0, y1 = 1, Y - 2
        s = np.clip((np.arange(Y) - y0) / max(y1 - y0, 1), 0.0, 1.0)
        prof = np.zeros((2, 1, Y))
        prof[0, 0] = self.u_max_lbm * 4.0 * s * (1.0 - s)
        return prof

    def integrate_ke_roi(self) -> float:
        """0.5 (u^2 + v^2) over x in [X/2, 3X/4), interior y, fluid only
        (reference sim2d_3.cu:221-247)."""
        import jax

        units = self.domain.units
        X, Y = self.domain.shape
        x0, x1 = max(1, X // 2), min(X - 1, int(np.ceil(0.75 * X)))
        u = self._host(self.u) * units.lbm2phys_velocity(1.0)
        fluid = np.isin(self.domain.map, [int(GEO.FLUID), int(GEO.FLUID_NEAR_WALL)])
        roi = np.zeros_like(fluid)
        roi[x0:x1, 1 : Y - 1] = True
        sel = fluid & roi
        ke = 0.5 * (u[0] ** 2 + u[1] ** 2)
        return float((ke * sel).sum() * units.phys_dl**2)

    def after_sim_finished(self):
        value = self.integrate_ke_roi()
        if self.value_path is not None:
            mkdir_p(self.value_path.parent)
            self.value_path.write_text(f"{value:.17g}\n")
            self.log.info("KE value %.17g -> %s", value, self.value_path)
        self.ke_value = value
        super().after_sim_finished()


def build(
    resolution: int = 1,
    object_file: str | None = None,
    enable_bouzidi: bool = True,
    final_time: float = 4.0,
    results_parent=".",
    values_dir="values",
    use_fused: bool = True,
    sharded: bool = False,
):
    X = 128 * resolution
    Y = 32 * resolution
    lbm_viscosity = 1.0e-3
    phys_height = 0.50
    phys_viscosity = 1.0e-3
    phys_velocity = 1.0
    phys_dl = phys_height / (Y - 2)
    phys_dt = lbm_viscosity / phys_viscosity * phys_dl * phys_dl

    units = Lattice(
        global_size=(X, Y), phys_origin=(0, 0), phys_dl=phys_dl, phys_dt=phys_dt,
        phys_viscosity=phys_viscosity,
    )

    if object_file:
        m, bz = load_geometry_file(object_file, X, Y, use_bouzidi_for_type1=enable_bouzidi)
        if not enable_bouzidi:
            bz = None
    else:
        m, bz = np.zeros((X, Y), np.uint8), None

    dom = Domain(lat=D2Q9, units=units, map=m, bouzidi=bz)
    set_boundary_x(dom, 0, GEO.INFLOW)
    set_boundary_x(dom, X - 1, GEO.OUTFLOW_RIGHT)
    set_boundary_y(dom, 1, GEO.WALL)
    set_boundary_y(dom, Y - 2, GEO.WALL)
    set_boundary_y(dom, 0, GEO.NOTHING)
    set_boundary_y(dom, Y - 1, GEO.NOTHING)

    cfg = LBMConfig(lat=D2Q9, collision=col2.collide_clbm_2d)
    obj_name = Path(object_file).name if object_file else "none"
    sim = Sim2D3(
        cfg, dom,
        sim_id=f"sim2d_3_res{resolution:02d}_{Path(obj_name).stem}",
        results_parent=results_parent,
        phys_final_time=final_time,
        steps_per_dispatch=20,
        # Bouzidi + the full BC set ride the fused D2Q9 Pallas kernel
        # (kernels/fused_2d.py); unsupported configs fall back to XLA
        use_fused=use_fused,
        plan=_plan(sharded, dom),
    )
    sim.u_max_lbm = units.phys2lbm_velocity(1.5 * phys_velocity)
    sim.value_path = Path(values_dir) / f"value_{obj_name}"
    return sim


def _plan(sharded: bool, dom):
    if not sharded:
        return None
    from tnl_lbm_tpu.parallel.sharded import choose_plan

    return choose_plan(dom)


def main(argv=None):
    p = argparse.ArgumentParser("sim2d_3", description="2D geometry channel -> KE value")
    p.add_argument("resolution", type=int, nargs="?", default=1)
    p.add_argument("object_file", nargs="?", default=None)
    p.add_argument("--no-bouzidi", action="store_true")
    p.add_argument("--sharded", action="store_true",
                   help="shard the lattice over all available devices")
    p.add_argument("--final-time", type=float, default=4.0)
    p.add_argument("--results-dir", default=".")
    p.add_argument("--values-dir", default="values")
    args = p.parse_args(argv)
    sim = build(
        args.resolution, args.object_file, not args.no_bouzidi,
        args.final_time, args.results_dir, args.values_dir,
        sharded=args.sharded,
    )
    sim.run()


if __name__ == "__main__":
    main()
