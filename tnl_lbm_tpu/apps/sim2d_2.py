"""sim2d_2: 2D geometry channel with turbulence statistics.

Analog of reference sim_2D/sim2d_2.cu: geometry-file channel (per-cell type
+ Bouzidi thetas) with running-mean / fluctuation accumulators, freeze
logic (statistics stop accumulating after a set physical time so a
converged window is reported), ROI turbulent-kinetic-energy integral, and
periodic CSV statistic rows (reference sim2d_2.cu:52-133, 220-331, 667-701).
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path

import numpy as np

from tnl_lbm_tpu.io.geometry import load_geometry_file
from tnl_lbm_tpu.models import D2Q9
from tnl_lbm_tpu.ops import collision_2d as col2
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig
from tnl_lbm_tpu.sim.obstacles import set_boundary_x, set_boundary_y
from tnl_lbm_tpu.sim.state import PRINT, STAT_RESET, Simulation
from tnl_lbm_tpu.utils import Lattice


class Sim2D2(Simulation):
    u_max_lbm: float = 0.0
    stat_start_time: float = 0.0   # begin accumulating statistics here
    stat_freeze_time: float = np.inf  # stop accumulating (freeze) here
    csv_period: float = -1.0
    _csv_count = 0

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.collect_stats = True
        self._stats_frozen = False
        self.csv_rows = []

    def update_inflow(self, phys_time):
        Y = self.domain.shape[1]
        y0, y1 = 1, Y - 2
        s = np.clip((np.arange(Y) - y0) / max(y1 - y0, 1), 0.0, 1.0)
        prof = np.zeros((2, 1, Y))
        prof[0, 0] = self.u_max_lbm * 4.0 * s * (1.0 - s)
        return prof

    def compute_after_step(self):
        t = self.phys_time()
        # freeze logic: accumulators stop updating past the freeze time
        if self.collect_stats and t >= self.stat_freeze_time:
            self.collect_stats = False
            self._stats_frozen = True
            self.log.info("statistics frozen at t=%.4f (n=%d samples)", t, self.stat_counter)

    def roi_mask(self):
        X, Y = self.domain.shape
        fluid = np.isin(self.domain.map, [int(GEO.FLUID), int(GEO.FLUID_NEAR_WALL)])
        roi = np.zeros_like(fluid)
        roi[max(1, X // 2) : min(X - 1, int(np.ceil(0.75 * X))), 1 : Y - 1] = True
        return fluid & roi

    def integrate_tke_roi(self) -> float:
        """0.5 <u'^2 + v'^2> integrated over the ROI from the Welford
        accumulators (reference sim2d_2.cu ROI TKE integral)."""
        import jax

        if self.vm2 is None or self.stat_counter == 0:
            return 0.0
        units = self.domain.units
        sel = self.roi_mask()
        # vm2 rows for D=2: (xx, xy, yy); variance = S / n
        vm2 = np.asarray(jax.device_get(self.vm2))
        var_x = vm2[0] / self.stat_counter
        var_y = vm2[2] / self.stat_counter
        tke = 0.5 * (var_x + var_y) * units.lbm2phys_velocity(1.0) ** 2
        return float((tke * sel).sum() * units.phys_dl**2)

    def integrate_ke_roi(self) -> float:
        import jax

        units = self.domain.units
        u = np.asarray(jax.device_get(self.u)) * units.lbm2phys_velocity(1.0)
        sel = self.roi_mask()
        ke = 0.5 * (u[0] ** 2 + u[1] ** 2)
        return float((ke * sel).sum() * units.phys_dl**2)

    def probe1(self):
        """CSV statistics row (reference sim2d_2.cu:667-701)."""
        row = {
            "time": self.phys_time(),
            "iterations": self.iterations,
            "ke_roi": self.integrate_ke_roi(),
            "tke_roi": self.integrate_tke_roi(),
            "stat_samples": self.stat_counter,
            "frozen": self._stats_frozen,
        }
        self.csv_rows.append(row)
        path = self.results_dir / "stats.csv"
        write_header = not path.exists()
        with open(path, "a", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=list(row.keys()))
            if write_header:
                writer.writeheader()
            writer.writerow(row)


def build(
    resolution: int = 1,
    object_file: str | None = None,
    enable_bouzidi: bool = True,
    final_time: float = 8.0,
    stat_start: float = 2.0,
    stat_freeze: float = np.inf,
    results_parent=".",
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
    obj = Path(object_file).stem if object_file else "none"
    sim = Sim2D2(
        cfg, dom,
        sim_id=f"sim2d_2_res{resolution:02d}_{obj}",
        results_parent=results_parent,
        phys_final_time=final_time,
        steps_per_dispatch=10,
    )
    sim.u_max_lbm = units.phys2lbm_velocity(1.5 * phys_velocity)
    sim.stat_freeze_time = stat_freeze
    sim.cnt[PRINT].period = final_time / 20
    sim.cnt[STAT_RESET].period = stat_start  # one reset when stats should start
    from tnl_lbm_tpu.sim.state import PROBE1

    sim.cnt[PROBE1].period = final_time / 40
    return sim


def main(argv=None):
    p = argparse.ArgumentParser("sim2d_2", description="2D geometry channel with turbulence statistics")
    p.add_argument("resolution", type=int, nargs="?", default=1)
    p.add_argument("object_file", nargs="?", default=None)
    p.add_argument("--no-bouzidi", action="store_true")
    p.add_argument("--final-time", type=float, default=8.0)
    p.add_argument("--stat-start", type=float, default=2.0)
    p.add_argument("--stat-freeze", type=float, default=np.inf)
    p.add_argument("--results-dir", default=".")
    args = p.parse_args(argv)
    sim = build(
        args.resolution, args.object_file, not args.no_bouzidi,
        args.final_time, args.stat_start, args.stat_freeze, args.results_dir,
    )
    sim.run()
    print(f"final KE(ROI)={sim.integrate_ke_roi():e} TKE(ROI)={sim.integrate_tke_roi():e}")


if __name__ == "__main__":
    main()
