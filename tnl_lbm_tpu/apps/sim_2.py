"""sim_2: square-duct verification + scaling benchmark.

Analog of reference sim_NSE/sim_2.cu: laminar flow in a square duct driven by
a body force (periodic in x) or by an analytical-profile inflow
(INFLOW_LEFT + OUTFLOW_RIGHT_INTERP), verified against the Fourier-series
analytical solution with L1/L2 error norms and a dynamic steady-state
stopping criterion (reference sim_2.cu:63-113, 193-257).

Scaling modes (reference sim_2.cu:289-297): ``strong`` keeps the global
lattice fixed; ``weak_1d`` multiplies X by the device count; ``weak_3d``
scales the volume by the device count preserving proportions.

Usage: python -m tnl_lbm_tpu.apps.sim_2 RES [--scaling strong|weak_1d|weak_3d]
       [--precision single|double] [--velocity] [--final-time T] [--sharded]
"""

from __future__ import annotations

import argparse

import numpy as np

from tnl_lbm_tpu.models import D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig
from tnl_lbm_tpu.sim.obstacles import set_boundary_x, set_boundary_y, set_boundary_z
from tnl_lbm_tpu.sim.state import PRINT, PROBE1, Simulation
from tnl_lbm_tpu.utils import Lattice


def duct_analytical_ux(Y: int, Z: int, fx_lbm: float, nu_lbm: float, n_terms: int = 50) -> np.ndarray:
    """Fourier-series solution of laminar flow in a rectangular duct.

    Returns the axial velocity profile [Y, Z] in lattice units for walls at
    y,z = 1 and N-2 (half-way bounce-back planes), matching the reference's
    stabilized exp formulation (reference sim_2.cu:63-88).
    """
    a = Y / 2.0 - 1.0
    b = Z / 2.0 - 1.0
    y = (np.arange(Y) + 0.5 - Y / 2.0) / a  # normalized by a
    z = (np.arange(Z) + 0.5 - Z / 2.0) / a
    yy, zz = np.meshgrid(y, z, indexing="ij")
    b_over_a = b / a
    omega = np.pi / 2.0
    total = np.zeros_like(yy)
    sign = 1.0
    for k in range(n_terms + 1):
        kk = 2.0 * k + 1.0
        # cosh(omega kk z)/cosh(omega kk b/a) in overflow-safe exp form
        ratio = (
            np.exp(omega * kk * (zz - b_over_a))
            * (1.0 + np.exp(-2.0 * omega * kk * zz))
            / (1.0 + np.exp(-2.0 * omega * kk * b_over_a))
        )
        total += sign * (1.0 - ratio) * np.cos(omega * kk * yy) / kk**3
        sign = -sign
    ux = fx_lbm * 16.0 * a * a / np.pi**3 * total / nu_lbm
    ux[0, :] = ux[-1, :] = 0.0
    ux[:, 0] = ux[:, -1] = 0.0
    return ux


class Sim2(Simulation):
    """Duct verification state with error probes + dynamic stopping."""

    def __init__(self, *args, fx_lbm=0.0, u_profile=None, analytical=None, **kw):
        super().__init__(*args, **kw)
        self.fx_lbm = fx_lbm
        self.u_profile = u_profile  # [3, 1, Y, Z] inflow profile or None
        self.analytical = analytical  # [Y, Z] lattice-unit ux
        self.l1_history = [1.0] * 10
        self._err_idx = 0
        self.last_errors = (np.inf, np.inf)

    def body_force(self, phys_time):
        if self.fx_lbm:
            return np.array([self.fx_lbm, 0.0, 0.0])
        return None

    def update_inflow(self, phys_time):
        return self.u_profile

    def probe1(self):
        """L1/L2 error vs analytic + dynamic stopping
        (reference sim_2.cu:193-257)."""
        import jax

        units = self.domain.units
        # gather only ux: self.u[0] slices under SPMD before the all-gather,
        # 1/3 the cross-host bytes of replicating the full vector field
        ux = self._host(self.u[0])
        diff = np.abs(ux[1:-1, 1:-1, 1:-1] - self.analytical[None, 1:-1, 1:-1])
        dl3 = units.phys_dl**3
        to_phys = units.lbm2phys_velocity(1.0)
        l1 = to_phys * diff.sum() * dl3
        l2 = to_phys * np.sqrt((diff**2).sum() * dl3)
        self.last_errors = (l1, l2)

        prev = np.mean(self.l1_history)
        stddev = np.std(self.l1_history, ddof=1)
        stopping = abs(prev - l1) / l1 if l1 > 0 else 0.0
        if stopping < 1e-4 and stddev < 1e-3:
            self.terminate = True
            if self.is_coordinator:
                self.flags.create("finished")  # converged, not an error
            self.terminate_reason = "converged"
        self._err_idx = (self._err_idx + 1) % len(self.l1_history)
        self.l1_history[self._err_idx] = l1
        self.log.info(
            "at t=%.2fs, iterations=%d l1error_phys=%e l2error_phys=%e stopping=%e",
            self.phys_time(), self.iterations, l1, l2, stopping,
        )

    def output_data(self):
        import jax

        units = self.domain.units
        rho = self._host(self.rho)
        u = self._host(self.u)
        scalars = {
            "lbm_density": rho,
            "error_ux": np.abs(u[0] - self.analytical[None]) * units.lbm2phys_velocity(1.0),
        }
        vectors = {"velocity": u * units.lbm2phys_velocity(1.0)}
        return scalars, vectors


def build(
    resolution: int = 2,
    use_forcing: bool = True,
    scaling: str = "strong",
    precision: str = "single",
    storage: str = "full",
    final_time: float = 200.0,
    results_parent=".",
    n_devices: int = 1,
    sharded: bool = False,
    streaming: str = "AB",
    use_fused: bool = False,
    pair_dispatch="auto",
    profile_dir=None,
):
    import jax.numpy as jnp

    block_size = 32
    X = block_size if use_forcing else block_size * resolution
    Y = Z = block_size * resolution
    if scaling == "weak_1d":
        X *= n_devices
    elif scaling == "weak_3d":
        factor = n_devices ** (1.0 / 3.0)
        X, Y, Z = (int(round(v * factor)) for v in (X, Y, Z))

    lbm_viscosity = 0.001
    phys_viscosity = 1.5e-5
    phys_height = 0.25
    phys_dl = phys_height / (Z - 2)
    phys_dt = lbm_viscosity / phys_viscosity * phys_dl * phys_dl
    units = Lattice(
        global_size=(X, Y, Z), phys_origin=(0, 0, 0),
        phys_dl=phys_dl, phys_dt=phys_dt, phys_viscosity=phys_viscosity,
    )
    dom = Domain(
        lat=D3Q27, units=units, map=np.zeros((X, Y, Z), np.uint8),
        periodic=(use_forcing, False, False),
    )
    set_boundary_z(dom, 1, GEO.WALL)
    set_boundary_z(dom, Z - 2, GEO.WALL)
    set_boundary_y(dom, 1, GEO.WALL)
    set_boundary_y(dom, Y - 2, GEO.WALL)
    set_boundary_z(dom, 0, GEO.NOTHING)
    set_boundary_z(dom, Z - 1, GEO.NOTHING)
    set_boundary_y(dom, 0, GEO.NOTHING)
    set_boundary_y(dom, Y - 1, GEO.NOTHING)
    if not use_forcing:
        set_boundary_x(dom, 0, GEO.INFLOW_LEFT)
        set_boundary_x(dom, X - 1, GEO.OUTFLOW_RIGHT_INTERP)

    fx_phys = 1e-4
    fx_lbm = units.phys2lbm_force(fx_phys)
    analytical = duct_analytical_ux(Y, Z, fx_lbm, lbm_viscosity)

    # well-conditioned cumulant: deviation DF storage keeps the tiny duct
    # forcing well above float32 round-off on TPU (see ops/collision.py)
    from tnl_lbm_tpu.ops import equilibrium as eqlib

    cfg = LBMConfig(
        lat=D3Q27,
        collision=col.collide_cum_well,
        eq=eqlib.eq_well,
        well=True,
        streaming=streaming,
        compute_dtype=jnp.float64 if precision == "double" else jnp.float32,
        # FP16S half storage (pair2 path only): quantifies the accuracy
        # cost right here - the duct L1/L2 error probes compare against
        # the analytic solution either way (kernels/fused_aa.py)
        storage_dtype={"full": None, "f16": jnp.float16,
                       "bf16": jnp.bfloat16}[storage],
    )

    plan = None
    if sharded:
        from tnl_lbm_tpu.parallel.sharded import choose_plan

        # cost-driven mesh choice (weighted-interface-area optimizer,
        # analog of reference lattice_decomposition.h:67-110)
        plan = choose_plan(dom)

    u_profile = None
    fx_run = fx_lbm
    if not use_forcing:
        prof = np.zeros((3, 1, Y, Z), np.float64)
        prof[0, 0] = analytical
        u_profile = prof
        fx_run = 0.0

    sim_id = (
        f"sim_2_CUM_{precision}_{'forcing' if use_forcing else 'velocity'}_"
        f"{scaling}_res_{resolution}_nd_{n_devices}"
    )
    if storage != "full":
        sim_id += f"_store_{storage}"
    sim = Sim2(
        cfg, dom,
        sim_id=sim_id,
        results_parent=results_parent,
        phys_final_time=final_time,
        plan=plan,
        fx_lbm=fx_run,
        u_profile=u_profile,
        analytical=analytical,
        steps_per_dispatch=10,
        use_fused=use_fused,
        pair_dispatch=pair_dispatch,
        profile_dir=profile_dir,
    )
    sim.cnt[PRINT].period = 10.0
    sim.cnt[PROBE1].period = 1.0
    if scaling == "weak_3d":
        factor = (Y - 2) / float(block_size * resolution - 2) * resolution / 2
        sim.cnt[PRINT].period /= factor
        sim.cnt[PROBE1].period /= factor
        sim.phys_final_time /= factor
    return sim


def main(argv=None):
    p = argparse.ArgumentParser("sim_2", description="square-duct verification + scaling benchmark")
    p.add_argument("resolution", type=int, nargs="?", default=2)
    p.add_argument("--scaling", choices=["strong", "weak_1d", "weak_3d"], default="strong")
    p.add_argument("--precision", choices=["single", "double"], default="single")
    p.add_argument("--storage", choices=["full", "f16", "bf16"], default="full",
                   help="16-bit at-rest DF storage on the A-A pair path "
                        "(FP16S; implies --streaming AA --use-fused "
                        "--pair-dispatch on)")
    p.add_argument("--velocity", action="store_true", help="profile-inflow instead of body force")
    p.add_argument("--final-time", type=float, default=200.0)
    p.add_argument("--results-dir", default=".")
    p.add_argument("--sharded", action="store_true")
    p.add_argument("--pair-dispatch", choices=["auto", "on", "off"], default="auto")
    p.add_argument("--streaming", choices=["AB", "AA"], default="AB")
    p.add_argument("--use-fused", action="store_true",
                   help="run the Pallas fused kernels (A-B or A-A pair)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace into DIR and log the "
                        "measured wall-time split (compute/comm/overlap)")
    args = p.parse_args(argv)

    import jax

    if args.precision == "double":
        jax.config.update("jax_enable_x64", True)
    if args.storage != "full":
        # half storage exists only on the one-kernel A-A pair path
        args.streaming, args.use_fused, args.pair_dispatch = "AA", True, "on"
    n_devices = len(jax.devices()) if args.sharded else 1
    sim = build(
        args.resolution,
        use_forcing=not args.velocity,
        scaling=args.scaling,
        precision=args.precision,
        storage=args.storage,
        final_time=args.final_time,
        results_parent=args.results_dir,
        n_devices=n_devices,
        sharded=args.sharded,
        pair_dispatch={"auto": "auto", "on": True, "off": False}[args.pair_dispatch],
        streaming=args.streaming,
        use_fused=args.use_fused,
        profile_dir=args.profile,
    )
    ok = sim.run()
    l1, l2 = sim.last_errors
    print(f"final l1error_phys={l1:e} l2error_phys={l2:e} ok={ok}")


if __name__ == "__main__":
    main()
