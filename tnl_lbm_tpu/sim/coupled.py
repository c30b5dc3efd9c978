"""Coupled NSE + ADE dual-lattice simulation driver.

Analog of the reference ``State_NSE_ADE<NSE, ADE>`` (reference:
state_NSE_ADE.h:3-468): two lattices advanced by one fused step per
iteration - the flow (NSE) update runs first and its fresh velocity field
advects the scalar (ADE) update (reference kernels.h:153-161 copies the NSE
KernelStruct velocity into the ADE KernelStruct).  Each lattice has its own
viscosity/diffusivity; the ADE diffusion coefficient may be a field.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.ops import moments as mom
from tnl_lbm_tpu.sim.config import Domain, LBMConfig
from tnl_lbm_tpu.sim.state import Simulation
from tnl_lbm_tpu.sim.step_ade import make_ade_step, transfer_direction_flags


class CoupledSimulation(Simulation):
    """NSE lattice (inherited) + ADE lattice advanced in lock-step."""

    def __init__(
        self,
        cfg: LBMConfig,
        domain: Domain,
        ade_cfg: LBMConfig,
        ade_domain: Domain,
        ade_diffusion: float | np.ndarray = 1e-3,
        transfer_coeff: float = 0.0,
        phi_inflow: float | None = None,
        **kw,
    ):
        super().__init__(cfg, domain, **kw)
        self.ade_cfg = ade_cfg
        self.ade_domain = ade_domain
        self.ade_diffusion = ade_diffusion
        self.transfer_coeff = transfer_coeff
        self.phi_inflow = phi_inflow
        self.g = None     # ADE DFs
        self.phi = None   # ADE macro
        self._transfer_dirs = None
        #: which coupled kernel sim_init selected: "one-kernel-AA" /
        #: "one-kernel-AB" / "two-kernel" / "sharded" / "xla" (a config-time
        #: warning is logged when a requested A-A pattern degrades)
        self.coupled_kernel = None

    def initial_phi(self):
        """Initial scalar field (override in apps)."""
        return jnp.ones(self.ade_domain.shape, self.ade_cfg.compute_dtype)

    def checkpoint_arrays_extra(self):
        # the ADE lattice must survive a checkpoint/resume cycle too
        # (the reference saves ALL DF buffers, state.hpp:677-727)
        return {"g": self.g} if self.g is not None else {}

    def sim_init(self):
        super().sim_init()
        restored = getattr(self, "_restored_arrays", None)
        if restored is not None and "g" in restored:
            self.g = jnp.asarray(restored["g"], self.ade_cfg.compute_dtype)
            self.phi = mom.density(self.ade_cfg.lat, self.g)
        else:
            phi0 = self.initial_phi()
            u0 = jnp.zeros((3,) + self.ade_domain.shape, self.ade_cfg.compute_dtype)
            self.g = self.ade_cfg.eq(self.ade_cfg.lat, phi0, u0).astype(self.ade_cfg.compute_dtype)
            self.phi = phi0
        flags = transfer_direction_flags(self.ade_cfg.lat, self.ade_domain.map)
        self._transfer_dirs = jnp.asarray(flags)
        self._ade_fused = False
        self._coupled_step = None
        if self.plan is not None:
            # distributed dual-lattice run (reference multi-GPU
            # State_NSE_ADE): both lattices shard over the same mesh; the
            # sharded NSE step (self._step) feeds its sharded velocity
            # straight into the sharded ADE step
            from tnl_lbm_tpu.kernels.fused_ade import supports_ade
            from tnl_lbm_tpu.parallel.sharded import (
                make_sharded_ade_step,
                make_sharded_fused_ade_step,
            )

            self._map_ade_sharded = self.plan.shard_field(
                jnp.asarray(self.ade_domain.map), like_f=False)
            self._transfer_dirs = self.plan.shard_field(
                self._transfer_dirs, like_f=True)
            self.g = self.plan.shard_field(self.g, like_f=True)

            z_ok = (jax.default_backend() == "cpu"
                    or self.ade_domain.shape[-1] % 128 == 0)
            ax_z = self.plan.spatial_axes[2]
            z_unsharded = ax_z is None or self.plan.mesh.shape[ax_z] == 1
            if (self.use_fused and supports_ade(self.ade_domain)
                    and self.ade_cfg.streaming == "AB" and z_ok
                    and z_unsharded
                    and self.plan.divisible(self.ade_domain)):
                # round 3: the ADE half runs the Pallas kernel per shard
                # (2/1-wide x/y halo slabs, _pad_ade layout at the seams)
                sharded_ade_fused = make_sharded_fused_ade_step(
                    self.ade_cfg, self.ade_domain, self.plan,
                    variable_diffusion=not np.isscalar(self.ade_diffusion),
                    transfer_coeff=float(self.transfer_coeff),
                )

                def ade_step(g, u, nu_ade, phi_in=None, transfer_dirs=None,
                             transfer_coeff=0.0, parity=0, map_arr=None,
                             tflags=None):
                    del transfer_dirs, transfer_coeff, parity  # build-time
                    mp = map_arr if map_arr is not None else self._map_ade_sharded
                    return sharded_ade_fused(
                        g, u, mp, nu_ade,
                        phi_in=phi_in if phi_in is not None else 0.0,
                        tflags=tflags)

                # sharded transfer flags must enter jit as arguments in
                # multi-process runs (see get_jit)
                ade_step.sharded_consts = dict(
                    getattr(sharded_ade_fused, "sharded_consts", {}))
                self._ade_step = ade_step
                self._ade_fused = True
                self.coupled_kernel = "sharded-fused"
                return

            if self.use_fused:
                # mirror the single-chip branch's degradation warning:
                # use_fused was requested but the sharded Pallas ADE gate
                # failed - name why, so benchmark runs aren't silently XLA
                self.log.warning(
                    "use_fused requested but the sharded fused ADE gate "
                    "failed (supported codes: %s, AB streaming: %s, "
                    "Z%%128: %s, z unsharded: %s, divisible: %s); the ADE "
                    "half runs on the XLA sharded step",
                    supports_ade(self.ade_domain),
                    self.ade_cfg.streaming == "AB", z_ok, z_unsharded,
                    self.plan.divisible(self.ade_domain))
            sharded_ade = make_sharded_ade_step(
                self.ade_cfg, self.ade_domain, self.plan)

            def ade_step(g, u, nu_ade, phi_in=None, transfer_dirs=None,
                         transfer_coeff=0.0, parity=0, map_arr=None):
                mp = map_arr if map_arr is not None else self._map_ade_sharded
                return sharded_ade(
                    g, u, mp, nu_ade, phi_in=phi_in,
                    transfer_dirs=transfer_dirs,
                    transfer_coeff=transfer_coeff, parity=parity,
                )

            self._ade_step = ade_step
            self.coupled_kernel = "sharded"
            return
        if self.use_fused:
            from tnl_lbm_tpu.kernels.fused_ade import make_fused_ade_step, supports_ade

            z_ok = (jax.default_backend() == "cpu"
                    or self.ade_domain.shape[-1] % 128 == 0)
            ade_ok = (supports_ade(self.ade_domain)
                      and self.ade_cfg.streaming == "AB" and z_ok)
            if ade_ok:
                # variable per-site diffusion and the conjugate TRANSFER_*
                # BCs ride the fused kernel too (kernels/fused_ade.py)
                fused = make_fused_ade_step(
                    self.ade_cfg, self.ade_domain,
                    variable_diffusion=not np.isscalar(self.ade_diffusion),
                    transfer_coeff=float(self.transfer_coeff),
                )

                def ade_step(g, u, nu_ade, phi_in=None, transfer_dirs=None,
                             transfer_coeff=0.0, parity=0):
                    del transfer_dirs, transfer_coeff, parity
                    return fused(g, u, nu_ade,
                                 phi_in=phi_in if phi_in is not None else 0.0)

                self._ade_step = ade_step
                self._ade_fused = True
            else:
                self._ade_step = make_ade_step(self.ade_cfg, self.ade_domain)
            if (self._fused_ok() and self.cfg.forcing_hook is None
                    and supports_ade(self.ade_domain) and z_ok
                    and self.cfg.streaming == self.ade_cfg.streaming
                    and self.domain.shape == self.ade_domain.shape):
                # both halves in ONE kernel: the NSE velocity never
                # round-trips through HBM (reference kernels.h:102-176);
                # the A-A pair gives the coupled run the A-A memory pattern
                # the reference's compile-time switch would select
                from tnl_lbm_tpu.kernels.fused_coupled import (
                    make_fused_coupled_step,
                    make_fused_coupled_step_aa,
                )

                try:
                    if self.cfg.streaming == "AA":
                        self._coupled_step = make_fused_coupled_step_aa(
                            self.cfg, self.domain,
                            self.ade_cfg, self.ade_domain,
                            variable_diffusion=not np.isscalar(self.ade_diffusion),
                        )
                        self.coupled_kernel = "one-kernel-AA"
                    else:
                        self._coupled_step = make_fused_coupled_step(
                            self.cfg, self.domain,
                            self.ade_cfg, self.ade_domain,
                            variable_diffusion=not np.isscalar(self.ade_diffusion),
                            transfer_coeff=float(self.transfer_coeff),
                        )
                        self.coupled_kernel = "one-kernel-AB"
                except NotImplementedError as exc:
                    # e.g. A-A + transfer BCs: the two-kernel path runs
                    self._coupled_step = None
                    self.coupled_kernel = "two-kernel"
                    self.log.warning(
                        "coupled one-kernel %s path unavailable (%s); "
                        "running the TWO-kernel path - the ADE half uses "
                        "the A-B-pattern fused kernel, not the requested "
                        "A-A memory pattern", self.cfg.streaming, exc)
            if self.coupled_kernel is None:
                self.coupled_kernel = "two-kernel"
            if not ade_ok and self._coupled_step is None:
                self.log.warning(
                    "use_fused requested but the ADE lattice is unsupported "
                    "by the fused kernel; running the ADE half on XLA"
                )
        else:
            self._ade_step = make_ade_step(self.ade_cfg, self.ade_domain)
            self.coupled_kernel = "xla"

    def _advance(self, n_steps: int):
        """One fused coupled step per iteration (NSE then ADE)."""
        import time as _time

        def get_jit(parity, have_uin, have_force):
            key = ("coupled", parity, have_uin, have_force)
            if key in self._jit_steps:
                return self._jit_steps[key]
            nse_step = self._step
            ade_step = self._ade_step
            one_kernel = self._coupled_step

            if self.plan is not None:
                # both sharded maps enter jit as ARGUMENTS (see
                # state._jit_step: a closed-over multi-process array cannot
                # become an HLO constant) - and so do any other sharded
                # arrays the step builders materialized (transfer flags,
                # bouzidi, fluid masks), exposed via step.sharded_consts
                nse_sc = dict(getattr(nse_step, "sharded_consts", None) or {})
                ade_sc = dict(getattr(ade_step, "sharded_consts", None) or {})
                nse_names, ade_names = sorted(nse_sc), sorted(ade_sc)
                nse_vals0 = tuple(nse_sc[k] for k in nse_names)
                ade_vals0 = tuple(ade_sc[k] for k in ade_names)

                def coupled(f, g, mp, mp_ade, nu, nu_ade, u_in, force,
                            phi_in, tdirs, tcoef, nse_vals, ade_vals):
                    f_new, rho, u = nse_step(
                        f, mp, nu,
                        u_in=u_in if have_uin else None,
                        force=force if have_force else None,
                        parity=parity,
                        **dict(zip(nse_names, nse_vals)),
                    )
                    g_new, phi = ade_step(
                        g, u, nu_ade,
                        phi_in=phi_in,
                        transfer_dirs=tdirs,
                        transfer_coeff=tcoef,
                        parity=parity,
                        map_arr=mp_ade,
                        **dict(zip(ade_names, ade_vals)),
                    )
                    return f_new, g_new, rho, u, phi

                inner = jax.jit(coupled, donate_argnums=(0, 1))
                jfn = lambda f, g, nu, nu_ade, u_in, force, phi_in, tdirs, tcoef: (  # noqa: E731
                    inner(f, g, self._map_sharded, self._map_ade_sharded,
                          nu, nu_ade, u_in, force, phi_in, tdirs, tcoef,
                          nse_vals0, ade_vals0))
                self._jit_steps[key] = jfn
                return jfn
            elif one_kernel is not None:
                def coupled(f, g, nu, nu_ade, u_in, force, phi_in, tdirs, tcoef):
                    del tdirs, tcoef
                    return one_kernel(
                        f, g, nu, nu_ade,
                        u_in=u_in if have_uin else None,
                        force=force if have_force else None,
                        phi_in=phi_in,
                        parity=parity,
                    )
            else:
                def coupled(f, g, nu, nu_ade, u_in, force, phi_in, tdirs, tcoef):
                    f_new, rho, u = nse_step(
                        f, nu,
                        u_in=u_in if have_uin else None,
                        force=force if have_force else None,
                        parity=parity,
                    )
                    g_new, phi = ade_step(
                        g, u, nu_ade,
                        phi_in=phi_in,
                        transfer_dirs=tdirs,
                        transfer_coeff=tcoef,
                        parity=parity,
                    )
                    return f_new, g_new, rho, u, phi

            jfn = jax.jit(coupled, donate_argnums=(0, 1))
            self._jit_steps[key] = jfn
            return jfn

        dt = self.cfg.compute_dtype
        nu = self._dispatch_arg(self.domain.units.lbm_viscosity())
        nu_ade = self._dispatch_arg(self.ade_diffusion)
        tcoef = jnp.asarray(self.transfer_coeff, dt)
        zero = self._dispatch_arg(np.zeros(3))
        t0 = _time.perf_counter()
        for _ in range(n_steps):
            u_in = self.update_inflow(self.phys_time())
            force = self.body_force(self.phys_time())
            parity = (self.iterations % 2) if self.cfg.streaming == "AA" else 0
            phi_in = (
                jnp.asarray(self.phi_inflow, dt) if self.phi_inflow is not None else jnp.zeros((), dt)
            )
            jfn = get_jit(parity, u_in is not None, force is not None)
            self.f, self.g, self.rho, self.u, self.phi = jfn(
                self.f, self.g, nu, nu_ade,
                self._dispatch_arg(u_in) if u_in is not None else zero,
                self._dispatch_arg(force) if force is not None else zero,
                phi_in, self._transfer_dirs, tcoef,
            )
            self.iterations += 1
            self.compute_after_step()
        if n_steps:
            jax.block_until_ready(self.f)
            self._compute_time += _time.perf_counter() - t0

    def output_data(self):
        scalars, vectors = super().output_data()
        scalars["phi"] = self._host(self.phi)  # multi-process-safe gather
        return scalars, vectors
