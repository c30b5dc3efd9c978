"""Simulation driver: lifecycle, counters, probes, output, checkpointing.

Analog of the reference ``State<NSE>`` + ``execute`` time loop (reference:
state.h:89-330, state.hpp:906-1311, core.h:38-101):

- lifecycle: ``sim_init`` -> loop { ``sim_update`` (one lattice step),
  ``after_sim_update`` (counter-gated actions) } -> ``after_sim_finished``;
- counter system with periods in *physical seconds* (wall seconds for
  SAVESTATE) (reference state.h:62-87);
- run-directory management: ``results_<id>`` with flock-based double-run
  protection and flag files (loadstate / finished / terminated)
  (reference state.h:294-303, state.hpp:12-66);
- probes: 1D line/axis cuts to text files, 2D plane cuts and 3D (sub-box,
  strided) cuts to .vti (reference state.hpp:123-511, lbm_block.hpp:799-1121);
- GLUPS performance reporting with incremental and final averages
  (reference state.hpp:1244-1311);
- NaN guard on density triggering terminate + diagnostic dump
  (reference state.hpp:1166-1188);
- walltime limit -> checkpoint + clean exit (reference core.h:60-68).

Differences by design (TPU-first): there is no per-rank anything - the mesh
is driven from a single Python process; device work is dispatched
asynchronously and host-side actions quantize to step granularity.  The NaN
scan runs on counter cadence rather than every step so it never stalls the
device pipeline.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.io.vtk import write_vti
from tnl_lbm_tpu.parallel import distributed as dist
from tnl_lbm_tpu.sim import checkpoint as ckpt
from tnl_lbm_tpu.sim.config import Domain, LBMConfig, initial_dfs
from tnl_lbm_tpu.sim.step import make_step
from tnl_lbm_tpu.utils.fileutils import FileLock, Flags, mkdir_p
from tnl_lbm_tpu.utils.logging_utils import get_logger, init_logging

# sentinel distinguishing "no precomputed inflow" from a None inflow
_UNSET = object()


def needs_per_step_state(fn):
    """Decorator marking a ``compute_before_step``/``compute_after_step``
    override as reading the per-step lattice state (``self.f``).

    Under pair dispatch the DFs live in a padded local buffer for the whole
    dispatch chunk and ``self.f`` holds the chunk-start snapshot - a hook
    reading it would silently see stale data.  Decorated hooks disable pair
    dispatch by construction (``_pair_dispatch_capable``), so they always
    observe fresh DFs.  Hooks that only read ``self.rho``/``self.u`` (fresh
    under pair dispatch too) need no marker.
    """
    fn.needs_per_step_state = True
    return fn

# counter names (reference state.h:73-87)
STAT_RESET = "stat_reset"
STAT2_RESET = "stat2_reset"
PRINT = "print"
VTK1D = "vtk1d"
VTK2D = "vtk2d"
VTK3D = "vtk3d"
PROBE1 = "probe1"
PROBE2 = "probe2"
PROBE3 = "probe3"
SAVESTATE = "savestate"
VTK3DCUT = "vtk3dcut"
ALL_COUNTERS = (
    STAT_RESET, STAT2_RESET, PRINT, VTK1D, VTK2D, VTK3D,
    PROBE1, PROBE2, PROBE3, SAVESTATE, VTK3DCUT,
)


@dataclasses.dataclass
class Counter:
    """Period-triggered action counter (reference state.h:61-71)."""

    count: int = 0
    period: float = -1.0

    def action(self, t: float) -> bool:
        return self.period > 0 and t >= self.count * self.period


@dataclasses.dataclass
class Probe2DCut:
    axis: int  # 0=X, 1=Y, 2=Z
    name: str
    position: int
    cycle: int = 0


@dataclasses.dataclass
class Probe3DCut:
    origin: tuple
    length: tuple
    step: int
    name: str
    cycle: int = 0


@dataclasses.dataclass
class Probe1DCut:
    axis: int  # axis along which the line runs
    name: str
    pos: tuple  # fixed indices of the other axes, in axis order
    cycle: int = 0


@dataclasses.dataclass
class Probe1DLine:
    """Physical from->to line sampler (reference state.h:52-59 probe1Dlinecut)."""

    name: str
    start: tuple  # physical coordinates
    end: tuple
    n_samples: int = 100
    cycle: int = 0


class Simulation:
    """One lattice + driver.  Subclass and override the hooks (analog of the
    reference's ~15 virtual methods, state.h:216-229)."""

    def __init__(
        self,
        cfg: LBMConfig,
        domain: Domain,
        sim_id: str = "sim",
        results_parent=".",
        plan=None,
        wall_time_limit: float | None = None,
        phys_final_time: float = np.inf,
        steps_per_dispatch: int = 1,
        use_fused: bool = False,
        pair_dispatch: bool | str = "auto",
        profile_dir=None,
    ):
        self.cfg = cfg
        self.domain = domain
        self.id = sim_id
        self.results_dir = Path(results_parent) / f"results_{sim_id}"
        self.plan = plan
        self.wall_time_limit = wall_time_limit
        self.phys_final_time = phys_final_time
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))
        self.use_fused = use_fused
        #: advance TWO steps per dispatch through the one-kernel A-A pair
        #: (the bench.py production path: the kernel itself is ~1.4x the
        #: even/odd pair).  Inflow/forcing updates and statistics samples
        #: then happen at pair granularity (see _advance_pairs).  The
        #: default "auto" MEASURES both paths at sim_init on eligible
        #: configs and keeps the faster one: on the tunneled dev TPU the
        #: per-dispatch RPC overhead (~10 ms) can swamp the kernel gain and
        #: per-step dispatch wins; on directly-attached runtimes the pair
        #: kernel's ~1.4x advantage dominates.  Pass True/False to force.
        self.pair_dispatch = pair_dispatch
        # jax.profiler trace directory (analog of the reference's
        # cuda_profiler_api integration, reference defs.h:36-38); view with
        # TensorBoard or xprof
        self.profile_dir = profile_dir

        self.cnt = {name: Counter() for name in ALL_COUNTERS}
        self.probes_1d: list[Probe1DCut] = []
        self.probes_1d_line: list[Probe1DLine] = []
        self.probes_2d: list[Probe2DCut] = []
        self.probes_3d: list[Probe3DCut] = []

        self.iterations = 0
        self.start_iterations = 0
        self.terminate = False
        self.nan_detected = False

        self.f = None
        self.rho = None
        self.u = None
        # two independent statistics windows (reference D3Q27_MACRO_Mean
        # keeps two mean/covariance accumulator sets with separate reset
        # counters, d3q27/macro.h:117-160, reset at state.hpp:1231-1242)
        self.stat_counter = 0
        self.vm = None   # window-1 running mean velocity [D,*S]
        self.vm2 = None  # window-1 running (co)variance accumulators
        self.stat2_counter = 0
        self.vm_b = None   # window-2 running mean
        self.vm2_b = None  # window-2 running (co)variance
        self.collect_stats = False
        self.collect_stats2 = False
        # NaN scan cadence in iterations, independent of the PRINT counter
        # (the reference scans every step, state.hpp:1166-1188; scanning on
        # a step cadence never leaves the guard off when PRINT is unset)
        self.nan_check_every = 100
        self._last_nan_check = 0

        #: multi-process runtime facts (parallel/distributed.py): host-side
        #: I/O - flags, lock, probes, VTK, checkpoint meta - belongs to the
        #: coordinator, the analog of the reference's rank-0 guards
        #: (reference state.hpp:677-737)
        self.is_coordinator = dist.is_coordinator()
        self._multiprocess = dist.is_multiprocess()

        self._dispatch_cache: dict = {}
        self._lock = FileLock(self.results_dir / "lock")
        self.flags = Flags(self.results_dir)
        self._t_wall_start = time.time()
        self._glups_prev_iter = 0
        self._glups_prev_time = None
        self._compute_time = 0.0
        self._io_time = 0.0

        mkdir_p(self.results_dir)
        # per-process log files, like the reference's per-rank logs
        init_logging(self.results_dir,
                     suffix="" if self.is_coordinator
                     else f"_p{dist.process_index()}")
        self.log = get_logger("main")
        self.prof = get_logger("profile")

        self._step = None
        self._jit_steps = {}
        self._vtk_series = {}

    # ------------------------------------------------------------------ hooks
    def update_inflow(self, phys_time: float):
        """Return the inflow velocity ([D] or [D,*S]) for this step, or None
        (analog of updateKernelVelocities, reference core.h:50)."""
        return None

    def body_force(self, phys_time: float):
        """Return the homogeneous body force [D] or None."""
        return None

    def compute_before_step(self):
        """Hook before the LBM step (non-Newtonian kernels etc.)."""

    def compute_after_step(self):
        """Hook after the LBM step."""

    def probe1(self):
        """App-defined probe (PROBE1 counter), e.g. error norms."""

    def probe2(self):
        """App-defined probe (PROBE2 counter)."""

    def probe3(self):
        """App-defined probe (PROBE3 counter)."""

    def _host(self, x) -> np.ndarray:
        """Full host copy of a device array.  Collective in multi-process
        runs (XLA all-gather; every process must reach it together)."""
        return dist.replicate_to_host(x)

    def output_data(self):
        """name -> host array fields for VTK output.  Default: rho + velocity
        in physical units.  Collective in multi-process runs."""
        lat = self.domain.units
        scalars = {"lbm_density": self._host(self.rho)}
        vectors = {"velocity": self._host(self.u) * (lat.phys_dl / lat.phys_dt if lat.phys_dt else 1.0)}
        return scalars, vectors

    def probe_values(self):
        """Fields probed by 1D cuts: name -> host array."""
        scalars, vectors = self.output_data()
        out = dict(scalars)
        for name, v in vectors.items():
            for a, ax in enumerate("xyz"[: v.shape[0]]):
                out[f"{name}_{ax}"] = v[a]
        return out

    # ------------------------------------------------------------- lifecycle
    def phys_time(self) -> float:
        return self.iterations * self.domain.units.phys_dt

    def can_compute(self) -> bool:
        """Refuse double-running / finished runs (reference state.hpp:40-66).
        The coordinator makes the call (flock + flags); other processes
        follow its broadcast decision so the SPMD program stays aligned."""
        ok = True
        if self.is_coordinator:
            if not self._lock.try_lock():
                self.log.warning("results dir is locked by another process")
                ok = False
            elif self.flags.exists("finished"):
                self.log.info("simulation already finished")
                ok = False
        return dist.broadcast_flag(ok)

    def _fused_ok(self) -> bool:
        """The Pallas kernels need 3D (or supported 2D) and supported GEO
        codes.  Any Z extent works: manual-DMA buffers lane-pad to the 128
        multiple internally and clamp reads at the true extent
        (kernels/fused.py _lane_pad/_zshift, round 3); large Z shrinks the
        tile geometry via the VMEM-fit instead of failing Mosaic."""
        from tnl_lbm_tpu.kernels.fused import supports

        if self.cfg.lat.D == 2:
            from tnl_lbm_tpu.kernels.fused_2d import supports_2d

            return supports_2d(self.cfg, self.domain)
        return self.cfg.lat.D == 3 and supports(self.domain, self.cfg.streaming)

    def _supports_2d_sharded(self) -> bool:
        """2D fused-kernel support with the PER-SHARD VMEM estimate: the
        distributed kernel holds one shard (+1-halo) in VMEM, so domains
        far beyond the single-chip whole-domain bound still qualify."""
        from tnl_lbm_tpu.kernels.fused_2d import supports_2d

        return supports_2d(self.cfg, self.domain,
                           shape=self.plan.local_shape(self.domain))

    def _build_step(self):
        #: set on the 3D fused branches below - their kernels take u_in as
        #: a [3] vector only; per-site inflow PROFILES reroute through
        #: _uin_fallback_step (the XLA paths broadcast profile fields)
        self._vector_uin_only = False
        self._uin_fallback = None
        if self.plan is None:
            if self.use_fused and self._fused_ok():
                if self.cfg.forcing_hook is not None:
                    # IBM / non-Newtonian (2D or 3D): u* pass + hook, then
                    # the force-field fused kernel (reference kernels.h:92,
                    # 178-218)
                    from tnl_lbm_tpu.kernels.hooked import make_hooked_fused_step

                    self._step = make_hooked_fused_step(self.cfg, self.domain)
                    self._vector_uin_only = self.cfg.lat.D == 3
                elif self.cfg.lat.D == 2:
                    from tnl_lbm_tpu.kernels.fused_2d import make_fused_step_2d

                    self._step = make_fused_step_2d(self.cfg, self.domain)
                elif self.cfg.streaming == "AA":
                    from tnl_lbm_tpu.kernels.fused_aa import make_fused_step_aa

                    self._step = make_fused_step_aa(self.cfg, self.domain)
                    self._vector_uin_only = True
                else:
                    from tnl_lbm_tpu.kernels.fused import make_fused_step

                    self._step = make_fused_step(self.cfg, self.domain)
                    self._vector_uin_only = True
            else:
                self._step = make_step(self.cfg, self.domain)
        else:
            from tnl_lbm_tpu.parallel.sharded import (
                _make_uneven_sharded_step,
                make_sharded_fused_step,
                make_sharded_fused_step_aa,
                make_sharded_step,
            )

            fused_want = (self.use_fused and self._fused_ok()
                          and self.cfg.lat.D == 3
                          and self.cfg.forcing_hook is None)
            hooked_want = (self.use_fused
                           and self.cfg.forcing_hook is not None
                           and ((self.cfg.lat.D == 3 and self._fused_ok())
                                or (self.cfg.lat.D == 2
                                    and self._supports_2d_sharded())))
            if hooked_want and self.plan.divisible(self.domain):
                # distributed IBM / non-Newtonian at fused-kernel speed
                # (reference state.hpp:995-1015 multi-GPU hooked kernels)
                from tnl_lbm_tpu.kernels.hooked import make_sharded_hooked_fused_step

                self._step = make_sharded_hooked_fused_step(
                    self.cfg, self.domain, self.plan)
                self._vector_uin_only = True
                map_dtype = jnp.int32
            elif hooked_want and self.cfg.streaming == "AB":
                # non-divisible hooked lattice: pad-and-crop around the
                # fused hooked step; the uneven wrapper crops the hook's
                # inputs to the true extent for exactness
                from tnl_lbm_tpu.kernels.hooked import make_sharded_hooked_fused_step

                self._step = _make_uneven_sharded_step(
                    self.cfg, self.domain, self.plan,
                    inner_builder=make_sharded_hooked_fused_step)
                self._vector_uin_only = True
                map_dtype = jnp.int32
            elif fused_want and self.plan.divisible(self.domain):
                if self.cfg.streaming == "AA":
                    self._step = make_sharded_fused_step_aa(self.cfg, self.domain, self.plan)
                else:
                    self._step = make_sharded_fused_step(self.cfg, self.domain, self.plan)
                self._vector_uin_only = True
                map_dtype = jnp.int32
            elif fused_want and self.cfg.streaming == "AB":
                # non-divisible lattice: pad-and-crop around the fused
                # sharded step (reference splitRange analog,
                # lattice_decomposition.h:16-55)
                self._step = _make_uneven_sharded_step(
                    self.cfg, self.domain, self.plan,
                    inner_builder=make_sharded_fused_step)
                self._vector_uin_only = True
                map_dtype = jnp.int32
            elif (self.use_fused and self.cfg.lat.D == 2
                  and self.cfg.forcing_hook is None
                  and self._supports_2d_sharded()):
                # distributed 2D fused kernel (round 3): 1-wide ring +
                # whole-shard-in-VMEM kernel per shard, incl. Bouzidi;
                # non-divisible geometry-file lattices (the common sim2d_2
                # case) pad-and-crop around it
                from tnl_lbm_tpu.parallel.sharded import make_sharded_fused_step_2d

                if self.plan.divisible(self.domain):
                    self._step = make_sharded_fused_step_2d(
                        self.cfg, self.domain, self.plan)
                else:
                    self._step = _make_uneven_sharded_step(
                        self.cfg, self.domain, self.plan,
                        inner_builder=make_sharded_fused_step_2d)
                map_dtype = jnp.int32
            else:
                self._step = make_sharded_step(self.cfg, self.domain, self.plan)
                map_dtype = None
            self._map_sharded = self.plan.shard_field(
                jnp.asarray(self.domain.map, dtype=map_dtype), like_f=False
            )

    def _uin_fallback_step(self):
        """Lazily built XLA step for per-site inflow PROFILES: the 3D fused
        kernels take u_in as a [3] vector only (fused.py _params_vec), while
        the XLA paths broadcast profile fields.  Profile-inflow calls route
        here so a config that worked on the XLA paths never starts crashing
        because the driver picked a fused kernel."""
        if getattr(self, "_uin_fallback", None) is None:
            self.log.warning(
                "per-site inflow profile with a fused 3D kernel: profile "
                "steps run on the XLA %s path (the fused kernels take "
                "vector u_in only)", "sharded" if self.plan else "single")
            if self.plan is None:
                self._uin_fallback = make_step(self.cfg, self.domain)
            else:
                from tnl_lbm_tpu.parallel.sharded import make_sharded_step

                self._uin_fallback = make_sharded_step(
                    self.cfg, self.domain, self.plan)
        return self._uin_fallback

    def _jit_step(self, parity, have_uin, have_force, uin_profile=False):
        key = (parity, have_uin, have_force, uin_profile)
        if key in self._jit_steps:
            return self._jit_steps[key]

        step = (self._uin_fallback_step()
                if uin_profile and getattr(self, "_vector_uin_only", False)
                else self._step)
        # hooks with a consts pytree (IBM's A/weights/nodes): thread the
        # arrays through jit as ARGUMENTS - closed over, they would inline
        # into the lowered HLO as dense constants and blow up the (remote)
        # compile upload for large point clouds
        hc = (getattr(self.cfg.forcing_hook, "consts", None)
              if self.cfg.forcing_hook is not None else None)

        # the geometry map (+ bouzidi etc.) enters jit as an ARGUMENT,
        # never a closure: a closed-over jax.Array becomes an HLO
        # constant, which (a) multi-process runs cannot even fetch (the
        # array spans non-addressable devices) and (b) bakes one distinct
        # compiled program per geometry, so a golden sweep pays a full
        # XLA compile per row.  Builders expose such arrays as
        # step.sharded_consts and the driver threads them through here -
        # sharded AND unsharded alike.
        sc = dict(getattr(step, "sharded_consts", None) or {})
        sc_names = sorted(sc)
        sc_vals = tuple(sc[k] for k in sc_names)

        if self.plan is None:
            def fn(f, nu, u_in, force, hook_consts=None, *sc_in):
                kw = {} if hc is None else {"hook_consts": hook_consts}
                kw.update(zip(sc_names, sc_in))
                return step(
                    f, nu,
                    u_in=u_in if have_uin else None,
                    force=force if have_force else None,
                    parity=parity, **kw,
                )
        else:
            def fn(f, mp, nu, u_in, force, hook_consts=None, *sc_in):
                kw = {} if hc is None else {"hook_consts": hook_consts}
                kw.update(zip(sc_names, sc_in))
                return step(
                    f, mp, nu,
                    u_in=u_in if have_uin else None,
                    force=force if have_force else None,
                    parity=parity, **kw,
                )

        # Donation would alias the Pallas A-A even kernel's output onto its
        # input buffer; simultaneous read/write streams to the same HBM
        # region run ~1.8x slower (measured on v5e).  The even step therefore
        # ping-pongs buffers instead of updating in place.
        donate_ok = not (
            self.use_fused and self.cfg.streaming == "AA" and parity == 0
        )
        inner = jax.jit(fn, donate_argnums=0 if donate_ok else ())
        if self.plan is None:
            if hc is not None or sc_vals:
                jfn = lambda f, nu, u_in, force: inner(  # noqa: E731
                    f, nu, u_in, force, hc, *sc_vals)
            else:
                jfn = inner
        else:
            if hc is not None or sc_vals:
                jfn = lambda f, nu, u_in, force: inner(  # noqa: E731
                    f, self._map_sharded, nu, u_in, force, hc, *sc_vals)
            else:
                jfn = lambda f, nu, u_in, force: inner(  # noqa: E731
                    f, self._map_sharded, nu, u_in, force)
        self._jit_steps[key] = jfn
        return jfn

    def sim_init(self):
        self._build_step()
        self.estimate_memory_demands()
        loaded = None
        if self.flags.exists("loadstate"):
            loaded = ckpt.load_checkpoint(self.results_dir)
        if loaded is not None:
            arrays, meta = loaded
            self.f = jnp.asarray(arrays["f"], self.cfg.compute_dtype)
            self.iterations = int(meta["iterations"])
            self.start_iterations = self.iterations
            self.stat_counter = int(meta.get("stat_counter", 0))
            for name in ALL_COUNTERS:
                if name in meta.get("counters", {}):
                    self.cnt[name].count = int(meta["counters"][name])
            cycles = meta.get("probe_cycles", {})
            for key, probes in (("1d", self.probes_1d), ("1dline", self.probes_1d_line),
                                ("2d", self.probes_2d), ("3d", self.probes_3d)):
                for p, cyc in zip(probes, cycles.get(key, [])):
                    p.cycle = int(cyc)
            self.stat2_counter = int(meta.get("stat2_counter", 0))
            if "vm" in arrays:
                self.vm = jnp.asarray(arrays["vm"])
                self.vm2 = jnp.asarray(arrays["vm2"])
            if "vm_b" in arrays:
                self.vm_b = jnp.asarray(arrays["vm_b"])
                self.vm2_b = jnp.asarray(arrays["vm2_b"])
            self._restored_arrays = arrays
            self.log.info("resumed from checkpoint at iteration %d", self.iterations)
        else:
            self._restored_arrays = None
            self.f = initial_dfs(self.cfg, self.domain)
        if self.plan is not None:
            self.f = self.plan.shard_field(self.f, like_f=True)
        D = self.cfg.lat.D
        shape = self.domain.shape
        if self.collect_stats and self.vm is None:
            self.vm = jnp.zeros((D,) + shape, self.cfg.compute_dtype)
            self.vm2 = jnp.zeros((D * (D + 1) // 2,) + shape, self.cfg.compute_dtype)
        if self.collect_stats2 and self.vm_b is None:
            self.vm_b = jnp.zeros((D,) + shape, self.cfg.compute_dtype)
            self.vm2_b = jnp.zeros((D * (D + 1) // 2,) + shape, self.cfg.compute_dtype)
        if self.plan is not None:
            # the statistics accumulators ride the same sharding as the
            # velocity field; in multi-process runs mixing process-local
            # arrays into the sharded stats jit is an error, so shard them
            # eagerly (freshly created AND checkpoint-restored ones)
            for name in ("vm", "vm2", "vm_b", "vm2_b"):
                v = getattr(self, name)
                if v is not None:
                    setattr(self, name, self.plan.shard_field(v, like_f=True))
        # initial macro without advancing (reference computeInitialMacro,
        # lbm_block.hpp:252-277)
        self._initial_macro()
        self._resolve_pair_dispatch()
        self._glups_prev_time = time.time()
        self._t_wall_start = time.time()

    def _initial_macro(self):
        from tnl_lbm_tpu.ops import moments as mom

        lat = self.cfg.lat
        well = self.cfg.well

        @jax.jit
        def macro(f):
            return mom.density_velocity(lat, f, well=well,
                                        high_precision=self.cfg.high_precision_rho)

        self.rho, self.u = macro(self.f)

    def _pair_dispatch_capable(self) -> bool:
        """Static eligibility for the one-kernel A-A pair path (round 3:
        sharded runs qualify too - make_sharded_fused_pair2_aa exchanges
        halos once per TWO steps, half the per-step sync traffic)."""
        return (
            (self.plan is None or self.plan.divisible(self.domain))
            and self.use_fused
            and self.cfg.streaming == "AA"
            and self.cfg.forcing_hook is None
            and self.cfg.lat.D == 3
            and not self._hooks_need_per_step_state()
            and self._fused_ok()
        )

    def _hooks_need_per_step_state(self) -> bool:
        """True if a step hook is marked @needs_per_step_state (it reads
        self.f and must not run against a chunk-start snapshot)."""
        if getattr(self, "needs_per_step_state", False):
            return True
        return any(
            getattr(getattr(self, name), "needs_per_step_state", False)
            for name in ("compute_before_step", "compute_after_step"))

    def _pair_dispatch_ok(self) -> bool:
        return self.pair_dispatch is True and self._pair_dispatch_capable()

    def _resolve_pair_dispatch(self):
        """Resolve pair_dispatch="auto" by MEASURING both paths (VERDICT r2
        item 4): compile the per-step even/odd jits and the one-kernel pair,
        time one pair each way on a copy of the state, keep the faster.
        The probe runs once at sim_init; its cost amortizes over the run."""
        if self.cfg.storage_dtype is not None:
            # half storage exists only on the pair2 path; silently falling
            # back to a full-precision per-step kernel would ignore the
            # user's explicit precision request
            if self.pair_dispatch is False or not self._pair_dispatch_capable():
                raise ValueError(
                    "cfg.storage_dtype (half storage) requires the one-kernel "
                    "A-A pair path: use_fused=True, streaming='AA', no forcing "
                    "hook / per-step-state hooks, pair_dispatch not False")
            self.pair_dispatch = True
            return
        if self.pair_dispatch != "auto":
            self.pair_dispatch = bool(self.pair_dispatch)
            return
        if not self._pair_dispatch_capable() or not self._pair_probe_allowed():
            self.pair_dispatch = False
            return
        try:
            t_pair, t_steps = self._probe_pair_dispatch()
        except Exception as exc:  # Mosaic/HW regression: fail safe
            self.log.warning("pair-dispatch auto-probe failed (%s); "
                             "using per-step dispatch", type(exc).__name__)
            self.pair_dispatch = False
            return
        self.pair_dispatch = t_pair < t_steps
        self.log.info(
            "pair-dispatch auto-probe: pair2 %.3f ms/pair vs per-step "
            "%.3f ms/pair -> %s", t_pair * 1e3, t_steps * 1e3,
            "pair dispatch" if self.pair_dispatch else "per-step dispatch")

    def _pair_probe_allowed(self) -> bool:
        # interpret-mode Pallas is not a production path; per-step dispatch
        # avoids a pointless slow compile on CPU
        return jax.default_backend() != "cpu"

    def _probe_pair_dispatch(self, repeats: int = 5):
        """Best-of-N wall time for one A-A pair via (a) the one-kernel pair
        dispatch and (b) two per-step dispatches.  Leaves self.f untouched."""
        nu = self._dispatch_arg(self.domain.units.lbm_viscosity())
        # _dispatch_arg, not jnp.zeros: a process-local jax.Array cannot
        # join a multi-host-mesh computation (it would raise, and the
        # auto-probe's fail-safe would silently pin per-step dispatch)
        zero = self._dispatch_arg(np.zeros(self.cfg.lat.D))
        self._ensure_pair2_jits()
        jpair = self._jit_steps["pair2"][(False, False)]
        fpad = self._jit_steps["pair2_pad"](self.f)
        jax.block_until_ready(fpad)
        j0 = self._jit_step(0, False, False)
        j1 = self._jit_step(1, False, False)

        def time_pair():
            t0 = time.perf_counter()
            out = jpair(fpad, nu, zero, zero)
            jax.block_until_ready(out)
            return time.perf_counter() - t0

        def time_steps():
            t0 = time.perf_counter()
            a = j0(self.f, nu, zero, zero)
            b = j1(a[0], nu, zero, zero)
            jax.block_until_ready(b)
            return time.perf_counter() - t0

        time_pair(), time_steps()  # compile + warm
        t_pair = min(time_pair() for _ in range(repeats))
        t_steps = min(time_steps() for _ in range(repeats))
        return t_pair, t_steps

    def _ensure_pair2_jits(self):
        """Build (once) the jitted one-kernel A-A pair + pad/unpad helpers
        (kernels/fused_aa.py make_fused_pair2_aa; sharded:
        parallel/sharded.py make_sharded_fused_pair2_aa - halos move ONCE
        per TWO steps, half the per-step sync traffic)."""
        if "pair2" in self._jit_steps:
            return
        if self.plan is None:
            from tnl_lbm_tpu.kernels.autotune import (
                cached_winner,
                normalize_pair2,
                pair2_build_opts,
                pair2_cache_key,
            )
            from tnl_lbm_tpu.kernels.fused_aa import (
                from_padded_aa,
                make_fused_pair2_aa,
                to_padded_aa,
            )

            # adopt a tile/variant winner a previous autotune pass measured
            # on this same chip + lattice shape (bench.py sows the cache)
            sd = self.cfg.storage_dtype
            hit = cached_winner(pair2_cache_key(self.domain, self.cfg, sd))
            if hit is not None:
                tx, ty, k, mode = normalize_pair2(hit)
                pair = make_fused_pair2_aa(self.cfg, self.domain,
                                           tile=(tx, ty), tiles_per_program=k,
                                           store_dtype=sd,
                                           **pair2_build_opts(mode))
            else:
                pair = make_fused_pair2_aa(self.cfg, self.domain,
                                           store_dtype=sd)

            def pair_call(fpad, nu, u_in, force):
                return pair(fpad, nu, u_in=u_in, force=force)

            pad_fn = lambda f: to_padded_aa(  # noqa: E731
                f, self.domain.periodic, store_dtype=sd)
            unpad_fn = lambda fp: from_padded_aa(  # noqa: E731
                fp, self.domain.shape[-1],
                dtype=self.cfg.compute_dtype if sd is not None else None)
        else:
            from tnl_lbm_tpu.parallel.sharded import (
                from_padded_aa_sharded,
                make_sharded_fused_pair2_aa,
                to_padded_aa_sharded,
            )

            sd = self.cfg.storage_dtype
            spair = make_sharded_fused_pair2_aa(self.cfg, self.domain,
                                                self.plan, store_dtype=sd)

            # the sharded map is a jit ARGUMENT (see _jit_step: closed-over
            # multi-process arrays cannot become HLO constants)
            def pair_call(fpad, mp, nu, u_in, force):
                return spair(fpad, mp, nu, u_in=u_in, force=force)

            pad_fn = lambda f: to_padded_aa_sharded(  # noqa: E731
                f, self.plan, self.domain, store_dtype=sd)
            unpad_fn = lambda fp: from_padded_aa_sharded(  # noqa: E731
                fp, self.plan, self.domain,
                dtype=self.cfg.compute_dtype if sd is not None else None)
        if self.plan is None:
            self._jit_steps["pair2"] = {
                key: jax.jit(
                    lambda fpad, nu, u_in, force, key=key: pair_call(
                        fpad, nu,
                        u_in if key[0] else None,
                        force if key[1] else None,
                    )
                )
                for key in ((False, False), (True, False), (False, True), (True, True))
            }
        else:
            inner = {
                key: jax.jit(
                    lambda fpad, mp, nu, u_in, force, key=key: pair_call(
                        fpad, mp, nu,
                        u_in if key[0] else None,
                        force if key[1] else None,
                    )
                )
                for key in ((False, False), (True, False), (False, True), (True, True))
            }
            self._jit_steps["pair2"] = {
                key: (lambda fpad, nu, u_in, force, key=key: inner[key](
                    fpad, self._map_sharded, nu, u_in, force))
                for key in inner
            }
        # eager pad/unpad would issue one RPC per op on tunneled TPU
        # backends (~30 ms each) - jit them
        self._jit_steps["pair2_pad"] = jax.jit(pad_fn)
        self._jit_steps["pair2_unpad"] = jax.jit(unpad_fn)

    def _dispatch_arg(self, x):
        """Per-dispatch scalar/vector jit argument (nu, u_in, force, zero).
        Multi-process runs pass host numpy values (implicitly replicated
        across the mesh); a process-local jax.Array cannot join a
        computation over a multi-host mesh.  Single-process keeps the
        device-resident jnp path AND memoizes the transfer by value: a
        steady inflow profile (e.g. sim2d_3's parabolic inflow, rebuilt
        as numpy every step) would otherwise cost one host->device RPC
        per step - ~30 ms each on tunneled TPU backends, which dominated
        the round-4 golden sweep at ~100 ms/step on a 128x32 grid."""
        dt = self.cfg.compute_dtype
        if self._multiprocess:
            return np.asarray(x, dtype=jnp.dtype(dt).name)
        arr = np.asarray(x, dtype=jnp.dtype(dt).name)
        key = (arr.shape, arr.tobytes())
        hit = self._dispatch_cache.get(key)
        if hit is None:
            if len(self._dispatch_cache) >= 64:  # time-varying inflows
                self._dispatch_cache.clear()     # must not grow unbounded
            hit = self._dispatch_cache[key] = jnp.asarray(arr, dt)
        return hit

    def _advance_pairs(self, n_pairs: int, nu, uin0=_UNSET):
        """Advance 2*n_pairs steps through the one-kernel A-A pair
        (kernels/fused_aa.py make_fused_pair2_aa).

        NOTE for subclass hooks: during the pair loop the lattice state
        lives in the persistent-padded layout ``fpad`` (a local variable);
        ``self.f`` holds the snapshot from the start of the dispatch chunk
        and is only refreshed after the loop.  ``compute_before_step`` /
        ``compute_after_step`` hooks that read ``self.f`` therefore see
        stale DFs under pair dispatch; ``self.rho`` / ``self.u`` ARE fresh
        (updated per pair).  Hooks that need per-step DF access should be
        decorated ``@needs_per_step_state`` (or set the instance attribute),
        which disables pair dispatch by construction."""
        self._ensure_pair2_jits()
        dt = self.cfg.compute_dtype
        zero = self._dispatch_arg(np.zeros(self.cfg.lat.D))
        fpad = self._jit_steps["pair2_pad"](self.f)
        for i in range(n_pairs):
            u_in = (uin0 if i == 0 and uin0 is not _UNSET
                    else self.update_inflow(self.phys_time()))
            force = self.body_force(self.phys_time())
            self.compute_before_step()
            jfn = self._jit_steps["pair2"][(u_in is not None, force is not None)]
            fpad, self.rho, self.u = jfn(
                fpad, nu,
                self._dispatch_arg(u_in) if u_in is not None else zero,
                self._dispatch_arg(force) if force is not None else zero,
            )
            if self.collect_stats:
                self.vm, self.vm2 = self._update_stats(self.u, self.vm, self.vm2, self.stat_counter)
                self.stat_counter += 1
            if self.collect_stats2:
                self.vm_b, self.vm2_b = self._update_stats(self.u, self.vm_b, self.vm2_b, self.stat2_counter)
                self.stat2_counter += 1
            self.iterations += 2
            self.compute_after_step()
        self.f = self._jit_steps["pair2_unpad"](fpad)

    def _advance(self, n_steps: int):
        """Run n_steps lattice updates (n=0: one macro evaluation without
        advancing - used at init)."""
        nu = self._dispatch_arg(self.domain.units.lbm_viscosity())
        t0 = time.perf_counter()
        # update_inflow is a user-overridable (possibly stateful/expensive)
        # hook: evaluate it ONCE here and reuse it for both the
        # pair-dispatch vector check and the first step (ADVICE r3)
        uin0 = self.update_inflow(self.phys_time())
        # pair2's kernel takes vector u_in only; profile inflows stay on
        # the per-step loop (which reroutes them to XLA)
        if (n_steps >= 2 and self.iterations % 2 == 0
                and self._pair_dispatch_ok()
                and (uin0 is None or jnp.ndim(uin0) <= 1)):
            n_pairs, n_steps = divmod(n_steps, 2)
            self._advance_pairs(n_pairs, nu, uin0=uin0)
            uin0 = _UNSET  # phys_time moved on; leftover step re-evaluates
            if n_steps == 0:
                jax.block_until_ready(self.f)
                self._compute_time += time.perf_counter() - t0
                return
        scan_args = self._scan_chunk_args(n_steps, uin0)
        if scan_args is not None:
            u0, f0 = scan_args
            self._advance_scan(n_steps, nu, u0, f0)
            jax.block_until_ready(self.f)
            self._compute_time += time.perf_counter() - t0
            return
        for _ in range(n_steps):
            u_in = uin0 if uin0 is not _UNSET else self.update_inflow(self.phys_time())
            uin0 = _UNSET
            force = self.body_force(self.phys_time())
            parity = (self.iterations % 2) if self.cfg.streaming == "AA" else 0
            jfn = self._jit_step(parity, u_in is not None, force is not None,
                                 uin_profile=jnp.ndim(u_in) > 1
                                 if u_in is not None else False)
            dt = self.cfg.compute_dtype
            zero = self._dispatch_arg(np.zeros(self.cfg.lat.D))
            self.compute_before_step()
            f_new, rho, u = jfn(
                self.f,
                nu,
                self._dispatch_arg(u_in) if u_in is not None else zero,
                self._dispatch_arg(force) if force is not None else zero,
            )
            self.f, self.rho, self.u = f_new, rho, u
            if self.collect_stats:
                self.vm, self.vm2 = self._update_stats(self.u, self.vm, self.vm2, self.stat_counter)
                self.stat_counter += 1
            if self.collect_stats2:
                self.vm_b, self.vm2_b = self._update_stats(self.u, self.vm_b, self.vm2_b, self.stat2_counter)
                self.stat2_counter += 1
            self.iterations += 1
            self.compute_after_step()
        jax.block_until_ready(self.f)
        self._compute_time += time.perf_counter() - t0

    def _scan_chunk_args(self, n_steps, uin0):
        """Gate + argument probe for the lax.scan-chunked dispatch.

        Returns ``(u_in, force)`` for the chunk when eligible, else None.
        Eligible = no overridden per-step driver hooks, AA parity aligned,
        and the inflow/force hooks return the SAME value at every step time
        in the chunk (checked exactly, by evaluating each - same hook call
        count as the per-step loop).  One jitted scan then replaces
        n_steps jit dispatches: on tunneled TPU backends each dispatch
        costs ~ms-level RPC latency, which dominated small-grid runs
        (the round-4 golden sweep measured ~100 ms/step on 128x32)."""
        if (n_steps < 4
                or (self.collect_stats and self.vm is None)
                or (self.collect_stats2 and self.vm_b is None)):
            return None
        base = Simulation
        if (type(self).compute_before_step is not base.compute_before_step
                or type(self).compute_after_step is not base.compute_after_step
                or self._hooks_need_per_step_state()):
            return None
        if self.cfg.streaming == "AA" and (
                self.iterations % 2 != 0 or n_steps % 2 != 0):
            return None
        dt_phys = self.domain.units.phys_dt

        def same(a, b):
            if a is None or b is None:
                return a is None and b is None
            a, b = np.asarray(a), np.asarray(b)
            return a.shape == b.shape and np.array_equal(a, b)

        u0 = f0 = None
        for i in range(n_steps):
            ti = (self.iterations + i) * dt_phys
            ui = uin0 if (i == 0 and uin0 is not _UNSET) else self.update_inflow(ti)
            fi = self.body_force(ti)
            if i == 0:
                u0, f0 = ui, fi
            elif not (same(u0, ui) and same(f0, fi)):
                return None
        return u0, f0

    def _advance_scan(self, n_steps, nu, u_in, force):
        """Advance n_steps via one jitted lax.scan over the per-step kernel
        (compiler-friendly control flow - SURVEY.md section 7; the analog of
        the reference's per-step kernel launch loop, state.hpp:1030-1044,
        amortized into a single device program)."""
        s1 = self.collect_stats
        s2 = self.collect_stats2
        jfn = self._jit_scan(
            n_steps, u_in is not None, force is not None,
            uin_profile=jnp.ndim(u_in) > 1 if u_in is not None else False,
            s1=s1, s2=s2)
        zero = self._dispatch_arg(np.zeros(self.cfg.lat.D))
        st1 = ((self.vm, self.vm2, jnp.asarray(float(self.stat_counter)))
               if s1 else ())
        st2 = ((self.vm_b, self.vm2_b, jnp.asarray(float(self.stat2_counter)))
               if s2 else ())
        self.f, self.rho, self.u, st1, st2 = jfn(
            self.f, self.rho, self.u,
            nu,
            self._dispatch_arg(u_in) if u_in is not None else zero,
            self._dispatch_arg(force) if force is not None else zero,
            st1, st2,
        )
        if s1:
            self.vm, self.vm2, _ = st1
            self.stat_counter += n_steps
        if s2:
            self.vm_b, self.vm2_b, _ = st2
            self.stat2_counter += n_steps
        self.iterations += n_steps

    def _jit_scan(self, k, have_uin, have_force, uin_profile, s1, s2):
        key = ("scan", k, have_uin, have_force, uin_profile, s1, s2)
        if key in self._jit_steps:
            return self._jit_steps[key]
        step = (self._uin_fallback_step()
                if uin_profile and getattr(self, "_vector_uin_only", False)
                else self._step)
        hc = (getattr(self.cfg.forcing_hook, "consts", None)
              if self.cfg.forcing_hook is not None else None)
        parities = (0, 1) if self.cfg.streaming == "AA" else (0,)
        n_outer = k // len(parities)
        D = self.cfg.lat.D
        pairs = [(a, b) for a in range(D) for b in range(a, D)]

        def upd_stats(u, st):
            vm, vm2, n = st
            denom = 1.0 / (n + 1.0)
            delta = u - vm
            vm_new = vm + delta * denom
            delta_new = u - vm_new
            rows = [vm2[i] + delta_new[a] * delta[b]
                    for i, (a, b) in enumerate(pairs)]
            return vm_new, jnp.stack(rows), n + 1.0

        sc = dict(getattr(step, "sharded_consts", None) or {})
        sc_names = sorted(sc)
        sc_vals = tuple(sc[n] for n in sc_names)

        def fn(f, rho, u, mp, nu, u_in, force, hook_consts, st1, st2, *sc_in):
            kw = {} if hc is None else {"hook_consts": hook_consts}
            kw.update(zip(sc_names, sc_in))

            def one(f, parity):
                args = (f, nu) if self.plan is None else (f, mp, nu)
                return step(
                    *args,
                    u_in=u_in if have_uin else None,
                    force=force if have_force else None,
                    parity=parity, **kw)

            def body(carry, _):
                f, rho, u, st1, st2 = carry
                for parity in parities:
                    f, rho, u = one(f, parity)
                    if s1:
                        st1 = upd_stats(u, st1)
                    if s2:
                        st2 = upd_stats(u, st2)
                return (f, rho, u, st1, st2), None

            carry, _ = jax.lax.scan(
                body, (f, rho, u, st1, st2), None, length=n_outer)
            return carry

        # same donation rule as _jit_step: the A-A even Pallas kernel must
        # not alias its output onto its input buffer
        donate_ok = not (self.use_fused and self.cfg.streaming == "AA")
        inner = jax.jit(fn, donate_argnums=0 if donate_ok else ())
        mp = self._map_sharded if self.plan is not None else None

        def jfn(f, rho, u, nu, u_in, force, st1, st2):
            return inner(f, rho, u, mp, nu, u_in, force, hc, st1, st2,
                         *sc_vals)

        self._jit_steps[key] = jfn
        return jfn

    def _update_stats(self, u, vm, vm2, n):
        """Online mean + Welford covariance of velocity
        (reference d3q27/macro.h:107-161)."""
        if "stats" not in self._jit_steps:
            D = self.cfg.lat.D
            pairs = [(a, b) for a in range(D) for b in range(a, D)]

            @jax.jit
            def upd(u, vm, vm2, n):
                denom = 1.0 / (n + 1.0)
                delta = u - vm
                vm_new = vm + delta * denom
                delta_new = u - vm_new
                rows = [vm2[i] + delta_new[a] * delta[b] for i, (a, b) in enumerate(pairs)]
                return vm_new, jnp.stack(rows)

            self._jit_steps["stats"] = upd
        return self._jit_steps["stats"](u, vm, vm2, jnp.asarray(float(n)))

    # ------------------------------------------------------------- actions
    def _nan_guard(self) -> bool:
        """NaN scan of density (reference state.hpp:1166-1188)."""
        if bool(jnp.isnan(self.rho).any()):
            self.nan_detected = True
            self.terminate = True
            self.log.error("NaN detected in density at iteration %d - dumping state", self.iterations)
            self._write_vtk_3d(suffix="_nan_dump")
            from tnl_lbm_tpu.io import native

            native.flush()
            return True
        return False

    def _results_path(self, *parts) -> Path:
        p = self.results_dir.joinpath(*parts)
        p.parent.mkdir(parents=True, exist_ok=True)
        return p

    def _series(self, subdir: str, name: str):
        """Cycle-append .pvd-indexed stream per output family (the analog
        of the reference's per-variable ADIOS2 Write/Append streams,
        adios_writer.hpp:18-24); resume-safe (io/series.py)."""
        from tnl_lbm_tpu.io.series import VtiTimeSeries

        key = (subdir, name)
        s = self._vtk_series.get(key)
        if s is None:
            s = self._vtk_series[key] = VtiTimeSeries(
                self.results_dir / subdir, name)
        return s

    def _write_vtk_3d(self, suffix=""):
        if (self._multiprocess and not suffix
                and type(self).output_data is Simulation.output_data
                and len(getattr(getattr(self.rho, "sharding", None),
                                "device_set", ())) > 1):
            # default fields + sharded state: parallel multi-writer, no
            # full-domain gather (per-process pieces + coordinator .pvti)
            return self._write_vtk_3d_pieces()
        scalars, vectors = self.output_data()
        if not self.is_coordinator:
            return
        units = self.domain.units
        cycle = self.cnt[VTK3D].count
        if suffix:
            # diagnostic dumps (NaN guard) stay loose files outside the index
            write_vti(
                self._results_path("vtk3D", f"data_{cycle:06d}{suffix}.vti"),
                scalars=scalars,
                vectors=vectors,
                origin=units.lbm2phys_point([0] * self.cfg.lat.D),
                spacing=units.phys_dl,
            )
            return
        self._series("vtk3D", "data").append(
            scalars=scalars, vectors=vectors, time=self.phys_time(),
            origin=units.lbm2phys_point([0] * self.cfg.lat.D),
            spacing=units.phys_dl, cycle=cycle)

    def _write_vtk_3d_pieces(self):
        """Parallel multi-writer 3D snapshot: every process writes the
        shard blocks it owns as ``.vti`` pieces, the coordinator publishes
        one ``.pvti`` and indexes it in the time series - the analog of
        the reference's per-rank ADIOS2 streams behind MPI-split writer
        communicators (adios_writer.hpp:18-24, state.hpp:123-170).  No
        process ever holds the whole domain."""
        from tnl_lbm_tpu.io.vtk import write_pvti

        units = self.domain.units
        cycle = self.cnt[VTK3D].count
        vel = units.phys_dl / units.phys_dt if units.phys_dt else 1.0
        origin = units.lbm2phys_point([0] * self.cfg.lat.D)
        base = f"data_{cycle:06d}"
        u_blocks = {pos: block
                    for pos, idx, block in dist.owned_shards(self.u)}
        for pos, idx, rho_block in dist.owned_shards(self.rho):
            write_vti(
                self._results_path("vtk3D", f"{base}_p{pos:03d}.vti"),
                scalars={"lbm_density": rho_block},
                vectors={"velocity": u_blocks[pos] * vel},
                origin=origin, spacing=units.phys_dl,
                start=[s for s, _ in idx],
            )
        from tnl_lbm_tpu.io import native

        native.flush()  # pieces on disk before the index references them
        dist.barrier("vtk3d-pieces")
        if self.is_coordinator:
            parts = dist.global_parts(self.rho)
            pieces = [
                (tuple((s, e - 1) for s, e in idx), f"{base}_p{pos:03d}.vti")
                for pos, idx in parts
            ]
            whole = tuple((0, s - 1) for s in self.domain.shape)
            write_pvti(
                self._results_path("vtk3D", f"{base}.pvti"),
                whole, pieces,
                scalar_names=["lbm_density"], vector_names=["velocity"],
                origin=origin, spacing=units.phys_dl,
            )
            self._series("vtk3D", "data").record(
                time=self.phys_time(), fname=f"{base}.pvti")

    def _write_vtk_2d(self):
        scalars, vectors = self.output_data()
        units = self.domain.units
        for p in self.probes_2d:
            if self.is_coordinator:
                sl = [slice(None)] * self.cfg.lat.D
                sl[p.axis] = slice(p.position, p.position + 1)
                sc = {k: v[tuple(sl)] for k, v in scalars.items()}
                vc = {k: v[(slice(None),) + tuple(sl)] for k, v in vectors.items()}
                start = [0] * self.cfg.lat.D
                start[p.axis] = p.position
                self._series("vtk2D", p.name).append(
                    scalars=sc, vectors=vc, time=self.phys_time(),
                    origin=units.lbm2phys_point([0] * self.cfg.lat.D),
                    spacing=units.phys_dl, start=start, cycle=p.cycle)
            p.cycle += 1

    def _write_vtk_3dcut(self):
        scalars, vectors = self.output_data()
        units = self.domain.units
        for p in self.probes_3d:
            if self.is_coordinator:
                sl = tuple(
                    slice(o, o + L, p.step) for o, L in zip(p.origin, p.length)
                )
                sc = {k: v[sl] for k, v in scalars.items()}
                vc = {k: v[(slice(None),) + sl] for k, v in vectors.items()}
                self._series("vtk3Dcut", p.name).append(
                    scalars=sc, vectors=vc, time=self.phys_time(),
                    origin=units.lbm2phys_point(list(p.origin)),
                    spacing=units.phys_dl * p.step, cycle=p.cycle)
            p.cycle += 1

    def _write_probes_1d(self):
        vals = self.probe_values()
        if not self.is_coordinator:
            for p in self.probes_1d:
                p.cycle += 1
            return
        for p in self.probes_1d:
            path = self._results_path("probes", f"{p.name}.dat")
            take = []
            pos_iter = iter(p.pos)
            for a in range(self.cfg.lat.D):
                take.append(slice(None) if a == p.axis else next(pos_iter))
            with open(path, "a") as fh:
                if p.cycle == 0:
                    fh.write("# time index " + " ".join(vals.keys()) + "\n")
                t = self.phys_time()
                arrays = {k: np.asarray(v[tuple(take)]) for k, v in vals.items()}
                n = len(next(iter(arrays.values())))
                for i in range(n):
                    fh.write(
                        f"{t} {i} " + " ".join(str(float(a[i])) for a in arrays.values()) + "\n"
                    )
            p.cycle += 1

    def _write_probes_1d_line(self):
        """Sample fields along physical from->to lines with trilinear-free
        nearest sampling (reference state.hpp:174-372)."""
        vals = self.probe_values()
        if not self.is_coordinator:
            for p in self.probes_1d_line:
                p.cycle += 1
            return
        units = self.domain.units
        for p in self.probes_1d_line:
            path = self._results_path("probes", f"{p.name}.dat")
            ts = np.linspace(0.0, 1.0, p.n_samples)
            pts_phys = np.outer(1 - ts, p.start) + np.outer(ts, p.end)
            idx = np.stack([
                np.clip(np.round(units.phys2lbm_x(pts_phys[:, a], a) ).astype(int), 0, self.domain.shape[a] - 1)
                for a in range(self.cfg.lat.D)
            ])
            with open(path, "a") as fh:
                if p.cycle == 0:
                    fh.write("# time s " + " ".join(vals.keys()) + "\n")
                t = self.phys_time()
                cols = [v[tuple(idx)] for v in vals.values()]
                for k in range(p.n_samples):
                    fh.write(f"{t} {ts[k]} " + " ".join(str(float(c[k])) for c in cols) + "\n")
            p.cycle += 1

    def estimate_memory_demands(self) -> dict:
        """Device-memory preflight (reference state.hpp:819-877): refuse to
        start when the state pytree cannot fit."""
        sites = self.domain.units.num_sites
        Q = self.cfg.lat.Q
        itemsize = jnp.dtype(self.cfg.compute_dtype).itemsize
        n_buffers = 1 if self.cfg.streaming == "AA" else 2
        bytes_dfs = Q * sites * itemsize * n_buffers
        bytes_macro = (1 + self.cfg.lat.D) * sites * itemsize
        bytes_map = sites * 4
        total = bytes_dfs + bytes_macro + bytes_map
        if (self.cfg.streaming == "AA" and self.use_fused
                and self.cfg.lat.D == 3 and self._pair_dispatch_capable()):
            # pair dispatch carries the persistent padded layout
            # [Q, X+4, Y+8(+16 sharded), Zp] NEXT TO self.f while active
            # (kernels/fused_aa.py to_padded_aa) - an extra ~full DF buffer
            X, Y, Z = self.domain.shape
            from tnl_lbm_tpu.kernels.fused import LANE
            Zp = -(-Z // LANE) * LANE
            total += Q * (X + 4) * (Y + 16) * Zp * itemsize
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit", 0)
        except Exception:
            limit = 0
        n_dev = 1 if self.plan is None else int(np.prod(list(self.plan.mesh.shape.values())))
        per_device = total // n_dev
        info = {"total_bytes": total, "per_device_bytes": per_device, "device_limit": limit}
        self.log.info(
            "memory estimate: %.2f GB total, %.2f GB/device (limit %.2f GB)",
            total / 1e9, per_device / 1e9, limit / 1e9 if limit else float("nan"),
        )
        if limit and per_device > 0.9 * limit:
            raise MemoryError(f"state would not fit on device: {info}")
        return info

    def checkpoint_arrays_extra(self) -> dict:
        """App-extension hook: extra arrays to checkpoint (analog of the
        reference's checkpointStateLocal, state.h:260)."""
        return {}

    def save_state(self, background: bool = False):
        """Checkpoint + loadstate flag (reference state.hpp:739-770).

        ``background=True`` hands the serialized blob to the native C++
        writer pool so the sim loop is not blocked; after_sim_finished
        flushes the pool, so periodic saves are safe to background."""
        arrays = {"f": self.f}
        if self.vm is not None:
            arrays["vm"] = self.vm
            arrays["vm2"] = self.vm2
        if self.vm_b is not None:
            arrays["vm_b"] = self.vm_b
            arrays["vm2_b"] = self.vm2_b
        arrays.update(self.checkpoint_arrays_extra())
        meta = {
            "iterations": self.iterations,
            "stat_counter": self.stat_counter,
            "stat2_counter": self.stat2_counter,
            "counters": {k: c.count for k, c in self.cnt.items()},
            "probe_cycles": {
                "1d": [p.cycle for p in self.probes_1d],
                "1dline": [p.cycle for p in self.probes_1d_line],
                "2d": [p.cycle for p in self.probes_2d],
                "3d": [p.cycle for p in self.probes_3d],
            },
            "phys_time": self.phys_time(),
        }
        ckpt.save_checkpoint(self.results_dir, arrays, meta,
                             background=background)
        if self.is_coordinator:
            self.flags.create("loadstate")
        self.log.info("checkpoint saved at iteration %d%s", self.iterations,
                      " (background write)" if background else "")

    def _print_stats(self):
        now = time.time()
        it = self.iterations
        d_it = it - self._glups_prev_iter
        d_t = now - (self._glups_prev_time or now)
        sites = self.domain.units.num_sites
        glups = sites * d_it / d_t / 1e9 if d_t > 0 else 0.0
        t = self.phys_time()
        eta = ""
        if np.isfinite(self.phys_final_time) and t > 0:
            frac = t / self.phys_final_time
            if frac > 0:
                rem = (now - self._t_wall_start) * (1 - frac) / frac
                eta = f" ETA {rem:.0f}s"
        self.log.info(
            "iter %d t=%.6g GLUPS=%.4f%s", it, t, glups, eta
        )
        if self.plan is not None and d_it > 0 and d_t > 0:
            # halo-bandwidth profile (analog of the reference's MPI stats
            # logged every 100 iterations, lbm.hpp:238-279)
            from tnl_lbm_tpu.parallel.profiling import halo_traffic

            ht = halo_traffic(self.domain, self.plan)
            self.prof.info(ht.log_line(d_it, d_t))
        self._glups_prev_iter = it
        self._glups_prev_time = now

    def sample_phase_timers(self, repeats: int = 3) -> dict | None:
        """Measured per-phase wall times of the hooked pipeline (u* pass /
        hook / main kernel, or the single NN kernel) on the CURRENT state,
        logged to the profile log - the analog of the reference's IBM
        phase-timing JSON (lagrange_3D.hpp:368-378,856-859).  Returns the
        dict of ms, or None when the built step has no phase probe
        (un-hooked configs, sharded hooked runs - use --profile there)."""
        pt = getattr(self._step, "phase_times", None)
        if pt is None or self.f is None:
            return None
        nu = self._dispatch_arg(self.domain.units.lbm_viscosity())
        force = self.body_force(self.phys_time())
        if force is not None:
            force = self._dispatch_arg(force)
        parity = (self.iterations % 2) if self.cfg.streaming == "AA" else 0
        try:
            out = pt(self.f, nu, force=force, parity=parity, repeats=repeats)
        except Exception as exc:  # diagnostic only - never kill the run
            self.log.warning("phase-timer sampling failed (%s)",
                             type(exc).__name__)
            return None
        line = ", ".join(f"{k} {v:.2f} ms" for k, v in out.items())
        self.prof.info("hooked phases (sampled): %s", line)
        self.log.info("hooked phases (sampled): %s", line)
        return out

    def after_sim_finished(self):
        from tnl_lbm_tpu.io import native

        #: one sampled phase breakdown per hooked run (regression guard for
        #: the round-3 NN/IBM pipeline speedups); opt out by setting
        #: sample_phases_at_finish = False before run()
        if getattr(self, "sample_phases_at_finish", True):
            self.sample_phase_timers()

        native.flush()  # drain async snapshot writes
        if native.errors():
            self.log.error("%d async output writes failed", native.errors())
        wall = time.time() - self._t_wall_start
        it = self.iterations - self.start_iterations
        sites = self.domain.units.num_sites
        avg = sites * it / wall / 1e9 if wall > 0 else 0.0
        comp = sites * it / self._compute_time / 1e9 if self._compute_time > 0 else 0.0
        self.log.info(
            "finished: %d iterations, wall %.2fs, avg GLUPS %.4f, compute GLUPS %.4f",
            it, wall, avg, comp,
        )
        # timer battery (analog of reference state.h:266-279 / state.hpp:1285-1300)
        other = max(wall - self._compute_time - self._io_time, 0.0)
        self.prof.info(
            "timers: compute %.2fs, io %.2fs, other (host/actions) %.2fs",
            self._compute_time, self._io_time, other,
        )

    # ---------------------------------------------------------------- loop
    def run(self) -> bool:
        """The execute() loop (reference core.h:38-101)."""
        if not self.can_compute():
            return False
        tracing = False
        try:
            self.sim_init()
            if self.profile_dir is not None:
                jax.profiler.start_trace(str(self.profile_dir))
                tracing = True
            while True:
                if self.domain.units.lbm_viscosity() <= 0:
                    self.log.error("zero viscosity - terminating (reference state.hpp:985-990)")
                    break
                self._advance(self.steps_per_dispatch)
                self._after_sim_update()
                if self.terminate:
                    if self.is_coordinator:
                        self.flags.create("terminated")
                    break
                if self.phys_time() >= self.phys_final_time:
                    if self.is_coordinator:
                        self.flags.create("finished")
                    break
                if (
                    self.wall_time_limit is not None
                    # the walltime decision comes from LOCAL clocks, which
                    # skew across hosts: broadcast the coordinator's call so
                    # every rank leaves the loop together (the reference
                    # reaches collective agreement the same way, core.h:60-68)
                    and dist.broadcast_flag(
                        time.time() - self._t_wall_start > self.wall_time_limit)
                ):
                    self.log.info("walltime limit reached - saving state")
                    self.save_state()
                    break
            self.after_sim_finished()
            return not self.nan_detected
        finally:
            if tracing:
                jax.profiler.stop_trace()
                self._trace_summary()
            self._lock.release()

    def _trace_summary(self):
        """Reduce the captured profiler trace to the measured wall-time
        split (the reference's compute / comm-overlap / comm-wait battery,
        state.hpp:1285-1300) and publish it next to the results."""
        if not self.is_coordinator:
            return
        try:
            from tnl_lbm_tpu.utils.trace_analysis import (
                format_anatomy,
                write_summary,
            )

            a = write_summary(self.profile_dir,
                              self._results_path("profile_summary.json"))
        except Exception:
            a = None
        if a is not None:
            self.log.info(format_anatomy(a))
            self.prof.info(format_anatomy(a))
        else:
            self.log.info("profiler trace captured in %s (no xplane parser "
                          "in this runtime image)", self.profile_dir)

    def _after_sim_update(self):
        t = self.phys_time()
        c = self.cnt
        # NaN scan on its own step cadence so the guard is live even when
        # no PRINT period is configured (reference scans every step,
        # state.hpp:1166-1188)
        if (
            self.nan_check_every
            and self.iterations - self._last_nan_check >= self.nan_check_every
        ):
            self._last_nan_check = self.iterations
            if self._nan_guard():
                return
        if c[PRINT].action(t):
            c[PRINT].count += 1
            if self._nan_guard():
                return
            self._print_stats()
        if c[STAT_RESET].action(t):
            c[STAT_RESET].count += 1
            if self.vm is not None:
                self.vm = jnp.zeros_like(self.vm)
                self.vm2 = jnp.zeros_like(self.vm2)
            self.stat_counter = 0
        if c[STAT2_RESET].action(t):
            c[STAT2_RESET].count += 1
            if self.vm_b is not None:
                self.vm_b = jnp.zeros_like(self.vm_b)
                self.vm2_b = jnp.zeros_like(self.vm2_b)
            self.stat2_counter = 0
        for name, hook in ((PROBE1, self.probe1), (PROBE2, self.probe2), (PROBE3, self.probe3)):
            if c[name].action(t):
                c[name].count += 1
                hook()
        if c[VTK1D].action(t):
            c[VTK1D].count += 1
            t_io = time.perf_counter()
            self._write_probes_1d()
            self._write_probes_1d_line()
            self._io_time += time.perf_counter() - t_io
        if c[VTK2D].action(t):
            c[VTK2D].count += 1
            t_io = time.perf_counter()
            self._write_vtk_2d()
            self._io_time += time.perf_counter() - t_io
        if c[VTK3D].action(t):
            t_io = time.perf_counter()
            self._write_vtk_3d()
            self._io_time += time.perf_counter() - t_io
            c[VTK3D].count += 1
        if c[VTK3DCUT].action(t):
            c[VTK3DCUT].count += 1
            t_io = time.perf_counter()
            self._write_vtk_3dcut()
            self._io_time += time.perf_counter() - t_io
        if c[SAVESTATE].period > 0:
            wall = time.time() - self._t_wall_start
            # save_checkpoint is collective (broadcast + barriers), but this
            # trigger reads the LOCAL wall clock: broadcast the coordinator's
            # decision so every rank enters the save on the same dispatch
            # (same agreement the reference reaches via MPI, core.h:70-76)
            if dist.broadcast_flag(
                    wall >= c[SAVESTATE].count * c[SAVESTATE].period):
                c[SAVESTATE].count += 1
                if c[SAVESTATE].count > 1:  # skip initial save (reference state.hpp:948)
                    self.save_state(background=True)
