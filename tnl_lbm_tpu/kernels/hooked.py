"""Forcing-hook configs (IBM, non-Newtonian) on the fused Pallas path.

The reference folds per-site forcing into its single production kernel via
macro force channels: a pre-kernel computes u* and zeroes the channels
(kernels.h:178-218), the hook (IBM force solve / non-Newtonian stress
kernels) fills them, and the main kernel consumes them through
MACRO::computeForcing (kernels.h:92).  The TPU equivalent here is the same
three-phase structure per step:

1. **u* pass** (XLA): streamed + f-transformed moments with the homogeneous
   force only - ``make_step(...).ustar`` (sim/step.py), bitwise the hook
   input of the XLA reference step.
2. **hook** (XLA): ``cfg.forcing_hook(lat, rho0, u0, nu, fluid)`` returns
   the per-site force field; the homogeneous force is added to it.
3. **fused kernel** with a per-site ``[3, X, Y, Z]`` force operand
   (``force_field=True`` in kernels/fused.py / fused_aa.py), DMA'd
   tile-by-tile next to the map.

The u* pass re-reads the DF field (~0.6 of a fused step's traffic), exactly
like the reference's separate pre-kernel - still ~5x faster than running
the whole step on the XLA path.  Regression-tested against make_step with
the same hooked config (tests/test_fused_kernel.py).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tnl_lbm_tpu.sim.config import Domain, LBMConfig


def make_hooked_fused_step(cfg: LBMConfig, domain: Domain, **kernel_kwargs):
    """Fused step for a config with ``forcing_hook`` set.

    Returns ``step(f, nu, u_in=None, force=None, parity=0) ->
    (f_new, rho, u)`` matching ``sim.step.make_step(cfg, domain)`` (the
    XLA path) to fp tolerance.  ``force`` is the homogeneous body force
    ([3] vector or [3, X, Y, Z] field); the hook's output is added to it.
    """
    assert cfg.forcing_hook is not None, "use make_fused_step for plain configs"
    from tnl_lbm_tpu.kernels.fused import make_fused_step
    from tnl_lbm_tpu.kernels.fused_aa import make_fused_step_aa
    from tnl_lbm_tpu.sim.step import make_step

    import jax.numpy as _jnp
    import numpy as _np

    lat = cfg.lat
    dtype = cfg.compute_dtype
    hook = cfg.forcing_hook
    pallas_hook = kernel_kwargs.pop("pallas_hook", True)
    single_kernel = kernel_kwargs.pop("single_kernel", True)
    cfg_nohook = dataclasses.replace(cfg, forcing_hook=None)

    # round 3: single-kernel non-Newtonian step - u* + strain-rate +
    # rheology + forcing + collision in ONE Pallas program per parity
    # (kernels/fused_nn_step.py); the three-phase pipeline below stays the
    # fallback for per-site force fields (IBM) and unsupported geometries
    # tile geometry kwargs belong to the single-kernel NN build only; the
    # three-phase fallback builders have their own (different) tilings
    nn_kwargs = {k: kernel_kwargs.pop(k) for k in
                 ("tile", "tiles_per_program", "with_macro", "vmem_budget")
                 if k in kernel_kwargs}
    nn_single = None
    if (single_kernel and pallas_hook and lat.D == 3
            and getattr(hook, "nn_model", None) is not None):
        from tnl_lbm_tpu.kernels import fused_nn_step

        if fused_nn_step.supports(cfg, domain, hook.nn_periodic):
            nn_single = fused_nn_step.make_fused_nn_step(
                cfg, domain, hook.nn_model, hook.nn_periodic, **nn_kwargs)
    # round 3: the macro pre-pass and the main kernel read the SAME haloed
    # array - build both prepadded and pad once per step (saves a full
    # read+write pass of the DF field)
    share_pad = lat.D == 3 and cfg.streaming in ("AB", "AA")
    if lat.D == 2:
        # round 3: 2D hooked kernel (the reference's 2D apps accept the
        # same plugin set as 3D) - per-site [2, X, Y] force operand
        from tnl_lbm_tpu.kernels.fused_2d import make_fused_step_2d

        base = make_fused_step_2d(cfg_nohook, domain, force_field=True)
    elif cfg.streaming == "AA":
        base = make_fused_step_aa(cfg_nohook, domain, force_field=True,
                                  prepadded=share_pad, **kernel_kwargs)
    else:
        base = make_fused_step(cfg_nohook, domain, force_field=True,
                               prepadded=share_pad, **kernel_kwargs)
    xla_ustar = make_step(cfg_nohook, domain).ustar

    # single-kernel Pallas non-Newtonian forcing (round 3): hooks built by
    # make_nn_forcing_hook carry the model/periodic markers; the fused_nn
    # kernel replaces the whole XLA stencil pipeline (the dominant cost of
    # the hooked step - see kernels/fused_nn.py)
    nn_force = None
    nn_model = getattr(hook, "nn_model", None)
    if nn_model is not None and lat.D == 3 and pallas_hook:
        from tnl_lbm_tpu.kernels.fused_nn import make_nn_force_kernel
        from tnl_lbm_tpu.ops.boundary import GEO as _GEO2

        nn_force = make_nn_force_kernel(
            nn_model, domain, dtype,
            _np.asarray(domain.map) == int(_GEO2.FLUID),
            periodic=hook.nn_periodic)
    if share_pad:
        # round 3: Pallas u* pre-pass (macro_only kernels - parity-aware
        # read + BC transforms + moments, no collision, no f write;
        # ~0.3-0.5x the HBM traffic of a full step vs the XLA ustar's ~3x)
        from tnl_lbm_tpu.kernels.fused import _pad_once
        from tnl_lbm_tpu.kernels.fused_aa import _pad_aa_odd, _pad_map_ring
        from tnl_lbm_tpu.ops.boundary import GEO as _GEO

        map_np = _np.asarray(domain.map, _np.int32)
        if cfg.streaming == "AB":
            macro = make_fused_step(cfg_nohook, domain, macro_only=True,
                                    prepadded=True)
        else:
            macro = make_fused_step_aa(cfg_nohook, domain, macro_only=True,
                                       prepadded=True)
            map_ring = _pad_map_ring(map_np, domain.periodic)
        fluid_mask = _jnp.asarray(map_np == int(_GEO.FLUID))

        def prep(f, parity):
            """Shared haloed input + map kwargs for macro and base (lane
            padding to the 128 multiple happens inside each call)."""
            if cfg.streaming == "AB":
                return _pad_once(f, domain.periodic, extra_y=6), {}
            if parity == 1:
                return (_pad_aa_odd(f, domain.periodic),
                        {"map_ring_in": jnp.asarray(map_ring)})
            return f, {"map_arr_in": map_np}

        def ustar(f_in, force=None, parity: int = 0, **aux):
            fvec = None if (force is not None and force.ndim > 1) else force
            rho0, u0 = macro(f_in, 0.0, force=fvec, parity=parity, **aux)
            if fvec is None and force is not None:
                # [3, X, Y, Z] homogeneous-force field: fold the half-force
                # correction in afterwards (the kernel only takes vectors)
                u0 = u0 + force.astype(dtype) / (2 * _jnp.maximum(rho0, 1e-12))
            return rho0, u0, fluid_mask
    else:
        ustar = xla_ustar

    has_consts = getattr(hook, "consts", None) is not None

    def step(f, nu, u_in=None, force=None, parity: int = 0,
             hook_consts=None):
        if nn_single is not None and (force is None or jnp.ndim(force) <= 1):
            # homogeneous (or no) body force: the whole step is one kernel
            return nn_single(f, nu, u_in=u_in, force=force, parity=parity)
        if share_pad:
            f_in, aux = prep(f, parity)
            rho0, u0, fluid = ustar(f_in, force=force, parity=parity, **aux)
        else:
            f_in, aux = f, {}
            rho0, u0, fluid = ustar(f, force=force, parity=parity)
        if nn_force is not None:
            extra = nn_force(rho0, u0, nu)
        elif has_consts:
            extra = hook(lat, rho0, u0, nu, fluid,
                         consts=hook_consts).astype(dtype)
        else:
            extra = hook(lat, rho0, u0, nu, fluid).astype(dtype)
        if force is not None:
            fb = jnp.asarray(force, dtype)
            if fb.ndim == 1:
                fb = fb.reshape((lat.D,) + (1,) * lat.D)
            extra = extra + fb
        if lat.D == 2:
            extra = jnp.broadcast_to(extra, (2,) + tuple(domain.shape))
            return base(f, nu, u_in=u_in, force=extra)
        return base(f_in, nu, u_in=u_in, force=extra, parity=parity, **aux)

    def phase_times(f, nu, force=None, parity: int = 0,
                    repeats: int = 3) -> dict:
        """Sampled per-phase wall times of the hooked pipeline, in ms
        (min over ``repeats``): u* pre-pass / hook / main kernel, or the
        one-kernel time when the single-kernel NN path applies.  The
        analog of the reference's IBM phase-timing JSON
        (lagrange_3D.hpp:368-378,856-859).  Diagnostic only - each phase
        is jitted and timed in isolation on the given state."""
        import time as _time

        import jax as _jax

        def bench(fn, *a):
            jfn = _jax.jit(fn)
            _jax.block_until_ready(jfn(*a))
            ts = []
            for _ in range(repeats):
                t0 = _time.perf_counter()
                _jax.block_until_ready(jfn(*a))
                ts.append(_time.perf_counter() - t0)
            return min(ts) * 1e3

        out = {}
        if nn_single is not None and (force is None or jnp.ndim(force) <= 1):
            out["single_kernel"] = bench(
                lambda g: nn_single(g, nu, force=force, parity=parity), f)
            return out
        if share_pad:
            f_in, aux = prep(f, parity)
            out["pad"] = bench(lambda g: prep(g, parity)[0], f)
            out["ustar"] = bench(
                lambda g: ustar(g, force=force, parity=parity, **aux), f_in)
            rho0, u0, fluid_c = ustar(f_in, force=force, parity=parity, **aux)
        else:
            f_in, aux = f, {}
            out["ustar"] = bench(
                lambda g: ustar(g, force=force, parity=parity), f)
            rho0, u0, fluid_c = ustar(f, force=force, parity=parity)
        if nn_force is not None:
            out["hook"] = bench(lambda r, u: nn_force(r, u, nu), rho0, u0)
            extra = nn_force(rho0, u0, nu)
        elif has_consts:
            out["hook"] = bench(
                lambda r, u: hook(lat, r, u, nu, fluid_c, consts=hook.consts),
                rho0, u0)
            extra = hook(lat, rho0, u0, nu, fluid_c, consts=hook.consts)
        else:
            out["hook"] = bench(
                lambda r, u: hook(lat, r, u, nu, fluid_c), rho0, u0)
            extra = hook(lat, rho0, u0, nu, fluid_c)
        extra = extra.astype(dtype)
        if force is not None:
            fb = jnp.asarray(force, dtype)
            if fb.ndim == 1:
                fb = fb.reshape((lat.D,) + (1,) * lat.D)
            extra = extra + fb
        if lat.D == 2:
            extra_b = jnp.broadcast_to(extra, (2,) + tuple(domain.shape))
            out["main_kernel"] = bench(
                lambda g, e: base(g, nu, force=e), f, extra_b)
        else:
            out["main_kernel"] = bench(
                lambda g, e: base(g, nu, force=e, parity=parity, **aux),
                f_in, extra)
        return out

    step.phase_times = phase_times
    return step


def make_sharded_hooked_fused_step(cfg: LBMConfig, domain: Domain, plan,
                                   **kernel_kwargs):
    """Distributed forcing-hook (IBM / non-Newtonian) step on the fused
    Pallas path (round 3) - the analog of the reference's multi-GPU hooked
    kernels (reference state.hpp:995-1015, nonNewtonian.h:216-391 + MPI
    sync).  Same three-phase structure as ``make_hooked_fused_step``:

    1. **u* pass**: the sharded macro-only Pallas kernel (ppermute halos +
       stream/BC-transform/moments, no collision, no f write).
    2. **hook**: plain XLA on the GSPMD-sharded global arrays - the
       strain-rate / IBM stencils partition automatically (XLA inserts the
       halo collectives), replacing the reference's hand-rolled MPI sync of
       the non-Newtonian ghost layers.
    3. **force-field sharded fused kernel** (per-site [3, X, Y, Z] force
       operand, sharded like u).

    Both streaming patterns run the Pallas kernels: A-B via
    ``make_sharded_fused_step`` and (round 3) A-A via
    ``make_sharded_fused_step_aa`` - the odd-parity force ring is exchanged
    across shard seams inside the A-A wrapper.  Returns ``step(f, map_arr,
    nu, u_in=None, force=None, parity=0)`` matching ``make_sharded_step``.
    """
    assert cfg.forcing_hook is not None, "use make_sharded_fused_step"
    assert cfg.streaming in ("AB", "AA"), "unknown streaming pattern"
    import numpy as np

    from tnl_lbm_tpu.ops.boundary import GEO
    from tnl_lbm_tpu.parallel.sharded import (
        make_sharded_fused_step,
        make_sharded_fused_step_aa,
    )

    lat = cfg.lat
    dtype = cfg.compute_dtype
    hook = cfg.forcing_hook

    if lat.D == 2:
        # 2D hooked sharded (round 3): GSPMD XLA u* + hook feed the
        # force-field sharded 2D Pallas kernel (the 2D apps accept the
        # same plugin set as 3D, like the reference's)
        from tnl_lbm_tpu.parallel.sharded import make_sharded_fused_step_2d
        from tnl_lbm_tpu.sim.step import make_step as _mk2

        cfg_nohook2 = dataclasses.replace(cfg, forcing_hook=None)
        base2 = make_sharded_fused_step_2d(cfg_nohook2, domain, plan,
                                           force_field=True)
        ustar2 = _mk2(cfg_nohook2, domain).ustar
        has_consts2 = getattr(hook, "consts", None) is not None

        def step2(f, map_arr, nu, u_in=None, force=None, parity: int = 0,
                  hook_consts=None, bouzidi_arr=None):
            del parity
            fvec = (None if (force is not None and jnp.ndim(force) > 1)
                    else force)
            rho0, u0, fluid = ustar2(f, force=fvec)
            kw = {"consts": hook_consts} if has_consts2 else {}
            extra = hook(lat, rho0, u0, nu, fluid, **kw).astype(dtype)
            if force is not None:
                fb = jnp.asarray(force, dtype)
                if fb.ndim == 1:
                    fb = fb.reshape((2, 1, 1))
                extra = extra + fb
            extra = jnp.broadcast_to(extra, (2,) + tuple(domain.shape))
            return base2(f, map_arr, nu, u_in=u_in, force=extra,
                         bouzidi_arr=bouzidi_arr)

        step2.sharded_consts = dict(getattr(base2, "sharded_consts", {}))
        return step2

    # round 3: non-Newtonian configs collapse the whole sharded step into
    # ONE kernel per shard (master halo exchange + seam-aware edge fixes)
    # instead of the three-phase macro/hook/force pipeline below
    if (kernel_kwargs.pop("single_kernel", True)
            and getattr(hook, "nn_model", None) is not None):
        from tnl_lbm_tpu.kernels import fused_nn_step
        from tnl_lbm_tpu.parallel.sharded import make_sharded_fused_nn_step

        ax_z = plan.spatial_axes[2]
        z_unsharded = ax_z is None or plan.mesh.shape[ax_z] == 1
        if fused_nn_step.supports(cfg, domain, hook.nn_periodic) and z_unsharded:
            nn_sharded = make_sharded_fused_nn_step(
                cfg, domain, plan, hook.nn_model, hook.nn_periodic,
                **{k: v for k, v in kernel_kwargs.items()
                   if k in ("tile", "tiles_per_program", "with_macro")})

            def step(f, map_arr, nu, u_in=None, force=None, parity: int = 0,
                     hook_consts=None, fluid_mask=None):
                del hook_consts  # NN hooks carry no consts pytree
                return nn_sharded(f, map_arr, nu, u_in=u_in, force=force,
                                  parity=parity, fluid_mask=fluid_mask)

            step.sharded_consts = dict(
                getattr(nn_sharded, "sharded_consts", {}))
            return step

    cfg_nohook = dataclasses.replace(cfg, forcing_hook=None)
    builder = (make_sharded_fused_step_aa if cfg.streaming == "AA"
               else make_sharded_fused_step)
    base = builder(cfg_nohook, domain, plan,
                   force_field=True, **kernel_kwargs)
    macro = builder(cfg_nohook, domain, plan,
                    macro_only=True, **kernel_kwargs)
    fluid_mask_g = plan.shard_field(
        jnp.asarray(np.asarray(domain.map) == int(GEO.FLUID)), like_f=False)

    has_consts = getattr(hook, "consts", None) is not None
    shard_local = getattr(hook, "shard_local", False)

    def _eval_hook(rho0, u0, nu, hook_consts, fl_mask):
        """Hook dispatch: global GSPMD for stencil hooks (XLA partitions
        them), or inside its OWN shard_map for ownership-partitioned hooks
        (IBM's sharded_hook: lax.axis_index/psum over the mesh axes) -
        round 3: distributed IBM now rides the fused pipeline too."""
        if not shard_local:
            if has_consts:
                return hook(lat, rho0, u0, nu, fl_mask,
                            consts=hook_consts).astype(dtype)
            return hook(lat, rho0, u0, nu, fl_mask).astype(dtype)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def body(rho_l, u_l, fl_l, nu_r, *maybe_hc):
            hc = maybe_hc[0] if maybe_hc else None
            kw = {"consts": hc} if has_consts else {}
            return hook(lat, rho_l, u_l, nu_r, fl_l, **kw)

        in_specs = [plan.spec_site, plan.spec_f, plan.spec_site, P()]
        operands = [rho0, u0, fl_mask, jnp.asarray(nu, dtype)]
        if has_consts:
            in_specs.append(P())  # replicated consts pytree
            operands.append(hook_consts)
        return shard_map(
            body, mesh=plan.mesh, in_specs=tuple(in_specs),
            out_specs=plan.spec_f, check_vma=False,
        )(*operands).astype(dtype)

    def step(f, map_arr, nu, u_in=None, force=None, parity: int = 0,
             hook_consts=None, fluid_mask=None):
        fvec = None if (force is not None and jnp.ndim(force) > 1) else force
        rho0, u0 = macro(f, map_arr, nu, u_in=u_in, force=fvec, parity=parity)
        if fvec is None and force is not None:
            # [3, X, Y, Z] homogeneous-force field: fold the half-force
            # correction in afterwards (the macro kernel takes vectors only)
            u0 = u0 + force.astype(dtype) / (2 * jnp.maximum(rho0, 1e-12))
        if shard_local and has_consts and hook_consts is None:
            hook_consts = hook.consts
        # multi-process callers pass the mask (see step.sharded_consts);
        # the closure default only works single-process
        extra = _eval_hook(rho0, u0, nu, hook_consts,
                           fluid_mask_g if fluid_mask is None else fluid_mask)
        if force is not None:
            fb = jnp.asarray(force, dtype)
            if fb.ndim == 1:
                fb = fb.reshape((3, 1, 1, 1))
            extra = extra + fb
        extra = jnp.broadcast_to(extra, (3,) + tuple(domain.shape))
        return base(f, map_arr, nu, u_in=u_in, force=extra, parity=parity)

    step.sharded_consts = {"fluid_mask": fluid_mask_g}
    return step
