"""The fused collide-and-stream step (XLA reference path).

One call advances the lattice one time step, mirroring the reference's fused
kernel flow per site: pull-streaming -> boundary handling -> collision ->
write -> macro output (reference: include/lbm3d/kernels.h:60-100).  All
branching is mask-select over GEO codes; only codes present in the map are
materialized (trace-time specialization).

A-A pattern parity (reference d3q27/streaming_AA.h):
- even step: read same-site same-direction, write same-site opposite;
- odd step: read neighbor opposite-direction, write neighbor same-direction.
Both are compositions of ``pull`` and the opposite-direction permutation.
The A-B pattern is the plain functional double buffer (donate the input).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.ops import boundary as bc
from tnl_lbm_tpu.ops import moments as mom
from tnl_lbm_tpu.ops import streaming as stream
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim.config import Domain, LBMConfig


def _bcast(lat, arr, shape, dtype):
    """Broadcast a [D] or [D, *S] input to [D, *S']-compatible shape."""
    a = jnp.asarray(arr, dtype=dtype)
    if a.ndim == 1:
        a = a.reshape((lat.D,) + (1,) * len(shape))
    return a


def make_step(cfg: LBMConfig, domain: Domain, pad_halo=None, local_shape=None):
    """Build the per-step function for (cfg, domain).

    Returns ``step(f, nu, u_in=None, force=None, parity=0, map_arr=None,
    bouzidi_arr=None) -> (f_new, rho, u)`` with ``parity`` a Python-static
    A-A parity flag (ignored for A-B).  ``map_arr`` defaults to the domain's
    global map; the distributed wrapper passes each shard's local block
    instead (masks are derived from it inside the traced step, so they shard
    with the data).

    ``pad_halo`` may be overridden with a distributed implementation
    (parallel/halo.py) and ``local_shape`` with the per-shard block shape -
    the local step logic is identical on every shard.
    """
    lat = cfg.lat
    D = lat.D
    S = tuple(local_shape) if local_shape is not None else domain.shape
    dtype = cfg.compute_dtype
    codes = domain.codes_present()
    opp = np.asarray(lat.opp)
    if pad_halo is None:
        pad_halo = lambda f, comps="all": stream.pad_halo(f, domain.periodic)  # noqa: E731

    # direction-subset halo hint (the reference's df_sync_directions,
    # defs.h:307-340): the injected distributed pad transfers only the
    # components each face actually streams; codes whose pulls read other
    # components' halos force the full exchange (Bouzidi reads +c offsets)
    _comps_pull = "all" if GEO.FLUID_NEAR_WALL in codes else "own"
    _comps_pull_aa = "all" if GEO.FLUID_NEAR_WALL in codes else "opp"

    do_coll_codes = np.array(
        [int(c) for c in (bc.collision_mask_codes(D) & codes)], dtype=domain.map.dtype
    )
    sym_codes = [c for c in codes if c in bc.sym_table(D)]

    if cfg.streaming == "AA" and GEO.OUTFLOW_RIGHT_INTERP in codes:
        raise NotImplementedError("OUTFLOW_RIGHT_INTERP requires the A-B pattern")

    def _stream_in(f, parity, masks, bouzidi_thetas):
        """Post-streaming DFs at every site, including BC pull modifications."""
        if cfg.streaming == "AA" and parity == 0:
            return f  # even step: same site, same direction
        src = opp if cfg.streaming == "AA" else None
        fpad = pad_halo(f, comps=_comps_pull if src is None else _comps_pull_aa)
        if src is None:
            f_in = stream.pull(lat, fpad, S)
        else:
            f_in = stream.pull_from(lat, fpad, S, src)
        if GEO.OUTFLOW_RIGHT in codes:
            # pull every direction from x-1 (reference bc.h:64-65)
            if src is None:
                f_or = stream.pull_shift_x(lat, fpad, S, dx=-1)
            else:
                f_or = jnp.stack([
                    stream._shift_slices(
                        fpad[int(src[q])],
                        [-1] + [-int(c) for c in lat.c[q][1:]],
                        S,
                    )
                    for q in range(lat.Q)
                ])
            f_in = jnp.where(masks[GEO.OUTFLOW_RIGHT], f_or, f_in)
        if GEO.OUTFLOW_RIGHT_INTERP in codes:
            f_in = jnp.where(
                masks[GEO.OUTFLOW_RIGHT_INTERP], stream.pull_interp_right(lat, fpad, S), f_in
            )
        if GEO.FLUID_NEAR_WALL in codes and bouzidi_thetas is not None:
            f_in = jnp.where(
                masks[GEO.FLUID_NEAR_WALL],
                _bouzidi(fpad, f_in, bouzidi_thetas),
                f_in,
            )
        return f_in

    def _bouzidi(fpad, f_in, bouzidi_thetas):
        """Bouzidi second-order curved-wall interpolation (D2Q9,
        reference d2q9/bc.h:61-87,140-167).

        For each incoming direction q (pulled from x - c_q), theta[q] is the
        normalized wall distance along the link in direction opp(q):
          theta <= 1/2: f_q = 2 theta f_opp(q)(x) + (1 - 2 theta) f_opp(q)(x + c_opp)
          theta >  1/2: f_q = (1 - 1/(2 theta)) f_q(x) + 1/(2 theta) f_opp(q)(x)
          theta <  0  : ordinary streaming (link does not hit the wall).
        """
        rows = []
        f_here = jnp.stack([stream._shift_slices(fpad[q], [0] * D, S) for q in range(lat.Q)])
        for q in range(lat.Q):
            if q == 0:
                rows.append(f_here[0])
                continue
            qo = int(opp[q])
            th = bouzidi_thetas[q - 1]
            fA = f_here[qo]        # f_opp at the boundary node
            fOppA = f_here[q]      # f_q at the boundary node
            # interior neighbor one link further from the wall: x + c_q
            fB = stream._shift_slices(fpad[qo], [int(c) for c in lat.c[q]], S)
            small = 2 * th * fA + (1 - 2 * th) * fB
            w = 0.5 / jnp.maximum(th, 0.25)  # th > 1/2 branch (guarded)
            large = (1 - w) * fOppA + w * fA
            interp = jnp.where(th <= 0.5, small, large)
            rows.append(jnp.where(th < 0, f_in[q], interp))
        return jnp.stack(rows)

    def step(f, nu, u_in=None, force=None, parity: int = 0, map_arr=None,
             bouzidi_arr=None, hook_consts=None):
        if map_arr is None:
            map_arr = jnp.asarray(domain.map)
        if bouzidi_arr is None and domain.bouzidi is not None:
            bouzidi_arr = jnp.asarray(domain.bouzidi, dtype=dtype)
        masks = {c: map_arr == int(c) for c in codes}
        do_coll = jnp.isin(map_arr, jnp.asarray(do_coll_codes))

        f_old = f
        f_in = _stream_in(f, parity, masks, bouzidi_arr)

        u_in_b = _bcast(lat, u_in, S, dtype) if u_in is not None else None
        force_b = _bcast(lat, force, S, dtype) if force is not None else None

        # pure f transforms
        if GEO.WALL in codes:
            f_in = bc.apply_bounce_back(lat, f_in, masks[GEO.WALL])
        for c in sym_codes:
            axis, sign = bc.sym_table(D)[c]
            f_in = bc.apply_symmetry(lat, f_in, masks[c], axis, sign)

        # optional forcing hook (e.g. non-Newtonian div(S) force); evaluated
        # with the homogeneous-force velocity, then folded into the total
        # force for the final moments + collision
        if cfg.forcing_hook is not None:
            rho0, u0 = mom.density_velocity(lat, f_in, force=force_b, well=cfg.well,
                                            high_precision=cfg.high_precision_rho)
            fluid = masks.get(GEO.FLUID, jnp.zeros(S, bool))
            if getattr(cfg.forcing_hook, "consts", None) is not None:
                extra = cfg.forcing_hook(lat, rho0, u0, nu, fluid,
                                         consts=hook_consts)
            else:
                extra = cfg.forcing_hook(lat, rho0, u0, nu, fluid)
            force_b = extra if force_b is None else force_b + extra

        # moments (with half-force correction)
        rho, u = mom.density_velocity(lat, f_in, force=force_b, well=cfg.well,
                                      high_precision=cfg.high_precision_rho)

        one = jnp.ones((), dtype)
        if GEO.INFLOW_LEFT in codes:
            # the moment BC operates on total DFs; convert for well storage
            w_const = jnp.asarray(lat.w, dtype).reshape((lat.Q,) + (1,) * len(S))
            f_tot = f_in + w_const if cfg.well else f_in
            f_il, rho_il = bc.inflow_left_moment_bc(lat, f_tot, u_in_b)
            if cfg.well:
                f_il = f_il - w_const
            m = masks[GEO.INFLOW_LEFT]
            f_in = jnp.where(m, f_il, f_in)
            rho = jnp.where(m, rho_il, rho)
            u = jnp.where(m, jnp.broadcast_to(u_in_b, u.shape), u)

        # equilibrium-replacement BCs
        if GEO.INFLOW in codes:
            m = masks[GEO.INFLOW]
            f_eq_in = cfg.eq(lat, one, u_in_b).astype(dtype)
            f_in = jnp.where(m, jnp.broadcast_to(f_eq_in, f_in.shape), f_in)
            rho = jnp.where(m, one, rho)
            u = jnp.where(m, jnp.broadcast_to(u_in_b, u.shape), u)
        if GEO.OUTFLOW_EQ in codes:
            m = masks[GEO.OUTFLOW_EQ]
            f_in = jnp.where(m, cfg.eq(lat, one, u), f_in)
            rho = jnp.where(m, one, rho)
        if GEO.OUTFLOW_RIGHT in codes:
            rho = jnp.where(masks[GEO.OUTFLOW_RIGHT], one, rho)
        if GEO.OUTFLOW_RIGHT_INTERP in codes:
            # equilibrium decomposition toward rho_out = 1
            # (reference bc.h:138-143, common.h:94-124)
            m = masks[GEO.OUTFLOW_RIGHT_INTERP]
            f_in = jnp.where(m, f_in + cfg.eq(lat, one, u) - cfg.eq(lat, rho, u), f_in)
            rho = jnp.where(m, one, rho)

        # dense collision, masked select (cheap: boundary fraction is small)
        rho_safe = jnp.where(rho == 0, one, rho)
        f_post = cfg.collision(lat, f_in, rho_safe, u, nu, force=force_b)
        f_post = jnp.where(do_coll, f_post, f_in)

        # write-out / A-A parity
        if cfg.streaming == "AA":
            if parity == 0:
                f_out = f_post[opp]
            else:
                # push = pull of the padded post-collision field (uses the
                # injected halo exchange so it works under shard_map too)
                f_out = stream.pull(lat, pad_halo(f_post, comps="own"), S)
        else:
            f_out = f_post

        # inert ghost sites keep their previous DFs (reference bc.h:54-61,254-257)
        if GEO.NOTHING in codes:
            f_out = jnp.where(masks[GEO.NOTHING], f_old, f_out)

        # macro output conventions per BC
        rho_out, u_out = rho, u
        zero_u = jnp.zeros_like(u)
        for c in (GEO.WALL, GEO.NOTHING):
            if c in codes:
                rho_out = jnp.where(masks[c], one, rho_out)
                u_out = jnp.where(masks[c], zero_u, u_out)
        return f_out, rho_out, u_out

    def ustar(f, force=None, parity: int = 0, map_arr=None, bouzidi_arr=None):
        """Pre-kernel u* pass (reference kernels.h:178-218 analog): the
        streamed + f-transformed moments with the homogeneous force only -
        exactly the hook input the full step computes at sim/step.py:156-159.
        Returns (rho0, u0, fluid_mask).  Used by kernels/hooked.py to run
        forcing-hook configs (IBM, non-Newtonian) on the fused Pallas path.
        """
        if map_arr is None:
            map_arr = jnp.asarray(domain.map)
        if bouzidi_arr is None and domain.bouzidi is not None:
            bouzidi_arr = jnp.asarray(domain.bouzidi, dtype=dtype)
        masks = {c: map_arr == int(c) for c in codes}
        f_in = _stream_in(f, parity, masks, bouzidi_arr)
        force_b = _bcast(lat, force, S, dtype) if force is not None else None
        if GEO.WALL in codes:
            f_in = bc.apply_bounce_back(lat, f_in, masks[GEO.WALL])
        for c in sym_codes:
            axis, sign = bc.sym_table(D)[c]
            f_in = bc.apply_symmetry(lat, f_in, masks[c], axis, sign)
        rho0, u0 = mom.density_velocity(lat, f_in, force=force_b, well=cfg.well,
                                        high_precision=cfg.high_precision_rho)
        fluid = masks.get(GEO.FLUID, jnp.zeros(S, bool))
        return rho0, u0, fluid

    step.ustar = ustar
    return step
