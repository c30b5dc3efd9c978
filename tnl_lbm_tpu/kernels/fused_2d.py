"""Fused D2Q9 collide-and-stream Pallas kernel (the 2D geometry pipeline's
MLUPS path), including the Bouzidi curved-wall interpolation.

The reference runs its 2D apps through the same fused CUDA kernel as 3D
(kernels.h:60-100) with the D2Q9 BC switch (d2q9/bc.h:6-214, Bouzidi
two-branch interpolation :61-87,140-167).  On TPU the 2D lattices are small
enough that the WHOLE field fits in VMEM (9 * X * Y * 4 B = 9.4 MB even at
8x the production resolution), so this kernel uses a single grid program
with plain VMEM BlockSpecs - the streaming shifts, BC mask-selects,
Bouzidi interpolation and the full CLBM cascade all happen in registers
with one HBM read and one write per array.  No halo pad pass exists at all:
shifts wrap/clamp in-kernel (matching ops/streaming.pad_halo semantics).

Supported codes: FLUID, WALL, NOTHING, INFLOW (per-site velocity profile),
OUTFLOW_EQ, OUTFLOW_RIGHT, FLUID_NEAR_WALL (Bouzidi; needs domain.bouzidi
thetas).  Semantics match sim/step.py exactly (regression-tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tnl_lbm_tpu.ops import boundary as bc
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim.config import Domain, LBMConfig

#: GEO codes the 2D fused kernel can handle
SUPPORTED_CODES_2D = {
    GEO.FLUID, GEO.WALL, GEO.NOTHING, GEO.INFLOW,
    GEO.OUTFLOW_EQ, GEO.OUTFLOW_RIGHT, GEO.FLUID_NEAR_WALL,
}

#: VMEM budget for the single-program design (input + output + operands)
_VMEM_BUDGET_BYTES = 100 * 1024 * 1024


def supports_2d(cfg: LBMConfig, domain: Domain, shape=None) -> bool:
    """``shape`` overrides the VMEM-fit extent check - pass the PER-SHARD
    shape for a sharded run (the distributed kernel holds one shard in
    VMEM, not the whole domain)."""
    from tnl_lbm_tpu.ops import equilibrium as eqlib

    if cfg.lat.D != 2 or cfg.streaming != "AB" or cfg.well:
        return False
    if cfg.eq is not eqlib.eq_quadratic:
        return False
    if not domain.codes_present() <= SUPPORTED_CODES_2D:
        return False
    X, Y = shape if shape is not None else domain.shape
    # f in/out (2x9), map, bouzidi (8), u_in (2), rho+u (3), slack 2x
    est = (2 * 9 + 1 + 8 + 2 + 3) * X * Y * 4 * 2
    return est <= _VMEM_BUDGET_BYTES


def _shift_axis(a, o, axis, n, periodic):
    """out(i) = a(i + o) along ``axis`` with wrap (periodic) or clamp."""
    if o == 0:
        return a
    idx = [slice(None)] * a.ndim

    def sl(s, e):
        idx2 = list(idx)
        idx2[axis] = slice(s, e)
        return a[tuple(idx2)]

    if o == -1:  # out(i) = a(i - 1)
        bndry = sl(n - 1, n) if periodic else sl(0, 1)
        return jnp.concatenate([bndry, sl(0, n - 1)], axis=axis)
    bndry = sl(0, 1) if periodic else sl(n - 1, n)
    return jnp.concatenate([sl(1, n), bndry], axis=axis)


def make_fused_step_2d(cfg: LBMConfig, domain: Domain,
                       force_field: bool = False,
                       local_shape=None):
    """D2Q9 fused step: ``step(f, nu, u_in, force) -> (f_new, rho, u)``.

    ``u_in`` may be None, a [2] vector or a broadcastable [2, ...] profile
    field (sim2d_2's parabolic inflow).  ``force`` is a [2] vector, or -
    with ``force_field=True`` - a per-site [2, X, Y] field (the carrier
    for 2D forcing hooks, kernels/hooked.py; analog of the reference's
    macro force channels, kernels.h:92).

    ``local_shape`` (the sharded path): the kernel operates on
    ``local_shape``-sized arrays (a shard's block + 1-halo ring supplied
    by the caller's exchange), with CLAMP boundary semantics - the
    outermost ring's outputs are junk and the caller crops them.  BC
    codes come from the GLOBAL map; the per-shard map/bouzidi/u_in
    arrive at runtime (``map_arr_in``/``bouzidi_arr``/profile ``u_in``).
    """
    lat = cfg.lat
    assert lat.D == 2 and cfg.streaming == "AB"
    Q = lat.Q
    prepadded = local_shape is not None
    X, Y = local_shape if prepadded else domain.shape
    dtype = cfg.compute_dtype
    if prepadded:
        # halos carry the true neighbor/wrap/edge data; in-kernel clamp
        # only shapes the junk ring outputs
        per_x, per_y = False, False
    else:
        per_x, per_y = bool(domain.periodic[0]), bool(domain.periodic[1])
    codes = domain.codes_present()
    if not codes <= SUPPORTED_CODES_2D:
        raise NotImplementedError(
            f"unsupported GEO codes for the 2D kernel: {codes - SUPPORTED_CODES_2D}")
    opp = np.asarray(lat.opp)
    do_coll_codes = [int(c) for c in (bc.collision_mask_codes(2) & codes)]
    has_bouzidi = GEO.FLUID_NEAR_WALL in codes and domain.bouzidi is not None
    interpret = jax.default_backend() == "cpu"
    # whether the current step() call passed a force; set before the kernel
    # traces (tracing happens synchronously inside the pallas_call), so the
    # collision sees force=None exactly when the XLA path would
    _has_force = [False]

    def _shift2(a, ox, oy):
        return _shift_axis(_shift_axis(a, ox, 0, X, per_x), oy, 1, Y, per_y)

    def _eq2(rho, u):
        """Quadratic D2Q9 equilibrium with Python-scalar weights."""
        uu = u[0] * u[0] + u[1] * u[1]
        rows = []
        for q in range(Q):
            cx, cy = (int(v) for v in lat.c[q])
            cu = cx * u[0] + cy * u[1]
            rows.append(float(lat.w[q]) * rho * (1 + 3 * cu + 4.5 * cu * cu - 1.5 * uu))
        return jnp.stack(rows)

    def kernel(params_ref, map_ref, uin_ref, *args):
        if force_field:
            fr_ref, *args = args
        else:
            fr_ref = None
        if has_bouzidi:
            bz_ref, f_ref, fout_ref, rho_ref, u_ref = args
        else:
            f_ref, fout_ref, rho_ref, u_ref = args
            bz_ref = None
        nu = params_ref[0]
        force = (fr_ref[...] if force_field
                 else [params_ref[4], params_ref[5]])
        m = map_ref[...]
        masks = {c: (m == int(c)) for c in codes}
        f = [f_ref[q] for q in range(Q)]

        # ---- pull streaming (f_in[q](x) = f[q](x - c_q)) ----
        rows = []
        for q in range(Q):
            cx, cy = (int(v) for v in lat.c[q])
            rows.append(_shift2(f[q], -cx, -cy))
        f_in = jnp.stack(rows)

        if GEO.OUTFLOW_RIGHT in codes:
            # pull every direction from x-1 (reference bc.h:64-65)
            rows_or = []
            for q in range(Q):
                cx, cy = (int(v) for v in lat.c[q])
                rows_or.append(_shift2(f[q], -1, -cy))
            f_in = jnp.where(masks[GEO.OUTFLOW_RIGHT], jnp.stack(rows_or), f_in)

        if has_bouzidi:
            # Bouzidi two-branch curved-wall interpolation
            # (reference d2q9/bc.h:61-87,140-167; sim/step.py _bouzidi)
            rows_b = [f[0]]
            for q in range(1, Q):
                qo = int(opp[q])
                cx, cy = (int(v) for v in lat.c[q])
                th = bz_ref[q - 1]
                fA = f[qo]
                fOppA = f[q]
                fB = _shift2(f[qo], cx, cy)  # neighbor one link off the wall
                small = 2 * th * fA + (1 - 2 * th) * fB
                w = 0.5 / jnp.maximum(th, 0.25)
                large = (1 - w) * fOppA + w * fA
                interp = jnp.where(th <= 0.5, small, large)
                rows_b.append(jnp.where(th < 0, f_in[q], interp))
            f_in = jnp.where(masks[GEO.FLUID_NEAR_WALL], jnp.stack(rows_b), f_in)

        if GEO.WALL in codes:
            f_swapped = jnp.stack([f_in[int(opp[q])] for q in range(Q)])
            f_in = jnp.where(masks[GEO.WALL], f_swapped, f_in)

        # ---- moments ----
        rho = f_in[0]
        for q in range(1, Q):
            rho = rho + f_in[q]
        j = []
        for a in range(2):
            acc = None
            for q in range(Q):
                c = int(lat.c[q][a])
                if c == 0:
                    continue
                term = f_in[q] if c > 0 else -f_in[q]
                acc = term if acc is None else acc + term
            j.append(acc)
        u = jnp.stack([(j[a] + 0.5 * force[a]) / rho for a in range(2)])

        one = jnp.ones((), dtype)
        if GEO.INFLOW in codes:
            mm = masks[GEO.INFLOW]
            u_in_f = uin_ref[...]
            f_in = jnp.where(mm, _eq2(one, u_in_f).astype(dtype), f_in)
            rho = jnp.where(mm, one, rho)
            u = jnp.where(mm, u_in_f, u)
        if GEO.OUTFLOW_EQ in codes:
            mm = masks[GEO.OUTFLOW_EQ]
            f_in = jnp.where(mm, _eq2(one, u), f_in)
            rho = jnp.where(mm, one, rho)
        if GEO.OUTFLOW_RIGHT in codes:
            rho = jnp.where(masks[GEO.OUTFLOW_RIGHT], one, rho)

        # ---- collision (masked select) ----
        rho_safe = jnp.where(rho == 0, one, rho)
        if force_field:
            force_col = force
        else:
            force_col = (jnp.stack(force).reshape(2, 1, 1) if _has_force[0] else None)
        f_post = cfg.collision(lat, f_in, rho_safe, u, nu, force=force_col)
        do_coll = jnp.zeros_like(m, dtype=jnp.bool_)
        for code in do_coll_codes:
            do_coll = do_coll | (m == code)
        f_post = jnp.where(do_coll, f_post, f_in)

        if GEO.NOTHING in codes:
            f_post = jnp.where(masks[GEO.NOTHING], jnp.stack(f), f_post)

        rho_out, u_out = rho, u
        zero_u = jnp.zeros_like(u)
        for c in (GEO.WALL, GEO.NOTHING):
            if c in codes:
                rho_out = jnp.where(masks[c], one, rho_out)
                u_out = jnp.where(masks[c], zero_u, u_out)

        fout_ref[...] = f_post
        rho_ref[...] = rho_out
        u_ref[...] = u_out

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem, vmem]
        + ([vmem] if force_field else [])
        + ([vmem] if has_bouzidi else [])
        + [vmem],  # f
        out_specs=(vmem, vmem, vmem),
        out_shape=(
            jax.ShapeDtypeStruct((Q, X, Y), dtype),
            jax.ShapeDtypeStruct((X, Y), dtype),
            jax.ShapeDtypeStruct((2, X, Y), dtype),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET_BYTES),
    )

    map_arr = None if prepadded else np.asarray(domain.map, np.int32)
    bz_arr = (np.asarray(domain.bouzidi, np.float32)
              if has_bouzidi and not prepadded else None)
    # Geometry arrays are RUNTIME operands of the pallas_call; exposing
    # them as sharded_consts lets the driver thread them through jit as
    # arguments instead of closed-over constants.  Closed over, each
    # geometry bakes a distinct HLO (the map becomes a constant) and a
    # 108-row golden sweep pays one full XLA compile per row; as
    # arguments one compiled program serves every geometry with the same
    # GEO-code set (and the persistent compilation cache hits across
    # processes).  Direct step() calls without the kwargs still use the
    # closure values.

    def step(f, nu, u_in=None, force=None, parity: int = 0,
             map_arr_in=None, bouzidi_arr=None):
        del parity  # AB only
        mp = map_arr if map_arr_in is None else map_arr_in
        _has_force[0] = force is not None
        z2 = jnp.zeros((2,), dtype)
        fv = (z2 if force is None or force_field
              else jnp.asarray(force, dtype).reshape(2))
        params = jnp.concatenate([
            jnp.asarray([nu], dtype), jnp.zeros((3,), dtype), fv,
            jnp.zeros((2,), dtype)])
        if u_in is None:
            uin = jnp.zeros((2, X, Y), dtype)
        else:
            uin = jnp.asarray(u_in, dtype)
            if uin.ndim == 1:  # [2] vector: broadcast over the lattice
                uin = uin.reshape(2, 1, 1)
            uin = jnp.broadcast_to(uin, (2, X, Y)).astype(dtype)
        bz = bz_arr if bouzidi_arr is None else bouzidi_arr
        ops = [params, mp, uin]
        if force_field:
            assert force is not None and force.ndim == 3, \
                "force_field kernel expects a [2, X, Y] force"
            ops.append(force.astype(dtype))
        if has_bouzidi:
            ops.append(jnp.asarray(bz, dtype))
        f_new, rho, u = call(*ops, f)
        return f_new, rho, u

    if not prepadded:
        consts = {"map_arr_in": jnp.asarray(map_arr)}
        if bz_arr is not None:
            consts["bouzidi_arr"] = jnp.asarray(bz_arr)
        step.sharded_consts = consts
    return step
