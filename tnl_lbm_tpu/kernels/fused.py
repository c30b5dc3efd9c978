"""Fused collide-and-stream Pallas TPU kernel (the MLUPS path).

The XLA reference path (sim/step.py) materializes the padded array, the 27
pulled components and dozens of cumulant-cascade intermediates in HBM -
measured ~25 memory passes per step.  This kernel is the speed-of-light
design (SURVEY.md section 7 M4): the lattice is tiled over (X, Y); each grid
program DMAs one (tx+2, ty+2, Z+2)-halo tile of every DF component into
VMEM, performs pull streaming as in-VMEM shifted slices, applies the
mask-select BCs, runs the full collision cascade in vector registers, and
writes the post-collision tile once.  HBM traffic per step ~= one read + one
write of the DF array (plus the thin halo overlap and macro outputs), which
is what the reference's single fused CUDA kernel achieves
(reference kernels.h:60-100).

Supported here: A-B pull streaming with the same BC set as the XLA path
except OUTFLOW_RIGHT_INTERP and Bouzidi (those domains fall back to
sim/step.py).  Collision/equilibrium plugins are the *same pure functions*
from ops/ - they trace into the kernel body and Mosaic keeps the cascade
on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tnl_lbm_tpu.ops import boundary as bc
from tnl_lbm_tpu.ops import moments as mom
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim.config import Domain, LBMConfig

#: GEO codes the fused kernel can handle
SUPPORTED_CODES = {
    GEO.FLUID, GEO.WALL, GEO.INFLOW, GEO.OUTFLOW_EQ, GEO.OUTFLOW_RIGHT,
    GEO.PERIODIC, GEO.NOTHING,
    GEO.SYM_TOP, GEO.SYM_BOTTOM, GEO.SYM_LEFT, GEO.SYM_RIGHT,
    GEO.SYM_BACK, GEO.SYM_FRONT, GEO.INFLOW_LEFT,
}


def supports(domain: Domain) -> bool:
    return domain.codes_present() <= SUPPORTED_CODES


def _moments_local(lat, f_in, force, well):
    """density_velocity without array constants (Pallas kernels may not
    capture traced constants): Python loops with scalar +-1 coefficients."""
    rho = f_in[0]
    for q in range(1, lat.Q):
        rho = rho + f_in[q]
    if well:
        rho = rho + 1
    j = []
    for a in range(3):
        acc = None
        for q in range(lat.Q):
            c = int(lat.c[q][a])
            if c == 0:
                continue
            term = f_in[q] if c > 0 else -f_in[q]
            acc = term if acc is None else acc + term
        j.append(acc)
    u = jnp.stack([(j[a] + 0.5 * force[a]) / rho for a in range(3)])
    return rho, u


def _eq_local(lat, rho, u, kind):
    """Equilibria with Python-scalar weights (no array constants).

    kind: "quad" | "well" | "invcum" (ops/equilibrium.py counterparts).
    """
    if kind == "invcum":
        factors = []
        for a in range(3):
            v = u[a]
            factors.append({
                0: (2 - 3 * v * v) / 3,
                1: (3 * v * v + 3 * v + 1) / 6,
                -1: (3 * v * v - 3 * v + 1) / 6,
            })
        rows = []
        for q in range(lat.Q):
            term = rho
            for a in range(3):
                term = term * factors[a][int(lat.c[q, a])]
            rows.append(term)
        return jnp.stack(rows)
    uu = u[0] * u[0] + u[1] * u[1] + u[2] * u[2]
    rows = []
    for q in range(lat.Q):
        cx, cy, cz = (int(v) for v in lat.c[q])
        cu = cx * u[0] + cy * u[1] + cz * u[2]
        w = float(lat.w[q])
        feq = rho * (1 + 3 * cu + 4.5 * cu * cu - 1.5 * uu)
        rows.append(w * (feq - 1) if kind == "well" else w * feq)
    return jnp.stack(rows)


def _eq_kind(cfg) -> str:
    from tnl_lbm_tpu.ops import equilibrium as eqlib

    if cfg.eq is eqlib.eq_inv_cum:
        return "invcum"
    if cfg.eq is eqlib.eq_well or cfg.well:
        return "well"
    return "quad"


def _pad_once(f, periodic, extra_y: int = 0):
    """One-pass halo pad: edge-replicate everywhere, then overwrite the
    halo layers of periodic axes with the wrapped values (thin copies).

    ``extra_y`` appends unused replicate rows on the Y axis so the kernel's
    HBM DMA windows stay sublane-aligned (Mosaic requires 8-aligned slices
    on the second-minor dim).  The Z (lane) axis is NOT padded - the kernel
    tiles span the full Z extent and realize z-shifts in VMEM with a
    wrap/clamp boundary plane, keeping every DMA 128-lane aligned."""
    pads = [(0, 0), (1, 1), (1, 1 + extra_y), (0, 0)]
    fpad = jnp.pad(f, pads, mode="edge")
    for a, per in enumerate(periodic[:2]):
        if not per:
            continue
        axis = a + 1
        n = f.shape[axis]  # interior extent; halo layers sit at 0 and n+1
        lo = [slice(None)] * f.ndim
        hi = [slice(None)] * f.ndim
        src_hi = [slice(None)] * f.ndim
        src_lo = [slice(None)] * f.ndim
        lo[axis] = slice(0, 1)
        src_hi[axis] = slice(n, n + 1)
        hi[axis] = slice(n + 1, n + 2)
        src_lo[axis] = slice(1, 2)
        fpad = fpad.at[tuple(lo)].set(fpad[tuple(src_hi)])
        fpad = fpad.at[tuple(hi)].set(fpad[tuple(src_lo)])
    return fpad


def make_fused_step(cfg: LBMConfig, domain: Domain, tile=None):
    """Build the fused A-B step: step(f, nu, u_in, force) -> (f_new, rho, u).

    ``u_in``/``force`` are [D] vectors (always passed; zero when unused).
    """
    if cfg.streaming != "AB":
        raise NotImplementedError("fused kernel currently implements the A-B pattern")
    lat = cfg.lat
    assert lat.D == 3, "fused kernel is for the 3D lattices"
    Q = lat.Q
    X, Y, Z = domain.shape
    dtype = cfg.compute_dtype
    codes = domain.codes_present()
    if not codes <= SUPPORTED_CODES:
        raise NotImplementedError(f"unsupported GEO codes {codes - SUPPORTED_CODES}")
    opp = np.asarray(lat.opp)

    if tile is None:
        # VMEM budget heuristic: scratch = Q*(tx+2)*(ty+2)*(Z+2)*4 bytes
        ty = 8
        tx = 8 if Z <= 192 else 4
        tile = (tx, ty)
    tx, ty = tile
    assert X % tx == 0 and Y % ty == 0, (X, Y, tile)
    assert ty % 8 == 0, "ty must be sublane-aligned (multiple of 8)"

    sym_codes = [c for c in codes if c in bc.sym_table(3)]
    eq_kind = _eq_kind(cfg)
    do_coll_codes = np.array(
        [int(c) for c in (bc.collision_mask_codes(3) & codes)], dtype=np.int32
    )

    def kernel(params_ref, map_ref, fpad_hbm, fout_ref, rho_ref, u_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        # DMA the haloed tile: fpad[:, i*tx : i*tx+tx+2, j*ty : ..., :]
        dma = pltpu.make_async_copy(
            fpad_hbm.at[:, pl.ds(i * tx, tx + 2), pl.ds(j * ty, ty + 8), :],
            scratch,
            sem,
        )
        dma.start()
        dma.wait()

        nu = params_ref[0]
        # scalar params stay Python lists of traced scalars - Mosaic does not
        # support tiny vector reshapes like (3,) -> (3,1,1,1)
        u_in = [params_ref[1], params_ref[2], params_ref[3]]
        force = [params_ref[4], params_ref[5], params_ref[6]]

        m = map_ref[...]
        masks = {c: (m == int(c)) for c in codes}

        # pull streaming: f_in[q](x) = f[q](x - c_q), all in VMEM.
        # x/y shifts read the DMA'd halo; z shifts wrap/clamp in-register
        # (tiles span the full Z extent).
        periodic_z = bool(domain.periodic[2])

        def shifted(q, offs):
            ox, oy, oz = offs
            base = scratch[q, 1 + ox : 1 + ox + tx, 1 + oy : 1 + oy + ty, :]
            if oz == 0:
                return base
            if oz == -1:  # out[z] = base[z - 1]
                bndry = base[..., Z - 1 : Z] if periodic_z else base[..., 0:1]
                return jnp.concatenate([bndry, base[..., : Z - 1]], axis=-1)
            # oz == +1: out[z] = base[z + 1]
            bndry = base[..., 0:1] if periodic_z else base[..., Z - 1 : Z]
            return jnp.concatenate([base[..., 1:], bndry], axis=-1)

        rows = []
        for q in range(Q):
            cx, cy, cz = (int(v) for v in lat.c[q])
            rows.append(shifted(q, (-cx, -cy, -cz)))
        f_in = jnp.stack(rows)

        if GEO.OUTFLOW_RIGHT in codes:
            rows_or = []
            for q in range(Q):
                cx, cy, cz = (int(v) for v in lat.c[q])
                rows_or.append(shifted(q, (-1, -cy, -cz)))
            f_in = jnp.where(masks[GEO.OUTFLOW_RIGHT], jnp.stack(rows_or), f_in)

        if GEO.WALL in codes:
            f_swapped = jnp.stack([f_in[int(opp[q])] for q in range(Q)])
            f_in = jnp.where(masks[GEO.WALL], f_swapped, f_in)
        for c in sym_codes:
            axis, sign = bc.sym_table(3)[c]
            mirror = np.asarray(lat.mirror(axis))
            rows_m = []
            for q in range(Q):
                if int(lat.c[q][axis]) == sign:
                    rows_m.append(jnp.where(masks[c], f_in[int(mirror[q])], f_in[q]))
                else:
                    rows_m.append(f_in[q])
            f_in = jnp.stack(rows_m)

        rho, u = _moments_local(lat, f_in, force, cfg.well)

        one = jnp.ones((), dtype)
        if GEO.INFLOW_LEFT in codes or GEO.INFLOW in codes:
            u_in_field = jnp.stack([jnp.zeros_like(rho) + u_in[a] for a in range(3)])
        if GEO.INFLOW_LEFT in codes:
            if cfg.well:
                f_tot = jnp.stack([f_in[q] + float(lat.w[q]) for q in range(Q)])
            else:
                f_tot = f_in
            f_il, rho_il = bc.inflow_left_moment_bc(lat, f_tot, u_in)
            if cfg.well:
                f_il = jnp.stack([f_il[q] - float(lat.w[q]) for q in range(Q)])
            mm = masks[GEO.INFLOW_LEFT]
            f_in = jnp.where(mm, f_il, f_in)
            rho = jnp.where(mm, rho_il, rho)
            u = jnp.where(mm, u_in_field, u)
        if GEO.INFLOW in codes:
            mm = masks[GEO.INFLOW]
            feq_in = _eq_local(lat, one, u_in_field, eq_kind).astype(dtype)
            f_in = jnp.where(mm, feq_in, f_in)
            rho = jnp.where(mm, one, rho)
            u = jnp.where(mm, u_in_field, u)
        if GEO.OUTFLOW_EQ in codes:
            mm = masks[GEO.OUTFLOW_EQ]
            f_in = jnp.where(mm, _eq_local(lat, rho * 0 + one, u, eq_kind), f_in)
            rho = jnp.where(mm, one, rho)
        if GEO.OUTFLOW_RIGHT in codes:
            rho = jnp.where(masks[GEO.OUTFLOW_RIGHT], one, rho)

        rho_safe = jnp.where(rho == 0, one, rho)
        f_post = cfg.collision(lat, f_in, rho_safe, u, nu, force=force)
        do_coll = jnp.zeros_like(m, dtype=jnp.bool_)
        for code in do_coll_codes.tolist():
            do_coll = do_coll | (m == code)
        f_post = jnp.where(do_coll, f_post, f_in)

        if GEO.NOTHING in codes:
            center = jnp.stack([shifted(q, (0, 0, 0)) for q in range(Q)])
            f_post = jnp.where(masks[GEO.NOTHING], center, f_post)

        rho_out, u_out = rho, u
        zero_u = jnp.zeros_like(u)
        for c in (GEO.WALL, GEO.NOTHING):
            if c in codes:
                rho_out = jnp.where(masks[c], one, rho_out)
                u_out = jnp.where(masks[c], zero_u, u_out)

        fout_ref[...] = f_post
        rho_ref[...] = rho_out
        u_ref[...] = u_out

    grid = (X // tx, Y // ty)
    interpret = jax.default_backend() == "cpu"
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params [8]
            pl.BlockSpec((tx, ty, Z), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # fpad stays in HBM
        ],
        out_specs=(
            pl.BlockSpec((Q, tx, ty, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tx, ty, Z), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tx, ty, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
            jax.ShapeDtypeStruct((3, X, Y, Z), dtype),
        ),
        scratch_shapes=[
            # ty + 8: sublane-aligned DMA window (only rows 0..ty+1 are used)
            pltpu.VMEM((Q, tx + 2, ty + 8, Z), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )

    map_arr = np.asarray(domain.map, np.int32)

    def step(f, nu, u_in=None, force=None, parity: int = 0, map_arr_in=None):
        del parity
        mp = map_arr if map_arr_in is None else map_arr_in
        fpad = _pad_once(f, domain.periodic, extra_y=6)
        z = jnp.zeros((3,), dtype)
        u_in_v = z if u_in is None else jnp.asarray(u_in, dtype).reshape(3)
        force_v = z if force is None else jnp.asarray(force, dtype).reshape(3)
        params = jnp.concatenate([
            jnp.asarray([nu], dtype), u_in_v, force_v,
            jnp.asarray([0.0 if force is None else 1.0], dtype),
        ])
        return call(params, mp, fpad)

    return step
