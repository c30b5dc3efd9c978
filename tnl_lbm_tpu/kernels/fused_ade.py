"""Fused D3Q7 advection-diffusion Pallas kernel.

The ADE half of the reference's coupled kernel (reference kernels.h:154-176
with d3q7/bc.h) as a single Pallas pass: pull-streaming from a haloed
window, mask-select BCs (walls, anti-bounce-back body walls, inflow,
Peclet-extrapolation outflow, symmetry, conjugate TRANSFER_FS/SF/SW, inert
ghosts) and the moment-space collision in registers.  The advecting
velocity ``u`` arrives as a blocked input (the NSE step's macro output -
zero extra passes in coupled runs).

Full parity with the XLA path (sim/step_ade.py):

- **variable per-site diffusion** (reference ADE_Data diffusion-coefficient
  pointer, lbm_data.h:133-165): ``nu`` may be a [X, Y, Z] field, DMA'd
  tile-by-tile next to the velocity;
- **conjugate transfer BCs** (reference d3q7/bc.h:142-189): the
  per-direction interface flags are packed at build time into one static
  int32 bit-field [X, Y, Z] (bit q-1 = link q crosses the phase boundary) -
  one extra blocked operand instead of six boolean fields; the
  pre-streaming neighbor phi comes from the g window already in VMEM.

A-B pull streaming.  Collisions: the moment-space D3Q7 operators
(MRT / CLBM / CLBM-RS, ops/collision_ade.py) contain no array constants and
run in-kernel as-is; SRT uses a local scalar-coefficient equilibrium.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tnl_lbm_tpu.kernels.fused import _zshift
from tnl_lbm_tpu.ops import collision_ade as cade
from tnl_lbm_tpu.sim.config import Domain, LBMConfig
from tnl_lbm_tpu.sim.step_ade import (
    _COLLIDING,
    _SYM,
    ADEGEO,
    transfer_direction_flags,
)

#: ADEGEO codes the fused ADE kernel can handle
SUPPORTED_ADE_CODES = {
    ADEGEO.FLUID, ADEGEO.WALL, ADEGEO.WALL_BODY, ADEGEO.SOLID,
    ADEGEO.INFLOW, ADEGEO.OUTFLOW_RIGHT, ADEGEO.OUTFLOW_PE,
    ADEGEO.PERIODIC, ADEGEO.NOTHING,
    ADEGEO.TRANSFER_FS, ADEGEO.TRANSFER_SF, ADEGEO.TRANSFER_SW,
    ADEGEO.SYM_TOP, ADEGEO.SYM_BOTTOM, ADEGEO.SYM_LEFT, ADEGEO.SYM_RIGHT,
    ADEGEO.SYM_BACK, ADEGEO.SYM_FRONT,
}


def supports_ade(domain: Domain) -> bool:
    codes = {ADEGEO(int(c)) for c in np.unique(domain.map)}
    return codes <= SUPPORTED_ADE_CODES


def _eq_local_ade(lat, phi, u):
    """Generic second-order equilibrium with Python-scalar coefficients
    (eq_quadratic for ics2 = 4, ops/equilibrium.py:36-44)."""
    ics2 = float(lat.i_cs2)
    uu = u[0] * u[0] + u[1] * u[1] + u[2] * u[2]
    rows = []
    for q in range(lat.Q):
        cx, cy, cz = (int(v) for v in lat.c[q])
        cu = cx * u[0] + cy * u[1] + cz * u[2]
        w = float(lat.w[q])
        rows.append(w * phi * (1 + ics2 * cu + 0.5 * ics2 * ics2 * cu * cu
                               - 0.5 * ics2 * uu))
    return jnp.stack(rows)


def pack_transfer_flags(lat, map_arr):
    """Pack the Q-1 per-direction conjugate-transfer interface flags into
    one int32 bit-field per site (bit q-1 = direction q crosses the
    interface) - the layout the fused kernel and the sharded wrapper
    share."""
    flags = transfer_direction_flags(lat, map_arr)  # [Q-1, *shape]
    packed = np.zeros(np.asarray(map_arr).shape, np.int32)
    for q in range(1, lat.Q):
        packed |= flags[q - 1].astype(np.int32) << (q - 1)
    return packed


def _pad_ade(g, periodic):
    """Halo pad for the ADE kernel: x 2-wide (origin 2 - the OUTFLOW_PE
    pull reads x-2), y 1-wide + alignment rows (origin 1)."""
    X, Y = g.shape[1], g.shape[2]
    gpad = jnp.pad(g, [(0, 0), (2, 2), (1, 7), (0, 0)], mode="edge")
    if periodic[0]:
        gpad = gpad.at[:, 0:2].set(gpad[:, X : X + 2])
        gpad = gpad.at[:, X + 2 : X + 4].set(gpad[:, 2:4])
    if periodic[1]:
        gpad = gpad.at[:, :, 0:1].set(gpad[:, :, Y : Y + 1])
        gpad = gpad.at[:, :, Y + 1 : Y + 2].set(gpad[:, :, 1:2])
    return gpad


def _ade_tile_body(lat, codes, sym_codes, do_coll_codes, collide,
                   use_local_eq, shifted, m, u, nu, phi_in, tf, tcoef, Q,
                   out_perm=None, defer_nothing=False):
    """Stream + BC + collide for one ADE tile; shared by the standalone ADE
    kernel and the coupled NSE+ADE kernels (kernels/fused_coupled.py).

    ``shifted(q, (ox, oy, oz))`` reads the g window; ``tf`` is the packed
    transfer-flag tile (or None).  ``out_perm`` permutes the output
    components before the NOTHING restore (A-A even step writes
    opposite-direction, d3q7/streaming_AA.h); ``defer_nothing=True`` skips
    the NOTHING restore for the A-A odd kernel (applied at the destination
    site after the push).  Returns (f_post, phi).
    """
    opp = np.asarray(lat.opp)
    masks = {c: (m == int(c)) for c in codes}

    rows = []
    for q in range(Q):
        cx, cy, cz = (int(v) for v in lat.c[q])
        rows.append(shifted(q, (-cx, -cy, -cz)))
    f_in = jnp.stack(rows)

    if ADEGEO.OUTFLOW_RIGHT in codes:
        rows_or = []
        for q in range(Q):
            cx, cy, cz = (int(v) for v in lat.c[q])
            rows_or.append(shifted(q, (-1, -cy, -cz)))
        f_in = jnp.where(masks[ADEGEO.OUTFLOW_RIGHT], jnp.stack(rows_or), f_in)
    if ADEGEO.OUTFLOW_PE in codes:
        rows_pe = []
        for q in range(Q):
            cx, cy, cz = (int(v) for v in lat.c[q])
            rows_pe.append(shifted(q, (-cx - 1, -cy, -cz)))
        f_in = jnp.where(masks[ADEGEO.OUTFLOW_PE], jnp.stack(rows_pe), f_in)

    center = jnp.stack([shifted(q, (0, 0, 0)) for q in range(Q)])
    for wall_code in (ADEGEO.WALL, ADEGEO.WALL_BODY):
        if wall_code in codes:
            swapped = jnp.stack([f_in[int(opp[q])] for q in range(Q)])
            f_in = jnp.where(masks[wall_code], swapped, f_in)
    if ADEGEO.WALL_BODY in codes:
        phi_prev = center[0]
        for q in range(1, Q):
            phi_prev = phi_prev + center[q]
        rows_abb = [-f_in[q] + 2 * float(lat.w[q]) * phi_prev for q in range(Q)]
        f_in = jnp.where(masks[ADEGEO.WALL_BODY], jnp.stack(rows_abb), f_in)

    for c in sym_codes:
        axis, sign = _SYM[c]
        mirror = np.asarray(lat.mirror(axis))
        rows_m = []
        for q in range(Q):
            if int(lat.c[q][axis]) == sign:
                rows_m.append(jnp.where(masks[c], f_in[int(mirror[q])], f_in[q]))
            else:
                rows_m.append(f_in[q])
        f_in = jnp.stack(rows_m)

    if tf is not None:
        # conjugate transfer (reference d3q7/bc.h:142-189); the
        # pre-streaming phi at center and x -+ c_q comes from the g window
        def phi_at(offs):
            acc = shifted(0, offs)
            for q in range(1, Q):
                acc = acc + shifted(q, offs)
            return acc

        phi_tot = phi_at((0, 0, 0))
        rows_t = [f_in[0]]
        for q in range(1, Q):
            qo = int(opp[q])
            flag = ((tf >> (qo - 1)) & 1) > 0
            cx, cy, cz = (int(v) for v in lat.c[q])
            nb_phi = phi_at((-cx, -cy, -cz))
            reflected = center[qo]
            fs_sf = reflected + tcoef * (nb_phi - phi_tot)
            row = f_in[q]
            for code, repl in (
                (ADEGEO.TRANSFER_FS, fs_sf),
                (ADEGEO.TRANSFER_SF, fs_sf),
                (ADEGEO.TRANSFER_SW, reflected),
            ):
                if code in codes:
                    row = jnp.where(masks[code] & flag, repl, row)
            rows_t.append(row)
        f_in = jnp.stack(rows_t)

    phi = f_in[0]
    for q in range(1, Q):
        phi = phi + f_in[q]

    if ADEGEO.INFLOW in codes:
        mm = masks[ADEGEO.INFLOW]
        phi_b = jnp.zeros_like(phi) + phi_in
        f_in = jnp.where(mm, _eq_local_ade(lat, phi_b, u), f_in)
        phi = jnp.where(mm, phi_b, phi)
    if ADEGEO.OUTFLOW_PE in codes:
        mm = masks[ADEGEO.OUTFLOW_PE]
        f_in = jnp.where(mm, _eq_local_ade(lat, phi, u), f_in)

    if use_local_eq:
        omega = 1.0 / (0.5 + float(lat.i_cs2) * nu)
        f_post = f_in + omega * (_eq_local_ade(lat, phi, u) - f_in)
    else:
        f_post = collide(lat, f_in, phi, u, nu)
    do_coll = jnp.zeros_like(m, dtype=jnp.bool_)
    for code in do_coll_codes:
        do_coll = do_coll | (m == code)
    f_post = jnp.where(do_coll, f_post, f_in)

    if out_perm is not None:
        f_post = jnp.stack([f_post[int(out_perm[q])] for q in range(Q)])
    if ADEGEO.NOTHING in codes and not defer_nothing:
        mm = masks[ADEGEO.NOTHING]
        f_post = jnp.where(mm, center, f_post)
    if ADEGEO.NOTHING in codes:
        phi = jnp.where(masks[ADEGEO.NOTHING], jnp.zeros_like(phi), phi)
    return f_post, phi


def make_fused_ade_step(cfg: LBMConfig, domain: Domain, tile=(8, 16),
                        tiles_per_program: int = 4,
                        variable_diffusion: bool = False,
                        transfer_coeff: float = 0.0,
                        prepadded: bool = False,
                        local_shape=None):
    """Build ``step(g, u, nu, phi_in=0.0) -> (g_new, phi)``.

    ``u`` is the advecting velocity field [3, X, Y, Z]; ``nu`` the lattice
    diffusion coefficient (scalar, or a [X, Y, Z] field with
    ``variable_diffusion=True``); ``phi_in`` a scalar inflow concentration.
    ``transfer_coeff`` is the conjugate-transfer coefficient (build-time
    static; used when the map contains TRANSFER_* codes).

    ``prepadded=True`` (the sharded path): ``step`` takes the haloed
    ``g`` directly ([Q, X+4, Y+8, Z], x-origin 2 / y-origin 1 like
    ``_pad_ade``) plus runtime ``map_arr_in`` / ``tflags_in`` local
    shards; BC codes and kernel structure come from the GLOBAL map (a
    superset of every shard's codes), ``local_shape`` gives the per-shard
    extents."""
    from tnl_lbm_tpu.kernels.fused_aa import _fit_tile

    lat = cfg.lat
    assert lat.D == 3 and lat.Q == 7, "fused ADE kernel is for D3Q7"
    if cfg.streaming != "AB":
        raise NotImplementedError("fused ADE kernel implements the A-B pattern")
    codes = {ADEGEO(int(c)) for c in np.unique(domain.map)}
    if not codes <= SUPPORTED_ADE_CODES:
        raise NotImplementedError(f"unsupported ADE codes {codes - SUPPORTED_ADE_CODES}")
    X, Y, Z = local_shape if local_shape is not None else domain.shape
    Q = lat.Q
    dtype = cfg.compute_dtype
    periodic = domain.periodic
    periodic_z = bool(periodic[2])
    opp = np.asarray(lat.opp)
    interpret = jax.default_backend() == "cpu"
    map_arr = None if prepadded else np.asarray(domain.map, np.int32)

    needs_transfer = bool(
        codes & {ADEGEO.TRANSFER_FS, ADEGEO.TRANSFER_SF, ADEGEO.TRANSFER_SW})
    if needs_transfer:
        tcoef = float(transfer_coeff)
        if not prepadded:
            tflags = pack_transfer_flags(lat, domain.map)

    collide = cfg.collision
    use_local_eq = collide is cade.collide_srt_ade
    sym_codes = [c for c in codes if c in _SYM]
    do_coll_codes = [int(c) for c in (_COLLIDING & codes)]

    tx = _fit_tile(tile[0], X)
    ty = _fit_tile(tile[1], Y, align=8)
    K = tiles_per_program
    while K > 1 and Y % (ty * K) != 0:
        K -= 1
    tyK = ty * K

    def kernel(params_ref, map_ref, u_ref, *args):
        idx = 0
        nu_ref = None
        tf_ref = None
        if variable_diffusion:
            nu_ref = args[idx]
            idx += 1
        if needs_transfer:
            tf_ref = args[idx]
            idx += 1
        gpad_hbm, gout_ref, phi_ref, *rest = args[idx:]
        scratches = rest[:K]
        sem = rest[K]
        i = pl.program_id(0)
        j = pl.program_id(1)

        dmas = []
        for t in range(K):
            jt = j * K + t
            d = pltpu.make_async_copy(
                gpad_hbm.at[:, pl.ds(i * tx, tx + 4), pl.ds(jt * ty, ty + 8), :],
                scratches[t], sem.at[t],
            )
            d.start()
            dmas.append(d)

        phi_in = params_ref[1]
        for t in range(K):
            dmas[t].wait()
            scratch = scratches[t]
            m = map_ref[:, t * ty : (t + 1) * ty, :]
            u = [u_ref[a, :, t * ty : (t + 1) * ty, :] for a in range(3)]
            nu = (nu_ref[:, t * ty : (t + 1) * ty, :]
                  if variable_diffusion else params_ref[0])
            tf = (tf_ref[:, t * ty : (t + 1) * ty, :]
                  if needs_transfer else None)

            def shifted(q, offs, scratch=scratch):
                # gpad x-origin 2 (window start i*tx), y-origin 1
                ox, oy, oz = offs
                base = scratch[q, 2 + ox : 2 + ox + tx, 1 + oy : 1 + oy + ty, :]
                return _zshift(base, oz, Z, periodic_z)

            f_post, phi = _ade_tile_body(
                lat, codes, sym_codes, do_coll_codes, collide, use_local_eq,
                shifted, m, u, nu, phi_in, tf,
                tcoef if needs_transfer else 0.0, Q,
            )

            gout_ref[:, :, t * ty : (t + 1) * ty, :] = f_post
            phi_ref[:, t * ty : (t + 1) * ty, :] = phi

    site_spec = pl.BlockSpec((tx, tyK, Z), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    extra_specs = []
    if variable_diffusion:
        extra_specs.append(site_spec)
    if needs_transfer:
        extra_specs.append(site_spec)
    call = pl.pallas_call(
        kernel,
        grid=(X // tx, Y // tyK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            site_spec,
            pl.BlockSpec((3, tx, tyK, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
        ]
        + extra_specs
        + [
            pl.BlockSpec(memory_space=pl.ANY),  # gpad stays in HBM
        ],
        out_specs=(
            pl.BlockSpec((Q, tx, tyK, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            site_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((Q, tx + 4, ty + 8, Z), dtype) for _ in range(K)]
        + [pltpu.SemaphoreType.DMA((K,))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def step(g, u, nu, phi_in=0.0, map_arr_in=None, tflags_in=None):
        if prepadded:
            assert map_arr_in is not None, \
                "prepadded ADE step requires a runtime map_arr_in"
            assert not needs_transfer or tflags_in is not None, \
                "prepadded ADE step with transfer codes requires tflags_in"
        gpad = g if prepadded else _pad_ade(g, periodic)
        mp = map_arr if map_arr_in is None else map_arr_in
        operands = [mp, jnp.asarray(u, dtype)]
        if variable_diffusion:
            nu_field = jnp.broadcast_to(jnp.asarray(nu, dtype), (X, Y, Z))
            params = jnp.asarray([0.0, phi_in, 0.0, 0.0], dtype)
            operands.append(nu_field)
        else:
            params = jnp.asarray([nu, phi_in, 0.0, 0.0], dtype)
        if needs_transfer:
            operands.append(tflags if tflags_in is None else tflags_in)
        return call(params, *operands, gpad)

    return step
