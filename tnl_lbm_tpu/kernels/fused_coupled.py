"""Single fused NSE+ADE Pallas kernel (the reference's coupled kernel).

The reference advances both lattices in ONE kernel per site, copying the
NSE KernelStruct velocity straight into the ADE KernelStruct
(kernels.h:102-176) - the velocity never round-trips through memory.  This
kernel does the same per tile: the D3Q27 window streams/collides first
(kernels/fused.py ``_stream_bc_collide``), its macro velocity stays in
registers and advects the D3Q7 window (kernels/fused_ade.py
``_ade_tile_body``), then both post-collision tiles and the macro fields
are written once.  Per step this saves the u write + read (6 of ~40 field
passes) versus launching the two kernels back-to-back.

Supports the same inventories as the standalone kernels: the full NSE BC
set minus Bouzidi, and the full ADE set including conjugate TRANSFER_* and
variable per-site diffusion.  A-B streaming both halves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tnl_lbm_tpu.kernels.fused import (
    _pad_once,
    _params_vec,
    _prep,
    _stream_bc_collide,
    _zshift,
)
from tnl_lbm_tpu.kernels.fused_ade import (
    SUPPORTED_ADE_CODES,
    _ade_tile_body,
    _pad_ade,
)
from tnl_lbm_tpu.ops import collision_ade as cade
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim.config import Domain, LBMConfig
from tnl_lbm_tpu.sim.step_ade import (
    _COLLIDING,
    _SYM,
    ADEGEO,
    transfer_direction_flags,
)


def make_fused_coupled_step(cfg: LBMConfig, domain: Domain,
                            ade_cfg: LBMConfig, ade_domain: Domain,
                            tile=(8, 16), tiles_per_program: int = 2,
                            variable_diffusion: bool = False,
                            transfer_coeff: float = 0.0):
    """Build ``step(f, g, nu, nu_ade, u_in=None, force=None, phi_in=0.0)
    -> (f_new, g_new, rho, u, phi)``."""
    from tnl_lbm_tpu.kernels.fused_aa import _fit_tile

    lat, codes, sym_codes, eq_kind, do_coll_codes = _prep(cfg, domain)
    alat = ade_cfg.lat
    assert alat.Q == 7 and ade_cfg.streaming == "AB"
    assert domain.shape == ade_domain.shape, "coupled lattices must share the grid"
    acodes = {ADEGEO(int(c)) for c in np.unique(ade_domain.map)}
    if not acodes <= SUPPORTED_ADE_CODES:
        raise NotImplementedError(f"unsupported ADE codes {acodes - SUPPORTED_ADE_CODES}")
    Q = lat.Q
    AQ = alat.Q
    X, Y, Z = domain.shape
    dtype = cfg.compute_dtype
    periodic = domain.periodic
    periodic_z = bool(periodic[2])
    interpret = jax.default_backend() == "cpu"
    map_nse = np.asarray(domain.map, np.int32)
    map_ade = np.asarray(ade_domain.map, np.int32)

    needs_transfer = bool(
        acodes & {ADEGEO.TRANSFER_FS, ADEGEO.TRANSFER_SF, ADEGEO.TRANSFER_SW})
    if needs_transfer:
        flags = transfer_direction_flags(alat, ade_domain.map)
        tflags = np.zeros(domain.shape, np.int32)
        for q in range(1, AQ):
            tflags |= flags[q - 1].astype(np.int32) << (q - 1)
    tcoef = float(transfer_coeff)

    a_collide = ade_cfg.collision
    a_use_local_eq = a_collide is cade.collide_srt_ade
    a_sym_codes = [c for c in acodes if c in _SYM]
    a_do_coll = [int(c) for c in (_COLLIDING & acodes)]

    tx = _fit_tile(tile[0], X)
    ty = _fit_tile(tile[1], Y, align=8)
    K = tiles_per_program
    while K > 1 and Y % (ty * K) != 0:
        K -= 1
    tyK = ty * K

    def kernel(params_ref, mn_ref, ma_ref, *args):
        idx = 0
        nu_ref = None
        tf_ref = None
        if variable_diffusion:
            nu_ref = args[idx]
            idx += 1
        if needs_transfer:
            tf_ref = args[idx]
            idx += 1
        fpad_hbm, gpad_hbm = args[idx], args[idx + 1]
        fout_ref, gout_ref, rho_ref, u_ref, phi_ref, *rest = args[idx + 2:]
        fscr = rest[:K]
        gscr = rest[K : 2 * K]
        sem = rest[2 * K]
        i = pl.program_id(0)
        j = pl.program_id(1)

        dmas = []
        for t in range(K):
            jt = j * K + t
            d1 = pltpu.make_async_copy(
                fpad_hbm.at[:, pl.ds(i * tx, tx + 2), pl.ds(jt * ty, ty + 8), :],
                fscr[t], sem.at[t, 0],
            )
            d1.start()
            d2 = pltpu.make_async_copy(
                gpad_hbm.at[:, pl.ds(i * tx, tx + 4), pl.ds(jt * ty, ty + 8), :],
                gscr[t], sem.at[t, 1],
            )
            d2.start()
            dmas.append((d1, d2))

        phi_in = params_ref[12]
        for t in range(K):
            dmas[t][0].wait()
            dmas[t][1].wait()
            fs, gs = fscr[t], gscr[t]
            mn = mn_ref[:, t * ty : (t + 1) * ty, :]
            ma = ma_ref[:, t * ty : (t + 1) * ty, :]

            # ---- NSE half (fused.py tile body) ----
            def shifted_f(q, offs, fs=fs):
                ox, oy, oz = offs
                base = fs[q, 1 + ox : 1 + ox + tx, 1 + oy : 1 + oy + ty, :]
                return _zshift(base, oz, Z, periodic_z)

            f_post, rho_out, u_out = _stream_bc_collide(
                lat, cfg, codes, sym_codes, eq_kind, do_coll_codes, dtype,
                shifted_f, mn, params_ref,
            )

            # ---- ADE half advected by the in-register velocity ----
            def shifted_g(q, offs, gs=gs):
                ox, oy, oz = offs
                base = gs[q, 2 + ox : 2 + ox + tx, 1 + oy : 1 + oy + ty, :]
                return _zshift(base, oz, Z, periodic_z)

            nu_ade = (nu_ref[:, t * ty : (t + 1) * ty, :]
                      if variable_diffusion else params_ref[13])
            tf = (tf_ref[:, t * ty : (t + 1) * ty, :]
                  if needs_transfer else None)
            u_ade = [u_out[a] for a in range(3)]
            g_post, phi = _ade_tile_body(
                alat, acodes, a_sym_codes, a_do_coll, a_collide,
                a_use_local_eq, shifted_g, ma, u_ade, nu_ade, phi_in, tf,
                tcoef, AQ,
            )

            sl = slice(t * ty, (t + 1) * ty)
            fout_ref[:, :, sl, :] = f_post
            gout_ref[:, :, sl, :] = g_post
            rho_ref[:, sl, :] = rho_out
            u_ref[:, :, sl, :] = u_out
            phi_ref[:, sl, :] = phi

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
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params [14]
            site_spec,  # NSE map
            site_spec,  # ADE map
        ]
        + extra_specs
        + [
            pl.BlockSpec(memory_space=pl.ANY),  # fpad
            pl.BlockSpec(memory_space=pl.ANY),  # gpad
        ],
        out_specs=(
            pl.BlockSpec((Q, tx, tyK, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((AQ, tx, tyK, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            site_spec,
            pl.BlockSpec((3, tx, tyK, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            site_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((AQ, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
            jax.ShapeDtypeStruct((3, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((Q, tx + 2, ty + 8, Z), dtype) for _ in range(K)]
        + [pltpu.VMEM((AQ, tx + 4, ty + 8, Z), dtype) for _ in range(K)]
        + [pltpu.SemaphoreType.DMA((K, 2))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )

    def step(f, g, nu, nu_ade, u_in=None, force=None, phi_in=0.0,
             parity: int = 0):
        del parity  # A-B
        fpad = _pad_once(f, periodic, extra_y=6)
        gpad = _pad_ade(g, ade_domain.periodic)
        operands = [map_nse, map_ade]
        if variable_diffusion:
            operands.append(jnp.broadcast_to(jnp.asarray(nu_ade, dtype), (X, Y, Z)))
            nu_ade_s = 0.0
        else:
            nu_ade_s = nu_ade
        if needs_transfer:
            operands.append(tflags)
        params = jnp.concatenate([
            _params_vec(dtype, nu, u_in, force),
            jnp.ones((4,), dtype),  # boundary flags (unused for AB)
            jnp.asarray([phi_in, nu_ade_s], dtype).reshape(2),
        ])
        return call(params, *operands, fpad, gpad)

    return step


def make_fused_coupled_step_aa(cfg: LBMConfig, domain: Domain,
                               ade_cfg: LBMConfig, ade_domain: Domain,
                               tile_even=(8, 16), tile_odd=(8, 16),
                               tiles_per_program: int = 2,
                               variable_diffusion: bool = False):
    """A-A coupled pair: ``step(f, g, nu, nu_ade, u_in, force, phi_in,
    parity) -> (f_new, g_new, rho, u, phi)``.

    Both lattices advance in ONE kernel per parity with the velocity
    handoff in registers, like the A-B variant above but with the A-A
    pattern's memory behavior: the even kernel is halo-free (same-site
    reads, opposite-direction writes on both lattices), the odd kernel
    pulls opposite-direction on a 1-halo ring and pushes - the dominant
    DNS configuration runs at A-A speed with the scalar along for ~7/27
    extra traffic.

    Conjugate TRANSFER_* BCs need neighbor phi on the even step (which is
    otherwise halo-free), so transfer maps use the A-B coupled kernel or
    the XLA path instead (guarded).
    """
    import dataclasses as _dc

    from tnl_lbm_tpu.kernels.fused_aa import (
        _edge_rep,
        _fit_tile,
        _pad_aa_odd,
        _pad_map_ring,
    )

    cfg_ab = _dc.replace(cfg, streaming="AB")
    lat, codes, sym_codes, eq_kind, do_coll_codes = _prep(cfg_ab, domain)
    alat = ade_cfg.lat
    assert alat.Q == 7
    assert domain.shape == ade_domain.shape, "coupled lattices must share the grid"
    acodes = {ADEGEO(int(c)) for c in np.unique(ade_domain.map)}
    if not acodes <= SUPPORTED_ADE_CODES:
        raise NotImplementedError(f"unsupported ADE codes {acodes - SUPPORTED_ADE_CODES}")
    if acodes & {ADEGEO.TRANSFER_FS, ADEGEO.TRANSFER_SF, ADEGEO.TRANSFER_SW}:
        raise NotImplementedError(
            "conjugate transfer BCs need neighbor phi on the even step; "
            "use the A-B coupled kernel")
    if ADEGEO.OUTFLOW_PE in acodes:
        raise NotImplementedError("OUTFLOW_PE requires the A-B pattern")
    Q = lat.Q
    AQ = alat.Q
    X, Y, Z = domain.shape
    dtype = cfg.compute_dtype
    periodic = domain.periodic
    periodic_z = bool(periodic[2])
    opp = np.asarray(lat.opp)
    aopp = np.asarray(alat.opp)
    interpret = jax.default_backend() == "cpu"
    map_nse = np.asarray(domain.map, np.int32)
    map_ade = np.asarray(ade_domain.map, np.int32)
    mring_nse = _pad_map_ring(map_nse, periodic)
    mring_ade = _pad_map_ring(map_ade, ade_domain.periodic)

    a_collide = ade_cfg.collision
    a_use_local_eq = a_collide is cade.collide_srt_ade
    a_sym_codes = [c for c in acodes if c in _SYM]
    a_do_coll = [int(c) for c in (_COLLIDING & acodes)]

    # ---------------------------------------------------------------- even
    ex = _fit_tile(tile_even[0], X)
    ey = _fit_tile(tile_even[1], Y)

    def even_kernel(params_ref, mn_ref, ma_ref, *args):
        if variable_diffusion:
            nu_ref, f_ref, g_ref, fout, gout, rho_ref, u_ref, phi_ref = args
        else:
            f_ref, g_ref, fout, gout, rho_ref, u_ref, phi_ref = args
            nu_ref = None

        def shifted_f(q, offs):
            del offs  # same-site read (streaming_AA.h:16-45)
            return f_ref[q]

        f_post, rho_out, u_out = _stream_bc_collide(
            lat, cfg_ab, codes, sym_codes, eq_kind, do_coll_codes, dtype,
            shifted_f, mn_ref[...], params_ref, out_perm=opp,
        )

        def shifted_g(q, offs):
            del offs
            return g_ref[q]

        nu_ade = nu_ref[...] if variable_diffusion else params_ref[13]
        g_post, phi = _ade_tile_body(
            alat, acodes, a_sym_codes, a_do_coll, a_collide, a_use_local_eq,
            shifted_g, ma_ref[...], [u_out[a] for a in range(3)], nu_ade,
            params_ref[12], None, 0.0, AQ, out_perm=aopp,
        )
        fout[...] = f_post
        gout[...] = g_post
        rho_ref[...] = rho_out
        u_ref[...] = u_out
        phi_ref[...] = phi

    site_e = pl.BlockSpec((ex, ey, Z), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    even_call = pl.pallas_call(
        even_kernel,
        grid=(X // ex, Y // ey),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), site_e, site_e]
        + ([site_e] if variable_diffusion else [])
        + [
            pl.BlockSpec((Q, ex, ey, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((AQ, ex, ey, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Q, ex, ey, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((AQ, ex, ey, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            site_e,
            pl.BlockSpec((3, ex, ey, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            site_e,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((AQ, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
            jax.ShapeDtypeStruct((3, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )

    # ----------------------------------------------------------------- odd
    tx = _fit_tile(tile_odd[0], X)
    ty = _fit_tile(tile_odd[1], Y, align=8)
    K = tiles_per_program
    n_tiles_y = Y // ty
    while K > 1 and n_tiles_y % K != 0:
        K -= 1
    txc, tyc = tx + 2, ty + 2
    nx_t, ny_t = X // tx, Y // ty
    tyK = ty * K
    wy = ty + 8  # y_org = 4

    def odd_kernel(params_ref, *args):
        if variable_diffusion:
            fpad_hbm, gpad_hbm, mn_hbm, ma_hbm, nu_hbm = args[:5]
            rest_in = args[5:]
        else:
            fpad_hbm, gpad_hbm, mn_hbm, ma_hbm = args[:4]
            nu_hbm = None
            rest_in = args[4:]
        fout, gout, rho_ref, u_ref, phi_ref, *rest = rest_in
        fscr = rest[:K]
        gscr = rest[K : 2 * K]
        mnscr = rest[2 * K : 3 * K]
        mascr = rest[3 * K : 4 * K]
        nuscr = rest[4 * K : 5 * K] if variable_diffusion else []
        sem = rest[5 * K] if variable_diffusion else rest[4 * K]
        i = pl.program_id(0)
        j = pl.program_id(1)

        dmas = []
        for t in range(K):
            jt = j * K + t
            ds = [
                pltpu.make_async_copy(
                    fpad_hbm.at[:, pl.ds(i * tx, tx + 4), pl.ds(jt * ty, wy), :],
                    fscr[t], sem.at[t, 0]),
                pltpu.make_async_copy(
                    gpad_hbm.at[:, pl.ds(i * tx, tx + 4), pl.ds(jt * ty, wy), :],
                    gscr[t], sem.at[t, 1]),
                pltpu.make_async_copy(
                    mn_hbm.at[pl.ds(i * tx, tx + 2), pl.ds(jt * ty, ty + 8), :],
                    mnscr[t], sem.at[t, 2]),
                pltpu.make_async_copy(
                    ma_hbm.at[pl.ds(i * tx, tx + 2), pl.ds(jt * ty, ty + 8), :],
                    mascr[t], sem.at[t, 3]),
            ]
            if variable_diffusion:
                # ring sites collide with their TRUE neighbor diffusion (the
                # nu ring pads like the maps, x-origin 1 / y-origin 4)
                ds.append(pltpu.make_async_copy(
                    nu_hbm.at[pl.ds(i * tx, tx + 2), pl.ds(jt * ty, ty + 8), :],
                    nuscr[t], sem.at[t, 4]))
            for d in ds:
                d.start()
            dmas.append(ds)

        for t in range(K):
            jt = j * K + t
            for d in dmas[t]:
                d.wait()
            fs, gs = fscr[t], gscr[t]
            mn_ring = mnscr[t][0:txc, 3 : 3 + tyc, :]
            ma_ring = mascr[t][0:txc, 3 : 3 + tyc, :]

            def shifted_f(q, offs, fs=fs):
                # odd-step read: neighbor, opposite direction
                ox, oy, oz = offs
                qo = int(opp[q])
                base = fs[qo, 1 + ox : 1 + ox + txc, 3 + oy : 3 + oy + tyc, :]
                return _zshift(base, oz, Z, periodic_z)

            f_post, rho_ring, u_ring = _stream_bc_collide(
                lat, cfg_ab, codes, sym_codes, eq_kind, do_coll_codes, dtype,
                shifted_f, mn_ring, params_ref, defer_nothing=True,
            )

            def shifted_g(q, offs, gs=gs):
                ox, oy, oz = offs
                qo = int(aopp[q])
                base = gs[qo, 1 + ox : 1 + ox + txc, 3 + oy : 3 + oy + tyc, :]
                return _zshift(base, oz, Z, periodic_z)

            nu_pad = (nuscr[t][0:txc, 3 : 3 + tyc, :]
                      if variable_diffusion else params_ref[13])
            g_post, phi_ring = _ade_tile_body(
                alat, acodes, a_sym_codes, a_do_coll, a_collide,
                a_use_local_eq, shifted_g, ma_ring,
                [u_ring[a] for a in range(3)], nu_pad, params_ref[12],
                None, 0.0, AQ, defer_nothing=True,
            )

            # push both lattices: edge-replicate out-of-domain ring layers,
            # then out[q](x) = post[q](x - c_q)
            def push(post_rows, lattice, m_ring, scr, q_count):
                rows = [post_rows[q] for q in range(q_count)]
                if not periodic[0]:
                    lo = (i == 0) & (params_ref[8] > 0)
                    hi = (i == nx_t - 1) & (params_ref[9] > 0)
                    rows = [_edge_rep(v, 0, lo, hi) for v in rows]
                if not periodic[1]:
                    lo = (jt == 0) & (params_ref[10] > 0)
                    hi = (jt == ny_t - 1) & (params_ref[11] > 0)
                    rows = [_edge_rep(v, 1, lo, hi) for v in rows]
                out = []
                for q in range(q_count):
                    cx, cy, cz = (int(v) for v in lattice.c[q])
                    base = rows[q][1 - cx : 1 - cx + tx, 1 - cy : 1 - cy + ty, :]
                    out.append(_zshift(base, -cz, Z, periodic_z))
                pushed = jnp.stack(out)
                nothing = GEO.NOTHING if lattice is lat else ADEGEO.NOTHING
                if int(nothing) in [int(c) for c in (codes if lattice is lat else acodes)]:
                    m_int = m_ring[1 : 1 + tx, 1 : 1 + ty, :]
                    center = scr[:, 2 : 2 + tx, 4 : 4 + ty, :]
                    pushed = jnp.where(m_int == int(nothing), center, pushed)
                return pushed

            sl = slice(t * ty, (t + 1) * ty)
            fout[:, :, sl, :] = push(f_post, lat, mn_ring, fs, Q)
            gout[:, :, sl, :] = push(g_post, alat, ma_ring, gs, AQ)
            rho_ref[:, sl, :] = rho_ring[1 : 1 + tx, 1 : 1 + ty, :]
            u_ref[:, :, sl, :] = u_ring[:, 1 : 1 + tx, 1 : 1 + ty, :]
            phi_ref[:, sl, :] = phi_ring[1 : 1 + tx, 1 : 1 + ty, :]

    site_o = pl.BlockSpec((tx, tyK, Z), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    odd_call = pl.pallas_call(
        odd_kernel,
        grid=(X // tx, Y // tyK),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (5 if variable_diffusion else 4),
        out_specs=(
            pl.BlockSpec((Q, tx, tyK, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((AQ, tx, tyK, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            site_o,
            pl.BlockSpec((3, tx, tyK, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            site_o,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((AQ, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
            jax.ShapeDtypeStruct((3, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((Q, tx + 4, wy, Z), dtype) for _ in range(K)]
        + [pltpu.VMEM((AQ, tx + 4, wy, Z), dtype) for _ in range(K)]
        + [pltpu.VMEM((tx + 2, ty + 8, Z), jnp.int32) for _ in range(2 * K)]
        + ([pltpu.VMEM((tx + 2, ty + 8, Z), dtype) for _ in range(K)]
           if variable_diffusion else [])
        + [pltpu.SemaphoreType.DMA((K, 5 if variable_diffusion else 4))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )

    def step(f, g, nu, nu_ade, u_in=None, force=None, phi_in=0.0,
             parity: int = 0):
        if variable_diffusion:
            nu_field = jnp.broadcast_to(jnp.asarray(nu_ade, dtype), (X, Y, Z))
            nu_ade_s = 0.0
        else:
            nu_ade_s = nu_ade
        params = jnp.concatenate([
            _params_vec(dtype, nu, u_in, force),
            jnp.ones((4,), dtype),
            jnp.asarray([phi_in, nu_ade_s], dtype).reshape(2),
        ])
        if parity == 0:
            ops = [map_nse, map_ade]
            if variable_diffusion:
                ops.append(nu_field)
            return even_call(params, *ops, f, g)
        fpad = _pad_aa_odd(f, periodic)
        gpad = _pad_aa_odd(g, ade_domain.periodic)
        ops = [fpad, gpad, mring_nse, mring_ade]
        if variable_diffusion:
            from tnl_lbm_tpu.kernels.fused_aa import _pad_force_ring

            ops.append(_pad_force_ring(nu_field[None],
                                       ade_domain.periodic)[0])
        return odd_call(params, *ops)

    return step
