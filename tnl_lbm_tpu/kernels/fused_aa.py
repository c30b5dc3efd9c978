"""Fused A-A pattern Pallas kernels (even/odd parity pair).

The A-A pattern (reference d3q27/streaming_AA.h) updates a single DF buffer
in place:

- **even step**: read same-site same-direction, write same-site
  opposite-direction (streaming_AA.h:16-45).  No neighbor access at all, so
  this compiles to a plain BlockSpec-tiled kernel with automatic pipeline
  overlap - no halo pad pass, no manual halo DMA - and runs close to the
  HBM roofline.
- **odd step**: read neighbor opposite-direction (a pull of the
  opposite-permuted field), write neighbor same-direction (a push,
  streaming_AA.h:47-76).  The push is realized by computing the
  post-collision state on a 1-site halo ring around each tile and writing
  shifted slices of it, which needs 2-halo input windows.

Semantics match sim/step.py's A-A branches exactly (regression-tested in
tests/test_fused_kernel.py): the even step applies no streaming-stage BC
pull modifications, the odd push equals ``pull(pad(f_post))`` including the
edge-replicate/wrap treatment at domain boundaries, and NOTHING sites keep
their stored DFs.

Donation note: do NOT donate the input into the even step.  Donation makes
XLA alias the kernel's output onto its input buffer, and simultaneous
read/write DMA streams to the same HBM region run ~1.8x slower on v5e
(measured: 12.2 ms vs 6.9 ms for the bare permuted copy).  The even step
ping-pongs two buffers; the odd step may donate (its Pallas input is the
separately built fpad).  Steady state is therefore two DF buffers, same as
A-B - on TPU the A-A pattern's win is the halo-free even step, not memory.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.kernels.fused import (
    MOSAIC_SCRATCH_BUDGET,
    _fit_tile,
    _fit_tiles_vmem,
    _lane_pad,
    _params_vec,
    _prep,
    _stream_bc_collide,
    _zshift,
)
from tnl_lbm_tpu.sim.config import Domain, LBMConfig


def _pad_aa_odd(f, periodic, extra_z: int = 0):
    """2-halo pad on X (origin 2) and a 4-row Y pad (origin 4) for the odd
    kernel's DMA windows: fpad is [Q, X+4, Y+8, Zp].  With the interior at
    Y offset 4, an 8-aligned window [j*ty, j*ty+ty+8) covers the 2-halo rows
    [j*ty-2, j*ty+ty+2) of the tile - minimal read amplification.
    ``extra_z`` lane-pads to the 128 multiple (reads clamp at true Z)."""
    X, Y = f.shape[1], f.shape[2]
    fpad = jnp.pad(f, [(0, 0), (2, 2), (4, 4), (0, extra_z)], mode="edge")
    if periodic[0]:
        fpad = fpad.at[:, 0:2].set(fpad[:, X : X + 2])
        fpad = fpad.at[:, X + 2 : X + 4].set(fpad[:, 2:4])
    if periodic[1]:
        fpad = fpad.at[:, :, 2:4].set(fpad[:, :, Y + 2 : Y + 4])
        fpad = fpad.at[:, :, Y + 4 : Y + 6].set(fpad[:, :, 4:6])
    return fpad


def _pad_map_ring(map_arr, periodic, extra_z: int = 0):
    """Static 1-halo map pad (X origin 1, Y origin 4): [X+2, Y+8, Zp]."""
    X, Y = map_arr.shape[0], map_arr.shape[1]
    mp = np.pad(map_arr, [(1, 1), (4, 4), (0, extra_z)], mode="edge")
    if periodic[0]:
        mp[0] = mp[X]
        mp[X + 1] = mp[1]
    if periodic[1]:
        mp[:, 3] = mp[:, Y + 3]
        mp[:, 4 + Y] = mp[:, 4]
    return mp


def _edge_rep(v, axis, is_first, is_last):
    """Replace the ring-halo layer of `v` with the adjacent interior layer
    when this tile sits on a non-periodic domain boundary (matches the
    edge-replicate jnp.pad in sim/step.py's odd push)."""
    if axis == 0:
        first = jnp.where(is_first, v[1:2], v[0:1])
        last = jnp.where(is_last, v[-2:-1], v[-1:])
        return jnp.concatenate([first, v[1:-1], last], axis=0)
    first = jnp.where(is_first, v[:, 1:2], v[:, 0:1])
    last = jnp.where(is_last, v[:, -2:-1], v[:, -1:])
    return jnp.concatenate([first, v[:, 1:-1], last], axis=1)


def _edge_rep_z(v, is_lo, is_hi, z_lo, z_hi):
    """Lane-axis analog of ``_edge_rep`` for z-halo (z-sharded) builds:
    when this shard owns a non-periodic global z boundary, replace the
    halo lanes (< z_lo / > z_hi) with the boundary lane's value so the
    push's boundary contribution comes from the boundary site's own
    collision - matching the edge-replicate jnp.pad in sim/step.py's odd
    push (and the single-chip kernel's _zshift clamp)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    lo_plane = v[..., z_lo : z_lo + 1]
    hi_plane = v[..., z_hi : z_hi + 1]
    v = jnp.where(jnp.logical_and(is_lo, lane < z_lo), lo_plane, v)
    return jnp.where(jnp.logical_and(is_hi, lane > z_hi), hi_plane, v)


def _pad_force_ring(force, periodic, extra_z: int = 0):
    """1-halo pad of a [3, X, Y, Z] force field on the odd kernel's map-ring
    origins (x 1, y 4): [3, X+2, Y+8, Zp].  Edge-replication matches the XLA
    push's jnp.pad of f_post (halo-ring sites carry the force their own
    collision saw)."""
    X, Y = force.shape[1], force.shape[2]
    fp = jnp.pad(force, [(0, 0), (1, 1), (4, 4), (0, extra_z)], mode="edge")
    if periodic[0]:
        fp = fp.at[:, 0:1].set(fp[:, X : X + 1])
        fp = fp.at[:, X + 1 : X + 2].set(fp[:, 1:2])
    if periodic[1]:
        fp = fp.at[:, :, 3:4].set(fp[:, :, Y + 3 : Y + 4])
        fp = fp.at[:, :, Y + 4 : Y + 5].set(fp[:, :, 4:5])
    return fp


def _build_odd_call(lat, cfg_ab, codes, sym_codes, eq_kind, do_coll_codes,
                    dtype, periodic, periodic_z, X, Y, Z, tile_odd,
                    tiles_per_program, with_macro, interpret, y_org,
                    force_field: bool = False, z_halo: int = 0,
                    macro_only: bool = False):
    """The odd-parity push kernel.  ``y_org`` is the fpad Y origin: 4 for
    the standalone step (minimal ty+8 windows on a [Q,X+4,Y+8,Z] pad), 8
    for the persistent-pad pair (aligned even-step writes require origin 8,
    costing ty+16 windows on [Q,X+4,Y+16,Z]).

    ``macro_only=True`` builds the odd-parity u* PRE-PASS instead: pull
    the neighbor-opposite components, apply the wall/symmetry transforms
    and the moments on the TILE only (no ring, no collision, no push, no
    f output) - the A-A analog of fused.py's macro_only kernel (reference
    kernels.h:178-218)."""
    Q = lat.Q
    opp = np.asarray(lat.opp)
    Zp = _lane_pad(Z, interpret)
    itemsize = jnp.dtype(dtype).itemsize

    def vmem_bytes(tx, ty, K):
        scr = K * ((Q * (tx + 4) * (ty + 2 * y_org) + (tx + 2) * (ty + 8))
                   * Zp * itemsize)
        if force_field:
            scr += K * 3 * (tx + 2) * (ty + 8) * Zp * itemsize
        out_ch = 4 if macro_only else Q + 4
        bspec = 2 * tx * ty * K * out_ch * Z * itemsize
        return scr + bspec

    tx, ty, K = _fit_tiles_vmem(vmem_bytes, tile_odd, tiles_per_program,
                                X, Y, budget_bytes=MOSAIC_SCRATCH_BUDGET)
    assert X % tx == 0 and Y % (ty * K) == 0, (X, Y, tile_odd, K)
    assert ty % 8 == 0, "ty must be sublane-aligned (multiple of 8)"
    txc, tyc = tx + 2, ty + 2  # ring (interior + 1-halo) extents
    nx_t, ny_t = X // tx, Y // ty
    tyK = ty * K
    wy = ty + 2 * y_org  # f window rows (8-aligned since y_org in {4, 8})
    yr = y_org - 1  # in-window y offset of the ring
    dummy = (8, 8, 128)

    def odd_kernel(params_ref, *args):
        if force_field:
            fpad_hbm, mp_hbm, fr_hbm, fout_ref, rho_ref, u_ref, *rest = args
        else:
            fpad_hbm, mp_hbm, fout_ref, rho_ref, u_ref, *rest = args
            fr_hbm = None
        fscr = rest[:K]
        mscr = rest[K : 2 * K]
        frscr = rest[2 * K : 3 * K] if force_field else []
        sem = rest[3 * K] if force_field else rest[2 * K]
        i = pl.program_id(0)
        j = pl.program_id(1)

        dmas = []
        for t in range(K):
            jt = j * K + t
            # fpad x-origin 2: window [i*tx-2, i*tx+tx+2) -> start i*tx
            # fpad y-origin y_org: window [jt*ty-y_org, ...+ty+y_org) -> jt*ty
            d1 = pltpu.make_async_copy(
                fpad_hbm.at[:, pl.ds(i * tx, tx + 4), pl.ds(jt * ty, wy), :],
                fscr[t], sem.at[t, 0],
            )
            d1.start()
            d2 = pltpu.make_async_copy(
                mp_hbm.at[pl.ds(i * tx, tx + 2), pl.ds(jt * ty, ty + 8), :],
                mscr[t], sem.at[t, 1],
            )
            d2.start()
            ds = [d1, d2]
            if force_field:
                d3 = pltpu.make_async_copy(
                    fr_hbm.at[:, pl.ds(i * tx, tx + 2), pl.ds(jt * ty, ty + 8), :],
                    frscr[t], sem.at[t, 2],
                )
                d3.start()
                ds.append(d3)
            dmas.append(ds)

        for t in range(K):
            jt = j * K + t
            for d in dmas[t]:
                d.wait()
            scratch = fscr[t]

            if macro_only:
                # u* on the tile only: neighbor-opposite pull + transforms
                # + moments (f scratch interior origin: x 2, y y_org)
                def shifted_m(q, offs, scratch=scratch):
                    ox, oy, oz = offs
                    qo = int(opp[q])
                    base = scratch[qo, 2 + ox : 2 + ox + tx,
                                   y_org + oy : y_org + oy + ty, :]
                    return _zshift(base, oz, Z, periodic_z)

                m_tile = mscr[t][1 : 1 + tx, 4 : 4 + ty, :]
                _, rho_t, u_t = _stream_bc_collide(
                    lat, cfg_ab, codes, sym_codes, eq_kind, do_coll_codes,
                    dtype, shifted_m, m_tile, params_ref, macro_only=True,
                )
                rho_ref[:, t * ty : (t + 1) * ty, :] = rho_t[..., :Z]
                u_ref[:, :, t * ty : (t + 1) * ty, :] = u_t[..., :Z]
                continue
            # ring map: global rows [i*tx-1, ...); with map x-origin 1 and
            # window start i*tx the ring begins at window x offset 0, y 3
            m_ring = mscr[t][0:txc, 3 : 3 + tyc, :]

            def shifted(q, offs, scratch=scratch):
                # odd-step read: neighbor, opposite direction
                # (streaming_AA.h:47-60); ring origin in-window: x 1, y yr
                ox, oy, oz = offs
                qo = int(opp[q])
                base = scratch[qo, 1 + ox : 1 + ox + txc, yr + oy : yr + oy + tyc, :]
                return _zshift(base, oz, Z, periodic_z)

            ft = (frscr[t][:, 0:txc, 3 : 3 + tyc, :] if force_field else None)
            f_post, rho_ring, u_ring = _stream_bc_collide(
                lat, cfg_ab, codes, sym_codes, eq_kind, do_coll_codes, dtype,
                shifted, m_ring, params_ref, defer_nothing=True, force_tile=ft,
            )

            # at non-periodic GLOBAL domain boundaries the XLA push pads
            # f_post with edge replication; overwrite the out-of-domain ring
            # layer (params[8:12] flag whether this shard owns each boundary)
            post = [f_post[q] for q in range(Q)]
            if not periodic[0]:
                lo = (i == 0) & (params_ref[8] > 0)
                hi = (i == nx_t - 1) & (params_ref[9] > 0)
                post = [_edge_rep(v, 0, lo, hi) for v in post]
            if not periodic[1]:
                lo = (jt == 0) & (params_ref[10] > 0)
                hi = (jt == ny_t - 1) & (params_ref[11] > 0)
                post = [_edge_rep(v, 1, lo, hi) for v in post]
            if z_halo and not periodic_z:
                zlo = params_ref[12] > 0
                zhi = params_ref[13] > 0
                post = [_edge_rep_z(v, zlo, zhi, z_halo, Z - z_halo - 1)
                        for v in post]

            # push: out[q](x) = f_post[q](x - c_q); ring covers x +- 1
            rows = []
            for q in range(Q):
                cx, cy, cz = (int(v) for v in lat.c[q])
                base = post[q][1 - cx : 1 - cx + tx, 1 - cy : 1 - cy + ty, :]
                rows.append(_zshift(base, -cz, Z, periodic_z))
            pushed = jnp.stack(rows)

            if GEO.NOTHING in codes:
                # destination-site restore: NOTHING keeps its stored DFs
                # (same site, same direction = fpad window interior)
                m_int = m_ring[1 : 1 + tx, 1 : 1 + ty, :]
                center = scratch[:, 2 : 2 + tx, y_org : y_org + ty, :]
                pushed = jnp.where(m_int == int(GEO.NOTHING), center, pushed)

            fout_ref[:, :, t * ty : (t + 1) * ty, :] = pushed[..., :Z]
            if with_macro:
                rho_ref[:, t * ty : (t + 1) * ty, :] = rho_ring[1 : 1 + tx, 1 : 1 + ty, :Z]
                u_ref[:, :, t * ty : (t + 1) * ty, :] = u_ring[:, 1 : 1 + tx, 1 : 1 + ty, :Z]

    odd_call = pl.pallas_call(
        odd_kernel,
        grid=(X // tx, Y // tyK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # fpad stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # padded map stays in HBM
        ]
        + ([pl.BlockSpec(memory_space=pl.ANY)] if force_field else []),
        out_specs=(
            pl.BlockSpec(dummy if macro_only else (Q, tx, tyK, Z),
                         (lambda i, j: (0, 0, 0)) if macro_only
                         else (lambda i, j: (0, i, j, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tx, tyK, Z) if with_macro else dummy,
                         (lambda i, j: (i, j, 0)) if with_macro else (lambda i, j: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tx, tyK, Z) if with_macro else (3,) + dummy,
                         (lambda i, j: (0, i, j, 0)) if with_macro else (lambda i, j: (0, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(dummy if macro_only else (Q, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z) if with_macro else dummy, dtype),
            jax.ShapeDtypeStruct((3, X, Y, Z) if with_macro else (3,) + dummy, dtype),
        ),
        scratch_shapes=[pltpu.VMEM((Q, tx + 4, wy, Zp), dtype) for _ in range(K)]
        + [pltpu.VMEM((tx + 2, ty + 8, Zp), jnp.int32) for _ in range(K)]
        + ([pltpu.VMEM((3, tx + 2, ty + 8, Zp), dtype) for _ in range(K)]
           if force_field else [])
        + [pltpu.SemaphoreType.DMA((K, 3 if force_field else 2))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
    )
    return odd_call, tx, ty, K


def make_fused_step_aa(cfg: LBMConfig, domain: Domain,
                       tile_even=(8, 16), tile_odd=(8, 16),
                       tiles_per_program: int = 4, with_macro: bool = True,
                       prepadded: bool = False, local_shape=None,
                       force_field: bool = False, z_halo: int = 0,
                       macro_only: bool = False):
    """A-A fused pair: ``step(f, nu, u_in, force, parity)`` with parity
    0 = even, 1 = odd (Python-static).  Returns (f_new, rho, u).

    With ``macro_only=True`` the kernels are the A-A u* PRE-PASS
    (reference kernels.h:178-218): parity-aware read (even: same-site
    same-direction; odd: neighbor-opposite pull) + wall/symmetry
    transforms + moments with the homogeneous force - no collision, no f
    write.  ``step(...)`` returns ``(rho0, u0)``.  Feeds the forcing hook
    in kernels/hooked.py at ~0.3-0.5x the HBM traffic of a full step.

    With ``prepadded=True`` (the distributed path - the reference never
    finished multi-GPU A-A sync, defs.h:3-9 marks it TODO; the TPU build
    supports it):
    - the even step takes the plain local block plus ``map_arr_in`` (the
      even step needs NO halo at all - zero communication);
    - the odd step takes the already-haloed local block [Q, Xl+4, Yl+8, Z]
      (x-origin 2, y-origin 4) plus ``map_ring_in`` [Xl+2, Yl+8, Z] and
      ``bflags`` - four {0,1} floats (x_lo, x_hi, y_lo, y_hi) marking
      whether this shard owns the respective global domain boundary (the
      push's edge replication must only fire there).
    """
    assert cfg.streaming == "AA", "use make_fused_step for the A-B pattern"
    if macro_only:
        assert with_macro and not force_field, \
            "macro_only is the u* pre-pass: macros only, no force field"
    cfg_ab = dataclasses.replace(cfg, streaming="AB")
    lat, codes, sym_codes, eq_kind, do_coll_codes = _prep(cfg_ab, domain)
    if GEO.OUTFLOW_RIGHT_INTERP in codes:
        raise NotImplementedError("OUTFLOW_RIGHT_INTERP requires the A-B pattern")
    Q = lat.Q
    X, Y, Z = local_shape if local_shape is not None else domain.shape
    dtype = cfg.compute_dtype
    periodic = domain.periodic
    periodic_z = bool(periodic[2])
    opp = np.asarray(lat.opp)
    interpret = jax.default_backend() == "cpu"
    Zp = _lane_pad(Z, interpret)
    itemsize = jnp.dtype(dtype).itemsize
    map_arr = None if prepadded else np.asarray(domain.map, np.int32)

    # ------------------------------------------------------------ even
    # all-BlockSpec kernel: native Z (any extent), VMEM-fit tile
    def even_bytes(ex, ey, k):
        del k
        per_site = (2 * Q + 4) * itemsize + 4 + (3 * itemsize if force_field else 0)
        return 2 * ex * ey * Z * per_site

    ex, ey, _ = _fit_tiles_vmem(even_bytes, tile_even, 1, X, Y,
                                budget_bytes=int(90e6), ty_align=1)
    assert X % ex == 0 and Y % ey == 0, (X, Y, tile_even)

    def even_kernel(params_ref, map_ref, *args):
        if force_field:
            force_ref, f_ref, fout_ref, rho_ref, u_ref = args
        else:
            f_ref, fout_ref, rho_ref, u_ref = args
            force_ref = None

        def shifted(q, offs):
            # even-step read: same site, same direction, regardless of the
            # offsets (no streaming happens; BC pull modifications are
            # no-ops on the even step, as in sim/step.py parity==0)
            del offs
            return f_ref[q]

        ft = force_ref[...] if force_ref is not None else None
        f_post, rho_out, u_out = _stream_bc_collide(
            lat, cfg_ab, codes, sym_codes, eq_kind, do_coll_codes, dtype,
            shifted, map_ref[...], params_ref, out_perm=opp, force_tile=ft,
            macro_only=macro_only,
        )
        if not macro_only:
            fout_ref[...] = f_post
        if with_macro:
            rho_ref[...] = rho_out
            u_ref[...] = u_out

    dummy = (8, 8, 128)
    even_call = pl.pallas_call(
        even_kernel,
        grid=(X // ex, Y // ey),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ex, ey, Z), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ]
        + ([pl.BlockSpec((3, ex, ey, Z), lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM)] if force_field else [])
        + [
            pl.BlockSpec((Q, ex, ey, Z), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(dummy if macro_only else (Q, ex, ey, Z),
                         (lambda i, j: (0, 0, 0)) if macro_only
                         else (lambda i, j: (0, i, j, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ex, ey, Z) if with_macro else dummy,
                         (lambda i, j: (i, j, 0)) if with_macro else (lambda i, j: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ex, ey, Z) if with_macro else (3,) + dummy,
                         (lambda i, j: (0, i, j, 0)) if with_macro else (lambda i, j: (0, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(dummy if macro_only else (Q, X, Y, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z) if with_macro else dummy, dtype),
            jax.ShapeDtypeStruct((3, X, Y, Z) if with_macro else (3,) + dummy, dtype),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    # ----------------------------------------------------------------- odd
    odd_call, tx, ty, K = _build_odd_call(
        lat, cfg_ab, codes, sym_codes, eq_kind, do_coll_codes, dtype,
        periodic, periodic_z, X, Y, Z, tile_odd, tiles_per_program,
        with_macro, interpret, y_org=4, force_field=force_field,
        z_halo=z_halo, macro_only=macro_only,
    )
    map_ring = None if prepadded else _pad_map_ring(map_arr, periodic,
                                                    extra_z=Zp - Z)

    def _zpad(arr):
        if Zp == Z or arr is None:
            return arr
        pw = [(0, 0)] * (arr.ndim - 1) + [(0, Zp - Z)]
        return jnp.pad(arr, pw, mode="edge")

    def step(f, nu, u_in=None, force=None, parity: int = 0,
             map_arr_in=None, map_ring_in=None, bflags=None,
             force_ring_in=None):
        flags = (jnp.ones((6,), dtype) if bflags is None
                 else jnp.asarray(bflags, dtype).reshape(-1))
        flags = jnp.concatenate([flags, jnp.ones((6 - flags.shape[0],), dtype)])
        if force_field:
            assert force is not None and force.ndim == 4, \
                "force_field kernel expects a [3, X, Y, Z] force"
            fvec = None
        else:
            fvec = force
        params = jnp.concatenate([_params_vec(dtype, nu, u_in, fvec), flags])
        if parity == 0:
            mp = map_arr if map_arr_in is None else map_arr_in
            if force_field:
                f_new, rho, u = even_call(params, mp, force.astype(dtype), f)
            else:
                f_new, rho, u = even_call(params, mp, f)
        else:
            if prepadded:
                fpad = _zpad(f)
                mr = _zpad(map_ring_in)
            else:
                fpad = _pad_aa_odd(f, periodic, extra_z=Zp - Z)
                mr = map_ring
            if force_field:
                # distributed path: the caller exchanged the 1-halo force
                # ring across shard seams (edge replication there would
                # diverge from the single-device push at the seams)
                fr = (_zpad(force_ring_in.astype(dtype))
                      if force_ring_in is not None
                      else _pad_force_ring(force.astype(dtype), periodic,
                                           extra_z=Zp - Z))
                f_new, rho, u = odd_call(params, fpad, mr, fr)
            else:
                f_new, rho, u = odd_call(params, fpad, mr)
        if macro_only:
            return rho, u
        if not with_macro:
            return f_new, None, None
        return f_new, rho, u

    return step


def _edge_rep2(v, axis, is_lo, is_hi, lo_src, hi_src, n_lo, n_hi):
    """Window-wide 2-layer edge replication: when ``is_lo``, the first
    ``n_lo`` layers along ``axis`` (out-of-domain) are replaced by the layer
    at ``lo_src`` (the first in-domain site); symmetric for the high side.
    Layers before ``n_lo``/after the window stay untouched by construction
    of the callers (they pass the slice covering exactly the window)."""
    if axis == 0:
        lo = jnp.where(is_lo, jnp.concatenate([v[lo_src : lo_src + 1]] * n_lo, 0),
                       v[:n_lo])
        hi = jnp.where(is_hi, jnp.concatenate([v[hi_src : hi_src + 1]] * n_hi, 0),
                       v[v.shape[0] - n_hi :])
        return jnp.concatenate([lo, v[n_lo : v.shape[0] - n_hi], hi], 0)
    lo = jnp.where(is_lo, jnp.concatenate([v[:, lo_src : lo_src + 1]] * n_lo, 1),
                   v[:, :n_lo])
    hi = jnp.where(is_hi, jnp.concatenate([v[:, hi_src : hi_src + 1]] * n_hi, 1),
                   v[:, v.shape[1] - n_hi :])
    return jnp.concatenate([lo, v[:, n_lo : v.shape[1] - n_hi], hi], 1)


def to_padded_aa(f, periodic, store_dtype=None):
    """[Q, X, Y, Z] -> the persistent-pad pair state [Q, X+4, Y+16, Zp]
    (x-origin 2, y-origin 8, lanes padded to the 128 multiple) with halo
    layers filled.  ``store_dtype`` narrows the at-rest state (half
    storage, see make_fused_pair2_aa)."""
    Q, X, Y, Z = f.shape
    if store_dtype is not None:
        f = f.astype(store_dtype)
    Zp = _lane_pad(Z, jax.default_backend() == "cpu")
    fpad = jnp.pad(f, [(0, 0), (2, 2), (8, 8), (0, Zp - Z)], mode="edge")
    return _fill_halos_pad8(fpad, periodic, X, Y, Z, Q)


def from_padded_aa(fpad, Z: int | None = None, dtype=None):
    """Persistent-pad state -> plain [Q, X, Y, Z].  Pass the true ``Z``
    when the lane extent was padded (to_padded_aa pads to the 128
    multiple); with Z=None the full lane extent is returned.  ``dtype``
    widens half-stored state back to the compute dtype."""
    Q, Xp, Yp, Zl = fpad.shape
    out = fpad[:, 2 : Xp - 2, 8 : Yp - 8, :]
    if Z is not None:
        out = out[..., :Z]
    return out if dtype is None else out.astype(dtype)


def _fill_halos_pad8(fpad, periodic, X, Y, Z, Q):
    """Fill 2 halo layers each side of the interior at origin (2, 8)
    (x first, then y, matching _pad_aa_odd's corner semantics)."""
    if periodic[0]:
        fpad = fpad.at[:, 0:2].set(fpad[:, X : X + 2])
        fpad = fpad.at[:, X + 2 : X + 4].set(fpad[:, 2:4])
    else:
        fpad = fpad.at[:, 0:2].set(jnp.broadcast_to(
            fpad[:, 2:3], (Q, 2) + fpad.shape[2:]))
        fpad = fpad.at[:, X + 2 : X + 4].set(jnp.broadcast_to(
            fpad[:, X + 1 : X + 2], (Q, 2) + fpad.shape[2:]))
    if periodic[1]:
        fpad = fpad.at[:, :, 6:8].set(fpad[:, :, Y + 6 : Y + 8])
        fpad = fpad.at[:, :, Y + 8 : Y + 10].set(fpad[:, :, 8:10])
    else:
        fpad = fpad.at[:, :, 6:8].set(jnp.broadcast_to(
            fpad[:, :, 8:9], fpad.shape[:2] + (2, fpad.shape[-1])))
        fpad = fpad.at[:, :, Y + 8 : Y + 10].set(jnp.broadcast_to(
            fpad[:, :, Y + 7 : Y + 8], fpad.shape[:2] + (2, fpad.shape[-1])))
    return fpad


def pad_map_pair2(map_arr, periodic, Zp: int) -> np.ndarray:
    """Geometry map -> the pair2 persistent-pad layout [X+4, Y+16, Zp]
    (x-origin 2, y-origin 8, wrapped halos on periodic axes).  Exposed so
    callers can thread the padded map through jit as an ARGUMENT
    (``pair(..., map_pad_in=...)``): closed over, a large map bakes into
    the lowered HLO as a dense constant - at 512^3 that exceeds the remote
    compiler's request-size limit (HTTP 413, docs/measurements/r5/
    r5_demo512.log) before it even reaches Mosaic."""
    X, Y = map_arr.shape[0], map_arr.shape[1]
    Z = map_arr.shape[2]
    mp = np.pad(np.asarray(map_arr, np.int32),
                [(2, 2), (8, 8), (0, Zp - Z)], mode="edge")
    if periodic[0]:
        mp[0:2] = mp[X : X + 2]
        mp[X + 2 : X + 4] = mp[2:4]
    if periodic[1]:
        mp[:, 6:8] = mp[:, Y + 6 : Y + 8]
        mp[:, Y + 8 : Y + 10] = mp[:, 8:10]
    return mp


def make_fused_pair2_aa(cfg: LBMConfig, domain: Domain,
                        tile=(8, 32), tiles_per_program: int = 2,
                        with_macro: bool = True, even_band: str = "aligned",
                        local_shape=None, prepadded: bool = False,
                        vmem_limit_mb: int = 112,
                        _debug_dma: str = "full", z_halo: int = 0,
                        window: str = "pad16", map_mode: str = "i32",
                        zprofile: bool = False, store_dtype=None,
                        halo_in_kernel: bool = True):
    """One-kernel A-A pair on persistent-padded state: ``pair(fpad, nu,
    u_in, force) -> (fpad_new, rho, u)`` advances TWO lattice steps with a
    single windowed read and a single interior write.

    Per tile the kernel loads the 2-halo window [Q, tx+4, ty+16, Z] of the
    padded state (ty+16: DMA sublane starts must be 8-aligned - unaligned
    starts fail Mosaic compilation, scripts/probe_dma_align.py), runs the
    even (same-site) collision ONLY on the (tx+4, ty+4) subwindow the odd
    pass consumes, edge-replicates the out-of-domain layers (non-periodic
    global boundaries), then runs the odd pull+collide+push on the 1-halo
    ring of the even output entirely in VMEM and writes the interior back
    into the padded layout.  The intermediate field between the parities
    never touches HBM.

    Pipelining: K static scratch slots; after tile t's compute releases
    slot t, the kernel immediately starts the input DMA for the NEXT grid
    program's slot-t tile (static slot indices - traced slot indexing
    poisons Mosaic, docs/PERFORMANCE.md), so input DMA, compute and output
    DMA all overlap across the whole grid.  Do NOT donate at the jit level:
    in/out buffer aliasing costs ~1.8x HBM bandwidth.

    History: the first pair2 ran the even cascade on the WHOLE 2.25x
    window with K=1 (no overlap) and measured 30.4 ms/pair - slower than
    the two-kernel pair's 27.9 ms.  This rebuild (subwindow cascade +
    cross-program prefetch) is the production path.

    Round-4 HBM-traffic variants (each correctness-tested in interpret
    mode, selected per chip by the autotuner - kernels/autotune.py - which
    skips any variant Mosaic rejects):

    - ``window="tight"``: the input DMAs copy only the consumed rows
      [jt*ty+6, jt*ty+ty+10) into scratch sublane offset 6 (extent ty+4
      instead of ty+16), betting on the congruent-offset DMA rule
      src%8 == dst%8 (scripts/probe_dma_align.py); cuts the f+map input
      traffic by 25% at ty=32.  Scratch shapes and compute geometry are
      unchanged (head/tail scratch rows hold junk the band never consumes).
    - ``map_mode="i16"|"i8"``: the static geometry-map windows travel as
      int16/int8 and are widened to int32 in-register, cutting the map's
      share of the input traffic (20% of total at (8,32)) by 2x/4x.
      Requires ``prepadded=False`` (the sharded wrappers pass int32 maps).
    - ``zprofile=True``: tiles whose consumed map window varies only along
      z (ALL interior tiles of wall-bounded channel/duct geometries - every
      tile spans full Z, so a plain all-fluid fast path never fires) skip
      the map DMA entirely; the kernel rebuilds their masks from a shared
      per-profile z-vector (one jnp.where select per tile).  Per-tile
      classes ride SMEM, the <=4 profiles ride VMEM.  Static maps only.

    Half storage (``store_dtype=jnp.float16`` or ``jnp.bfloat16``): the
    at-rest DF state travels and sleeps in 16 bits while every arithmetic
    op stays in the compute dtype (widen after the input DMA, narrow on the
    interior write) - the FP16S scheme of FluidX3D (Lehmann et al. 2022,
    doi:10.3390/computation10060092) applied to the A-A pair.  Halves the
    dominant f traffic AND the f window's VMEM (larger tiles fit), and
    halves the sharded wrapper's ppermute halo bytes.  Requires
    ``cfg.well=True``: the well transform stores DEVIATIONS from the rest
    state (reference common_well.h), so the 10/7-bit mantissa applies to
    the small signal, not the O(w_q) carrier - without it half storage
    loses ~log2(1/Ma) bits of the physics.  NOTHING sites round-trip
    bit-exact (widen->narrow of an unchanged value is the identity).
    Accuracy is quantified in tests/test_fused_kernel.py and
    docs/PERFORMANCE.md; this is an explicit opt-in, never autotuned.

    Tile sizing: tx > 8 made the round-2 cumulant cascade spill registers
    (the Mosaic OOM dump showed ~72 MB of spill slots at tx=16 - SURVEY.md's
    "register pressure" warning measured); the round-3 cascade carries ~59%
    fewer ops, so the autotune sweep keeps tx=16 candidates.  (8, 32) K=2
    is the production geometry, confirmed by the on-chip autotuner.

    State helpers: to_padded_aa / from_padded_aa.
    """
    assert cfg.streaming == "AA"
    assert window in ("pad16", "tight"), window
    assert map_mode in ("i32", "i16", "i8"), map_mode
    if prepadded and map_mode != "i32":
        raise ValueError("map_mode narrowing needs a build-time map "
                         "(prepadded shards pass int32 maps)")
    if prepadded:
        zprofile = False  # classification needs the static global map
    map_np_dtype = {"i32": np.int32, "i16": np.int16, "i8": np.int8}[map_mode]
    map_jnp_dtype = {"i32": jnp.int32, "i16": jnp.int16, "i8": jnp.int8}[map_mode]
    cfg_ab = dataclasses.replace(cfg, streaming="AB")
    lat, codes, sym_codes, eq_kind, do_coll_codes = _prep(cfg_ab, domain)
    if GEO.OUTFLOW_RIGHT_INTERP in codes:
        raise NotImplementedError("OUTFLOW_RIGHT_INTERP requires the A-B pattern")
    Q = lat.Q
    X, Y, Z = local_shape if local_shape is not None else domain.shape
    dtype = cfg.compute_dtype
    periodic = domain.periodic
    periodic_z = bool(periodic[2])
    opp = np.asarray(lat.opp)
    interpret = jax.default_backend() == "cpu"
    Zp = _lane_pad(Z, interpret)
    itemsize = jnp.dtype(dtype).itemsize

    store = jnp.dtype(dtype) if store_dtype is None else jnp.dtype(store_dtype)
    half = store != jnp.dtype(dtype)
    if half:
        if store not in (jnp.dtype(jnp.float16), jnp.dtype(jnp.bfloat16)):
            raise ValueError(f"store_dtype must be float16/bfloat16 or the "
                             f"compute dtype, got {store}")
        if not cfg.well:
            raise ValueError(
                "half storage needs well-conditioned (deviation) DFs: set "
                "cfg.well=True so the 16-bit mantissa applies to the small "
                "signal, not the O(w_q) rest-state carrier")
    s_item = store.itemsize
    m_item = np.dtype(map_np_dtype).itemsize
    # half storage: the interior-write scratch gains 8 head rows so its
    # output DMA offsets are congruent mod 16 (16-bit sublane granularity:
    # src row 8 === dst row 8 + jt*ty with ty % 16 == 0)
    oy0 = 8 if half else 0

    # In-kernel halo maintenance (round 5).  The XLA-level
    # _fill_halos_pad8 after every pair materializes TWO full copies of
    # the padded array (trace-measured 1.4 ms/pair of pure copy at 256^3,
    # docs/measurements/r5/r5_anatomy_summary.json, ~10% of the step) and
    # doubles peak memory.  Instead, edge tiles DMA their own halo images
    # straight from the output scratch: periodic-x wraps are 2-wide
    # x-slabs (major dim - no alignment constraint), periodic-y wraps are
    # 8-row slabs whose extra rows land in the junk band (rows 0..5 /
    # >= Y+10 are never consumed), corners combine both.  NON-periodic
    # halos need no maintenance at all: the kernel already edge-replicates
    # out-of-domain layers from interior values (_edge_rep/_edge_rep2), so
    # the input halo contents on those axes are don't-care.
    halo_in_kernel = bool(halo_in_kernel) and not prepadded
    if half and periodic[1]:
        # the y-slab destinations (sublane offsets 0 / Y+8) are 8- but not
        # 16-aligned; 16-bit DMAs need the 16 granule - keep the XLA fill
        halo_in_kernel = False
    halo_x = halo_in_kernel and bool(periodic[0])
    halo_y = halo_in_kernel and bool(periodic[1])

    def vmem_bytes(tx, ty, k):
        per_tile = (Q * (tx + 4) * (ty + 16) * s_item       # f window
                    + (tx + 4) * (ty + 16) * m_item         # map window
                    + Q * tx * (ty + oy0) * s_item          # interior out
                    + 4 * tx * ty * itemsize)               # rho + u
        return k * per_tile * Zp

    try:
        tx, ty, K = _fit_tiles_vmem(
            vmem_bytes, tile, tiles_per_program, X, Y,
            budget_bytes=min(MOSAIC_SCRATCH_BUDGET,
                             int(vmem_limit_mb * 0.85 * 1e6)),
            ty_align=16 if (half and not interpret) else 8)
    except AssertionError:
        raise ValueError(
            f"half storage needs a tile height that is a multiple of 16 "
            f"(16-bit DMA sublane granularity); Y={Y} has no such divisor")
    wx, wy = tx + 4, ty + 16  # window extents (x-origin 2, y-origin 8)
    txc, tyc = tx + 2, ty + 2  # odd ring extents
    nx_t, ny_t = X // tx, Y // ty
    n_tiles = nx_t * ny_t
    while K > 1 and n_tiles % K != 0:
        K -= 1
    n_prog = n_tiles // K

    if prepadded:
        map_pad = None  # each shard passes its own padded local map
    else:
        # static padded map, same layout/origins as the state
        map_pad = pad_map_pair2(domain.map, periodic, Zp).astype(map_np_dtype)

    # z-profile tile classification (static maps): a tile whose consumed
    # map rows [jt*ty+6, jt*ty+ty+10) x [i*tx, i*tx+wx) are constant over
    # (x, y) needs no map window at all - its masks rebuild from a shared
    # [Zp] profile vector.  cls[tau] = 0 (generic) or 1 + profile index.
    zprof_cls = None
    zprof_profiles = None
    if zprofile and map_pad is not None:
        mp_arr = np.asarray(map_pad, np.int32)
        cls = np.zeros(n_tiles, np.int32)
        prof_key: dict = {}
        prof_list: list = []
        for tau in range(n_tiles):
            i, jt = tau // ny_t, tau % ny_t
            R = mp_arr[i * tx : i * tx + wx, jt * ty + 6 : jt * ty + ty + 10, :]
            if not (R == R[0:1, 0:1, :]).all():
                continue
            key = R[0, 0].tobytes()
            if key not in prof_key:
                if len(prof_list) >= 4:
                    continue  # cap the select chain; tile stays generic
                prof_key[key] = len(prof_list)
                prof_list.append(R[0, 0])
            cls[tau] = 1 + prof_key[key]
        if cls.any():
            zprof_cls = cls
            # [n_prof, 8, Zp]: 8 sublanes for VMEM tiling friendliness
            zprof_profiles = np.ascontiguousarray(np.broadcast_to(
                np.stack(prof_list)[:, None, :], (len(prof_list), 8, Zp)
            ).astype(np.int32))
    use_zprof = zprof_cls is not None
    n_prof = 0 if not use_zprof else zprof_profiles.shape[0]

    def kernel(*args):
        if use_zprof:
            (params_ref, cls_ref, fpad_hbm, mp_hbm, prof_ref,
             fout_ref, rho_ref, u_ref, *rest) = args
        else:
            params_ref, fpad_hbm, mp_hbm, fout_ref, rho_ref, u_ref, *rest = args
            cls_ref = prof_ref = None
        fscr = rest[:K]
        mscr = rest[K : 2 * K]
        outs = rest[2 * K : 3 * K]
        rscr = rest[3 * K : 4 * K]
        uscr = rest[4 * K : 5 * K]
        sem = rest[5 * K]
        p = pl.program_id(0)

        def tile_ij(tau):
            return tau // ny_t, tau % ny_t

        def in_dma_f(tau, t):
            i, jt = tile_ij(tau)
            if window == "tight":
                # congruent-offset copy of exactly the consumed rows
                # (src % 8 == dst % 8 == 6); head/tail scratch rows stale
                return pltpu.make_async_copy(
                    fpad_hbm.at[:, pl.ds(i * tx, wx),
                                pl.ds(jt * ty + 6, ty + 4), :],
                    fscr[t].at[:, :, 6 : ty + 10, :], sem.at[t, 0],
                )
            return pltpu.make_async_copy(
                fpad_hbm.at[:, pl.ds(i * tx, wx), pl.ds(jt * ty, wy), :],
                fscr[t], sem.at[t, 0],
            )

        def in_dma_m(tau, t):
            i, jt = tile_ij(tau)
            if window == "tight":
                return pltpu.make_async_copy(
                    mp_hbm.at[pl.ds(i * tx, wx),
                              pl.ds(jt * ty + 6, ty + 4), :],
                    mscr[t].at[:, 6 : ty + 10, :], sem.at[t, 1],
                )
            return pltpu.make_async_copy(
                mp_hbm.at[pl.ds(i * tx, wx), pl.ds(jt * ty, wy), :],
                mscr[t], sem.at[t, 1],
            )

        def start_inputs(tau, t):
            in_dma_f(tau, t).start()
            if use_zprof:
                @pl.when(cls_ref[tau] == 0)
                def _():
                    in_dma_m(tau, t).start()
            else:
                in_dma_m(tau, t).start()

        def wait_inputs(tau, t):
            in_dma_f(tau, t).wait()
            if use_zprof:
                @pl.when(cls_ref[tau] == 0)
                def _():
                    in_dma_m(tau, t).wait()
            else:
                in_dma_m(tau, t).wait()

        def out_dmas(tau, t):
            i, jt = tile_ij(tau)
            src = outs[t].at[:, :, oy0 : oy0 + ty, :] if half else outs[t]
            ds = [pltpu.make_async_copy(
                src,
                fout_ref.at[:, pl.ds(2 + i * tx, tx), pl.ds(8 + jt * ty, ty), :],
                sem.at[t, 2],
            )]
            if with_macro:
                ds.append(pltpu.make_async_copy(
                    rscr[t],
                    rho_ref.at[pl.ds(i * tx, tx), pl.ds(jt * ty, ty), :],
                    sem.at[t, 3],
                ))
                ds.append(pltpu.make_async_copy(
                    uscr[t],
                    u_ref.at[:, pl.ds(i * tx, tx), pl.ds(jt * ty, ty), :],
                    sem.at[t, 4],
                ))
            return ds

        def halo_dmas(tau, t):
            """(condition, copy) pairs writing this tile's periodic halo
            images of the pair output.  Start and wait run under the SAME
            conditions, so semaphore counts always match."""
            i, jt = tile_ij(tau)
            src = outs[t]
            ds = []
            if halo_x:
                ds.append((i == nx_t - 1, pltpu.make_async_copy(
                    src.at[:, tx - 2 : tx, oy0 : oy0 + ty, :],
                    fout_ref.at[:, 0:2, pl.ds(8 + jt * ty, ty), :],
                    sem.at[t, hsem])))
                ds.append((i == 0, pltpu.make_async_copy(
                    src.at[:, 0:2, oy0 : oy0 + ty, :],
                    fout_ref.at[:, X + 2 : X + 4, pl.ds(8 + jt * ty, ty), :],
                    sem.at[t, hsem])))
            if halo_y:
                ds.append((jt == ny_t - 1, pltpu.make_async_copy(
                    src.at[:, :, oy0 + ty - 8 : oy0 + ty, :],
                    fout_ref.at[:, pl.ds(2 + i * tx, tx), 0:8, :],
                    sem.at[t, hsem])))
                ds.append((jt == 0, pltpu.make_async_copy(
                    src.at[:, :, oy0 : oy0 + 8, :],
                    fout_ref.at[:, pl.ds(2 + i * tx, tx), Y + 8 : Y + 16, :],
                    sem.at[t, hsem])))
            if halo_x and halo_y:
                # corners: wrap x then wrap y (matches _fill_halos_pad8's
                # x-first ordering)
                ds.append(((i == nx_t - 1) & (jt == ny_t - 1),
                           pltpu.make_async_copy(
                    src.at[:, tx - 2 : tx, oy0 + ty - 8 : oy0 + ty, :],
                    fout_ref.at[:, 0:2, 0:8, :], sem.at[t, hsem])))
                ds.append(((i == nx_t - 1) & (jt == 0),
                           pltpu.make_async_copy(
                    src.at[:, tx - 2 : tx, oy0 : oy0 + 8, :],
                    fout_ref.at[:, 0:2, Y + 8 : Y + 16, :], sem.at[t, hsem])))
                ds.append(((i == 0) & (jt == ny_t - 1),
                           pltpu.make_async_copy(
                    src.at[:, 0:2, oy0 + ty - 8 : oy0 + ty, :],
                    fout_ref.at[:, X + 2 : X + 4, 0:8, :], sem.at[t, hsem])))
                ds.append(((i == 0) & (jt == 0), pltpu.make_async_copy(
                    src.at[:, 0:2, oy0 : oy0 + 8, :],
                    fout_ref.at[:, X + 2 : X + 4, Y + 8 : Y + 16, :],
                    sem.at[t, hsem])))
            return ds

        def start_halo(tau, t):
            for cond, d in halo_dmas(tau, t):
                @pl.when(cond)
                def _(d=d):
                    d.start()

        def wait_halo(tau, t):
            for cond, d in halo_dmas(tau, t):
                @pl.when(cond)
                def _(d=d):
                    d.wait()

        # warm-up: the first program starts its own input DMAs; every later
        # program's inputs were prefetched by its predecessor
        @pl.when(p == 0)
        def _():
            for t in range(K):
                if _debug_dma == "none":
                    for d in (in_dma_f(t, t), in_dma_m(t, t)):
                        d.start()
                        d.wait()
                else:
                    start_inputs(t, t)

        for t in range(K):
            tau = p * K + t

            # slot t's previous output DMA (started by program p-1) must
            # land before outs/rscr/uscr are overwritten
            if _debug_dma == "full":
                @pl.when(p > 0)
                def _(t=t, tau=tau):
                    for d in out_dmas(tau - K, t):
                        d.wait()
                    wait_halo(tau - K, t)

                wait_inputs(tau, t)
            scratch = fscr[t]
            m_win = mscr[t][...]
            if map_mode != "i32":
                m_win = m_win.astype(jnp.int32)
            if use_zprof:
                # synthesize the map window for z-profile tiles (their
                # scratch holds stale rows - the map DMA was skipped)
                cls = cls_ref[tau]
                pidx = jnp.maximum(cls - 1, 0)
                prof = prof_ref[0, 0:1, :][None]  # [1, 1, Zp]
                for kp in range(1, n_prof):
                    prof = jnp.where(pidx == kp,
                                     prof_ref[kp, 0:1, :][None], prof)
                m_win = jnp.where(cls == 0, m_win, prof)
            i, jt = tile_ij(tau)

            # ---- even pass on the y-band the odd pass consumes ----
            # needed: rows [6, ty+10) of the window.  "sub" computes exactly
            # that band (fewest sites, but the sublane offset 6 misaligns
            # every cascade op); "aligned" computes [0, ty+10) (start at
            # sublane 0, ragged end - ~17% more cascade sites but aligned
            # vector ops, measured faster on v5e)
            yb = 0 if even_band in ("aligned", "full") else 6  # band start
            ybe = wy if even_band == "full" else ty + 10  # band end (excl.)

            def shifted_e(q, offs, scratch=scratch):
                del offs  # same-site read (streaming_AA.h:16-45)
                v = scratch[q, :, yb:ybe, :]
                # half storage: widen once at consumption; all arithmetic
                # downstream runs in the compute dtype
                return v.astype(dtype) if half else v

            m_sub = m_win[:, yb:ybe, :]
            even_out, _, _ = _stream_bc_collide(
                lat, cfg_ab, codes, sym_codes, eq_kind, do_coll_codes, dtype,
                shifted_e, m_sub, params_ref, out_perm=opp,
            )
            ev = [even_out[q] for q in range(Q)]

            # out-of-domain band layers <- edge replication of the even
            # output (what the two-kernel pair's halo fill would produce);
            # in band coords the used halo rows are 6-yb..7-yb, the first
            # in-domain row is 8-yb
            if not periodic[0]:
                lo = (i == 0) & (params_ref[8] > 0)
                hi = (i == nx_t - 1) & (params_ref[9] > 0)
                ev = [_edge_rep2(v, 0, lo, hi, 2, wx - 3, 2, 2) for v in ev]
            if not periodic[1]:
                lo = (jt == 0) & (params_ref[10] > 0)
                hi = (jt == ny_t - 1) & (params_ref[11] > 0)
                if yb == 6:
                    ev = [_edge_rep2(v, 1, lo, hi, 2, ty + 1, 2, 2) for v in ev]
                else:
                    # rows 6,7 <- row 8; rows ty+8,ty+9 <- row ty+7 (rows
                    # 0..5 are junk the ring never reads)
                    ev2 = []
                    for v in ev:
                        l = jnp.where(lo, jnp.concatenate([v[:, 8:9]] * 2, 1),
                                      v[:, 6:8])
                        h = jnp.where(hi,
                                      jnp.concatenate([v[:, ty + 7 : ty + 8]] * 2, 1),
                                      v[:, ty + 8 : ty + 10])
                        ev2.append(jnp.concatenate([v[:, :6], l, v[:, 8 : ty + 8], h], 1))
                    ev = ev2

            # ---- odd pass on the 1-halo ring of the even output ----
            yr = 7 - yb  # ring y origin in band coords

            def shifted_o(q, offs):
                ox, oy, oz = offs
                qo = int(opp[q])
                base = ev[qo][1 + ox : 1 + ox + txc, yr + oy : yr + oy + tyc, :]
                return _zshift(base, oz, Z, periodic_z)

            m_ring = m_win[1 : 1 + txc, 7 : 7 + tyc, :]
            f_post, rho_ring, u_ring = _stream_bc_collide(
                lat, cfg_ab, codes, sym_codes, eq_kind, do_coll_codes, dtype,
                shifted_o, m_ring, params_ref, defer_nothing=True,
            )

            post = [f_post[q] for q in range(Q)]
            if not periodic[0]:
                lo = (i == 0) & (params_ref[8] > 0)
                hi = (i == nx_t - 1) & (params_ref[9] > 0)
                post = [_edge_rep(v, 0, lo, hi) for v in post]
            if not periodic[1]:
                lo = (jt == 0) & (params_ref[10] > 0)
                hi = (jt == ny_t - 1) & (params_ref[11] > 0)
                post = [_edge_rep(v, 1, lo, hi) for v in post]
            if z_halo and not periodic_z:
                zlo = params_ref[12] > 0
                zhi = params_ref[13] > 0
                post = [_edge_rep_z(v, zlo, zhi, z_halo, Z - z_halo - 1)
                        for v in post]

            rows = []
            for q in range(Q):
                cx, cy, cz = (int(v) for v in lat.c[q])
                base = post[q][1 - cx : 1 - cx + tx, 1 - cy : 1 - cy + ty, :]
                rows.append(_zshift(base, -cz, Z, periodic_z))
            pushed = jnp.stack(rows)

            if GEO.NOTHING in codes:
                # the stored field between the parities is the even output
                m_int = m_ring[1 : 1 + tx, 1 : 1 + ty, :]
                center = jnp.stack(
                    [ev[q][2 : 2 + tx, 8 - yb : 8 - yb + ty, :] for q in range(Q)])
                pushed = jnp.where(m_int == int(GEO.NOTHING), center, pushed)

            if half:
                # narrow on the interior write (the only HBM store of f)
                outs[t][:, :, oy0 : oy0 + ty, :] = pushed.astype(store)
            else:
                outs[t][...] = pushed
            if with_macro:
                rscr[t][...] = rho_ring[1 : 1 + tx, 1 : 1 + ty, :]
                uscr[t][...] = u_ring[:, 1 : 1 + tx, 1 : 1 + ty, :]
            if _debug_dma == "full":
                for d in out_dmas(tau, t):
                    d.start()
                start_halo(tau, t)

                # slot t is free: prefetch the next program's slot-t tile so
                # its input DMA overlaps this program's remaining compute
                @pl.when(p + 1 < n_prog)
                def _(t=t, tau=tau):
                    start_inputs(tau + K, t)

        @pl.when(p == n_prog - 1)
        def _():
            for t in range(K):
                for d in out_dmas(p * K + t, t):
                    if _debug_dma == "none":
                        d.start()
                    d.wait()
                if _debug_dma == "none":
                    start_halo(p * K + t, t)
                wait_halo(p * K + t, t)

    n_sems = 5 if with_macro else 3
    hsem = n_sems
    if halo_x or halo_y:
        n_sems += 1
    dummy_scr = (1, 8, 128)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if use_zprof:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # cls
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if use_zprof:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # profiles
    call = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # fpad_new via manual DMA
            pl.BlockSpec(memory_space=pl.ANY),  # rho via manual DMA
            pl.BlockSpec(memory_space=pl.ANY),  # u via manual DMA
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, X + 4, Y + 16, Zp), store),
            jax.ShapeDtypeStruct((X, Y, Zp) if with_macro else dummy_scr, dtype),
            jax.ShapeDtypeStruct(((3, X, Y, Zp) if with_macro else (3,) + dummy_scr), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((Q, wx, wy, Zp), store) for _ in range(K)]
        + [pltpu.VMEM((wx, wy, Zp), map_jnp_dtype) for _ in range(K)]
        + [pltpu.VMEM((Q, tx, ty + oy0, Zp), store) for _ in range(K)]
        + [pltpu.VMEM((tx, ty, Zp) if with_macro else dummy_scr, dtype) for _ in range(K)]
        + [pltpu.VMEM((3, tx, ty, Zp) if with_macro else (3,) + dummy_scr, dtype)
           for _ in range(K)]
        + [pltpu.SemaphoreType.DMA((K, n_sems))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024),
    )

    cls_const = None if not use_zprof else jnp.asarray(zprof_cls)
    prof_const = None if not use_zprof else jnp.asarray(zprof_profiles)

    def pair(fpad, nu, u_in=None, force=None, map_pad_in=None, bflags=None):
        flags = (jnp.ones((6,), dtype) if bflags is None
                 else jnp.asarray(bflags, dtype).reshape(-1))
        flags = jnp.concatenate([flags, jnp.ones((6 - flags.shape[0],), dtype)])
        params = jnp.concatenate([_params_vec(dtype, nu, u_in, force), flags])
        if map_pad_in is None:
            mp_in = map_pad
        elif Zp != Z and map_pad_in.shape[-1] == Z:
            mp_in = jnp.pad(map_pad_in, [(0, 0), (0, 0), (0, Zp - Z)],
                            mode="edge")
        else:
            mp_in = map_pad_in
        if use_zprof:
            fpad_new, rho, u = call(params, cls_const, fpad, mp_in, prof_const)
        else:
            fpad_new, rho, u = call(params, fpad, mp_in)
        if not prepadded and not halo_in_kernel:
            # halos for the NEXT pair; the distributed wrapper exchanges
            # them with ppermute before each call instead.  With
            # halo_in_kernel the periodic images were DMA'd by the edge
            # tiles and non-periodic halos are don't-care (in-kernel edge
            # replication) - no XLA-level copy at all.
            fpad_new = _fill_halos_pad8(fpad_new, periodic, X, Y, Z, Q)
        if not with_macro:
            return fpad_new, None, None
        return fpad_new, rho[..., :Z], u[..., :Z]

    # diagnostics for tests / the autotune log: how many tiles ride the
    # z-profile fast path (skip their map DMA), and the final geometry
    pair.tile = (tx, ty)
    pair.tiles_per_program = K
    pair.n_tiles = n_tiles
    pair.zprof_tiles = 0 if not use_zprof else int((zprof_cls != 0).sum())
    pair.n_profiles = n_prof
    pair.store_dtype = store
    pair.halo_in_kernel = halo_in_kernel
    return pair


def make_fused_pair_aa(cfg: LBMConfig, domain: Domain,
                       tile_even=(8, 16), k_even: int = 4,
                       tile_odd=(8, 32), k_odd: int = 3,
                       with_macro: bool = True):
    """Persistent-pad A-A pair: ``pair(f, nu, u_in, force) -> (f2, rho, u)``
    advances TWO lattice steps (even then odd) with one dispatch.

    The even kernel writes its output directly into the odd kernel's padded
    layout [Q, X+4, Y+16, Z] (x-origin 2, y-origin 8 - manual output DMA
    needs the 8-aligned Y origin), so the odd step's separate pad pass
    (read f + write fpad, ~2 full passes) disappears; only thin halo-layer
    fills remain between the kernels.  Macro outputs come from the odd
    (second) step.
    """
    assert cfg.streaming == "AA"
    cfg_ab = dataclasses.replace(cfg, streaming="AB")
    lat, codes, sym_codes, eq_kind, do_coll_codes = _prep(cfg_ab, domain)
    if GEO.OUTFLOW_RIGHT_INTERP in codes:
        raise NotImplementedError("OUTFLOW_RIGHT_INTERP requires the A-B pattern")
    Q = lat.Q
    X, Y, Z = domain.shape
    dtype = cfg.compute_dtype
    periodic = domain.periodic
    periodic_z = bool(periodic[2])
    opp = np.asarray(lat.opp)
    interpret = jax.default_backend() == "cpu"
    if _lane_pad(Z, interpret) != Z:
        raise NotImplementedError(
            "make_fused_pair_aa (two-kernel pair) requires Z % 128 == 0 on "
            "TPU (the even kernel's manual output DMA); use "
            "make_fused_pair2_aa or make_fused_step_aa for other extents")
    map_arr = np.asarray(domain.map, np.int32)
    map_ring = _pad_map_ring(map_arr, periodic)

    # ------------------------------------------------- even (writes fpad)
    ex = _fit_tile(tile_even[0], X)
    ey = _fit_tile(tile_even[1], Y, align=8)
    K = k_even
    while K > 1 and Y % (ey * K) != 0:
        K -= 1
    eyK = ey * K
    dummy = (8, 8, 128)

    def even_kernel(params_ref, map_ref, f_hbm, fpad_out, rho_ref, u_ref, *rest):
        ins = rest[:K]
        outs = rest[K : 2 * K]
        sem = rest[2 * K]
        i = pl.program_id(0)
        j = pl.program_id(1)

        din = []
        for t in range(K):
            jt = j * K + t
            d = pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(i * ex, ex), pl.ds(jt * ey, ey), :],
                ins[t], sem.at[t, 0],
            )
            d.start()
            din.append(d)

        dout = []
        for t in range(K):
            jt = j * K + t
            din[t].wait()
            scr = ins[t]

            def shifted(q, offs, scr=scr):
                del offs  # same-site read (streaming_AA.h:16-45)
                return scr[q]

            m = map_ref[:, t * ey : (t + 1) * ey, :]
            f_post, rho_out, u_out = _stream_bc_collide(
                lat, cfg_ab, codes, sym_codes, eq_kind, do_coll_codes, dtype,
                shifted, m, params_ref, out_perm=opp,
            )
            outs[t][...] = f_post
            # interior write at fpad origin (2, 8): both offsets DMA-legal
            # (x free, y 8-aligned)
            d = pltpu.make_async_copy(
                outs[t],
                fpad_out.at[:, pl.ds(2 + i * ex, ex), pl.ds(8 + jt * ey, ey), :],
                sem.at[t, 1],
            )
            d.start()
            dout.append(d)
            if with_macro:
                rho_ref[:, t * ey : (t + 1) * ey, :] = rho_out
                u_ref[:, :, t * ey : (t + 1) * ey, :] = u_out
        for d in dout:
            d.wait()

    even_call = pl.pallas_call(
        even_kernel,
        grid=(X // ex, Y // eyK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ex, eyK, Z), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # f stays in HBM
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # fpad written by manual DMA
            pl.BlockSpec((ex, eyK, Z) if with_macro else dummy,
                         (lambda i, j: (i, j, 0)) if with_macro else (lambda i, j: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ex, eyK, Z) if with_macro else (3,) + dummy,
                         (lambda i, j: (0, i, j, 0)) if with_macro else (lambda i, j: (0, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, X + 4, Y + 16, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z) if with_macro else dummy, dtype),
            jax.ShapeDtypeStruct((3, X, Y, Z) if with_macro else (3,) + dummy, dtype),
        ),
        scratch_shapes=[pltpu.VMEM((Q, ex, ey, Z), dtype) for _ in range(2 * K)]
        + [pltpu.SemaphoreType.DMA((K, 2))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def _fill_halos(fpad):
        """Fill the 2 halo layers on each side (x first, then y, so corners
        match _pad_aa_odd's sequential pad+wrap semantics)."""
        if periodic[0]:
            fpad = fpad.at[:, 0:2].set(fpad[:, X : X + 2])
            fpad = fpad.at[:, X + 2 : X + 4].set(fpad[:, 2:4])
        else:
            fpad = fpad.at[:, 0:2].set(jnp.broadcast_to(
                fpad[:, 2:3], (Q, 2) + fpad.shape[2:]))
            fpad = fpad.at[:, X + 2 : X + 4].set(jnp.broadcast_to(
                fpad[:, X + 1 : X + 2], (Q, 2) + fpad.shape[2:]))
        if periodic[1]:
            fpad = fpad.at[:, :, 6:8].set(fpad[:, :, Y + 6 : Y + 8])
            fpad = fpad.at[:, :, Y + 8 : Y + 10].set(fpad[:, :, 8:10])
        else:
            fpad = fpad.at[:, :, 6:8].set(jnp.broadcast_to(
                fpad[:, :, 8:9], fpad.shape[:2] + (2, Z)))
            fpad = fpad.at[:, :, Y + 8 : Y + 10].set(jnp.broadcast_to(
                fpad[:, :, Y + 7 : Y + 8], fpad.shape[:2] + (2, Z)))
        return fpad

    odd_call, *_ = _build_odd_call(
        lat, cfg_ab, codes, sym_codes, eq_kind, do_coll_codes, dtype,
        periodic, periodic_z, X, Y, Z, tile_odd, k_odd,
        with_macro, interpret, y_org=8,
    )

    def pair(f, nu, u_in=None, force=None):
        params = jnp.concatenate([
            _params_vec(dtype, nu, u_in, force), jnp.ones((4,), dtype)])
        fpad, rho_e, u_e = even_call(params, map_arr, f)
        fpad = _fill_halos(fpad)
        f2, rho, u = odd_call(params, fpad, map_ring)
        if not with_macro:
            return f2, None, None
        return f2, rho, u

    return pair
