"""Single-kernel non-Newtonian LBM step: u* + strain-rate + forcing + collide.

Round-3 measured the hooked pipeline (kernels/hooked.py: Pallas u* pre-pass
-> single-kernel Pallas NN forcing -> force-field fused kernel) at ~3x the
per-step cost of the pure kernel; the remaining overhead is structural - the
DF field is read twice (u* pass + main kernel) and rho/u/force make two full
HBM round trips between the three kernels.

This module collapses the whole hooked non-Newtonian step into ONE Pallas
program per parity (the reference needs three CUDA kernels for the same
step: cudaLBMComputeVelocitiesStarAndZeroForce, cudaLBMKernelStress + the
forcing pass, and the main kernel - reference nonNewtonian.h:216-391,
kernels.h:178-218).  Each grid tile:

1. DMAs ONE haloed DF window (3 sites of halo for A-B: 1 for the pull + 2
   for the stencils), the map window and the static fluid-mask window;
2. evaluates the streamed + BC-transformed u* moments on the tile + 2 ring
   entirely in registers (the u* pre-pass, reference kernels.h:178-218);
3. runs the wall-aware strain-rate tensor on the tile + 1 ring, the
   rheology model (Carreau-Yasuda / Casson) and the wall-aware divergence
   (reference nonNewtonian.h:274-391, 690-788);
4. adjusts u by the half-force and runs the full collision cascade;
5. writes the post-collision tile (and rho/u) once.

HBM traffic per step: one haloed DF read + one DF write + rho/u - the
rho/u/force intermediate fields never leave VMEM.  Semantics match the
three-phase pipeline (and therefore sim/step.py's hooked XLA step) to fp
tolerance; regression-tested in tests/test_fused_nn_step.py.

Supported: D3Q27, A-B and both A-A parities, homogeneous-vector body
force, single chip (the distributed hooked path stays on the three-phase
pipeline, kernels/hooked.py).  The non-Newtonian stencil periodicity must
equal the domain periodicity on x/y (pass ``periodic=domain.periodic`` to
``make_nn_forcing_hook``, as its docstring directs) - mixed semantics fall
back to the pipeline.
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
    _fit_tiles_vmem,
    _lane_pad,
    _moments_local,
    _params_vec,
    _prep,
    _pull_transform,
    _stream_bc_collide,
    _zshift,
)
from tnl_lbm_tpu.kernels.fused_aa import _edge_rep
from tnl_lbm_tpu.sim.config import Domain, LBMConfig


def supports(cfg, domain: Domain, nn_periodic) -> bool:
    """True when the single-kernel NN step can replace the pipeline."""
    from tnl_lbm_tpu.kernels import fused as fused_mod

    per = (tuple(bool(p) for p in nn_periodic) if nn_periodic is not None
           else (False, False, False))
    if per[:2] != tuple(bool(p) for p in domain.periodic[:2]):
        return False  # stencil wrap differs from the DF pad wrap on x/y
    if cfg.lat.D != 3 or cfg.streaming not in ("AB", "AA"):
        return False
    if not fused_mod.supports(domain, streaming=cfg.streaming):
        return False
    return True


# ---------------------------------------------------------------- padding

def _pad_xy_jnp(arr, periodic, x_lo, x_hi, y_lo, y_hi, extra_z=0):
    """Edge-replicate pad of the trailing [X, Y, Z] axes by the given halo
    widths, with the periodic axes' halo layers overwritten by wrapped
    values.  ``extra_z`` appends junk lanes up to the 128-multiple."""
    nd = arr.ndim
    X, Y = arr.shape[-3], arr.shape[-2]
    pads = [(0, 0)] * (nd - 3) + [(x_lo, x_hi), (y_lo, y_hi), (0, extra_z)]
    out = jnp.pad(arr, pads, mode="edge")
    idx = [slice(None)] * nd
    src = [slice(None)] * nd
    if periodic[0]:
        idx[-3] = slice(0, x_lo)
        src[-3] = slice(X, X + x_lo)
        out = out.at[tuple(idx)].set(out[tuple(src)])
        idx[-3] = slice(X + x_lo, X + 2 * x_lo)
        src[-3] = slice(x_lo, 2 * x_lo)
        out = out.at[tuple(idx)].set(out[tuple(src)])
        idx[-3] = slice(None)
        src[-3] = slice(None)
    if periodic[1]:
        idx[-2] = slice(0, y_lo)
        src[-2] = slice(Y, Y + y_lo)
        out = out.at[tuple(idx)].set(out[tuple(src)])
        idx[-2] = slice(Y + y_lo, Y + 2 * y_lo)
        src[-2] = slice(y_lo, 2 * y_lo)
        out = out.at[tuple(idx)].set(out[tuple(src)])
    return out


def _pad_xy_np(arr, periodic, x_lo, x_hi, y_lo, y_hi, extra_z=0):
    """NumPy twin of :func:`_pad_xy_jnp` for the static map/mask pads.
    Periodic wrap copies only the ``x_lo``/``y_lo``-wide layers (the extra
    high-side rows stay edge junk - they are never consumed)."""
    nd = arr.ndim
    X, Y = arr.shape[-3], arr.shape[-2]
    pads = [(0, 0)] * (nd - 3) + [(x_lo, x_hi), (y_lo, y_hi), (0, extra_z)]
    out = np.pad(arr, pads, mode="edge")
    if periodic[0]:
        out[..., 0:x_lo, :, :] = out[..., X:X + x_lo, :, :]
        out[..., X + x_lo:X + 2 * x_lo, :, :] = out[..., x_lo:2 * x_lo, :, :]
    if periodic[1]:
        out[..., :, 0:y_lo, :] = out[..., :, Y:Y + y_lo, :]
        out[..., :, Y + y_lo:Y + 2 * y_lo, :] = out[..., :, y_lo:2 * y_lo, :]
    return out


def _rep_lo_hi(v, axis, lo_bad, hi_bad):
    """Replace layers with out-of-domain global coordinates (``g < 0`` /
    ``g > N-1``, per the iota array ``g``) by the adjacent interior layer -
    the in-register analog of a 1-halo edge-replicate pad."""
    if axis == 0:
        down = jnp.concatenate([v[1:], v[-1:]], axis=0)
        up = jnp.concatenate([v[:1], v[:-1]], axis=0)
    else:
        down = jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)
        up = jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)
    return jnp.where(lo_bad, down, jnp.where(hi_bad, up, v))


# ---------------------------------------------------------------- builder

def make_fused_nn_step(cfg: LBMConfig, domain: Domain, model, nn_periodic,
                       tile=None, tiles_per_program: int = 2,
                       with_macro: bool = True,
                       prepadded: bool = False, local_shape=None,
                       vmem_budget: int | None = None):
    """Single-kernel non-Newtonian step.

    ``step(f, nu, u_in=None, force=None, parity=0) -> (f_new, rho, u)``
    matching ``sim.step.make_step`` with
    ``forcing_hook=make_nn_forcing_hook(model, periodic=nn_periodic)`` to
    fp tolerance.  ``force`` must be a homogeneous [3] vector (or None).

    ``prepadded=True`` (the sharded path, round 3): ``step`` takes a
    MASTER-haloed input ([Q, X+8, Y+16, Z]: 4-wide x / 8-wide y, the
    maximum over the three modes) plus matching runtime map/fluid-mask
    pads and per-shard boundary-owner ``bflags``; each mode slices its
    own window layout from the master pad.  The in-kernel edge fixes
    (u*/S replication at non-periodic boundaries) gate on the bflags, so
    seam halos carrying real neighbor data are left untouched.
    ``local_shape`` gives the per-shard interior extents.
    """
    assert cfg.forcing_hook is None or getattr(
        cfg.forcing_hook, "nn_model", None) is not None
    cfg_ab = dataclasses.replace(cfg, streaming="AB", forcing_hook=None)
    lat, codes, sym_codes, eq_kind, do_coll_codes = _prep(cfg_ab, domain)
    if cfg.streaming == "AA" and GEO.OUTFLOW_RIGHT_INTERP in codes:
        raise NotImplementedError("OUTFLOW_RIGHT_INTERP requires A-B")
    Q = lat.Q
    opp = np.asarray(lat.opp)
    X, Y, Z = local_shape if local_shape is not None else domain.shape
    dtype = cfg.compute_dtype
    periodic = tuple(bool(p) for p in domain.periodic)
    per = (tuple(bool(p) for p in nn_periodic) if nn_periodic is not None
           else (False, False, False))
    assert per[:2] == periodic[:2], \
        "single-kernel NN step needs stencil wrap == domain wrap on x/y"
    periodic_z = periodic[2]
    nn_periodic_z = bool(per[2])
    interpret = jax.default_backend() == "cpu"
    Zp = _lane_pad(Z, interpret)
    itemsize = jnp.dtype(dtype).itemsize
    map_np = np.asarray(domain.map, np.int32)

    if tile is None:
        tile = (8, 16)

    def build_call(mode: str):
        """mode: 'ab' | 'even' | 'odd'.  Geometry per mode:

        ==== ============= ========== =========== =================
        mode collision rgn f halo     pad origins in-window origins
        ==== ============= ========== =========== =================
        ab   tile          3 (pull+2) x 3, y 3    coll (3,3) u (1,1)
        even tile          2 (stencil) x 2, y 4   coll (2,4) u (0,2)
        odd  tile+2 ring   4 (pull+3) x 4, y 8    coll (3,7) u (1,5)
        ==== ============= ========== =========== =================

        The y windows are 8-row aligned: window start jt*ty covers interior
        rows [jt*ty - y_org, jt*ty + ty + (pad_hi - y_org)).
        """
        if mode == "ab":
            x_org, y_org, ring = 3, 3, 0
        elif mode == "even":
            x_org, y_org, ring = 2, 4, 0
        else:
            x_org, y_org, ring = 4, 8, 1
        # window extents: x = tx + 2*x_org, y = ty + y_org + pad_hi where
        # pad_hi keeps the row count a multiple of 8
        def wx(tx):
            return tx + 2 * x_org

        def wy(ty):
            raw = ty + 2 * y_org
            return -(-raw // 8) * 8

        def vmem_bytes(tx, ty, K):
            scr = K * (Q + 1) * wx(tx) * wy(ty) * Zp * itemsize
            ncx, ncy = tx + 2 * ring, ty + 2 * ring
            # in-register temporaries Mosaic keeps live: f_in on the u
            # region + 6 S components + 3 u on the extended regions
            tmp = (Q * (ncx + 4) * (ncy + 4) + 9 * (ncx + 4) * (ncy + 4)) \
                * Zp * itemsize
            out_ch = Q + (4 if with_macro else 0)
            bspec = 2 * tx * ty * K * out_ch * Z * itemsize
            return scr + tmp // 2 + bspec

        tx, ty, K = _fit_tiles_vmem(
            vmem_bytes, tile, tiles_per_program, X, Y,
            budget_bytes=(vmem_budget if vmem_budget is not None
                          else MOSAIC_SCRATCH_BUDGET))
        assert X % tx == 0 and Y % (ty * K) == 0 and ty % 8 == 0, \
            (X, Y, tile, tx, ty, K)
        fx, fy = wx(tx), wy(ty)
        ncx, ncy = tx + 2 * ring, ty + 2 * ring     # collision region
        nux, nuy = ncx + 4, ncy + 4                 # u* region
        cx0, cy0 = x_org - ring, y_org - ring       # collision origin
        ux0, uy0 = cx0 - 2, cy0 - 2                 # u* region origin
        nx_t, ny_t = X // tx, Y // ty
        tyK = ty * K
        dummy = (8, 8, 128)

        if not prepadded:
            # static pad (domain-BC semantics; the fluid mask is derived
            # from the map IN-REGISTER below - its pad would share the same
            # wrap since per[:2] == periodic[:2], so mask == (map == FLUID)
            # holds on the halo layers too)
            map_pad = _pad_xy_np(map_np, periodic, x_org, x_org,
                                 y_org, fy - ty - y_org, extra_z=Zp - Z)

        def kernel(params_ref, fpad_hbm, mp_hbm, fout_ref,
                   rho_ref, u_ref, *rest):
            fscr = rest[:K]
            mscr = rest[K:2 * K]
            sem = rest[2 * K]
            i = pl.program_id(0)
            j = pl.program_id(1)

            dmas = []
            for t in range(K):
                jt = j * K + t
                d1 = pltpu.make_async_copy(
                    fpad_hbm.at[:, pl.ds(i * tx, fx), pl.ds(jt * ty, fy), :],
                    fscr[t], sem.at[t, 0])
                d2 = pltpu.make_async_copy(
                    mp_hbm.at[pl.ds(i * tx, fx), pl.ds(jt * ty, fy), :],
                    mscr[t], sem.at[t, 1])
                for d in (d1, d2):
                    d.start()
                dmas.append((d1, d2))

            for t in range(K):
                jt = j * K + t
                for d in dmas[t]:
                    d.wait()
                fw = fscr[t]
                mw = mscr[t]
                # fluid-mask window, derived in-register (saves the third
                # window DMA + K scratch buffers the round-3 kernel spent
                # on a mask that is a pure function of the map)
                kw = (mw[...] == int(GEO.FLUID)).astype(dtype)

                # ---- stage 1: u* on the extended region (nux, nuy) ----
                if mode == "even":
                    # even read: same site, same direction (streaming_AA.h:
                    # 16-45) - BC pull modifications are no-ops
                    def shifted_u(q, offs):
                        del offs
                        return fw[q, ux0:ux0 + nux, uy0:uy0 + nuy, :]
                elif mode == "odd":
                    def shifted_u(q, offs):
                        ox, oy, oz = offs
                        qo = int(opp[q])
                        base = fw[qo, ux0 + ox:ux0 + ox + nux,
                                  uy0 + oy:uy0 + oy + nuy, :]
                        return _zshift(base, oz, Z, periodic_z)
                else:
                    def shifted_u(q, offs):
                        ox, oy, oz = offs
                        base = fw[q, ux0 + ox:ux0 + ox + nux,
                                  uy0 + oy:uy0 + oy + nuy, :]
                        return _zshift(base, oz, Z, periodic_z)

                m_u = mw[ux0:ux0 + nux, uy0:uy0 + nuy, :]
                masks_u = {c: (m_u == int(c)) for c in codes}
                f_in_u = _pull_transform(lat, codes, sym_codes, shifted_u,
                                         masks_u)
                force_s = [params_ref[4], params_ref[5], params_ref[6]]
                rho_u, u_u = _moments_local(
                    lat, f_in_u, force_s, cfg.well,
                    high_precision=cfg.high_precision_rho)

                # iotas of global coordinates on the u region
                def giota(nx, ny, x_int0, y_int0):
                    gx = i * tx + x_int0 + jax.lax.broadcasted_iota(
                        jnp.int32, (nx, ny, Zp), 0)
                    gy = jt * ty + y_int0 + jax.lax.broadcasted_iota(
                        jnp.int32, (nx, ny, Zp), 1)
                    return gx, gy

                # non-periodic axes: out-of-domain u layers must equal the
                # boundary layer (the hook pads u with edge replication) -
                # fix the first out-of-domain layer; deeper layers only feed
                # S values that are themselves overwritten below.  The
                # boundary-owner flags (params[8:12]) keep the fix off
                # shard seams, whose halos carry REAL neighbor data.
                oxlo = params_ref[8] > 0
                oxhi = params_ref[9] > 0
                oylo = params_ref[10] > 0
                oyhi = params_ref[11] > 0
                gx_u, gy_u = giota(nux, nuy, ux0 - x_org, uy0 - y_org)
                u_fix = []
                for b in range(3):
                    v = u_u[b]
                    if not per[0]:
                        v = _rep_lo_hi(v, 0, (gx_u < 0) & oxlo,
                                       (gx_u > X - 1) & oxhi)
                    if not per[1]:
                        v = _rep_lo_hi(v, 1, (gy_u < 0) & oylo,
                                       (gy_u > Y - 1) & oyhi)
                    u_fix.append(v)

                # ---- stage 2: strain rate on the +1 ring (nsx, nsy) ----
                nsx, nsy = ncx + 2, ncy + 2
                sx0, sy0 = 1, 1  # origin within the u region

                def usl(b, ox, oy, oz, x0, y0, nx, ny):
                    base = u_fix[b][x0 + ox:x0 + ox + nx,
                                    y0 + oy:y0 + oy + ny, :]
                    return _zshift(base, oz, Z, nn_periodic_z)

                def fluid(ox, oy, oz, x0, y0, nx, ny):
                    # x0/y0 are offsets within the WINDOW here (mask slices
                    # come straight from the static pad)
                    base = kw[x0 + ox:x0 + ox + nx, y0 + oy:y0 + oy + ny, :]
                    return _zshift(base, oz, Z, nn_periodic_z) > 0.5

                def wall_aware(gp, gm, center, flp, flm):
                    fwd = gp - center
                    bwd = center - gm
                    cen = 0.5 * (gp - gm)
                    both = flp & flm
                    onlyp = flp & (~flm)
                    onlym = (~flp) & flm
                    zero = jnp.zeros_like(center)
                    return jnp.where(both, cen,
                                     jnp.where(onlyp, fwd,
                                               jnp.where(onlym, bwd, zero)))

                E = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
                # S-region origins: in u region (sx0, sy0); in window
                # (ux0 + 1, uy0 + 1)
                wsx, wsy = ux0 + 1, uy0 + 1
                flp1 = [fluid(*E[a], wsx, wsy, nsx, nsy) for a in range(3)]
                flm1 = [fluid(*(-d for d in E[a]), wsx, wsy, nsx, nsy)
                        for a in range(3)]
                u1 = [usl(b, 0, 0, 0, sx0, sy0, nsx, nsy) for b in range(3)]
                grad = {}
                for a in range(3):
                    for b in range(3):
                        gp = usl(b, *E[a], sx0, sy0, nsx, nsy)
                        gm = usl(b, *(-d for d in E[a]), sx0, sy0, nsx, nsy)
                        grad[(a, b)] = wall_aware(gp, gm, u1[b],
                                                  flp1[a], flm1[a])
                S = {}
                for a in range(3):
                    for b in range(a, 3):
                        S[(a, b)] = (grad[(a, a)] if a == b
                                     else 0.5 * (grad[(a, b)] + grad[(b, a)]))

                # non-periodic domain edges: the hook pads S itself with
                # edge replication (_pad1(S, edge)) - overwrite the
                # out-of-domain S ring with the adjacent interior layer
                gx_s, gy_s = giota(nsx, nsy, ux0 + 1 - x_org,
                                   uy0 + 1 - y_org)
                for key in S:
                    s = S[key]
                    if not per[0]:
                        s = _rep_lo_hi(s, 0, (gx_s < 0) & oxlo,
                                       (gx_s > X - 1) & oxhi)
                    if not per[1]:
                        s = _rep_lo_hi(s, 1, (gy_s < 0) & oylo,
                                       (gy_s > Y - 1) & oyhi)
                    S[key] = s

                # ---- stage 3: rheology + divergence on (ncx, ncy) ----
                nu = params_ref[0]

                def Sc(a, b, ox=0, oy=0, oz=0):
                    s = S[(min(a, b), max(a, b))]
                    base = s[1 + ox:1 + ox + ncx, 1 + oy:1 + oy + ncy, :]
                    return _zshift(base, oz, Z, nn_periodic_z)

                diag = Sc(0, 0) ** 2 + Sc(1, 1) ** 2 + Sc(2, 2) ** 2
                off2 = Sc(0, 1) ** 2 + Sc(0, 2) ** 2 + Sc(1, 2) ** 2
                gamma = jnp.sqrt(diag + 2 * off2)
                nu_eff = model(nu, gamma)

                flp2 = [fluid(*E[a], cx0, cy0, ncx, ncy) for a in range(3)]
                flm2 = [fluid(*(-d for d in E[a]), cx0, cy0, ncx, ncy)
                        for a in range(3)]
                m0 = fluid(0, 0, 0, cx0, cy0, ncx, ncy)
                rho_c = rho_u[2:2 + ncx, 2:2 + ncy, :]
                scale = 2 * (nu_eff - nu) * rho_c
                zero = jnp.zeros((ncx, ncy, Zp), dtype)
                fnn = []
                for b in range(3):
                    div_b = zero
                    for a in range(3):
                        div_b = div_b + wall_aware(
                            Sc(a, b, *E[a]), Sc(a, b, *(-d for d in E[a])),
                            Sc(a, b), flp2[a], flm2[a])
                    fnn.append(jnp.where(m0, scale * div_b, zero))

                if ring:
                    # the XLA push pads the force FIELD with edge
                    # replication (_pad_force_ring, domain semantics):
                    # out-of-domain ring layers carry the interior force
                    if not periodic[0]:
                        lo = (i == 0) & (params_ref[8] > 0)
                        hi = (i == nx_t - 1) & (params_ref[9] > 0)
                        fnn = [_edge_rep(v, 0, lo, hi) for v in fnn]
                    if not periodic[1]:
                        lo = (jt == 0) & (params_ref[10] > 0)
                        hi = (jt == ny_t - 1) & (params_ref[11] > 0)
                        fnn = [_edge_rep(v, 1, lo, hi) for v in fnn]

                # ---- stage 4: collide on the collision region ----
                force_tot = jnp.stack([fnn[a] + force_s[a] for a in range(3)])
                f_in_c = f_in_u[:, 2:2 + ncx, 2:2 + ncy, :]
                rho_2 = jnp.where(rho_c == 0, jnp.ones((), dtype), rho_c)
                u_c = jnp.stack([
                    u_u[a][2:2 + ncx, 2:2 + ncy, :]
                    + 0.5 * fnn[a] / rho_2
                    for a in range(3)
                ])
                m_c = mw[cx0:cx0 + ncx, cy0:cy0 + ncy, :]

                if mode == "even":
                    def shifted_c(q, offs):
                        del offs
                        return fw[q, cx0:cx0 + ncx, cy0:cy0 + ncy, :]
                elif mode == "odd":
                    def shifted_c(q, offs):
                        ox, oy, oz = offs
                        qo = int(opp[q])
                        base = fw[qo, cx0 + ox:cx0 + ox + ncx,
                                  cy0 + oy:cy0 + oy + ncy, :]
                        return _zshift(base, oz, Z, periodic_z)
                else:
                    def shifted_c(q, offs):
                        ox, oy, oz = offs
                        base = fw[q, cx0 + ox:cx0 + ox + ncx,
                                  cy0 + oy:cy0 + oy + ncy, :]
                        return _zshift(base, oz, Z, periodic_z)

                f_post, rho_out, u_out = _stream_bc_collide(
                    lat, cfg_ab, codes, sym_codes, eq_kind, do_coll_codes,
                    dtype, shifted_c, m_c, params_ref,
                    out_perm=(opp if mode == "even" else None),
                    defer_nothing=(mode == "odd"),
                    force_tile=force_tot,
                    precomputed=(f_in_c, rho_c, u_c),
                )

                if mode == "odd":
                    # push from the ring (mirrors fused_aa._build_odd_call)
                    post = [f_post[q] for q in range(Q)]
                    if not periodic[0]:
                        lo = (i == 0) & (params_ref[8] > 0)
                        hi = (i == nx_t - 1) & (params_ref[9] > 0)
                        post = [_edge_rep(v, 0, lo, hi) for v in post]
                    if not periodic[1]:
                        lo = (jt == 0) & (params_ref[10] > 0)
                        hi = (jt == ny_t - 1) & (params_ref[11] > 0)
                        post = [_edge_rep(v, 1, lo, hi) for v in post]
                    rows = []
                    for q in range(Q):
                        cxq, cyq, czq = (int(v) for v in lat.c[q])
                        base = post[q][1 - cxq:1 - cxq + tx,
                                       1 - cyq:1 - cyq + ty, :]
                        rows.append(_zshift(base, -czq, Z, periodic_z))
                    pushed = jnp.stack(rows)
                    if GEO.NOTHING in codes:
                        m_int = m_c[1:1 + tx, 1:1 + ty, :]
                        center = fw[:, x_org:x_org + tx, y_org:y_org + ty, :]
                        pushed = jnp.where(m_int == int(GEO.NOTHING),
                                           center, pushed)
                    fout_ref[:, :, t * ty:(t + 1) * ty, :] = pushed[..., :Z]
                    if with_macro:
                        rho_ref[:, t * ty:(t + 1) * ty, :] = \
                            rho_out[1:1 + tx, 1:1 + ty, :Z]
                        u_ref[:, :, t * ty:(t + 1) * ty, :] = \
                            u_out[:, 1:1 + tx, 1:1 + ty, :Z]
                else:
                    fout_ref[:, :, t * ty:(t + 1) * ty, :] = f_post[..., :Z]
                    if with_macro:
                        rho_ref[:, t * ty:(t + 1) * ty, :] = rho_out[..., :Z]
                        u_ref[:, :, t * ty:(t + 1) * ty, :] = \
                            u_out[:, :, :, :Z]

        call = pl.pallas_call(
            kernel,
            grid=(X // tx, Y // tyK),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # fpad stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # map pad stays in HBM
            ],
            out_specs=(
                pl.BlockSpec((Q, tx, tyK, Z), lambda i, j: (0, i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tx, tyK, Z) if with_macro else dummy,
                             (lambda i, j: (i, j, 0)) if with_macro
                             else (lambda i, j: (0, 0, 0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tx, tyK, Z) if with_macro else (3,) + dummy,
                             (lambda i, j: (0, i, j, 0)) if with_macro
                             else (lambda i, j: (0, 0, 0, 0)),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Q, X, Y, Z), dtype),
                jax.ShapeDtypeStruct((X, Y, Z) if with_macro else dummy,
                                     dtype),
                jax.ShapeDtypeStruct((3, X, Y, Z) if with_macro
                                     else (3,) + dummy, dtype),
            ),
            scratch_shapes=[pltpu.VMEM((Q, fx, fy, Zp), dtype)
                            for _ in range(K)]
            + [pltpu.VMEM((fx, fy, Zp), jnp.int32) for _ in range(K)]
            + [pltpu.SemaphoreType.DMA((K, 2))],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )

        if prepadded:
            # operands arrive master-padded ([.., X+8, Y+16, Zp], 4-wide x
            # / 8-wide y halos); slice this mode's window layout out
            xs = slice(4 - x_org, 4 - x_org + X + 2 * x_org)
            ys = slice(8 - y_org, 8 - y_org + Y + fy - ty)

            def run(fmaster, params, mp_master):
                return call(params, fmaster[:, xs, ys, :],
                            mp_master[xs, ys, :])

            return run

        mp_j = jnp.asarray(map_pad)

        def run(f, params):
            fpad = _pad_xy_jnp(f, periodic, x_org, x_org,
                               y_org, fy - ty - y_org, extra_z=Zp - Z)
            return call(params, fpad, mp_j)

        return run

    runs = {}
    if cfg.streaming == "AB":
        runs[0] = build_call("ab")
    else:
        runs[0] = build_call("even")
        runs[1] = build_call("odd")

    def step(f, nu, u_in=None, force=None, parity: int = 0,
             map_master=None, mask_master=None, bflags=None):
        del mask_master  # derived from the map in-kernel since round 5
        assert force is None or jnp.ndim(force) <= 1, \
            "single-kernel NN step takes a homogeneous [3] force"
        flags = (jnp.ones((6,), dtype) if bflags is None
                 else jnp.asarray(bflags, dtype).reshape(-1))
        params = jnp.concatenate([_params_vec(dtype, nu, u_in, force), flags])
        run = runs[parity if cfg.streaming == "AA" else 0]
        if prepadded:
            assert map_master is not None, \
                "prepadded NN step requires a runtime map master pad"
            f_new, rho, u = run(f, params, map_master)
        else:
            f_new, rho, u = run(f, params)
        if not with_macro:
            return f_new, None, None
        return f_new, rho, u

    return step
