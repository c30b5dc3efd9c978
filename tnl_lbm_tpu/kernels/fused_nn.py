"""Single-kernel non-Newtonian forcing: strain-rate -> nu_eff -> div(S).

The XLA forcing hook (ops/non_newtonian.py) materializes ~20 lattice-sized
intermediates in HBM per step (padded u, 9 gradients, 6 S components and
their pads, the divergence rows) - measured ~31 ms of a 44 ms hooked step
at 256^3, i.e. the hook dominates the three-phase hooked pipeline
(kernels/hooked.py).  This kernel is the reference's dedicated
``cudaLBMKernelStress`` + forcing pass (reference nonNewtonian.h:216-391,
690-788) rebuilt as ONE Pallas program: each grid tile DMAs a 2-halo
velocity window and the fluid mask into VMEM, evaluates the wall-aware
strain-rate tensor on a +1 ring, the rheology model (Carreau-Yasuda /
Casson) and the wall-aware divergence entirely in registers, and writes
the 3-component force tile once.  HBM traffic: read 4 channels (u, rho)
+ mask, write 3 - ~0.14x of a fused LBM step.

Semantics match ops/non_newtonian.py exactly (regression-tested through
test_hooked_fused_nn_rheology and tests/test_non_newtonian.py):

- wall-aware one-sided/central differences via the neighbor-fluidity
  switch (nonNewtonian.h:326-391);
- non-periodic seams edge-replicate: the strain ring OUTSIDE the domain
  is overwritten with the adjacent interior row, which is exactly the
  hook's ``_pad1(S, mode="edge")``;
- periodic axes wrap: the 2-halo u/mask pad wraps, and a ring S computed
  from wrapped u equals the wrapped interior S, so no fix-up is needed;
- the z axis rides the lanes: `_zshift` clamp/wrap per stage mirrors the
  hook's per-stage `_pad1` on axis z.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tnl_lbm_tpu.kernels.fused import (
    MOSAIC_SCRATCH_BUDGET,
    _fit_tiles_vmem,
    _lane_pad,
    _zshift,
)
from tnl_lbm_tpu.sim.config import Domain


def _pad2(field, periodic, extra_y: int = 4, extra_z: int = 0):
    """2-halo pad on the X/Y axes of [..., X, Y, Z]: edge-replicate, then
    overwrite the 2 halo layers of periodic axes with the wrapped values
    (the 2-wide analog of fused._pad_once).  ``extra_y`` appends junk rows
    so the last sublane-aligned DMA window fits; ``extra_z`` appends junk
    lanes up to the 128-multiple extent."""
    nd = field.ndim
    off = nd - 3
    pads = [(0, 0)] * off + [(2, 2), (2, 2 + extra_y), (0, extra_z)]
    out = jnp.pad(field, pads, mode="edge")
    for a, per in enumerate(periodic[:2]):
        if not per:
            continue
        axis = off + a
        n = field.shape[axis]

        for dst0, src0 in ((0, n), (n + 2, 2)):
            # low halo <- last two interior layers; high <- first two
            idx = [slice(None)] * nd
            src = [slice(None)] * nd
            idx[axis] = slice(dst0, dst0 + 2)
            src[axis] = slice(src0, src0 + 2)
            out = out.at[tuple(idx)].set(out[tuple(src)])
    return out


def make_nn_force_kernel(model, domain: Domain, dtype, fluid_mask,
                         periodic=None, tile=None, tiles_per_program: int = 2):
    """Build ``force_fn(rho, u, nu) -> [3, X, Y, Z]`` evaluating the
    non-Newtonian body force F = 2 (nu_eff - nu) rho div(S) in one Pallas
    kernel.

    ``model`` is a CarreauYasuda/Casson instance (elementwise callables);
    ``fluid_mask`` is the static [X, Y, Z] bool FLUID mask; ``periodic``
    is the hook's wrap tuple (None = edge-replicate everywhere, matching
    make_nn_forcing_hook's default - note this is the HOOK's stencil
    semantics, deliberately independent of ``domain.periodic``).
    """
    X, Y, Z = domain.shape
    per = tuple(periodic) if periodic is not None else (False, False, False)
    periodic_z = bool(per[2])
    interpret = jax.default_backend() == "cpu"
    Zp = _lane_pad(Z, interpret)
    itemsize = jnp.dtype(dtype).itemsize

    if tile is None:
        tile = (8, 32)

    def vmem_bytes(tx, ty, K):
        scr = K * 5 * (tx + 4) * (ty + 8) * Zp * itemsize  # u(3) + mask scratches (+1 margin)
        ring = 6 * (tx + 2) * (ty + 2) * Zp * itemsize     # S components live at once
        bspec = 2 * (tx * ty * K) * (Zp + 3 * Z) * itemsize  # rho in + force out
        return scr + ring + bspec

    tx, ty, K = _fit_tiles_vmem(vmem_bytes, tile, tiles_per_program, X, Y,
                                budget_bytes=MOSAIC_SCRATCH_BUDGET)
    assert X % tx == 0 and Y % (ty * K) == 0 and ty % 8 == 0, (X, Y, tx, ty, K)

    # static padded mask, [X+4, Y+4+4, Zp] float (pad lanes: edge junk,
    # never consumed - z derivative shifts clamp at the true extent)
    maskpad_host = np.asarray(
        _pad2(jnp.asarray(np.asarray(fluid_mask), dtype),
              per, extra_y=4, extra_z=Zp - Z))

    def kernel(params_ref, rho_ref, upad_hbm, maskpad_hbm, force_ref, *rest):
        uscr = rest[:K]
        mscr = rest[K:2 * K]
        sem = rest[2 * K]
        i = pl.program_id(0)
        j = pl.program_id(1)
        nu = params_ref[0]

        dmas = []
        for t in range(K):
            y0 = (j * K + t) * ty
            du = pltpu.make_async_copy(
                upad_hbm.at[:, pl.ds(i * tx, tx + 4), pl.ds(y0, ty + 8), :],
                uscr[t], sem.at[2 * t])
            dm = pltpu.make_async_copy(
                maskpad_hbm.at[pl.ds(i * tx, tx + 4), pl.ds(y0, ty + 8), :],
                mscr[t], sem.at[2 * t + 1])
            du.start()
            dm.start()
            dmas.append((du, dm))

        for t in range(K):
            dmas[t][0].wait()
            dmas[t][1].wait()
            u = uscr[t]
            msk = mscr[t]

            # local window: padded index p = interior + 2 - window_start;
            # window starts at (x: i*tx, y: (j*K+t)*ty), so the tile's
            # first interior site sits at local (2, 2).
            def at(arr_q, ox, oy, oz, x0, y0, nx, ny):
                """[nx, ny, Zp] slice at offsets (ox, oy) from local origin
                (x0, y0), z-shifted by oz with the hook's clamp/wrap."""
                base = arr_q[x0 + ox:x0 + ox + nx, y0 + oy:y0 + oy + ny, :]
                return _zshift(base, oz, Z, periodic_z)

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

            def fluid(ox, oy, oz, x0, y0, nx, ny):
                return at(msk, ox, oy, oz, x0, y0, nx, ny) > 0.5

            # ---- stage 1: strain-rate on the +1 ring region R1 ----
            # R1 = tile + 1-site ring; local origin (1, 1), extent +2
            nx1, ny1 = tx + 2, ty + 2
            E = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
            flp1 = [fluid(*E[a], 1, 1, nx1, ny1) for a in range(3)]
            flm1 = [fluid(*(-d for d in E[a]), 1, 1, nx1, ny1)
                    for a in range(3)]
            u1 = [at(u[b], 0, 0, 0, 1, 1, nx1, ny1) for b in range(3)]
            grad = {}
            for a in range(3):
                for b in range(3):
                    gp = at(u[b], *E[a], 1, 1, nx1, ny1)
                    gm = at(u[b], *(-d for d in E[a]), 1, 1, nx1, ny1)
                    grad[(a, b)] = wall_aware(gp, gm, u1[b], flp1[a], flm1[a])
            S = {}
            for a in range(3):
                for b in range(a, 3):
                    S[(a, b)] = (grad[(a, a)] if a == b
                                 else 0.5 * (grad[(a, b)] + grad[(b, a)]))

            # non-periodic domain edges: the hook pads S itself with
            # edge-replicate (_pad1); overwrite the outside ring rows with
            # the adjacent interior row (periodic axes need no fix - the
            # wrapped-u ring S equals the wrapped interior S)
            gx = i * tx - 1 + jax.lax.broadcasted_iota(
                jnp.int32, (nx1, ny1, Zp), 0)
            gy = (j * K + t) * ty - 1 + jax.lax.broadcasted_iota(
                jnp.int32, (nx1, ny1, Zp), 1)
            for key in S:
                s = S[key]
                if not per[0]:
                    down = jnp.concatenate([s[1:], s[-1:]], axis=0)
                    up = jnp.concatenate([s[:1], s[:-1]], axis=0)
                    s = jnp.where(gx < 0, down, jnp.where(gx > X - 1, up, s))
                if not per[1]:
                    down = jnp.concatenate([s[:, 1:], s[:, -1:]], axis=1)
                    up = jnp.concatenate([s[:, :1], s[:, :-1]], axis=1)
                    s = jnp.where(gy < 0, down, jnp.where(gy > Y - 1, up, s))
                S[key] = s

            # ---- stage 2: rheology + divergence at the tile center ----
            def Sc(a, b, ox=0, oy=0, oz=0):
                s = S[(min(a, b), max(a, b))]
                base = s[1 + ox:1 + ox + tx, 1 + oy:1 + oy + ty, :]
                return _zshift(base, oz, Z, periodic_z)

            diag = Sc(0, 0) ** 2 + Sc(1, 1) ** 2 + Sc(2, 2) ** 2
            off2 = Sc(0, 1) ** 2 + Sc(0, 2) ** 2 + Sc(1, 2) ** 2
            gamma = jnp.sqrt(diag + 2 * off2)
            nu_eff = model(nu, gamma)

            flp2 = [fluid(*E[a], 2, 2, tx, ty) for a in range(3)]
            flm2 = [fluid(*(-d for d in E[a]), 2, 2, tx, ty)
                    for a in range(3)]
            m0 = fluid(0, 0, 0, 2, 2, tx, ty)
            rho_t = rho_ref[:, t * ty:(t + 1) * ty, :]
            scale = 2 * (nu_eff - nu) * rho_t
            zero = jnp.zeros((tx, ty, Zp), dtype)
            rows = []
            for b in range(3):
                div_b = zero
                for a in range(3):
                    div_b = div_b + wall_aware(
                        Sc(a, b, *E[a]), Sc(a, b, *(-d for d in E[a])),
                        Sc(a, b), flp2[a], flm2[a])
                rows.append(jnp.where(m0, scale * div_b, zero))
            force_ref[:, :, t * ty:(t + 1) * ty, :] = jnp.stack(rows)[..., :Z]

    grid = (X // tx, Y // (ty * K))
    tyK = ty * K
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params [1]: nu
            pl.BlockSpec((tx, tyK, Zp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # upad stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # maskpad stays in HBM
        ],
        out_specs=pl.BlockSpec((3, tx, tyK, Z), lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, X, Y, Z), dtype),
        scratch_shapes=(
            [pltpu.VMEM((3, tx + 4, ty + 8, Zp), dtype) for _ in range(K)]
            + [pltpu.VMEM((tx + 4, ty + 8, Zp), dtype) for _ in range(K)]
            + [pltpu.SemaphoreType.DMA((2 * K,))]
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def _zpad(arr):
        if Zp == Z:
            return arr
        pw = [(0, 0)] * (arr.ndim - 1) + [(0, Zp - Z)]
        return jnp.pad(arr, pw, mode="edge")

    def force_fn(rho, u, nu):
        upad = _pad2(u.astype(dtype), per, extra_y=4, extra_z=Zp - Z)
        params = jnp.asarray([nu], dtype)
        return call(params, _zpad(rho.astype(dtype)),
                    upad, jnp.asarray(maskpad_host))

    return force_fn
