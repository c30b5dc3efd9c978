"""Fused collide-and-stream Pallas TPU kernels (the MLUPS path).

The XLA reference path (sim/step.py) materializes the padded array, the 27
pulled components and dozens of cumulant-cascade intermediates in HBM -
measured ~25 memory passes per step.  These kernels are the speed-of-light
design (SURVEY.md section 7 M4): the lattice is tiled over (X, Y); each grid
program DMAs haloed tiles into VMEM, performs pull streaming as in-VMEM
shifted slices, applies the mask-select BCs, runs the full collision cascade
in vector registers and writes each post-collision tile once - matching the
reference's single fused CUDA kernel structure (reference kernels.h:60-100).

Two memory layouts:

- ``make_fused_step``: Q-major state [Q, X, Y, Z] (the framework's native
  layout).  DMA windows on the sublane (Y) axis must be 8-aligned, so tiles
  read a (ty+8)-row window; K tiles per grid program keep K input DMAs in
  flight (the kernel is DMA-latency-bound - the cumulant math is hidden).
- ``make_fused_step_sitemajor``: site-major state [X, Y, Qp, Z] with Q
  padded to 32 sublanes.  Both sliced axes (X, Y) are untiled, so halo
  windows are exact and each DMA chunk is a contiguous 32 KB
  (site, all-Q, all-Z) run - fewer, larger descriptors.

Supported: A-B pull streaming with the same BC set as the XLA path except
OUTFLOW_RIGHT_INTERP and Bouzidi (those domains fall back to sim/step.py).
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

#: GEO codes the fused kernels can handle
SUPPORTED_CODES = {
    GEO.FLUID, GEO.WALL, GEO.INFLOW, GEO.OUTFLOW_EQ, GEO.OUTFLOW_RIGHT,
    GEO.PERIODIC, GEO.NOTHING,
    GEO.SYM_TOP, GEO.SYM_BOTTOM, GEO.SYM_LEFT, GEO.SYM_RIGHT,
    GEO.SYM_BACK, GEO.SYM_FRONT, GEO.INFLOW_LEFT,
    GEO.OUTFLOW_RIGHT_INTERP,  # A-B only (like the XLA path, sim/step.py:64)
}


def supports(domain: Domain, streaming: str = "AB") -> bool:
    codes = domain.codes_present()
    if streaming == "AA" and GEO.OUTFLOW_RIGHT_INTERP in codes:
        return False
    return codes <= SUPPORTED_CODES


def _moments_local(lat, f_in, force, well, high_precision=False):
    """density_velocity without array constants (Pallas kernels may not
    capture traced constants): Python loops with scalar +-1 coefficients.

    ``high_precision`` selects Neumaier compensated summation over Q
    (reference USE_HIGH_PRECISION_RHO, d3q27/common.h:19-28) - elementwise
    ops only, so it runs in-kernel at ~4x the adds of the plain sum."""
    if high_precision:
        s = f_in[0]
        comp = jnp.zeros_like(s)
        for q in range(1, lat.Q):
            x = f_in[q]
            t = s + x
            comp = comp + jnp.where(
                jnp.abs(s) >= jnp.abs(x), (s - t) + x, (x - t) + s
            )
            s = t
        rho = s + comp
    else:
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
    if kind == "entropic":
        # sqrt product form (Karlin et al., reference eq_entropic.h:90-216)
        factors = []
        for a in range(3):
            v = u[a]
            s = jnp.sqrt(1 + 3 * v * v)
            base = 2 - s
            r = (2 * v + s) / (1 - v)
            factors.append({0: (2.0 / 3.0) * base,
                            1: (1.0 / 6.0) * base * r,
                            -1: (1.0 / 6.0) * base / r})
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
    if cfg.eq is eqlib.eq_entropic:
        return "entropic"
    if cfg.eq is eqlib.eq_well or cfg.well:
        return "well"
    return "quad"


LANE = 128  # TPU lane width: manual-DMA buffers pad Z to this multiple

#: VMEM budget handed to _fit_tiles_vmem.  Measured on v5e (round 3): the
#: pair2/odd kernels compile with ~49 MB of estimated scratch (256^3 at tile
#: (8,32) K=2, the headline config) but tpu_compile_helper crashes at ~74 MB
#: (same tile at Zp=384) even though the chip has 128 MB VMEM - Mosaic's own
#: double-buffering and spill overhead eat the difference.  56 MB keeps every
#: known-good geometry and shrinks the ones that crashed.
MOSAIC_SCRATCH_BUDGET = int(56e6)

#: tests set True to exercise the padded-lane (Z % 128 != 0) kernel logic
#: under CPU interpret mode, where the DMA alignment constraint is absent
FORCE_LANE_PAD = False


def _lane_pad(Z: int, interpret: bool) -> int:
    """Padded lane extent for manual-DMA buffers: DMA windows that slice
    the leading axes of an HBM array fail Mosaic compilation unless the
    lane (last) axis is a multiple of 128 (probed on v5e, round 3);
    interpret mode has no such constraint."""
    if (interpret and not FORCE_LANE_PAD) or Z % LANE == 0:
        return Z
    return -(-Z // LANE) * LANE


def _zshift(base, oz, Z, periodic_z):
    """In-VMEM z shift with a wrap/clamp boundary plane.

    ``base`` spans either exactly Z lanes or a 128-padded extent Zp > Z
    (the manual-DMA layouts); in the padded case the boundary wrap/clamp
    applies at the TRUE extent Z via a lane-iota select and lanes >= Z
    carry junk (callers slice outputs to :Z).  Both forms verified on
    hardware (scripts/probe_zshift round-3 probe)."""
    if oz == 0:
        return base
    Zp = base.shape[-1]
    if Zp == Z:
        if oz == -1:  # out[z] = base[z - 1]
            bndry = base[..., Z - 1 : Z] if periodic_z else base[..., 0:1]
            return jnp.concatenate([bndry, base[..., : Z - 1]], axis=-1)
        bndry = base[..., 0:1] if periodic_z else base[..., Z - 1 : Z]
        return jnp.concatenate([base[..., 1:], bndry], axis=-1)
    import jax

    lane = jax.lax.broadcasted_iota(jnp.int32, base.shape, base.ndim - 1)
    if oz == -1:  # out[z] = base[z - 1]; boundary plane at z = 0
        shifted = jnp.concatenate([base[..., :1], base[..., :-1]], axis=-1)
        bplane = base[..., Z - 1 : Z] if periodic_z else base[..., 0:1]
        return jnp.where(lane == 0, bplane, shifted)
    # oz == +1: out[z] = base[z + 1]; boundary plane at z = Z - 1
    shifted = jnp.concatenate([base[..., 1:], base[..., -1:]], axis=-1)
    bplane = base[..., 0:1] if periodic_z else base[..., Z - 1 : Z]
    return jnp.where(lane == Z - 1, bplane, shifted)


def _pull_transform(lat, codes, sym_codes, shifted, masks):
    """Streaming-stage reads + pull-side BC transforms: the pull of the 27
    components, the outflow pull modifications, the WALL bounce-back swap
    and the symmetry mirrors - everything of ``_stream_bc_collide`` that
    happens BEFORE the moments.  Split out (round 3) so the single-kernel
    non-Newtonian step (kernels/fused_nn_step.py) can evaluate it on an
    extended in-register region and feed the result back via
    ``precomputed``."""
    Q = lat.Q
    opp = np.asarray(lat.opp)

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

    if GEO.OUTFLOW_RIGHT_INTERP in codes:
        # Geier speed-of-sound interpolated outflow: incoming (c_x = -1)
        # components blend the x-1 and x values (streaming_AB.h:209-242);
        # both offsets sit inside the 1-halo window
        from tnl_lbm_tpu.ops.streaming import SPEED_OF_SOUND as _cs

        rows_oi = []
        for q in range(Q):
            cx, cy, cz = (int(v) for v in lat.c[q])
            if cx == -1:
                rows_oi.append(_cs * shifted(q, (-1, -cy, -cz))
                               + (1 - _cs) * shifted(q, (0, -cy, -cz)))
            else:
                rows_oi.append(shifted(q, (-cx, -cy, -cz)))
        f_in = jnp.where(masks[GEO.OUTFLOW_RIGHT_INTERP], jnp.stack(rows_oi), f_in)

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
    return f_in


def _stream_bc_collide(lat, cfg, codes, sym_codes, eq_kind, do_coll_codes,
                       dtype, shifted, m, params_ref,
                       out_perm=None, defer_nothing=False, force_tile=None,
                       macro_only=False, precomputed=None):
    """Pull-stream + BC mask-selects + collision for one VMEM tile.

    ``shifted(q, (ox, oy, oz))`` returns the [tx, ty, Z] slice of DF
    component q at the given offsets - the only layout-dependent piece, so
    the Q-major, site-major and A-A kernels share this body.  Mirrors the
    XLA step in sim/step.py (and is regression-tested against it).

    ``out_perm`` permutes the output components before the NOTHING restore
    (the A-A even step writes opposite-direction, streaming_AA.h:16-45).
    ``defer_nothing=True`` skips the NOTHING restore - the A-A odd kernel
    applies it after its push shifts, at the destination site.
    ``force_tile`` is an optional per-site [3, tx, ty, Z] force (the TPU
    analog of the reference's macro force channels e_fx..e_fz consumed by
    MACRO::computeForcing, kernels.h:92); it overrides the homogeneous
    force scalars from params.
    ``precomputed`` is an optional (f_in, rho, u) triple that skips the
    pull/transform/moments stages - the single-kernel non-Newtonian step
    evaluates them on an extended region and passes center slices here
    (``shifted`` is then only consulted for the NOTHING restore).
    """
    Q = lat.Q
    nu = params_ref[0]
    u_in = [params_ref[1], params_ref[2], params_ref[3]]
    if force_tile is not None:
        force = force_tile  # [3, tx, ty, Z] array; force[a] broadcasts
    else:
        force = [params_ref[4], params_ref[5], params_ref[6]]
    masks = {c: (m == int(c)) for c in codes}

    if precomputed is not None:
        f_in, rho, u = precomputed
    else:
        f_in = _pull_transform(lat, codes, sym_codes, shifted, masks)
        rho, u = _moments_local(lat, f_in, force, cfg.well,
                                high_precision=cfg.high_precision_rho)
    if macro_only:
        # u* pre-pass (reference kernels.h:178-218): the hook input is the
        # streamed + wall/symmetry-transformed moments with the homogeneous
        # force only - exactly sim/step.py ustar, BEFORE the inflow/outflow
        # macro overrides below
        return None, rho, u

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
    if GEO.OUTFLOW_RIGHT_INTERP in codes:
        # equilibrium decomposition toward rho_out = 1 (bc.h:138-143)
        mm = masks[GEO.OUTFLOW_RIGHT_INTERP]
        f_in = jnp.where(
            mm,
            f_in + _eq_local(lat, one, u, eq_kind) - _eq_local(lat, rho, u, eq_kind),
            f_in,
        )
        rho = jnp.where(mm, one, rho)

    rho_safe = jnp.where(rho == 0, one, rho)
    # collisions that consume forcing (SRT family) need a broadcastable
    # array, not the list of SMEM scalars the moments use
    force_c = (force if force_tile is not None
               else jnp.stack(force).reshape((3, 1, 1, 1)))
    f_post = cfg.collision(lat, f_in, rho_safe, u, nu, force=force_c)
    do_coll = jnp.zeros_like(m, dtype=jnp.bool_)
    for code in do_coll_codes:
        do_coll = do_coll | (m == code)
    f_post = jnp.where(do_coll, f_post, f_in)

    if out_perm is not None:
        f_post = jnp.stack([f_post[int(out_perm[q])] for q in range(Q)])
    if GEO.NOTHING in codes and not defer_nothing:
        center = jnp.stack([shifted(q, (0, 0, 0)) for q in range(Q)])
        f_post = jnp.where(masks[GEO.NOTHING], center, f_post)

    rho_out, u_out = rho, u
    zero_u = jnp.zeros_like(u)
    for c in (GEO.WALL, GEO.NOTHING):
        if c in codes:
            rho_out = jnp.where(masks[c], one, rho_out)
            u_out = jnp.where(masks[c], zero_u, u_out)
    return f_post, rho_out, u_out


def _fit_tile(t: int, n: int, align: int = 1) -> int:
    """Largest divisor of n that is <= t and a multiple of align (a
    requested t below the alignment rounds up to it)."""
    t = min(max(t, align), n)
    while t >= align and (n % t != 0 or t % align != 0):
        t -= align if t % align == 0 else t % align
    assert t >= align, (t, n, align)
    return t


def _fit_tiles_vmem(bytes_fn, tile, K, X, Y, budget_bytes,
                    ty_align: int = 8, tx_min: int = 1):
    """Shrink (tx, ty, K) until the kernel's VMEM estimate fits the budget
    (lifts the round-2 'Z <= 256' ceiling: large-Z configs simply run
    smaller tiles instead of failing Mosaic - probed OK at Z=640 on v5e)."""
    tx = _fit_tile(tile[0], X)
    ty = _fit_tile(tile[1], Y, ty_align)
    while K > 1 and Y % (ty * K) != 0:
        K -= 1
    while bytes_fn(tx, ty, K) > budget_bytes:
        if K > 1:
            K -= 1
            while K > 1 and Y % (ty * K) != 0:
                K -= 1
        elif ty > ty_align:
            ty = _fit_tile(ty // 2, Y, ty_align)
        elif tx > tx_min:
            tx = _fit_tile(max(tx // 2, tx_min), X)
        else:
            break  # smallest geometry - let Mosaic have the final say
    return tx, ty, K


def _pad_once(f, periodic, extra_y: int = 0, extra_z: int = 0):
    """One-pass halo pad on the X/Y axes (dims 1, 2): edge-replicate, then
    overwrite periodic-axis halo layers with the wrapped values.

    ``extra_y`` appends unused replicate rows on Y so the Q-major kernel's
    DMA windows stay sublane-aligned; ``extra_z`` appends junk lanes so
    manual-DMA buffers reach the 128-multiple lane extent (_lane_pad) -
    the kernel clamps z reads at the true extent (_zshift), so the pad
    values are never consumed."""
    pads = [(0, 0), (1, 1), (1, 1 + extra_y), (0, extra_z)]
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


def _pad_once_sitemajor(f, periodic):
    """Halo pad for the site-major layout [X, Y, Qp, Z] (dims 0, 1)."""
    fpad = jnp.pad(f, [(1, 1), (1, 1), (0, 0), (0, 0)], mode="edge")
    for axis, per in enumerate(periodic[:2]):
        if not per:
            continue
        n = f.shape[axis]
        lo = [slice(None)] * 4
        hi = [slice(None)] * 4
        src_hi = [slice(None)] * 4
        src_lo = [slice(None)] * 4
        lo[axis] = slice(0, 1)
        src_hi[axis] = slice(n, n + 1)
        hi[axis] = slice(n + 1, n + 2)
        src_lo[axis] = slice(1, 2)
        fpad = fpad.at[tuple(lo)].set(fpad[tuple(src_hi)])
        fpad = fpad.at[tuple(hi)].set(fpad[tuple(src_lo)])
    return fpad


def _params_vec(dtype, nu, u_in, force):
    z = jnp.zeros((3,), dtype)
    u_in_v = z if u_in is None else jnp.asarray(u_in, dtype).reshape(3)
    force_v = z if force is None else jnp.asarray(force, dtype).reshape(3)
    return jnp.concatenate([
        jnp.asarray([nu], dtype), u_in_v, force_v,
        jnp.asarray([0.0 if force is None else 1.0], dtype),
    ])


def _prep(cfg, domain):
    if cfg.streaming != "AB":
        raise NotImplementedError("fused kernels currently implement the A-B pattern")
    if cfg.forcing_hook is not None:
        raise NotImplementedError(
            "forcing hooks (IBM / non-Newtonian) run at the XLA level; "
            "use sim.step.make_step for hooked configs"
        )
    lat = cfg.lat
    assert lat.D == 3, "fused kernels are for the 3D lattices"
    codes = domain.codes_present()
    if not codes <= SUPPORTED_CODES:
        raise NotImplementedError(f"unsupported GEO codes {codes - SUPPORTED_CODES}")
    sym_codes = [c for c in codes if c in bc.sym_table(3)]
    do_coll_codes = [int(c) for c in (bc.collision_mask_codes(3) & codes)]
    return lat, codes, sym_codes, _eq_kind(cfg), do_coll_codes


def make_fused_step(cfg: LBMConfig, domain: Domain, tile=None, tiles_per_program: int = 2,
                    with_macro: bool = True, prepadded: bool = False,
                    local_shape=None, force_field: bool = False,
                    macro_only: bool = False):
    """Q-major fused step: step(f, nu, u_in, force) -> (f_new, rho, u).

    With ``with_macro=False`` the macro outputs are skipped (returns
    (f_new, None, None)) - saves the rho/u write traffic for benchmarks.
    With ``prepadded=True`` the step expects the already-haloed array
    [Q, X+2, Y+2+6, Z] (the distributed path builds it with ppermute
    halo exchange inside shard_map - parallel/sharded.py).
    With ``force_field=True`` the step's ``force`` argument is a per-site
    [3, X, Y, Z] field DMA'd tile-by-tile into the kernel (reference macro
    force channels, kernels.h:92) - the carrier for IBM / non-Newtonian
    forcing (kernels/hooked.py).
    With ``macro_only=True`` the kernel is the Pallas u* PRE-PASS
    (reference kernels.h:178-218): stream + wall/symmetry transforms +
    moments with the homogeneous force, NO collision and NO f output -
    ``step(...)`` returns ``(rho0, u0)``.  Replaces the XLA ustar in
    kernels/hooked.py (round 3: ~0.53x the HBM traffic of a full step).
    """
    lat, codes, sym_codes, eq_kind, do_coll_codes = _prep(cfg, domain)
    Q = lat.Q
    X, Y, Z = local_shape if local_shape is not None else domain.shape
    dtype = cfg.compute_dtype
    periodic_z = bool(domain.periodic[2])
    interpret = jax.default_backend() == "cpu"
    Zp = _lane_pad(Z, interpret)
    itemsize = jnp.dtype(dtype).itemsize

    if tile is None:
        tile = (8, 8) if Z <= 192 else (4, 8)

    def vmem_bytes(tx, ty, K):
        tyK = ty * K
        scr = K * Q * (tx + 2) * (ty + 8) * Zp * itemsize
        out_ch = 4 if macro_only else Q + 4         # f out + rho + u
        bspec = 2 * (tx * tyK) * (
            Zp * 4                                  # map
            + out_ch * Z * itemsize
            + (3 * Zp * itemsize if force_field else 0)
        )
        return scr + bspec

    tx, ty, K = _fit_tiles_vmem(vmem_bytes, tile, tiles_per_program, X, Y,
                                budget_bytes=MOSAIC_SCRATCH_BUDGET)
    assert X % tx == 0 and Y % (ty * K) == 0, (X, Y, tile, K)
    assert ty % 8 == 0, "ty must be sublane-aligned (multiple of 8)"

    def kernel(params_ref, map_ref, *args):
        if force_field:
            force_ref, fpad_hbm, fout_ref, rho_ref, u_ref, *rest = args
        else:
            fpad_hbm, fout_ref, rho_ref, u_ref, *rest = args
            force_ref = None
        scratches = rest[:K]
        sem = rest[K]
        i = pl.program_id(0)
        j = pl.program_id(1)

        # K input DMAs in flight at once (static buffers - latency amortized)
        dmas = []
        for t in range(K):
            dma = pltpu.make_async_copy(
                fpad_hbm.at[:, pl.ds(i * tx, tx + 2), pl.ds((j * K + t) * ty, ty + 8), :],
                scratches[t],
                sem.at[t],
            )
            dma.start()
            dmas.append(dma)

        for t in range(K):
            dmas[t].wait()
            scratch = scratches[t]

            def shifted(q, offs, scratch=scratch):
                ox, oy, oz = offs
                base = scratch[q, 1 + ox : 1 + ox + tx, 1 + oy : 1 + oy + ty, :]
                return _zshift(base, oz, Z, periodic_z)

            m = map_ref[:, t * ty : (t + 1) * ty, :]
            ft = (force_ref[:, :, t * ty : (t + 1) * ty, :]
                  if force_ref is not None else None)
            f_post, rho_out, u_out = _stream_bc_collide(
                lat, cfg, codes, sym_codes, eq_kind, do_coll_codes, dtype,
                shifted, m, params_ref, force_tile=ft,
                macro_only=macro_only,
            )
            if not macro_only:
                fout_ref[:, :, t * ty : (t + 1) * ty, :] = f_post[..., :Z]
            if with_macro:
                rho_ref[:, t * ty : (t + 1) * ty, :] = rho_out[..., :Z]
                u_ref[:, :, t * ty : (t + 1) * ty, :] = u_out[..., :Z]

    grid = (X // tx, Y // (ty * K))
    tyK = ty * K
    dummy = (8, 8, 128)
    force_specs = [pl.BlockSpec((3, tx, tyK, Zp), lambda i, j: (0, i, j, 0),
                                memory_space=pltpu.VMEM)] if force_field else []
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params [8]
            pl.BlockSpec((tx, tyK, Zp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ]
        + force_specs
        + [
            pl.BlockSpec(memory_space=pl.ANY),  # fpad stays in HBM
        ],
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
        scratch_shapes=[pltpu.VMEM((Q, tx + 2, ty + 8, Zp), dtype) for _ in range(K)]
        + [pltpu.SemaphoreType.DMA((K,))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    # map padded to the lane multiple (the mask-selects combine it with
    # Zp-laned DF tiles); the edge codes at junk lanes keep the (discarded)
    # pad-lane arithmetic finite
    map_arr = np.pad(np.asarray(domain.map, np.int32),
                     [(0, 0), (0, 0), (0, Zp - Z)], mode="edge")

    def _zpad(arr):
        if Zp == Z:
            return arr
        pw = [(0, 0)] * (arr.ndim - 1) + [(0, Zp - Z)]
        return jnp.pad(arr, pw, mode="edge")

    def step(f, nu, u_in=None, force=None, parity: int = 0, map_arr_in=None):
        del parity
        mp = map_arr if map_arr_in is None else _zpad(map_arr_in)
        fpad = (_zpad(f) if prepadded
                else _pad_once(f, domain.periodic, extra_y=6, extra_z=Zp - Z))
        if force_field:
            assert force is not None and force.ndim == 4, \
                "force_field kernel expects a [3, X, Y, Z] force"
            params = _params_vec(dtype, nu, u_in, None)
            f_new, rho, u = call(params, mp, _zpad(force.astype(dtype)), fpad)
        else:
            f_new, rho, u = call(_params_vec(dtype, nu, u_in, force), mp, fpad)
        if macro_only:
            return rho, u
        if not with_macro:
            return f_new, None, None
        return f_new, rho, u

    return step


QPAD = 32  # Q padded to a full sublane tile in the site-major layout


def to_sitemajor(f):
    """[Q, X, Y, Z] -> [X, Y, QPAD, Z] (zero-fill the dummy components)."""
    fq = jnp.moveaxis(f, 0, 2)
    return jnp.pad(fq, [(0, 0), (0, 0), (0, QPAD - f.shape[0]), (0, 0)])


def from_sitemajor(fs, Q):
    """[X, Y, QPAD, Z] -> [Q, X, Y, Z]."""
    return jnp.moveaxis(fs[:, :, :Q, :], 2, 0)


def make_fused_step_sitemajor(cfg: LBMConfig, domain: Domain, tile=None,
                              tiles_per_program: int = 2, with_macro: bool = True):
    """Site-major fused step: step(fs, nu, u_in, force) -> (fs_new, rho, u).

    State is [X, Y, QPAD, Z] (use to_sitemajor/from_sitemajor at the
    boundaries).  Both sliced axes are untiled in this layout, so halo DMA
    windows are exact and each chunk is one contiguous (QPAD, Z) run.
    """
    lat, codes, sym_codes, eq_kind, do_coll_codes = _prep(cfg, domain)
    Q = lat.Q
    X, Y, Z = domain.shape
    dtype = cfg.compute_dtype
    periodic_z = bool(domain.periodic[2])

    if tile is None:
        tile = (8, 8)
    tx, ty = tile
    K = tiles_per_program
    while K > 1 and Y % (ty * K) != 0:
        K -= 1
    assert X % tx == 0 and Y % (ty * K) == 0, (X, Y, tile, K)

    def kernel(params_ref, map_ref, fpad_hbm, fout_ref, rho_ref, u_ref, *rest):
        scratches = rest[:K]
        sem = rest[K]
        i = pl.program_id(0)
        j = pl.program_id(1)

        dmas = []
        for t in range(K):
            dma = pltpu.make_async_copy(
                fpad_hbm.at[pl.ds(i * tx, tx + 2), pl.ds((j * K + t) * ty, ty + 2), :, :],
                scratches[t],
                sem.at[t],
            )
            dma.start()
            dmas.append(dma)

        for t in range(K):
            dmas[t].wait()
            scratch = scratches[t]

            def shifted(q, offs, scratch=scratch):
                ox, oy, oz = offs
                base = scratch[1 + ox : 1 + ox + tx, 1 + oy : 1 + oy + ty, q, :]
                return _zshift(base, oz, Z, periodic_z)

            m = map_ref[:, t * ty : (t + 1) * ty, :]
            f_post, rho_out, u_out = _stream_bc_collide(
                lat, cfg, codes, sym_codes, eq_kind, do_coll_codes, dtype,
                shifted, m, params_ref,
            )
            # write back site-major: [tx, ty, QPAD, Z]
            zeros = jnp.zeros_like(f_post[0])
            stacked = jnp.stack(
                [f_post[q] for q in range(Q)] + [zeros] * (QPAD - Q), axis=2
            )
            fout_ref[:, t * ty : (t + 1) * ty, :, :] = stacked
            if with_macro:
                rho_ref[:, t * ty : (t + 1) * ty, :] = rho_out
                u_ref[:, :, t * ty : (t + 1) * ty, :] = u_out

    grid = (X // tx, Y // (ty * K))
    tyK = ty * K
    interpret = jax.default_backend() == "cpu"
    dummy = (8, 8, 128)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tx, tyK, Z), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((tx, tyK, QPAD, Z), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tx, tyK, Z) if with_macro else dummy,
                         (lambda i, j: (i, j, 0)) if with_macro else (lambda i, j: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tx, tyK, Z) if with_macro else (3,) + dummy,
                         (lambda i, j: (0, i, j, 0)) if with_macro else (lambda i, j: (0, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((X, Y, QPAD, Z), dtype),
            jax.ShapeDtypeStruct((X, Y, Z) if with_macro else dummy, dtype),
            jax.ShapeDtypeStruct((3, X, Y, Z) if with_macro else (3,) + dummy, dtype),
        ),
        scratch_shapes=[pltpu.VMEM((tx + 2, ty + 2, QPAD, Z), dtype) for _ in range(K)]
        + [pltpu.SemaphoreType.DMA((K,))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    map_arr = np.asarray(domain.map, np.int32)

    def step(fs, nu, u_in=None, force=None, parity: int = 0, map_arr_in=None):
        del parity
        mp = map_arr if map_arr_in is None else map_arr_in
        fpad = _pad_once_sitemajor(fs, domain.periodic)
        f_new, rho, u = call(_params_vec(dtype, nu, u_in, force), mp, fpad)
        if not with_macro:
            return f_new, None, None
        return f_new, rho, u

    return step
