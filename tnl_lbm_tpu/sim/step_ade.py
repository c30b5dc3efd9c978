"""Fused step for the D3Q7 advection-diffusion lattice (scalar transport).

Analog of the ADE half of the reference's coupled kernel
(reference: kernels.h:153-176 with d3q7/bc.h): the advecting velocity comes
from the NSE lattice; BCs include conjugate heat/mass transfer between fluid
and solid phases (GEO_TRANSFER_FS/SF with per-direction flags and a transfer
coefficient, reference d3q7/bc.h:142-189), anti-bounce-back walls with
imposed concentration (GEO_WALL_BODY, Krueger sect. 8.5.2.1; reference
d3q7/bc.h:101-115), and Peclet-extrapolation outflow (GEO_OUTFLOW_PE,
reference d3q7/bc.h:85-89).

The diffusion coefficient may be a per-site field (variable diffusion,
reference lbm_data.h:133-165 ADE_Data).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.ops import moments as mom
from tnl_lbm_tpu.ops import streaming as stream
from tnl_lbm_tpu.sim.config import Domain, LBMConfig


class ADEGEO(enum.IntEnum):
    """Geometry codes for the ADE lattice (reference d3q7/bc.h:17-37)."""

    FLUID = 0
    WALL = 1
    WALL_BODY = 2
    SOLID = 3
    TRANSFER_FS = 4
    TRANSFER_SF = 5
    TRANSFER_SW = 6
    INFLOW = 7
    OUTFLOW_RIGHT = 8
    PERIODIC = 9
    NOTHING = 10
    OUTFLOW_PE = 11
    SYM_TOP = 12
    SYM_BOTTOM = 13
    SYM_LEFT = 14
    SYM_RIGHT = 15
    SYM_BACK = 16
    SYM_FRONT = 17


#: codes belonging to the solid phase (reference d3q7/bc.h:59-62)
SOLID_PHASE = {ADEGEO.SOLID, ADEGEO.TRANSFER_SF, ADEGEO.TRANSFER_SW}

_COLLIDING = {
    ADEGEO.FLUID, ADEGEO.PERIODIC, ADEGEO.SOLID,
    ADEGEO.TRANSFER_FS, ADEGEO.TRANSFER_SF, ADEGEO.TRANSFER_SW,
    ADEGEO.OUTFLOW_RIGHT,
}

# SYM code -> (axis, removed component sign); D3Q7 mirrors one face DF
_SYM = {
    ADEGEO.SYM_TOP: (2, -1),
    ADEGEO.SYM_BOTTOM: (2, +1),
    ADEGEO.SYM_LEFT: (0, +1),
    ADEGEO.SYM_RIGHT: (0, -1),
    ADEGEO.SYM_BACK: (1, +1),
    ADEGEO.SYM_FRONT: (1, -1),
}


def _pull_offset(lat, g, periodic, shape, extra_dx):
    """Standard pull with all x-offsets shifted by ``extra_dx``.

    The x offsets reach ``-1 + extra_dx`` (= -2 for the Peclet outflow), so
    this pads its own 2-wide x halo; a 1-wide pad would slice negatively
    and silently produce empty arrays.
    """
    widths = (2,) + (1,) * (len(shape) - 1)
    gpad = g
    for axis, (w, per) in enumerate(zip(widths, periodic)):
        pad_width = [(0, 0)] * g.ndim
        pad_width[axis + 1] = (w, w)
        gpad = jnp.pad(gpad, pad_width, mode="wrap" if per else "edge")
    out = []
    for q in range(lat.Q):
        off = [-int(c) for c in lat.c[q]]
        off[0] += extra_dx
        index = tuple(
            slice(w + o, w + o + n) for w, o, n in zip(widths, off, shape)
        )
        out.append(gpad[(q,) + index])
    return jnp.stack(out)


def make_ade_step(cfg: LBMConfig, domain: Domain, pad_halo=None, local_shape=None):
    """Build ``step(g, u, nu, phi_in=None, transfer_dirs=None,
    transfer_coeff=0, parity=0, map_arr=None) -> (g_new, phi)``.

    ``u`` is the advecting velocity field [3, *S] (from the NSE lattice);
    ``transfer_dirs`` is a bool field [Q-1, *S] (per non-rest direction,
    ordered like lat.names[1:]) marking links that cross the phase interface.
    """
    lat = cfg.lat
    S = tuple(local_shape) if local_shape is not None else domain.shape
    dtype = cfg.compute_dtype
    codes = {ADEGEO(int(c)) for c in np.unique(domain.map)}
    opp = np.asarray(lat.opp)
    if pad_halo is None:
        pad_halo = lambda f, comps="all": stream.pad_halo(f, domain.periodic)  # noqa: E731

    sym_codes = [c for c in codes if c in _SYM]
    do_coll_codes = np.array([int(c) for c in (_COLLIDING & codes)], dtype=domain.map.dtype)
    if cfg.streaming == "AA" and ADEGEO.OUTFLOW_PE in codes:
        raise NotImplementedError("OUTFLOW_PE requires the A-B pattern")

    def step(g, u, nu, phi_in=None, transfer_dirs=None, transfer_coeff=0.0,
             parity: int = 0, map_arr=None):
        if map_arr is None:
            map_arr = jnp.asarray(domain.map)
        masks = {c: map_arr == int(c) for c in codes}
        do_coll = jnp.isin(map_arr, jnp.asarray(do_coll_codes))
        g_old = g

        # streaming (A-B pull or A-A parity, like the NSE step)
        if cfg.streaming == "AA" and parity == 0:
            f_in = g
            fpad = None
        else:
            # direction-subset halo hint (df_sync_directions analog);
            # OUTFLOW_RIGHT's pull-shift reads x-1 for every component, so
            # its presence forces the full exchange
            comps = ("all" if ADEGEO.OUTFLOW_RIGHT in codes
                     else ("opp" if cfg.streaming == "AA" else "own"))
            fpad = pad_halo(g, comps=comps)
            if cfg.streaming == "AA":
                f_in = stream.pull_from(lat, fpad, S, opp)
            else:
                f_in = stream.pull(lat, fpad, S)
            if ADEGEO.OUTFLOW_RIGHT in codes:
                f_in = jnp.where(masks[ADEGEO.OUTFLOW_RIGHT], stream.pull_shift_x(lat, fpad, S, dx=-1), f_in)
            if ADEGEO.OUTFLOW_PE in codes:
                f_in = jnp.where(
                    masks[ADEGEO.OUTFLOW_PE],
                    _pull_offset(lat, g, domain.periodic, S, -1),
                    f_in,
                )

        # wall bounce-back (swap all opposite pairs)
        for wall_code in (ADEGEO.WALL, ADEGEO.WALL_BODY):
            if wall_code in codes:
                f_in = jnp.where(masks[wall_code], f_in[opp], f_in)
        if ADEGEO.WALL_BODY in codes:
            # anti-bounce-back with imposed concentration phi_prev
            # (reference d3q7/bc.h:101-115)
            w = jnp.asarray(lat.w, dtype).reshape((lat.Q,) + (1,) * len(S))
            phi_prev = mom.density(lat, g_old)
            f_abb = -f_in + 2 * w * phi_prev
            f_in = jnp.where(masks[ADEGEO.WALL_BODY], f_abb, f_in)

        for c in sym_codes:
            axis, sign = _SYM[c]
            mirror = np.asarray(lat.mirror(axis))
            qsel = jnp.asarray(
                (lat.c[:, axis] == sign).reshape((lat.Q,) + (1,) * len(S))
            )
            f_in = jnp.where(masks[c] & qsel, f_in[mirror], f_in)

        # conjugate transfer BCs (reference d3q7/bc.h:142-189)
        needs_transfer = codes & {ADEGEO.TRANSFER_FS, ADEGEO.TRANSFER_SF, ADEGEO.TRANSFER_SW}
        if needs_transfer and transfer_dirs is not None:
            phi_tot = mom.density(lat, g_old)  # per-site scalar, pre-streaming
            phipad = pad_halo(phi_tot[None], comps="all")[0]
            g_center = g_old
            rows = [f_in[0]]
            for q in range(1, lat.Q):
                qo = int(opp[q])
                # incoming DF f_in[q] was pulled from x - c_q; the link flag
                # is stored for the *outgoing* direction opp(q)
                flag = transfer_dirs[qo - 1]
                # neighbor phi in direction opp(q) = at x - c_q
                nb_phi = stream._shift_slices(phipad, [-int(c) for c in lat.c[q]], S)
                reflected = g_center[qo]
                fs_sf = reflected + transfer_coeff * (nb_phi - phi_tot)
                row = f_in[q]
                for code, repl in ((ADEGEO.TRANSFER_FS, fs_sf), (ADEGEO.TRANSFER_SF, fs_sf), (ADEGEO.TRANSFER_SW, reflected)):
                    if code in codes:
                        row = jnp.where(masks[code] & flag, repl, row)
                rows.append(row)
            f_in = jnp.stack(rows)

        phi = mom.density(lat, f_in)

        if ADEGEO.INFLOW in codes and phi_in is not None:
            m = masks[ADEGEO.INFLOW]
            phi_b = jnp.asarray(phi_in, dtype)
            feq_in = cfg.eq(lat, phi_b, u).astype(dtype)
            f_in = jnp.where(m, feq_in, f_in)
            phi = jnp.where(m, jnp.broadcast_to(phi_b, phi.shape), phi)
        if ADEGEO.OUTFLOW_PE in codes:
            m = masks[ADEGEO.OUTFLOW_PE]
            f_in = jnp.where(m, cfg.eq(lat, phi, u), f_in)

        f_post = cfg.collision(lat, f_in, phi, u, nu)
        f_post = jnp.where(do_coll, f_post, f_in)

        if cfg.streaming == "AA":
            if parity == 0:
                g_out = f_post[opp]
            else:
                g_out = stream.pull(lat, pad_halo(f_post, comps="own"), S)
        else:
            g_out = f_post

        if ADEGEO.NOTHING in codes:
            g_out = jnp.where(masks[ADEGEO.NOTHING], g_old, g_out)
            phi = jnp.where(masks[ADEGEO.NOTHING], jnp.zeros_like(phi), phi)
        return g_out, phi

    return step


def transfer_direction_flags(lat, map_arr: np.ndarray) -> np.ndarray:
    """Precompute the per-direction interface flags for the transfer BCs.

    Flag[q-1, x] is True when the link from site x in direction q crosses
    the fluid/solid phase boundary (reference lbm_block helper that fills
    ADE_Data::phiTransferDirection).
    """
    solid = np.isin(map_arr, [int(c) for c in SOLID_PHASE])
    flags = np.zeros((lat.Q - 1,) + map_arr.shape, dtype=bool)
    for q in range(1, lat.Q):
        shifted = solid
        for a, c in enumerate(lat.c[q]):
            shifted = np.roll(shifted, -int(c), axis=a)
        flags[q - 1] = shifted != solid
    return flags
