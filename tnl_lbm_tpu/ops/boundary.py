"""Geometry-map boundary conditions, applied as mask-selects.

The reference dispatches per site over a GEO byte in a device switch
(reference: d3q27/bc.h:51-241, d2q9/bc.h:89-196).  A per-lane switch is
poison on the TPU VPU, so here every BC is a dense whole-array transform
gated by a precomputed boolean mask; the step function only materializes
transforms for GEO codes actually present in the map (static specialization
at trace time).

GEO code values are free-form (we use one shared enum for the NSE lattices);
semantics match the reference case-by-case.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.models.descriptors import LatticeDescriptor


class GEO(enum.IntEnum):
    """Geometry codes for NSE lattices (reference d3q27/bc.h:17-34, d2q9/bc.h:16-34)."""

    FLUID = 0
    WALL = 1
    INFLOW = 2
    INFLOW_LEFT = 3           # moment inflow BC (Eichler), D3Q27 only
    OUTFLOW_EQ = 4
    OUTFLOW_RIGHT = 5
    OUTFLOW_RIGHT_INTERP = 6
    PERIODIC = 7
    NOTHING = 8               # inert ghost site
    SYM_TOP = 9               # symmetry planes (axis/side table below)
    SYM_BOTTOM = 10
    SYM_LEFT = 11
    SYM_RIGHT = 12
    SYM_BACK = 13
    SYM_FRONT = 14
    FLUID_NEAR_WALL = 15      # Bouzidi curved-wall interpolation (D2Q9)
    TRANSFER_FS = 16          # conjugate-transfer tags (ADE coupling)
    TRANSFER_SF = 17
    TRANSFER_SW = 18


#: SYM code -> (axis, removed_sign): incoming components with
#: c[axis] == removed_sign are replaced by their mirror image.
#: "vertical" axis is z in 3D and y in 2D (reference d3q27/bc.h:165-236,
#: d2q9/bc.h:168-191).
def sym_table(D: int):
    vert = D - 1
    table = {
        GEO.SYM_TOP: (vert, -1),
        GEO.SYM_BOTTOM: (vert, +1),
        GEO.SYM_LEFT: (0, +1),
        GEO.SYM_RIGHT: (0, -1),
    }
    if D == 3:
        table[GEO.SYM_BACK] = (1, +1)
        table[GEO.SYM_FRONT] = (1, -1)
    return table


def collision_mask_codes(D: int):
    """GEO codes on which the collision operator runs
    (reference d3q27/bc.h:243-248, d2q9/bc.h:198-203)."""
    codes = {GEO.FLUID, GEO.PERIODIC, GEO.OUTFLOW_RIGHT, GEO.OUTFLOW_RIGHT_INTERP,
             GEO.FLUID_NEAR_WALL}
    if D == 3:
        codes.add(GEO.INFLOW_LEFT)
    return codes


def apply_bounce_back(lat: LatticeDescriptor, f: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Full-way bounce back: f[q] <- f[opp(q)] on masked sites
    (reference d3q27/bc.h:150-163)."""
    return jnp.where(mask, f[np.asarray(lat.opp)], f)


def apply_symmetry(lat: LatticeDescriptor, f: jnp.ndarray, mask: jnp.ndarray, axis: int, removed_sign: int) -> jnp.ndarray:
    """Mirror components with c[axis] == removed_sign on masked sites."""
    mirror = np.asarray(lat.mirror(axis))
    qsel = (lat.c[:, axis] == removed_sign)
    qsel = jnp.asarray(qsel.reshape((lat.Q,) + (1,) * (f.ndim - 1)))
    f_mirr = f[mirror]
    return jnp.where(mask & qsel, f_mirr, f)


def inflow_left_moment_bc(lat: LatticeDescriptor, f: jnp.ndarray, u_in: jnp.ndarray):
    """Moment inflow BC at the -x boundary (Eichler et al. 2024,
    https://doi.org/10.1016/j.camwa.2024.08.009; reference d3q27/bc.h:77-128).

    The 9 unknown incoming DFs (c_x = +1) are reconstructed from prescribed
    velocity and the known DFs; the density follows from the c_x<=0 sums.
    Returns (f_new, rho).  Only valid for D3Q27.
    """
    assert lat.name == "D3Q27"
    ix = lat.idx
    vx, vy, vz = u_in[0], u_in[1], u_in[2]

    def g(*names):
        return sum(f[ix(n)] for n in names)

    s_zero = f[ix("zzz")] + g("zpp", "zmm", "zpm", "zmp") + g("zpz", "zmz", "zzp", "zzm")
    s_minus = f[ix("mzz")] + g("mpp", "mmm", "mpm", "mmp") + g("mpz", "mmz", "mzp", "mzm")
    rho = (s_zero + 2 * s_minus) / (1 - vx)

    m100 = rho * vx
    m010 = rho * vy
    m001 = rho * vz
    m011 = rho * vy * vz
    m020 = rho / 3 + rho * vy * vy
    m002 = rho / 3 + rho * vz * vz
    m021 = rho * vz / 3 + rho * vy * vy * vz
    m012 = rho * vy / 3 + rho * vy * vz * vz
    m022 = rho / 9 + rho / 3 * (vy * vy + vz * vz) + rho * vy * vy * vz * vz

    new = {}
    new["pzz"] = (
        m100 + (m022 - (m020 + m002))
        + f[ix("mzz")]
        + (g("zpp", "zmm", "zpm", "zmp") + g("zzp", "zzm", "zpz", "zmz"))
        + 2 * (g("mpp", "mmm", "mpm", "mmp") + g("mpz", "mmz", "mzp", "mzm"))
    )
    new["ppz"] = 0.5 * ((m020 - m022) + (-m012 + m010)) - (f[ix("mpz")] + f[ix("zpz")])
    new["pmz"] = 0.5 * ((m020 - m022) + (m012 - m010)) - (f[ix("mmz")] + f[ix("zmz")])
    new["pzp"] = 0.5 * ((m002 - m022) + (-m021 + m001)) - (f[ix("mzp")] + f[ix("zzp")])
    new["pzm"] = 0.5 * ((m002 - m022) + (m021 - m001)) - (f[ix("mzm")] + f[ix("zzm")])
    new["ppp"] = 0.25 * ((m022 + m011) + (m021 + m012)) - (f[ix("mpp")] + f[ix("zpp")])
    new["ppm"] = 0.25 * ((m022 - m011) + (-m021 + m012)) - (f[ix("mpm")] + f[ix("zpm")])
    new["pmp"] = 0.25 * ((m022 - m011) + (m021 - m012)) - (f[ix("mmp")] + f[ix("zmp")])
    new["pmm"] = 0.25 * ((m022 + m011) + (-m021 - m012)) - (f[ix("mmm")] + f[ix("zmm")])

    rows = [new[lat.names[q]] if lat.names[q] in new else f[q] for q in range(lat.Q)]
    return jnp.stack(rows), rho
