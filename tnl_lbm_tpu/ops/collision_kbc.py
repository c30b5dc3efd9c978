"""Entropic KBC collision operators (8 variants) for D3Q27.

Karlin-Bosch-Chikatamarla models (arXiv:1507.02518; reference
d3q27/col_kbc_n.h, col_kbc_c.h): the DF is decomposed per site as
f_i = k_i + s_i + h_i, the shear part s relaxes at beta and the higher-order
part h at beta*gamma with the entropic stabilizer

    gamma = 1/beta - (2 - 1/beta) <ds|dh> / <dh|dh>,
    <x|y> = sum_i x_i y_i / feq_i,

so f' = f - beta (2 ds + gamma dh), beta = 1/(6 nu + 1).

Variant table (reference col_kbc_n.h:10-21): the shear part contains
  N1/C1: D (deviatoric stress)     N2/C2: D + T (trace)
  N3/C3: D + Q (heat flux)         N4/C4: D + T + Q
with raw-moment (N) or central-moment (C) representation.  The deltas of D
and T are identical in both representations (delta of second-order central
moments equals delta of raw ones); only the Q deltas differ.  feq is the
factorized (inverse-cumulant) equilibrium, as in the reference.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.models.descriptors import D3Q27, LatticeDescriptor
from tnl_lbm_tpu.ops.collision import central_moments
from tnl_lbm_tpu.ops.equilibrium import eq_inv_cum
from tnl_lbm_tpu.ops.contract import lattice_dot


def _raw_moment(lat, f, a, b, g):
    c = lat.c.astype(np.float64)
    coef = (c[:, 0] ** a) * (c[:, 1] ** b) * (c[:, 2] ** g)
    return lattice_dot(coef, f)


def _delta_s_second_order(lat, f, rho, u, with_trace):
    """ds contributions of D (and optionally T), as per-direction arrays.

    Uses the delta moments directly: dN_xz, dN_yz, dP_ab, dT.
    """
    vx, vy, vz = u[0], u[1], u[2]
    M200 = _raw_moment(lat, f, 2, 0, 0)
    M020 = _raw_moment(lat, f, 0, 2, 0)
    M002 = _raw_moment(lat, f, 0, 0, 2)
    M110 = _raw_moment(lat, f, 1, 1, 0)
    M101 = _raw_moment(lat, f, 1, 0, 1)
    M011 = _raw_moment(lat, f, 0, 1, 1)

    dNxz = (M200 - M002) - rho * (vx * vx - vz * vz)
    dNyz = (M020 - M002) - rho * (vy * vy - vz * vz)
    dPxy = M110 - rho * vx * vy
    dPxz = M101 - rho * vx * vz
    dPyz = M011 - rho * vy * vz
    dT = (M200 + M020 + M002) - rho * (1.0 + vx * vx + vy * vy + vz * vz)

    rows = []
    for q in range(lat.Q):
        cx, cy, cz = (int(v) for v in lat.c[q])
        nz = (cx != 0) + (cy != 0) + (cz != 0)
        expr = 0.0
        if nz == 1:  # face
            if cx != 0:
                expr = (2 * dNxz - dNyz) / 6.0
            elif cy != 0:
                expr = (-dNxz + 2 * dNyz) / 6.0
            else:
                expr = (-dNxz - dNyz) / 6.0
            if with_trace:
                expr = expr + dT / 6.0
        elif nz == 2:  # edge
            if cz == 0:
                expr = (cx * cy) * dPxy / 4.0
            elif cy == 0:
                expr = (cx * cz) * dPxz / 4.0
            else:
                expr = (cy * cz) * dPyz / 4.0
        elif nz == 0 and with_trace:
            expr = -dT
        rows.append(expr + jnp.zeros_like(rho))
    return jnp.stack(rows)


def _delta_s_heatflux(lat, f, rho, u, central):
    """ds contribution of the heat-flux tensor Q (raw or central deltas)."""
    vx, vy, vz = u[0], u[1], u[2]
    if central:
        k = central_moments(lat, f, u)
        dQ = {
            "xxy": k[2][1][0], "xxz": k[2][0][1], "xyy": k[1][2][0],
            "yyz": k[0][2][1], "xzz": k[1][0][2], "yzz": k[0][1][2],
            "xyz": k[1][1][1],
        }
    else:
        cs2 = 1.0 / 3.0
        dQ = {
            "xxy": _raw_moment(lat, f, 2, 1, 0) - rho * vy * (cs2 + vx * vx),
            "xxz": _raw_moment(lat, f, 2, 0, 1) - rho * vz * (cs2 + vx * vx),
            "xyy": _raw_moment(lat, f, 1, 2, 0) - rho * vx * (cs2 + vy * vy),
            "yyz": _raw_moment(lat, f, 0, 2, 1) - rho * vz * (cs2 + vy * vy),
            "xzz": _raw_moment(lat, f, 1, 0, 2) - rho * vx * (cs2 + vz * vz),
            "yzz": _raw_moment(lat, f, 0, 1, 2) - rho * vy * (cs2 + vz * vz),
            "xyz": _raw_moment(lat, f, 1, 1, 1) - rho * vx * vy * vz,
        }

    rows = []
    for q in range(lat.Q):
        cx, cy, cz = (int(v) for v in lat.c[q])
        nz = (cx != 0) + (cy != 0) + (cz != 0)
        expr = 0.0
        if nz == 1:
            if cx != 0:
                expr = -cx * (dQ["xyy"] + dQ["xzz"]) / 2.0
            elif cy != 0:
                expr = -cy * (dQ["xxy"] + dQ["yzz"]) / 2.0
            else:
                expr = -cz * (dQ["xxz"] + dQ["yyz"]) / 2.0
        elif nz == 2:
            if cz == 0:
                expr = (cx * dQ["xyy"] + cy * dQ["xxy"]) / 4.0
            elif cy == 0:
                expr = (cx * dQ["xzz"] + cz * dQ["xxz"]) / 4.0
            else:
                expr = (cy * dQ["yzz"] + cz * dQ["yyz"]) / 4.0
        elif nz == 3:
            expr = (cx * cy * cz) * dQ["xyz"] / 8.0
        rows.append(expr + jnp.zeros_like(rho))
    return jnp.stack(rows)


def collide_kbc(lat, f, rho, u, nu, force=None, variant: str = "N1"):
    """KBC collision, variant in {N1..N4, C1..C4}."""
    del force  # reference KBC operators carry no forcing
    kind, num = variant[0], int(variant[1])
    with_trace = num in (2, 4)
    with_q = num in (3, 4)

    ds = _delta_s_second_order(lat, f, rho, u, with_trace)
    if with_q:
        ds = ds + _delta_s_heatflux(lat, f, rho, u, central=(kind == "C"))

    feq = eq_inv_cum(lat, rho, u)
    ifeq = 1.0 / feq
    dh = (f - feq) - ds

    beta = 1.0 / (6.0 * nu + 1.0)
    num_sp = jnp.sum(ds * dh * ifeq, axis=0)
    den_sp = jnp.sum(dh * dh * ifeq, axis=0)
    eps = jnp.asarray(1e-30, f.dtype)
    gamma = 1.0 / beta - (2.0 - 1.0 / beta) * num_sp / jnp.where(den_sp == 0, eps, den_sp)
    gamma = jnp.where(den_sp == 0, 2.0, gamma)

    return f - beta * (2.0 * ds + gamma * dh)


COLLISIONS_KBC = {
    f"KBC_{k}{n}": partial(collide_kbc, variant=f"{k}{n}")
    for k in ("N", "C")
    for n in (1, 2, 3, 4)
}
