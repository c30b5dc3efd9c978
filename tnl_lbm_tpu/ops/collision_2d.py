"""D2Q9 collision operators: SRT (Guo forcing) and cascaded/central-moment CLBM.

Reference counterparts: d2q9/col_srt.h (SRT with per-direction Guo forcing
terms) and d2q9/col_clbm.h (cascaded LBM after Geier/Premnath with
central-moment forcing, Premnath & Banerjee arXiv:1202.6087).

The CLBM here is implemented directly in central-moment space with the same
relaxation structure as the reference: shear moments (kappa_11 and
kappa_20 - kappa_02) relax at omega = 1/tau; the trace, the third-order and
the fourth-order central moments relax at rate 1 to their factorized
equilibria (0, 0, rho/9); first-order central moments are negated, which
realizes trapezoidal (Premnath) forcing given that u includes F/2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.models.descriptors import D2Q9, LatticeDescriptor
from tnl_lbm_tpu.ops import equilibrium as eqlib
from tnl_lbm_tpu.ops.collision import _backward_axis, _forward_axis
from tnl_lbm_tpu.ops.contract import lattice_dot


def guo_forcing(lat: LatticeDescriptor, u: jnp.ndarray, force: jnp.ndarray) -> jnp.ndarray:
    """Classic Guo forcing: w_q [ics2 (c_q - u).F + ics2^2 (c_q.u)(c_q.F)].

    This is the form the reference expands per direction for D2Q9
    (d2q9/col_srt.h:21-35).  Returns [Q, *S]; multiply by (1 - omega/2).
    """
    ics2 = float(lat.i_cs2)
    cF = lattice_dot(lat.c, force)
    cu = lattice_dot(lat.c, u)
    uF = jnp.sum(u * force, axis=0)
    body = ics2 * (cF - uF) + ics2 * ics2 * cu * cF
    # per-q scalar weights (not a [Q]-array constant): kernel-safe
    return jnp.stack([float(lat.w[q]) * body[q] for q in range(lat.Q)])


def collide_srt_2d(lat, f, rho, u, nu, force=None, eq=eqlib.eq_quadratic):
    """D2Q9 improved SRT (reference d2q9/col_srt.h:17-46)."""
    omega = 1.0 / (3.0 * nu + 0.5)
    feq = eq(lat, rho, u)
    out = f + (feq - f) * omega
    if force is not None:
        out = out + (1 - 0.5 * omega) * guo_forcing(lat, u, force)
    return out


def _f_as_tensor_2d(lat, f):
    T = [[None] * 3 for _ in range(3)]
    for q in range(lat.Q):
        cx, cy = (int(v) for v in lat.c[q])
        T[cx + 1][cy + 1] = f[q]
    return T


def _tensor_as_f_2d(lat, T):
    return jnp.stack([
        T[int(lat.c[q, 0]) + 1][int(lat.c[q, 1]) + 1] for q in range(lat.Q)
    ])


def central_moments_2d(lat, f, u):
    """kappa[a][b] for D2Q9 (orders a along x, b along y)."""
    vx, vy = u[0], u[1]
    F = _f_as_tensor_2d(lat, f)
    Ky = [_forward_axis(tuple(F[ix][iy] for iy in range(3)), vy) for ix in range(3)]
    k = [[None] * 3 for _ in range(3)]
    for b in range(3):
        k0, k1, k2 = _forward_axis(tuple(Ky[ix][b] for ix in range(3)), vx)
        k[0][b], k[1][b], k[2][b] = k0, k1, k2
    return k


def dfs_from_central_moments_2d(lat, k, u):
    vx, vy = u[0], u[1]
    Bx = [[None] * 3 for _ in range(3)]
    for b in range(3):
        fm, fz, fp = _backward_axis((k[0][b], k[1][b], k[2][b]), vx)
        Bx[0][b], Bx[1][b], Bx[2][b] = fm, fz, fp
    T = [[None] * 3 for _ in range(3)]
    for ix in range(3):
        fm, fz, fp = _backward_axis((Bx[ix][0], Bx[ix][1], Bx[ix][2]), vy)
        T[ix][0], T[ix][1], T[ix][2] = fm, fz, fp
    return _tensor_as_f_2d(lat, T)


def collide_clbm_2d(lat, f, rho, u, nu, force=None):
    """Cascaded (central-moment) LBM for D2Q9 (reference d2q9/col_clbm.h)."""
    del force  # enters via u (which includes F/2) + first-moment negation
    omega = 1.0 / (3.0 * nu + 0.5)
    k = central_moments_2d(lat, f, u)

    trace = k[2][0] + k[0][2]
    diff = k[2][0] - k[0][2]
    diff_s = (1 - omega) * diff
    trace_s = (2.0 / 3.0) * rho  # bulk relaxed at rate 1 to equilibrium
    k11_s = (1 - omega) * k[1][1]

    ks = [[None] * 3 for _ in range(3)]
    ks[0][0] = k[0][0]
    ks[1][0] = -k[1][0]
    ks[0][1] = -k[0][1]
    ks[1][1] = k11_s
    ks[2][0] = 0.5 * (trace_s + diff_s)
    ks[0][2] = 0.5 * (trace_s - diff_s)
    # third and fourth order: relax at rate 1 to factorized equilibria
    ks[2][1] = jnp.zeros_like(rho)
    ks[1][2] = jnp.zeros_like(rho)
    ks[2][2] = rho / 9.0
    del trace
    return dfs_from_central_moments_2d(lat, ks, u)


COLLISIONS_D2Q9 = {
    "SRT": collide_srt_2d,
    "CLBM": collide_clbm_2d,
}
