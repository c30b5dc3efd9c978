"""D3Q7 collision operators for advection-diffusion (scalar transport).

Reference counterparts: d3q7/col_srt.h, col_mrt.h, col_clbm.h, col_clbm_RS.h.
Here ``rho`` plays the role of the scalar ``phi``, ``u`` is the advecting
velocity (copied from the NSE lattice in coupled runs) and ``nu`` is the
lattice diffusion coefficient, possibly a per-site field (the variable
diffusion-coefficient hookup, reference d3q7/macro.h:6-37).
cs^2 = 1/4 for this lattice (reference d3q7/eq.h:13).
"""

from __future__ import annotations

import jax.numpy as jnp

from tnl_lbm_tpu.models.descriptors import D3Q7
from tnl_lbm_tpu.ops import equilibrium as eqlib


def _omega(lat, nu):
    return 1.0 / (0.5 + float(lat.i_cs2) * nu)


def collide_srt_ade(lat, f, rho, u, nu, force=None):
    """SRT for ADE (reference d3q7/col_srt.h:15-28)."""
    del force
    omega = _omega(lat, nu)
    feq = eqlib.eq_quadratic(lat, rho, u)
    return f + omega * (feq - f)


def _axis_arrays(lat, f):
    """(f_minus, f_plus) per axis in lattice order x, y, z."""
    ix = lat.idx
    return [
        (f[ix("mzz")], f[ix("pzz")]),
        (f[ix("zmz")], f[ix("zpz")]),
        (f[ix("zzm")], f[ix("zzp")]),
    ]


def collide_mrt_ade(lat, f, rho, u, nu, force=None):
    """Raw-moment MRT for ADE (reference d3q7/col_mrt.h:15-52): first
    moments relax at omega, second at rate 1, toward the equilibria."""
    del force
    cs2 = 1.0 / float(lat.i_cs2)
    omega = _omega(lat, nu)
    pairs = _axis_arrays(lat, f)
    m1 = []
    m2 = []
    for a, (fm, fp) in enumerate(pairs):
        m1.append((rho * u[a] + fm - fp) * omega)       # mu_eq - mu, relaxed
        m2.append((rho * (u[a] * u[a] + cs2) - fm - fp) * 1.0)
    out = [None] * lat.Q
    ix = lat.idx
    out[ix("zzz")] = f[ix("zzz")] - m2[0] - m2[1] - m2[2]
    names = (("mzz", "pzz"), ("zmz", "zpz"), ("zzm", "zzp"))
    for a, (nm, np_) in enumerate(names):
        out[ix(np_)] = f[ix(np_)] + 0.5 * (m2[a] + m1[a])
        out[ix(nm)] = f[ix(nm)] + 0.5 * (m2[a] - m1[a])
    return jnp.stack(out)


def collide_clbm_ade(lat, f, rho, u, nu, force=None):
    """Central-moment CLBM for ADE (reference d3q7/col_clbm.h:15-90)."""
    del force
    cs2 = 1.0 / float(lat.i_cs2)
    omega = _omega(lat, nu)
    pairs = _axis_arrays(lat, f)
    k1 = []
    k2 = []
    for a, (fm, fp) in enumerate(pairs):
        va = u[a]
        k1.append((rho * va + fm - fp) * omega)
        k2.append((rho * (cs2 - va * va) + 2 * va * (fp - fm) - fm - fp) * 1.0)
    out = [None] * lat.Q
    ix = lat.idx
    out[ix("zzz")] = (
        f[ix("zzz")]
        - 2 * (k1[0] * u[0] + k1[1] * u[1] + k1[2] * u[2])
        - k2[0] - k2[1] - k2[2]
    )
    names = (("mzz", "pzz"), ("zmz", "zpz"), ("zzm", "zzp"))
    for a, (nm, np_) in enumerate(names):
        va = u[a]
        out[ix(np_)] = f[ix(np_)] + k1[a] * va + 0.5 * (k2[a] + k1[a])
        out[ix(nm)] = f[ix(nm)] + k1[a] * va + 0.5 * (k2[a] - k1[a])
    return jnp.stack(out)


def collide_clbm_rs_ade(lat, f, rho, u, nu, force=None, source=None):
    """Central-moment CLBM with full reconstruction and optional source
    term Qp (reference d3q7/col_clbm_RS.h:15-48, id "CLBM-RS")."""
    del force
    cs2 = 1.0 / float(lat.i_cs2)
    omega = _omega(lat, nu)
    Qp = source if source is not None else 0.0
    pairs = _axis_arrays(lat, f)
    ix = lat.idx

    g1 = []
    g2 = []
    for a, (fm, fp) in enumerate(pairs):
        va = u[a]
        gc1 = -rho * va + fp - fm
        gc2 = rho * va * va + 2 * (fm - fp) * va + fp + fm
        g1.append((1 - omega) * gc1)
        g2.append(gc2 + 1.0 * (rho * cs2 - gc2) + 0.5 * Qp * cs2)
    g0 = rho + 0.5 * Qp

    out = [None] * lat.Q
    out[ix("zzz")] = (
        rho * (1 - u[0] * u[0] - u[1] * u[1] - u[2] * u[2])
        - 2 * (g1[0] * u[0] + g1[1] * u[1] + g1[2] * u[2])
        - g2[0] - g2[1] - g2[2]
    )
    names = (("mzz", "pzz"), ("zmz", "zpz"), ("zzm", "zzp"))
    for a, (nm, np_) in enumerate(names):
        va = u[a]
        out[ix(np_)] = 0.5 * g0 * (va * va + va) + g1[a] * va + 0.5 * (g2[a] + g1[a])
        out[ix(nm)] = 0.5 * g0 * (va * va - va) + g1[a] * va + 0.5 * (g2[a] - g1[a])
    return jnp.stack(out)


COLLISIONS_D3Q7 = {
    "SRT": collide_srt_ade,
    "MRT": collide_mrt_ade,
    "CLBM": collide_clbm_ade,
    "CLBM-RS": collide_clbm_rs_ade,
}
