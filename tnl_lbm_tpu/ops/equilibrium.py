"""Equilibrium distribution functions (vectorized, pluggable).

Four interchangeable D3Q27 equilibria as in the reference, plus the generic
second-order form for D2Q9/D3Q7:

- ``eq_quadratic``: 2nd-order Maxwell-Boltzmann
  (reference: d3q27/eq.h:13-17, d2q9/eq.h, d3q7/eq.h - the D3Q7 ADE lattice
  uses 1/cs^2 = 4 instead of 3).
- ``eq_well``: well-conditioned variant, stores deviation from the lattice
  weight: w_q * (rho * feq_term - 1) (reference: d3q27/eq_well.h:21-33).
- ``eq_inv_cum``: inverse-cumulant equilibrium, per-axis product form
  (reference: d3q27/eq_inv_cum.h:24-52).
- ``eq_entropic``: entropic equilibrium, per-axis sqrt product form
  (reference: d3q27/eq_entropic.h:90-216).

All functions take ``rho [*S]`` and ``u [D, *S]`` and return ``f_eq [Q, *S]``.
The per-axis product forms are evaluated by building the three axis factors
once for c in {-1, 0, +1} and combining per direction - O(9) factor tensors
instead of O(Q) independent polynomial evaluations, which XLA fuses well.
"""

from __future__ import annotations

import jax.numpy as jnp

from tnl_lbm_tpu.models.descriptors import LatticeDescriptor
from tnl_lbm_tpu.ops.contract import lattice_dot


def _cu(lat: LatticeDescriptor, u: jnp.ndarray) -> jnp.ndarray:
    """c_q . u, shape [Q, *S] (exact unrolled sum - ops/contract.py)."""
    return lattice_dot(lat.c, u)


def eq_quadratic(lat: LatticeDescriptor, rho: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Second-order Maxwell-Boltzmann equilibrium for any descriptor."""
    ics2 = float(lat.i_cs2)
    cu = _cu(lat, u)
    uu = jnp.sum(u * u, axis=0)
    feq = 1 + ics2 * cu + 0.5 * ics2 * ics2 * cu * cu - 0.5 * ics2 * uu
    # per-q scalar weights (not a [Q]-array constant) keep this callable
    # inside Pallas kernels, which reject captured array constants
    return jnp.stack([float(lat.w[q]) * rho * feq[q] for q in range(lat.Q)])


def eq_well(lat: LatticeDescriptor, rho: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Well-conditioned equilibrium: w_q * (rho * feq_term - 1)."""
    ics2 = float(lat.i_cs2)
    cu = _cu(lat, u)
    uu = jnp.sum(u * u, axis=0)
    feq = 1 + ics2 * cu + 0.5 * ics2 * ics2 * cu * cu - 0.5 * ics2 * uu
    # per-q scalar weights: kernel-safe (see eq_quadratic)
    return jnp.stack([float(lat.w[q]) * (rho * feq[q] - 1)
                      for q in range(lat.Q)])


def _product_eq(lat: LatticeDescriptor, rho: jnp.ndarray, factors) -> jnp.ndarray:
    """Assemble f_eq[q] = rho * prod_a factors[a][c_qa] for product-form equilibria.

    ``factors[a]`` maps c in {-1, 0, +1} -> array [*S] for axis ``a``.
    """
    out = []
    for q in range(lat.Q):
        term = rho
        for a in range(lat.D):
            term = term * factors[a][int(lat.c[q, a])]
        out.append(term)
    return jnp.stack(out)


def eq_inv_cum(lat: LatticeDescriptor, rho: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Inverse-cumulant equilibrium (factorized product form).

    Per-axis factor: phi(0, v) = (2 - 3 v^2) / 3,
    phi(+-1, v) = (3 v^2 +- 3 v + 1) / 6 (reference eq_inv_cum.h:24-52).
    """
    factors = []
    for a in range(lat.D):
        v = u[a]
        factors.append({
            0: (2 - 3 * v * v) / 3,
            1: (3 * v * v + 3 * v + 1) / 6,
            -1: (3 * v * v - 3 * v + 1) / 6,
        })
    return _product_eq(lat, rho, factors)


def eq_entropic(lat: LatticeDescriptor, rho: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Entropic equilibrium (sqrt product form, Karlin et al.).

    Per-axis factor: psi(0, v) = (2/3) (2 - s),
    psi(+-1, v) = (1/6) (2 - s) * ((2 v + s) / (1 - v))^{+-1}
    with s = sqrt(1 + 3 v^2) (reference eq_entropic.h:90-216).
    """
    factors = []
    for a in range(lat.D):
        v = u[a]
        s = jnp.sqrt(1 + 3 * v * v)
        base = 2 - s
        ratio = (2 * v + s) / (1 - v)
        factors.append({
            0: (2.0 / 3.0) * base,
            1: (1.0 / 6.0) * base * ratio,
            -1: (1.0 / 6.0) * base / ratio,
        })
    return _product_eq(lat, rho, factors)


# registry keyed like the reference plugin classes
EQUILIBRIA = {
    "EQ": eq_quadratic,
    "EQ_WELL": eq_well,
    "EQ_INV_CUM": eq_inv_cum,
    "EQ_ENTROPIC": eq_entropic,
}
