"""Macroscopic moments of distribution functions.

Vectorized (whole-array) analog of the reference's per-site
``computeDensityAndVelocity`` (reference: include/lbm3d/d3q27/common.h:17-50,
common_well.h:16-51, d3q7/common.h:16-27, d2q9/common.h).

Shapes: ``f`` is ``[Q, *S]`` (S = spatial dims), ``u`` is ``[D, *S]``,
``rho`` is ``[*S]``.  The velocity includes the half-force (trapezoidal
forcing) correction ``u = (sum_q c_q f_q + F/2) / rho`` exactly as the
reference does.
"""

from __future__ import annotations

import jax.numpy as jnp

from tnl_lbm_tpu.models.descriptors import LatticeDescriptor


def density(lat: LatticeDescriptor, f: jnp.ndarray, well: bool = False) -> jnp.ndarray:
    """rho = sum_q f_q (+1 for well-conditioned deviation storage)."""
    rho = jnp.sum(f, axis=0)
    if well:
        # well-conditioned DFs store deviations from the lattice weights:
        # rho = 1 + sum_q f_q (reference common_well.h:37)
        rho = rho + 1
    return rho


def momentum(lat: LatticeDescriptor, f: jnp.ndarray) -> jnp.ndarray:
    """j_a = sum_q c_qa f_q, shape [D, *S]."""
    c = jnp.asarray(lat.c.T, dtype=f.dtype)  # [D, Q]
    return jnp.tensordot(c, f, axes=1)


def density_velocity(
    lat: LatticeDescriptor,
    f: jnp.ndarray,
    force: jnp.ndarray | None = None,
    well: bool = False,
):
    """Returns (rho, u) with the half-force velocity correction."""
    rho = density(lat, f, well=well)
    j = momentum(lat, f)
    if force is not None:
        j = j + 0.5 * force
    u = j / rho
    return rho, u
