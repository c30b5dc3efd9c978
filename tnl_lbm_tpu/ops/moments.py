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
from tnl_lbm_tpu.ops.contract import lattice_dot


def density(lat: LatticeDescriptor, f: jnp.ndarray, well: bool = False,
            high_precision: bool = False) -> jnp.ndarray:
    """rho = sum_q f_q (+1 for well-conditioned deviation storage).

    ``high_precision`` uses Neumaier compensated summation over the Q axis
    (reference USE_HIGH_PRECISION_RHO, d3q27/common.h:19-28, which Kahan-
    sums the 27 DFs); mostly redundant with well-conditioned storage, which
    removes the O(1) weight offsets before any rounding happens, but kept
    for exact option parity and for total-DF float32 configs.
    """
    if high_precision:
        s = f[0]
        comp = jnp.zeros_like(s)
        for q in range(1, f.shape[0]):
            x = f[q]
            t = s + x
            # Neumaier: pick the larger-magnitude operand for the residual
            comp = comp + jnp.where(
                jnp.abs(s) >= jnp.abs(x), (s - t) + x, (x - t) + s
            )
            s = t
        rho = s + comp
    else:
        rho = jnp.sum(f, axis=0)
    if well:
        # well-conditioned DFs store deviations from the lattice weights:
        # rho = 1 + sum_q f_q (reference common_well.h:37)
        rho = rho + 1
    return rho


def momentum(lat: LatticeDescriptor, f: jnp.ndarray) -> jnp.ndarray:
    """j_a = sum_q c_qa f_q, shape [D, *S]."""
    return lattice_dot(lat.c.T, f)


def density_velocity(
    lat: LatticeDescriptor,
    f: jnp.ndarray,
    force: jnp.ndarray | None = None,
    well: bool = False,
    high_precision: bool = False,
):
    """Returns (rho, u) with the half-force velocity correction.

    ``high_precision`` selects the Neumaier-compensated density sum
    (reference USE_HIGH_PRECISION_RHO, d3q27/common.h:19-28) - enable via
    ``LBMConfig.high_precision_rho``.
    """
    rho = density(lat, f, well=well, high_precision=high_precision)
    j = momentum(lat, f)
    if force is not None:
        j = j + 0.5 * force
    u = j / rho
    return rho, u
