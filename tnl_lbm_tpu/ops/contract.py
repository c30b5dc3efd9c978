"""Exact trace-time lattice contractions.

``jnp.tensordot``/``matmul`` lower to XLA dot ops whose DEFAULT precision
rounds float32 inputs to bfloat16 on TPU-class backends (measured here:
2.1e-5 absolute error on a D2Q9 c.u at |u| = 0.025 - three orders of
magnitude above f32 rounding).  Every lattice-coefficient contraction in
this package (c.u, momentum, forcing projections, raw/central-moment
masks) has coefficients in {-1, 0, +1} or small rationals, so the exact
form is a trace-time unrolled sum of +-terms - which is also what the
reference's generated CUDA does (e.g. common.h computeDensityAndVelocity)
and what the fused Pallas kernels already do.  XLA fuses the adds; nothing
touches the MXU.

Use ``lattice_dot`` for all [R, Q] x [Q, *S] -> [R, *S] contractions with
static coefficients.  For genuinely dense matmuls (IBM matrices), pass
``precision='highest'`` to the dot instead.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def lattice_dot(coef, arr) -> jnp.ndarray:
    """``out[r] = sum_i coef[r, i] * arr[i]`` with trace-time unrolling.

    ``coef`` is a static [R, I] array (numpy / nested lists); ``arr`` is a
    [I, *S] jax array or a length-I sequence of [*S] arrays.  Zero
    coefficients are skipped, +-1 become adds/subtracts, other scalars
    multiply as Python floats - bitwise identical to the fused kernels'
    in-register arithmetic.
    """
    coef = np.asarray(coef, np.float64)
    if coef.ndim == 1:
        coef = coef[None]
        squeeze = True
    else:
        squeeze = False
    rows = []
    zero = None
    for r in range(coef.shape[0]):
        acc = None
        for i in range(coef.shape[1]):
            c = float(coef[r, i])
            if c == 0.0:
                continue
            term = arr[i] if c == 1.0 else (-arr[i] if c == -1.0 else c * arr[i])
            acc = term if acc is None else acc + term
        if acc is None:
            if zero is None:
                zero = jnp.zeros_like(arr[0])
            acc = zero
        rows.append(acc)
    if squeeze:
        return rows[0]
    return jnp.stack(rows)
