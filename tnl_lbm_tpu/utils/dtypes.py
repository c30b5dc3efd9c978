"""Dtype policy ("Traits") for the TPU build.

The reference parametrizes every kernel by ``Traits<dreal, real, idx, map_t>``
(reference: include/lbm3d/defs.h:71-119, TraitsSP/TraitsDP at :118-119).
On TPU the policy maps to:

- ``compute_dtype``: dtype of the distribution functions and macro fields on
  device.  float32 by default (TPU f64 is emulated and slow; the reference
  GPU default is also float32 via ``TraitsSP``).
- ``host_dtype``: float64, used for host-side unit conversions and analytic
  reference solutions.
- ``map_dtype``: geometry-map code per site (uint8; the reference uses
  ``short int``, we never need more than 256 GEO codes).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Traits:
    compute_dtype: jnp.dtype = jnp.float32
    host_dtype: np.dtype = np.float64
    map_dtype: jnp.dtype = jnp.uint8
    index_dtype: jnp.dtype = jnp.int32


TraitsSP = Traits(compute_dtype=jnp.float32)
TraitsDP = Traits(compute_dtype=jnp.float64)  # requires jax_enable_x64
