"""Solver configuration and domain description.

The reference composes solvers statically via the ``LBM_CONFIG`` template of
plugins (reference: include/lbm3d/defs.h:169-250).  Here the same composition
is a frozen dataclass of pure functions; ``jax.jit`` specializes the step on
it at trace time, which plays the role of template instantiation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.models.descriptors import LatticeDescriptor
from tnl_lbm_tpu.ops import equilibrium as eqlib
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.utils.units import Lattice


@dataclasses.dataclass(frozen=True)
class LBMConfig:
    """Plugin bundle: collision + equilibrium + streaming pattern + storage.

    Attributes:
      lat: velocity-set descriptor.
      collision: ``(lat, f, rho, u, nu, force=...) -> f_new``.
      eq: equilibrium used by BCs and initialization.
      streaming: "AB" (pull, double buffer) or "AA" (in-place, single buffer).
      well: DFs stored as deviations from lattice weights (well-conditioned).
      compute_dtype: device dtype of DFs and macro fields.
      storage_dtype: optional 16-bit at-rest dtype for the DF state on the
        one-kernel A-A pair path (jnp.float16 / jnp.bfloat16; FP16S scheme:
        every arithmetic op stays in compute_dtype).  Requires well=True.
        Applies only where the pair2 kernel runs (Simulation pair dispatch,
        bench); other paths keep compute_dtype.
    """

    lat: LatticeDescriptor
    collision: Callable[..., Any]
    eq: Callable[..., Any] = eqlib.eq_quadratic
    streaming: str = "AB"
    well: bool = False
    compute_dtype: Any = jnp.float32
    #: optional per-step forcing hook (non-Newtonian rheology etc.):
    #: hook(lat, rho, u, nu, fluid_mask) -> force [D, *S]
    #: (analog of MACRO::computeForcing + computeBeforeLBMKernel,
    #: reference kernels.h:92, nonNewtonian.h:393-...)
    forcing_hook: Callable[..., Any] | None = None
    #: Neumaier-compensated density summation in the moments (analog of
    #: USE_HIGH_PRECISION_RHO, reference d3q27/common.h:19-28); mostly
    #: redundant with well=True, which removes the O(1) weight offsets
    #: before rounding, but available for total-DF float32 configs.
    high_precision_rho: bool = False
    #: 16-bit at-rest DF storage for the pair2 path (see class docstring)
    storage_dtype: Any = None

    def __post_init__(self):
        assert self.streaming in ("AB", "AA")
        if self.storage_dtype is not None and not self.well:
            raise ValueError("storage_dtype (half storage) requires well=True "
                             "(deviation DFs keep the 16-bit mantissa on the "
                             "small signal)")


@dataclasses.dataclass
class Domain:
    """Geometry-map + unit system for one simulation.

    The map is built host-side (numpy) with GEO codes, like the reference's
    ``setupBoundaries`` phase writing into the host map array
    (reference: lbm_block.hpp:356-364, state.hpp:879-896).
    """

    lat: LatticeDescriptor
    units: Lattice
    map: np.ndarray  # [*S] uint8 of GEO codes
    periodic: tuple[bool, ...] | None = None
    bouzidi: np.ndarray | None = None  # [2*(Q-1)//2, *S] wall-distance thetas (D2Q9)

    def __post_init__(self):
        if self.periodic is None:
            self.periodic = tuple([False] * self.lat.D)
        assert self.map.shape == tuple(self.units.global_size)
        assert len(self.periodic) == self.lat.D

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self.units.global_size)

    def codes_present(self) -> set:
        return {GEO(int(c)) for c in np.unique(self.map)}

    def fill_box(self, code: GEO, lo, hi) -> None:
        """Set map[lo:hi] = code (half-open box, global lattice indices)."""
        index = tuple(slice(int(a), int(b)) for a, b in zip(lo, hi))
        self.map[index] = int(code)


def initial_dfs(cfg: LBMConfig, domain: Domain, rho0: float = 1.0, u0=None) -> jnp.ndarray:
    """Equilibrium initialization of the DF array (reference resetDFs,
    lbm_block.hpp:219-250 - equilibrium everywhere incl. ghost sites)."""
    shape = domain.shape
    rho = jnp.full(shape, rho0, dtype=cfg.compute_dtype)
    if u0 is None:
        u = jnp.zeros((cfg.lat.D,) + shape, dtype=cfg.compute_dtype)
    else:
        u = jnp.broadcast_to(
            jnp.asarray(u0, dtype=cfg.compute_dtype).reshape((cfg.lat.D,) + (1,) * len(shape)),
            (cfg.lat.D,) + shape,
        )
    f = cfg.eq(cfg.lat, rho, u)
    return f.astype(cfg.compute_dtype)
