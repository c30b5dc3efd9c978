"""Non-Newtonian rheology: strain-rate tensor, effective viscosity, forcing.

Analog of the reference nonNewtonian.h: a strain-rate tensor S from velocity
differences with wall-aware one-sided/central stencils
(cudaLBMKernelStress, reference nonNewtonian.h:274-391), an effective
viscosity from the Carreau-Yasuda (USE_CYMODEL) or Casson (USE_CASSON)
model, and the body force F = 2 (nu_eff - nu) rho div(S)
(MacroNonNewtonianDefault::computeForcing, reference nonNewtonian.h:690-788).

TPU-first difference: instead of two extra kernels per step, everything here
is a *forcing hook* evaluated inside the fused step (LBMConfig.forcing_hook)
- XLA fuses the stencils with the rest of the step.  The velocity entering
the stencils includes the homogeneous force but lags the previous step's
non-Newtonian force contribution by one step (the reference carries the same
one-step lag through its macro force channels).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tnl_lbm_tpu.models.descriptors import LatticeDescriptor


@dataclasses.dataclass(frozen=True)
class CarreauYasuda:
    """nu_eff = nu + (nu0 - nu) (1 + (gamma lambda)^a)^((n-1)/a)
    (reference nonNewtonian.h:770-772)."""

    nu0: float
    lam: float
    a: float
    n: float

    def __call__(self, nu, gamma):
        return nu + (self.nu0 - nu) * (1 + (gamma * self.lam) ** self.a) ** ((self.n - 1) / self.a)


@dataclasses.dataclass(frozen=True)
class Casson:
    """nu_eff = (k0 + k1 sqrt(gamma))^2 / sqrt(gamma), guarded at rest
    (reference nonNewtonian.h:773-780)."""

    k0: float
    k1: float

    def __call__(self, nu, gamma):
        sg = jnp.sqrt(gamma)
        safe = jnp.maximum(sg, 1e-10)
        nu_c = (self.k0 + self.k1 * sg) ** 2 / safe
        return jnp.where(sg > 1e-10, nu_c, nu)


def _pad1(field, D, periodic=None):
    """1-halo pad on all spatial axes of [*S] or [C, *S]: edge-replicate,
    with wrap on axes flagged periodic (matching the reference's MPI halo
    semantics, nonNewtonian.h:216-391 - an edge pad at a periodic seam
    would feed the stencil its own boundary value instead of the wrapped
    neighbor)."""
    pads = [(0, 0)] * field.ndim
    for a in range(field.ndim - D, field.ndim):
        pads[a] = (1, 1)
    out = jnp.pad(field, pads, mode="edge")
    if periodic is not None:
        off = field.ndim - D
        for a, per in enumerate(periodic[:D]):
            if not per:
                continue
            n = field.shape[off + a]
            idx_lo = [slice(None)] * field.ndim
            idx_hi = [slice(None)] * field.ndim
            src_lo = [slice(None)] * field.ndim
            src_hi = [slice(None)] * field.ndim
            idx_lo[off + a] = 0
            src_lo[off + a] = n      # last true layer (at padded index n)
            idx_hi[off + a] = n + 1
            src_hi[off + a] = 1      # first true layer
            out = out.at[tuple(idx_lo)].set(out[tuple(src_lo)])
            out = out.at[tuple(idx_hi)].set(out[tuple(src_hi)])
    return out


def _neighbor(fieldpad, D, axis, shift, shape):
    index = [slice(None)] * (fieldpad.ndim - D) + [slice(1, 1 + n) for n in shape]
    index[fieldpad.ndim - D + axis] = slice(1 + shift, 1 + shift + shape[axis])
    return fieldpad[tuple(index)]


def _wall_aware_derivative(gpad, fluid_p, fluid_m, D, axis, shape, center):
    """d/d(axis) with one-sided differences at walls
    (reference nonNewtonian.h:326-391 neighbor-fluidity switch)."""
    gp = _neighbor(gpad, D, axis, +1, shape)
    gm = _neighbor(gpad, D, axis, -1, shape)
    fwd = gp - center
    bwd = center - gm
    cen = 0.5 * (gp - gm)
    both = fluid_p & fluid_m
    onlyp = fluid_p & ~fluid_m
    onlym = ~fluid_p & fluid_m
    return jnp.where(both, cen, jnp.where(onlyp, fwd, jnp.where(onlym, bwd, 0.0)))


def strain_rate_tensor(u, fluid_mask, D=3, periodic=None):
    """Symmetric strain-rate components from velocity differences.

    Returns dict with keys (a, b), a <= b.  Components are zero where the
    required neighbors are not fluid, matching the reference's stencil.
    ``periodic`` wraps the flagged axes (see _pad1).
    """
    shape = u.shape[1:]
    upad = _pad1(u, D, periodic)
    fpad = _pad1(fluid_mask, D, periodic)
    fl = {}
    for a in range(D):
        fl[(a, +1)] = _neighbor(fpad, D, a, +1, shape)
        fl[(a, -1)] = _neighbor(fpad, D, a, -1, shape)

    grad = {}
    for a in range(D):       # derivative axis
        for b in range(D):   # velocity component
            grad[(a, b)] = _wall_aware_derivative(
                upad[b], fl[(a, +1)], fl[(a, -1)], D, a, shape, u[b]
            )
    S = {}
    for a in range(D):
        for b in range(a, D):
            S[(a, b)] = 0.5 * (grad[(a, b)] + grad[(b, a)]) if a != b else grad[(a, a)]
    return S


def shear_rate_magnitude(S, D=3):
    """gamma = sqrt(S11^2 + S22^2 + S33^2 + 2 (S12^2 + S13^2 + S23^2))
    (reference nonNewtonian.h:762)."""
    diag = sum(S[(a, a)] ** 2 for a in range(D))
    off = sum(S[(a, b)] ** 2 for a in range(D) for b in range(a + 1, D))
    return jnp.sqrt(diag + 2 * off)


def make_nn_forcing_hook(model, nu: float | None = None, periodic=None):
    """Build the forcing hook: F = 2 (nu_eff - nu) rho div(S).

    ``periodic`` (e.g. ``domain.periodic``) wraps the stencils across the
    flagged axes; without it the seams edge-replicate (wrong for periodic
    domains - pass it whenever the domain has periodic axes).

    ``model`` is a CarreauYasuda or Casson instance.  Use as
    ``LBMConfig(..., forcing_hook=make_nn_forcing_hook(model))``.
    """

    def hook(lat: LatticeDescriptor, rho, u, nu_lattice, fluid_mask):
        D = lat.D
        shape = u.shape[1:]
        S = strain_rate_tensor(u, fluid_mask, D, periodic)
        gamma = shear_rate_magnitude(S, D)
        nu_eff = model(nu_lattice, gamma)

        # div(S) rows with the same wall-aware stencils
        Sfull = {}
        for a in range(D):
            for b in range(D):
                Sfull[(a, b)] = S[(min(a, b), max(a, b))]
        fpad = _pad1(fluid_mask, D, periodic)
        fl = {}
        for a in range(D):
            fl[(a, +1)] = _neighbor(fpad, D, a, +1, shape)
            fl[(a, -1)] = _neighbor(fpad, D, a, -1, shape)
        rows = []
        for b in range(D):  # force component
            div_b = 0.0
            for a in range(D):  # derivative axis
                spad = _pad1(Sfull[(a, b)], D, periodic)
                div_b = div_b + _wall_aware_derivative(
                    spad, fl[(a, +1)], fl[(a, -1)], D, a, shape, Sfull[(a, b)]
                )
            rows.append(jnp.where(fluid_mask, 2 * (nu_eff - nu_lattice) * div_b * rho, 0.0))
        return jnp.stack(rows)

    # markers for the single-kernel fused NN path (kernels/fused_nn.py):
    # the kernel re-implements this stencil pipeline in VMEM
    hook.nn_model = model
    hook.nn_periodic = periodic
    return hook
