"""Non-Newtonian rheology: strain tensor, viscosity models, forcing hook."""

import jax.numpy as jnp
import numpy as np
import pytest

from tnl_lbm_tpu.models import D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops import non_newtonian as nn
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig, initial_dfs, make_step
from tnl_lbm_tpu.utils import Lattice


def test_strain_rate_linear_shear():
    # u_x = a * y -> S12 = a/2, everything else 0 (away from boundaries)
    n = 12
    a = 0.01
    u = np.zeros((3, n, n, n))
    u[0] = a * np.arange(n)[None, :, None]
    fluid = jnp.ones((n, n, n), bool)
    S = nn.strain_rate_tensor(jnp.asarray(u), fluid)
    assert np.allclose(np.asarray(S[(0, 1)])[2:-2, 2:-2, 2:-2], a / 2, atol=1e-12)
    assert np.allclose(np.asarray(S[(0, 0)]), 0, atol=1e-12)
    assert np.allclose(np.asarray(S[(2, 2)]), 0, atol=1e-12)
    gamma = nn.shear_rate_magnitude(S)
    assert np.allclose(np.asarray(gamma)[2:-2, 2:-2, 2:-2], np.sqrt(2 * (a / 2) ** 2), atol=1e-12)


def test_viscosity_models_limits():
    cy = nn.CarreauYasuda(nu0=0.1, lam=10.0, a=2.0, n=0.5)
    # zero shear -> nu0; infinite shear -> nu
    assert np.isclose(float(cy(0.01, jnp.asarray(0.0))), 0.1)
    assert float(cy(0.01, jnp.asarray(1e6))) < 0.011
    cs = nn.Casson(k0=0.1, k1=0.05)
    assert np.isclose(float(cs(0.02, jnp.asarray(0.0))), 0.02)  # rest guard
    g = 0.09
    expected = (0.1 + 0.05 * np.sqrt(g)) ** 2 / np.sqrt(g)
    assert np.isclose(float(cs(0.02, jnp.asarray(g))), expected)


def test_nn_poiseuille_blunted_profile():
    """Shear-thinning channel flow must develop a blunter (flatter) profile
    than Newtonian Poiseuille - the qualitative signature of the CY model."""
    X, Y, Z = 4, 4, 21
    nu = 0.05
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, :, 0] = GEO.WALL
    m[:, :, -1] = GEO.WALL
    units = Lattice(global_size=(X, Y, Z), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, True, False))

    import jax

    force = jnp.asarray([5e-6, 0.0, 0.0])

    def run(cfg, steps=3000):
        step = make_step(cfg, dom)
        jstep = jax.jit(lambda f: step(f, nu, force=force)[0])
        f = initial_dfs(cfg, dom)
        for _ in range(steps):
            f = jstep(f)
        _, rho, u = step(f, nu, force=force)
        return np.asarray(u[0][0, 0, :])

    cfg_newt = LBMConfig(lat=D3Q27, collision=col.collide_srt, compute_dtype=jnp.float64)
    model = nn.CarreauYasuda(nu0=0.5, lam=500.0, a=2.0, n=0.3)
    cfg_nn = LBMConfig(
        lat=D3Q27, collision=col.collide_srt, compute_dtype=jnp.float64,
        forcing_hook=nn.make_nn_forcing_hook(model),
    )
    ux_newt = run(cfg_newt)
    ux_nn = run(cfg_nn)
    assert np.isfinite(ux_nn).all()
    # shape factor: center / mean over fluid region (parabola: 1.5)
    shape_newt = ux_newt[Z // 2] / ux_newt[1:-1].mean()
    shape_nn = ux_nn[Z // 2] / ux_nn[1:-1].mean()
    assert shape_nn < shape_newt - 0.01, (shape_newt, shape_nn)


def _nn_parity_case(model, hook_periodic, dom_map, dom_periodic, Z, seed):
    """Pallas single-kernel NN force (kernels/fused_nn.py) == the XLA
    stencil hook, isolated by flipping pallas_hook on the SAME hooked
    fused step."""
    import dataclasses

    from tnl_lbm_tpu.kernels.hooked import make_hooked_fused_step
    from tnl_lbm_tpu.ops import equilibrium as eqlib

    X, Y = 8, 16
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=dom_map, periodic=dom_periodic)
    hook = nn.make_nn_forcing_hook(model, periodic=hook_periodic)
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well,
                    eq=eqlib.eq_well, well=True, forcing_hook=hook)
    del dataclasses
    rng = np.random.default_rng(seed)
    rho = jnp.asarray(1 + 0.01 * rng.standard_normal(dom.shape), jnp.float32)
    u = jnp.asarray(0.03 * rng.standard_normal((3,) + dom.shape), jnp.float32)
    f0 = cfg.eq(cfg.lat, rho, u).astype(cfg.compute_dtype)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    # single_kernel=False pins the three-phase pipeline (macro pre-pass +
    # fused_nn forcing kernel + force-field kernel) - the default hooked
    # step routes vector-force NN configs to the single-kernel step
    # (kernels/fused_nn_step.py, tested in tests/test_fused_nn_step.py)
    s_pal = make_hooked_fused_step(cfg, dom, tile=(8, 8),
                                   single_kernel=False)
    s_xla = make_hooked_fused_step(cfg, dom, tile=(8, 8), pallas_hook=False)
    f1, f2 = f0, f0
    for _ in range(3):
        f1, r1, u1 = s_pal(f1, 0.02, force=force)
        f2, r2, u2 = s_xla(f2, 0.02, force=force)
    assert float(jnp.abs(f1 - f2).max()) < 1e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


def test_nn_pallas_kernel_matches_xla_hook_duct():
    """Wall duct + periodic-x hook; Carreau-Yasuda."""
    X, Y, Z = 8, 16, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[:, :, 0] = m[:, :, -1] = GEO.WALL
    _nn_parity_case(nn.CarreauYasuda(nu0=0.1, lam=1.0, a=2.0, n=0.5),
                    (True, False, False), m, (True, False, False), Z, 11)


@pytest.mark.slow
def test_nn_pallas_kernel_matches_xla_hook_periodic_padded_lanes():
    """Fully periodic domain + Casson + ragged Z (padded-lane kernel path
    via FORCE_LANE_PAD, like test_fused_lane_padded_z_matches_xla)."""
    from tnl_lbm_tpu.kernels import fused as fused_mod

    old_force, old_lane = fused_mod.FORCE_LANE_PAD, fused_mod.LANE
    fused_mod.FORCE_LANE_PAD, fused_mod.LANE = True, 16
    try:
        X, Y, Z = 8, 16, 12
        m = np.zeros((X, Y, Z), np.uint8)
        _nn_parity_case(nn.Casson(k0=0.05, k1=0.02),
                        (True, True, True), m, (True, True, True), Z, 12)
    finally:
        fused_mod.FORCE_LANE_PAD, fused_mod.LANE = old_force, old_lane


@pytest.mark.slow
def test_nn_pallas_kernel_edge_replicate_nonperiodic():
    """No periodic axes anywhere: the kernel's domain-edge ring fix must
    reproduce the XLA hook's edge-replicated S pad exactly (fluid sites
    touch every domain face)."""
    X, Y, Z = 8, 16, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 4:6, 3:5] = GEO.WALL  # interior obstacle exercises wall-awareness
    _nn_parity_case(nn.CarreauYasuda(nu0=0.08, lam=2.0, a=1.7, n=0.6),
                    None, m, (False, False, False), Z, 13)
