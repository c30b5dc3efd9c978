import jax.numpy as jnp
import numpy as np
import pytest

from tnl_lbm_tpu.models import D2Q9, D3Q7, D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops import equilibrium as eq
from tnl_lbm_tpu.ops import moments as mom

SHAPE = (3, 4, 5)


def rand_state(lat, seed=0, shape=SHAPE):
    rng = np.random.default_rng(seed)
    rho = jnp.asarray(1.0 + 0.05 * rng.standard_normal(shape))
    u = jnp.asarray(0.05 * rng.standard_normal((lat.D,) + shape))
    return rho, u


def rand_f(lat, seed=1, shape=SHAPE):
    rng = np.random.default_rng(seed)
    # positive, near-weights DFs
    w = lat.w.reshape((lat.Q,) + (1,) * len(shape))
    return jnp.asarray(w * (1.0 + 0.1 * rng.standard_normal((lat.Q,) + shape)))


@pytest.mark.parametrize("eqfn", [eq.eq_quadratic, eq.eq_inv_cum, eq.eq_entropic], ids=["EQ", "INV_CUM", "ENTROPIC"])
def test_equilibrium_moments_d3q27(eqfn):
    rho, u = rand_state(D3Q27)
    feq = eqfn(D3Q27, rho, u)
    # zeroth moment = rho (entropic only conserves it approximately at O(u^4))
    tol = 1e-12 if eqfn is not eq.eq_entropic else 1e-4
    assert np.allclose(mom.density(D3Q27, feq), rho, atol=tol)
    # first moment = rho * u
    jm = mom.momentum(D3Q27, feq)
    tol1 = 1e-12 if eqfn is eq.eq_quadratic or eqfn is eq.eq_inv_cum else 1e-4
    assert np.allclose(jm, rho * u, atol=tol1)


def test_equilibria_agree_at_zero_velocity():
    rho = jnp.ones(SHAPE)
    u = jnp.zeros((3,) + SHAPE)
    f0 = eq.eq_quadratic(D3Q27, rho, u)
    assert np.allclose(f0, eq.eq_inv_cum(D3Q27, rho, u), atol=1e-14)
    assert np.allclose(f0, eq.eq_entropic(D3Q27, rho, u), atol=1e-14)
    # well variant stores deviations: feq_well = feq - w
    w = D3Q27.w.reshape(27, 1, 1, 1)
    assert np.allclose(eq.eq_well(D3Q27, rho, u), f0 - w, atol=1e-14)


@pytest.mark.parametrize("lat", [D2Q9, D3Q7], ids=lambda latt: latt.name)
def test_equilibrium_moments_other_lattices(lat):
    rho, u = rand_state(lat)
    feq = eq.eq_quadratic(lat, rho, u)
    assert np.allclose(mom.density(lat, feq), rho, atol=1e-12)
    assert np.allclose(mom.momentum(lat, feq), rho * u, atol=1e-12)


def test_density_velocity_half_force():
    lat = D3Q27
    f = rand_f(lat)
    force = jnp.asarray(np.full((3,) + SHAPE, 1e-3))
    rho, u = mom.density_velocity(lat, f, force=force)
    j = mom.momentum(lat, f)
    assert np.allclose(u, (j + 0.5 * force) / rho, atol=1e-14)


def test_high_precision_rho_beats_naive_sum_f32():
    """Neumaier summation (reference USE_HIGH_PRECISION_RHO) recovers the
    tiny deviations a plain f32 sum of O(1) weights rounds away."""
    lat = D3Q27
    rng = np.random.default_rng(4)
    dev = 1e-8 * rng.standard_normal((lat.Q,) + SHAPE)
    f64 = np.asarray(lat.w, np.float64).reshape((lat.Q,) + (1,) * 3) + dev
    exact = f64.sum(axis=0)
    f32 = jnp.asarray(f64, jnp.float32)
    naive = np.asarray(mom.density(lat, f32), np.float64)
    kahan = np.asarray(mom.density(lat, f32, high_precision=True), np.float64)
    err_naive = np.abs(naive - exact).max()
    err_kahan = np.abs(kahan - exact).max()
    assert err_kahan <= err_naive
    # compensated sum should be at the single-rounding level
    assert err_kahan < 1.5e-7


NU = 0.02


@pytest.mark.parametrize(
    "name,collide",
    [("SRT", col.collide_srt), ("BGK", col.collide_bgk), ("CUM", col.collide_cum)],
)
def test_collision_conserves_mass_momentum(name, collide):
    lat = D3Q27
    f = rand_f(lat)
    rho, u = mom.density_velocity(lat, f)
    f_new = collide(lat, f, rho, u, NU)
    assert np.allclose(mom.density(lat, f_new), rho, atol=1e-12)
    assert np.allclose(mom.momentum(lat, f_new), mom.momentum(lat, f), atol=1e-12)


@pytest.mark.parametrize(
    "name,collide",
    [("SRT", col.collide_srt), ("BGK", col.collide_bgk), ("CUM", col.collide_cum)],
)
def test_collision_forcing_adds_momentum(name, collide):
    lat = D3Q27
    f = rand_f(lat)
    force = jnp.asarray(np.array([1e-3, -2e-3, 5e-4]).reshape(3, 1, 1, 1) * np.ones((3,) + SHAPE))
    rho, u = mom.density_velocity(lat, f, force=force)
    f_new = collide(lat, f, rho, u, NU, force=force)
    dj = mom.momentum(lat, f_new) - mom.momentum(lat, f)
    assert np.allclose(dj, force, atol=1e-10)


@pytest.mark.parametrize(
    "name,collide,eqfn",
    [
        ("SRT", col.collide_srt, eq.eq_quadratic),
        ("BGK", col.collide_bgk, eq.eq_inv_cum),  # BGK's factorized eq == inv-cum eq
        ("CUM", col.collide_cum, eq.eq_inv_cum),  # cumulant fixed point == inv-cum eq
    ],
)
def test_collision_equilibrium_fixed_point(name, collide, eqfn):
    lat = D3Q27
    rho, u = rand_state(lat, seed=3)
    feq = eqfn(lat, rho, u)
    rho2, u2 = mom.density_velocity(lat, feq)
    f_new = collide(lat, feq, rho2, u2, NU)
    assert np.allclose(f_new, feq, atol=1e-11), np.abs(np.asarray(f_new - feq)).max()


def test_cum_geier2017_and_antialias_options_run_and_conserve():
    lat = D3Q27
    f = rand_f(lat, seed=7)
    rho, u = mom.density_velocity(lat, f)
    f_new = col.collide_cum(lat, f, rho, u, NU, geier_2017=True, antialias=True)
    assert np.allclose(mom.density(lat, f_new), rho, atol=1e-12)
    assert np.allclose(mom.momentum(lat, f_new), mom.momentum(lat, f), atol=1e-12)
    assert np.isfinite(np.asarray(f_new)).all()


def test_central_moment_roundtrip():
    lat = D3Q27
    f = rand_f(lat, seed=9)
    rho, u = mom.density_velocity(lat, f)
    k = col.central_moments(lat, f, u)
    f2 = col.dfs_from_central_moments(lat, k, u)
    assert np.allclose(f2, f, atol=1e-12)
    # k_000 is rho, first central moments vanish (u has no force term)
    assert np.allclose(k[0][0][0], rho, atol=1e-12)
    assert np.allclose(k[1][0][0], 0, atol=1e-12)
    assert np.allclose(k[0][1][0], 0, atol=1e-12)
    assert np.allclose(k[0][0][1], 0, atol=1e-12)
