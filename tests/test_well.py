"""Well-conditioned (deviation-DF) storage: exact equivalence + conditioning."""

import jax
import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.models import D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops import equilibrium as eq
from tnl_lbm_tpu.ops import moments as mom

SHAPE = (4, 4, 4)


def _state(seed=5):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(D3Q27.w.reshape(27, 1, 1, 1))
    f = w * (1 + 0.05 * rng.standard_normal((27,) + SHAPE))
    return f, w


def test_well_moments_match():
    f, w = _state()
    g = f - w
    rho, u = mom.density_velocity(D3Q27, f)
    rho_w, u_w = mom.density_velocity(D3Q27, g, well=True)
    assert np.allclose(rho, rho_w, atol=1e-14)
    assert np.allclose(u, u_w, atol=1e-14)


def test_cum_well_equivalent_to_cum():
    """CUM_WELL on deviations == CUM on totals (exact rewrite;
    reference col_cum_well.h vs col_cum.h)."""
    f, w = _state()
    g = f - w
    rho, u = mom.density_velocity(D3Q27, f)
    f_post = col.collide_cum(D3Q27, f, rho, u, 0.02)
    g_post = col.collide_cum(D3Q27, g, rho, u, 0.02, well=True)
    np.testing.assert_allclose(np.asarray(g_post + w), np.asarray(f_post), atol=1e-13)


def test_cum_well_antialias_equivalent():
    f, w = _state(seed=9)
    g = f - w
    rho, u = mom.density_velocity(D3Q27, f)
    f_post = col.collide_cum(D3Q27, f, rho, u, 0.02, antialias=True)
    g_post = col.collide_cum(D3Q27, g, rho, u, 0.02, antialias=True, well=True)
    np.testing.assert_allclose(np.asarray(g_post + w), np.asarray(f_post), atol=1e-13)


def test_cum_well_f32_preserves_tiny_forcing():
    """The reason WELL exists: at float32, a forcing ~1e-7 on O(0.1) DFs
    survives in deviation storage (it dies in total storage on TPU)."""
    fx = 2.57e-7
    g = jnp.zeros((27,) + SHAPE, jnp.float32)
    force = jnp.asarray(np.array([fx, 0, 0]).reshape(3, 1, 1, 1), jnp.float32)

    @jax.jit
    def step_coll(g):
        rho, u = mom.density_velocity(D3Q27, g, force=force, well=True)
        return col.collide_cum(D3Q27, g, rho, u, 0.001, well=True)

    for _ in range(5):
        g = step_coll(g)
    rho, u = mom.density_velocity(D3Q27, g, force=force, well=True)
    expected = 5 * fx + fx / 2
    assert abs(float(u[0].mean()) - expected) < 0.05 * expected


def test_eq_well_is_shifted_eq():
    rho = jnp.asarray(1.0 + 0.01 * np.random.default_rng(0).standard_normal(SHAPE))
    u = jnp.asarray(0.03 * np.random.default_rng(1).standard_normal((3,) + SHAPE))
    w = jnp.asarray(D3Q27.w.reshape(27, 1, 1, 1))
    np.testing.assert_allclose(
        np.asarray(eq.eq_well(D3Q27, rho, u)),
        np.asarray(eq.eq_quadratic(D3Q27, rho, u) - w),
        atol=1e-14,
    )
