"""Conservation + fixed-point tests for the full collision-operator inventory."""

import jax.numpy as jnp
import numpy as np
import pytest

from tnl_lbm_tpu.models import D3Q7, D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops import collision_ade as ade
from tnl_lbm_tpu.ops import collision_kbc as kbc
from tnl_lbm_tpu.ops import equilibrium as eq
from tnl_lbm_tpu.ops import moments as mom

SHAPE = (3, 4, 5)
NU = 0.02


def rand_f(lat, seed=1, scale=0.1):
    rng = np.random.default_rng(seed)
    w = lat.w.reshape((lat.Q,) + (1,) * len(SHAPE))
    return jnp.asarray(w * (1.0 + scale * rng.standard_normal((lat.Q,) + SHAPE)))


D3Q27_OPS = [(name, fn) for name, fn in col.COLLISIONS_D3Q27.items()]
KBC_OPS = [(name, fn) for name, fn in kbc.COLLISIONS_KBC.items()]


@pytest.mark.parametrize("name,fn", D3Q27_OPS + KBC_OPS)
def test_d3q27_mass_momentum_conservation(name, fn):
    lat = D3Q27
    well = "WELL" in name
    f = rand_f(lat) - (jnp.asarray(lat.w.reshape(27, 1, 1, 1)) if well else 0.0)
    rho, u = mom.density_velocity(lat, f, well=well)
    f_new = fn(lat, f, rho, u, NU)
    rho2 = mom.density(lat, f_new, well=well)
    assert np.allclose(rho2, rho, atol=1e-11), name
    assert np.allclose(mom.momentum(lat, f_new), mom.momentum(lat, f), atol=1e-11), name


@pytest.mark.parametrize(
    "name,fn,eqfn",
    [
        ("MRT_LES", col.collide_mrt_les, eq.eq_quadratic),
        ("CLBM", col.collide_clbm, eq.eq_inv_cum),
        ("SRT_MODIF_FORCE", col.collide_srt_modif_force, eq.eq_quadratic),
    ]
    + [(name, fn, eq.eq_inv_cum) for name, fn in KBC_OPS],
)
def test_d3q27_equilibrium_fixed_point(name, fn, eqfn):
    lat = D3Q27
    rng = np.random.default_rng(3)
    rho = jnp.asarray(1.0 + 0.05 * rng.standard_normal(SHAPE))
    u = jnp.asarray(0.05 * rng.standard_normal((3,) + SHAPE))
    feq = eqfn(lat, rho, u)
    rho2, u2 = mom.density_velocity(lat, feq)
    f_new = fn(lat, feq, rho2, u2, NU)
    assert np.allclose(f_new, feq, atol=1e-10), (name, np.abs(np.asarray(f_new - feq)).max())


def _ade_product_eq(lat, phi, u):
    """Moment-matched equilibrium of the D3Q7 moment-space operators:
    mu_1a = phi v_a, mu_2a = phi (cs^2 + v_a^2) exactly per axis."""
    cs2 = 1.0 / float(lat.i_cs2)
    out = [None] * lat.Q
    ix = lat.idx
    names = (("mzz", "pzz"), ("zmz", "zpz"), ("zzm", "zzp"))
    total = 0.0
    for a, (nm, np_) in enumerate(names):
        va = u[a]
        out[ix(np_)] = 0.5 * phi * (va * va + va + cs2)
        out[ix(nm)] = 0.5 * phi * (va * va - va + cs2)
        total = total + phi * (va * va + cs2)
    out[ix("zzz")] = phi - total
    return jnp.stack(out)


@pytest.mark.parametrize("name,fn", [(n, f) for n, f in ade.COLLISIONS_D3Q7.items()])
def test_ade_scalar_conservation_and_fixed_point(name, fn):
    lat = D3Q7
    f = rand_f(lat, seed=4)
    u = jnp.asarray(0.04 * np.random.default_rng(5).standard_normal((3,) + SHAPE))
    phi = mom.density(lat, f)
    f_new = fn(lat, f, phi, u, NU)
    assert np.allclose(mom.density(lat, f_new), phi, atol=1e-12), name
    # equilibrium fixed point: SRT fixes the quadratic eq; the moment-space
    # operators fix the per-axis moment-matched (product) eq
    feq = eq.eq_quadratic(lat, phi, u) if name == "SRT" else _ade_product_eq(lat, phi, u)
    f_fix = fn(lat, feq, phi, u, NU)
    assert np.allclose(f_fix, feq, atol=1e-11), name


def test_well_variants_match_plain_in_exact_arithmetic():
    lat = D3Q27
    w = jnp.asarray(lat.w.reshape(27, 1, 1, 1))
    f = rand_f(lat, seed=6)
    g = f - w
    rho, u = mom.density_velocity(lat, f)
    for plain, wellv in [
        (col.COLLISIONS_D3Q27["SRT"], col.collide_srt_well),
        (col.collide_bgk, col.collide_bgk_well),
        (col.collide_clbm, col.collide_clbm_well),
    ]:
        f_post = plain(lat, f, rho, u, NU)
        g_post = wellv(lat, g, rho, u, NU)
        np.testing.assert_allclose(np.asarray(g_post + w), np.asarray(f_post), atol=1e-13)


def test_mrt_les_smagorinsky_increases_dissipation():
    """Off-equilibrium state must relax at least as fast with LES on."""
    lat = D3Q27
    f = rand_f(lat, seed=8, scale=0.3)
    rho, u = mom.density_velocity(lat, f)
    f_les = col.collide_mrt_les(lat, f, rho, u, NU)
    f_noles = col.collide_mrt_les(lat, f, rho, u, NU, smagorinsky_c=0.0)
    feq = eq.eq_quadratic(lat, rho, u)
    d_les = float(jnp.abs(f_les - feq).sum())
    d_noles = float(jnp.abs(f_noles - feq).sum())
    assert d_les <= d_noles * 1.0001


def test_cumulant_cascade_op_budget():
    """Round-3's trace-time zero folding + per-axis factorization cut the
    cumulant collision to 727 (CUM_WELL) / 644 (CUM) post-DCE traced ops
    (docs/PERFORMANCE.md table; the headline kernel is VPU-bound, so op
    count is the throughput proxy).  Guard against silent regrowth."""
    import jax
    import jax.numpy as jnp
    from jax.interpreters import partial_eval as pe

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col

    def count_ops(collide):
        shape = (4, 8, 16)
        f = jnp.ones((27,) + shape, jnp.float32) * 0.03
        rho = jnp.ones(shape, jnp.float32)
        u = jnp.ones((3,) + shape, jnp.float32) * 0.01
        jaxpr = jax.make_jaxpr(
            lambda f, rho, u: collide(D3Q27, f, rho, u, 0.02))(f, rho, u)
        dced, _ = pe.dce_jaxpr(jaxpr.jaxpr,
                               [True] * len(jaxpr.jaxpr.outvars))
        return len(dced.eqns)

    assert count_ops(col.collide_cum_well) <= 750
    assert count_ops(col.collide_cum) <= 670
