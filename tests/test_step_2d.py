import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tnl_lbm_tpu.models import D2Q9
from tnl_lbm_tpu.ops import collision_2d as col2
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig, initial_dfs, make_step
from tnl_lbm_tpu.utils import Lattice


def channel_domain(X=8, Y=19):
    units = Lattice(global_size=(X, Y), phys_origin=(0.0, 0.0), phys_dl=1.0, phys_dt=1.0)
    m = np.zeros((X, Y), dtype=np.uint8)
    m[:, 0] = GEO.WALL
    m[:, Y - 1] = GEO.WALL
    return Domain(lat=D2Q9, units=units, map=m, periodic=(True, False))


@pytest.mark.parametrize("collision", [col2.collide_srt_2d, col2.collide_clbm_2d], ids=["SRT", "CLBM"])
def test_poiseuille_body_force(collision):
    """Body-force-driven channel flow converges to the parabolic profile.

    This is the de-facto physics smoke test of the whole step: streaming +
    wall bounce-back + collision + forcing all must be right to get the
    parabola (analog of the reference's analytical verification strategy,
    SURVEY.md section 4).
    """
    X, Y = 8, 19
    nu, fx = 0.1, 1e-5
    dom = channel_domain(X, Y)
    cfg = LBMConfig(lat=D2Q9, collision=collision, compute_dtype=jnp.float64)
    step = make_step(cfg, dom)
    f0 = initial_dfs(cfg, dom)
    force = jnp.array([fx, 0.0])

    @jax.jit
    def run(f, n_steps):
        def body(i, f):
            f, rho, u = step(f, nu, force=force)
            return f
        return jax.lax.fori_loop(0, n_steps, body, f)

    f = run(f0, 6000)
    _, rho, u = step(f, nu, force=force)
    ux = np.asarray(u[0][0, :])  # profile across the channel at x=0

    H = Y - 2  # channel width in lattice units (walls act half-way outside)
    j = np.arange(1, Y - 1)
    yy = j - 0.5
    ux_ana = fx / (2 * nu) * yy * (H - yy)
    rel = np.abs(ux[1:-1] - ux_ana).max() / ux_ana.max()
    assert rel < 0.02, f"Poiseuille profile error {rel:.4f}"
    # x-invariance (periodic axis)
    assert np.allclose(np.asarray(u[0]).std(axis=0).max(), 0, atol=1e-12)


def test_mass_conservation_periodic():
    """Fully periodic fluid box: streaming is a permutation, so mass and
    momentum are conserved to round-off over many steps."""
    from tnl_lbm_tpu.ops import collision as col3
    from tnl_lbm_tpu.models import D3Q27

    X = Y = Z = 6
    units = Lattice(global_size=(X, Y, Z), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    dom = Domain(lat=D3Q27, units=units, map=np.zeros((X, Y, Z), np.uint8), periodic=(True,) * 3)
    cfg = LBMConfig(lat=D3Q27, collision=col3.collide_cum, compute_dtype=jnp.float64)
    step = make_step(cfg, dom)

    rng = np.random.default_rng(0)
    rho0 = jnp.asarray(1 + 0.01 * rng.standard_normal((X, Y, Z)))
    u0 = jnp.asarray(0.02 * rng.standard_normal((3, X, Y, Z)))
    from tnl_lbm_tpu.ops import equilibrium as eqlib
    f = eqlib.eq_quadratic(D3Q27, rho0, u0)

    mass0 = float(jnp.sum(f))
    from tnl_lbm_tpu.ops import moments as mom
    j0 = np.asarray(mom.momentum(D3Q27, f).sum(axis=(1, 2, 3)))
    for _ in range(10):
        f, rho, u = step(f, 0.02)
    assert np.isclose(float(jnp.sum(f)), mass0, rtol=0, atol=1e-10 * mass0)
    j1 = np.asarray(mom.momentum(D3Q27, f).sum(axis=(1, 2, 3)))
    assert np.allclose(j1, j0, atol=1e-12 * mass0)


def test_wall_macro_output():
    dom = channel_domain()
    cfg = LBMConfig(lat=D2Q9, collision=col2.collide_srt_2d, compute_dtype=jnp.float64)
    step = make_step(cfg, dom)
    f = initial_dfs(cfg, dom)
    f, rho, u = step(f, 0.1)
    assert np.allclose(np.asarray(rho)[:, 0], 1.0)
    assert np.allclose(np.asarray(u)[:, :, 0], 0.0)
