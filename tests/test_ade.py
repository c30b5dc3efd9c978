"""ADE (D3Q7) lattice: diffusion physics, advection, transfer flags, coupling."""

import jax
import jax.numpy as jnp
import numpy as np

from tnl_lbm_tpu.models import D3Q7, D3Q27
from tnl_lbm_tpu.ops import collision_ade as ade
from tnl_lbm_tpu.ops import equilibrium as eqlib
from tnl_lbm_tpu.sim import Domain, LBMConfig
from tnl_lbm_tpu.sim.step_ade import ADEGEO, make_ade_step, transfer_direction_flags
from tnl_lbm_tpu.utils import Lattice


def periodic_ade_domain(n=32):
    units = Lattice(global_size=(n, 8, 8), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    return Domain(lat=D3Q7, units=units, map=np.zeros((n, 8, 8), np.uint8), periodic=(True,) * 3)


def gaussian_phi(n, sigma=3.0):
    x = np.arange(n) - n / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return jnp.asarray(np.broadcast_to(g[:, None, None], (n, 8, 8)).copy())


def test_pure_diffusion_variance_growth():
    n, D = 64, 0.05
    dom = periodic_ade_domain(n)
    cfg = LBMConfig(lat=D3Q7, collision=ade.collide_srt_ade, compute_dtype=jnp.float64)
    step = make_ade_step(cfg, dom)
    phi0 = gaussian_phi(n)
    u = jnp.zeros((3, n, 8, 8))
    g = eqlib.eq_quadratic(D3Q7, phi0, u)

    jstep = jax.jit(lambda g: step(g, u, D))
    total0 = float(phi0.sum())
    x = np.arange(n) - n / 2

    def variance(phi):
        p = np.asarray(phi)[:, 0, 0]
        p = p / p.sum()
        mean = (x * p).sum()
        return ((x - mean) ** 2 * p).sum()

    var0 = variance(phi0)
    steps = 200
    for _ in range(steps):
        g, phi = jstep(g)
    assert np.isclose(float(phi.sum()), total0, rtol=1e-12)
    var1 = variance(phi)
    # sigma^2 grows by 2 D t for 1D diffusion
    assert np.isclose(var1 - var0, 2 * D * steps, rtol=0.02), (var0, var1)


def test_advection_moves_blob():
    n = 64
    dom = periodic_ade_domain(n)
    cfg = LBMConfig(lat=D3Q7, collision=ade.collide_clbm_ade, compute_dtype=jnp.float64)
    step = make_ade_step(cfg, dom)
    phi0 = gaussian_phi(n)
    vx = 0.08
    u = jnp.broadcast_to(jnp.asarray([vx, 0, 0]).reshape(3, 1, 1, 1), (3, n, 8, 8))
    g = eqlib.eq_quadratic(D3Q7, phi0, u)
    jstep = jax.jit(lambda g: step(g, u, 0.01))
    steps = 100
    for _ in range(steps):
        g, phi = jstep(g)
    x = np.arange(n)
    p = np.asarray(phi)[:, 0, 0]
    centroid = (x * p).sum() / p.sum()
    assert np.isclose(centroid, n / 2 + vx * steps, atol=0.5)


def test_wall_body_keeps_phi_finite_and_bounded():
    n = 16
    units = Lattice(global_size=(n, 8, 8), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0)
    m = np.zeros((n, 8, 8), np.uint8)
    m[0] = ADEGEO.WALL_BODY
    m[-1] = ADEGEO.WALL
    dom = Domain(lat=D3Q7, units=units, map=m, periodic=(False, True, True))
    cfg = LBMConfig(lat=D3Q7, collision=ade.collide_mrt_ade, compute_dtype=jnp.float64)
    step = make_ade_step(cfg, dom)
    phi0 = jnp.ones((n, 8, 8)) * 0.5
    u = jnp.zeros((3, n, 8, 8))
    g = eqlib.eq_quadratic(D3Q7, phi0, u)
    for _ in range(20):
        g, phi = step(g, u, 0.02)
    assert np.isfinite(np.asarray(phi)).all()


def test_transfer_direction_flags():
    m = np.zeros((6, 4, 4), np.uint8)
    m[3:] = ADEGEO.SOLID
    flags = transfer_direction_flags(D3Q7, m)
    # only links crossing the x = 2/3 interface are flagged
    pzz = D3Q7.idx("pzz") - 1
    mzz = D3Q7.idx("mzz") - 1
    assert flags[pzz][2].all() and flags[mzz][3].all()
    assert not flags[pzz][0].any() and not flags[D3Q7.idx("zpz") - 1].any()


def test_coupled_nse_ade_runs_and_conserves_scalar(tmp_path):
    from tnl_lbm_tpu.ops import collision as col3
    from tnl_lbm_tpu.sim.coupled import CoupledSimulation

    n = 16
    units = Lattice(global_size=(n, 8, 8), phys_origin=(0, 0, 0), phys_dl=1.0, phys_dt=1.0,
                    phys_viscosity=0.02)
    nse_dom = Domain(lat=D3Q27, units=units, map=np.zeros((n, 8, 8), np.uint8), periodic=(True,) * 3)
    ade_dom = Domain(lat=D3Q7, units=units, map=np.zeros((n, 8, 8), np.uint8), periodic=(True,) * 3)
    cfg = LBMConfig(lat=D3Q27, collision=col3.collide_cum, compute_dtype=jnp.float64)
    ade_cfg = LBMConfig(lat=D3Q7, collision=ade.collide_clbm_ade, compute_dtype=jnp.float64)

    class Sim(CoupledSimulation):
        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

        def initial_phi(self):
            return gaussian_phi(n)[:, :8, :8] * 1.0

    sim = Sim(cfg, nse_dom, ade_cfg, ade_dom, ade_diffusion=0.01,
              sim_id="coupled_t", results_parent=tmp_path, phys_final_time=1e9)
    assert sim.can_compute()
    sim.sim_init()
    phi_total0 = float(jnp.sum(sim.phi))
    sim._advance(20)
    assert np.isfinite(np.asarray(sim.phi)).all()
    assert np.isclose(float(jnp.sum(sim.phi)), phi_total0, rtol=1e-12)
    assert float(jnp.abs(sim.u).max()) > 0  # flow developed and advects phi
    sim._lock.release()
