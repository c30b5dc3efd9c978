"""Fused D2Q9 Pallas kernel == XLA reference path, incl. Bouzidi
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tnl_lbm_tpu.kernels.fused_2d import make_fused_step_2d, supports_2d
from tnl_lbm_tpu.models import D2Q9
from tnl_lbm_tpu.ops import collision_2d as col2
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig, make_step
from tnl_lbm_tpu.utils import Lattice


def channel_domain(X=16, Y=16, bouzidi=False, seed=0):
    """sim2d_2-style channel: INFLOW left, OUTFLOW_RIGHT, walls + NOTHING
    rows, optionally a Bouzidi near-wall band with random thetas."""
    units = Lattice(global_size=(X, Y), phys_origin=(0, 0), phys_dl=1.0, phys_dt=1.0)
    m = np.zeros((X, Y), np.uint8)
    m[:, 1] = m[:, Y - 2] = GEO.WALL
    m[:, 0] = m[:, Y - 1] = GEO.NOTHING
    m[0, 2 : Y - 2] = GEO.INFLOW
    m[X - 1, 2 : Y - 2] = GEO.OUTFLOW_RIGHT
    bz = None
    if bouzidi:
        rng = np.random.default_rng(seed)
        m[4:6, 5:9] = GEO.WALL
        m[3, 5:9] = m[6, 5:9] = GEO.FLUID_NEAR_WALL
        bz = np.full((8, X, Y), -1.0, np.float32)
        nw = m == GEO.FLUID_NEAR_WALL
        bz[:, nw] = rng.uniform(0.05, 0.95, (8, int(nw.sum()))).astype(np.float32)
    return Domain(lat=D2Q9, units=units, map=m, bouzidi=bz)


def rand_f(dom, cfg, seed=0):
    rng = np.random.default_rng(seed)
    rho = jnp.asarray(1 + 0.01 * rng.standard_normal(dom.shape), jnp.float32)
    u = jnp.asarray(0.02 * rng.standard_normal((2,) + dom.shape), jnp.float32)
    return cfg.eq(cfg.lat, rho, u).astype(cfg.compute_dtype)


def parabolic_profile(Y, umax=0.05):
    s = np.clip((np.arange(Y) - 1) / (Y - 3), 0.0, 1.0)
    prof = np.zeros((2, 1, Y))
    prof[0, 0] = umax * 4 * s * (1 - s)
    return jnp.asarray(prof, jnp.float32)


@pytest.mark.parametrize("bouzidi", [False, True], ids=["plain", "bouzidi"])
@pytest.mark.parametrize("uin_kind", ["profile", "vector"])
def test_fused_2d_matches_xla(bouzidi, uin_kind):
    dom = channel_domain(bouzidi=bouzidi)
    cfg = LBMConfig(lat=D2Q9, collision=col2.collide_clbm_2d)
    assert supports_2d(cfg, dom)
    step_ref = make_step(cfg, dom)
    step_2d = make_fused_step_2d(cfg, dom)
    prof = (parabolic_profile(dom.shape[1]) if uin_kind == "profile"
            else jnp.asarray([0.03, 0.0], jnp.float32))
    f1 = f2 = rand_f(dom, cfg, seed=41)
    for it in range(4):
        f1, rho1, u1 = step_ref(f1, 0.02, u_in=prof)
        f2, rho2, u2 = step_2d(f2, 0.02, u_in=prof)
        assert float(jnp.abs(f1 - f2).max()) < 1e-6, f"step {it}"
    assert float(jnp.abs(rho1 - rho2).max()) < 2e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


def test_fused_2d_periodic_force():
    """Periodic-x body-force channel (sim2d_1 style) on the fused path."""
    units = Lattice(global_size=(16, 16), phys_origin=(0, 0), phys_dl=1.0, phys_dt=1.0)
    m = np.zeros((16, 16), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    dom = Domain(lat=D2Q9, units=units, map=m, periodic=(True, False))
    cfg = LBMConfig(lat=D2Q9, collision=col2.collide_clbm_2d)
    step_ref = make_step(cfg, dom)
    step_2d = make_fused_step_2d(cfg, dom)
    force = jnp.asarray([1e-5, 0.0], jnp.float32)
    f1 = f2 = rand_f(dom, cfg, seed=43)
    for _ in range(4):
        f1, rho1, u1 = step_ref(f1, 0.05, force=force)
        f2, rho2, u2 = step_2d(f2, 0.05, force=force)
    assert float(jnp.abs(f1 - f2).max()) < 1e-6
    assert float(jnp.abs(u1 - u2).max()) < 1e-6


def test_fused_2d_simulation_routing():
    """Simulation picks the 2D Pallas kernel for supported 2D configs."""
    from tnl_lbm_tpu.sim.state import Simulation

    dom = channel_domain(bouzidi=True)
    cfg = LBMConfig(lat=D2Q9, collision=col2.collide_clbm_2d)
    sim = Simulation(cfg, dom, sim_id="t2droute", results_parent="/tmp",
                     use_fused=True, phys_final_time=1.0)
    assert sim._fused_ok()


@pytest.mark.slow
def test_sim2d_3_fused_matches_xla_golden(tmp_path):
    """sim2d_3 KE golden value: fused D2Q9 kernel vs XLA step.

    ~3 min in interpret mode (180 steps of the whole-domain kernel), hence
    slow-tier; the fast tier covers the same kernel via the 4-step parity
    tests above."""
    from tests.test_geometry_pipeline import write_geometry
    from tnl_lbm_tpu.apps import sim2d_3

    X, Y = 128, 32
    p = tmp_path / "9.txt"
    write_geometry(p, X, Y, disk_center=(40, 16), r_in=4.0)
    vals = {}
    for fused in (True, False):
        tag = "fused" if fused else "xla"
        sim = sim2d_3.build(
            1, str(p), enable_bouzidi=True, final_time=0.05,
            results_parent=tmp_path / tag, values_dir=tmp_path / f"values_{tag}",
            use_fused=fused,
        )
        assert sim.run()
        vals[tag] = float((tmp_path / f"values_{tag}" / "value_9.txt").read_text())
    assert np.isfinite(vals["fused"]) and vals["fused"] > 0
    assert abs(vals["fused"] - vals["xla"]) <= 1e-3 * abs(vals["xla"])
