"""Single-kernel non-Newtonian step (kernels/fused_nn_step.py) vs the XLA
hooked step (sim/step.py with forcing_hook): A-B and both A-A parities."""

import jax.numpy as jnp
import numpy as np
import pytest

from tnl_lbm_tpu.models import D3Q27
from tnl_lbm_tpu.kernels.fused_nn_step import make_fused_nn_step, supports
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops import equilibrium as eqlib
from tnl_lbm_tpu.ops import non_newtonian as nn
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig, make_step
from tnl_lbm_tpu.utils import Lattice


def _case(streaming, model, per, dom_map, dom_per, Z, seed, steps=2,
          tile=(8, 8)):
    X, Y = dom_map.shape[0], dom_map.shape[1]
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=dom_map, periodic=dom_per)
    hook = nn.make_nn_forcing_hook(model, periodic=per)
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well,
                    eq=eqlib.eq_well, well=True, streaming=streaming,
                    forcing_hook=hook)
    assert supports(cfg, dom, per)
    rng = np.random.default_rng(seed)
    rho = jnp.asarray(1 + 0.01 * rng.standard_normal(dom.shape), jnp.float32)
    u0 = jnp.asarray(0.03 * rng.standard_normal((3,) + dom.shape), jnp.float32)
    f0 = cfg.eq(cfg.lat, rho, u0).astype(cfg.compute_dtype)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    fused = make_fused_nn_step(cfg, dom, model, per, tile=tile)
    xla = make_step(cfg, dom)
    f1, f2 = f0, f0
    for s in range(steps):
        parity = s % 2 if streaming == "AA" else 0
        f1, r1, u1 = fused(f1, 0.02, force=force, parity=parity)
        f2, r2, u2 = xla(f2, 0.02, force=force, parity=parity)
    assert float(jnp.abs(f1 - f2).max()) < 1e-6, streaming
    assert float(jnp.abs(u1 - u2).max()) < 1e-6, streaming
    assert float(jnp.abs(r1 - r2).max()) < 1e-6, streaming


def _duct_map(X=8, Y=16, Z=8):
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[:, :, 0] = m[:, :, -1] = GEO.WALL
    return m


def test_nn_step_ab_duct():
    """Wall duct + periodic-x: Carreau-Yasuda, A-B pattern."""
    _case("AB", nn.CarreauYasuda(nu0=0.1, lam=1.0, a=2.0, n=0.5),
          (True, False, False), _duct_map(), (True, False, False), 8, 21)


@pytest.mark.slow
def test_nn_step_aa_duct():
    """Same duct, A-A even + odd parities in sequence."""
    _case("AA", nn.CarreauYasuda(nu0=0.1, lam=1.0, a=2.0, n=0.5),
          (True, False, False), _duct_map(), (True, False, False), 8, 22)


@pytest.mark.slow
def test_nn_step_ab_nonperiodic_obstacle():
    """No periodic axes; interior obstacle exercises the wall-aware
    stencil switches and the domain-edge S/u replication fixes."""
    X, Y, Z = 8, 16, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 4:6, 3:5] = GEO.WALL
    _case("AB", nn.CarreauYasuda(nu0=0.08, lam=2.0, a=1.7, n=0.6),
          None, m, (False, False, False), Z, 23)


@pytest.mark.slow
def test_nn_step_aa_periodic_padded_lanes():
    """Fully periodic + Casson + ragged Z: exercises the padded-lane
    (Z % LANE != 0) kernel logic under CPU interpret, both parities."""
    from tnl_lbm_tpu.kernels import fused as fused_mod

    old_force, old_lane = fused_mod.FORCE_LANE_PAD, fused_mod.LANE
    fused_mod.FORCE_LANE_PAD, fused_mod.LANE = True, 16
    try:
        X, Y, Z = 8, 16, 12
        m = np.zeros((X, Y, Z), np.uint8)
        _case("AA", nn.Casson(k0=0.05, k1=0.02),
              (True, True, True), m, (True, True, True), Z, 24)
    finally:
        fused_mod.FORCE_LANE_PAD, fused_mod.LANE = old_force, old_lane


@pytest.mark.slow
def test_nn_step_multitile():
    """K > 1 tiles per program + x-tiling: window bookkeeping across the
    grid (16x16 lattice, tile (8, 8), two y tiles per program)."""
    X, Y, Z = 16, 16, 8
    m = _duct_map(X, Y, Z)
    _case("AB", nn.CarreauYasuda(nu0=0.1, lam=1.0, a=2.0, n=0.5),
          (True, False, False), m, (True, False, False), Z, 25,
          tile=(8, 8))
