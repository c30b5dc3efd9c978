"""sim_2 analog: square-duct analytic verification (integration test).

The full convergence run takes ~1e5 steps; CI asserts the error norm is
finite, decreasing, and the velocity profile has the right shape early in
the transient (the analytic solution is the steady state the flow relaxes
to; reference sim_NSE/sim_2.cu:63-113, 193-257).
"""

import numpy as np
import pytest

from tnl_lbm_tpu.apps import sim_2


def test_analytical_profile_properties():
    ux = sim_2.duct_analytical_ux(34, 34, fx_lbm=1e-6, nu_lbm=0.01)
    # zero on walls, positive inside, maximum at the center
    assert ux[0].max() == 0 and ux[-1].max() == 0
    assert ux[:, 0].max() == 0 and ux[:, -1].max() == 0
    interior = ux[2:-2, 2:-2]
    assert (interior > 0).all()
    c = np.unravel_index(np.argmax(ux), ux.shape)
    assert abs(c[0] - 17) <= 1 and abs(c[1] - 17) <= 1
    # symmetry
    np.testing.assert_allclose(ux, ux[::-1, :], atol=1e-12)
    np.testing.assert_allclose(ux, ux[:, ::-1], atol=1e-12)
    # Poiseuille-like magnitude: for a square duct u_max ~= 0.295 fx a^2 / nu
    a = 34 / 2 - 1
    assert np.isclose(ux.max(), 0.295 * 1e-6 * a**2 / 0.01, rtol=0.02)


def test_duct_error_decreases(tmp_path):
    import jax

    # 600 steps of runtime: re-enable the XLA optimizations the conftest
    # turns off for the compile-dominated tests (3x wall here otherwise)
    jax.config.update("jax_disable_most_optimizations", False)
    try:
        sim = sim_2.build(1, final_time=1e9, results_parent=tmp_path)
        assert sim.can_compute()
        sim.sim_init()
        errors = []
        for _ in range(4):
            sim._advance(150)
            sim.probe1()
            errors.append(sim.last_errors[0])
        sim._lock.release()
    finally:
        jax.config.update("jax_disable_most_optimizations", True)
    assert np.isfinite(errors).all()
    # l1 error decreases monotonically while the flow develops
    assert errors[-1] < errors[0] * 0.99
    assert all(b <= a for a, b in zip(errors, errors[1:]))


def test_weak_scaling_lattice_sizes():
    s1 = sim_2.build(1, results_parent="/tmp/nonexistent_a", scaling="weak_1d", n_devices=4)
    assert s1.domain.shape[0] == 4 * 32
    s2 = sim_2.build(1, results_parent="/tmp/nonexistent_b", scaling="weak_3d", n_devices=8)
    assert s2.domain.shape == (64, 64, 64)
