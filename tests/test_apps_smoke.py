"""Every application builds and runs a few steps end-to-end (the reference
tests apps by running them at tiny sizes, README.md:74-77 / SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest


def _run_few_steps(sim, n_steps=3):
    sim.phys_final_time = (n_steps + 0.5) * sim.domain.units.phys_dt
    ok = sim.run()
    assert ok, "run() reported failure (NaN?)"
    assert sim.iterations >= n_steps
    assert bool(jnp.isfinite(sim.f).all())
    return sim


def test_sim_1_smoke(tmp_path):
    from tnl_lbm_tpu.apps.sim_1 import build

    _run_few_steps(build(resolution=1, results_parent=tmp_path))


@pytest.mark.slow
def test_sim_1_aa_smoke(tmp_path):
    from tnl_lbm_tpu.apps.sim_1 import build

    _run_few_steps(build(resolution=1, results_parent=tmp_path, streaming="AA"),
                   n_steps=4)


@pytest.mark.slow
def test_sim_3_smoke(tmp_path):
    from tnl_lbm_tpu.apps.sim_3 import build

    _run_few_steps(build(resolution=1, results_parent=tmp_path))


def test_sim2d_1_smoke(tmp_path):
    from tnl_lbm_tpu.apps.sim2d_1 import build

    _run_few_steps(build(resolution=1, results_parent=tmp_path))


def test_sim_coupled_smoke(tmp_path):
    from tnl_lbm_tpu.apps.sim_coupled import build

    sim = build(resolution=1, results_parent=tmp_path)
    _run_few_steps(sim)
    assert bool(jnp.isfinite(sim.phi).all())


@pytest.mark.slow
def test_sim_ibm_smoke(tmp_path):
    from tnl_lbm_tpu.apps.sim_ibm import build

    sim = build(results_parent=tmp_path)
    from tnl_lbm_tpu.sim.state import VTK2D

    sim.cnt[VTK2D].period = sim.domain.units.phys_dt  # force a points write
    _run_few_steps(sim, n_steps=2)
    assert any((sim.results_dir / "ibm_points").glob("*.vtk"))


def test_sim_ibm_smoke_xla(tmp_path):
    """Fast-tier sim_ibm drive on the XLA step (the fused IBM path is
    covered by the slow-tier smoke + hooked-kernel parity tests)."""
    import jax.numpy as jnp

    from tnl_lbm_tpu.apps.sim_ibm import build
    from tnl_lbm_tpu.sim.state import VTK2D

    sim = build(results_parent=tmp_path, use_fused=False)
    sim.cnt[VTK2D].period = sim.domain.units.phys_dt
    _run_few_steps(sim, n_steps=2)
    assert any((sim.results_dir / "ibm_points").glob("*.vtk"))
