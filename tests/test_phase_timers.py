"""Hooked-pipeline per-phase timers (VERDICT r3 item 6; reference IBM
phase-timing JSON lagrange_3D.hpp:368-378,856-859)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tnl_lbm_tpu.models import D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops import equilibrium as eqlib
from tnl_lbm_tpu.ops import non_newtonian as nn
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig
from tnl_lbm_tpu.utils import Lattice


def _nn_setup(Z=8):
    X, Y = 8, 16
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, True))
    hook = nn.make_nn_forcing_hook(
        nn.CarreauYasuda(nu0=0.1, lam=1.0, a=2.0, n=0.5),
        periodic=(True, False, True))
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well,
                    eq=eqlib.eq_well, well=True, forcing_hook=hook)
    f0 = cfg.eq(cfg.lat, jnp.ones(dom.shape),
                jnp.zeros((3,) + dom.shape)).astype(cfg.compute_dtype)
    return cfg, dom, f0


def test_phase_times_three_phase_pipeline():
    from tnl_lbm_tpu.kernels.hooked import make_hooked_fused_step

    cfg, dom, f0 = _nn_setup()
    step = make_hooked_fused_step(cfg, dom, tile=(8, 8), single_kernel=False)
    pt = step.phase_times(f0, 0.02, force=jnp.asarray([1e-5, 0, 0]),
                          repeats=1)
    assert {"ustar", "hook", "main_kernel"} <= set(pt)
    assert all(v > 0 for v in pt.values()), pt


def test_phase_times_single_kernel_path():
    from tnl_lbm_tpu.kernels.hooked import make_hooked_fused_step

    cfg, dom, f0 = _nn_setup()
    step = make_hooked_fused_step(cfg, dom, tile=(8, 8))
    pt = step.phase_times(f0, 0.02, force=jnp.asarray([1e-5, 0, 0]),
                          repeats=1)
    assert set(pt) == {"single_kernel"}
    assert pt["single_kernel"] > 0


@pytest.mark.slow
def test_driver_samples_phase_timers(tmp_path):
    """sample_phase_timers logs the measured split for a hooked run and
    after_sim_finished emits it automatically."""
    from tnl_lbm_tpu.sim.state import Simulation

    cfg, dom, _ = _nn_setup()

    class Sim(Simulation):
        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

    sim = Sim(cfg, dom, sim_id="phases", results_parent=tmp_path,
              use_fused=True, phys_final_time=1e9)
    sim.sim_init()
    sim._advance(2)
    pt = sim.sample_phase_timers(repeats=1)
    assert pt is not None and all(v > 0 for v in pt.values())
    sim.after_sim_finished()
    sim._lock.release()
    log = (tmp_path / "results_phases" / "log_main").read_text()
    assert "hooked phases (sampled)" in log
