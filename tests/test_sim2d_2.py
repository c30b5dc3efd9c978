"""sim2d_2 statistics state machine and output-field parity.

The reference app (sim_2D/sim2d_2.cu) accumulates a running mean, freezes it
when the ROI mean speed stabilizes (or at the deadline), accumulates
fluctuations around the frozen mean, exports the ROI TKE integral once and
terminates; its VTK output carries mean/fluctuation fields
(sim2d_2.cu:334-391, 396-437)."""

import numpy as np

from tnl_lbm_tpu.apps.sim2d_2 import build


def _tiny(tmp_path, **kw):
    sim = build(resolution=1, results_parent=tmp_path, **kw)
    sim.steps_per_dispatch = 1
    return sim


def test_two_phase_statistics_and_tke_export(tmp_path):
    dt = None
    value = tmp_path / "value_none"
    sim = _tiny(tmp_path, value_path=str(value))
    dt = sim.domain.units.phys_dt
    # compress the whole state machine into a few dozen steps
    sim.stats_start_time = 2 * dt
    sim.stats_end_time = 10 * dt     # deadline freeze (skip stabilization)
    sim.mean_min_time = 1e9          # never stabilize via the check
    sim.fluc_min_time = 2 * dt
    sim.fluc_check_period = dt
    sim.fluc_stable_required = 2
    sim.fluc_rel_tol = 1e9           # any check counts as stable
    sim.phys_final_time = 60 * dt
    ok = sim.run()
    assert ok
    assert sim.means_frozen
    assert sim.mean_samples == 8     # steps 2..9
    assert sim.frozen_mean is not None
    assert sim.flucs_frozen
    assert sim.fluc_samples > 0
    assert sim.tke_value_written
    assert sim.terminate             # exported TKE terminates the run
    v = float(value.read_text())
    assert np.isfinite(v) and v >= 0
    # CSV snapshots carry the freeze events
    events = [r["event"] for r in sim.csv_rows]
    assert "mean_frozen" in events and "tke_exported" in events


def test_output_field_set_matches_reference(tmp_path):
    sim = _tiny(tmp_path)
    dt = sim.domain.units.phys_dt
    sim.phys_final_time = 2.5 * dt
    sim.run()
    scalars, vectors = sim.output_data()
    for name in ("lbm_density", "velocity_magnitude", "mean_vx", "mean_vy",
                 "mean_vel_mag", "mean_fluc_mag"):
        assert name in scalars, name
        assert np.isfinite(scalars[name]).all(), name
    assert "velocity" in vectors


def test_checkpoint_roundtrip_restores_accumulators(tmp_path):
    sim = _tiny(tmp_path)
    dt = sim.domain.units.phys_dt
    sim.stats_start_time = 0.0
    sim.stats_end_time = 1e9
    sim.phys_final_time = 5.5 * dt
    sim.run()
    assert sim.mean_samples > 0
    sim.save_state()

    sim2 = _tiny(tmp_path)
    sim2.stats_start_time = 0.0
    sim2.stats_end_time = 1e9
    sim2.phys_final_time = 5.5 * dt
    sim2.sim_init()
    assert sim2.sum_v is not None
    np.testing.assert_allclose(np.asarray(sim2.sum_v), np.asarray(sim.sum_v))
