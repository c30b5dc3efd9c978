"""lax.scan-chunked dispatch (sim/state.py _advance_scan) equivalence.

The driver replaces n_steps per-step jit dispatches with ONE jitted
lax.scan whenever the chunk is hook-free and the inflow/force are
constant across the chunk (the dominant cost on tunneled TPU backends
is per-dispatch RPC latency - the round-4 golden sweep measured
~100 ms/step on a 128x32 grid, nearly all dispatch).

These tests pin: (a) the scan path produces bitwise/tolerance-equal
state and Welford statistics vs the per-step loop, (b) the AA parity
pairing inside the scan matches per-step parity dispatch, (c) the gate
correctly refuses time-varying inflows and per-step-state hooks.
"""

import numpy as np
import pytest

from tnl_lbm_tpu.models import D2Q9
from tnl_lbm_tpu.ops import collision_2d as col2
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig
from tnl_lbm_tpu.sim.state import Simulation, needs_per_step_state
from tnl_lbm_tpu.utils import Lattice


class ChannelSim(Simulation):
    def update_inflow(self, phys_time):
        return np.array([0.05, 0.0])


def make_sim(tmp_path, sim_id, cls=ChannelSim, **kw):
    X, Y = 32, 16
    m = np.zeros((X, Y), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[0, 1:-1] = GEO.INFLOW
    m[-1, 1:-1] = GEO.OUTFLOW_EQ
    units = Lattice(global_size=(X, Y), phys_origin=(0.0, 0.0),
                    phys_dl=0.01, phys_dt=0.001, phys_viscosity=1e-3)
    dom = Domain(lat=D2Q9, units=units, map=m)
    cfg = LBMConfig(lat=D2Q9, collision=col2.collide_clbm_2d)
    return cls(cfg, dom, sim_id=sim_id, results_parent=tmp_path, **kw)


def run_pair(tmp_path, cls=ChannelSim, n_dispatch=6, stats=False, **kw):
    """Run the same sim twice: scan-eligible vs scan force-disabled.
    Returns (sim_scan, sim_loop, scan_used: bool)."""
    used = []
    sims = []
    for sid, disable in (("scan", False), ("loop", True)):
        s = make_sim(tmp_path, f"{sid}", cls=cls, phys_final_time=0.012,
                     steps_per_dispatch=n_dispatch, **kw)
        if stats:
            s.collect_stats = True
        if disable:
            s._scan_chunk_args = lambda n, u: None
        else:
            orig = s._advance_scan

            def spy(n, nu, u, f, _orig=orig):
                used.append(n)
                return _orig(n, nu, u, f)

            s._advance_scan = spy
        assert s.run()
        sims.append(s)
    return sims[0], sims[1], bool(used)


def test_scan_matches_per_step(tmp_path):
    a, b, used = run_pair(tmp_path, stats=True)
    assert used, "scan path never engaged for a steady-inflow chunk"
    assert a.iterations == b.iterations == 12
    assert a.stat_counter == b.stat_counter == 12
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u), atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.rho), np.asarray(b.rho), atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.vm), np.asarray(b.vm), atol=1e-7)
    np.testing.assert_allclose(np.asarray(a.vm2), np.asarray(b.vm2), atol=1e-9)


def test_scan_aa_parity(tmp_path):
    """AA streaming: scan runs (even, odd) parity pairs inside one program
    and must match the per-step parity dispatch exactly."""
    import jax.numpy as jnp

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col3
    from tnl_lbm_tpu.ops import equilibrium as eqlib

    X, Y, Z = 12, 8, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    units = Lattice(global_size=(X, Y, Z), phys_origin=(0, 0, 0),
                    phys_dl=0.01, phys_dt=0.001, phys_viscosity=1e-3)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, True))
    cfg = LBMConfig(lat=D3Q27, collision=col3.collide_srt_well, eq=eqlib.eq_well,
                    well=True, streaming="AA", compute_dtype=jnp.float32)

    class ForcedSim(Simulation):
        def body_force(self, phys_time):
            return np.array([1e-5, 0.0, 0.0])

    used = []
    sims = []
    for sid, disable in (("aas", False), ("aal", True)):
        s = ForcedSim(cfg, dom, sim_id=sid, results_parent=tmp_path,
                      phys_final_time=0.008, steps_per_dispatch=4,
                      use_fused=False)
        if disable:
            s._scan_chunk_args = lambda n, u: None
        else:
            orig = s._advance_scan
            s._advance_scan = lambda n, nu, u, f, _o=orig: (used.append(n), _o(n, nu, u, f))[1]
        assert s.run()
        sims.append(s)
    assert used
    np.testing.assert_allclose(np.asarray(sims[0].f), np.asarray(sims[1].f),
                               atol=1e-6)


def test_scan_gate_refuses_time_varying_inflow(tmp_path):
    class RampSim(Simulation):
        def update_inflow(self, phys_time):
            return np.array([0.01 + 0.1 * phys_time, 0.0])

    a, b, used = run_pair(tmp_path, cls=RampSim)
    assert not used, "scan must not engage when inflow varies inside a chunk"
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f))


def test_scan_gate_refuses_per_step_hooks(tmp_path):
    seen = []

    class HookSim(ChannelSim):
        @needs_per_step_state
        def compute_after_step(self):
            seen.append(float(np.asarray(self.f).sum()))

    a, b, used = run_pair(tmp_path, cls=HookSim)
    assert not used
    assert len(seen) == 24  # 12 steps x 2 sims: hook really ran per step
