import numpy as np
import pytest

from tnl_lbm_tpu.models import D2Q9
from tnl_lbm_tpu.ops import collision_2d as col2
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim import Domain, LBMConfig
from tnl_lbm_tpu.sim.state import PRINT, SAVESTATE, VTK1D, VTK2D, VTK3D, Probe1DCut, Probe2DCut, Simulation
from tnl_lbm_tpu.utils import Lattice


class ChannelSim(Simulation):
    def update_inflow(self, phys_time):
        return np.array([0.05, 0.0])


def make_sim(tmp_path, sim_id="t1", **kw):
    X, Y = 32, 16
    m = np.zeros((X, Y), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[0, 1:-1] = GEO.INFLOW
    m[-1, 1:-1] = GEO.OUTFLOW_EQ
    units = Lattice(global_size=(X, Y), phys_origin=(0.0, 0.0), phys_dl=0.01, phys_dt=0.001, phys_viscosity=1e-3)
    dom = Domain(lat=D2Q9, units=units, map=m)
    cfg = LBMConfig(lat=D2Q9, collision=col2.collide_clbm_2d)
    return ChannelSim(cfg, dom, sim_id=sim_id, results_parent=tmp_path, **kw)


def test_run_with_outputs(tmp_path):
    sim = make_sim(tmp_path, phys_final_time=0.05, steps_per_dispatch=5)
    sim.cnt[PRINT].period = 0.01
    sim.cnt[VTK3D].period = 0.02
    sim.cnt[VTK2D].period = 0.02
    sim.cnt[VTK1D].period = 0.02
    sim.probes_2d.append(Probe2DCut(axis=0, name="cutx", position=16))
    sim.probes_1d.append(Probe1DCut(axis=1, name="prof", pos=(16,)))
    ok = sim.run()
    assert ok
    assert sim.iterations == 50
    rd = sim.results_dir
    assert (rd / "flag.finished").exists()
    assert any((rd / "vtk3D").glob("*.vti"))
    assert any((rd / "vtk2D").glob("cutx_*.vti"))
    assert (rd / "probes" / "prof.dat").exists()
    # double-run protection: finished flag refuses rerun
    sim2 = make_sim(tmp_path, phys_final_time=0.05)
    assert sim2.run() is False


def test_vti_readable_by_numpy_roundtrip(tmp_path):
    # minimal sanity: file exists and contains the appended data magic
    sim = make_sim(tmp_path, sim_id="t2", phys_final_time=0.01)
    sim.cnt[VTK3D].period = 0.005
    sim.run()
    vti = next((sim.results_dir / "vtk3D").glob("*.vti"))
    blob = vti.read_bytes()
    assert b"<VTKFile" in blob and b"AppendedData" in blob
    assert b"lbm_density" in blob and b"velocity" in blob


def test_checkpoint_resume(tmp_path):
    sim = make_sim(tmp_path, sim_id="t3", phys_final_time=0.02)
    ok = sim.run()
    assert ok
    sim.save_state()
    it0 = sim.iterations
    f0 = np.asarray(sim.f)

    sim2 = make_sim(tmp_path, sim_id="t3", phys_final_time=0.04)
    sim2.flags.delete("finished")
    assert sim2.can_compute()
    sim2.sim_init()
    assert sim2.iterations == it0
    np.testing.assert_allclose(np.asarray(sim2.f), f0)
    sim2._lock.release()


@pytest.mark.slow
def test_use_fused_aa_driver(tmp_path):
    """Simulation with the fused A-A Pallas pair (interpret mode on CPU)
    matches the XLA path after a few steps."""
    import jax.numpy as jnp

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col3
    from tnl_lbm_tpu.ops import equilibrium as eqlib

    X, Y, Z = 16, 8, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[:, :, 0] = m[:, :, -1] = GEO.WALL
    units = Lattice(global_size=(X, Y, Z), phys_origin=(0, 0, 0),
                    phys_dl=0.01, phys_dt=0.001, phys_viscosity=1e-3)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, False))
    cfg = LBMConfig(lat=D3Q27, collision=col3.collide_srt_well, eq=eqlib.eq_well,
                    well=True, streaming="AA", compute_dtype=jnp.float32)

    class ForcedSim(Simulation):
        def body_force(self, phys_time):
            return np.array([1e-5, 0.0, 0.0])

    sims = []
    for sid, fused in (("aa_xla", False), ("aa_fused", True)):
        s = ForcedSim(cfg, dom, sim_id=sid, results_parent=tmp_path,
                      phys_final_time=0.004, use_fused=fused)
        assert s.run()
        sims.append(s)
    np.testing.assert_allclose(np.asarray(sims[0].f), np.asarray(sims[1].f), atol=1e-6)


def test_nan_guard(tmp_path):
    sim = make_sim(tmp_path, sim_id="t4", phys_final_time=1.0)
    sim.cnt[PRINT].period = 0.001  # check every step
    assert sim.can_compute()
    sim.sim_init()
    f = np.array(sim.f)  # writable copy
    f[0, 5, 5] = np.nan
    import jax.numpy as jnp

    sim.f = jnp.asarray(f)
    sim._advance(2)
    sim._after_sim_update()
    assert sim.terminate and sim.nan_detected
    sim._lock.release()
    assert any((sim.results_dir / "vtk3D").glob("*nan_dump*"))


def test_nan_guard_fires_without_print_period(tmp_path):
    """The NaN scan runs on its own step cadence, so a run with no PRINT
    counter configured still detects NaNs (the reference scans every step,
    state.hpp:1166-1188)."""
    import jax.numpy as jnp

    sim = make_sim(tmp_path, sim_id="t5", phys_final_time=1.0)
    assert sim.cnt[PRINT].period <= 0  # PRINT genuinely unset
    sim.nan_check_every = 3
    assert sim.can_compute()
    sim.sim_init()
    f = np.array(sim.f)
    f[0, 5, 5] = np.nan
    sim.f = jnp.asarray(f)
    for _ in range(4):
        sim._advance(1)
        sim._after_sim_update()
        if sim.terminate:
            break
    assert sim.terminate and sim.nan_detected
    sim._lock.release()


def test_second_statistics_window(tmp_path):
    """STAT2 semantics: two independent mean/covariance windows with
    separate reset counters (reference d3q27/macro.h:117-160,
    state.hpp:1231-1242)."""
    from tnl_lbm_tpu.sim.state import STAT2_RESET, STAT_RESET

    sim = make_sim(tmp_path, sim_id="t6", phys_final_time=0.02)
    sim.collect_stats = True
    sim.collect_stats2 = True
    # window 2 resets halfway; window 1 never does
    sim.cnt[STAT2_RESET].period = 0.012
    ok = sim.run()
    assert ok
    assert sim.stat_counter == sim.iterations
    assert 0 < sim.stat2_counter < sim.stat_counter
    # the two windows genuinely differ (different sample sets)
    assert not np.allclose(np.asarray(sim.vm), np.asarray(sim.vm_b))
    # both windows survive a checkpoint round-trip
    sim.save_state()
    sim2 = make_sim(tmp_path, sim_id="t6")
    sim2.collect_stats = sim2.collect_stats2 = True
    sim2.sim_init()
    assert sim2.stat2_counter == sim.stat2_counter
    np.testing.assert_allclose(np.asarray(sim2.vm_b), np.asarray(sim.vm_b))


def test_per_shard_checkpoint_roundtrip(tmp_path):
    """Sharded arrays are written per shard (reference checkpoint.h:58-101
    per-block analog) and reassembled exactly on load."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tnl_lbm_tpu.sim import checkpoint as ckpt

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("x", "y"))
    rng = np.random.default_rng(5)
    big = rng.standard_normal((9, 16, 8, 4)).astype(np.float32)
    sharded = jax.device_put(
        jnp.asarray(big), NamedSharding(mesh, P(None, "x", "y")))
    small = rng.standard_normal((7,)).astype(np.float32)

    ckpt.save_checkpoint(tmp_path, {"f": sharded, "s": small}, {"iterations": 42})
    # per-shard files exist; main file carries meta + unsharded arrays
    assert (tmp_path / "checkpoint.npz").exists()
    assert len(list(tmp_path.glob("checkpoint_shard*.npz"))) == 8

    arrays, meta = ckpt.load_checkpoint(tmp_path)
    assert meta["iterations"] == 42
    np.testing.assert_array_equal(arrays["f"], big)
    np.testing.assert_array_equal(arrays["s"], small)

    # a concurrent writer's in-flight save carries an epoch NEWER than the
    # published one (ADVICE r3) and must survive the GC; an epoch OLDER
    # than the superseded publish is an unreachable orphan (e.g. a save
    # that crashed before publishing) and must be collected, as must the
    # legacy unsuffixed layout
    import time as _time

    foreign = tmp_path / f"checkpoint_shard000_{_time.time_ns() + 10**12}.npz"
    np.savez(foreign, x=np.zeros(1))
    orphan = tmp_path / "checkpoint_shard000_999.npz"
    np.savez(orphan, x=np.zeros(1))
    legacy = tmp_path / "checkpoint_shard001.npz"
    np.savez(legacy, x=np.zeros(1))

    # a second save garbage-collects the previous epoch's shard files
    ckpt.save_checkpoint(tmp_path, {"f": sharded, "s": small}, {"iterations": 43})
    assert foreign.exists() and not orphan.exists() and not legacy.exists()
    foreign.unlink()
    assert len(list(tmp_path.glob("checkpoint_shard*.npz"))) == 8
    _, meta2 = ckpt.load_checkpoint(tmp_path)
    assert meta2["iterations"] == 43


def test_torn_checkpoint_detected(tmp_path):
    """A checkpoint.npz referencing shard files from a DIFFERENT epoch (the
    torn-resume hazard of in-place shard overwrites, ADVICE r2) raises
    instead of silently mixing states."""
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from tnl_lbm_tpu.sim import checkpoint as ckpt

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("x",))
    big = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    sharded = jax.device_put(jnp.asarray(big), NamedSharding(mesh, P("x")))
    ckpt.save_checkpoint(tmp_path, {"f": sharded}, {"iterations": 1})

    # simulate the torn state: rewrite the main file to expect a stale epoch
    with np.load(tmp_path / "checkpoint.npz") as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        host = {k: data[k] for k in data.files if k != "__meta__"}
    real_epoch = meta["__epoch__"]
    meta["__epoch__"] = real_epoch - 12345
    for f in tmp_path.glob(f"checkpoint_shard*_{real_epoch}.npz"):
        f.rename(tmp_path / f.name.replace(str(real_epoch),
                                           str(real_epoch - 12345)))
    # corrupt one shard's epoch token back to the real (now-mismatched) one
    s0 = sorted(tmp_path.glob("checkpoint_shard000_*.npz"))[0]
    with np.load(s0) as d0:
        payload = {k: d0[k] for k in d0.files}
    payload["__epoch__"] = np.asarray(real_epoch, np.int64)
    np.savez(s0, **payload)
    host["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(tmp_path / "checkpoint.npz", **host)

    with pytest.raises(RuntimeError, match="torn checkpoint"):
        ckpt.load_checkpoint(tmp_path)


def test_pair_dispatch_matches_per_step(tmp_path):
    """Opt-in pair dispatch (two steps per call through the one-kernel A-A
    pair) == the per-step even/odd driver for time-constant driving."""
    import jax.numpy as jnp
    import numpy as np

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col
    from tnl_lbm_tpu.ops import equilibrium as eqlib
    from tnl_lbm_tpu.ops.boundary import GEO
    from tnl_lbm_tpu.sim import Domain, LBMConfig
    from tnl_lbm_tpu.sim.state import Simulation
    from tnl_lbm_tpu.utils import Lattice

    X, Y, Z = 8, 16, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, True))
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_srt_well, eq=eqlib.eq_well,
                    well=True, streaming="AA")

    class Sim(Simulation):
        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

    def run(pair, tag):
        sim = Sim(cfg, dom, sim_id=f"pd_{tag}", results_parent=tmp_path,
                  use_fused=True, pair_dispatch=pair, phys_final_time=1.0)
        sim.sim_init()
        assert sim._pair_dispatch_ok() == pair
        sim._advance(4)
        return sim

    a = run(False, "step")
    b = run(True, "pair")
    assert b.iterations == a.iterations == 4
    assert float(jnp.abs(a.f - b.f).max()) < 1e-6
    assert float(jnp.abs(a.u - b.u).max()) < 1e-6

    # --- "auto" resolution (VERDICT r2 item 4) -------------------------
    # capable config + measured probe: the faster path wins, both ways
    for t_pair, t_steps, expect in ((0.001, 0.002, True), (0.003, 0.002, False)):
        sim = Sim(cfg, dom, sim_id=f"pd_auto_{expect}", results_parent=tmp_path,
                  use_fused=True, pair_dispatch="auto", phys_final_time=1.0)
        sim._probe_pair_dispatch = lambda tp=t_pair, ts=t_steps: (tp, ts)
        sim._pair_probe_allowed = lambda: True  # bypass the CPU guard
        sim.sim_init()
        assert sim.pair_dispatch is expect, (t_pair, t_steps)
        sim._lock.release()

    # ineligible config (A-B streaming): auto resolves to False, no probe
    import dataclasses

    cfg_ab = dataclasses.replace(cfg, streaming="AB")
    sim = Sim(cfg_ab, dom, sim_id="pd_auto_ab", results_parent=tmp_path,
              use_fused=True, pair_dispatch="auto", phys_final_time=1.0)
    sim.sim_init()
    assert sim.pair_dispatch is False
    sim._lock.release()


def test_needs_per_step_state_hook_disables_pair_dispatch(tmp_path):
    """A compute_after_step override marked @needs_per_step_state (it reads
    self.f) disables pair dispatch by construction (VERDICT r3 item 8), so
    the hook observes FRESH per-step DFs instead of the chunk-start
    snapshot; an unmarked hook keeps the config pair-capable."""
    import numpy as np

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col
    from tnl_lbm_tpu.sim import Domain, LBMConfig
    from tnl_lbm_tpu.sim.state import Simulation, needs_per_step_state
    from tnl_lbm_tpu.utils import Lattice

    X, Y, Z = 8, 16, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, True))
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_srt, streaming="AA")

    class FreshSim(Simulation):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.f_sums = []

        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

        @needs_per_step_state
        def compute_after_step(self):
            self.f_sums.append(hash(np.asarray(self.f).tobytes()))

    class PlainSim(Simulation):
        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

    sim = FreshSim(cfg, dom, sim_id="npss", results_parent=tmp_path,
                   use_fused=True, pair_dispatch=True, phys_final_time=1.0)
    sim.sim_init()
    assert sim._hooks_need_per_step_state()
    assert not sim._pair_dispatch_ok()  # marked hook vetoes pair dispatch
    sim._advance(4)
    assert len(sim.f_sums) == 4
    # fresh DFs every step: the forced flow strictly changes the state
    assert len(set(sim.f_sums)) == 4
    sim._lock.release()

    plain = PlainSim(cfg, dom, sim_id="npss_plain", results_parent=tmp_path,
                     use_fused=True, pair_dispatch=True, phys_final_time=1.0)
    plain.sim_init()
    assert not plain._hooks_need_per_step_state()
    assert plain._pair_dispatch_ok()
    plain._lock.release()


def test_fused_profile_inflow_reroute_mechanism(tmp_path):
    """The fused 3D kernels take vector u_in only; a per-site inflow
    PROFILE must reroute through the lazily-built XLA fallback step (full
    physics parity is in test_sharded.py's slow-tier test - this guards
    the mechanism cheaply)."""
    import jax
    import jax.numpy as jnp

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col3
    from tnl_lbm_tpu.ops import equilibrium as eqlib

    X, Y, Z = 8, 16, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[0, 1:-1] = GEO.INFLOW
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(False, False, True))
    cfg = LBMConfig(lat=D3Q27, collision=col3.collide_srt_well,
                    eq=eqlib.eq_well, well=True)

    prof = np.zeros((3, 1, Y, Z), np.float32)
    prof[0, 0, 2:-2] = 0.02

    class S(Simulation):
        def update_inflow(self, t):
            return jnp.asarray(prof)

    s = S(cfg, dom, sim_id="profmech", results_parent=tmp_path,
          use_fused=True, phys_final_time=2.0)
    s.sim_init()
    assert s._vector_uin_only
    s._advance(1)  # would crash in _params_vec without the reroute
    assert s._uin_fallback is not None
    assert np.isfinite(np.asarray(jax.device_get(s.f))).all()


def test_half_storage_simulation(tmp_path):
    """cfg.storage_dtype plumbs half storage through the driver's pair
    path: the run advances in f16 at rest, macro stays f32 and tracks the
    full-precision run within the storage-rounding envelope; configs that
    cannot take the pair path refuse the request instead of silently
    ignoring it."""
    import jax.numpy as jnp
    import numpy as np

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col
    from tnl_lbm_tpu.ops import equilibrium as eqlib
    from tnl_lbm_tpu.sim import Domain, LBMConfig
    from tnl_lbm_tpu.sim.state import Simulation
    from tnl_lbm_tpu.utils import Lattice

    X, Y, Z = 8, 16, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, True))

    class Sim(Simulation):
        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

    def run(storage):
        cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well,
                        eq=eqlib.eq_well, well=True, streaming="AA",
                        storage_dtype=storage)
        sim = Sim(cfg, dom, sim_id=f"half_{storage is not None}",
                  results_parent=tmp_path, use_fused=True,
                  pair_dispatch=True, phys_final_time=1.0)
        sim.sim_init()
        sim._advance(4)
        u = np.asarray(sim.u, np.float64)
        sim._lock.release()
        return u

    u32 = run(None)
    uh = run(jnp.float16)
    assert np.isfinite(uh).all()
    d = np.abs(uh - u32).max()
    assert 0 <= d < 2e-3, d

    # config guard: half storage without well DFs is rejected outright
    with pytest.raises(ValueError, match="well"):
        LBMConfig(lat=D3Q27, collision=col.collide_srt, streaming="AA",
                  storage_dtype=jnp.float16)

    # driver guard: a config that cannot take the pair path refuses
    cfg_ab = LBMConfig(lat=D3Q27, collision=col.collide_cum_well,
                       eq=eqlib.eq_well, well=True, streaming="AB",
                       storage_dtype=jnp.float16)
    sim = Sim(cfg_ab, dom, sim_id="half_ab", results_parent=tmp_path,
              use_fused=True, phys_final_time=1.0)
    with pytest.raises(ValueError, match="pair"):
        sim.sim_init()
    sim._lock.release()
