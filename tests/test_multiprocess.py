"""Multi-process (multi-host analog) runtime: 2 spawned processes x 4
virtual CPU devices run the SAME sharded simulation as one process, with
coordinator-gated host I/O and per-process shard checkpointing
(VERDICT r3 item 2; reference multi-rank driver state.hpp:677-737).

The workers live in tests/mp_worker.py; this test spawns them, lets them
rendezvous over localhost, and compares the gathered multi-process result
against an in-process single-controller run of the identical setup.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    root = Path(__file__).resolve().parents[1]
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(root)
    env.pop("JAX_PLATFORMS", None)  # worker sets platform itself
    procs = [
        subprocess.Popen(
            [sys.executable, str(root / "tests" / "mp_worker.py"),
             str(rank), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {rank} failed:\n{out[-4000:]}"
    assert (tmp_path / "worker_ok").exists()

    # the multi-process run wrote coordinator-gated artifacts exactly once
    results = tmp_path / "results_mp"
    assert (results / "checkpoint.npz").exists()
    assert (results / "flag.loadstate").exists()
    # parallel multi-writer snapshot: per-process pieces + one .pvti + the
    # time-series index referencing it
    assert (results / "vtk3D" / "data_000000.pvti").exists()
    assert len(list((results / "vtk3D").glob("data_000000_p*.vti"))) == 8
    import xml.etree.ElementTree as ET

    pvd = ET.parse(results / "vtk3D" / "data.pvd").getroot()
    assert [ds.get("file") for ds in pvd.iter("DataSet")] == ["data_000000.pvti"]
    # per-process log files (rank-0 unsuffixed, rank-1 suffixed)
    assert (results / "log_main").exists()
    assert (results / "log_main_p1").exists()
    # checkpoint shard files: one per canonical-owner device, same epoch
    shards = list(results.glob("checkpoint_shard*_*.npz"))
    assert len(shards) == 8

    # ---- single-process reference of the identical setup ----------------
    import jax
    import jax.numpy as jnp

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col
    from tnl_lbm_tpu.ops.boundary import GEO
    from tnl_lbm_tpu.sim import Domain, LBMConfig
    from tnl_lbm_tpu.sim.state import Simulation
    from tnl_lbm_tpu.utils import Lattice

    X, Y, Z = 16, 8, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, True))
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_srt,
                    compute_dtype=jnp.float64)

    class Sim(Simulation):
        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

    ref = Sim(cfg, dom, sim_id="mp_ref", results_parent=tmp_path,
              phys_final_time=1e9)
    ref.sim_init()
    ref._advance(8)
    ref._lock.release()

    got = np.load(tmp_path / "worker_result.npz")
    np.testing.assert_allclose(got["f8"], np.asarray(ref.f), atol=1e-12)
    np.testing.assert_allclose(got["rho8"], np.asarray(ref.rho), atol=1e-12)
    np.testing.assert_allclose(got["u8"], np.asarray(ref.u), atol=1e-12)
    assert jax.process_count() == 1  # the parent stayed single-process

    # reassemble the .pvti pieces and compare the density field against the
    # single-process reference (the pieces were written at iteration 8)
    root_el = ET.parse(results / "vtk3D" / "data_000000.pvti").getroot()
    rho_pieces = np.full((X, Y, Z), np.nan)
    for piece in root_el.iter("Piece"):
        e = [int(v) for v in piece.get("Extent").split()]
        blob = _vti_first_scalar(results / "vtk3D" / piece.get("Source"))
        nx, ny, nz = e[1] - e[0] + 1, e[3] - e[2] + 1, e[5] - e[4] + 1
        rho_pieces[e[0]:e[1] + 1, e[2]:e[3] + 1, e[4]:e[5] + 1] = (
            blob[: nx * ny * nz].reshape(nz, ny, nx).transpose(2, 1, 0))
    assert not np.isnan(rho_pieces).any(), "pieces do not tile the domain"
    np.testing.assert_allclose(rho_pieces, np.asarray(ref.rho), atol=1e-12)


@pytest.mark.slow
def test_crash_recovery_resumes_from_published_checkpoint(tmp_path):
    """Fault injection the reference does not have (SURVEY 5.3): both
    processes die via os._exit right after publishing a checkpoint at
    iteration 8; a fresh spawn over the same results directory must resume
    from it and reach the same state as an uninterrupted run."""
    root = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = str(root)
    env.pop("JAX_PLATFORMS", None)

    def spawn(mode):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, str(root / "tests" / "mp_crash_worker.py"),
                 str(r), "2", str(port), str(tmp_path), mode],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True)
            for r in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append(out)
        return procs, outs

    procs, outs = spawn("crash")
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 42, f"crash worker {rank}:\n{out[-2000:]}"
    results = tmp_path / "results_crash"
    assert (results / "checkpoint.npz").exists()
    assert (results / "flag.loadstate").exists()

    procs, outs = spawn("resume")
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"resume worker {rank}:\n{out[-2000:]}"

    # uninterrupted single-process reference to iteration 12
    import jax.numpy as jnp

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col
    from tnl_lbm_tpu.ops.boundary import GEO
    from tnl_lbm_tpu.sim import Domain, LBMConfig
    from tnl_lbm_tpu.sim.state import Simulation
    from tnl_lbm_tpu.utils import Lattice

    X, Y, Z = 16, 8, 8
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, True))
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_srt,
                    compute_dtype=jnp.float64)

    class Sim(Simulation):
        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

    ref = Sim(cfg, dom, sim_id="crash_ref", results_parent=tmp_path,
              phys_final_time=1e9)
    ref.sim_init()
    ref._advance(12)
    ref._lock.release()
    got = np.load(tmp_path / "resumed.npz")
    np.testing.assert_allclose(got["f12"], np.asarray(ref.f), atol=1e-12)


@pytest.mark.slow
def test_launch_distributed_runs_app_unchanged(tmp_path):
    """scripts/launch_distributed.py (the mpirun analog) runs an app module
    under 2 spawned controller processes; the converged duct error matches
    the single-process value."""
    root = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, str(root / "scripts" / "launch_distributed.py"),
         "-n", "2", "-m", "tnl_lbm_tpu.apps.sim_2", "--devices-per-proc", "4",
         "--", "1", "--sharded", "--final-time", "0.3",
         "--results-dir", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "ok=True" in out.stdout
    results = next(tmp_path.glob("results_sim_2_*"))
    assert (results / "flag.finished").exists()
    assert (results / "log_main_p1").exists()
    # the multi-process trajectory reproduces the known single-process
    # converged error of this config (sim_2 res 1, t=0.3)
    assert "l1error_phys=2.290475e-04" in out.stdout


def _vti_first_scalar(path) -> np.ndarray:
    """First appended data array of a raw-appended .vti, as float32."""
    import struct

    data = Path(path).read_bytes()
    i = data.index(b'<AppendedData encoding="raw">')
    i = data.index(b"_", i) + 1
    (nbytes,) = struct.unpack_from("<Q", data, i)
    return np.frombuffer(data, np.float32, count=nbytes // 4, offset=i + 8)
