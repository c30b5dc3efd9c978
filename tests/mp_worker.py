"""Worker process for tests/test_multiprocess.py (not itself a test).

Each spawned process joins the distributed runtime, runs the same sharded
simulation over the GLOBAL device mesh (2 processes x 4 virtual CPU devices
= 8), exercises the coordinator-gated host I/O (flags, VTK, NaN guard,
checkpoint), and the coordinator writes the gathered results for the parent
test to compare against a single-process run - the analog of validating the
reference's multi-rank MPI driver against its serial path
(reference include/lbm3d/state.hpp:677-737, core.h:88-97).

argv: rank nprocs port outdir
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import numpy as np  # noqa: E402


def main():
    rank, n, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from tnl_lbm_tpu.parallel import distributed as dist

    dist.initialize(f"localhost:{port}", num_processes=n, process_id=rank)
    assert jax.process_count() == n
    assert len(jax.devices()) == 4 * n

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col
    from tnl_lbm_tpu.ops.boundary import GEO
    from tnl_lbm_tpu.parallel.sharded import ShardPlan
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

    devs = sorted(jax.devices(), key=lambda d: d.id)
    mesh = Mesh(np.array(devs).reshape(4, 2), ("x", "y"))
    plan = ShardPlan(mesh=mesh, spatial_axes=("x", "y", None))

    class Sim(Simulation):
        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

    outdir = os.fspath(outdir)
    sim = Sim(cfg, dom, sim_id="mp", results_parent=outdir, plan=plan,
              phys_final_time=1e9)
    assert sim.is_coordinator == (rank == 0)
    assert sim.can_compute()  # coordinator's flock decision, broadcast
    sim.sim_init()
    sim._advance(6)
    assert not sim._nan_guard()  # replicated-scalar read on every process
    sim.save_state()             # per-process shard files + p0 meta
    f6 = dist.replicate_to_host(sim.f)
    sim._advance(2)
    # parallel multi-writer: per-process pieces + coordinator .pvti + index
    sim._write_vtk_3d()
    f8 = dist.replicate_to_host(sim.f)
    rho8 = dist.replicate_to_host(sim.rho)
    u8 = dist.replicate_to_host(sim.u)
    if sim.is_coordinator:
        np.savez(os.path.join(outdir, "worker_result.npz"),
                 f6=f6, f8=f8, rho8=rho8, u8=u8)
    sim._lock.release()
    dist.barrier("phase-1")

    # resume from the multi-process checkpoint (loadstate flag is set)
    sim2 = Sim(cfg, dom, sim_id="mp", results_parent=outdir, plan=plan,
               phys_final_time=1e9)
    assert sim2.can_compute()
    sim2.sim_init()
    assert sim2.iterations == 6, sim2.iterations
    f6b = dist.replicate_to_host(sim2.f)
    assert np.array_equal(f6b, f6), "resumed state differs from saved state"
    sim2._advance(2)
    f8b = dist.replicate_to_host(sim2.f)
    assert np.array_equal(f8b, f8), "resumed trajectory diverged"
    sim2._lock.release()
    dist.barrier("phase-2")

    # coupled NSE+ADE dual lattice under multi-process (both sharded maps
    # ride the jit as arguments - sim/coupled.py get_jit)
    import dataclasses

    from tnl_lbm_tpu.models import D3Q7
    from tnl_lbm_tpu.ops import equilibrium as eqlib
    from tnl_lbm_tpu.sim.coupled import CoupledSimulation

    ade_dom = dataclasses.replace(
        dom, lat=D3Q7, map=np.zeros(dom.shape, np.uint8))
    ade_cfg = LBMConfig(lat=D3Q7, collision=__import__(
        "tnl_lbm_tpu.ops.collision_ade", fromlist=["collide_srt_ade"]
    ).collide_srt_ade, eq=eqlib.eq_quadratic, compute_dtype=jnp.float64)

    class CSim(CoupledSimulation):
        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

    csim = CSim(cfg, dom, ade_cfg, ade_dom, ade_diffusion=1e-3,
                sim_id="mp_coupled", results_parent=outdir, plan=plan,
                phys_final_time=1e9)
    assert csim.can_compute()
    csim.sim_init()
    csim._advance(2)
    phi = dist.replicate_to_host(csim.phi)
    assert np.isfinite(phi).all() and phi.shape == dom.shape
    csim._lock.release()
    dist.barrier("phase-3")

    # uneven pad-and-crop decomposition (incl. the pad-1 periodic case)
    # under multi-process: 19x12x8 over the 4x2 mesh == single device
    from tnl_lbm_tpu.ops import equilibrium as eqlib2
    from tnl_lbm_tpu.parallel.sharded import make_sharded_step
    from tnl_lbm_tpu.sim import make_step

    Xu = 19
    mu = np.zeros((Xu, Y, Z), np.uint8)
    mu[:, 0] = mu[:, -1] = GEO.WALL
    units_u = Lattice((Xu, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom_u = Domain(lat=D3Q27, units=units_u, map=mu,
                   periodic=(True, False, True))
    plan_u = ShardPlan(mesh=mesh, spatial_axes=("x", "y", None))
    assert not plan_u.divisible(dom_u)
    rng = np.random.default_rng(7)
    f0 = eqlib2.eq_quadratic(
        cfg.lat, jnp.asarray(1 + 0.01 * rng.standard_normal(dom_u.shape)),
        jnp.asarray(0.02 * rng.standard_normal((3,) + dom_u.shape))
    ).astype(cfg.compute_dtype)
    force = np.array([1e-5, 0.0, 0.0])
    g1 = jnp.asarray(np.asarray(f0))
    j1 = jax.jit(lambda g: make_step(cfg, dom_u)(g, 0.03,
                                                 force=jnp.asarray(force)))
    for _ in range(3):
        g1, _, _ = j1(g1)
    fN = plan_u.shard_field(np.asarray(f0), like_f=True)
    mapN = plan_u.shard_field(np.asarray(dom_u.map), like_f=False)
    stepN = make_sharded_step(cfg, dom_u, plan_u)
    jN = jax.jit(lambda g, mp: stepN(g, mp, 0.03, force=force))
    for _ in range(3):
        fN, _, _ = jN(fN, mapN)
    du = np.abs(dist.replicate_to_host(fN) - np.asarray(g1)).max()
    assert du < 1e-12, f"uneven multiprocess diverged: {du}"
    dist.barrier("phase-4")

    if rank == 0:
        with open(os.path.join(outdir, "worker_ok"), "w") as fh:
            fh.write("ok")
    print(f"worker {rank}: OK", flush=True)


if __name__ == "__main__":
    main()
