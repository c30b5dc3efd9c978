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

    # phase 5: build-time sharded auxiliary arrays (here: Bouzidi) must
    # ride jit as ARGUMENTS via step.sharded_consts (round-4 self-review:
    # a trace-time plan.shard_field default / closed-over sharded array
    # cannot lower in multi-process runs).  (a) through the driver's
    # _jit_step on the XLA sharded path, (b) the fused 2D builder directly.
    from tnl_lbm_tpu.models import D2Q9
    from tnl_lbm_tpu.ops import collision_2d as col2

    X2, Y2 = 16, 16
    m2 = np.zeros((X2, Y2), np.uint8)
    m2[:, 1] = m2[:, Y2 - 2] = GEO.WALL
    m2[:, 0] = m2[:, Y2 - 1] = GEO.NOTHING
    m2[0, 2:Y2 - 2] = GEO.INFLOW
    m2[X2 - 1, 2:Y2 - 2] = GEO.OUTFLOW_RIGHT
    m2[4:6, 5:9] = GEO.WALL
    m2[3, 5:9] = m2[6, 5:9] = GEO.FLUID_NEAR_WALL
    rng2 = np.random.default_rng(3)
    bz2 = np.full((8, X2, Y2), -1.0, np.float32)
    nw = m2 == GEO.FLUID_NEAR_WALL
    bz2[:, nw] = rng2.uniform(0.05, 0.95, (8, int(nw.sum()))).astype(np.float32)
    units2 = Lattice((X2, Y2), (0, 0), 1.0, 1.0, phys_viscosity=0.03)
    dom2 = Domain(lat=D2Q9, units=units2, map=m2, bouzidi=bz2)
    cfg2 = LBMConfig(lat=D2Q9, collision=col2.collide_srt_2d,
                     compute_dtype=jnp.float64)
    plan2 = ShardPlan(mesh=mesh, spatial_axes=("x", "y"))

    class Sim2(Simulation):
        def update_inflow(self, t):
            return np.array([0.05, 0.0])

    sim2d = Sim2(cfg2, dom2, sim_id="mp_bz", results_parent=outdir,
                 plan=plan2, phys_final_time=1e9)
    assert sim2d.can_compute()
    sim2d.sim_init()
    sim2d._advance(4)
    f_mp = dist.replicate_to_host(sim2d.f)
    sim2d._lock.release()

    from tnl_lbm_tpu.sim import initial_dfs, make_step

    nu2 = dom2.units.lbm_viscosity()
    uin2 = jnp.asarray([0.05, 0.0], cfg2.compute_dtype)
    step_1dev = make_step(cfg2, dom2)
    j2 = jax.jit(lambda g: step_1dev(g, nu2, u_in=uin2)[0])
    g2 = initial_dfs(cfg2, dom2)
    for _ in range(4):
        g2 = j2(g2)
    d2 = np.abs(f_mp - np.asarray(g2)).max()
    assert d2 < 1e-12, f"mp bouzidi driver trajectory diverged: {d2}"

    # (b) fused 2D sharded builder: thread its exposed sharded consts
    from tnl_lbm_tpu.parallel.sharded import make_sharded_fused_step_2d

    step_f2 = make_sharded_fused_step_2d(cfg2, dom2, plan2)
    sc2 = step_f2.sharded_consts
    assert "bouzidi_arr" in sc2
    f2s = plan2.shard_field(np.asarray(initial_dfs(cfg2, dom2)), like_f=True)
    mp2s = plan2.shard_field(np.asarray(m2), like_f=False)
    jf2 = jax.jit(lambda g, mp_, bz_: step_f2(g, mp_, nu2, u_in=uin2,
                                              bouzidi_arr=bz_)[0])
    for _ in range(4):
        f2s = jf2(f2s, mp2s, sc2["bouzidi_arr"])
    d2f = np.abs(dist.replicate_to_host(f2s) - np.asarray(g2)).max()
    assert d2f < 1e-12, f"mp fused-2D bouzidi diverged: {d2f}"
    dist.barrier("phase-5")

    if rank == 0:
        with open(os.path.join(outdir, "worker_ok"), "w") as fh:
            fh.write("ok")
    print(f"worker {rank}: OK", flush=True)


if __name__ == "__main__":
    main()
