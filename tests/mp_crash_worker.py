"""Crash-recovery worker for tests/test_multiprocess.py (not a test).

Simulates the power-loss scenario the checkpoint design promises to
survive (sim/checkpoint.py docstring; SURVEY 5.3 - the reference has no
fault injection at all): run 8 steps, publish a checkpoint, then DIE
mid-run via os._exit before any cleanup.  A second spawn with the same
results directory must resume from the published checkpoint (flag.loadstate
+ per-process shard files) and reach iteration 12.

argv: rank nprocs port outdir mode(crash|resume)
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import numpy as np  # noqa: E402


def main():
    rank, n, port, outdir, mode = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from tnl_lbm_tpu.parallel import distributed as dist

    dist.initialize(f"localhost:{port}", num_processes=n, process_id=rank)

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

    sim = Sim(cfg, dom, sim_id="crash", results_parent=outdir, plan=plan,
              phys_final_time=1e9)
    assert sim.can_compute()
    sim.sim_init()
    if mode == "crash":
        assert sim.iterations == 0
        sim._advance(8)
        sim.save_state()
        # power loss: no lock release, no flush, no goodbye.  The flock is
        # released by the OS; the published checkpoint must carry the run.
        os._exit(42)
    # resume mode
    assert sim.iterations == 8, f"resume got iteration {sim.iterations}"
    sim._advance(4)
    f12 = dist.replicate_to_host(sim.f)
    if sim.is_coordinator:
        np.savez(os.path.join(outdir, "resumed.npz"), f12=f12)
    sim._lock.release()
    dist.barrier("crash-resume-done")
    print(f"crash worker {rank} ({mode}): OK", flush=True)


if __name__ == "__main__":
    main()
