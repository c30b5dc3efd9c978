"""1-device vs 8-device equality of the IBM-coupled step.

The reference runs IBM inside its multi-GPU step (state.hpp:995-1015,
kernels.h:178-218); here the shard-aware hook (ibm/lagrange.py
``sharded_hook``) partitions interpolation/spreading by stencil-node
ownership and completes M u* with one psum.  This is VERDICT item 3's
"Done" test: the sharded IBM-coupled step must match the single-device one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tnl_lbm_tpu.ibm import IBM
from tnl_lbm_tpu.models import D3Q27
from tnl_lbm_tpu.ops import collision as col
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.parallel.sharded import ShardPlan, make_sharded_step
from tnl_lbm_tpu.sim import Domain, LBMConfig, initial_dfs, make_step
from tnl_lbm_tpu.utils import Lattice

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _setup(method):
    X, Y, Z = 32, 16, 16
    m = np.zeros((X, Y, Z), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[:, :, 0] = m[:, :, -1] = GEO.WALL
    units = Lattice((X, Y, Z), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, False))
    from tnl_lbm_tpu.ibm.generators import points_sphere

    # well-separated cloud + capped CG (test_ibm.py precedent): both paths
    # run the identical iteration count, so fp drift stays at noise level
    pts = points_sphere(center=(10.0, 8.0, 8.0), radius=3.0, sigma=1.2)
    ibm = IBM(units, pts, dirac="phi2", method=method, max_iters=50)
    return dom, ibm


@pytest.mark.parametrize("mesh_shape,method", [
    pytest.param((8, 1, 1), "modified", marks=pytest.mark.slow),
    pytest.param((2, 2, 2), "modified", marks=pytest.mark.slow),
    pytest.param((2, 2, 2), "original", marks=pytest.mark.slow),
], ids=["x8-dense", "2x2x2-dense", "2x2x2-matfree"])
def test_ibm_coupled_step_1_vs_8(mesh_shape, method):
    dom, ibm = _setup(method)
    devices = np.asarray(jax.devices()[:8]).reshape(mesh_shape)
    mesh = Mesh(devices, ("x", "y", "z"))
    plan = ShardPlan(mesh=mesh, spatial_axes=("x", "y", "z"))

    cfg1 = LBMConfig(lat=D3Q27, collision=col.collide_cum,
                     forcing_hook=ibm.forcing_hook())
    cfgN = LBMConfig(lat=D3Q27, collision=col.collide_cum,
                     forcing_hook=ibm.sharded_hook(plan, dom.shape))

    step1 = make_step(cfg1, dom)
    stepN = make_sharded_step(cfgN, dom, plan)

    f1 = initial_dfs(cfg1, dom)
    fN = plan.shard_field(f1, like_f=True)
    mapN = plan.shard_field(jnp.asarray(dom.map), like_f=False)
    force = jnp.asarray([1e-5, 0.0, 0.0], jnp.float32)

    for it in range(3):
        f1, rho1, u1 = step1(f1, 0.02, force=force)
        fN, rhoN, uN = stepN(fN, mapN, 0.02, force=force)
        d = float(jnp.abs(f1 - fN).max())
        assert d < 1e-5, f"step {it}: f diverged by {d}"
    assert float(jnp.abs(rho1 - rhoN).max()) < 5e-6
    assert float(jnp.abs(u1 - uN).max()) < 5e-6
    # the IBM force actually did something (cylinder slows the channel)
    assert float(jnp.abs(u1).max()) > 0


def test_driver_sharded_ibm_use_fused_matches_xla():
    """Simulation(plan=..., use_fused=True) with IBM's shard_local hook:
    the hooked fused pipeline evaluates the hook inside its OWN shard_map
    (lax.axis_index/psum need the mesh axes - evaluating it at the GSPMD
    level crashed) and must match the XLA sharded driver."""
    import tempfile

    from tnl_lbm_tpu.sim.state import Simulation

    dom, ibm = _setup("modified")
    dom = Domain(lat=D3Q27, units=dom.units, map=np.asarray(dom.map),
                 periodic=dom.periodic)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2, 1), ("x", "y", "z"))
    plan = ShardPlan(mesh=mesh, spatial_axes=("x", "y", "z"))
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum,
                    forcing_hook=ibm.sharded_hook(plan, dom.shape))

    class S(Simulation):
        def body_force(self, t):
            return np.array([1e-5, 0.0, 0.0])

    res = []
    with tempfile.TemporaryDirectory() as td:
        for sid, fused in (("ibmx", False), ("ibmf", True)):
            s = S(cfg, dom, sim_id=sid, results_parent=td, plan=plan,
                  use_fused=fused, phys_final_time=2.0)
            s.sim_init()
            s._advance(2)
            res.append(np.asarray(jax.device_get(s.f)))
    np.testing.assert_allclose(res[0], res[1], atol=1e-6)


def test_ibm_sharded_operators_match():
    """interpolate/spread: sharded (ownership-partitioned + psum) vs global."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    dom, ibm = _setup("modified")
    devices = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devices, ("x", "y", "z"))
    plan = ShardPlan(mesh=mesh, spatial_axes=("x", "y", "z"))

    rng = np.random.default_rng(3)
    field = jnp.asarray(rng.standard_normal((3,) + dom.shape), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((ibm.m, 3)), jnp.float32)

    ul_ref = ibm.interpolate(field)
    spread_ref = ibm.spread(vals, dom.shape)

    fieldN = plan.shard_field(field, like_f=True)

    interpN = shard_map(
        lambda fl: ibm.interpolate_sharded(fl, plan, dom.shape),
        mesh=mesh, in_specs=(P(None, "x", "y", "z"),), out_specs=P(),
        check_vma=False,
    )
    spreadN = shard_map(
        lambda v: ibm.spread_sharded(v, plan, dom.shape),
        mesh=mesh, in_specs=(P(),), out_specs=P(None, "x", "y", "z"),
        check_vma=False,
    )
    assert float(jnp.abs(interpN(fieldN) - ul_ref).max()) < 1e-5
    assert float(jnp.abs(spreadN(vals) - spread_ref).max()) < 1e-5
