"""Real-TPU compile/run smoke for the distributed Pallas kernels.

CPU interpret mode cannot see Mosaic-under-shard_map compilation issues
(the prepadded layouts could mis-compile on hardware only).  These tests
wrap the distributed fused kernels in a 1-device Mesh on the physical chip
- no multi-chip hardware needed - and run one step for real.

Run with ``TNL_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py`` on a
TPU host; skipped entirely on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs a real TPU chip"
)


def _duct(shape):
    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col
    from tnl_lbm_tpu.ops import equilibrium as eqlib
    from tnl_lbm_tpu.ops.boundary import GEO
    from tnl_lbm_tpu.sim import Domain, LBMConfig
    from tnl_lbm_tpu.utils import Lattice

    X, Y, Z = shape
    m = np.zeros(shape, np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    m[:, :, 0] = m[:, :, -1] = GEO.WALL
    units = Lattice(shape, (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=m, periodic=(True, False, False))
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_cum_well, eq=eqlib.eq_well,
                    well=True, compute_dtype=jnp.float32)
    return cfg, dom


def _plan_1dev():
    from jax.sharding import Mesh

    from tnl_lbm_tpu.parallel.sharded import ShardPlan

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("x",))
    return ShardPlan(mesh=mesh, spatial_axes=("x", None, None))


def test_sharded_fused_ab_compiles_on_tpu():
    import dataclasses

    from tnl_lbm_tpu.parallel.sharded import make_sharded_fused_step
    from tnl_lbm_tpu.sim import initial_dfs

    cfg, dom = _duct((16, 16, 128))
    plan = _plan_1dev()
    step = make_sharded_fused_step(cfg, dom, plan, tile=(8, 8))
    f = plan.shard_field(initial_dfs(cfg, dom), like_f=True)
    mp = plan.shard_field(jnp.asarray(dom.map, jnp.int32), like_f=False)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    f2, rho, u = jax.jit(lambda f: step(f, mp, 0.02, force=force))(f)
    assert bool(jnp.isfinite(rho).all())


def test_sharded_fused_aa_compiles_on_tpu():
    from tnl_lbm_tpu.parallel.sharded import make_sharded_fused_step_aa
    from tnl_lbm_tpu.sim import initial_dfs
    import dataclasses

    cfg, dom = _duct((16, 16, 128))
    cfg = dataclasses.replace(cfg, streaming="AA")
    plan = _plan_1dev()
    step = make_sharded_fused_step_aa(cfg, dom, plan, tile_even=(8, 8),
                                      tile_odd=(8, 8))
    f = plan.shard_field(initial_dfs(cfg, dom), like_f=True)
    mp = plan.shard_field(jnp.asarray(dom.map, jnp.int32), like_f=False)
    force = jnp.asarray([1e-5, 0, 0], jnp.float32)
    for parity in (0, 1):
        f, rho, u = jax.jit(
            lambda f, p=parity: step(f, mp, 0.02, force=force, parity=p))(f)
    assert bool(jnp.isfinite(rho).all())


def test_fused_2d_compiles_on_tpu():
    from tnl_lbm_tpu.kernels.fused_2d import make_fused_step_2d
    from tnl_lbm_tpu.models import D2Q9
    from tnl_lbm_tpu.ops import collision_2d as col2
    from tnl_lbm_tpu.ops.boundary import GEO
    from tnl_lbm_tpu.sim import Domain, LBMConfig, initial_dfs
    from tnl_lbm_tpu.utils import Lattice

    X, Y = 64, 128
    units = Lattice((X, Y), (0, 0), 1.0, 1.0)
    m = np.zeros((X, Y), np.uint8)
    m[:, 0] = m[:, -1] = GEO.WALL
    dom = Domain(lat=D2Q9, units=units, map=m, periodic=(True, False))
    cfg = LBMConfig(lat=D2Q9, collision=col2.collide_clbm_2d)
    step = make_fused_step_2d(cfg, dom)
    f = initial_dfs(cfg, dom)
    f2, rho, u = jax.jit(lambda f: step(f, 0.05, force=jnp.asarray([1e-5, 0.0])))(f)
    assert bool(jnp.isfinite(rho).all())


def test_coupled_kernel_compiles_on_tpu():
    from tnl_lbm_tpu.kernels.fused_coupled import make_fused_coupled_step
    from tnl_lbm_tpu.models import D3Q7
    from tnl_lbm_tpu.ops import collision_ade as cade
    from tnl_lbm_tpu.sim import Domain, LBMConfig, initial_dfs
    from tnl_lbm_tpu.utils import Lattice

    cfg, dom = _duct((16, 16, 128))
    units = dom.units
    ade_dom = Domain(lat=D3Q7, units=units,
                     map=np.zeros(dom.shape, np.uint8),
                     periodic=dom.periodic)
    ade_cfg = LBMConfig(lat=D3Q7, collision=cade.collide_clbm_ade,
                        compute_dtype=jnp.float32)
    one = make_fused_coupled_step(cfg, dom, ade_cfg, ade_dom, tile=(8, 8))
    f = initial_dfs(cfg, dom)
    phi0 = jnp.ones(dom.shape, jnp.float32)
    g = ade_cfg.eq(D3Q7, phi0, jnp.zeros((3,) + dom.shape)).astype(jnp.float32)
    f2, g2, rho, u, phi = jax.jit(
        lambda f, g: one(f, g, 0.02, 1e-3, force=jnp.asarray([1e-5, 0, 0.0])))(f, g)
    assert bool(jnp.isfinite(phi).all())


def test_sharded_pair2_compiles_on_tpu():
    from tnl_lbm_tpu.parallel.sharded import (
        from_padded_aa_sharded,
        make_sharded_fused_pair2_aa,
        to_padded_aa_sharded,
    )
    from tnl_lbm_tpu.sim import initial_dfs
    import dataclasses

    cfg, dom = _duct((16, 16, 128))
    cfg = dataclasses.replace(cfg, streaming="AA")
    plan = _plan_1dev()
    pair = make_sharded_fused_pair2_aa(cfg, dom, plan, tile=(8, 8))
    f = plan.shard_field(initial_dfs(cfg, dom), like_f=True)
    mp = plan.shard_field(jnp.asarray(dom.map), like_f=False)
    fp = to_padded_aa_sharded(f, plan, dom)
    fp, rho, u = jax.jit(
        lambda fp: pair(fp, mp, 0.02, force=jnp.asarray([1e-5, 0, 0.0])))(fp)
    f2 = from_padded_aa_sharded(fp, plan, dom)
    assert bool(jnp.isfinite(rho).all()) and bool(jnp.isfinite(f2).all())


def test_hooked_kernel_compiles_on_tpu():
    from tnl_lbm_tpu.kernels.hooked import make_hooked_fused_step
    from tnl_lbm_tpu.sim import LBMConfig, initial_dfs
    import dataclasses

    cfg, dom = _duct((16, 16, 128))

    def hook(lat, rho, u, nu, fluid):
        return jnp.where(fluid, -0.01 * u * rho, jnp.zeros_like(u))

    for streaming in ("AB", "AA"):
        cfg2 = dataclasses.replace(cfg, forcing_hook=hook, streaming=streaming)
        step = make_hooked_fused_step(
            cfg2, dom, **({"tile": (8, 8)} if streaming == "AB"
                          else {"tile_even": (8, 8), "tile_odd": (8, 8)}))
        f = initial_dfs(cfg2, dom)
        for parity in (0, 1) if streaming == "AA" else (0,):
            f, rho, u = jax.jit(
                lambda f, p=parity: step(f, 0.02,
                                         force=jnp.asarray([1e-5, 0, 0.0]),
                                         parity=p))(f)
        assert bool(jnp.isfinite(rho).all())


def test_coupled_aa_pair_compiles_on_tpu():
    from tnl_lbm_tpu.kernels.fused_coupled import make_fused_coupled_step_aa
    from tnl_lbm_tpu.models import D3Q7
    from tnl_lbm_tpu.ops import collision_ade as cade
    from tnl_lbm_tpu.sim import Domain, LBMConfig, initial_dfs
    import dataclasses

    cfg, dom = _duct((16, 16, 128))
    cfg = dataclasses.replace(cfg, streaming="AA")
    ade_dom = Domain(lat=D3Q7, units=dom.units,
                     map=np.zeros(dom.shape, np.uint8), periodic=dom.periodic)
    ade_cfg = LBMConfig(lat=D3Q7, collision=cade.collide_clbm_ade,
                        streaming="AA", compute_dtype=jnp.float32)
    pair = make_fused_coupled_step_aa(cfg, dom, ade_cfg, ade_dom,
                                      tile_even=(8, 8), tile_odd=(8, 8))
    f = initial_dfs(cfg, dom)
    phi0 = jnp.ones(dom.shape, jnp.float32)
    g = ade_cfg.eq(D3Q7, phi0, jnp.zeros((3,) + dom.shape)).astype(jnp.float32)
    for parity in (0, 1):
        f, g, rho, u, phi = jax.jit(
            lambda f, g, p=parity: pair(f, g, 0.02, 1e-3,
                                        force=jnp.asarray([1e-5, 0, 0.0]),
                                        parity=p))(f, g)
    assert bool(jnp.isfinite(phi).all())
