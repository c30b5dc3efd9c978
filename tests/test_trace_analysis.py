"""Measured step anatomy from jax.profiler traces (VERDICT r3 item 3;
reference wall-time battery state.hpp:1285-1300)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tnl_lbm_tpu.utils.trace_analysis import classify_op, format_anatomy


def test_classify_op_categories():
    assert classify_op("fusion.123") == "compute"
    assert classify_op("cumulant_cascade_fusion") == "compute"
    assert classify_op("collective-permute-start.1") == "comm"
    assert classify_op("all-reduce.7") == "comm"
    assert classify_op("ppermute.14") == "comm"
    assert classify_op("Rendezvous") == "comm"
    assert classify_op("Wait: pending_threads=2/8") == "comm"
    assert classify_op("copy.3") == "copy"
    assert classify_op("transpose.9") == "copy"
    # 'copy'/'transpose' only as prefixes - fusions that merely contain
    # them stay compute
    assert classify_op("fused_copy_like") == "compute"


def test_device_plane_uses_only_xla_ops_line():
    """TPU device planes carry an 'XLA Modules' line with ONE event spanning
    the whole executable per dispatch; counting it doubles compute and
    blankets every collective as overlapped.  Only the 'XLA Ops' line's
    events may be yielded when it exists."""
    xplane_pb2 = pytest.importorskip(
        "tensorflow.tsl.profiler.protobuf.xplane_pb2")
    from tnl_lbm_tpu.utils.trace_analysis import _device_op_events

    xs = xplane_pb2.XSpace()
    plane = xs.planes.add(name="/device:TPU:0")
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "jit_step_module"
    plane.event_metadata[2].id = 2
    plane.event_metadata[2].name = "fusion.7"
    plane.event_metadata[3].id = 3
    plane.event_metadata[3].name = "collective-permute-start.1"
    mods = plane.lines.add(name="XLA Modules", timestamp_ns=0)
    e = mods.events.add(metadata_id=1)
    e.offset_ps, e.duration_ps = 0, 10_000_000  # spans everything
    ops = plane.lines.add(name="XLA Ops", timestamp_ns=0)
    e = ops.events.add(metadata_id=2)
    e.offset_ps, e.duration_ps = 0, 4_000_000
    e = ops.events.add(metadata_id=3)
    e.offset_ps, e.duration_ps = 5_000_000, 2_000_000
    steps = plane.lines.add(name="Steps", timestamp_ns=0)
    e = steps.events.add(metadata_id=1)
    e.offset_ps, e.duration_ps = 0, 10_000_000

    got = sorted(name for _, name, _, _ in _device_op_events(xs))
    assert got == ["collective-permute-start.1", "fusion.7"]


@pytest.mark.slow
def test_step_anatomy_from_sharded_trace(tmp_path):
    """Capture a real sharded-step trace on the 8-device CPU mesh and check
    the reduction: comm (ppermute/rendezvous) is nonzero, categories sum
    into the split, and the JSON summary lands."""
    from jax.sharding import Mesh

    from tnl_lbm_tpu.models import D3Q27
    from tnl_lbm_tpu.ops import collision as col
    from tnl_lbm_tpu.ops import equilibrium as eqlib
    from tnl_lbm_tpu.parallel.sharded import ShardPlan, make_sharded_step
    from tnl_lbm_tpu.sim import Domain, LBMConfig
    from tnl_lbm_tpu.utils import Lattice
    from tnl_lbm_tpu.utils.trace_analysis import step_anatomy, write_summary

    pytest.importorskip("tensorflow.tsl.profiler.protobuf")
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    n = 16
    units = Lattice((n, n, n), (0, 0, 0), 1.0, 1.0)
    dom = Domain(lat=D3Q27, units=units, map=np.zeros((n, n, n), np.uint8),
                 periodic=(True,) * 3)
    cfg = LBMConfig(lat=D3Q27, collision=col.collide_srt)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("x", "y"))
    plan = ShardPlan(mesh=mesh, spatial_axes=("x", "y", None))
    step = make_sharded_step(cfg, dom, plan)
    f = plan.shard_field(
        eqlib.eq_quadratic(D3Q27, jnp.ones(dom.shape),
                           jnp.zeros((3,) + dom.shape)), like_f=True)
    mp = plan.shard_field(jnp.asarray(dom.map), like_f=False)
    jstep = jax.jit(lambda f: step(f, mp, 0.03,
                                   force=jnp.array([1e-5, 0.0, 0.0]))[0])
    f = jstep(f)
    jax.block_until_ready(f)
    tdir = tmp_path / "trace"
    with jax.profiler.trace(str(tdir)):
        for _ in range(3):
            f = jstep(f)
        jax.block_until_ready(f)

    a = step_anatomy(tdir)
    assert a["comm_ms"] > 0, "halo ppermutes must appear as comm"
    assert a["compute_ms"] > 0
    assert a["comm_exposed_ms"] + a["comm_overlapped_ms"] == pytest.approx(
        a["comm_ms"], rel=1e-6)
    assert 0.0 <= a["overlap_fraction"] <= 1.0
    assert a["top_ops_ms"]
    assert "compute" in format_anatomy(a)

    out = tmp_path / "summary.json"
    assert write_summary(tdir, out) is not None
    assert out.exists()
