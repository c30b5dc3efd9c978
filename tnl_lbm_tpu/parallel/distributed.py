"""Multi-process (multi-host) runtime.

Analog of the reference's MPI world: the reference drives multi-node runs
through per-rank MPI communicators with a 5-stage synchronizer pipeline
(reference include/lbm3d/lbm.hpp:195-280, lbm_block.hpp:444-450) and a
rank-aware driver for logs/checkpoints/reductions (reference
include/lbm3d/state.hpp:677-737, core.h:88-97).  The TPU-native analog is
JAX's distributed runtime: one controller process per host, each owning its
local chips, arrays globally sharded over the union of devices, and XLA
inserting ICI/DCN collectives - no hand-written message passing.

Usage (one call per process, before any other JAX work)::

    from tnl_lbm_tpu.parallel import distributed
    distributed.initialize()            # TPU pods: everything auto-detected
    # or explicitly (CPU/GPU clusters, tests):
    distributed.initialize("host0:1234", num_processes=4, process_id=rank)

After that every process sees the same global ``jax.devices()`` list;
``choose_plan``/``ShardPlan`` build meshes over it unchanged, ``Simulation``
gates host-side I/O on ``is_coordinator()`` and checkpoints write
per-process shard files (sim/checkpoint.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Join (or create) the distributed runtime.

    On TPU pods all arguments are auto-detected from the environment; on
    CPU/GPU clusters pass the coordinator's ``host:port``, the world size
    and this process's rank (the reference reads the same three facts from
    ``MPI_COMM_WORLD``).  Idempotent: a second call is a no-op.
    """
    if is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def is_initialized() -> bool:
    try:
        from jax._src.distributed import global_state

        return global_state.client is not None
    except Exception:
        return jax.process_count() > 1


def shutdown() -> None:
    """Leave the distributed runtime (tests spawn several in one suite)."""
    try:
        jax.distributed.shutdown()
    except Exception:
        pass


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    """True on the process that owns host-side I/O (flags, probes, VTK
    meta, logs) - the analog of the reference's rank-0 guards
    (state.hpp:677-737)."""
    return jax.process_index() == 0


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def barrier(name: str = "tnl_lbm_barrier") -> None:
    """Block until every process reached this point (the analog of
    ``MPI_Barrier`` around the reference's checkpoint commit,
    state.hpp:739-770).  No-op in single-process runs."""
    if not is_multiprocess():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def replicate_to_host(x) -> np.ndarray:
    """Fetch a (possibly multi-host-sharded) jax.Array to a full host copy
    on EVERY process.

    Collective: all processes must call it together.  Implemented as a jit
    re-shard to a fully-replicated sharding (XLA all-gather over ICI/DCN)
    followed by a local read - the TPU analog of the reference's
    ``MPI_Gatherv``-style block collection for probes/VTK
    (state.hpp:123-511 operate on rank-local blocks instead; we pay one
    gather at I/O cadence to keep whole-domain writers).
    """
    if not hasattr(x, "sharding"):
        return np.asarray(x)
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(jax.device_get(x))
    rep = _replicator(x.sharding.mesh)(x)
    return np.asarray(rep.addressable_data(0))


@functools.lru_cache(maxsize=8)
def _replicator(mesh):
    """Cached jitted all-gather to a replicated sharding: a fresh
    ``jax.jit(lambda ...)`` per call would retrace (and recompile) the
    gather at every probe/print/VTK event."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))


def _norm_index(idx, shape):
    """Slice tuple -> ((start, stop), ...) with Nones resolved."""
    out = []
    for dim, sl in enumerate(idx):
        start = 0 if sl.start is None else int(sl.start)
        stop = shape[dim] if sl.stop is None else int(sl.stop)
        out.append((start, stop))
    return tuple(out)


def global_parts(arr):
    """Canonical decomposition of a sharded jax.Array: [(gpos, index), ...]
    for every distinct region, where ``gpos`` is the owner device's position
    in the id-sorted global device set and ``index`` is ((start, stop), ...)
    per dim.  Replicated regions dedupe to the first device in that order,
    so the parts tile the array exactly once.  Identical on every process
    (it depends only on the sharding).  Unsharded/host arrays -> one part
    owned by position 0."""
    sharding = getattr(arr, "sharding", None)
    dev_set = getattr(sharding, "device_set", None)
    full = tuple((0, s) for s in arr.shape)
    if dev_set is None or len(dev_set) <= 1:
        return [(0, full)]
    gdevs = sorted(dev_set, key=lambda d: d.id)
    imap = sharding.devices_indices_map(arr.shape)
    seen = set()
    parts = []
    for pos, d in enumerate(gdevs):
        idx = _norm_index(imap[d], arr.shape)
        if idx in seen:
            continue
        seen.add(idx)
        parts.append((pos, idx))
    return parts


def owned_shards(arr):
    """[(gpos, index, host_block)] for the canonical-owner regions THIS
    process holds (see global_parts); the union over processes covers the
    array exactly once.  Unsharded arrays -> the whole array on every
    process (caller gates on is_coordinator)."""
    import jax as _jax

    sharding = getattr(arr, "sharding", None)
    dev_set = getattr(sharding, "device_set", None)
    if dev_set is None or len(dev_set) <= 1:
        return [(0, tuple((0, s) for s in arr.shape),
                 np.asarray(_jax.device_get(arr)))]
    owner_pos = {idx: pos for pos, idx in global_parts(arr)}
    gdevs = sorted(dev_set, key=lambda d: d.id)
    gpos = {d: i for i, d in enumerate(gdevs)}
    imap = sharding.devices_indices_map(arr.shape)
    out = []
    for s in arr.addressable_shards:
        idx = _norm_index(imap[s.device], arr.shape)
        if owner_pos.get(idx) == gpos[s.device]:
            out.append((gpos[s.device], idx,
                        np.asarray(_jax.device_get(s.data))))
    return out


def broadcast_int(value: int) -> int:
    """Every process returns the coordinator's value (e.g. the checkpoint
    epoch token, which must be identical across ranks).  Collective."""
    if not is_multiprocess():
        return int(value)
    from jax.experimental import multihost_utils

    out = multihost_utils.broadcast_one_to_all(
        np.asarray([value], np.int64))
    return int(out[0])


def broadcast_flag(value: bool) -> bool:
    """Agree on a coordinator-made host-side decision (e.g. can_compute's
    lock/finished check): every process returns the coordinator's value.
    Collective.  Single-process: identity."""
    if not is_multiprocess():
        return bool(value)
    from jax.experimental import multihost_utils

    out = multihost_utils.broadcast_one_to_all(
        np.asarray([1 if value else 0], np.int32))
    return bool(int(out[0]))
