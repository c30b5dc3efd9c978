"""Atomic checkpoint save/restore of the simulation state.

Analog of the reference CheckpointManager over ADIOS2 (reference:
checkpoint.h:6-130; save/load flow state.hpp:677-781): scalars as metadata,
arrays as flat blobs, written to a temp file and atomically published via
rename-exchange, then the "loadstate" flag is created so a rerun resumes
(reference state.hpp:739-770).

Sharded state is written PER DEVICE (reference writes per-block variables,
checkpoint.h:58-101): each device's shard is serialized as its own
``checkpoint_shard{i}_{epoch}.npz`` where ``i`` is the device's position in
the id-sorted global device set - no multi-GB whole-state host gather
stalls the pipeline, and with ``background=True`` the native C++ writer
pool streams the shard blobs in parallel.

Multi-process runs (parallel/distributed.py, the analog of the reference's
per-rank MPI checkpointing, state.hpp:677-737): every process writes the
shard files its local devices own, the epoch token is broadcast from the
coordinator so all files carry the same epoch, a barrier orders the shard
writes before the coordinator publishes the meta-bearing main file, and
only the coordinator garbage-collects.  Loading assumes a shared
filesystem (every process reads all shard files) - the same assumption the
reference's per-rank ADIOS2 streams make.

Crash safety: shard files are EPOCH-SUFFIXED (never overwritten in place),
the writer pool is flushed before the meta-bearing main ``checkpoint.npz``
is atomically published (so the commit point really commits - the shards it
references are already on disk), and the superseded epoch's shard files are
deleted only after the main file landed.  A crash at ANY point therefore
leaves either the previous complete checkpoint or the new complete
checkpoint.  Each shard file additionally carries an ``__epoch__`` token
that ``load_checkpoint`` verifies - a torn state (e.g. hand-copied files)
raises instead of silently resuming from mixed epochs.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import numpy as np

from tnl_lbm_tpu.utils.fileutils import mkdir_p, rename_exchange


def _write_npz(path: Path, payload: dict, background: bool) -> None:
    import io as _io

    if background:
        from tnl_lbm_tpu.io import native

        buf = _io.BytesIO()
        np.savez(buf, **payload)
        if native.write_blob_async(path, buf.getvalue(), atomic=True):
            return
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as fh:
        np.savez(fh, **payload)
    rename_exchange(tmp, path)


def save_checkpoint(directory, arrays: dict, meta: dict,
                    background: bool = False) -> Path:
    """Save ``arrays`` (name -> device/host array) + ``meta`` (JSON-able).

    Publishes ``<dir>/checkpoint.npz`` atomically; returns the path.
    Arrays sharded over multiple devices are written per device (see module
    docstring).  With ``background=True`` blobs go to the native C++ writer
    pool (io/native.py) so a multi-GB checkpoint does not block the
    simulation loop; call ``io.native.flush()`` before relying on the file.
    Collective in multi-process runs: every process must call it.
    """
    from tnl_lbm_tpu.parallel import distributed as dist

    directory = Path(directory)
    mkdir_p(directory)
    final = directory / "checkpoint.npz"
    epoch = dist.broadcast_int(time.time_ns())
    coordinator = dist.is_coordinator()

    host = {}
    file_payloads = {}   # global device position -> {key -> shard ndarray}
    shard_meta = {}      # key -> {"shape", "dtype", "parts": [[i, [[s,e],..]]]}
    for k, v in arrays.items():
        sharding = getattr(v, "sharding", None)
        dev_set = getattr(sharding, "device_set", None)
        if dev_set is not None and len(dev_set) > 1:
            # canonical owner per distinct region (parallel/distributed.py
            # global_parts: first device in the id-sorted global order, so
            # replicated axes dedupe and coverage in load_checkpoint tiles
            # the array exactly once)
            shard_meta[k] = {
                "shape": list(v.shape), "dtype": str(v.dtype),
                "parts": [[pos, [[s, e] for s, e in idx]]
                          for pos, idx in dist.global_parts(v)]}
            for pos, idx, block in dist.owned_shards(v):
                file_payloads.setdefault(pos, {})[k] = block
        elif coordinator:
            host[k] = np.asarray(jax.device_get(v))

    for i, payload in file_payloads.items():
        payload = dict(payload)
        payload["__epoch__"] = np.asarray(epoch, np.int64)
        _write_npz(directory / f"checkpoint_shard{i:03d}_{epoch}.npz",
                   payload, background)
    if shard_meta:
        if background:
            # commit-point ordering: the shard blobs must be on disk before
            # the meta file that references them is published (ADVICE r2:
            # the 2-thread pool gives no ordering guarantee on its own)
            from tnl_lbm_tpu.io import native

            native.flush()
        # ... and in multi-process runs every OTHER process's blobs too
        dist.barrier("checkpoint-shards")

    if coordinator:
        # the epoch this save supersedes: whatever the currently-published
        # checkpoint references.  GC below is scoped to THAT epoch (plus
        # the legacy unsuffixed layout) so a second writer sharing the
        # directory never has its in-flight shard files collected out from
        # under it (ADVICE r3).
        prev_epoch = None
        if shard_meta and final.exists():
            try:
                with np.load(final) as old:
                    if "__meta__" in old.files:
                        prev_epoch = json.loads(
                            bytes(old["__meta__"]).decode()).get("__epoch__")
            except Exception:
                prev_epoch = None

        meta = dict(meta)
        if shard_meta:
            meta["__shards__"] = shard_meta
            meta["__epoch__"] = epoch
        host["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
        # the meta-bearing main file last: its atomic swap commits the
        # checkpoint
        _write_npz(final, host, background)
        if shard_meta:
            if background:
                from tnl_lbm_tpu.io import native

                native.flush()
            # only now is the new checkpoint fully committed:
            # garbage-collect the shard files THIS save superseded - the
            # previous published epoch, anything OLDER than it (an epoch
            # older than a long-superseded publish can never be referenced
            # again: it either crashed before publishing or was itself
            # superseded - without this, a save that died between
            # shard-write and meta-publish would leak its shard set
            # forever), and the legacy unsuffixed layout.  Epochs NEWER
            # than prev stay: they may belong to a concurrent writer
            # (ADVICE r3).
            doomed = list(directory.glob("checkpoint_shard???.npz"))
            if prev_epoch is not None and prev_epoch != epoch:
                for p in directory.glob("checkpoint_shard???_*.npz"):
                    try:
                        e = int(p.stem.rsplit("_", 1)[1])
                    except ValueError:
                        continue
                    if e <= int(prev_epoch) and e != epoch:
                        doomed.append(p)
            for p in doomed:
                try:
                    p.unlink()
                except OSError:
                    pass
    # no process returns before the checkpoint is committed (a non-
    # coordinator racing into the next save would broadcast a fresh epoch
    # while the coordinator still references this one)
    dist.barrier("checkpoint-commit")
    return final


def load_checkpoint(directory):
    """Returns (arrays dict, meta dict) or None if no checkpoint exists.

    Sharded arrays are reassembled from their ``checkpoint_shard*.npz``
    parts into plain host arrays (the caller re-shards via its plan).  In
    multi-process runs every process performs the same read (shared
    filesystem; ``ShardPlan.shard_field`` then materializes only the local
    shards).
    """
    directory = Path(directory)
    final = directory / "checkpoint.npz"
    if not final.exists():
        return None
    with np.load(final) as data:
        arrays = {k: data[k] for k in data.files if k != "__meta__"}
        meta = json.loads(bytes(data["__meta__"]).decode())
    shard_meta = meta.pop("__shards__", None)
    epoch = meta.pop("__epoch__", None)
    if shard_meta:
        files = {}

        def open_shard(i):
            name = (f"checkpoint_shard{i:03d}_{epoch}.npz" if epoch is not None
                    else f"checkpoint_shard{i:03d}.npz")
            path = directory / name
            if not path.exists() and epoch is not None:
                # legacy layout (pre-epoch checkpoints)
                path = directory / f"checkpoint_shard{i:03d}.npz"
            fh = np.load(path)
            tok = fh["__epoch__"] if "__epoch__" in fh.files else None
            if epoch is not None and tok is not None and int(tok) != int(epoch):
                raise RuntimeError(
                    f"torn checkpoint: {path.name} carries epoch {int(tok)} "
                    f"but checkpoint.npz expects {int(epoch)}")
            return fh

        for k, info in shard_meta.items():
            out = np.zeros(tuple(info["shape"]), dtype=np.dtype(info["dtype"]))
            total = int(np.prod(info["shape"]))
            covered = 0
            for i, idx in info["parts"]:
                if i not in files:
                    files[i] = open_shard(i)
                sl = tuple(slice(s, e) for s, e in idx)
                out[sl] = files[i][k]
                covered += int(np.prod([e - s for s, e in idx]))
            if covered != total:
                # recorded parts do not tile the array - zeros would
                # silently leak into the resumed state
                raise RuntimeError(
                    f"checkpoint array '{k}': shard parts cover {covered} of "
                    f"{total} elements - refusing a partial resume")
            arrays[k] = out
        for fh in files.values():
            fh.close()
    return arrays, meta
