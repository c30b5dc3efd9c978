"""Atomic checkpoint save/restore of the simulation state.

Analog of the reference CheckpointManager over ADIOS2 (reference:
checkpoint.h:6-130; save/load flow state.hpp:677-781): scalars as metadata,
arrays as flat blobs, written to a temp file and atomically published via
rename-exchange, then the "loadstate" flag is created so a rerun resumes
(reference state.hpp:739-770).

Sharded state is written PER SHARD (reference writes per-block variables,
checkpoint.h:58-101): each device's shard is fetched and serialized as its
own ``checkpoint_shard{i}.npz`` - no multi-GB whole-state host gather stalls
the pipeline, and with ``background=True`` the native C++ writer pool
streams the shard blobs in parallel.  The main ``checkpoint.npz`` (meta +
unsharded arrays) is published LAST - it references the shard files, so its
atomic rename is the commit point.
"""

from __future__ import annotations

import json
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
    Arrays sharded over multiple devices are written per shard (see module
    docstring).  With ``background=True`` blobs go to the native C++ writer
    pool (io/native.py) so a multi-GB checkpoint does not block the
    simulation loop; call ``io.native.flush()`` before relying on the file.
    """
    directory = Path(directory)
    mkdir_p(directory)
    final = directory / "checkpoint.npz"

    host = {}
    shard_payloads = {}  # file index -> {key -> shard ndarray}
    shard_meta = {}      # key -> {"shape", "dtype", "parts": [[i, [[s,e],..]]]}
    for k, v in arrays.items():
        shards = getattr(v, "addressable_shards", None)
        if shards is not None and len(shards) > 1:
            parts = []
            for s in shards:
                idx = []
                for dim, sl in enumerate(s.index):
                    start = 0 if sl.start is None else int(sl.start)
                    stop = v.shape[dim] if sl.stop is None else int(sl.stop)
                    idx.append([start, stop])
                i = len(parts)
                shard_payloads.setdefault(i, {})[k] = np.asarray(
                    jax.device_get(s.data))
                parts.append([i, idx])
            shard_meta[k] = {
                "shape": list(v.shape), "dtype": str(v.dtype), "parts": parts}
        else:
            host[k] = np.asarray(jax.device_get(v))

    for i, payload in shard_payloads.items():
        _write_npz(directory / f"checkpoint_shard{i:03d}.npz", payload, background)

    meta = dict(meta)
    if shard_meta:
        meta["__shards__"] = shard_meta
    host["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    # the meta-bearing main file last: its atomic swap commits the checkpoint
    _write_npz(final, host, background)
    return final


def load_checkpoint(directory):
    """Returns (arrays dict, meta dict) or None if no checkpoint exists.

    Sharded arrays are reassembled from their ``checkpoint_shard*.npz``
    parts into plain host arrays (the caller re-shards via its plan).
    """
    directory = Path(directory)
    final = directory / "checkpoint.npz"
    if not final.exists():
        return None
    with np.load(final) as data:
        arrays = {k: data[k] for k in data.files if k != "__meta__"}
        meta = json.loads(bytes(data["__meta__"]).decode())
    shard_meta = meta.pop("__shards__", None)
    if shard_meta:
        files = {}
        for k, info in shard_meta.items():
            out = np.zeros(tuple(info["shape"]), dtype=np.dtype(info["dtype"]))
            for i, idx in info["parts"]:
                if i not in files:
                    files[i] = np.load(directory / f"checkpoint_shard{i:03d}.npz")
                sl = tuple(slice(s, e) for s, e in idx)
                out[sl] = files[i][k]
            arrays[k] = out
        for fh in files.values():
            fh.close()
    return arrays, meta
