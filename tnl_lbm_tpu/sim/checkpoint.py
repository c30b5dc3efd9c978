"""Atomic checkpoint save/restore of the simulation state.

Analog of the reference CheckpointManager over ADIOS2 (reference:
checkpoint.h:6-130; save/load flow state.hpp:677-781): scalars as metadata,
arrays as flat blobs, written to a temp file and atomically published via
rename-exchange, then the "loadstate" flag is created so a rerun resumes
(reference state.hpp:739-770).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from tnl_lbm_tpu.utils.fileutils import mkdir_p, rename_exchange


def save_checkpoint(directory, arrays: dict, meta: dict,
                    background: bool = False) -> Path:
    """Save ``arrays`` (name -> device/host array) + ``meta`` (JSON-able).

    Publishes ``<dir>/checkpoint.npz`` atomically; returns the path.
    With ``background=True`` the serialized blob is handed to the native
    C++ writer pool (io/native.py), so a multi-GB checkpoint does not
    block the simulation loop (the device fetch itself is synchronous -
    the state must be consistent); call ``io.native.flush()`` before
    relying on the file.
    """
    import io as _io

    directory = Path(directory)
    mkdir_p(directory)
    tmp = directory / "checkpoint_tmp.npz"
    final = directory / "checkpoint.npz"

    host = {k: np.asarray(jax.device_get(v)) for k, v in arrays.items()}
    host["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    if background:
        from tnl_lbm_tpu.io import native

        buf = _io.BytesIO()
        np.savez(buf, **host)
        if native.write_blob_async(final, buf.getvalue(), atomic=True):
            return final
        # native backend unavailable: fall through to the synchronous path
    with open(tmp, "wb") as fh:
        np.savez(fh, **host)
    rename_exchange(tmp, final)
    return final


def load_checkpoint(directory):
    """Returns (arrays dict, meta dict) or None if no checkpoint exists."""
    final = Path(directory) / "checkpoint.npz"
    if not final.exists():
        return None
    with np.load(final) as data:
        arrays = {k: data[k] for k in data.files if k != "__meta__"}
        meta = json.loads(bytes(data["__meta__"]).decode())
    return arrays, meta
