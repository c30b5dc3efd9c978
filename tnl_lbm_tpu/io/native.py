"""ctypes bindings for the native async I/O runtime (native/lbm_io.cpp).

Builds the shared library on first use (g++, cached under native/build/),
falling back to synchronous pure-Python writes when no compiler is
available.  This is the TPU-native replacement for the role of the
reference's ADIOS2 engine thread (reference adios_writer.hpp): snapshot and
checkpoint bytes are handed to native worker threads so the simulation loop
never blocks on disk.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

from tnl_lbm_tpu.utils.logging_utils import get_logger

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "lbm_io.cpp"
_LIB = _REPO / "native" / "build" / "liblbm_io.so"

_lib = None
_tried = False


def _build() -> bool:
    _LIB.parent.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(_LIB), str(_SRC), "-lpthread"]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            get_logger().warning("native io build failed: %s", res.stderr[-500:])
            return False
        return True
    except (OSError, subprocess.TimeoutExpired) as exc:
        get_logger().warning("native io build unavailable: %s", exc)
        return False


def get_lib():
    """Returns the loaded library or None (fallback to Python writes)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.lbm_io_init.argtypes = [ctypes.c_int]
    lib.lbm_io_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int]
    lib.lbm_io_write_vti.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.c_char_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ctypes.c_int,
    ]
    lib.lbm_io_flush.argtypes = []
    lib.lbm_io_errors.restype = ctypes.c_uint64
    lib.lbm_io_init(2)
    _lib = lib
    return _lib


def write_blob_async(path, data: bytes, atomic: bool = True) -> bool:
    """Queue a blob write on the native thread pool; False -> caller should
    write synchronously."""
    lib = get_lib()
    if lib is None:
        return False
    try:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
    except OSError:
        pass  # the native writer reports open() failures via errors()
    buf = ctypes.create_string_buffer(data, len(data))
    lib.lbm_io_write(str(path).encode(), buf, len(data), 1 if atomic else 0)
    return True


def write_vti_async(path, header: bytes, footer: bytes, blobs, atomic: bool = True) -> bool:
    """Queue a VTI write assembled natively from numpy blobs."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return False
    try:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
    except OSError:
        pass
    arrs = [
        np.frombuffer(b, np.uint8) if isinstance(b, (bytes, bytearray)) else np.ascontiguousarray(b)
        for b in blobs
    ]
    ptrs = (ctypes.c_void_p * len(arrs))(*[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs])
    sizes = (ctypes.c_uint64 * len(arrs))(*[a.nbytes for a in arrs])
    lib.lbm_io_write_vti(
        str(path).encode(), header, len(header), footer, len(footer),
        ptrs, sizes, len(arrs), 1 if atomic else 0,
    )
    return True


def flush() -> None:
    lib = get_lib()
    if lib is not None:
        lib.lbm_io_flush()


def errors() -> int:
    lib = get_lib()
    return int(lib.lbm_io_errors()) if lib is not None else 0
