"""C++ async writer backend (native/lbm_io.cpp via ctypes)."""

import numpy as np
import pytest

from tnl_lbm_tpu.io import native


@pytest.fixture(scope="module")
def lib_ok():
    if native.get_lib() is None:
        pytest.skip("native backend unavailable (no g++?)")
    return True


def test_blob_write_atomic(lib_ok, tmp_path):
    p = tmp_path / "sub" / "blob.bin"
    data = bytes(range(256)) * 10
    assert native.write_blob_async(p, data, atomic=True)
    native.flush()
    assert p.read_bytes() == data
    assert native.errors() == 0
    # no stray tmp files left behind
    assert list(p.parent.glob("*tmp*")) == []


def test_vti_write_assembles_parts(lib_ok, tmp_path):
    p = tmp_path / "out.vti"
    header = b"<VTKFile><AppendedData>_"
    blob = np.arange(64, dtype=np.float32).tobytes()
    footer = b"</AppendedData></VTKFile>"
    assert native.write_vti_async(p, header, footer, [blob])
    native.flush()
    raw = p.read_bytes()
    assert raw.startswith(header) and raw.endswith(footer)
    assert blob in raw
    assert native.errors() == 0


def test_write_to_unwritable_path_counts_error(lib_ok):
    before = native.errors()
    assert native.write_blob_async("/proc/definitely/not/writable/x", b"abc")
    native.flush()
    assert native.errors() > before
