"""VTK writers: .vti ImageData fields and legacy polydata point clouds.

TPU-native replacement for the reference's ADIOS2/VTK output stack
(reference: adios_writer.h/.hpp - BP4 + vtk.xml ImageData attribute;
lbm_block.hpp:799-1121 cut writers; vtk_writer.h legacy points).  We write
plain ParaView-compatible files:

- ``write_vti``: one ImageData .vti with appended raw binary (float32),
  geometry matching the reference convention that lattice site i sits at
  physOrigin + (i - 0.5) * dl (lattice.h:63-66);
- ``write_points_vtk``: legacy POLYDATA of Lagrangian points.

Scalars are numpy arrays shaped [X, Y(, Z)]; vectors [D, X, Y(, Z)] (padded
to 3 components on write).  Sub-box / plane cuts are realized by slicing
before writing (sim/probes.py).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def _as3d(shape):
    return tuple(shape) + (1,) * (3 - len(shape))


def write_vti(
    path,
    scalars: dict | None = None,
    vectors: dict | None = None,
    origin=(0.0, 0.0, 0.0),
    spacing: float = 1.0,
    start=(0, 0, 0),
) -> None:
    """Write named point-data fields on an ImageData grid.

    Args:
      scalars: name -> [X,Y(,Z)] arrays.
      vectors: name -> [D,X,Y(,Z)] arrays (D <= 3; padded with zeros).
      origin: physical coordinates of lattice site (0,0,0).
      spacing: lattice spacing (phys_dl).
      start: global index of the first site (WholeExtent offset for cuts).
    """
    scalars = scalars or {}
    vectors = vectors or {}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    if scalars:
        sshape = next(iter(scalars.values())).shape
    elif vectors:
        sshape = next(iter(vectors.values())).shape[1:]
    else:
        raise ValueError("no fields given")
    nx, ny, nz = _as3d(sshape)
    x0, y0, z0 = _as3d(tuple(start))
    ext = f"{x0} {x0 + nx - 1} {y0} {y0 + ny - 1} {z0} {z0 + nz - 1}"

    blobs = []
    arrays_xml = []
    offset = 0

    def add(name, data, comp):
        nonlocal offset
        raw = data.tobytes()
        blobs.append(raw)
        arrays_xml.append(
            f'<DataArray type="Float32" Name="{name}" NumberOfComponents="{comp}" '
            f'format="appended" offset="{offset}"/>'
        )
        offset += 8 + len(raw)

    for name, arr in scalars.items():
        a = np.asarray(arr, dtype=np.float32).reshape(_as3d(np.shape(arr)))
        # VTK expects x-fastest ordering; our arrays are C-order [X,Y,Z]
        add(name, np.ascontiguousarray(a.transpose(2, 1, 0)), 1)
    for name, arr in vectors.items():
        a = np.asarray(arr, dtype=np.float32)
        d = a.shape[0]
        v = np.zeros((3,) + _as3d(a.shape[1:]), np.float32)
        v[:d] = a.reshape((d,) + _as3d(a.shape[1:]))
        add(name, np.ascontiguousarray(v.transpose(3, 2, 1, 0)), 3)

    o = _as3d(tuple(origin))
    header = f"""<?xml version="1.0"?>
<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" header_type="UInt64">
  <ImageData WholeExtent="{ext}" Origin="{o[0]} {o[1]} {o[2]}" Spacing="{spacing} {spacing} {spacing}">
    <Piece Extent="{ext}">
      <PointData>
        {'        '.join(arrays_xml)}
      </PointData>
      <CellData/>
    </Piece>
  </ImageData>
  <AppendedData encoding="raw">
   _"""

    footer = b"\n  </AppendedData>\n</VTKFile>\n"

    # hand off to the native async writer when available (io/native.py);
    # the write happens on a background thread and never blocks the step loop
    from tnl_lbm_tpu.io import native

    if native.write_vti_async(path, header.encode(), footer, blobs):
        return

    with open(path, "wb") as fh:
        fh.write(header.encode())
        for raw in blobs:
            fh.write(struct.pack("<Q", len(raw)))
            fh.write(raw)
        fh.write(footer)


def write_pvti(
    path,
    whole_extent,
    pieces,
    scalar_names=(),
    vector_names=(),
    origin=(0.0, 0.0, 0.0),
    spacing: float = 1.0,
) -> None:
    """Write a parallel ImageData index referencing per-rank piece files.

    The multi-writer analog of the reference's per-rank ADIOS2 streams
    (adios_writer.hpp:18-24 + the MPI-split writer communicators,
    state.hpp:123-170): in multi-process runs every process writes its own
    shard blocks as plain ``.vti`` pieces (``write_vti`` with ``start=``)
    and the coordinator publishes this one ``.pvti``; ParaView reads the
    set as a single distributed dataset - no full-domain gather anywhere.

    Args:
      whole_extent: ((x0, x1), (y0, y1), (z0, z1)) inclusive site ranges.
      pieces: list of (extent_like_whole_extent, relative_filename).
      scalar_names / vector_names: field names (Float32, 1/3 components).
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    def ext_str(ext):
        e = list(ext) + [(0, 0)] * (3 - len(ext))
        return " ".join(f"{int(a)} {int(b)}" for a, b in e)

    o = _as3d(tuple(origin))
    arrays = [
        f'   <PDataArray type="Float32" Name="{n}" NumberOfComponents="1"/>'
        for n in scalar_names
    ] + [
        f'   <PDataArray type="Float32" Name="{n}" NumberOfComponents="3"/>'
        for n in vector_names
    ]
    piece_xml = [
        f'  <Piece Extent="{ext_str(ext)}" Source="{fname}"/>'
        for ext, fname in pieces
    ]
    body = "\n".join(
        ['<?xml version="1.0"?>',
         '<VTKFile type="PImageData" version="0.1" byte_order="LittleEndian">',
         f' <PImageData WholeExtent="{ext_str(whole_extent)}" GhostLevel="0" '
         f'Origin="{o[0]} {o[1]} {o[2]}" '
         f'Spacing="{spacing} {spacing} {spacing}">',
         "  <PPointData>"]
        + arrays
        + ["  </PPointData>"]
        + piece_xml
        + [" </PImageData>", "</VTKFile>", ""]
    )
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(body)
    from tnl_lbm_tpu.utils.fileutils import rename_exchange

    rename_exchange(tmp, path)


def write_points_vtk(path, points: np.ndarray, time: float | None = None) -> None:
    """Legacy VTK POLYDATA point cloud (reference vtk_writer.h:5-48)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    with open(path, "w") as fh:
        fh.write("# vtk DataFile Version 3.0\n")
        fh.write(f"time {time}\n" if time is not None else "points\n")
        fh.write("ASCII\nDATASET POLYDATA\n")
        fh.write(f"POINTS {len(pts)} double\n")
        for p in pts:
            fh.write(f"{p[0]} {p[1]} {p[2]}\n")
