"""Cycle-append time-series output stream.

The reference appends fields by cycle into ONE ADIOS2 BP4 stream opened in
Write/Append mode (reference include/lbm3d/adios_writer.hpp:18-24), so a
long DNS run produces a single self-indexing dataset instead of thousands
of loose files.  The TPU-native analog is a per-run snapshot directory with
a SINGLE ParaView-loadable index: every ``append`` streams one ``.vti``
blob through the native C++ async writer pool (io/native.py - the step
loop never blocks on I/O) and atomically republishes a ``.pvd`` collection
file that names every cycle with its physical time.  ParaView/VisIt open
the ``.pvd`` directly as a time series; both the snapshots and the index
publish via atomic rename-exchange, so readers never see torn files (an
async snapshot may trail its index entry by the writer-pool latency;
``io.native.flush()`` - called at every checkpoint and at shutdown -
closes the window).

Resume-safe: on construction the writer adopts the entries of an existing
index, so a checkpoint-restored run keeps appending to the same stream
(the reference reopens the BP4 stream in Append mode the same way).
"""

from __future__ import annotations

from pathlib import Path
from xml.sax.saxutils import quoteattr

from tnl_lbm_tpu.io.vtk import write_vti
from tnl_lbm_tpu.utils.fileutils import rename_exchange


class VtiTimeSeries:
    """Append-mode ImageData series with an atomic ``.pvd`` index."""

    def __init__(self, directory, name: str = "data"):
        self.directory = Path(directory)
        self.name = name
        self.index_path = self.directory / f"{name}.pvd"
        self.entries: list[tuple[float, str]] = []
        if self.index_path.exists():
            self._adopt_existing()

    def _adopt_existing(self):
        """Parse a previous run's index (resume = reopen in append mode)."""
        import xml.etree.ElementTree as ET

        try:
            root = ET.parse(self.index_path).getroot()
        except ET.ParseError:
            return
        for ds in root.iter("DataSet"):
            t = float(ds.get("timestep", "0"))
            f = ds.get("file")
            if f:
                self.entries.append((t, f))

    def append(self, scalars=None, vectors=None, *, time: float,
               origin=(0.0, 0.0, 0.0), spacing: float = 1.0,
               start=(0, 0, 0), cycle: int | None = None) -> Path:
        """Write one snapshot and republish the index.

        The snapshot rides the native async writer pool when available;
        the index publish is a small atomic host write.  Returns the
        snapshot path.
        """
        cycle = len(self.entries) if cycle is None else cycle
        fname = f"{self.name}_{cycle:06d}.vti"
        write_vti(self.directory / fname, scalars=scalars, vectors=vectors,
                  origin=origin, spacing=spacing, start=start)
        self.record(time=time, fname=fname)
        return self.directory / fname

    def record(self, *, time: float, fname: str) -> None:
        """Index an externally-written snapshot (e.g. a ``.pvti`` whose
        pieces the processes of a multi-host run wrote themselves)."""
        # a resumed run may legitimately rewrite the cycle it was saved at
        self.entries = [(t, f) for t, f in self.entries if f != fname]
        self.entries.append((float(time), fname))
        self._publish_index()

    def _publish_index(self):
        lines = [
            '<?xml version="1.0"?>',
            '<VTKFile type="Collection" version="0.1" '
            'byte_order="LittleEndian">',
            " <Collection>",
        ]
        for t, f in self.entries:
            lines.append(
                f'  <DataSet timestep="{t:.12g}" group="" part="0" '
                f"file={quoteattr(f)}/>"
            )
        lines += [" </Collection>", "</VTKFile>", ""]
        self.directory.mkdir(parents=True, exist_ok=True)
        tmp = self.index_path.with_name(self.index_path.name + ".tmp")
        tmp.write_text("\n".join(lines))
        rename_exchange(tmp, self.index_path)
