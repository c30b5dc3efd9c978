"""2D geometry-file loader (per-cell type + 8 Bouzidi thetas).

Analog of the reference ``projectObjectFromFile`` (reference:
sim_2D/sim2d_3.cu:101-185): each line is ``x y type c0..c7`` with type
0=fluid, 1=near-wall (Bouzidi), 2=wall; thetas are normalized wall distances
per compass direction E N W S NE NW SW SE (reference d2q9/bc.h:143-150).
Validation matches the reference: theta <= 1, inferred dims == lattice dims,
row count == X*Y.

Our step stores thetas per *incoming* direction q (index q-1 in the [8,X,Y]
array, ordered as D2Q9.names[1:]): the wall distance along opp(q) - see
sim/step.py _bouzidi.  This function performs the reordering.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tnl_lbm_tpu.models.descriptors import D2Q9
from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.utils.logging_utils import get_logger

#: file column order: compass direction -> c vector
_COMPASS = {
    0: (1, 0),    # E
    1: (0, 1),    # N
    2: (-1, 0),   # W
    3: (0, -1),   # S
    4: (1, 1),    # NE
    5: (-1, 1),   # NW
    6: (-1, -1),  # SW
    7: (1, -1),   # SE
}


def _compass_index(c) -> int:
    for k, v in _COMPASS.items():
        if v == tuple(c):
            return k
    raise KeyError(c)


def load_geometry_file(path, X: int, Y: int, use_bouzidi_for_type1: bool = True):
    """Returns (map [X, Y] uint8, bouzidi [8, X, Y] float32 or None).

    Raises ValueError on dimension mismatch / invalid thetas, mirroring the
    reference's runtime guards (sim2d_3.cu:136-177).
    """
    log = get_logger("main")
    path = Path(path)
    data = np.loadtxt(path, dtype=np.float64, ndmin=2)
    if data.shape[1] != 11:
        raise ValueError(f"geometry file must have 11 columns, got {data.shape[1]}")

    xi = data[:, 0].astype(np.int64)
    yi = data[:, 1].astype(np.int64)
    cell_type = data[:, 2].astype(np.int64)
    thetas = data[:, 3:11]

    if (thetas > 1.0).any():
        raise ValueError("Bouzidi theta out of range (>1)")
    if len(data) != X * Y:
        raise ValueError(f"geometry row count {len(data)} != lattice size {X * Y}")
    if xi.max() + 1 != X or yi.max() + 1 != Y:
        raise ValueError(
            f"geometry dims {xi.max() + 1} x {yi.max() + 1} do not match lattice {X} x {Y}"
        )

    m = np.zeros((X, Y), np.uint8)
    near_wall = GEO.FLUID_NEAR_WALL if use_bouzidi_for_type1 else GEO.FLUID
    type_map = {0: GEO.FLUID, 1: near_wall, 2: GEO.WALL}
    m[xi, yi] = [int(type_map.get(int(t), GEO.FLUID)) for t in cell_type]

    # reorder: theta for incoming q = file column of compass(opp(q))
    bz = np.full((8, X, Y), -1.0, np.float32)
    for q in range(1, D2Q9.Q):
        col_idx = _compass_index(tuple(-D2Q9.c[q]))
        bz[q - 1, xi, yi] = thetas[:, col_idx]

    log.info(
        "geometry '%s' loaded: %d rows, %d near-wall, %d wall",
        path.name, len(data), int((cell_type == 1).sum()), int((cell_type == 2).sum()),
    )
    return m, bz
