"""PNG geometry import: image intensity -> wall voxels.

Analog of the reference PNGTool + projectPNG_X/Y/Z (reference:
lbm_common/png_tool.h:5-113, state.hpp:552-667): dark pixels (intensity
below threshold) become walls, projected along a lattice axis with optional
rotate / mirror / flip / crop transforms.
"""

from __future__ import annotations

import numpy as np

from tnl_lbm_tpu.ops.boundary import GEO
from tnl_lbm_tpu.sim.config import Domain


def png_intensity(path) -> np.ndarray:
    """Grayscale intensity in [0, 1], shape [W, H] (x right, y up)."""
    from PIL import Image

    img = Image.open(path).convert("L")
    arr = np.asarray(img, dtype=np.float64) / 255.0  # [H, W], row 0 = top
    return arr[::-1].T  # -> [W, H] with y up


def transform_mask(mask: np.ndarray, rotate: int = 0, mirror: bool = False, flip: bool = False,
                   crop=None) -> np.ndarray:
    """rotate in multiples of 90 deg CCW; mirror = flip x; flip = flip y;
    crop = (x0, y0, x1, y1) half-open."""
    m = np.rot90(mask, k=rotate // 90)
    if mirror:
        m = m[::-1, :]
    if flip:
        m = m[:, ::-1]
    if crop is not None:
        x0, y0, x1, y1 = crop
        m = m[x0:x1, y0:y1]
    return m


def project_png(
    domain: Domain,
    path,
    axis: int,
    span=None,
    threshold: float = 0.5,
    code: GEO = GEO.WALL,
    rotate: int = 0,
    mirror: bool = False,
    flip: bool = False,
    crop=None,
) -> None:
    """Project a PNG wall mask through the domain along ``axis``.

    The image is resampled (nearest) onto the two lattice axes orthogonal to
    ``axis``; dark pixels (< threshold) become ``code`` for all layers in
    ``span`` (default: the whole axis).
    """
    mask = png_intensity(path) < threshold
    mask = transform_mask(mask, rotate=rotate, mirror=mirror, flip=flip, crop=crop)

    other = [a for a in range(domain.lat.D) if a != axis]
    n0, n1 = (domain.shape[a] for a in other) if len(other) == 2 else (domain.shape[other[0]], 1)
    ix = (np.arange(n0) * mask.shape[0] // n0).clip(0, mask.shape[0] - 1)
    iy = (np.arange(n1) * mask.shape[1] // n1).clip(0, mask.shape[1] - 1)
    grid = mask[np.ix_(ix, iy)]

    lo, hi = (0, domain.shape[axis]) if span is None else span
    for layer in range(lo, hi):
        index = [slice(None)] * domain.lat.D
        index[axis] = layer
        view = domain.map[tuple(index)]
        if domain.lat.D == 2:
            view[grid[:, 0]] = int(code)
        else:
            view[grid] = int(code)
