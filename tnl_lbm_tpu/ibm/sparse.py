"""Host-side sparse structure builders for the TPU IBM solver.

The reference builds SlicedEllpack sparse matrices for M, M^T and A on the
GPU (reference lagrange_3D.h:65-97, ibm_kernels.h:7-186) because CUDA has
fast native gather/scatter.  TPUs do not: the profitable layouts are dense
MXU matmuls over a COMPACT space and statically-padded ELLPACK gathers.
All structure here is precomputed once on the host (the Lagrangian cloud is
static) with a bucket-grid neighbor search - O(m * neighbors), no m^2
anything - and shipped to the device as plain arrays that enter jit as
arguments (the hook-consts protocol, ibm/lagrange.py).

Key reduction (dense clouds): with W the [m, u] interpolation matrix over
the u UNIQUE stencil nodes, the velocity-correction system
``(W W^T) x = b`` only ever feeds the physics through ``y = W^T x``, and
``y = W^T (W W^T)^+ b = (W^T W)^+ W^T b`` (Moore-Penrose identity).  When
points are denser than the lattice (the reference's production IBM regime,
e.g. 1e5 points on a 96^3-grid sphere -> u ~ 2e4 << m) the node-space Gram
``B = W^T W`` is a small dense SPD matrix: the whole per-step solve becomes
a handful of [u, u] MXU matmuls, with zero gather/scatter inside CG.
"""

from __future__ import annotations

import numpy as np


def unique_nodes(nodes: np.ndarray, shape) -> tuple[np.ndarray, np.ndarray]:
    """Deduplicate clipped stencil nodes.

    nodes: [m, s3, 3] integer lattice coordinates (may exceed the grid;
    clipped to ``shape`` exactly like interpolate/spread do).
    Returns (uflat [u] int32 flat grid ids sorted ascending,
             uid [m, s3] int32 index into uflat per stencil slot).
    """
    nx, ny, nz = shape
    ix = np.clip(nodes[..., 0], 0, nx - 1)
    iy = np.clip(nodes[..., 1], 0, ny - 1)
    iz = np.clip(nodes[..., 2], 0, nz - 1)
    flat = (ix.astype(np.int64) * ny + iy) * nz + iz
    uflat, inv = np.unique(flat.reshape(-1), return_inverse=True)
    return uflat.astype(np.int32), inv.reshape(flat.shape).astype(np.int32)


def neighbor_pairs(pts: np.ndarray, radius: float,
                   max_candidates: int = 300_000_000) -> tuple[np.ndarray, np.ndarray]:
    """All ordered pairs (k, l) with per-dim |pts[k] - pts[l]| < radius
    (Chebyshev metric - separable dirac kernels have box support).

    Bucket-grid search: cells of edge ``radius``; candidates are the 27
    surrounding cells.  Vectorized over cells via sort + searchsorted.
    Includes the diagonal (k, k).  Returns (ks, ls) int32 arrays.
    """
    pts = np.asarray(pts, np.float64)
    m = len(pts)
    cell = np.floor(pts / radius).astype(np.int64)
    cmin = cell.min(axis=0)
    cell -= cmin
    # linear cell ids with every id-space dim >= 3: the 27 neighbor offsets
    # (ox*D1 + oy)*D2 + oz with digits in {-1,0,1} are then pairwise
    # DISTINCT, so no true pair is emitted twice (with D < 3 e.g. (0,1,-1)
    # and (0,0,1) alias and entries double-count).  Wrap-around candidates
    # at the id-space edges are false neighbors only - the exact Chebyshev
    # filter below removes them.
    dims = np.maximum(cell.max(axis=0) + 1, 3)
    cid = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    order = np.argsort(cid, kind="stable")
    cid_s = cid[order]

    ks_all, ls_all = [], []
    total = 0
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                off = (ox * dims[1] + oy) * dims[2] + oz
                # for every point k (sorted), the contiguous run of points
                # whose cell id equals cid_s + off
                tgt = cid_s + off
                lo = np.searchsorted(cid_s, tgt, side="left")
                hi = np.searchsorted(cid_s, tgt, side="right")
                cnt = hi - lo
                total += int(cnt.sum())
                if total > max_candidates:
                    raise MemoryError(
                        f"neighbor search: >{max_candidates} candidate pairs "
                        f"(radius {radius}, m={m}) - cloud too dense for this "
                        f"radius")
                ks = np.repeat(np.arange(m), cnt)
                # ls enumerates each run lo[i]..hi[i]
                ls = np.repeat(lo, cnt) + (
                    np.arange(cnt.sum()) - np.repeat(np.cumsum(cnt) - cnt, cnt))
                ks_all.append(ks)
                ls_all.append(ls)
    ks = np.concatenate(ks_all)
    ls = np.concatenate(ls_all)
    # exact Chebyshev filter on the candidates
    d = pts[order[ks]] - pts[order[ls]]
    keep = (np.abs(d) < radius).all(axis=1)
    ks, ls = order[ks[keep]], order[ls[keep]]
    return ks.astype(np.int32), ls.astype(np.int32)


def pack_ellpack(ks: np.ndarray, ls: np.ndarray, vals: np.ndarray, m: int,
                 drop_below: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """Pack COO (ks, ls, vals) rows into padded ELLPACK.

    Returns (idx [m, nmax] int32, val [m, nmax] float32); padding entries
    point at row 0 with value 0 (harmless in a gather-matvec).  Entries
    with |val| <= drop_below are dropped (exact zeros from points at the
    support boundary never affect the matvec).
    """
    keep = np.abs(vals) > drop_below
    ks, ls, vals = ks[keep], ls[keep], vals[keep]
    order = np.argsort(ks, kind="stable")
    ks, ls, vals = ks[order], ls[order], vals[order]
    counts = np.bincount(ks, minlength=m)
    nmax = max(1, int(counts.max()) if len(counts) else 1)
    idx = np.zeros((m, nmax), np.int32)
    val = np.zeros((m, nmax), np.float32)
    row_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(ks)) - row_start[ks]
    idx[ks, slot] = ls
    val[ks, slot] = vals
    return idx, val
