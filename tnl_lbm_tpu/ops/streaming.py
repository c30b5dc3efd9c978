"""Streaming patterns as whole-array shifts (pull A-B and in-place A-A).

The reference implements streaming as per-thread neighbor loads
(reference: d3q27/streaming_AB.h:21-52, streaming_AA.h:12-116).  On TPU the
same data movement is expressed as Q static slices of a halo-padded array -
XLA lowers each to a cheap strided copy and fuses the subsequent elementwise
work.

Conventions:
- ``f`` has shape [Q, *S]; a padded array ``fpad`` has shape [Q, *(S+2)].
- pull:  f_in[q](x) = f[q](x - c_q)            (AB streaming / AA-odd write)
- A-A even step: reads are same-site same-direction, writes are same-site
  opposite-direction; A-A odd step: reads are neighbor opposite-direction,
  writes are neighbor same-direction.  Both reduce to compositions of
  ``pull`` and the opposite-direction permutation (see sim/step.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from tnl_lbm_tpu.models.descriptors import LatticeDescriptor


def pad_halo(f: jnp.ndarray, periodic: tuple[bool, ...]) -> jnp.ndarray:
    """Pad 1-wide halo on every spatial axis of ``f [Q, *S]``.

    Periodic axes wrap; non-periodic axes replicate the edge value, which
    reproduces the reference's index clamping at the global boundary
    (reference: kernels.h:50-55).  Under ``shard_map`` this function is
    replaced by the ppermute-based exchange in ``parallel/halo.py``.
    """
    for axis, per in enumerate(periodic):
        mode = "wrap" if per else "edge"
        pad_width = [(0, 0)] * f.ndim
        pad_width[axis + 1] = (1, 1)
        f = jnp.pad(f, pad_width, mode=mode)
    return f


def _shift_slices(fpad_q: jnp.ndarray, offsets, shape) -> jnp.ndarray:
    """Slice a padded [*(S+2)] array at halo offset: out(x) = fpad(x + 1 + off)."""
    index = tuple(slice(1 + o, 1 + o + n) for o, n in zip(offsets, shape))
    return fpad_q[index]


def pull(lat: LatticeDescriptor, fpad: jnp.ndarray, shape) -> jnp.ndarray:
    """Pull streaming: f_in[q](x) = f[q](x - c_q)."""
    return jnp.stack([
        _shift_slices(fpad[q], [-int(c) for c in lat.c[q]], shape) for q in range(lat.Q)
    ])


def pull_from(lat: LatticeDescriptor, fpad: jnp.ndarray, shape, src_perm) -> jnp.ndarray:
    """Pull with a source-direction permutation: f_in[q](x) = f[perm[q]](x - c_q).

    With ``src_perm = lat.opp`` this is the A-A odd-step read
    (reference streaming_AA.h:86-115).
    """
    return jnp.stack([
        _shift_slices(fpad[int(src_perm[q])], [-int(c) for c in lat.c[q]], shape)
        for q in range(lat.Q)
    ])


def pull_shift_x(lat: LatticeDescriptor, fpad: jnp.ndarray, shape, dx: int = -1) -> jnp.ndarray:
    """Pull with the x-offset fixed to ``dx`` for every direction.

    Realizes the GEO_OUTFLOW_RIGHT trick ``xp = x = xm`` (reference
    d3q27/bc.h:64-65): every direction is pulled from x+dx, y-c_y, z-c_z.
    """
    out = []
    for q in range(lat.Q):
        off = [-int(c) for c in lat.c[q]]
        off[0] = dx
        out.append(_shift_slices(fpad[q], off, shape))
    return jnp.stack(out)


#: speed of sound used by the interpolated outflow (reference streaming_AB.h:214)
SPEED_OF_SOUND = 0.5773502691896257


def pull_interp_right(lat: LatticeDescriptor, fpad: jnp.ndarray, shape) -> jnp.ndarray:
    """Geier (2015) speed-of-sound interpolated outflow at the +x boundary.

    Directions with c_x >= 0 stream normally from x-1 (c_x=+1) or x (c_x=0);
    incoming directions (c_x = -1) are interpolated between x-1 and x instead
    of reading the non-existent x+1 neighbor
    (reference streaming_AB.h:209-242).
    """
    cs = SPEED_OF_SOUND
    out = []
    for q in range(lat.Q):
        off = [-int(c) for c in lat.c[q]]
        cx = int(lat.c[q][0])
        if cx == -1:
            off_a = list(off)
            off_a[0] = -1  # from x-1
            off_b = list(off)
            off_b[0] = 0  # from x
            out.append(
                cs * _shift_slices(fpad[q], off_a, shape)
                + (1 - cs) * _shift_slices(fpad[q], off_b, shape)
            )
        else:
            off[0] = -cx  # +1 -> x-1, 0 -> x (standard)
            out.append(_shift_slices(fpad[q], off, shape))
    return jnp.stack(out)


def push(lat: LatticeDescriptor, f_post: jnp.ndarray, periodic) -> jnp.ndarray:
    """Push streaming: out[q](x) = f_post[q](x - c_q), values leaving the
    domain are dropped and boundary sites receive the clamped/wrapped edge
    value (overwritten by BCs next step).  Used for the A-A odd-step write
    (reference streaming_AA.h:46-75)."""
    fpad = pad_halo(f_post, periodic)
    return pull(lat, fpad, f_post.shape[1:])
