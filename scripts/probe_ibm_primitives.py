#!/usr/bin/env python3
"""Measure the TPU primitive rates that decide the sparse-IBM design.

The round-5 IBM rework (VERDICT r4 item 2) replaces the dense A / naive
scatter pair with precomputed sparse operators.  Every candidate layout
reduces to a handful of XLA primitives whose TPU throughput is undocumented
and strongly layout-dependent; this probe times them at the production
sizes (m = 1e5 points, s^3 = 64 stencil slots, u ~ 1e6 unique nodes,
96^3 grid) so the operator layout is chosen from measurement, not folklore.

Probed:
  g_rows3   gather N rows from [m, 3]      (ELLPACK matvec x-gather)
  g_rows8   gather N rows from [m, 8]      (padded-row variant)
  g_cols    gather N lanes from [3, m]     (transposed variant)
  g_grid    gather N scalars from [3, 96^3] (point <- grid interpolation)
  sc_rand   scatter-add N rows into [m, 3], random ids (naive spread)
  sc_sort   same, ids sorted               (indices_are_sorted)
  sc_uniq   scatter-set u unique rows into grid (compact spread finish)
  seg_sum   segment_sum N sorted -> u      (sort-by-node spread reduce)
  ell32/256 full ELLPACK matvec [m, nmax] incl. val/idx streaming
  mxu32k    dense [32k, 32k] @ [32k, 3] f32 HIGHEST (old modified matvec)

Usage: python scripts/probe_ibm_primitives.py [--m 100000] [--reps 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench(fn, *args, reps=20):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / reps


def jax_block(x):
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        leaf.block_until_ready()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=100_000)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--grid", type=int, default=96)
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{getattr(dev, 'device_kind', '?')}")
    m = args.m
    s3 = 64                    # phi2 stencil 4^3
    N = m * s3                 # stencil-slot contribution count
    G = args.grid
    u = min(N, 10 * m)         # unique-node count (surface cloud estimate)
    rng = np.random.default_rng(0)

    x3 = jnp.asarray(rng.standard_normal((m, 3)), jnp.float32)
    x8 = jnp.pad(x3, [(0, 0), (0, 5)])
    xT = x3.T.copy()
    grid = jnp.asarray(rng.standard_normal((3, G, G, G)), jnp.float32)
    idxN = jnp.asarray(rng.integers(0, m, N), jnp.int32)
    idxN_sorted = jnp.sort(idxN)
    gidN = jnp.asarray(rng.integers(0, G * G * G, N), jnp.int32)
    segN = jnp.sort(jnp.asarray(rng.integers(0, u, N), jnp.int32))
    uids = jnp.asarray(
        rng.choice(G * G * G, size=u, replace=False), jnp.int32)
    vN = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)

    R = {}

    R["g_rows3"] = (bench(jax.jit(lambda a, i: a[i]), x3, idxN, reps=args.reps), N)
    R["g_rows8"] = (bench(jax.jit(lambda a, i: a[i]), x8, idxN, reps=args.reps), N)
    R["g_cols"] = (bench(jax.jit(lambda a, i: a[:, i]), xT, idxN, reps=args.reps), N)
    R["g_grid"] = (bench(
        jax.jit(lambda g, i: g.reshape(3, -1)[:, i]), grid, gidN, reps=args.reps), N)
    R["sc_rand"] = (bench(
        jax.jit(lambda v, i: jnp.zeros((G * G * G, 3), jnp.float32).at[i].add(v)),
        vN, gidN, reps=args.reps), N)
    gid_sorted = jnp.sort(gidN)
    R["sc_sort"] = (bench(
        jax.jit(lambda v, i: jnp.zeros((G * G * G, 3), jnp.float32)
                .at[i].add(v, indices_are_sorted=True)),
        vN, gid_sorted, reps=args.reps), N)
    vU = vN[:u]
    R["sc_uniq"] = (bench(
        jax.jit(lambda v, i: jnp.zeros((G * G * G, 3), jnp.float32)
                .at[i].set(v, unique_indices=True)),
        vU, uids, reps=args.reps), u)
    R["seg_sum"] = (bench(
        jax.jit(partial(jax.ops.segment_sum, num_segments=u,
                        indices_are_sorted=True)),
        vN, segN, reps=args.reps), N)

    for nmax in (32, 256):
        val = jnp.asarray(rng.standard_normal((m, nmax)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, m, (m, nmax)), jnp.int32)

        @jax.jit
        def ell(val, idx, x):
            return jnp.sum(val[..., None] * x[idx], axis=1)

        R[f"ell{nmax}"] = (bench(ell, val, idx, x3, reps=args.reps), m * nmax)

    mk = 32768
    A = jnp.asarray(rng.standard_normal((mk, mk)), jnp.float32)
    xk = jnp.asarray(rng.standard_normal((mk, 3)), jnp.float32)
    R["mxu32k"] = (bench(
        jax.jit(lambda A, x: jnp.matmul(A, x, precision=jax.lax.Precision.HIGHEST)),
        A, xk, reps=args.reps), mk * mk)

    print(f"m={m} N={N} u={u} grid={G}^3")
    for k, (t, n) in R.items():
        print(f"{k:>8}: {t * 1e3:8.3f} ms  ({n / t / 1e9:7.3f} Gelem/s)")


if __name__ == "__main__":
    main()
