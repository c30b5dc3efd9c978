"""Runtime kernel-geometry autotuner.

Analog of the reference's empirical CUDA block-size chooser
(block_size_optimizer.h:17-111: 256 threads SP / 128 DP, halve while
undersized, tuned on GTX 1080 / V100 / A100).  On TPU the tunable is the
Pallas tile geometry ``(tx, ty, tiles_per_program)``: the right choice
depends on VMEM size, HBM bandwidth and the VPU:DMA balance of the chip,
so instead of baking per-chip constants this module TIMES the candidate
configurations on the actual device once and caches the winner per
(device kind, lattice shape, kernel) in a JSON file.

Candidates that fail to compile (VMEM overflow, Mosaic limits on an
unknown chip) are skipped - exactly the reference's "halve while it does
not fit" behavior, discovered empirically instead of computed.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import jax

_DEFAULT_CACHE = "~/.cache/tnl_lbm_tpu/autotune.json"


def _cache_path() -> Path:
    return Path(os.environ.get("TNL_AUTOTUNE_CACHE", _DEFAULT_CACHE)).expanduser()


def device_kind() -> str:
    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', 'unknown')}"


def _load() -> dict:
    p = _cache_path()
    if p.exists():
        try:
            return json.loads(p.read_text())
        except (ValueError, OSError):
            return {}
    return {}


def _store(cache: dict) -> None:
    p = _cache_path()
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps(cache, indent=1, sort_keys=True))
    tmp.replace(p)


def autotune(key: str, candidates, time_candidate, default, force: bool = False):
    """Return the fastest candidate for ``key`` on this device.

    ``time_candidate(c) -> seconds`` builds + times one configuration and
    may raise (failed compiles are skipped).  On CPU (interpret mode -
    timings are meaningless) the ``default`` is returned untimed.  Winners
    persist in the cache file; ``force=True`` re-measures.
    """
    full_key = f"{device_kind()}|{key}"
    cache = _load()
    if not force and full_key in cache:
        hit = cache[full_key]
        return tuple(hit) if isinstance(hit, list) else hit
    if jax.default_backend() == "cpu":
        return default
    best, best_t = None, None
    results = {}
    for c in candidates:
        try:
            t = time_candidate(c)
        except Exception as exc:  # failed compile / OOM on this chip: skip
            # record WHY (Mosaic rejection vs OOM vs ...) so the sweep
            # table distinguishes "rejected" from "slow" from "never ran"
            results[str(c)] = f"failed: {type(exc).__name__}: {str(exc)[:200]}"
            continue
        results[str(c)] = round(t, 6)
        if best_t is None or t < best_t:
            best, best_t = c, t
    if best is None:
        return default
    cache[full_key] = list(best) if isinstance(best, tuple) else best
    cache.setdefault("__measurements__", {})[full_key] = results
    _store(cache)
    return best


def cached_winner(key: str):
    """Return the cached winner for ``key`` on this device, or None.

    Cache-only lookup: never measures.  Lets callers (bench.py) adopt a
    tile geometry a previous autotune pass measured on this same chip
    without paying the sweep themselves."""
    full_key = f"{device_kind()}|{key}"
    hit = _load().get(full_key)
    return tuple(hit) if isinstance(hit, list) else hit


def pair2_build_opts(mode: str) -> dict:
    """Decode a pair2 variant tag ("tight+zprof+i16", "" = base) into
    make_fused_pair2_aa keyword options.  Tags compose with '+':
    tight (congruent minimal DMA windows), zprof (map-DMA skip on
    z-profile tiles), i16/i8 (narrow map windows)."""
    opts: dict = {}
    for part in filter(None, mode.split("+")):
        if part == "tight":
            opts["window"] = "tight"
        elif part == "zprof":
            opts["zprofile"] = True
        elif part in ("i16", "i8"):
            opts["map_mode"] = part
        else:
            raise ValueError(f"unknown pair2 variant tag {part!r}")
    return opts


def normalize_pair2(c):
    """(tx, ty, K[, mode]) -> (tx, ty, K, mode) with mode defaulting to ""
    (round-3 cache entries are 3-tuples)."""
    c = tuple(c)
    return c if len(c) == 4 else c + ("",)


def pair2_cache_key(domain, cfg, store_dtype=None) -> str:
    """Autotune-cache key for the pair2 kernel on a lattice shape.  Half
    storage (store_dtype) tunes separately: its VMEM economics (f windows
    at half size) shift the optimal tile geometry."""
    import jax.numpy as jnp

    shape = "x".join(str(s) for s in domain.shape)
    # "hk5": kernel-generation tag - round-5 in-kernel halos changed the
    # cost model, so winners measured against the old kernel must not be
    # adopted (stale entries keep their old keys and simply go unused)
    key = f"pair2|hk5|{shape}|{cfg.compute_dtype.__name__}"
    if store_dtype is not None:
        key += f"|store={jnp.dtype(store_dtype).name}"
    return key


def tune_pair2(cfg, domain, candidates=None, iters: int = 10,
               store_dtype=None):
    """Pick the best (tx, ty, K, mode) for the one-kernel A-A pair on this
    chip.  ``mode`` selects the round-4 HBM-traffic variants (see
    pair2_build_opts); Mosaic-rejected variants are skipped, so untested
    DMA geometries (congruent offsets, int8 map windows) are safe to sweep.
    ``store_dtype`` sweeps the half-storage build under its own cache key.

    Used by bench.py with TNL_BENCH_AUTOTUNE=1; the default (8, 32, 2)
    base kernel is the round-3 sweep winner on the v5e bench chip
    (docs/PERFORMANCE.md).
    """
    import jax.numpy as jnp

    from tnl_lbm_tpu.kernels.fused_aa import make_fused_pair2_aa, to_padded_aa
    from tnl_lbm_tpu.sim import initial_dfs

    default = (8, 32, 2, "")
    if candidates is None:
        # Tile geometry: (8,32,2) is the historical v5e winner; wider-ty
        # candidates trade cross-program prefetch depth (K) for window-read
        # amplification; tx=16 halves the x-halo share now that the round-3
        # cascade spills less.  The VMEM fitter shrinks anything oversized,
        # making every timing safe.
        candidates = [(8, 32, 2), (8, 16, 2), (8, 32, 3), (4, 32, 2),
                      (8, 16, 4), (8, 64, 1), (8, 64, 2), (4, 64, 2),
                      (16, 32, 2), (16, 32, 1)]
        # Round-4 traffic variants on the strongest geometries.  Ordered
        # cheapest-risk first; each is an independent Mosaic bet (tight =
        # congruent DMA offsets, zprof = conditional map DMA, i16/i8 =
        # narrow-int windows) so failures fall back gracefully.
        candidates += [
            (8, 32, 2, "zprof"),
            (8, 32, 2, "tight"),
            (8, 32, 2, "tight+zprof"),
            (8, 32, 2, "i16"),
            (8, 32, 2, "tight+zprof+i16"),
            (8, 32, 2, "tight+zprof+i8"),
            (8, 64, 1, "tight+zprof"),
            (16, 32, 1, "tight+zprof"),
            (16, 32, 2, "tight+zprof"),
        ]
    candidates = [normalize_pair2(c) for c in candidates]
    candidates = [c for c in candidates
                  if domain.shape[0] % c[0] == 0 and domain.shape[1] % c[1] == 0]

    def time_candidate(c):
        tx, ty, k, mode = normalize_pair2(c)
        pair = make_fused_pair2_aa(cfg, domain, tile=(tx, ty),
                                   tiles_per_program=k,
                                   store_dtype=store_dtype,
                                   **pair2_build_opts(mode))
        force = jnp.zeros((3,), cfg.compute_dtype)
        step = jax.jit(lambda f: pair(f, 0.02, force=force)[0])
        f = to_padded_aa(initial_dfs(cfg, domain), domain.periodic,
                     store_dtype=store_dtype)
        f = step(f)
        float(f[0, 2, 8, 0])  # compile + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            f = step(f)
        assert float(f[0, 2, 8, 0]) == float(f[0, 2, 8, 0])
        return (time.perf_counter() - t0) / iters

    return normalize_pair2(autotune(
        pair2_cache_key(domain, cfg, store_dtype),
        candidates, time_candidate, default))
