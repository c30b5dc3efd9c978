"""Probe: Element-indexed BlockSpecs (overlapping halo windows) through the
automatic pallas_call pipeline — does DMA/compute overlap materialize?

Compare against probe_pair2_pipeline.py (manual DMA: compute was perfectly
additive, i.e. zero overlap).
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas.core import Element

sys.path.insert(0, "/root/repo")

Q, X, Y, Z = 27, 256, 256, 256


def make(tx, ty, compute_passes: int):
    wx, wy = tx + 4, ty + 16
    nx_t, ny_t = X // tx, Y // ty
    n_tiles = nx_t * ny_t

    def kernel(fwin_ref, fout_ref):
        x = fwin_ref[:, 2 : 2 + tx, 8 : 8 + ty, :]
        for _ in range(compute_passes):
            x = x * 1.000001 + 1e-12
        fout_ref[...] = x

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (Element(Q), Element(wx), Element(wy), Element(Z)),
                lambda p: (0, (p // ny_t) * tx, (p % ny_t) * ty, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (Element(Q), Element(tx), Element(ty), Element(Z)),
            lambda p: (0, 2 + (p // ny_t) * tx, 8 + (p % ny_t) * ty, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Q, X + 4, Y + 16, Z), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
    )
    return call


def main():
    fpad = jnp.zeros((Q, X + 4, Y + 16, Z), jnp.float32) + 1.0
    for tx, ty, passes in [(8, 32, 0), (8, 32, 20), (8, 32, 60), (16, 32, 0)]:
        try:
            call = make(tx, ty, passes)
            fn = jax.jit(lambda x, call=call: call(x))
            out = fn(fpad)
            float(out[0, 2, 8, 0])
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(fpad)
            float(out[0, 2, 8, 0])
            dt = (time.perf_counter() - t0) / 20
            n_t = (X // tx) * (Y // ty)
            gb = (Q * (tx + 4) * (ty + 16) * Z * 4 * n_t + Q * X * Y * Z * 4) / 1e9
            print(f"element ({tx},{ty}) passes={passes:3d}: {dt*1e3:7.2f} ms "
                  f"({gb:.1f} GB -> {gb/dt:5.1f} GB/s)", flush=True)
        except Exception as e:
            print(f"element ({tx},{ty}) passes={passes}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
