"""Isolate pair2's DMA pipeline from its compute: same grid, same windows,
same cross-program prefetch + async output structure, but the "compute" is
just an interior copy.  If this runs at the traffic floor (~12 ms for the
(8,32) pattern), the pipeline overlaps correctly and the gap to the full
kernel is pure cascade time; if it is much slower, the pipeline stalls.
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

Q, X, Y, Z = 27, 256, 256, 256


def make(tx, ty, K, compute_passes: int):
    wx, wy = tx + 4, ty + 16
    nx_t, ny_t = X // tx, Y // ty
    n_tiles = nx_t * ny_t
    n_prog = n_tiles // K

    def kernel(fpad_hbm, fout_ref, *rest):
        fscr = rest[:K]
        outs = rest[K : 2 * K]
        sem = rest[2 * K]
        p = pl.program_id(0)

        def in_dma(tau, t):
            i, jt = tau // ny_t, tau % ny_t
            return pltpu.make_async_copy(
                fpad_hbm.at[:, pl.ds(i * tx, wx), pl.ds(jt * ty, wy), :],
                fscr[t], sem.at[t, 0])

        def out_dma(tau, t):
            i, jt = tau // ny_t, tau % ny_t
            return pltpu.make_async_copy(
                outs[t],
                fout_ref.at[:, pl.ds(2 + i * tx, tx), pl.ds(8 + jt * ty, ty), :],
                sem.at[t, 1])

        @pl.when(p == 0)
        def _():
            for t in range(K):
                in_dma(t, t).start()

        for t in range(K):
            tau = p * K + t

            @pl.when(p > 0)
            def _(t=t, tau=tau):
                out_dma(tau - K, t).wait()

            in_dma(tau, t).wait()
            x = fscr[t][:, 2 : 2 + tx, 8 : 8 + ty, :]
            for _ in range(compute_passes):
                x = x * 1.000001 + 1e-12
            outs[t][...] = x
            out_dma(tau, t).start()

            @pl.when(p + 1 < n_prog)
            def _(t=t, tau=tau):
                in_dma(tau + K, t).start()

        @pl.when(p == n_prog - 1)
        def _():
            for t in range(K):
                out_dma(p * K + t, t).wait()

    return pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, X + 4, Y + 16, Z), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Q, wx, wy, Z), jnp.float32) for _ in range(K)]
        + [pltpu.VMEM((Q, tx, ty, Z), jnp.float32) for _ in range(K)]
        + [pltpu.SemaphoreType.DMA((K, 2))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
    )


def main():
    fpad = jnp.zeros((Q, X + 4, Y + 16, Z), jnp.float32) + 1.0
    for tx, ty, K, passes in [(8, 32, 2, 0), (8, 32, 2, 20), (8, 32, 2, 60),
                              (8, 32, 3, 0), (16, 32, 2, 0)]:
        try:
            call = make(tx, ty, K, passes)
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
            print(f"({tx},{ty}) K={K} passes={passes:3d}: {dt*1e3:7.2f} ms "
                  f"({gb:.1f} GB -> {gb/dt:5.1f} GB/s)", flush=True)
        except Exception as e:
            print(f"({tx},{ty}) K={K} passes={passes}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()


def make_compute_only(tx, ty, K, compute_passes: int):
    """Same loop structure, but real DMAs only on the first program: the
    rest compute on stale VMEM data.  Isolates compute from DMA."""
    wx, wy = tx + 4, ty + 16
    nx_t, ny_t = X // tx, Y // ty
    n_tiles = nx_t * ny_t
    n_prog = n_tiles // K

    def kernel(fpad_hbm, fout_ref, *rest):
        fscr = rest[:K]
        outs = rest[K : 2 * K]
        sem = rest[2 * K]
        p = pl.program_id(0)

        @pl.when(p == 0)
        def _():
            for t in range(K):
                d = pltpu.make_async_copy(
                    fpad_hbm.at[:, pl.ds(0, wx), pl.ds(0, wy), :],
                    fscr[t], sem.at[t, 0])
                d.start()
                d.wait()

        for t in range(K):
            x = fscr[t][:, 2 : 2 + tx, 8 : 8 + ty, :]
            for _ in range(compute_passes):
                x = x * 1.000001 + 1e-12
            outs[t][...] = x

        @pl.when(p == n_prog - 1)
        def _():
            for t in range(K):
                d = pltpu.make_async_copy(
                    outs[t], fout_ref.at[:, pl.ds(2, tx), pl.ds(8, ty), :],
                    sem.at[t, 1])
                d.start()
                d.wait()

    return pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, X + 4, Y + 16, Z), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Q, wx, wy, Z), jnp.float32) for _ in range(K)]
        + [pltpu.VMEM((Q, tx, ty, Z), jnp.float32) for _ in range(K)]
        + [pltpu.SemaphoreType.DMA((K, 2))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
    )


def main2():
    import time as _t
    fpad = jnp.zeros((Q, X + 4, Y + 16, Z), jnp.float32) + 1.0
    for tx, ty, K, passes in [(8, 32, 2, 20), (8, 32, 2, 60)]:
        call = make_compute_only(tx, ty, K, passes)
        fn = jax.jit(lambda x, call=call: call(x))
        out = fn(fpad); float(out[0, 2, 8, 0])
        t0 = _t.perf_counter()
        for _ in range(20):
            out = fn(fpad)
        float(out[0, 2, 8, 0])
        dt = (_t.perf_counter() - t0) / 20
        print(f"compute-only ({tx},{ty}) K={K} passes={passes:3d}: {dt*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__" and "--co" in sys.argv:
    main2()
