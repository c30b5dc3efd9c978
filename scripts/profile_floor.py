"""Memory-floor probe: copy-permute kernel with the even-step's exact I/O
pattern but no collision math.  Separates DMA/bandwidth floor from the
cumulant-cascade compute cost in the fused kernels."""
import sys
if "-h" in sys.argv or "--help" in sys.argv:
    print(__doc__ or "")
    raise SystemExit(0)
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

n = 256
Q = 27
dt = jnp.float32


def run_case(ex, ey, macro=True):
    def kernel(f_ref, fout_ref, rho_ref, u_ref):
        # permuted write + trivial "macro" (sum) - same traffic, no cascade
        rows = [f_ref[Q - 1 - q] for q in range(Q)]
        fout_ref[...] = jnp.stack(rows)
        if macro:
            s = rows[0]
            for q in range(1, Q):
                s = s + rows[q]
            rho_ref[...] = s
            u_ref[...] = jnp.stack([s, s, s])

    dummy = (8, 8, 128)
    call = pl.pallas_call(
        kernel,
        grid=(n // ex, n // ey),
        in_specs=[pl.BlockSpec((Q, ex, ey, n), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((Q, ex, ey, n), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ex, ey, n) if macro else dummy,
                         (lambda i, j: (i, j, 0)) if macro else (lambda i, j: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ex, ey, n) if macro else (3,) + dummy,
                         (lambda i, j: (0, i, j, 0)) if macro else (lambda i, j: (0, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, n, n, n), dt),
            jax.ShapeDtypeStruct((n, n, n) if macro else dummy, dt),
            jax.ShapeDtypeStruct((3, n, n, n) if macro else (3,) + dummy, dt),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )

    jf = jax.jit(lambda f: call(f)[0], donate_argnums=0)
    f = jnp.zeros((Q, n, n, n), dt) + 0.1
    f = jf(f)
    float(f[0, 0, 0, 0])
    t0 = time.perf_counter()
    iters = 50
    for _ in range(iters):
        f = jf(f)
    float(f[0, 0, 0, 0])
    dtms = (time.perf_counter() - t0) / iters * 1e3
    gb = (Q + Q + (1 + 3) * macro) * n**3 * 4 / 1e9
    print(f"copy-permute ({ex},{ey}) macro={macro}: {dtms:6.2f} ms  "
          f"({gb:.2f} GB -> {gb/dtms*1e3:.0f} GB/s)", flush=True)


for case in [(8, 8, True), (2, 256, True), (4, 128, True), (1, 256, True),
             (2, 256, False), (16, 32, True)]:
    try:
        run_case(*case)
    except Exception as e:
        print(f"{case} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
