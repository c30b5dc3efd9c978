"""Probe: do sublane-unaligned HBM->VMEM DMA *source* starts work, and at
what speed?  The round-1 kernels assumed Y-axis DMA windows must start
8-aligned, which forces ty+16-row windows in the A-A odd/pair kernels.  If
an unaligned source start (dst is always VMEM offset 0) runs at full speed,
windows shrink to ty+8 (or ty+4) rows.

Run on the real TPU: python scripts/probe_dma_align.py
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

Q, X, Y, Z = 27, 256, 256, 256
TX, TY = 16, 32


def make_copy(y_off: int, wy: int, label: str, dst_off: int = 0):
    """Grid over (X//TX, Y//TY); each program DMAs the [Q, TX+4, wy, Z]
    window starting at (i*TX, jt*TY + y_off) into VMEM sublane offset
    ``dst_off`` and writes the interior tile.

    ``dst_off == y_off % 8`` probes the CONGRUENT-offset hypothesis: the
    Mosaic DMA rule may be src % 8 == dst % 8 (same within-tile sublane
    phase) rather than src % 8 == 0 - if congruent copies work, the A-A
    pair kernel's input windows shrink from ty+16 to ty+4 rows (the
    ``window="tight"`` variant in kernels/fused_aa.py)."""
    wx = TX + 4

    def kernel(fpad_hbm, out_ref, scr, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        d = pltpu.make_async_copy(
            fpad_hbm.at[:, pl.ds(i * TX, wx), pl.ds(j * TY + y_off, wy), :],
            scr.at[:, :, dst_off : dst_off + wy, :],
            sem,
        )
        d.start()
        d.wait()
        # interior rows sit at (2, dst_off + (interior_y_origin - window_start))
        yo = dst_off + 8 - y_off
        out_ref[...] = scr[:, 2 : 2 + TX, yo : yo + TY, :]

    wy_buf = ((dst_off + wy + 7) // 8) * 8
    call = pl.pallas_call(
        kernel,
        grid=(X // TX, Y // TY),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((Q, TX, TY, Z), lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, X, Y, Z), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Q, wx, wy_buf, Z), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
    )
    return call, label


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, flush=True)
    fpad = jnp.zeros((Q, X + 4, Y + 16, Z), jnp.float32) + 1.5

    variants = [
        (0, TY + 16, "aligned start, ty+16 (status quo)", 0),
        (6, TY + 8, "start+6 (unaligned), ty+8", 0),
        (6, TY + 4, "start+6 (unaligned), ty+4 (ragged size)", 0),
        (8, TY + 8, "aligned start+8, ty+8 (control)", 0),
        # congruent-offset variants: dst sublane offset == src offset mod 8
        (6, TY + 4, "start+6 -> dst+6 (congruent), ty+4", 6),
        (6, TY + 8, "start+6 -> dst+6 (congruent), ty+8", 6),
        (2, TY + 4, "start+2 -> dst+2 (congruent), ty+4", 2),
    ]
    for y_off, wy, label, dst_off in variants:
        try:
            call, _ = make_copy(y_off, wy, label, dst_off)
            fn = jax.jit(lambda x, call=call: call(x))
            out = fn(fpad)
            v = float(out[0, 0, 0, 0])
            assert v == 1.5, v
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(fpad)
            float(out[0, 0, 0, 0])
            dt = (time.perf_counter() - t0) / 20
            gb = (Q * (TX + 4) * wy * Z * 4 * (X // TX) * (Y // TY)
                  + Q * X * Y * Z * 4) / 1e9
            print(f"{label:48s} {dt*1e3:7.2f} ms  {gb/dt:6.1f} GB/s", flush=True)
        except Exception as e:
            print(f"{label:48s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
