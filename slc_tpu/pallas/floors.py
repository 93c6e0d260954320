"""DMA-pattern floor microkernels.

A kernel's honest speed-of-light is NOT the theoretical HBM peak over
its logical byte footprint: the real pattern — small halo-overlapped
row-block reads, multiple output streams, per-block descriptor setup —
caps achievable bandwidth well below peak (measured 430-620 GB/s vs
819 GB/s on v5e at 2 MP, block_h 64). These microkernels reproduce a
compute kernel's exact DMA pattern with the compute deleted, so
bench.py can report "% of measured floor" next to "% of HBM peak" (the
methodology the round-4 heterodyne ablation established; VERDICT r4
item 2 extends it to stripe/bilateral).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("halo", "n_out", "block_h"))
def halo_block_floor(img: jax.Array, halo: int = 10, n_out: int = 2,
                     block_h: int = 64):
    """Read (H, W) ``img`` in row blocks of ``block_h`` with ``halo``
    extra rows per side (double-buffered manual DMA, the stripe /
    bilateral pattern) and write ``n_out`` full-size f32 outputs.
    Returns the outputs; time it for the pattern's floor."""
    h, w = img.shape
    pad_w = -(-w // 128) * 128
    tile = 32 if img.dtype == jnp.uint8 else 8
    ext = -(-(block_h + 2 * halo) // tile) * tile
    hb = -(-h // block_h) * block_h

    def kern(f_hbm, *refs):
        out_refs = refs[:n_out]
        scr, sem = refs[n_out], refs[n_out + 1]
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def dma(slot, blk):
            return pltpu.make_async_copy(
                f_hbm.at[pl.ds(blk * block_h, ext), :], scr.at[slot],
                sem.at[slot])

        slot = jax.lax.rem(i, 2)

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            dma(1 - slot, i + 1).start()

        dma(slot, i).wait()
        x = scr[slot][:block_h, :]
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.int32)     # Mosaic has no direct u8->f32
        x = x.astype(jnp.float32)
        for k, o in enumerate(out_refs):
            o[:] = x[:, :o.shape[1]] + jnp.float32(k)

    f = jnp.pad(img, ((halo, (hb - h) + ext - block_h - halo),
                      (0, pad_w - w)))
    return pl.pallas_call(
        kern,
        grid=(hb // block_h,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec((block_h, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),) * n_out,
        out_shape=(jax.ShapeDtypeStruct((h, w), jnp.float32),) * n_out,
        scratch_shapes=[
            pltpu.VMEM((2, ext, pad_w), img.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(f)
