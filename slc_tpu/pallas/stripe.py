"""Fused Pallas stripe-tracking kernel.

One kernel fuses the reference's whole StripRegression chain
(DynaFrame/CCalculation.cpp:789-891): vertical 21-row box sum ->
horizontal windowed max/min scan -> sub-pixel parabolic refine ->
interior masking. The XLA path (slc_tpu.ops.stripe) materializes ~20
full-image f32 intermediates in HBM; here each row-block tile stays in
VMEM: HBM traffic is one uint8 frame read + two f32 offset-map writes.

Grid: 1-D over row blocks; every tile spans the full (lane-padded) image
width, so the horizontal scan needs no column halo and the only overlap
is the 2r rows of the box sum, re-read from HBM per tile (the caller
pads the frame by r rows top/bottom).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slc_tpu.pallas.mathx import sliding_extrema, sliding_row_sum


def _stripe_kernel(frame_hbm, sw_ref, sb_ref, scratch, sem, *,
                   window: int, subpixel: bool, frac_bits: int,
                   block_h: int, img_h: int, img_w: int, pad_w: int,
                   ext_rows: int):
    r = window // 2
    i = pl.program_id(0)
    n = pl.num_programs(0)

    # Double-buffered input DMA: scratch slot i%2 holds block i (the
    # DMA was started by the PREVIOUS grid step, so it rode under that
    # step's compute); this step starts block i+1 into the other slot.
    # DMA slice rows must be tiling-aligned; ext_rows is block_h + 2r
    # rounded up to 32 (the int8 sublane tile), the tail rows unused.
    def dma(slot, blk):
        return pltpu.make_async_copy(
            frame_hbm.at[pl.ds(blk * block_h, ext_rows), :],
            scratch.at[slot], sem.at[slot])

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma(1 - slot, i + 1).start()

    dma(slot, i).wait()
    # Box-sum and tournament run in int32 end to end (exact for u8
    # sums); f32 appears only inside the sub-pixel ratio.
    f = scratch[slot].astype(jnp.int32)

    # Vertical box sum for the block's rows: out row k (global
    # i*block_h + k) sums padded rows k .. k+2r. Hierarchical
    # decomposition (log2 adds); exact for the integer-valued pixel
    # sums regardless of association.
    vs = sliding_row_sum(f, 0, block_h, window)

    # Interior mask in global coordinates (CCalculation.cpp:801,817),
    # built from broadcastable (block_h, 1) / (1, pad_w) index vectors
    # so the comparisons run on vectors, not full tiles.
    row0 = i * block_h
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (block_h, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, pad_w), 1)
    interior = (((rows >= r) & (rows < img_h - r))
                & ((cols >= r) & (cols < img_w - r)))
    vs = jnp.where(interior, vs, 0)
    out_w = sw_ref.shape[1]

    # Horizontal windowed extrema over offsets [-r, r) with the
    # center-first tie-breaking (CCalculation.cpp:828-891) via the
    # packed log-depth tournament (mathx.sliding_extrema) — exact for
    # the integer-valued uint8 box sums; lane rolls keep everything in
    # VMEM.
    def roll(a, k):
        # a[i+k] with the non-negative shift pltpu.roll needs.
        return pltpu.roll(a, (-k) % pad_w, axis=1)

    best_max_idx, best_min_idx = sliding_extrema(
        vs, window, pad_w, roll, subpixel, frac_bits,
        recip=lambda x: pl.reciprocal(x, approx=True))
    zero = jnp.zeros(vs.shape, jnp.float32)
    # Write exact-width blocks: cropping AFTER the kernel would make the
    # padded outputs XLA temps, which this backend stack-allocates in
    # VMEM (OOM at 2 MP for full-image f32 pairs).
    sw_ref[:] = jnp.where(interior, best_max_idx, zero)[:, :out_w]
    sb_ref[:] = jnp.where(interior, best_min_idx, zero)[:, :out_w]


@functools.partial(jax.jit,
                   static_argnames=("window", "subpixel", "block_h",
                                    "frac_bits", "interpret"))
def stripe_regression_pallas(frame: jax.Array, window: int = 21,
                             subpixel: bool = True, block_h: int = 64,
                             frac_bits: int = 0,
                             interpret: bool = False
                             ) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for slc_tpu.ops.stripe.stripe_regression.

    frame: (H, W) uint8/float. Returns (strip_w, strip_b) float32.

    ``frac_bits`` > 0 = fast sub-pixel mode (mathx.sliding_extrema):
    the parabola fraction rides the packed tournament word quantized to
    ``frac_bits`` bits instead of as an exact f32 carry — same winner,
    fraction quantized to ~1/2^frac_bits px, tournament at carry-free
    cost.
    """
    r = window // 2
    h, w = frame.shape
    pad_w = -(-w // 128) * 128
    hb = -(-h // block_h) * block_h
    ext_rows = -(-(block_h + 2 * r) // 32) * 32
    # Bottom padding so the last block's ext_rows read stays in bounds.
    bot = (hb - h) + r + (ext_rows - block_h - 2 * r)
    f = jnp.pad(frame, ((r, bot), (0, pad_w - w)))

    kernel = functools.partial(
        _stripe_kernel, window=window, subpixel=subpixel,
        frac_bits=frac_bits, block_h=block_h, img_h=h, img_w=w,
        pad_w=pad_w, ext_rows=ext_rows)

    grid = (hb // block_h,)
    # Exact (h, w) outputs: pallas clips ragged edge blocks, and exact
    # shapes keep the outputs program results (HBM), not VMEM temps.
    out_spec = pl.BlockSpec((block_h, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    sw, sb = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((h, w), jnp.float32),
                   jax.ShapeDtypeStruct((h, w), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((2, ext_rows, pad_w), frame.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(f)
    return sw, sb
