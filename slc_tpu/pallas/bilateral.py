"""Fused Pallas bilateral depth filter.

The XLA path (slc_tpu.ops.filters.bilateral_filter) evaluates the
(2r+1)^2 stencil with jnp.roll per tap — ~18 full-image HBM round
trips at 2 MP (2.6 ms). Here each row block stays in VMEM: HBM traffic
is one f32 read + one f32 write (8 B/px), with the 9 taps, the
exponential weights and the hole logic all on the VPU.

Border semantics: the block DMA is zero-padded top/bottom and the lane
rolls wrap into the zero column padding; with the hole-aware weighting
(production default — z == 0 means invalid) those zeros carry zero
weight, so borders behave as "missing neighbors" rather than the XLA
path's wraparound. Interior results are identical
(tests/test_filters.py); the reference applies the filter to depth
maps whose borders are masked anyway (depthMapUtils.cpp:179).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(img_hbm, out_ref, scr, sem, *, radius: int, inv2sc: float,
            inv2ss: float, block_h: int, pad_w: int, s_rows: int):
    r = radius
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * block_h, s_rows), :], scr, sem)
    dma.start()
    dma.wait()
    x = scr[:]

    core = x[r:r + block_h, :]
    valid = core != 0.0
    num = jnp.zeros((block_h, pad_w), jnp.float32)
    den = jnp.zeros((block_h, pad_w), jnp.float32)
    for dy in range(-r, r + 1):
        row = x[r + dy:r + dy + block_h, :]
        for dx in range(-r, r + 1):
            v = pltpu.roll(row, (-dx) % pad_w, axis=1)   # v[j]=row[j+dx]
            # exp2 with log2(e) folded into the compile-time
            # constants: saves exp's internal scale multiply.
            w = jnp.exp2((v - core) * (v - core) * jnp.float32(inv2sc)
                         + jnp.float32((dy * dy + dx * dx) * inv2ss))
            w = jnp.where(v != 0.0, w, 0.0)      # hole-aware
            num = num + w * v
            den = den + w
    out = num / jnp.maximum(den, 1e-12)
    out = jnp.where(valid, out, 0.0)
    out_ref[:] = out[:, :out_ref.shape[1]]


@functools.partial(jax.jit,
                   static_argnames=("radius", "sigma_color", "sigma_space",
                                    "block_h", "interpret"))
def bilateral_filter_pallas(img: jax.Array, radius: int = 1,
                            sigma_color: float = 10.0,
                            sigma_space: float = 25.0,
                            block_h: int = 64,
                            interpret: bool = False) -> jax.Array:
    """Hole-aware bilateral filter, fused single-HBM-pass. (H, W)
    float/any -> (H, W) f32. Matches ops.filters.bilateral_filter
    (hole_aware=True) on interior pixels; see module docstring for the
    border difference."""
    r = radius
    h, w = img.shape
    pad_w = -(-w // 128) * 128
    if pad_w - w < r:
        # The lane rolls wrap at pad_w; the zero padding columns are
        # what realizes the "out-of-image neighbors are missing" border
        # rule. A width that is an exact lane-tile multiple (e.g. the
        # reference's 1280) would otherwise wrap the left/right image
        # borders into each other with nonzero weight.
        pad_w += 128
    hb = -(-h // block_h) * block_h
    s_rows = -(-(block_h + 2 * r) // 8) * 8
    bot = (hb - h) + r + (s_rows - block_h - 2 * r)
    f = jnp.pad(img.astype(jnp.float32), ((r, bot), (0, pad_w - w)))

    _LOG2E = 1.4426950408889634          # exp(x) = exp2(x * log2 e)
    kernel = functools.partial(
        _kernel, radius=r,
        inv2sc=-0.5 / (sigma_color * sigma_color) * _LOG2E,
        inv2ss=-0.5 / (sigma_space * sigma_space) * _LOG2E,
        block_h=block_h, pad_w=pad_w, s_rows=s_rows)

    return pl.pallas_call(
        kernel,
        grid=(hb // block_h,),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block_h, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((s_rows, pad_w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(f)
