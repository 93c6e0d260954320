"""Fully-fused Pallas dynamic-step kernel.

One kernel per row-block executes the reference's whole per-frame loop
body (CCalculation::CalculateOther body, CCalculation.cpp:221-316):

  box-sum -> windowed extrema (+ sub-pixel) -> deltaP select -> 3x3
  blur -> gradient scale -> P integration -> rational triangulation ->
  back-projection

keeping every intermediate in VMEM. The XLA pipeline materializes each
stage's full-image arrays in HBM (~4.2 ms at 2 MP); fused, the step
moves roughly: reads frame (u8) + prev strips/P (3 f32) + tables c,d
(2 f32), writes P', strips', z, x, y (6 f32) — ~110 MB, a few hundred
microseconds at v5e HBM bandwidth.

Layout: 1-D grid over row blocks spanning the full (lane-padded) width;
all row-halo reads come from arrays the wrapper pads by PAD=8 rows so
every DMA offset stays sublane-aligned. Column neighborhoods use lane
rolls, identical to the XLA path (slc_tpu.ops.stripe semantics,
including interior masks in global coordinates).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slc_tpu.pallas.mathx import (sliding_extrema, sliding_row_sum,
                                  lin_coeffs, newton_recip)

PAD = 8  # row padding so halo DMA offsets stay 8/32-aligned


def _kernel(scalars, frame_hbm, pw_hbm, pb_hbm, pu_hbm,
            pu_out, sw_out, sb_out, z_out, x_out, y_out,
            f_scr, pw_scr, pb_scr, pu_scr, sem, *,
            window: int, subpixel: bool, frac_bits: int,
            scale_gradient: bool, robust: bool, block_h: int,
            img_h: int, img_w: int, pad_w: int, f_rows: int,
            s_rows: int):
    r = window // 2
    i = pl.program_id(0)
    bh = block_h

    # --- DMA all halo reads (frame + previous state) -----------------
    copies = [
        pltpu.make_async_copy(
            frame_hbm.at[pl.ds(i * bh, f_rows), :], f_scr, sem.at[0]),
        pltpu.make_async_copy(
            pw_hbm.at[pl.ds(i * bh, s_rows), :], pw_scr, sem.at[1]),
        pltpu.make_async_copy(
            pb_hbm.at[pl.ds(i * bh, s_rows), :], pb_scr, sem.at[2]),
        pltpu.make_async_copy(
            pu_hbm.at[pl.ds(i * bh, s_rows), :], pu_scr, sem.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    # Box sums + tournament in int32 (exact for u8 sums); f32 only in
    # the sub-pixel ratio and everything downstream of the extrema.
    f = f_scr[:].astype(jnp.int32)

    # --- stripe tracking on rows [i*bh - 1, i*bh + bh + 1) -----------
    # The DMA'd halo is PAD=8 rows (alignment), but the compute only
    # needs 1 halo row (the 3x3 blur); the windowed-extrema scan is the
    # kernel's VPU hot spot, so restricting it from bh+2*PAD to bh+2
    # rows is a direct ~25-45% saving. Strip row j of the compute
    # domain = global row i*bh - 1 + j = scratch row OFF + j.
    OFF = PAD - 1                     # first compute row in scratch
    n_strip = bh + 2
    vs = sliding_row_sum(f, OFF, n_strip, window)

    row0 = i * bh - 1
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (n_strip, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, pad_w), 1)
    # Vector masks, broadcast at use: full-tile iotas are a measured
    # Mosaic cost (tpu-lowering note); the AND still materializes per
    # use, but the iota/compare arithmetic runs on one row/column.
    interior = ((rows >= r) & (rows < img_h - r)
                & (cols >= r) & (cols < img_w - r))
    vs = jnp.where(interior, vs, 0)
    sw, sb = sliding_extrema(
        vs, window, pad_w,
        lambda a, k: pltpu.roll(a, (-k) % pad_w, axis=1), subpixel,
        frac_bits, recip=lambda x: pl.reciprocal(x, approx=True))
    sw = jnp.where(interior, sw, 0.0)
    sb = jnp.where(interior, sb, 0.0)

    # --- deltaP select + 3x3 blur (CCalculation.cpp:595-650) ---------
    d_b = pb_scr[OFF:OFF + n_strip, :] - sb
    d_w = pw_scr[OFF:OFF + n_strip, :] - sw
    dp1 = jnp.where(jnp.abs(d_b) < jnp.abs(d_w), d_b, d_w)
    if robust:
        # Mean-combine where the two stripe families agree — cancels
        # the min-|d| rectification bias (ops/stripe.select_delta_p).
        agree = jnp.abs(d_b - d_w) <= 1.0
        dp1 = jnp.where(agree, 0.5 * (d_b + d_w), dp1)
    # 3x3 mean on the core rows (compute rows [1, 1 + bh)): rows via
    # slicing, cols via lane rolls (wrap touches only interior-masked
    # zeros, identical to the XLA path).
    acc = jnp.zeros((bh, pad_w), jnp.float32)
    for dy in (-1, 0, 1):
        row_slice = dp1[1 + dy:1 + dy + bh, :]
        acc = acc + row_slice \
            + pltpu.roll(row_slice, 1, axis=1) \
            + pltpu.roll(row_slice, pad_w - 1, axis=1)
    dp = acc * jnp.float32(1.0 / 9.0)

    pu_core = pu_scr[PAD:PAD + bh, :]
    if scale_gradient:
        g = 0.5 * (pltpu.roll(pu_core, pad_w - 1, axis=1)
                   - pltpu.roll(pu_core, 1, axis=1))
        dp = dp * jnp.clip(g, 0.2, 5.0)
    pu_new = pu_core + dp                       # CCalculation.cpp:652-660

    # --- triangulation + back-projection (CCalculation.cpp:666-785) --
    # C/D regenerated from their bilinear coefficients (mathx.
    # lin_coeffs; 8 B/px of HBM streams removed in round 4); the
    # rational divide is a fast reciprocal + one Newton step
    # (measured ~2^-22.7 relative, ~1.5 f32 ulp; mathx.newton_recip).
    a = scalars[0, 0]
    b = scalars[0, 1]
    fx = scalars[0, 2]
    fy = scalars[0, 3]
    cx = scalars[0, 4]
    cy = scalars[0, 5]
    fov_min = scalars[0, 6]
    fov_max = scalars[0, 7]
    cu, cv, c0 = scalars[0, 8], scalars[0, 9], scalars[0, 10]
    du, dv, d0 = scalars[0, 11], scalars[0, 12], scalars[0, 13]

    out_w = pu_out.shape[1]
    ucol = jax.lax.broadcasted_iota(jnp.int32, (1, out_w), 1
                                    ).astype(jnp.float32)
    vrow = (i * bh
            + jax.lax.broadcasted_iota(jnp.int32, (bh, 1), 0)
            ).astype(jnp.float32)
    c_blk = cu * ucol + (cv * vrow + c0)
    d_blk = du * ucol + (dv * vrow + d0)
    denom = c_blk - d_blk * pu_new[:, :out_w]
    z = (b * pu_new[:, :out_w] - a) * newton_recip(denom)
    hole = pu_new[:, :out_w] == 0
    z = jnp.where(hole | (z < fov_min) | (z > fov_max), 0.0, z)

    inv_fx = 1.0 / fx                  # scalar once per block
    inv_fy = 1.0 / fy
    x_out[:] = z * ((ucol - cx) * inv_fx)
    y_out[:] = z * ((vrow - cy) * inv_fy)
    z_out[:] = z
    pu_out[:] = pu_new[:, :out_w]
    sw_out[:] = sw[1:1 + bh, :out_w]
    sb_out[:] = sb[1:1 + bh, :out_w]


@functools.partial(jax.jit,
                   static_argnames=("window", "subpixel", "scale_gradient",
                                    "robust", "fov_min", "fov_max",
                                    "block_h", "frac_bits", "interpret"))
def dynamic_step_pallas(frame: jax.Array, prev_sw: jax.Array,
                        prev_sb: jax.Array, prev_pu: jax.Array,
                        c: jax.Array, d: jax.Array, scalars: jax.Array,
                        window: int = 21, subpixel: bool = True,
                        scale_gradient: bool = True, robust: bool = True,
                        fov_min: float = 10.0, fov_max: float = 100.0,
                        block_h: int = 64, frac_bits: int = 0,
                        interpret: bool = False
                        ) -> Tuple[jax.Array, ...]:
    """Fused dynamic step. ``scalars`` is a (1, 8) f32 array
    [A, B, fx, fy, cx, cy, fov_min, fov_max] (SMEM-prefetched; the
    wrapper appends C/D's six bilinear coefficients — the (H, W)
    ``c``/``d`` maps themselves are never transferred).

    Returns (proj_u', strip_w', strip_b', z, x, y), each (H, W) f32.
    """
    r = window // 2
    h, w = frame.shape
    pad_w = -(-w // 128) * 128
    hb = -(-h // block_h) * block_h

    # Strip rows per block: block_h + 2*PAD; frame rows needed:
    # + 2r more, rounded to the int8 sublane tile (32).
    f_rows = -(-(block_h + 2 * PAD + 2 * r) // 32) * 32
    s_rows = block_h + 2 * PAD

    f_pad = jnp.pad(frame, ((r + PAD, f_rows), (0, pad_w - w)))
    def pad_state(x):
        return jnp.pad(x.astype(jnp.float32),
                       ((PAD, PAD + (hb - h) + PAD), (0, pad_w - w)))
    pw_pad = pad_state(prev_sw)
    pb_pad = pad_state(prev_sb)
    pu_pad = pad_state(prev_pu)

    kernel = functools.partial(
        _kernel, window=window, subpixel=subpixel, frac_bits=frac_bits,
        scale_gradient=scale_gradient, robust=robust, block_h=block_h,
        img_h=h, img_w=w, pad_w=pad_w, f_rows=f_rows, s_rows=s_rows)

    cu, cv, c0 = lin_coeffs(c)
    du, dv, d0 = lin_coeffs(d)
    scal16 = jnp.concatenate([
        scalars[0, :8],
        jnp.stack([cu, cv, c0, du, dv, d0]).astype(jnp.float32),
        jnp.zeros((2,), jnp.float32)]).reshape(1, 16)

    # Index maps receive the scalar-prefetch ref as an extra arg.
    out_spec = pl.BlockSpec((block_h, w), lambda i, s: (i, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((h, w), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(hb // block_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # frame (padded)
            pl.BlockSpec(memory_space=pl.ANY),   # prev strip_w
            pl.BlockSpec(memory_space=pl.ANY),   # prev strip_b
            pl.BlockSpec(memory_space=pl.ANY),   # prev proj_u
        ],
        out_specs=(out_spec,) * 6,
        scratch_shapes=[
            pltpu.VMEM((f_rows, pad_w), frame.dtype),
            pltpu.VMEM((s_rows, pad_w), jnp.float32),
            pltpu.VMEM((s_rows, pad_w), jnp.float32),
            pltpu.VMEM((s_rows, pad_w), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(shp,) * 6,
        interpret=interpret,
    )(scal16, f_pad, pw_pad, pb_pad, pu_pad)
