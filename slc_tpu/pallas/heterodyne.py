"""Fused Pallas heterodyne decode kernel (BASELINE config 2 hot path).

One kernel executes the whole multi-frequency pipeline —

  N-step phase extraction per frequency (atan2) -> modulation validity
  -> beat-cascade unwrap -> rational triangulation -> back-projection

— per row block, keeping every intermediate in VMEM. The math is
identical to the composite XLA path (slc_tpu.ops.phase +
slc_tpu.ops.unwrap.heterodyne_unwrap + slc_tpu.ops.triangulate, which
cite the reference semantics: fringe model CDecodePhase.cpp:59-62,
triangulation CCalculation.cpp:666-785). The XLA pipeline materializes
~20 full-image f32 intermediates in HBM; fused, the step reads the
fringe stack (F*N u8) and writes x, y, z, P (4 f32) — 28 B/px.

The triangulation tables C(v,u), D(v,u) are NOT streamed from HBM
(round 4; they were 8 of 36 B/px): both are exactly bilinear in the
pixel coordinates (calib.build_tables), so the wrapper extracts their
six linear coefficients (full-span samples, mathx.lin_coeffs) and the kernel
regenerates each block's slab from broadcast index vectors — two
fused multiply-adds instead of two HBM streams (measured 7% faster
end to end at 2 MP).

Everything is elementwise per pixel, so the grid is a 1-D row-block
sweep with plain pipelined BlockSpecs — no halos, no manual DMA (a
manually double-buffered variant and a stacked-frequency atan2 variant
were both measured SLOWER than Mosaic's automatic pipeline; see
PERF.md round-4 ablation).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slc_tpu.pallas.mathx import (atan2 as _atan2, lin_coeffs,
                                  newton_recip)

_TWO_PI = 2.0 * math.pi


def _kernel(scal_ref, img_ref,
            x_out, y_out, z_out, pu_out, *,
            periods: Tuple[float, ...], extent: float, n_steps: int,
            min_mod_sq: Optional[float], fov_min: float, fov_max: float,
            block_h: int, ablate: Optional[str] = None):
    n = n_steps

    def _finish(v):
        # Ablation exit: write the running value to every output so the
        # DMA footprint matches the full kernel (roofline-comparable).
        x_out[:] = v
        y_out[:] = v
        z_out[:] = v
        pu_out[:] = v

    if ablate == "dma":
        # DMA + casts only: sum the images.
        acc = None
        for k in range(len(periods) * n):
            t = img_ref[k].astype(jnp.int32)
            acc = t if acc is None else acc + t
        _finish(acc.astype(jnp.float32))
        return

    fracs = []  # wrapped fractional phase u_f = (x mod T_f) / T_f
    mod_sq = None
    for f, period in enumerate(periods):
        if n == 4:
            # 4-step closed form (the reference's own case,
            # CDecodePhase.cpp:59-62): the cos/sin factors are exactly
            # {1, 0, -1, 0} / {0, 1, 0, -1}, so the accumulators are
            # INTEGER image differences — two u8->f32 cast chains per
            # frequency instead of four, and no per-image multiplies.
            s_i = (img_ref[f * n + 0].astype(jnp.int32)
                   - img_ref[f * n + 2].astype(jnp.int32))
            c_i = (img_ref[f * n + 1].astype(jnp.int32)
                   - img_ref[f * n + 3].astype(jnp.int32))
            s = s_i.astype(jnp.float32) * jnp.float32(0.5)
            c = c_i.astype(jnp.float32) * jnp.float32(0.5)
        else:
            s = None
            c = None
            for k in range(n):
                ck = math.cos(_TWO_PI * k / n)
                sk = math.sin(_TWO_PI * k / n)
                if abs(ck) < 1e-12 and abs(sk) < 1e-12:
                    continue
                # Mosaic has no direct u8->f32 cast; widen via i32.
                img = img_ref[f * n + k].astype(jnp.int32
                                                ).astype(jnp.float32)
                if abs(ck) >= 1e-12:
                    t = img * jnp.float32(ck * 2.0 / n)
                    s = t if s is None else s + t
                if abs(sk) >= 1e-12:
                    t = img * jnp.float32(sk * 2.0 / n)
                    c = t if c is None else c + t
        # atan2 -> wrapped px in (0, T], reference convention
        # (CDecodePhase.cpp:67-74), as in ops.phase.wrapped_phase_to_pixels.
        # Mosaic has no atan lowering; use the polynomial atan2 (mathx)
        # with the fast-reciprocal fold ratio (angle error ~1e-4 rad,
        # ~2e-5 of a fringe period — far below the 1-gray-level photon
        # noise the accuracy benches already include).
        ang = _atan2(s, c, bounded=True,
                     recip=newton_recip)
        ang = jnp.where(ang < 0, ang + jnp.float32(_TWO_PI), ang)
        pix = ang * jnp.float32(period / _TWO_PI) + 0.5
        pix = jnp.where(pix > period, pix - period, pix)
        fracs.append(pix * jnp.float32(1.0 / period))
        if min_mod_sq is not None:
            m = s * s + c * c
            mod_sq = m if mod_sq is None else jnp.minimum(mod_sq, m)

    if ablate == "phase":
        acc = fracs[0]
        for fr in fracs[1:]:
            acc = acc + fr
        _finish(acc)
        return

    # Beat pyramid (ops.unwrap.heterodyne_unwrap semantics): fractional
    # beats u_ij = frac(u_i - u_j) with period Ti*Tj/|Tj-Ti|; cascade to
    # one coarse level, then unwrap back down the left spine. All
    # per-level divisors are compile-time constants, so every divide is
    # a constant-reciprocal multiply.
    def wrap_delta(a, b):
        d = a - b
        return d - jnp.floor(d)

    pyramid = [(list(fracs), list(periods))]
    while len(pyramid[-1][0]) > 1:
        lf, lp = pyramid[-1]
        nf, np_ = [], []
        for i in range(len(lf) - 1):
            nf.append(wrap_delta(lf[i], lf[i + 1]))
            np_.append(lp[i] * lp[i + 1] / abs(lp[i + 1] - lp[i]))
        pyramid.append((nf, np_))

    x = pyramid[-1][0][0] * jnp.float32(pyramid[-1][1][0])
    for lf, lp in reversed(pyramid[:-1]):
        u, p = lf[0], jnp.float32(lp[0])
        k = jnp.round(x * jnp.float32(1.0 / lp[0]) - u)
        x = (k + u) * p
    pu = x - jnp.float32(extent) * jnp.floor(x * jnp.float32(1.0 / extent))

    if min_mod_sq is not None:
        pu = jnp.where(mod_sq > jnp.float32(min_mod_sq), pu, 0.0)

    if ablate == "cascade":
        _finish(pu)
        return

    # Rational triangulation + FOV mask + back-projection
    # (CCalculation.cpp:666-785; ops.triangulate semantics). C/D are
    # regenerated from their bilinear coefficients (module docstring);
    # the per-pixel rational divide uses the fast reciprocal plus ONE
    # Newton step r' = r*(2 - d*r): measured ~2^-22.7 relative
    # (mathx.newton_recip) — f32-exact for the
    # [10, 100] depth window, at a fraction of the VPU divide's cost.
    a_s = scal_ref[0, 0]
    b_s = scal_ref[0, 1]
    fx = scal_ref[0, 2]
    fy = scal_ref[0, 3]
    cx = scal_ref[0, 4]
    cy = scal_ref[0, 5]
    cu, cv, c0 = scal_ref[0, 6], scal_ref[0, 7], scal_ref[0, 8]
    du, dv, d0 = scal_ref[0, 9], scal_ref[0, 10], scal_ref[0, 11]

    i = pl.program_id(0)
    bh, bw = z_out.shape
    # Broadcastable index vectors: (1, w) columns, (bh, 1) global rows.
    ucol = jax.lax.broadcasted_iota(jnp.int32, (1, bw), 1
                                    ).astype(jnp.float32)
    vrow = (i * block_h
            + jax.lax.broadcasted_iota(jnp.int32, (bh, 1), 0)
            ).astype(jnp.float32)
    c_blk = cu * ucol + (cv * vrow + c0)
    d_blk = du * ucol + (dv * vrow + d0)
    denom = c_blk - d_blk * pu
    z = (b_s * pu - a_s) * newton_recip(denom)
    z = jnp.where((pu == 0) | (z < fov_min) | (z > fov_max), 0.0, z)

    inv_fx = 1.0 / fx                  # scalar once per block
    inv_fy = 1.0 / fy
    x_out[:] = z * ((ucol - cx) * inv_fx)
    y_out[:] = z * ((vrow - cy) * inv_fy)
    z_out[:] = z
    pu_out[:] = pu


@functools.partial(jax.jit,
                   static_argnames=("periods", "extent", "n_steps",
                                    "min_modulation", "fov_min", "fov_max",
                                    "block_h", "interpret", "ablate"))
def heterodyne_decode_pallas(images: jax.Array, c: jax.Array, d: jax.Array,
                             scalars: jax.Array, *,
                             periods: Tuple[float, ...], extent: float,
                             n_steps: int = 4,
                             min_modulation: Optional[float] = 2.0,
                             fov_min: float = 10.0, fov_max: float = 100.0,
                             block_h: int = 16, interpret: bool = False,
                             ablate: Optional[str] = None
                             ) -> Tuple[jax.Array, ...]:
    """Fused heterodyne decode. ``images`` is (F*n_steps, H, W) uint8,
    finest frequency first; ``scalars`` is a (1, 8) f32 SMEM array
    [A, B, fx, fy, cx, cy, 0, 0]. Returns (x, y, z, proj_u).

    ``c``/``d`` are the (H, W) triangulation tables; only their six
    bilinear coefficients enter the kernel (module docstring) — the
    maps themselves are never transferred.

    ``ablate`` (bench/diagnostic only, same DMA footprint as the full
    kernel): "dma" = image casts + output writes only; "phase" = + the
    three atan2 phase extractions; "cascade" = + beat-pyramid unwrap;
    None = full (+ triangulation/back-projection)."""
    if n_steps < 3:
        # n < 3 leaves the sine accumulator empty (every sin(2*pi*k/n)
        # is ~0) and is under-determined for phase shifting anyway.
        raise ValueError(f"n_steps must be >= 3, got {n_steps}")
    nf, h, w = images.shape
    assert nf == len(periods) * n_steps
    grid = -(-h // block_h)

    cu, cv, c0 = lin_coeffs(c)
    du, dv, d0 = lin_coeffs(d)
    scal16 = jnp.concatenate([
        scalars[0, :6],
        jnp.stack([cu, cv, c0, du, dv, d0]).astype(jnp.float32),
        jnp.zeros((4,), jnp.float32)]).reshape(1, 16)

    kernel = functools.partial(
        _kernel, periods=tuple(float(p) for p in periods),
        extent=float(extent), n_steps=n_steps,
        min_mod_sq=(None if min_modulation is None
                    else float(min_modulation) ** 2),
        fov_min=fov_min, fov_max=fov_max, block_h=block_h,
        ablate=ablate)

    blk = pl.BlockSpec((block_h, w), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((h, w), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nf, block_h, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(blk,) * 4,
        out_shape=(shp,) * 4,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(scal16, images)
