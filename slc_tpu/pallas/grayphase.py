"""Fused Pallas Gray+phase absolute-decode kernel (the frame-0 hot path).

One kernel executes the reference's whole ``CalculateFirst`` compute —

  per-bit Gray binarization (CDecodeGray.cpp:150-176) -> XOR-prefix
  gray->binary (replacing the LUT file, CDecodeGray.cpp:120-125) ->
  N-step phase extraction (CDecodePhase.cpp:48-80) -> Gray-assisted
  unwrap merge (CCalculation.cpp:561-587) -> rational triangulation +
  back-projection (CCalculation.cpp:666-785)

— per row block, all intermediates in VMEM. The composite XLA path
(slc_tpu.pipeline.decode_first_frame) materializes the bit planes, the
gray/binary maps, the wrapped phase, and the merge result in HBM; fused,
the step reads the image stack ((2B+N) u8) and writes x, y, z, P
(4 f32). The triangulation tables C/D are regenerated in-kernel from
their six bilinear coefficients (mathx.lin_coeffs) instead of being
streamed — 8 B/px of HBM traffic removed (round 4).

Everything is elementwise, so the grid is a 1-D row-block sweep with
plain pipelined BlockSpecs — no halos, no manual DMA. ``atan2`` uses the
polynomial from :mod:`slc_tpu.pallas.mathx` (Mosaic has no atan
lowering).
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
            gray_bits: int, n_steps: int, gray_period: float,
            phase_period: float,
            min_mod_sq: Optional[float], fov_min: float, fov_max: float,
            block_h: int):
    b = gray_bits
    n = n_steps

    # --- Gray decode: bit k = (pattern > inverse), LSB-first
    # (CDecodeGray.cpp:159-171, :192-199). Widen u8 -> i32 for compares.
    gray = None
    for k in range(b):
        pat = img_ref[2 * k].astype(jnp.int32)
        inv = img_ref[2 * k + 1].astype(jnp.int32)
        bit = jnp.where(pat > inv, jnp.int32(1 << k), jnp.int32(0))
        gray = bit if gray is None else gray | bit
    # XOR-prefix inverse Gray map (slc_tpu.ops.gray.gray_to_binary).
    binary = gray
    shift = 1
    while shift < b:
        binary = binary ^ (binary >> shift)
        shift <<= 1
    gray_coord = binary.astype(jnp.float32) * jnp.float32(gray_period)

    # --- N-step phase extraction (ops.phase.phase_sincos semantics).
    if n == 4:
        # 4-step closed form: factors are exactly {1,0,-1,0}/{0,1,0,-1}
        # so the accumulators are integer image differences
        # (CDecodePhase.cpp:59-62; bit-identical to the general loop —
        # f32 halves of u8 sums are exact).
        s = (img_ref[2 * b + 0].astype(jnp.int32)
             - img_ref[2 * b + 2].astype(jnp.int32)
             ).astype(jnp.float32) * jnp.float32(0.5)
        c = (img_ref[2 * b + 1].astype(jnp.int32)
             - img_ref[2 * b + 3].astype(jnp.int32)
             ).astype(jnp.float32) * jnp.float32(0.5)
    else:
        s = None
        c = None
        for k in range(n):
            ck = math.cos(_TWO_PI * k / n)
            sk = math.sin(_TWO_PI * k / n)
            img = img_ref[2 * b + k].astype(jnp.int32).astype(jnp.float32)
            if abs(ck) >= 1e-12:
                t = img * jnp.float32(ck * 2.0 / n)
                s = t if s is None else s + t
            if abs(sk) >= 1e-12:
                t = img * jnp.float32(sk * 2.0 / n)
                c = t if c is None else c + t
    period = phase_period                    # T = 2 Gray bins
    ang = _atan2(s, c, bounded=True,
                 recip=newton_recip)
    ang = jnp.where(ang < 0, ang + jnp.float32(_TWO_PI), ang)
    pix = ang * jnp.float32(period / _TWO_PI) + 0.5
    pix = jnp.where(pix > period, pix - period, pix)

    # --- Gray-assisted merge (CCalculation.cpp:561-587): Gray-bin parity
    # picks the half-period; guard bands fix adjacent-bin wraps.
    t = jnp.float32(period)
    even = (binary & 1) == 0
    ph_even = jnp.where(pix > 0.75 * t, pix - t, pix)
    ph_odd = jnp.where(pix < 0.25 * t, pix + t, pix) - 0.5 * t
    pu = gray_coord + jnp.where(even, ph_even, ph_odd)

    if min_mod_sq is not None:
        mod_sq = s * s + c * c
        pu = jnp.where(mod_sq > jnp.float32(min_mod_sq), pu, 0.0)

    # --- Rational triangulation + FOV mask + back-projection
    # (CCalculation.cpp:666-785; ops.triangulate semantics).
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
    # Fast reciprocal + one Newton step: measured ~2^-22.7 relative
    # (~1.5 f32 ulp; mathx.newton_recip), f32-exact
    # for the [fov_min, fov_max] window, cheaper than the VPU divide.
    z = (b_s * pu - a_s) * newton_recip(denom)
    z = jnp.where((pu == 0) | (z < fov_min) | (z > fov_max), 0.0, z)

    inv_fx = 1.0 / fx                  # scalar once per block
    inv_fy = 1.0 / fy
    x_out[:] = z * ((ucol - cx) * inv_fx)
    y_out[:] = z * ((vrow - cy) * inv_fy)
    z_out[:] = z
    pu_out[:] = pu


@functools.partial(jax.jit,
                   static_argnames=("gray_bits", "n_steps", "gray_period",
                                    "phase_period",
                                    "min_modulation", "fov_min", "fov_max",
                                    "block_h", "interpret"))
def grayphase_decode_pallas(images: jax.Array, c: jax.Array, d: jax.Array,
                            scalars: jax.Array, *,
                            gray_bits: int, gray_period: float,
                            phase_period: float, n_steps: int = 4,
                            min_modulation: Optional[float] = None,
                            fov_min: float = 10.0, fov_max: float = 100.0,
                            block_h: int = 32, interpret: bool = False
                            ) -> Tuple[jax.Array, ...]:
    """Fused Gray+phase absolute decode. ``images`` is the concatenated
    (2*gray_bits + n_steps, H, W) uint8 stack — Gray pattern/inverse
    pairs first, then the phase-shift fringes; ``scalars`` is a (1, 8)
    f32 SMEM array [A, B, fx, fy, cx, cy, 0, 0]. ``c``/``d`` are the
    (H, W) triangulation tables; only their six bilinear coefficients
    enter the kernel — the maps are never transferred. Returns
    (x, y, z, proj_u)."""
    if n_steps < 3:
        # With n < 3 every sin(2*pi*k/n) term vanishes and the sine
        # accumulator would stay None (trace-time crash in _atan2);
        # 3 is also the information-theoretic minimum for phase shifting.
        raise ValueError(f"n_steps must be >= 3, got {n_steps}")
    nf, h, w = images.shape
    assert nf == 2 * gray_bits + n_steps, (nf, gray_bits, n_steps)
    grid = -(-h // block_h)

    kernel = functools.partial(
        _kernel, gray_bits=gray_bits, n_steps=n_steps,
        gray_period=float(gray_period), phase_period=float(phase_period),
        min_mod_sq=(None if min_modulation is None
                    else float(min_modulation) ** 2),
        fov_min=fov_min, fov_max=fov_max, block_h=block_h)

    cu, cv, c0 = lin_coeffs(c)
    du, dv, d0 = lin_coeffs(d)
    scal16 = jnp.concatenate([
        scalars[0, :6],
        jnp.stack([cu, cv, c0, du, dv, d0]).astype(jnp.float32),
        jnp.zeros((4,), jnp.float32)]).reshape(1, 16)

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
