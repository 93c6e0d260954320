"""Fused Pallas phase-lock kernel (LEGACY / comparison baseline).

Round 5 superseded this two-kernel path: `pallas/dynamic_lock.py` runs
the whole locked frame (tracking + this correction) in ONE kernel and
is what `dynamic.dynamic_step` dispatches. This kernel is kept as the
measured comparison point (PERF.md round-4 vs round-5 fusion numbers)
and parity-tested; new lock features land in dynamic_lock + ops/demod
first and are mirrored here only through the shared mathx helpers.

The XLA path of phase-locked tracking (slc_tpu.ops.demod applied after
the fused dynamic step) makes ~13 full-image HBM passes — separable
triangle sums for the DC estimate and the two quadrature correlations,
plus the trig/arccos refinement — measured at +0.60 ms on top of the
0.23 ms step at 2 MP. This kernel runs the whole correction in ONE
pass: read the frame (u8) and the integrated prediction P (f32), write
the corrected P and the re-triangulated x, y, z — 21 B/px.

Layout: 1-D grid over row blocks. The triangle low-pass (box of
``win`` applied twice per axis) needs 2*(win_v - 1) halo rows for the
correlations and the same again for the DC field that feeds them, so
each block DMAs bh + 4*(win_v - 1) rows (manual copies, alignment-
rounded). The lane axis is fully resident per block; lane-direction
box sums use the power-of-two doubling of `sliding_row_sum` expressed
with ``pltpu.roll``, with the zero pad region re-masked between passes
(rolls wrap, so a pass's output contaminates the pad, which the next
pass would read back in at the right image edge). Border
normalization matches ops.demod exactly: sums are divided by the
triangle weight of in-image taps (separable wv*wu, computed on 0/1
masks by the same filters).

Math parity with ops.demod.stripe_phase_correction: same triangle
kernel, same per-pixel arccos refinement (acos via atan2(sqrt(1-c^2),
c) — Mosaic lowers sin/cos/sqrt but not acos), same amp/hole gating;
atan2 and the divides use the Newton-refined fast reciprocal
(measured ~2^-22.7, mathx.newton_recip), the documented kernel error
budget.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slc_tpu.ops.demod import GATE_BAND
from slc_tpu.pallas.mathx import (atan2 as _atan2, lin_coeffs,
                                  newton_recip as _newton_recip)

_TWO_PI = 2.0 * math.pi


def _box_rows(x, base, n_out, win):
    """Vertical sliding box sum over rows (power-of-two doubling):
    out[k] = sum_{j<win} x[base+k+j]."""
    sums = {1: x}
    p = 1
    while 2 * p <= win:
        prev = sums[p]
        sums[2 * p] = prev[:prev.shape[0] - p] + prev[p:]
        p *= 2
    out = None
    off = base
    while p >= 1:
        if win & p:
            seg = sums[p][off:off + n_out]
            out = seg if out is None else out + seg
            off += p
        p //= 2
    return out


def _kernel(scal_ref, frame_hbm, pu_hbm,
            pu_out, z_out, x_out, y_out,
            f_scr, pu_scr, sem, *,
            period: float, win_u: int, win_v: int, amp_floor: float,
            max_carrier_gradient: float, fov_min: float,
            fov_max: float, block_h: int, img_h: int,
            img_w: int, pad_w: int, ext_rows: int, halo: int):
    i = pl.program_id(0)
    bh = block_h
    rv = win_v - 1                      # halo per triangle application

    copies = [
        pltpu.make_async_copy(
            frame_hbm.at[pl.ds(i * bh, ext_rows), :], f_scr, sem.at[0]),
        pltpu.make_async_copy(
            pu_hbm.at[pl.ds(i * bh, ext_rows), :], pu_scr, sem.at[1]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    n1 = bh + 2 * rv                    # rows after the DC stage
    colmask = (jax.lax.broadcasted_iota(jnp.int32, (1, pad_w), 1)
               < img_w).astype(jnp.float32)

    def box_lanes(x, win):
        from slc_tpu.pallas.mathx import sliding_lane_sum
        return sliding_lane_sum(
            x, win, pad_w, colmask,
            lambda a, k: pltpu.roll(a, k % pad_w, axis=1))

    def tri(x, base, n_out):
        """Separable triangle sum: box(win) twice per axis; rows
        consume 2*rv of halo, lanes are fully resident. Output row k
        is centered on input row base + k + rv."""
        x = box_lanes(box_lanes(x, win_u), win_u)
        return _box_rows(_box_rows(x, base, n_out + win_v - 1, win_v),
                         0, n_out, win_v)

    # Row-mask weights (exact border normalization, ops.demod parity).
    row0 = i * bh - 2 * rv              # global row of f row 0
    rows_ext = row0 + jax.lax.broadcasted_iota(jnp.int32,
                                               (ext_rows, 1), 0)
    rowmask = ((rows_ext >= 0) & (rows_ext < img_h)
               ).astype(jnp.float32)
    wu = box_lanes(box_lanes(colmask, win_u), win_u)     # (1, pad_w)

    def wv_of(base, n_out):
        return _box_rows(_box_rows(rowmask, base, n_out + win_v - 1,
                                   win_v), 0, n_out, win_v)

    # Out-of-image rows and pad lanes are zero already (wrapper
    # zero-pads); the cast is the only per-pixel input op.
    f = f_scr[:].astype(jnp.int32).astype(jnp.float32)

    # Stage 1: local DC for the mid rows [rv, rv + n1) of the scratch
    # frame (tri output k is centered on scratch row k + rv).
    wgt1 = wv_of(0, n1) * wu
    dc = tri(f, 0, n1) * _newton_recip(jnp.maximum(wgt1, 1e-6))
    # Out-of-image rows must stay identically zero (the XLA path's iac
    # is zero-padded): f is zero there but dc is not.
    iac = (f[rv:rv + n1] - dc) * rowmask[rv:rv + n1]

    pu_mid = pu_scr[rv:rv + n1] * colmask
    phi = pu_mid * jnp.float32(_TWO_PI / period)
    cphi = jnp.cos(phi)
    sphi = jnp.sin(phi)

    # Stage 2: correlations on the core rows. (A row-stacked variant
    # sharing one set of lane box passes between the two quadrature
    # fields measured NEUTRAL on-chip — the kernel's floor is the
    # transcendentals + DMA, not the box sums.)
    wgt2 = wv_of(rv, bh) * wu                            # (bh, pad_w)
    inv_w2 = _newton_recip(jnp.maximum(wgt2, 1e-6))
    cc = tri(iac * cphi, 0, bh)
    ss = tri(iac * sphi, 0, bh)
    amp = jax.lax.sqrt(cc * cc + ss * ss) * inv_w2
    dphi = _atan2(-ss, cc, bounded=True, recip=_newton_recip)

    # Per-pixel arccos refinement (ops.demod per_pixel semantics).
    iac_core = iac[rv:rv + bh]
    cospx = jnp.clip(iac_core * jnp.float32(0.5)
                     * _newton_recip(jnp.maximum(amp, 1e-6)),
                     -1.0, 1.0)
    phimag = _atan2(jax.lax.sqrt(jnp.maximum(1.0 - cospx * cospx, 0.0)),
                    cospx, bounded=True, recip=_newton_recip)
    pu_core = pu_mid[rv:rv + bh]
    phi_ref = pu_core * jnp.float32(_TWO_PI / period) + dphi

    def wrap(x):
        return x - jnp.float32(_TWO_PI) * jnp.round(
            x * jnp.float32(1.0 / _TWO_PI))

    d_pos = wrap(phimag - phi_ref)
    d_neg = wrap(-phimag - phi_ref)
    d_px = jnp.where(jnp.abs(d_pos) <= jnp.abs(d_neg), d_pos, d_neg)
    conf = 1.0 - cospx * cospx
    dp = (dphi + conf * d_px) * jnp.float32(period / _TWO_PI)
    ok = (amp > jnp.float32(amp_floor)) & (pu_core > 0)
    # Per-block carrier-consistency gate (shared helper; see
    # pallas/dynamic_lock.py and ops/demod.py).
    from slc_tpu.pallas.mathx import carrier_gate_ok
    gate = carrier_gate_ok(dphi, ok, img_w, max_carrier_gradient,
                           lambda a, k: pltpu.roll(a, k % pad_w,
                                                   axis=1))
    pu_new = pu_core + jnp.where(ok & gate, dp, 0.0)

    # Triangulation (C/D from bilinear coefficients) + back-projection.
    a_s = scal_ref[0, 0]
    b_s = scal_ref[0, 1]
    fx = scal_ref[0, 2]
    fy = scal_ref[0, 3]
    cx = scal_ref[0, 4]
    cy = scal_ref[0, 5]
    cu, cv, c0 = scal_ref[0, 6], scal_ref[0, 7], scal_ref[0, 8]
    du, dv, d0 = scal_ref[0, 9], scal_ref[0, 10], scal_ref[0, 11]
    out_w = pu_out.shape[1]
    ucol = jax.lax.broadcasted_iota(jnp.int32, (1, pad_w), 1
                                    ).astype(jnp.float32)
    vrow = (i * bh + jax.lax.broadcasted_iota(jnp.int32, (bh, 1), 0)
            ).astype(jnp.float32)
    c_blk = cu * ucol + (cv * vrow + c0)
    d_blk = du * ucol + (dv * vrow + d0)
    denom = c_blk - d_blk * pu_new
    z = (b_s * pu_new - a_s) * _newton_recip(denom)
    z = jnp.where((pu_new == 0) | (z < fov_min) | (z > fov_max), 0.0, z)

    pu_out[:] = pu_new[:, :out_w]
    z_out[:] = z[:, :out_w]
    x_out[:] = (z * ((ucol - cx) * (1.0 / fx)))[:, :out_w]
    y_out[:] = (z * ((vrow - cy) * (1.0 / fy)))[:, :out_w]


@functools.partial(jax.jit,
                   static_argnames=("period", "win_u", "win_v",
                                    "amp_floor", "max_carrier_gradient",
                                    "fov_min", "fov_max",
                                    "block_h", "interpret"))
def phase_lock_pallas(frame: jax.Array, pu_pred: jax.Array,
                      c: jax.Array, d: jax.Array, scalars: jax.Array,
                      *, period: float, win_u: int = 9, win_v: int = 9,
                      amp_floor: float = 8.0,
                      max_carrier_gradient: float = 2e-3,
                      fov_min: float = 10.0, fov_max: float = 100.0,
                      block_h: int = GATE_BAND, interpret: bool = False
                      ) -> Tuple[jax.Array, ...]:
    """Fused phase-lock correction + re-triangulation.

    frame (H, W) uint8, pu_pred (H, W) f32 (the integrated prediction);
    ``c``/``d``/``scalars`` as in the other fused kernels (only the
    bilinear coefficients of c/d enter). Returns
    (pu_corrected, z, x, y)."""
    h, w = frame.shape
    rv = win_v - 1
    halo = 2 * rv
    # Lane pad: each box pass's rolls wrap, contaminating the last
    # win_u - 1 pad lanes, which the NEXT pass's right-edge reads could
    # touch — a gap of >= 2*win_u lanes keeps the read region and the
    # contaminated region disjoint (the pad itself is re-zeroed by the
    # colmask after every pass).
    pad_w = -(-(w + 2 * win_u) // 128) * 128
    hb = -(-h // block_h) * block_h
    ext_rows_f = -(-(block_h + 2 * halo) // 32) * 32
    # frame and pu use the same ext_rows (f32 sublane tile 8 divides 32)
    top = halo
    bot = ext_rows_f - block_h - halo + (hb - h)
    f_pad = jnp.pad(frame, ((top, bot), (0, pad_w - w)))
    pu_pad = jnp.pad(pu_pred.astype(jnp.float32),
                     ((top, bot), (0, pad_w - w)))

    cu, cv, c0 = lin_coeffs(c)
    du, dv, d0 = lin_coeffs(d)
    scal16 = jnp.concatenate([
        scalars[0, :6],
        jnp.stack([cu, cv, c0, du, dv, d0]).astype(jnp.float32),
        jnp.zeros((4,), jnp.float32)]).reshape(1, 16)

    kernel = functools.partial(
        _kernel, period=float(period), win_u=win_u, win_v=win_v,
        amp_floor=float(amp_floor),
        max_carrier_gradient=float(max_carrier_gradient),
        fov_min=fov_min, fov_max=fov_max,
        block_h=block_h, img_h=h, img_w=w, pad_w=pad_w,
        ext_rows=ext_rows_f, halo=halo)

    out_spec = pl.BlockSpec((block_h, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((h, w), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(hb // block_h,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(out_spec,) * 4,
        out_shape=(shp,) * 4,
        scratch_shapes=[
            pltpu.VMEM((ext_rows_f, pad_w), frame.dtype),
            pltpu.VMEM((ext_rows_f, pad_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(scal16, f_pad, pu_pad)
