"""Stripe-extremum tracking for dynamic frames.

Reference behavior (DynaFrame/CCalculation.cpp:789-891), per frame:

1. ``valSum(h, w)``: vertical 21-row box sum of the raw camera image per
   column, computed only on the interior region rows/cols
   [r, H-r) x [r, W-r) with r = window//2; zero elsewhere
   (CCalculation.cpp:797-823, rolling-DP in the reference).
2. Per interior pixel, scan horizontal offsets i in [-r, r) (note: +r is
   EXCLUDED) over valSum(h, w+i), tracking a running max and min that are
   initialized with the center value and updated on strict inequality
   (CCalculation.cpp:828-850). The resulting offsets are stripW (bright
   stripe) and stripB (dark stripe), zero on the border.

Tie-breaking is therefore: the center (offset 0) wins any tie; otherwise
the smallest offset in scan order attaining the extremum wins. The XLA
version below replicates this exactly with a static unrolled offset scan
(2r fused select ops); the Pallas fused version lives in
``slc_tpu.pallas.stripe_tracker``.

Known reference edge behavior, reproduced faithfully: near the left/right
interior boundary the scan window reads zero border values of valSum, so
the dark-stripe offset can lock onto the zero border (valSum >= 0).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def box_sum_vertical_raw(frame: jax.Array, window: int) -> jax.Array:
    """Vertical ``window``-row box sum centered per row, zero-padded at
    the top/bottom edges, no interior masking. Shared core of the local
    and tile-parallel paths.

    Computed via an exclusive cumulative sum: box(h) = S(h+r+1) - S(h-r)
    where S is the 0-prepended row cumsum of the zero-padded frame. Sums
    of uint8 values are exactly representable in float32, so this is
    bit-identical to the reference's rolling DP
    (CCalculation.cpp:797-823).
    """
    r = window // 2
    h, w = frame.shape
    f = frame.astype(jnp.float32)
    fp = jnp.pad(f, ((r, r), (0, 0)))
    s = jnp.concatenate(
        [jnp.zeros((1, w), jnp.float32), jnp.cumsum(fp, axis=0)], axis=0)
    return s[window:, :] - s[:-window, :]           # (h, w), centered


def box_sum_vertical(frame: jax.Array, window: int) -> jax.Array:
    """Vertical ``window``-row box sum, interior-only, border zeroed
    (CCalculation.cpp:797-823 semantics: rows/cols within r of the edge
    are zero, CCalculation.cpp:801,817)."""
    r = window // 2
    h, w = frame.shape
    box = box_sum_vertical_raw(frame, window)
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = (row >= r) & (row < h - r) & (col >= r) & (col < w - r)
    return jnp.where(interior, box, 0.0)


def windowed_extrema_raw(val_sum: jax.Array, window: int,
                         subpixel: bool = False
                         ) -> Tuple[jax.Array, jax.Array]:
    """Unmasked per-pixel extremum offsets — shared core of the local and
    tile-parallel paths (callers apply the interior mask in the proper
    global coordinate frame)."""
    r = window // 2
    h, w = val_sum.shape

    # Lane-axis rolls are cheap on the VPU; a post-hoc gather
    # (take_along_axis) is ~50x slower on TPU, so the parabola
    # neighbors vm/vp are tracked during the scan instead.
    def rolled(i):
        return jnp.roll(val_sum, -i, axis=1)

    best_max = val_sum
    best_max_idx = jnp.zeros_like(val_sum)
    best_min = val_sum
    best_min_idx = jnp.zeros_like(val_sum)
    if subpixel:
        mm = rolled(-1)
        mp = rolled(1)
        max_vm, max_vp = mm, mp
        min_vm, min_vp = mm, mp
    v_prev = rolled(-r - 1)
    v = rolled(-r)
    for i in range(-r, r):
        # valSum(h, w+i); interior pixels never index out of range, the
        # roll wrap only touches border pixels that are masked below.
        v_next = rolled(i + 1)
        upd_max = v > best_max
        best_max = jnp.where(upd_max, v, best_max)
        best_max_idx = jnp.where(upd_max, jnp.float32(i), best_max_idx)
        upd_min = v < best_min
        best_min = jnp.where(upd_min, v, best_min)
        best_min_idx = jnp.where(upd_min, jnp.float32(i), best_min_idx)
        if subpixel:
            max_vm = jnp.where(upd_max, v_prev, max_vm)
            max_vp = jnp.where(upd_max, v_next, max_vp)
            min_vm = jnp.where(upd_min, v_prev, min_vm)
            min_vp = jnp.where(upd_min, v_next, min_vp)
        v_prev, v = v, v_next

    if subpixel:
        def refine(idx, v0, vm, vp):
            denom = vm - 2.0 * v0 + vp
            frac = jnp.where(jnp.abs(denom) > 1e-6,
                             0.5 * (vm - vp) / denom, 0.0)
            return idx + jnp.clip(frac, -0.5, 0.5)
        best_max_idx = refine(best_max_idx, best_max, max_vm, max_vp)
        best_min_idx = refine(best_min_idx, best_min, min_vm, min_vp)

    return best_max_idx, best_min_idx


def windowed_extrema(val_sum: jax.Array, window: int,
                     subpixel: bool = False
                     ) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel offsets of the max/min of val_sum over horizontal offsets
    [-r, r), reference scan semantics (CCalculation.cpp:828-891).

    ``subpixel`` (framework improvement over the reference's integer
    offsets): refine each extremum by a parabolic fit through its two
    horizontal neighbors, offset += (v[-1]-v[+1]) / (2*(v[-1]-2v0+v[+1])),
    clamped to +-0.5. Integer offsets quantize each frame's stripe motion
    to whole camera pixels, which is the dominant drift source of the
    deltaP integration at sub-pixel per-frame motion.

    Returns (strip_w, strip_b): float32 offset maps (bright, dark), zero
    outside the interior.
    """
    r = window // 2
    h, w = val_sum.shape
    best_max_idx, best_min_idx = windowed_extrema_raw(
        val_sum, window, subpixel)
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = ((row >= r) & (row < h - r) & (col >= r) & (col < w - r))
    zero = jnp.zeros_like(val_sum)
    return (jnp.where(interior, best_max_idx, zero),
            jnp.where(interior, best_min_idx, zero))


@functools.partial(jax.jit, static_argnames=("window", "subpixel"))
def stripe_regression(frame: jax.Array, window: int, subpixel: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    """Full per-frame stripe tracking (CCalculation::StripRegression,
    CCalculation.cpp:789-891): raw (H, W) camera frame -> (strip_w,
    strip_b) float32 offset maps."""
    val_sum = box_sum_vertical(frame, window)
    return windowed_extrema(val_sum, window, subpixel)


@functools.partial(jax.jit, static_argnames=("robust",))
def select_delta_p(strip_w_prev: jax.Array, strip_b_prev: jax.Array,
                   strip_w_cur: jax.Array, strip_b_cur: jax.Array,
                   robust: bool = False) -> jax.Array:
    """Delta-P selection (CCalculation.cpp:595-646): use whichever stripe
    family (bright or dark) moved less: if |dB| < |dW| take dB else dW,
    where dX = prev - cur.

    ``robust`` (framework improvement): the min-|d| rule rectifies the
    sub-pixel estimators' opposite-phase oscillation toward zero — a
    measured ~9% systematic underestimation of per-frame motion even on
    noiseless data, which integrates into drift over the 100-frame
    sequence. When the two families agree (|dB - dW| <= 1 px) their
    *mean* cancels that oscillation instead; where they disagree (one
    family occluded / border-locked) fall back to the reference rule.
    """
    d_b = strip_b_prev - strip_b_cur
    d_w = strip_w_prev - strip_w_cur
    min_abs = jnp.where(jnp.abs(d_b) < jnp.abs(d_w), d_b, d_w)
    if not robust:
        return min_abs
    agree = jnp.abs(d_b - d_w) <= 1.0
    return jnp.where(agree, 0.5 * (d_b + d_w), min_abs)
