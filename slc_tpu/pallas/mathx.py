"""Elementwise math helpers for Pallas TPU kernels.

Mosaic (the Pallas TPU compiler) has no lowering for ``atan``/``atan2``
(as of jax 0.9): kernels that need the phase-extraction arctangent
(CDecodePhase.cpp:67, which uses OpenCV's cvFastArctan ~0.3-degree LUT)
must bring their own. :func:`atan2` below is a Cephes-style polynomial
arctangent — octant range reduction + a degree-7 odd minimax polynomial
on [0, tan(pi/8)] — built purely from VPU-friendly mul/add/select, with
~2 ulp f32 accuracy (orders of magnitude tighter than the reference's
LUT). Also valid outside Pallas; tests compare it against
``jnp.arctan2`` on CPU.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_PI = math.pi
_TAN_PI_8 = math.sqrt(2.0) - 1.0   # tan(pi/8): Cephes atanf split point


def _atan_poly(t):
    """Minimax atan(t) for |t| <= tan(pi/8) (Cephes atanf coefficients)."""
    z = t * t
    p = jnp.float32(8.05374449538e-2)
    p = p * z - jnp.float32(1.38776856032e-1)
    p = p * z + jnp.float32(1.99777106478e-1)
    p = p * z - jnp.float32(3.33329491539e-1)
    return p * z * t + t


def atan2(y, x, bounded: bool = False):
    """Four-quadrant arctangent in [-pi, pi], elementwise, f32.

    Same quadrant conventions as ``jnp.arctan2``; (0, 0) -> 0. Uses the
    min/max-ratio octant reduction so the polynomial argument stays in
    [0, 1], then the Cephes tail fold atan(t) = pi/4 + atan((t-1)/(t+1))
    for t > tan(pi/8).

    Magnitude floor: the ratio clamps its denominator at 1e-30, so when
    both |x| and |y| are below ~1e-30 (f32 subnormal territory) the
    angle collapses toward 0 instead of the true direction. Fringe sums
    derived from uint8 images are >= 1 whenever nonzero, far above the
    floor; callers feeding near-subnormal data should rescale first.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    # One division instead of two: with t = mn/mx, the Cephes tail fold
    # (t-1)/(t+1) equals (mn-mx)/(mn+mx), and the split predicate
    # t > tan(pi/8) is mn > tan(pi/8)*mx — both division-free, so the
    # numerator/denominator can be selected BEFORE the single divide.
    # Divides are the VPU's slowest ops; this measurably speeds the
    # fused decode kernels, which evaluate 1-3 atan2 per pixel.
    # mn + mx can overflow f32 for inputs near the type max (the old
    # two-divide form never added magnitudes); the fold ratio is
    # scale-invariant, so halve both operands in that range first.
    if not bounded:
        huge = mx > jnp.float32(1.7e38)
        mn = jnp.where(huge, mn * 0.5, mn)
        mx = jnp.where(huge, mx * 0.5, mx)
    big = mn > jnp.float32(_TAN_PI_8) * mx
    num = jnp.where(big, mn - mx, mn)
    den = jnp.where(big, mn + mx, mx)
    t = num / jnp.maximum(den, jnp.float32(1e-30))   # (-0.414, 0.414]
    r = _atan_poly(t) + jnp.where(big, jnp.float32(0.25 * _PI),
                                  jnp.float32(0.0))
    r = jnp.where(ay > ax, jnp.float32(0.5 * _PI) - r, r)
    r = jnp.where(x < 0, jnp.float32(_PI) - r, r)
    r = jnp.where(mx == 0, jnp.float32(0.0), r)      # atan2(0, 0) = 0
    return jnp.where(y < 0, -r, r)


def sliding_row_sum(f, base: int, n_out: int, window: int):
    """Vertical sliding-window sum: ``out[k, :] = sum_{j<window}
    f[base+k+j, :]`` for k in [0, n_out), as a hierarchical
    power-of-two decomposition (doubling partial sums, then one add per
    set bit of ``window``) — O(log window + popcount) full-array adds
    instead of the naive window-1. This is the 21-row rolling column
    sum of the reference's StripRegression (CCalculation.cpp:797-823),
    which it computes with a per-column rolling scalar DP the VPU can't
    use. Requires f.shape[0] >= base + n_out + window - 1.
    """
    assert window >= 1
    assert f.shape[0] >= base + n_out + window - 1, (
        f.shape, base, n_out, window)
    # sums[p][k] = sum f[k : k+p]; doubling: sums[2p][k] =
    # sums[p][k] + sums[p][k+p].
    sums = {1: f}
    p = 1
    while 2 * p <= window:
        prev = sums[p]
        sums[2 * p] = prev[:prev.shape[0] - p] + prev[p:]
        p *= 2
    out = None
    off = base
    while p >= 1:
        if window & p:
            seg = sums[p][off:off + n_out]
            out = seg if out is None else out + seg
            off += p
        p //= 2
    return out
