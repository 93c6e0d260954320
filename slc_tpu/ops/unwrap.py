"""Phase unwrapping: Gray-assisted merge and multi-frequency heterodyne.

Gray-assisted merge is the reference's frame-0 absolute decode
(DynaFrame/CCalculation.cpp:561-587): the fringe period T equals two Gray
bins, and the Gray bin parity disambiguates which half-period the wrapped
phase belongs to, with a guard band correcting phase values that wrapped
into the adjacent bin.

Heterodyne unwrapping (BASELINE config 2) is new relative to the reference:
a cascade of pairwise beat phases extends the unambiguous range from the
finest fringe period to the full projector width, then unwraps back down
the cascade by fringe-order rounding.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("gray_period", "phase_period"))
def gray_assisted_merge(gray_coord: jax.Array, wrapped_phase: jax.Array,
                        gray_period: float, phase_period: float) -> jax.Array:
    """Merge an absolute Gray coordinate with a wrapped fringe phase.

    Reference semantics (CCalculation.cpp:561-587), with T = phase_period
    = 2 * gray_period (CCalculation.cpp:550,563):

      even Gray bin:  phase > 0.75 T  ->  phase -= T
      odd  Gray bin:  phase < 0.25 T  ->  phase += T ;  then phase -= T/2
      P = gray_coord + phase
    """
    t = jnp.float32(phase_period)
    bin_idx = (gray_coord / jnp.float32(gray_period)).astype(jnp.int32)
    even = (bin_idx % 2) == 0
    ph = wrapped_phase
    ph_even = jnp.where(ph > 0.75 * t, ph - t, ph)
    ph_odd = jnp.where(ph < 0.25 * t, ph + t, ph) - 0.5 * t
    return gray_coord + jnp.where(even, ph_even, ph_odd)


def _wrap_delta(a: jax.Array, b: jax.Array) -> jax.Array:
    """Fractional wrap of (a - b) into [0, 1)."""
    d = a - b
    return d - jnp.floor(d)


@functools.partial(jax.jit, static_argnames=("periods", "extent"))
def heterodyne_unwrap(wrapped: jax.Array, periods: Sequence[float],
                      extent: float) -> jax.Array:
    """Multi-frequency heterodyne (beat) unwrapping.

    Args:
      wrapped: (F, H, W) wrapped fringe coordinates, each in [0, T_f),
        finest period first (``wrapped[f] = x mod periods[f]`` for true
        projector coordinate x).
      periods: fringe periods, ascending, len == F. The pairwise beat
        cascade ``T_ij = Ti*Tj/(Tj-Ti)`` must reach >= ``extent``.
      extent: full unambiguous range to recover (projector width).

    Returns:
      (H, W) float32 absolute coordinate in [0, extent).

    Method: convert to fractional phases u_f = wrapped_f / T_f; beat of
    neighbors u_{f,f+1} = frac(u_f - u_{f+1}) has period T_f*T_{f+1}/
    (T_{f+1}-T_f); cascade to a single coarse phase spanning ``extent``.
    Then unwrap back DOWN the pyramid level by level along its left spine
    (coarse -> beat_{01..} -> ... -> T_0): at each level,
    k = round(x/T - u), x = (k + u) * T. Stepping through every level
    keeps each rounding's noise amplification ~T_{l+1}/T_l instead of
    extent/T_0, which is what makes the cascade noise-robust.
    """
    periods = tuple(float(p) for p in periods)
    fracs = [wrapped[i] / jnp.float32(periods[i])
             for i in range(len(periods))]

    # Build the full beat pyramid; pyramid[l] = (fracs, periods) of level l.
    pyramid = [(list(fracs), list(periods))]
    while len(pyramid[-1][0]) > 1:
        lf, lp = pyramid[-1]
        nf, np_ = [], []
        for i in range(len(lf) - 1):
            nf.append(_wrap_delta(lf[i], lf[i + 1]))
            np_.append(lp[i] * lp[i + 1] / abs(lp[i + 1] - lp[i]))
        pyramid.append((nf, np_))

    coarse_frac, coarse_period = pyramid[-1][0][0], pyramid[-1][1][0]
    if coarse_period < extent - 1e-6:
        raise ValueError(
            f"heterodyne cascade reaches only {coarse_period:.1f} px of the "
            f"required {extent} px; choose closer periods")

    x = coarse_frac * jnp.float32(coarse_period)
    for lf, lp in reversed(pyramid[:-1]):
        u, p = lf[0], jnp.float32(lp[0])
        k = jnp.round(x / p - u)
        x = (k + u) * p
    # Noise near the extent boundary can round the coarse order past the
    # unambiguous range (x ~ -T0 or ~ extent): wrap back into [0, extent).
    e = jnp.float32(extent)
    return x - e * jnp.floor(x / e)
