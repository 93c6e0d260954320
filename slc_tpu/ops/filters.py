"""Spatial filters: box blur and bilateral depth filtering.

* 3x3 box blur replicates ``cv::blur(src, dst, Size(3,3))`` applied to the
  delta-P map in the reference (DynaFrame/CCalculation.cpp:648-650),
  including OpenCV's default BORDER_REFLECT_101 border (jnp.pad
  mode='reflect').
* The bilateral filter reproduces the behavior of the reference's depth
  post-filter ``bilateralFilter(d=3, sigmaColor=10, sigmaSpace=25)``
  (DynaFrame/depthMapUtils.cpp:179) as a vectorized stencil, with a
  hole-aware weight so invalid (z == 0) pixels neither bleed nor get
  filled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def box_blur(x: jax.Array, size: int = 3) -> jax.Array:
    """Separable mean filter with REFLECT_101 borders, matching cv::blur
    defaults (used at CCalculation.cpp:650 with Size(3,3))."""
    r = size // 2
    pad = jnp.pad(x, ((r, r), (0, 0)), mode="reflect")
    s = jnp.concatenate([jnp.zeros((1,) + pad.shape[1:], pad.dtype),
                         jnp.cumsum(pad, axis=0)], axis=0)
    x = (s[size:] - s[:-size])
    pad = jnp.pad(x, ((0, 0), (r, r)), mode="reflect")
    s = jnp.concatenate([jnp.zeros(pad.shape[:1] + (1,), pad.dtype),
                         jnp.cumsum(pad, axis=1)], axis=1)
    x = (s[:, size:] - s[:, :-size])
    return x / jnp.asarray(size * size, x.dtype)


box_blur_3x3 = functools.partial(box_blur, size=3)


@functools.partial(jax.jit, static_argnames=("radius", "hole_aware",
                                             "use_pallas"))
def bilateral_filter(img: jax.Array, radius: int = 1,
                     sigma_color: float = 10.0,
                     sigma_space: float = 25.0,
                     hole_aware: bool = True,
                     use_pallas: bool = None) -> jax.Array:
    """Brute-force bilateral filter over a (2r+1)^2 stencil.

    Matches the parameterization of the reference call
    (depthMapUtils.cpp:179: d=3 -> radius 1, sigmaColor=10, sigmaSpace=25).
    With ``hole_aware`` (framework improvement), pixels where img == 0 are
    treated as missing: they get zero weight and remain zero.

    ``use_pallas=None`` auto-selects the fused single-HBM-pass kernel
    (slc_tpu.pallas.bilateral) on TPU for the hole-aware path — the
    roll-per-tap XLA form below makes ~18 full-image HBM round trips.
    Interior results are identical; borders differ (the fused kernel
    treats out-of-image neighbors as missing instead of wrapping).
    """
    if use_pallas and not hole_aware:
        raise ValueError(
            "the fused Pallas bilateral kernel only implements "
            "hole-aware weighting; use hole_aware=True or "
            "use_pallas=False")
    if use_pallas and jax.default_backend() not in ("tpu", "axon"):
        raise ValueError(
            f"use_pallas=True requires a TPU backend (Mosaic kernels); "
            f"current backend is {jax.default_backend()!r} — drop the "
            f"flag (auto-selects) or use use_pallas=False. Note the "
            f"backends also differ at image borders: the fused kernel "
            f"treats out-of-image neighbors as missing, the XLA path "
            f"wraps.")
    if use_pallas is None:
        use_pallas = (hole_aware
                      and jax.default_backend() in ("tpu", "axon"))
    if use_pallas:
        from slc_tpu.pallas.bilateral import bilateral_filter_pallas
        return bilateral_filter_pallas(img, radius, sigma_color,
                                       sigma_space)
    x = img.astype(jnp.float32)
    inv2sc = jnp.float32(-0.5 / (sigma_color * sigma_color))
    inv2ss = jnp.float32(-0.5 / (sigma_space * sigma_space))
    valid = (x != 0).astype(jnp.float32) if hole_aware else None

    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            # Shift with edge replication (cv default border handling is
            # reflect; for a radius-1 stencil on smooth depth the
            # difference is confined to the 1-px frame).
            v = jnp.roll(x, (-dy, -dx), axis=(0, 1))
            w = jnp.exp((v - x) * (v - x) * inv2sc
                        + jnp.float32(dy * dy + dx * dx) * inv2ss)
            if valid is not None:
                w = w * jnp.roll(valid, (-dy, -dx), axis=(0, 1))
            num = num + w * v
            den = den + w
    out = num / jnp.maximum(den, 1e-12)
    if valid is not None:
        out = jnp.where(valid > 0, out, 0.0)
    return out
