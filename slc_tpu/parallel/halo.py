"""Halo exchange over a tile mesh via `ppermute`.

Inside a `shard_map`-ed function each device holds one (h, w) image tile.
Windowed stencils (21-row box sums CCalculation.cpp:797-823, +-10 px
extremum search :837-850, 3x3 blur :650) need up to 11 px of neighbor
data; `halo_exchange` gathers it with two `ppermute` shifts per axis.

Non-periodic boundary semantics: devices at the image border receive
zeros from the missing neighbor (ppermute's fill), which matches the
reference's zero border for valSum and keeps the downstream interior
masks (applied in global coordinates) exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift_from_prev(x: jax.Array, axis_name: str) -> jax.Array:
    """Every device receives x from its predecessor along ``axis_name``
    (device 0 receives zeros)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def _shift_from_next(x: jax.Array, axis_name: str) -> jax.Array:
    """Every device receives x from its successor (device n-1 gets 0)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i + 1, i) for i in range(n - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def halo_axis(x: jax.Array, halo: int, dim: int,
              axis_name: str) -> jax.Array:
    """Extend tile ``x`` by ``halo`` entries of neighbor data on both
    sides of array dimension ``dim`` (sharded along mesh ``axis_name``)."""
    if halo == 0:
        return x
    lo_src = jax.lax.slice_in_dim(x, x.shape[dim] - halo, x.shape[dim],
                                  axis=dim)
    hi_src = jax.lax.slice_in_dim(x, 0, halo, axis=dim)
    lo = _shift_from_prev(lo_src, axis_name)   # neighbor above/left
    hi = _shift_from_next(hi_src, axis_name)   # neighbor below/right
    return jnp.concatenate([lo, x, hi], axis=dim)


def halo_exchange(x: jax.Array, halo_y: int, halo_x: int,
                  ty_axis: str = "ty", tx_axis: str = "tx") -> jax.Array:
    """2D halo exchange: (h, w) tile -> (h + 2*halo_y, w + 2*halo_x)."""
    x = halo_axis(x, halo_y, 0, ty_axis)
    return halo_axis(x, halo_x, 1, tx_axis)


def halo_crop(x: jax.Array, halo_y: int, halo_x: int) -> jax.Array:
    """Crop a halo-extended tile back to its core."""
    h, w = x.shape[-2], x.shape[-1]
    return x[..., halo_y:h - halo_y if halo_y else h,
             halo_x:w - halo_x if halo_x else w]


def global_offsets(tile_h: int, tile_w: int,
                   ty_axis: str = "ty", tx_axis: str = "tx"):
    """(row0, col0) global coordinates of this tile's origin."""
    iy = jax.lax.axis_index(ty_axis)
    ix = jax.lax.axis_index(tx_axis)
    return iy * tile_h, ix * tile_w
