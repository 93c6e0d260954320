"""Projector-camera triangulation and back-projection.

Reference behavior (DynaFrame/CCalculation.cpp:666-785):

  * P == 0 marks a hole -> z = 0 (CCalculation.cpp:678-682; the reference
    actually leaves stale memory there, a latent bug SURVEY.md flags —
    we define holes as z = 0);
  * z = -(A - B*P) / (C - D*P) (CCalculation.cpp:686-687);
  * z outside [FOV_MIN, FOV_MAX] -> 0 (CCalculation.cpp:701-704);
  * x = z*(u-cx)/fx, y = z*(v-cy)/fy (CCalculation.cpp:756-771).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from slc_tpu.calib import TriangulationTables


@functools.partial(jax.jit, static_argnames=("fov_min", "fov_max"))
def triangulate_depth(proj_u: jax.Array, tables: TriangulationTables,
                      fov_min: float, fov_max: float,
                      valid: Optional[jax.Array] = None) -> jax.Array:
    """(H, W) absolute projector column -> (H, W) float32 depth.

    ``valid`` optionally supplies an explicit validity mask (e.g. from
    fringe modulation); the reference's implicit hole rule P == 0 is
    always applied as well.
    """
    p = proj_u.astype(jnp.float32)
    denom = tables.c - tables.d * p
    z = (tables.b * p - tables.a) / denom
    hole = p == 0
    if valid is not None:
        hole = hole | jnp.logical_not(valid)
    out_of_fov = (z < fov_min) | (z > fov_max)
    return jnp.where(hole | out_of_fov, 0.0, z)


@jax.jit
def backproject(z: jax.Array, tables: TriangulationTables
                ) -> Tuple[jax.Array, jax.Array]:
    """Depth -> camera-frame (x, y) maps via the pinhole model
    (CCalculation.cpp:756-771). Holes (z = 0) map to x = y = 0."""
    h, w = z.shape
    u = jnp.arange(w, dtype=jnp.float32)[None, :] - tables.cx
    v = jnp.arange(h, dtype=jnp.float32)[:, None] - tables.cy
    x = z * (u / tables.fx)
    y = z * (v / tables.fy)
    return x, y


@functools.partial(jax.jit, static_argnames=("fov_min", "fov_max"))
def triangulate_xyz(proj_u: jax.Array, tables: TriangulationTables,
                    fov_min: float, fov_max: float,
                    valid: Optional[jax.Array] = None
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused depth + back-projection, the per-frame output of the
    pipeline (cf. CCalculation::FillCoordinate, CCalculation.cpp:666-785)."""
    z = triangulate_depth(proj_u, tables, fov_min, fov_max, valid)
    x, y = backproject(z, tables)
    return x, y, z
