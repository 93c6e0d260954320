"""Projector-camera calibration and triangulation-table construction.

The reference loads ``CamMat / ProMat / R / T`` from an OpenCV YAML file
(DynaFrame/CCalculation.cpp:124-132, schema exemplified by
DynaFrame/Result.yml:2-28) and precomputes a per-pixel rational
triangulation: scalars ``A, B`` and per-pixel maps ``C(v,u), D(v,u)``
(DynaFrame/CCalculation.cpp:135-166) such that

    z(v, u) = -(A - B * P) / (C(v,u) - D(v,u) * P)

where ``P`` is the absolute projector column seen at camera pixel (v, u).
This module builds the same tables functionally. Precomputation is done in
float64 on the host for conditioning; the device tables are float32 after a
magnitude normalization by ``fx*fy`` that leaves the ratio (hence z)
unchanged but keeps every operand O(1e3) instead of O(1e10).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Calibration:
    """Pinhole projector-camera calibration.

    Mirrors the YAML schema of DynaFrame/Result.yml:2-28: ``cam_k`` is
    CamMat, ``pro_k`` is ProMat, (``rot``, ``trans``) map camera-frame
    points into the projector frame.
    """

    cam_k: jax.Array    # (3, 3) camera intrinsics
    pro_k: jax.Array    # (3, 3) projector intrinsics
    rot: jax.Array      # (3, 3) camera->projector rotation
    trans: jax.Array    # (3,)   camera->projector translation

    @staticmethod
    def from_numpy(cam_k, pro_k, rot, trans, dtype=jnp.float32) -> "Calibration":
        return Calibration(
            cam_k=jnp.asarray(cam_k, dtype),
            pro_k=jnp.asarray(pro_k, dtype),
            rot=jnp.asarray(rot, dtype),
            trans=jnp.asarray(trans, dtype).reshape(3),
        )

    @staticmethod
    def reference_example() -> "Calibration":
        """The example calibration shipped with the reference
        (DynaFrame/Result.yml:2-28), for tests and benchmarks."""
        cam_k = np.array([[1213.8714552009253, 0.0, 319.5],
                          [0.0, 1215.9945377703152, 255.5],
                          [0.0, 0.0, 1.0]])
        pro_k = np.array([[2028.8057545415668, 0.0, 619.58898841564314],
                          [0.0, 2031.9614890033101, 665.20739361244557],
                          [0.0, 0.0, 1.0]])
        rot = np.array([
            [0.99143473372566937, -0.012723342704854930, 0.12998186532253575],
            [0.025847502916207063, 0.99467300669012182, -0.099787355687128362],
            [-0.12801982407153850, 0.10229235705783506, 0.98648223416959957]])
        trans = np.array([-3.1747826732013134, -0.92770189525198721,
                          3.9430125669975382])
        return Calibration.from_numpy(cam_k, pro_k, rot, trans)

    def pro_mat(self) -> np.ndarray:
        """3x4 projector projection P = K_p [R | T]
        (DynaFrame/CCalculation.cpp:141-145), float64 on host."""
        rt = np.concatenate(
            [np.asarray(self.rot, np.float64),
             np.asarray(self.trans, np.float64).reshape(3, 1)], axis=1)
        return np.asarray(self.pro_k, np.float64) @ rt


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriangulationTables:
    """Per-pixel rational-triangulation tables.

    Derivation (exact pinhole algebra; cf. DynaFrame/CCalculation.cpp:151-166):
    with camera X = z*(u-cx)/fx, Y = z*(v-cy)/fy and projector column
    p = (P0 . [X Y z 1]) / (P2 . [X Y z 1]), eliminating X, Y gives

        z = -(A - B p) / (C(v,u) - D(v,u) p)

        A = fx*fy*P03            B = fx*fy*P23
        C = (u-cx)*fy*P00 + (v-cy)*fx*P01 + fx*fy*P02
        D = (u-cx)*fy*P20 + (v-cy)*fx*P21 + fx*fy*P22

    All four are stored normalized by fx*fy (ratio unchanged) so float32
    operands stay O(1e3).
    """

    a: jax.Array        # scalar ()
    b: jax.Array        # scalar ()
    c: jax.Array        # (H, W)
    d: jax.Array        # (H, W)
    fx: jax.Array       # scalar camera focal lengths / principal point,
    fy: jax.Array       # for back-projection (CCalculation.cpp:756-771)
    cx: jax.Array
    cy: jax.Array


def build_tables(calib: Calibration, cam_h: int, cam_w: int,
                 dtype=jnp.float32) -> TriangulationTables:
    """Host-side float64 construction of the triangulation tables,
    cast to ``dtype`` for the device. Mirrors the per-pixel loop at
    DynaFrame/CCalculation.cpp:153-166 as two outer products."""
    cam_k = np.asarray(calib.cam_k, np.float64)
    p = calib.pro_mat()
    fx, fy = cam_k[0, 0], cam_k[1, 1]
    cx, cy = cam_k[0, 2], cam_k[1, 2]

    u = np.arange(cam_w, dtype=np.float64)[None, :] - cx    # (1, W)
    v = np.arange(cam_h, dtype=np.float64)[:, None] - cy    # (H, 1)

    norm = fx * fy
    a = p[0, 3]
    b = p[2, 3]
    c = (u * fy * p[0, 0] + v * fx * p[0, 1]) / norm + p[0, 2]
    d = (u * fy * p[2, 0] + v * fx * p[2, 1]) / norm + p[2, 2]
    c = np.broadcast_to(c, (cam_h, cam_w))
    d = np.broadcast_to(d, (cam_h, cam_w))

    as_d = lambda x: jnp.asarray(x, dtype)
    return TriangulationTables(
        a=as_d(a), b=as_d(b), c=as_d(c), d=as_d(d),
        fx=as_d(fx), fy=as_d(fy), cx=as_d(cx), cy=as_d(cy))


def synthetic_calibration(baseline: float = 20.0,
                          z_work: float = 50.0,
                          cam_f: float = 600.0,
                          pro_f: float = 400.0,
                          cam_h: int = 480, cam_w: int = 640,
                          pro_h: int = 480, pro_w: int = 640) -> Calibration:
    """A well-conditioned synthetic rig for tests: projector displaced
    along +x by ``baseline`` (scene units) and toed in about +y so both
    optical axes intersect at depth ``z_work`` on the camera axis."""
    cam_k = np.array([[cam_f, 0.0, (cam_w - 1) / 2.0],
                      [0.0, cam_f, (cam_h - 1) / 2.0],
                      [0.0, 0.0, 1.0]])
    pro_k = np.array([[pro_f, 0.0, (pro_w - 1) / 2.0],
                      [0.0, pro_f, (pro_h - 1) / 2.0],
                      [0.0, 0.0, 1.0]])
    # Projector at camera-frame C = (baseline, 0, 0) must look at
    # (0, 0, z_work): rotate about +y by th = -atan(baseline / z_work).
    th = -np.arctan2(baseline, z_work)
    rot = np.array([[np.cos(th), 0.0, -np.sin(th)],
                    [0.0, 1.0, 0.0],
                    [np.sin(th), 0.0, np.cos(th)]])
    trans = -rot @ np.array([baseline, 0.0, 0.0])
    return Calibration.from_numpy(cam_k, pro_k, rot, trans)


def project_to_projector(calib: Calibration,
                         xyz: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host/float64 helper: project camera-frame points (..., 3) through
    the projector, returning (col, row) continuous projector coords."""
    p = calib.pro_mat()
    xyz = np.asarray(xyz, np.float64)
    h = xyz @ p[:, :3].T + p[:, 3]
    return h[..., 0] / h[..., 2], h[..., 1] / h[..., 2]
