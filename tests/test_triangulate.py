"""Triangulation: exactness against geometry, f32 precision vs f64 golden,
hole and FOV semantics."""

import numpy as np
import jax.numpy as jnp

from slc_tpu import golden
from slc_tpu.calib import (Calibration, build_tables, synthetic_calibration,
                           project_to_projector)
from slc_tpu.config import TEST_CONFIG
from slc_tpu.ops.triangulate import triangulate_depth, triangulate_xyz
from slc_tpu.synth import plane_surface, sphere_surface, surface_geometry


def _exact_proj(calib, cfg, surface):
    z, pu = surface_geometry(calib, cfg, surface)
    return z, pu


def test_triangulate_is_exact_inverse_of_projection():
    """Feeding the exact projector correspondence must reproduce the
    surface depth to f32 roundoff — the rational formula is exact pinhole
    algebra (CCalculation.cpp:686-687 derivation)."""
    cfg = TEST_CONFIG
    calib = synthetic_calibration()
    tables = build_tables(calib, cfg.cam_h, cfg.cam_w)
    for surface in [plane_surface(50.0),
                    plane_surface(60.0, gx=0.3, gy=-0.2),
                    sphere_surface()]:
        z_gt, pu = _exact_proj(calib, cfg, surface)
        z = np.asarray(triangulate_depth(
            jnp.asarray(pu, jnp.float32), tables, cfg.fov_min, cfg.fov_max))
        rmse = np.sqrt(np.mean((z - z_gt) ** 2))
        assert rmse < 5e-3, rmse
        assert np.abs(z - z_gt).max() < 5e-2


def test_triangulate_f32_close_to_f64_golden_reference_calib():
    """f32 device tables vs the reference's f64 table construction
    (CCalculation.cpp:135-166) on the shipped example calibration
    (Result.yml): agreement far below the 0.5 mm RMSE budget."""
    calib = Calibration.reference_example()
    h, w = 256, 320
    tables = build_tables(calib, h, w)
    rng = np.random.default_rng(7)
    pu = rng.uniform(200.0, 1000.0, size=(h, w))
    z32 = np.asarray(triangulate_depth(
        jnp.asarray(pu, jnp.float32), tables, 10.0, 100.0))
    cam_k = np.asarray(calib.cam_k, np.float64)
    _, _, z64 = golden.triangulate(pu, cam_k, calib.pro_mat(), 10.0, 100.0)
    valid = z64 != 0
    assert valid.mean() > 0.1
    diff = np.abs(z32 - z64)[valid]
    assert diff.max() < 5e-3          # scene units; << 0.5 mm budget


def test_hole_and_fov_semantics():
    cfg = TEST_CONFIG
    calib = synthetic_calibration()
    tables = build_tables(calib, cfg.cam_h, cfg.cam_w)
    z_gt, pu = _exact_proj(calib, cfg, plane_surface(50.0))
    pu = pu.copy()
    pu[10, 10] = 0.0                      # hole (CCalculation.cpp:678-682)
    x, y, z = triangulate_xyz(jnp.asarray(pu, jnp.float32), tables,
                              cfg.fov_min, cfg.fov_max)
    z = np.asarray(z)
    assert z[10, 10] == 0.0
    assert np.asarray(x)[10, 10] == 0.0
    # FOV clamp (CCalculation.cpp:701-704): shrink the FOV below the plane.
    z2 = np.asarray(triangulate_depth(jnp.asarray(pu, jnp.float32),
                                      tables, 10.0, 40.0))
    assert (z2 == 0.0).all()


def test_backprojection_matches_golden():
    calib = Calibration.reference_example()
    h, w = 64, 96
    tables = build_tables(calib, h, w)
    rng = np.random.default_rng(3)
    pu = rng.uniform(300.0, 900.0, size=(h, w))
    x, y, z = triangulate_xyz(jnp.asarray(pu, jnp.float32), tables,
                              10.0, 100.0)
    cam_k = np.asarray(calib.cam_k, np.float64)
    gx, gy, gz = golden.triangulate(pu, cam_k, calib.pro_mat(), 10.0, 100.0)
    np.testing.assert_allclose(np.asarray(x), gx, atol=5e-3)
    np.testing.assert_allclose(np.asarray(y), gy, atol=5e-3)


def test_reference_example_projection_roundtrip():
    """Sanity: projecting a camera-frame point with the example
    calibration and triangulating its column recovers its depth."""
    calib = Calibration.reference_example()
    cam_k = np.asarray(calib.cam_k, np.float64)
    h, w = 1024, 1280
    tables = build_tables(calib, h, w)
    # A grid of camera pixels at depth 50.
    for (v, u) in [(100, 200), (512, 640), (900, 1100)]:
        z0 = 50.0
        xyz = np.array([(u - cam_k[0, 2]) / cam_k[0, 0] * z0,
                        (v - cam_k[1, 2]) / cam_k[1, 1] * z0, z0])
        pu, _ = project_to_projector(calib, xyz)
        pu_map = np.zeros((h, w), np.float32)
        pu_map[v, u] = pu
        z = np.asarray(triangulate_depth(jnp.asarray(pu_map), tables,
                                         10.0, 100.0))
        assert abs(z[v, u] - z0) < 1e-3
