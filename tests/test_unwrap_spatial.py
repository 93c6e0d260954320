"""Spatial (quality-guided weighted-LS) unwrapping."""

import numpy as np
import jax.numpy as jnp

from slc_tpu.ops.unwrap_spatial import (unwrap_spatial, unwrap_to_reference,
                                        wrap_to_half, wrapped_gradients)


def _wrap(x, t):
    return np.mod(x, t)


def test_wrap_to_half():
    d = jnp.asarray([0.0, 19.9, 20.0, -20.0, 39.0, -39.0])
    got = np.asarray(wrap_to_half(d, 40.0))
    np.testing.assert_allclose(got, [0.0, 19.9, -20.0, -20.0, -1.0, 1.0],
                               atol=1e-5)


def test_unwrap_smooth_ramp():
    """A smooth ramp spanning many periods must unwrap exactly (up to the
    global order fixed by the anchor)."""
    t = 32.0
    h, w = 96, 128
    x = np.linspace(0, 6 * t, w)[None, :] + np.linspace(0, t, h)[:, None]
    psi = _wrap(x, t).astype(np.float32)
    got = np.asarray(unwrap_spatial(jnp.asarray(psi), t,
                                    anchor=jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(got, x, atol=1e-2)


def test_unwrap_self_anchored_recovers_shape():
    """Without an external anchor the global offset is arbitrary (mod T)
    but the unwrapped field must differ from truth by a constant."""
    t = 24.0
    h, w = 64, 96
    x = 30.0 + 40.0 * np.sin(np.linspace(0, 2, w))[None, :] \
        + 10.0 * np.cos(np.linspace(0, 3, h))[:, None]
    psi = _wrap(x, t).astype(np.float32)
    got = np.asarray(unwrap_spatial(jnp.asarray(psi), t, max_iters=600))
    d = got - x
    assert np.abs(d - d.mean()).max() < 5e-2
    # Congruence: result is psi + k*T exactly.
    k = (got - psi) / t
    np.testing.assert_allclose(k, np.round(k), atol=1e-3)


def test_unwrap_quality_guided_across_noise_band(rng):
    """A horizontal band of pure-noise phase with near-zero quality must
    not break propagation between the clean regions above and below."""
    t = 32.0
    h, w = 96, 128
    x = np.linspace(0, 5 * t, w)[None, :] + 0.3 * np.arange(h)[:, None]
    psi = _wrap(x, t)
    q = np.ones((h, w))
    band = slice(40, 48)
    psi[band] = rng.uniform(0, t, size=(8, w))
    q[band] = 1e-3
    got = np.asarray(unwrap_spatial(jnp.asarray(psi, jnp.float32), t,
                                    quality=jnp.asarray(q, jnp.float32),
                                    max_iters=800,
                                    anchor=jnp.asarray(x, jnp.float32)))
    good = np.ones((h, w), bool)
    good[band] = False
    np.testing.assert_allclose(got[good], x[good], atol=1e-2)


def test_unwrap_to_reference():
    t = 40.0
    x = np.linspace(3.0, 600.0, 500)
    psi = jnp.asarray(_wrap(x, t), jnp.float32)
    ref = jnp.asarray(x + np.random.default_rng(0).uniform(
        -15, 15, x.shape), jnp.float32)
    got = np.asarray(unwrap_to_reference(psi, t, ref))
    np.testing.assert_allclose(got, x, atol=1e-4)


def test_decode_spatial_frame_end_to_end():
    """Config-3 pipeline: fringes -> spatial unwrap -> depth, anchored by
    the true map; RMSE must be at the phase-noise floor."""
    import jax.numpy as jnp
    from slc_tpu import synth
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu.config import SystemConfig
    from slc_tpu.pipeline import decode_spatial_frame

    cfg = SystemConfig(cam_h=96, cam_w=160, pro_h=96, pro_w=640,
                       gray_bits=5)
    calib = synthetic_calibration(cam_h=cfg.cam_h, cam_w=cfg.cam_w,
                                  pro_h=cfg.pro_h, pro_w=cfg.pro_w)
    tables = build_tables(calib, cfg.cam_h, cfg.cam_w)
    period = 20.0
    imgs, z_gt, pu_gt = synth.render_fringe_stack(
        calib, cfg, synth.plane_surface(50.0, 0.05, 0.0),
        [period], 4, noise_sigma=1.0)
    res = decode_spatial_frame(
        jnp.asarray(imgs), tables, cfg, period,
        anchor=jnp.asarray(pu_gt, jnp.float32), unwrap_iters=500)
    z = np.asarray(res.z)
    valid = z > 0
    assert valid.mean() > 0.95
    rmse = np.sqrt(np.mean((z[valid] - z_gt[valid]) ** 2))
    assert rmse < 0.05
