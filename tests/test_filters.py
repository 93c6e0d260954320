"""Filters: box blur parity with cv::blur semantics (golden), bilateral
behavior."""

import numpy as np
import jax.numpy as jnp

from slc_tpu import golden
from slc_tpu.ops.filters import box_blur, box_blur_3x3, bilateral_filter


def test_box_blur_matches_golden(rng):
    x = rng.normal(size=(33, 47)).astype(np.float32)
    ours = np.asarray(box_blur_3x3(jnp.asarray(x)))
    theirs = golden.box_blur_3x3(x)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_box_blur_preserves_constant(rng):
    x = jnp.full((24, 40), 3.25, jnp.float32)
    np.testing.assert_allclose(np.asarray(box_blur(x, 5)), 3.25, atol=1e-5)


def test_bilateral_smooths_noise_keeps_edges(rng):
    # Step edge + noise: bilateral must reduce noise without moving the edge.
    h, w = 64, 64
    img = np.where(np.arange(w)[None, :] < w // 2, 40.0, 70.0)
    img = np.broadcast_to(img, (h, w)).copy()
    noisy = img + rng.normal(0, 0.5, size=(h, w))
    out = np.asarray(bilateral_filter(jnp.asarray(noisy, jnp.float32),
                                      radius=1, sigma_color=10.0,
                                      sigma_space=25.0))
    # Noise reduced on the flats.
    flat = (slice(8, -8), slice(8, w // 2 - 4))
    assert np.std(out[flat] - img[flat]) < 0.7 * np.std(
        noisy[flat] - img[flat])
    # Edge magnitude preserved within 10%.
    edge_in = np.abs(noisy[:, w // 2 + 1].mean() - noisy[:, w // 2 - 2].mean())
    edge_out = np.abs(out[:, w // 2 + 1].mean() - out[:, w // 2 - 2].mean())
    assert edge_out > 0.9 * edge_in


def test_bilateral_hole_aware(rng):
    img = rng.uniform(40, 42, size=(32, 32)).astype(np.float32)
    img[10:14, 10:14] = 0.0   # holes
    out = np.asarray(bilateral_filter(jnp.asarray(img)))
    assert (out[10:14, 10:14] == 0.0).all()       # holes stay holes
    assert (out[img != 0] != 0).all()             # valid stays valid


def test_bilateral_pallas_matches_xla_interior(rng):
    """The fused Pallas bilateral kernel must match the XLA roll-per-tap
    path on all interior pixels (borders differ by design: the kernel
    treats out-of-image neighbors as missing, the XLA path wraps)."""
    from slc_tpu.pallas.bilateral import bilateral_filter_pallas
    h, w = 72, 100
    z = 50.0 + rng.normal(0, 0.4, size=(h, w)).astype(np.float32)
    z[rng.uniform(size=(h, w)) < 0.05] = 0.0       # holes
    zj = jnp.asarray(z)
    ref = np.asarray(bilateral_filter(zj, use_pallas=False))
    got = np.asarray(bilateral_filter_pallas(zj, block_h=32,
                                             interpret=True))
    np.testing.assert_allclose(got[1:-1, 1:-1], ref[1:-1, 1:-1],
                               atol=1e-4)
    # Holes stay holes in both.
    np.testing.assert_array_equal(got == 0.0, z == 0.0)


def test_bilateral_pallas_no_edge_wrap_at_lane_multiple_width(rng):
    """Width an exact lane-tile multiple (the reference camera's 1280
    is one): the kernel must still treat out-of-image columns as
    missing, not wrap the left/right borders into each other
    (code-review r3 finding — pad_w == w left no zero columns)."""
    from slc_tpu.pallas.bilateral import bilateral_filter_pallas
    h, w = 16, 128
    z = np.full((h, w), 50.0, np.float32)
    z[:, -1] = 80.0
    out = np.asarray(bilateral_filter_pallas(jnp.asarray(z), block_h=16,
                                             interpret=True))
    # Column 0 must be untouched by the far-edge 80.0 values.
    np.testing.assert_allclose(out[:, 0], 50.0, atol=1e-5)


def test_bilateral_pallas_rejects_non_hole_aware():
    import pytest
    with pytest.raises(ValueError):
        bilateral_filter(jnp.ones((8, 8), jnp.float32),
                         hole_aware=False, use_pallas=True)
