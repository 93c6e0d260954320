"""Stripe tracker: exact parity with the golden scalar transcription of
CCalculation::StripRegression (CCalculation.cpp:789-891), including the
strict-inequality tie-breaking and border behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from slc_tpu import golden
from slc_tpu.ops.stripe import (box_sum_vertical, windowed_extrema,
                                stripe_regression, select_delta_p)
from slc_tpu.ops.filters import box_blur_3x3


@pytest.mark.parametrize("window", [7, 21])
def test_box_sum_matches_golden(rng, window):
    frame = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
    ours = np.asarray(box_sum_vertical(jnp.asarray(frame), window))
    theirs = golden.box_sum_vertical(frame, window)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("window", [7, 21])
def test_windowed_extrema_matches_golden(rng, window):
    # Integer-valued sums make ties common — the hard case for parity.
    vs = rng.integers(0, 6, size=(40, 56)).astype(np.float32)
    r = window // 2
    mask = np.zeros_like(vs)
    mask[r:-r, r:-r] = 1
    vs = vs * mask
    sw, sb = windowed_extrema(jnp.asarray(vs), window)
    gw, gb = golden.windowed_extrema(vs.astype(np.float64), window)
    np.testing.assert_array_equal(np.asarray(sw), gw)
    np.testing.assert_array_equal(np.asarray(sb), gb)


def test_stripe_regression_full_parity(rng):
    frame = rng.integers(0, 256, size=(64, 96), dtype=np.uint8)
    window = 21
    sw, sb = stripe_regression(jnp.asarray(frame), window)
    vs = golden.box_sum_vertical(frame, window)
    gw, gb = golden.windowed_extrema(vs, window)
    np.testing.assert_array_equal(np.asarray(sw), gw)
    np.testing.assert_array_equal(np.asarray(sb), gb)


def test_stripe_tracks_known_shift():
    """A sinusoidal stripe image shifted by s columns must shift the
    detected extremum offsets by s within the valid interior.

    For any given pixel, ONE of the two stripe families (bright/dark,
    10 px apart at period 20) may cross the search-window edge and jump
    by a period — the min(|dW|, |dB|) selection (CCalculation.cpp:603-618)
    must always pick the family that tracked the true shift."""
    h, w, window = 64, 128, 21
    from slc_tpu import patterns
    f0 = patterns.stripe_pattern(w, h, period=20)
    s = 3
    f1 = np.roll(f0, s, axis=1)
    w0, b0 = stripe_regression(jnp.asarray(f0), window)
    w1, b1 = stripe_regression(jnp.asarray(f1), window)
    dp = np.asarray(select_delta_p(w0, b0, w1, b1))
    # Interior, away from image-border effects.
    inner = dp[window:-window, window:-window]
    assert np.abs(inner + s).max() < 1e-6  # deltaP = prev - cur = -s


def test_dynamic_step_matches_golden(rng):
    """Full dynamic-frame update (track -> select -> blur -> integrate,
    CCalculation.cpp:595-663) against the golden implementation."""
    h, w, window = 48, 64, 7
    f0 = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    f1 = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    pu0 = rng.uniform(100.0, 500.0, size=(h, w))

    sw0, sb0 = stripe_regression(jnp.asarray(f0), window)
    sw1, sb1 = stripe_regression(jnp.asarray(f1), window)
    dp = box_blur_3x3(select_delta_p(sw0, sb0, sw1, sb1))
    pu1 = np.asarray(jnp.asarray(pu0, jnp.float32) + dp)

    gw0, gb0 = golden.windowed_extrema(
        golden.box_sum_vertical(f0, window), window)
    g_pu1, _, _, _ = golden.dynamic_step(pu0, gw0, gb0, f1, window)
    np.testing.assert_allclose(pu1, g_pu1, atol=1e-3)
