"""Pallas kernel parity vs the XLA ops (interpreter mode on CPU; the
compiled TPU path is exercised by bench/TPU runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from slc_tpu.ops.stripe import stripe_regression
from slc_tpu.pallas.stripe import stripe_regression_pallas


@pytest.mark.parametrize("subpixel", [False, True])
@pytest.mark.parametrize("shape", [(96, 160), (100, 200)])
def test_pallas_stripe_matches_xla(rng, subpixel, shape):
    frame = rng.integers(0, 256, size=shape, dtype=np.uint8)
    f = jnp.asarray(frame)
    rw, rb = stripe_regression(f, 21, subpixel)
    gw, gb = stripe_regression_pallas(f, 21, subpixel, block_h=32,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=1e-5)
