"""Test environment: force the CPU backend with 8 virtual devices so
sharding/halo-exchange/psum paths run without a TPU slice (SURVEY.md §4's
TPU-idiomatic fake-backend analog). Must run before jax is imported.

Set SLC_TEST_TPU=1 to keep the real backend instead — this enables the
compiled-Pallas parity tests in test_pallas_compiled.py (which skip on
CPU) and makes everything else run single-device on the chip."""

import os

_USE_TPU = os.environ.get("SLC_TEST_TPU", "") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

import jax  # noqa: E402  (after env setup)

if not _USE_TPU and jax.config.jax_platforms != "cpu":
    # A site hook may pin jax_platforms at the CONFIG level (e.g.
    # 'axon,cpu'), overriding the env vars above; force the CPU
    # backend. Checked via the config value, NOT jax.default_backend():
    # probing the default backend would initialize the site's TPU
    # platform first, after which the update no longer redirects
    # already-created contexts and tests silently run on the TPU.
    jax.config.update("jax_platforms", "cpu")
if _USE_TPU:
    # TPU compiles through a tunnel are slow; persist them.
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def assert_heterodyne_parity(pu, ref_pu, fine_period, max_divergent):
    """Tight Pallas<->XLA heterodyne parity (VERDICT r2 item 5): the
    fp-reassociation beat-order flips must be pinned by COUNT (not
    fraction), each divergent pixel's error must be exactly +-1 FINE
    fringe order, and the divergence must be spatially isolated (no
    2x2 block fully divergent — a coherent region would mean a real
    kernel bug, not rounding). A regression that doubles boundary
    flips fails the count bound. Returns the agreement mask."""
    err = np.asarray(pu) - np.asarray(ref_pu)
    div = np.abs(err) >= 1e-2
    n = int(div.sum())
    assert n <= max_divergent, (
        f"{n} beat-order-divergent pixels (bound {max_divergent})")
    if n:
        orders = err[div] / fine_period
        np.testing.assert_allclose(
            np.abs(orders), 1.0, atol=0.02,
            err_msg="divergence is not exactly +-1 fine fringe order")
        blk = (div[:-1, :-1] & div[1:, :-1]
               & div[:-1, 1:] & div[1:, 1:])
        assert not blk.any(), "coherent 2x2 divergent region"
    return ~div


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
