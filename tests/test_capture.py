"""Acquisition layer: simulated rig closes the loop — patterns captured
through the rig must decode to the correct absolute projector map."""

import numpy as np
import jax.numpy as jnp

from slc_tpu import synth
from slc_tpu.calib import synthetic_calibration, build_tables
from slc_tpu.capture import (ReplaySensor, SimulatedRig, capture_sequence,
                             structured_light_patterns)
from slc_tpu.config import SystemConfig
from slc_tpu.pipeline import decode_first_frame

CFG = SystemConfig(cam_h=96, cam_w=160, pro_h=96, pro_w=640, gray_bits=5)


def test_capture_through_simulated_rig():
    calib = synthetic_calibration(cam_h=CFG.cam_h, cam_w=CFG.cam_w,
                                  pro_h=CFG.pro_h, pro_w=CFG.pro_w)
    tables = build_tables(calib, CFG.cam_h, CFG.cam_w)
    rig = SimulatedRig(calib, CFG, synth.plane_surface(50.0),
                       noise_sigma=1.0)
    imgs = capture_sequence(rig, structured_light_patterns(CFG))
    assert len(imgs) == 2 * CFG.gray_bits + CFG.phase_steps

    gray = jnp.asarray(np.stack(imgs[:2 * CFG.gray_bits]))
    phase = jnp.asarray(np.stack(imgs[2 * CFG.gray_bits:]))
    res = decode_first_frame(gray, phase, tables, CFG)
    z = np.asarray(res.z)
    valid = z > 0
    assert valid.mean() > 0.95
    # The rig samples patterns at whole projector columns (DMD-style),
    # quantizing the fringe: ~0.3 px phase noise -> ~0.1 z units RMSE.
    assert np.sqrt(np.mean((z[valid] - 50.0) ** 2)) < 0.2


def test_replay_sensor_sequencing(rng):
    imgs = rng.integers(0, 256, (3, 8, 8), dtype=np.uint8)
    s = ReplaySensor(imgs)
    got = capture_sequence(s, [None, None, None])
    np.testing.assert_array_equal(np.stack(got), imgs)
