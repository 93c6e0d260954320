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


def test_capture_cli_dataset_reconstructs(tmp_path):
    """`python -m slc_tpu capture` acquires a dataset through the
    project->capture loop that `run` then reconstructs accurately —
    the live-mode acquisition workflow end-to-end."""
    import os
    from slc_tpu.__main__ import main as cli_main
    from slc_tpu.runner import run_replay
    from slc_tpu.config import SystemConfig

    root = str(tmp_path / "cap")
    rc = cli_main(["capture", root, "--scene", "plane", "--frames", "3",
                   "--cam", "96x160", "--pro", "96x640",
                   "--gray-bits", "5"])
    assert rc == 0
    assert os.path.exists(os.path.join(root, "iFrame", "vGrayCam9.bmp"))
    assert os.path.exists(os.path.join(root, "cFrame", "dynaCam2.bmp"))

    cfg = SystemConfig(cam_h=96, cam_w=160, pro_h=96, pro_w=640,
                       gray_bits=5)
    out = str(tmp_path / "out")
    report = run_replay(root, os.path.join(root, "parameters.yml"), out,
                        cfg)
    assert report.frames_done == 2
    pts = np.loadtxt(os.path.join(out, "iFrame.txt"))
    assert (np.abs(pts[:, 2] - 50.0) < 1.0).mean() > 0.99


class _FlakySensor:
    """Fails the first ``fail_n`` captures after each project() with
    IOError — the reference camera's snapshot failure mode its retry
    loop exists for (CCamera.cpp:97-107)."""

    def __init__(self, img, fail_n):
        self.img = img
        self.fail_n = fail_n
        self.attempts = 0

    def project(self, pattern):
        self._left = self.fail_n

    def capture(self):
        self.attempts += 1
        if self._left > 0:
            self._left -= 1
            raise IOError("snapshot failed")
        return self.img


def test_capture_retries_then_succeeds():
    img = np.full((4, 4), 7, np.uint8)
    s = _FlakySensor(img, fail_n=3)
    got = capture_sequence(s, [None, None], retries=30)
    assert len(got) == 2
    np.testing.assert_array_equal(got[0], img)
    # 3 failures + 1 success per pattern.
    assert s.attempts == 8


def test_capture_retries_exhausted():
    import pytest
    s = _FlakySensor(np.zeros((4, 4), np.uint8), fail_n=99)
    with pytest.raises(IOError, match="after 5 tries"):
        capture_sequence(s, [None], retries=5)
    assert s.attempts == 5
