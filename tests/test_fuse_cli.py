"""`python -m slc_tpu fuse` — multi-scan registration as a user flow
(BASELINE config 5 surfaced through the CLI), plus the `run
--save-depth` hand-off artifact that feeds it."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from slc_tpu import se3
from slc_tpu.__main__ import main as cli_main
from slc_tpu.calib import synthetic_calibration
from slc_tpu.synth import render_depth_from_pose


def _save_scans(tmp_path, n=3):
    """Depth maps ray-cast from small known motions of the world scene
    (small enough that the CLI's identity initialization converges)."""
    calib = synthetic_calibration(cam_h=96, cam_w=128, cam_f=110.0)
    h, w = 96, 128
    cam_k = np.asarray(calib.cam_k, np.float32)
    paths, rot_gt, trans_gt = [], [], []
    for i in range(n):
        r = np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.02 * i, 0.0],
                                               jnp.float32)), np.float64)
        t = np.array([0.5 * i, 0.05 * i, -0.1 * i])
        rot_gt.append(r)
        trans_gt.append(t)
        depth = render_depth_from_pose(calib, h, w, r, t)
        p = str(tmp_path / f"scan{i}" / "depth_iFrame.npz")
        os.makedirs(os.path.dirname(p))
        np.savez(p, z=np.asarray(depth, np.float32), cam_k=cam_k)
        paths.append(p)
    return paths, np.stack(rot_gt), np.stack(trans_gt)


def test_fuse_cli_end_to_end(tmp_path):
    paths, rot_gt, trans_gt = _save_scans(tmp_path)
    out = str(tmp_path / "fused")
    rc = cli_main(["fuse", *paths, "--out", out, "--rounds", "6",
                   "--grid-step", "6", "--max-depth-err", "2.0"])
    assert rc == 0
    with open(os.path.join(out, "poses.json")) as f:
        poses = json.load(f)
    assert len(poses["world_from_scan"]) == 3
    # Scan 0 is the gauge anchor; recovered relative translations must
    # approach ground truth from the identity initialization.
    for i in (1, 2):
        t = np.asarray(poses["world_from_scan"][i]["trans"])
        err = np.linalg.norm(t - trans_gt[i])
        assert err < 0.25 * np.linalg.norm(trans_gt[i]) + 0.05, (i, t)
    fused = np.loadtxt(os.path.join(out, "fused.txt"))
    assert fused.shape[0] > 2 * 96 * 128  # ~3 scans of valid pixels
    assert fused.shape[1] == 3


def test_fuse_cli_input_validation(tmp_path):
    paths, _, _ = _save_scans(tmp_path, n=2)
    with pytest.raises(SystemExit):
        cli_main(["fuse", paths[0], "--out", str(tmp_path / "x")])
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, foo=np.zeros(3))
    with pytest.raises(SystemExit):
        cli_main(["fuse", paths[0], bad, "--out", str(tmp_path / "y")])
    # cam_k mismatch rejected.
    d = np.load(paths[1])
    other = str(tmp_path / "otherk.npz")
    np.savez(other, z=d["z"], cam_k=d["cam_k"] * 1.5)
    with pytest.raises(SystemExit):
        cli_main(["fuse", paths[0], other, "--out", str(tmp_path / "z")])


def test_run_save_depth(tmp_path):
    from slc_tpu import synth
    from slc_tpu.config import SystemConfig
    from slc_tpu.io.dataset import write_replay_dataset
    from slc_tpu.io.opencv_yaml import save_calibration
    from slc_tpu.runner import run_replay

    cfg = SystemConfig(cam_h=96, cam_w=160, pro_h=96, pro_w=640,
                       gray_bits=5)
    calib = synthetic_calibration(cam_h=cfg.cam_h, cam_w=cfg.cam_w,
                                  pro_h=cfg.pro_h, pro_w=cfg.pro_w)
    scene = synth.render_static_scene(calib, cfg,
                                      synth.plane_surface(50.0),
                                      noise_sigma=1.0)
    root = str(tmp_path / "ds")
    write_replay_dataset(root, scene.gray_images, scene.phase_images)
    save_calibration(os.path.join(root, "parameters.yml"), calib)
    out = str(tmp_path / "out")
    run_replay(root, os.path.join(root, "parameters.yml"), out, cfg,
               save_depth=True)
    d = np.load(os.path.join(out, "depth_iFrame.npz"))
    assert d["z"].shape == (cfg.cam_h, cfg.cam_w)
    assert d["cam_k"].shape == (3, 3)
    valid = d["z"] > 0
    assert valid.mean() > 0.95
    assert np.abs(d["z"][valid] - 50.0).max() < 1.0
