"""Multi-scan bundle adjustment: convergence, ATE, and distributed
parity (landmark-sharded Schur reduction)."""

import numpy as np
import jax.numpy as jnp

from slc_tpu import se3, fusion
from slc_tpu.parallel.fusion_tiled import (fusion_mesh, shard_landmarks,
                                           tiled_fuse_scans)


_make_problem = fusion.synthetic_problem


def test_fusion_exact_recovery(rng):
    obs, mask, rot_gt, trans_gt = _make_problem(rng, noise=0.0)
    rot, trans, lm = fusion.fuse_scans(obs, mask, iters=15)
    ate = float(fusion.ate_rmse(rot, trans, rot_gt, trans_gt))
    assert ate < 1e-3, ate


def test_fusion_noise_ate(rng):
    obs, mask, rot_gt, trans_gt = _make_problem(rng, noise=0.01)
    rot, trans, lm = fusion.fuse_scans(obs, mask, iters=15)
    ate = float(fusion.ate_rmse(rot, trans, rot_gt, trans_gt))
    # ATE should be on the order of the observation noise.
    assert ate < 0.05, ate


def test_fusion_residual_decreases(rng):
    obs, mask, rot_gt, trans_gt = _make_problem(rng, noise=0.005)
    def cost(r, t, x):
        res = fusion.residuals(r, t, x, obs, mask)
        return float(jnp.sum(res * res))
    s = obs.shape[0]
    rot0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (s, 3, 3))
    t0 = jnp.zeros((s, 3), jnp.float32)
    pred = jnp.einsum("sij,slj->sli", rot0, obs)
    lm0 = (pred * mask[..., None]).sum(0) / jnp.maximum(
        mask.sum(0)[:, None], 1.0)
    c0 = cost(rot0, t0, lm0)
    rot, trans, lm = fusion.fuse_scans(obs, mask, iters=15)
    assert cost(rot, trans, lm) < 1e-3 * c0


def test_fusion_distributed_matches_single(eight_devices, rng):
    """16 scans, landmark-sharded over 8 devices: the psum-reduced GN
    must match the single-device solve."""
    obs, mask, rot_gt, trans_gt = _make_problem(rng, s=16, l=128,
                                                noise=0.01)
    rot_s, trans_s, _ = fusion.fuse_scans(obs, mask, iters=10)

    mesh = fusion_mesh(eight_devices)
    obs_d, mask_d = shard_landmarks(mesh, obs, mask)
    rot_d, trans_d, lm_d = tiled_fuse_scans(obs_d, mask_d, mesh, iters=10)
    np.testing.assert_allclose(np.asarray(rot_d), np.asarray(rot_s),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(trans_d), np.asarray(trans_s),
                               atol=1e-3)
    ate = float(fusion.ate_rmse(rot_d, trans_d, rot_gt, trans_gt))
    assert ate < 0.05, ate


def test_register_scans_from_depth_maps(rng):
    """Projective-association ICP + BA: depth maps ray-cast from 4 known
    poses of a world sphere+plane scene, initialized with perturbed
    poses, must converge back to ground truth."""
    import jax.numpy as jnp
    from slc_tpu.calib import synthetic_calibration
    from slc_tpu.synth import render_depth_from_pose
    from slc_tpu.fusion_frontend import register_scans

    # Wide-FOV rig: a narrow FOV sees only the frontal sphere cap,
    # which is normal-degenerate (lateral translation unobservable).
    calib = synthetic_calibration(cam_h=120, cam_w=160, cam_f=130.0)
    h, w = 120, 160
    s = 4
    rot_gt, trans_gt = [], []
    for i in range(s):
        a = 0.06 * i
        r = np.asarray(se3.exp_so3(jnp.asarray([0.0, a, 0.0],
                                               jnp.float32)), np.float64)
        t = np.array([2.0 * i, 0.1 * i, -0.5 * i])
        rot_gt.append(r); trans_gt.append(t)
    rot_gt = np.stack(rot_gt); trans_gt = np.stack(trans_gt)
    depths = np.stack([
        render_depth_from_pose(calib, h, w, rot_gt[i], trans_gt[i])
        for i in range(s)])
    assert all((d > 0).mean() > 0.9 for d in depths)

    # Perturb init poses (except scan 0, the gauge anchor).
    rot0 = rot_gt.copy(); trans0 = trans_gt.copy()
    for i in range(1, s):
        dr = np.asarray(se3.exp_so3(jnp.asarray(
            rng.normal(0, 0.01, 3), jnp.float32)), np.float64)
        rot0[i] = dr @ rot0[i]
        trans0[i] = trans0[i] + rng.normal(0, 0.15, 3)

    rot_f, trans_f = register_scans(
        jnp.asarray(depths, jnp.float32),
        jnp.asarray(np.asarray(calib.cam_k), jnp.float32),
        jnp.asarray(rot0, jnp.float32), jnp.asarray(trans0, jnp.float32),
        rounds=8, gn_iters=5, grid_step=6, max_depth_err=2.0)

    ate0 = float(fusion.ate_rmse(jnp.asarray(rot0, jnp.float32),
                                 jnp.asarray(trans0, jnp.float32),
                                 jnp.asarray(rot_gt, jnp.float32),
                                 jnp.asarray(trans_gt, jnp.float32)))
    ate = float(fusion.ate_rmse(rot_f, trans_f,
                                jnp.asarray(rot_gt, jnp.float32),
                                jnp.asarray(trans_gt, jnp.float32)))
    assert ate < 0.25 * ate0, (ate0, ate)
    assert ate < 0.05, ate


def test_anchor_gauge_align_removes_common_mode(rng):
    """The consensus p2l rounds leave the ensemble's rigid offset to
    the anchor scan at a nonzero fixed point (the ~1/S of anchor-
    landmark observations cannot outvote the self-rebuilt consensus —
    measured as a stalled ~0.1 ATE at 16 scans). anchor_gauge_align
    must remove it: final ATE well under the per-link noise, with the
    ensemble's internal registration untouched (rigid motion only)."""
    import jax.numpy as jnp
    from slc_tpu.calib import synthetic_calibration
    from slc_tpu.synth import render_depth_from_pose
    from slc_tpu.fusion_frontend import register_scans

    h, w = 120, 160
    calib = synthetic_calibration(cam_h=h, cam_w=w, cam_f=130.0)
    s = 8
    center = np.array([0.0, 0.0, 62.0])
    rot_gt, trans_gt = [], []
    for i in range(s):
        r = np.asarray(se3.exp_so3(jnp.asarray(
            [0.01 * (i - 4), 0.05 * (i - 4), 0.0], jnp.float32)),
            np.float64)
        t = (np.eye(3) - r) @ center
        rot_gt.append(r)
        trans_gt.append(t)
    rot_gt = np.stack(rot_gt)
    trans_gt = np.stack(trans_gt)
    depths = np.stack([
        render_depth_from_pose(calib, h, w, rot_gt[i], trans_gt[i])
        for i in range(s)]).astype(np.float32)

    # Coherent common-mode perturbation (the failure mode): every
    # non-anchor scan shifted by the SAME offset plus small noise.
    rot0 = rot_gt.copy()
    trans0 = trans_gt.copy()
    common = np.array([0.12, -0.05, 0.08])
    for i in range(1, s):
        trans0[i] = trans0[i] + common + rng.normal(0, 0.02, 3)

    gtr = jnp.asarray(rot_gt, jnp.float32)
    gtt = jnp.asarray(trans_gt, jnp.float32)
    args = (jnp.asarray(depths),
            jnp.asarray(np.asarray(calib.cam_k), jnp.float32),
            jnp.asarray(rot0, jnp.float32),
            jnp.asarray(trans0, jnp.float32))
    kw = dict(rounds=6, gn_iters=5, grid_step=6, max_depth_err=2.0)
    r_no, t_no = register_scans(*args, anchor_gauge=False, **kw)
    r_yes, t_yes = register_scans(*args, anchor_gauge=True, **kw)
    ate_no = float(fusion.ate_rmse(r_no, t_no, gtr, gtt))
    ate_yes = float(fusion.ate_rmse(r_yes, t_yes, gtr, gtt))
    assert ate_yes < 0.05, (ate_yes, ate_no)
    assert ate_yes < 0.5 * max(ate_no, 1e-9), (ate_yes, ate_no)
