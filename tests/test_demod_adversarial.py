"""Adversarial phase-lock scenes (VERDICT r4 item 6).

Phase-locked tracking assumes a sinusoidal carrier at a KNOWN period T
(ops/demod.py). These tests drive the assumptions off nominal —
non-sinusoidal stripe profile, lock period mismatched +-5%, defocus
blur — and assert GRACEFUL DEGRADATION: the locked tracker must stay
within the free-running tracker's error envelope on the same corrupted
sequence (never diverge because of a bad correction), with the
amplitude/confidence gates (amp_floor, sin^2 confidence) doing the
protecting. The failure envelope is documented in ops/demod.py."""

import os

import numpy as np
import jax.numpy as jnp

from slc_tpu import synth, patterns
from slc_tpu.calib import synthetic_calibration, build_tables
from slc_tpu.config import SystemConfig
from slc_tpu.dynamic import init_tracker, run_sequence

T = 12          # projector-space stripe period (camera-space ~21 px)
N_FRAMES = 15
DZ = 0.15


def _rig():
    cfg = SystemConfig(cam_h=96, cam_w=160, pro_h=96, pro_w=640,
                       gray_bits=5)
    calib = synthetic_calibration(cam_h=cfg.cam_h, cam_w=cfg.cam_w,
                                  pro_h=cfg.pro_h, pro_w=cfg.pro_w)
    return cfg, calib, build_tables(calib, cfg.cam_h, cfg.cam_w)


def _render(cfg, calib, profile, blur_sigma=0.0, noise=1.0, seed=0):
    """Moving-plane sequence with a custom carrier ``profile(pu)`` in
    [0, 255] and optional camera-side Gaussian defocus blur."""
    rng = np.random.default_rng(seed)
    frames = np.empty((N_FRAMES, cfg.cam_h, cfg.cam_w), np.uint8)
    z_gt = np.empty((N_FRAMES, cfg.cam_h, cfg.cam_w))
    pu_gt = np.empty_like(z_gt)
    if blur_sigma > 0:
        rad = int(np.ceil(3 * blur_sigma))
        k = np.exp(-0.5 * (np.arange(-rad, rad + 1) / blur_sigma) ** 2)
        k /= k.sum()
    for f in range(N_FRAMES):
        z, pu = synth.surface_geometry(
            calib, cfg, synth.plane_surface(50.0 + DZ * f))
        img = profile(pu)
        if blur_sigma > 0:
            img = np.apply_along_axis(
                lambda r: np.convolve(r, k, mode="same"), 1, img)
        img = img + rng.normal(0.0, noise, img.shape)
        frames[f] = np.clip(np.round(img), 0, 255).astype(np.uint8)
        z_gt[f], pu_gt[f] = z, pu
    return frames, z_gt, pu_gt


def _track(cfg, tables, frames, z0, pu0, phase_lock):
    st = init_tracker(jnp.asarray(frames[0]),
                      jnp.asarray(pu0, jnp.float32),
                      jnp.asarray(z0, jnp.float32), cfg)
    st, res = run_sequence(st, jnp.asarray(frames[1:]), tables, cfg,
                           phase_lock=phase_lock, lock_win_u=21,
                           lock_win_v=9)
    return np.asarray(res.z[-1])


def _median_err(cfg, z_last, z_gt_last):
    r = cfg.reco_window // 2 + 2
    zi = z_last[r:-r, r:-r]
    gi = z_gt_last[r:-r, r:-r]
    v = zi > 0
    assert v.mean() > 0.85, "tracker lost most of the image"
    assert np.isfinite(zi).all()
    return float(np.median(np.abs(zi[v] - gi[v])))


def _locked_vs_free(profile, blur_sigma=0.0, lock_period=float(T),
                    seed=0):
    cfg, calib, tables = _rig()
    frames, z_gt, pu_gt = _render(cfg, calib, profile,
                                  blur_sigma=blur_sigma, seed=seed)
    locked = _median_err(cfg, _track(cfg, tables, frames, z_gt[0],
                                     pu_gt[0], lock_period),
                         z_gt[-1])
    free = _median_err(cfg, _track(cfg, tables, frames, z_gt[0],
                                   pu_gt[0], None), z_gt[-1])
    return locked, free


def test_lock_clean_baseline():
    """Nominal conditions: the lock beats free-running tracking (the
    reference point for the degradation bounds below)."""
    locked, free = _locked_vs_free(lambda pu: patterns.stripe_at(pu, T))
    assert locked < 0.05, locked
    assert locked < free + 0.02, (locked, free)


def test_lock_nonsinusoidal_profile_degrades_gracefully():
    """Clipped, odd-harmonic-rich carrier (40% third harmonic, hard
    saturation): the arccos per-pixel refinement's sinusoid assumption
    is broken; the correlation term still locks to the fundamental.
    The locked tracker must stay within the free-running envelope."""
    def prof(pu):
        phi = 2.0 * np.pi * pu / T
        raw = np.cos(phi) + 0.4 * np.cos(3 * phi)
        return np.clip((raw + 1.0) * 127.0, 0.0, 230.0)
    locked, free = _locked_vs_free(prof)
    assert locked < max(1.5 * free, 0.08), (locked, free)


def test_lock_period_mismatch_degrades_to_free_running():
    """Lock period wrong by +-2-5%: the carrier-consistency gate
    (ops/demod.py max_carrier_gradient) must detect the constant
    spatial gradient a wrong period leaves in the demodulated offset
    and zero the correction — the tracker falls back EXACTLY to
    free-running behavior (measured before the gate existed: ~2 scene
    units of corruption, 30x worse than free-running)."""
    for mis in (1.05, 1.02, 0.98, 0.95):
        locked, free = _locked_vs_free(
            lambda pu: patterns.stripe_at(pu, T),
            lock_period=float(T) * mis)
        assert abs(locked - free) < 0.02, (mis, locked, free)


def test_lock_defocus_blur_degrades_gracefully():
    """Heavy defocus (sigma ~ T_cam/4 in camera px): modulation
    amplitude collapses toward amp_floor; gated pixels fall back to
    the open-loop prediction rather than absorbing garbage
    corrections."""
    locked, free = _locked_vs_free(
        lambda pu: patterns.stripe_at(pu, T), blur_sigma=5.0)
    assert locked < max(1.5 * free, 0.15), (locked, free)


def test_lock_extreme_blur_gates_off():
    """Near-total defocus: almost every pixel should fail the amplitude
    gate, making locked == free-running (the correction is a no-op, not
    a corruption)."""
    cfg, calib, tables = _rig()
    frames, z_gt, pu_gt = _render(
        cfg, calib, lambda pu: patterns.stripe_at(pu, T),
        blur_sigma=12.0)
    z_lock = _track(cfg, tables, frames, z_gt[0], pu_gt[0], float(T))
    z_free = _track(cfg, tables, frames, z_gt[0], pu_gt[0], None)
    # The amp gate zeroes the correction wherever modulation died, so
    # the two trackers agree almost everywhere.
    agree = np.isclose(z_lock, z_free, atol=1e-3).mean()
    assert agree > 0.9, agree


def test_estimate_period_recovers_from_wrong_nominal():
    """demod.estimate_period: from a +-5-10% wrong nominal, one frame +
    the absolute map recover the carrier period to ~0.25% (the
    estimator's documented chirp-bias floor) — inside the carrier
    gate's pass band."""
    from slc_tpu.ops.demod import estimate_period
    cfg, calib, tables = _rig()
    frames, z_gt, pu_gt = _render(cfg, calib,
                                  lambda pu: patterns.stripe_at(pu, T))
    pu0 = jnp.asarray(pu_gt[0], jnp.float32)
    fr = jnp.asarray(frames[0])
    for nominal in (1.05, 0.95, 1.10, 0.90):
        t = float(estimate_period(fr, pu0, float(T) * nominal,
                                  win_u=21, win_v=9))
        assert abs(t - T) / T < 0.005, (nominal, t)


def test_runner_period_diagnostic_and_refine(tmp_path):
    """The runner measures the carrier period at init and logs it; a
    manifest period off by 5% produces a warning, and refine_period
    adopts the measured value (metrics period_diag record)."""
    import json
    import warnings
    from slc_tpu.io.dataset import load_manifest, write_manifest
    from slc_tpu.runner import run_replay
    from slc_tpu.__main__ import main as cli_main

    root = str(tmp_path / "ds")
    rc = cli_main(["synth", root, "--frames", "3", "--cam", "96x160",
                   "--pro", "96x640", "--gray-bits", "5"])
    assert rc == 0
    man = load_manifest(root)
    true_period = float(man["stripe_period"])
    man["stripe_period"] = true_period * 1.05      # 5% wrong
    write_manifest(root, man)

    out = str(tmp_path / "out")
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        report = run_replay(root, os.path.join(root, "parameters.yml"),
                            out, _cfg_for(root), write_clouds=False,
                            refine_period=True)
    assert any("deviates" in str(w.message) for w in wlist), \
        [str(w.message) for w in wlist]
    diag = [r for r in report.metrics.summaries
            if r.get("period_diag")]
    assert len(diag) == 1
    d = diag[0]
    assert d["period_adopted"] is True
    assert d["period_deviation_pct"] > 1.0
    # The adopted estimate is close to the TRUE period.
    assert abs(d["period_estimated"] - true_period) / true_period < 0.01


def _cfg_for(root):
    from slc_tpu.io.dataset import load_manifest
    from slc_tpu.config import SystemConfig
    m = load_manifest(root)
    return SystemConfig(cam_h=m["cam_h"], cam_w=m["cam_w"],
                        pro_h=m["pro_h"], pro_w=m["pro_w"],
                        gray_bits=m["gray_bits"])
