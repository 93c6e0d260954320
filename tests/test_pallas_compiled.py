"""Compiled-path Pallas parity: the same kernel-vs-XLA comparisons as
test_pallas.py, but with interpret=False on real TPU hardware — so the
Mosaic-compiled kernels that serve production paths are tested compiled,
not only interpreted (VERDICT round 1, item 8).

Skipped unless the backend is a TPU; run with

    SLC_TEST_TPU=1 python -m pytest tests/test_pallas_compiled.py -v

(conftest.py forces CPU otherwise)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="compiled Pallas parity needs a TPU backend "
           "(set SLC_TEST_TPU=1)")


def test_compiled_stripe_matches_xla(rng):
    from slc_tpu.ops.stripe import stripe_regression
    from slc_tpu.pallas.stripe import stripe_regression_pallas

    frame = rng.integers(0, 256, size=(256, 384), dtype=np.uint8)
    f = jnp.asarray(frame)
    for subpixel in (False, True):
        rw, rb = stripe_regression(f, 21, subpixel)
        gw, gb = stripe_regression_pallas(f, 21, subpixel)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                                   atol=1e-4)


def test_compiled_dynamic_step_matches_xla(rng):
    from slc_tpu.config import SystemConfig
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu.dynamic import TrackerState, dynamic_step
    from slc_tpu.pallas.dynamic_step import dynamic_step_pallas

    h, w = 256, 384
    cfg = SystemConfig(cam_h=h, cam_w=w, pro_h=h, pro_w=640, gray_bits=5)
    calib = synthetic_calibration(cam_h=h, cam_w=w, pro_h=h, pro_w=640)
    tables = build_tables(calib, h, w)
    frame = jnp.asarray(rng.integers(0, 256, (h, w), dtype=np.uint8))
    r = cfg.reco_window // 2
    mask = np.zeros((h, w), np.float32)
    mask[r:-r, r:-r] = 1.0
    sw0 = jnp.asarray(rng.uniform(-5, 5, (h, w)) * mask, jnp.float32)
    sb0 = jnp.asarray(rng.uniform(-5, 5, (h, w)) * mask, jnp.float32)
    pu0 = jnp.asarray(rng.uniform(100, 500, (h, w)), jnp.float32)

    st = TrackerState(proj_u=jnp.array(pu0), strip_w=jnp.array(sw0),
                      strip_b=jnp.array(sb0),
                      z=jnp.zeros((h, w), jnp.float32),
                      frame_idx=jnp.int32(0))
    _, ref = dynamic_step(st, frame, tables, cfg, use_pallas=False)

    scalars = jnp.stack([
        tables.a, tables.b, tables.fx, tables.fy, tables.cx, tables.cy,
        jnp.float32(cfg.fov_min), jnp.float32(cfg.fov_max)]).reshape(1, 8)
    pu, sw, sb, z, x, y = dynamic_step_pallas(
        frame, sw0, sb0, pu0, tables.c, tables.d, scalars,
        window=cfg.reco_window)
    np.testing.assert_allclose(np.asarray(pu), np.asarray(ref.proj_u),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref.z),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               atol=2e-4)


def test_compiled_heterodyne_matches_xla(rng):
    from slc_tpu.config import TEST_CONFIG, HeterodyneConfig
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu import synth
    from slc_tpu.pipeline import decode_heterodyne_frame
    from slc_tpu.pallas.heterodyne import heterodyne_decode_pallas

    cfg = TEST_CONFIG
    het = HeterodyneConfig()
    calib = synthetic_calibration()
    tables = build_tables(calib, cfg.cam_h, cfg.cam_w)
    imgs, _, _ = synth.render_fringe_stack(
        calib, cfg, synth.sphere_surface(), het.periods(cfg.pro_w),
        het.phase_steps, noise_sigma=1.0)
    imgs = jnp.asarray(imgs)

    ref = decode_heterodyne_frame(imgs, tables, cfg, het,
                                  use_pallas=False)
    scalars = jnp.stack([
        tables.a, tables.b, tables.fx, tables.fy, tables.cx, tables.cy,
        jnp.float32(0.0), jnp.float32(0.0)]).reshape(1, 8)
    x, y, z, pu = heterodyne_decode_pallas(
        imgs, tables.c, tables.d, scalars,
        periods=het.periods(cfg.pro_w), extent=float(cfg.pro_w),
        n_steps=het.phase_steps, fov_min=cfg.fov_min,
        fov_max=cfg.fov_max)
    # Same beat-order rounding caveat as the interpreter test: fp
    # reassociation in the compiled kernel can flip order rounding on
    # isolated boundary pixels. Count pinned (~300 max at this scale,
    # <0.1%), each flip exactly +-1 fine order, no coherent region
    # (conftest.assert_heterodyne_parity).
    from conftest import assert_heterodyne_parity
    m = assert_heterodyne_parity(pu, ref.proj_u,
                                 het.periods(cfg.pro_w)[0],
                                 max_divergent=300)
    np.testing.assert_allclose(np.asarray(z)[m], np.asarray(ref.z)[m],
                               atol=1e-3)


def test_compiled_grayphase_matches_xla(rng):
    from slc_tpu.config import TEST_CONFIG
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu import synth
    from slc_tpu.pipeline import decode_first_frame
    from slc_tpu.pallas.grayphase import grayphase_decode_pallas

    cfg = TEST_CONFIG
    calib = synthetic_calibration()
    tables = build_tables(calib, cfg.cam_h, cfg.cam_w)
    scene = synth.render_static_scene(calib, cfg, synth.sphere_surface(),
                                      noise_sigma=1.0)
    g = jnp.asarray(scene.gray_images)
    p = jnp.asarray(scene.phase_images)

    ref = decode_first_frame(g, p, tables, cfg, min_modulation=2.0,
                             use_pallas=False)
    scalars = jnp.stack([
        tables.a, tables.b, tables.fx, tables.fy, tables.cx,
        tables.cy, jnp.float32(0.0), jnp.float32(0.0)]).reshape(1, 8)
    x, y, z, pu = grayphase_decode_pallas(
        jnp.concatenate([g, p], axis=0), tables.c, tables.d, scalars,
        gray_bits=cfg.gray_bits, gray_period=float(cfg.gray_period),
        phase_period=float(cfg.phase_period), n_steps=cfg.phase_steps,
        min_modulation=2.0, fov_min=cfg.fov_min, fov_max=cfg.fov_max)
    np.testing.assert_allclose(np.asarray(pu), np.asarray(ref.proj_u),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref.z),
                               atol=1e-3)


def test_compiled_stripe_fast_frac_matches_exact(rng):
    """Compiled fast sub-pixel mode (frac_bits=7): identical winner to
    the exact carry, fraction within one quantization step plus the
    approx-reciprocal error (mathx.sliding_extrema)."""
    from slc_tpu.pallas.stripe import stripe_regression_pallas

    frame = rng.integers(0, 256, size=(256, 384), dtype=np.uint8)
    f = jnp.asarray(frame)
    ew, eb = stripe_regression_pallas(f, 21, True)
    fw, fb = stripe_regression_pallas(f, 21, True, frac_bits=7)
    step = 1.0 / (1 << 7) + 1e-3          # quantum + approx-recip
    np.testing.assert_allclose(np.asarray(fw), np.asarray(ew), atol=step)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(eb), atol=step)


def test_compiled_phase_lock_matches_xla(rng):
    """Compiled fused phase-lock kernel vs the XLA demod path."""
    from slc_tpu.config import SystemConfig
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu import synth
    from slc_tpu.ops.demod import stripe_phase_correction
    from slc_tpu.pallas.phaselock import phase_lock_pallas

    h, w = 256, 384
    cfg = SystemConfig(cam_h=h, cam_w=w, pro_h=h, pro_w=640,
                       gray_bits=5)
    calib = synthetic_calibration(cam_h=h, cam_w=w, pro_h=h, pro_w=640)
    tables = build_tables(calib, h, w)
    frames, _, pu_gt = synth.render_dynamic_sequence(
        calib, cfg, 2, stripe_period=12, noise_sigma=1.0)
    pred = jnp.asarray(pu_gt[1] + 1.3, jnp.float32)
    fr = jnp.asarray(frames[1])
    dp, _ = stripe_phase_correction(fr, pred, 12.0, 21, 9)
    pu_ref = pred + dp
    scal = jnp.stack([tables.a, tables.b, tables.fx, tables.fy,
                      tables.cx, tables.cy, jnp.float32(0.0),
                      jnp.float32(0.0)]).reshape(1, 8)
    pu_k, z_k, x_k, y_k = phase_lock_pallas(
        fr, pred, tables.c, tables.d, scal, period=12.0, win_u=21,
        win_v=9, fov_min=cfg.fov_min, fov_max=cfg.fov_max)
    np.testing.assert_allclose(np.asarray(pu_k), np.asarray(pu_ref),
                               atol=5e-3)


def test_compiled_phase_locked_tracking_sequence(rng):
    """End-to-end locked tracking on the compiled fused path (dynamic
    step kernel + phase-lock kernel), 12 frames on chip: terminal
    median z error stays at the per-frame noise level."""
    import numpy as np
    from slc_tpu import synth
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu.config import SystemConfig
    from slc_tpu.dynamic import init_tracker, dynamic_step

    h, w = 128, 256
    cfg = SystemConfig(cam_h=h, cam_w=w, pro_h=h, pro_w=640,
                       gray_bits=5)
    calib = synthetic_calibration(cam_h=h, cam_w=w, pro_h=h, pro_w=640)
    tables = build_tables(calib, h, w)
    frames, z_gt, pu_gt = synth.render_dynamic_sequence(
        calib, cfg, 12, z0=50.0, dz_per_frame=0.3, stripe_period=12,
        noise_sigma=1.0)
    st = init_tracker(jnp.asarray(frames[0]),
                      jnp.asarray(pu_gt[0], jnp.float32),
                      jnp.asarray(z_gt[0], jnp.float32), cfg)
    for f in range(1, 12):
        st, res = dynamic_step(st, jnp.asarray(frames[f]), tables, cfg,
                               phase_lock=12.0, lock_win_u=21,
                               lock_win_v=9, frac_bits=7)
    z = np.asarray(res.z)
    r = cfg.reco_window // 2 + 2
    zi, gi = z[r:-r, r:-r], z_gt[-1][r:-r, r:-r]
    v = zi > 0
    assert v.mean() > 0.9
    assert float(np.median(np.abs(zi[v] - gi[v]))) < 0.05


def test_compiled_fused_locked_step_matches_xla(rng):
    """Compiled one-pass locked step vs the XLA composite on chip."""
    from slc_tpu.config import SystemConfig
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu import synth
    from slc_tpu.dynamic import init_tracker, dynamic_step
    from slc_tpu.pallas.dynamic_lock import dynamic_step_lock_pallas

    h, w = 256, 384
    cfg = SystemConfig(cam_h=h, cam_w=w, pro_h=h, pro_w=640,
                       gray_bits=5)
    calib = synthetic_calibration(cam_h=h, cam_w=w, pro_h=h, pro_w=640)
    tables = build_tables(calib, h, w)
    frames, z_gt, pu_gt = synth.render_dynamic_sequence(
        calib, cfg, 2, stripe_period=12, noise_sigma=1.0)
    st = init_tracker(jnp.asarray(frames[0]),
                      jnp.asarray(pu_gt[0], jnp.float32),
                      jnp.asarray(z_gt[0], jnp.float32), cfg,
                      use_pallas=False)
    scal = jnp.stack([tables.a, tables.b, tables.fx, tables.fy,
                      tables.cx, tables.cy, jnp.float32(cfg.fov_min),
                      jnp.float32(cfg.fov_max)]).reshape(1, 8)
    pu_k, sw_k, sb_k, z_k, x_k, y_k = dynamic_step_lock_pallas(
        jnp.asarray(frames[1]), st.strip_w, st.strip_b, st.proj_u,
        tables.c, tables.d, scal, window=cfg.reco_window,
        fov_min=cfg.fov_min, fov_max=cfg.fov_max, period=12.0,
        win_u=21, win_v=9)
    jax.block_until_ready(pu_k)
    st2, res2 = dynamic_step(st, jnp.asarray(frames[1]), tables, cfg,
                             use_pallas=False, phase_lock=12.0,
                             lock_win_u=21, lock_win_v=9)
    np.testing.assert_allclose(np.asarray(pu_k),
                               np.asarray(res2.proj_u), atol=5e-3)
    np.testing.assert_array_equal(np.asarray(sw_k),
                                  np.asarray(st2.strip_w))
    np.testing.assert_allclose(np.asarray(z_k), np.asarray(res2.z),
                               atol=1e-2)


def test_compiled_locked_step_period_mismatch_gates_off(rng):
    """The fused locked kernel's per-block carrier-consistency gate
    (pallas/dynamic_lock.py): tracking with a 3% wrong lock period on
    chip must reduce to the open-loop kernel's result, not corrupt it
    (same guarantee as the XLA path's global gate,
    tests/test_demod_adversarial.py)."""
    import numpy as np
    from slc_tpu import synth
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu.config import SystemConfig
    from slc_tpu.dynamic import init_tracker, dynamic_step

    h, w = 128, 256
    cfg = SystemConfig(cam_h=h, cam_w=w, pro_h=h, pro_w=640,
                       gray_bits=5)
    calib = synthetic_calibration(cam_h=h, cam_w=w, pro_h=h, pro_w=640)
    tables = build_tables(calib, h, w)
    frames, z_gt, pu_gt = synth.render_dynamic_sequence(
        calib, cfg, 8, z0=50.0, dz_per_frame=0.3, stripe_period=12,
        noise_sigma=1.0)

    def run(lock):
        st = init_tracker(jnp.asarray(frames[0]),
                          jnp.asarray(pu_gt[0], jnp.float32),
                          jnp.asarray(z_gt[0], jnp.float32), cfg)
        for f in range(1, 8):
            st, res = dynamic_step(st, jnp.asarray(frames[f]), tables,
                                   cfg, phase_lock=lock, lock_win_u=21,
                                   lock_win_v=9, frac_bits=7)
        return np.asarray(res.z)

    z_bad = run(12.0 * 1.03)
    z_free = run(None)
    agree = np.isclose(z_bad, z_free, atol=1e-3).mean()
    assert agree > 0.95, agree
    # And the CORRECT period still helps (gate stays open nominally).
    z_good = run(12.0)
    r = cfg.reco_window // 2 + 2
    v = z_good[r:-r, r:-r] > 0
    e_good = np.median(np.abs((z_good - z_gt[-1])[r:-r, r:-r][v]))
    e_free = np.median(np.abs((z_free - z_gt[-1])[r:-r, r:-r][v]))
    assert e_good <= e_free + 0.02, (e_good, e_free)


def test_compiled_mg_level_kernels_match_xla(rng):
    """Compiled fused MG level kernels vs the XLA vcycle ops on chip
    (source-exact association; only compiler FMA contraction differs)."""
    from slc_tpu.ops import unwrap_spatial as U
    from slc_tpu.pallas.mgsmooth import mg_down_pallas, mg_up_pallas

    h, w = 384, 512
    om = jnp.float32(0.9)
    q = jnp.asarray(rng.uniform(0.1, 1.0, (h, w)).astype(np.float32))
    wy, wx = U.edge_weights(q)
    dinv = 1.0 / U._diag(wy, wx)
    r = jnp.asarray(rng.normal(0, 1, (h, w)).astype(np.float32))

    e_ref = om * dinv * r
    e_ref = e_ref + om * dinv * (r - U._matvec(e_ref, wy, wx))
    res_ref = r - U._matvec(e_ref, wy, wx)
    e_k, res_k = mg_down_pallas(r, wy, wx, dinv)
    np.testing.assert_allclose(np.asarray(e_k), np.asarray(e_ref),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(res_k), np.asarray(res_ref),
                               atol=5e-6)

    e0 = jnp.asarray(rng.normal(0, 1, (h, w)).astype(np.float32))
    e_ref = e0
    for _ in range(2):
        e_ref = e_ref + om * dinv * (r - U._matvec(e_ref, wy, wx))
    e_k = mg_up_pallas(e0, r, wy, wx, dinv)
    np.testing.assert_allclose(np.asarray(e_k), np.asarray(e_ref),
                               atol=5e-6)
