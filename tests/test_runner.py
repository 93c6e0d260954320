"""End-to-end replay runner: synth dataset -> reconstruction -> clouds,
metrics, checkpoint/resume (the main.cpp flow, DynaFrame/main.cpp:42-45)."""

import os

import numpy as np
import jax.numpy as jnp

from slc_tpu import synth
from slc_tpu.calib import synthetic_calibration
from slc_tpu.checkpoint import save_state, load_state, latest_checkpoint
from slc_tpu.config import SystemConfig
from slc_tpu.dynamic import TrackerState
from slc_tpu.io.dataset import write_replay_dataset
from slc_tpu.io.opencv_yaml import save_calibration
from slc_tpu.runner import run_replay

CFG = SystemConfig(cam_h=96, cam_w=160, pro_h=96, pro_w=640, gray_bits=5)


def _make_dataset(root):
    calib = synthetic_calibration(cam_h=CFG.cam_h, cam_w=CFG.cam_w,
                                  pro_h=CFG.pro_h, pro_w=CFG.pro_w)
    scene = synth.render_static_scene(calib, CFG,
                                      synth.plane_surface(50.0),
                                      noise_sigma=1.0)
    frames, zs, _ = synth.render_dynamic_sequence(
        calib, CFG, 4, z0=50.0, dz_per_frame=0.3, stripe_period=12,
        noise_sigma=1.0)
    write_replay_dataset(root, scene.gray_images, scene.phase_images,
                         frames)
    save_calibration(os.path.join(root, "parameters.yml"), calib)
    return calib, scene, zs


def test_run_replay_end_to_end(tmp_path):
    root = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    _, scene, zs = _make_dataset(root)

    report = run_replay(root, os.path.join(root, "parameters.yml"), out,
                        CFG, checkpoint_every=2)
    assert report.frames_done == 3
    assert report.first_frame_points > 0.95 * CFG.cam_h * CFG.cam_w
    assert os.path.exists(os.path.join(out, "iFrame.txt"))
    assert os.path.exists(os.path.join(out, "cFrame3.txt"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))

    # Per-stage achieved GB/s lands in the metrics (SURVEY §5; VERDICT
    # r2 item 7): the decode stage on frame 0's record, the dynamic
    # step on a later frame's.
    import json
    with open(os.path.join(out, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert recs[0]["gbps_first_frame"] > 0
    assert any(r.get("gbps_dynamic_step", 0) > 0 for r in recs[1:])

    # Frame-0 cloud accuracy vs the analytic plane.
    pts = np.loadtxt(os.path.join(out, "iFrame.txt"))
    interior = np.abs(pts[:, 2] - 50.0) < 1.0
    assert interior.mean() > 0.99

    # Resume from the frame-2 checkpoint reproduces frame 3 exactly.
    c3 = np.loadtxt(os.path.join(out, "cFrame3.txt"))
    os.remove(os.path.join(out, "cFrame3.txt"))
    report2 = run_replay(root, os.path.join(root, "parameters.yml"), out,
                         CFG, resume=True)
    assert report2.frames_done == 3
    c3b = np.loadtxt(os.path.join(out, "cFrame3.txt"))
    np.testing.assert_allclose(c3b, c3, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path, rng):
    st = TrackerState(
        proj_u=jnp.asarray(rng.normal(size=(8, 8)), jnp.float32),
        strip_w=jnp.asarray(rng.normal(size=(8, 8)), jnp.float32),
        strip_b=jnp.asarray(rng.normal(size=(8, 8)), jnp.float32),
        z=jnp.asarray(rng.normal(size=(8, 8)), jnp.float32),
        frame_idx=jnp.int32(7))
    path = save_state(str(tmp_path / "ck" / "frame_7"), st)
    got = load_state(path)
    np.testing.assert_array_equal(np.asarray(got.proj_u),
                                  np.asarray(st.proj_u))
    assert int(np.asarray(got.frame_idx)) == 7
    assert latest_checkpoint(str(tmp_path / "ck")) == path


def test_run_replay_survives_injected_faults(tmp_path):
    """Dropped frames must be skipped with the tracker state carried
    (failure recovery the reference lacks); the run completes and the
    faults are recorded in the metrics log."""
    root = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    _make_dataset(root)
    report = run_replay(root, os.path.join(root, "parameters.yml"), out,
                        CFG, fault_drop_prob=0.5, fault_seed=3)
    assert report.frames_done >= 1
    faults = [r for r in report.metrics.records if "fault" in r]
    assert faults, "expected at least one injected fault with p=0.5"
    # All logged frames still carry sane stats.
    assert all(0.0 <= r["valid_frac"] <= 1.0
               for r in report.metrics.records)


def test_pipeline_determinism(tmp_path):
    """Same inputs -> bit-identical outputs (the purity/determinism
    guarantee that replaces race detection for a single-assignment
    functional pipeline, SURVEY.md §5)."""
    calib = synthetic_calibration(cam_h=CFG.cam_h, cam_w=CFG.cam_w,
                                  pro_h=CFG.pro_h, pro_w=CFG.pro_w)
    scene = synth.render_static_scene(calib, CFG,
                                      synth.sphere_surface(),
                                      noise_sigma=1.0)
    from slc_tpu.calib import build_tables
    from slc_tpu.pipeline import decode_first_frame
    tables = build_tables(calib, CFG.cam_h, CFG.cam_w)
    g = jnp.asarray(scene.gray_images)
    p = jnp.asarray(scene.phase_images)
    r1 = decode_first_frame(g, p, tables, CFG)
    r2 = decode_first_frame(g, p, tables, CFG)
    np.testing.assert_array_equal(np.asarray(r1.z), np.asarray(r2.z))
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


def test_run_replay_reanchors(tmp_path):
    """Anchor groups (aFrame{f}/) must reset the integrated P: the
    anchored frame's output comes from a fresh absolute decode, and
    tracking continues from it (SURVEY.md §5 drift bounding)."""
    from slc_tpu.io.dataset import write_anchor_group

    root = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    calib = synthetic_calibration(cam_h=CFG.cam_h, cam_w=CFG.cam_w,
                                  pro_h=CFG.pro_h, pro_w=CFG.pro_w)
    z0, dz = 50.0, 0.3
    scene = synth.render_static_scene(calib, CFG,
                                      synth.plane_surface(z0),
                                      noise_sigma=1.0)
    frames, zs, _ = synth.render_dynamic_sequence(
        calib, CFG, 6, z0=z0, dz_per_frame=dz, stripe_period=12,
        noise_sigma=1.0)
    write_replay_dataset(root, scene.gray_images, scene.phase_images,
                         frames)
    # Anchor group at frame 4, rendered at the plane's frame-4 position.
    asc = synth.render_static_scene(calib, CFG,
                                    synth.plane_surface(z0 + 4 * dz),
                                    noise_sigma=1.0, seed=5)
    write_anchor_group(root, 4, asc.gray_images, asc.phase_images)
    save_calibration(os.path.join(root, "parameters.yml"), calib)

    report = run_replay(root, os.path.join(root, "parameters.yml"), out,
                        CFG)
    assert report.frames_done == 5
    recs = {r["frame"]: r for r in report.metrics.records}
    assert recs[4].get("reanchor") is True
    assert "reanchor" not in recs[3]

    # The anchored frame's cloud is absolute-decode accurate.
    pts4 = np.loadtxt(os.path.join(out, "cFrame4.txt"))
    assert np.abs(pts4[:, 2] - (z0 + 4 * dz)).mean() < 0.1
    # Tracking continues from the anchored state on frame 5.
    pts5 = np.loadtxt(os.path.join(out, "cFrame5.txt"))
    good5 = np.abs(pts5[:, 2] - (z0 + 5 * dz)) < 0.5
    assert good5.mean() > 0.9

    # With anchors disabled the run still works and frame 4 is tracked.
    out2 = str(tmp_path / "out2")
    report2 = run_replay(root, os.path.join(root, "parameters.yml"),
                         out2, CFG, use_anchors=False)
    recs2 = {r["frame"]: r for r in report2.metrics.records}
    assert "reanchor" not in recs2[4]


def test_run_replay_heterodyne_mode(tmp_path):
    """--mode heterodyne end-to-end: frame 0 decoded from the
    vFringeCam multi-frequency stack (no Gray images needed)."""
    from slc_tpu.config import HeterodyneConfig

    root = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    calib = synthetic_calibration(cam_h=CFG.cam_h, cam_w=CFG.cam_w,
                                  pro_h=CFG.pro_h, pro_w=CFG.pro_w)
    scene = synth.render_static_scene(calib, CFG,
                                      synth.plane_surface(50.0),
                                      noise_sigma=1.0)
    het = HeterodyneConfig(phase_steps=CFG.phase_steps)
    fringes, _, _ = synth.render_fringe_stack(
        calib, CFG, synth.plane_surface(50.0), het.periods(CFG.pro_w),
        het.phase_steps, noise_sigma=1.0)
    write_replay_dataset(root, scene.gray_images, scene.phase_images,
                         fringe_images=fringes)
    save_calibration(os.path.join(root, "parameters.yml"), calib)

    report = run_replay(root, os.path.join(root, "parameters.yml"), out,
                        CFG, mode="heterodyne")
    assert report.first_frame_points > 0.95 * CFG.cam_h * CFG.cam_w
    pts = np.loadtxt(os.path.join(out, "iFrame.txt"))
    assert (np.abs(pts[:, 2] - 50.0) < 1.0).mean() > 0.99


def test_run_replay_spatial_mode(tmp_path):
    """--mode spatial end-to-end: frame 0 decoded from the single
    phase-shift frequency with quality-guided spatial unwrapping.

    Without an anchor the result is absolute only up to ONE global
    period offset (decode_spatial_frame docstring), so assert (a) the
    runner dispatch exactly matches the direct pipeline call and (b)
    the cloud is structurally valid (dense, inside the FOV window)."""
    from slc_tpu.calib import build_tables
    from slc_tpu.io.dataset import ReplayDataset
    from slc_tpu.pipeline import decode_spatial_frame

    root = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    calib, _, _ = _make_dataset(root)
    report = run_replay(root, os.path.join(root, "parameters.yml"), out,
                        CFG, mode="spatial", max_frames=2)
    assert report.first_frame_points > 0.9 * CFG.cam_h * CFG.cam_w
    pts = np.loadtxt(os.path.join(out, "iFrame.txt"))
    assert ((pts[:, 2] >= CFG.fov_min) & (pts[:, 2] <= CFG.fov_max)).all()

    tables = build_tables(calib, CFG.cam_h, CFG.cam_w)
    ds = ReplayDataset(root)
    direct = decode_spatial_frame(jnp.asarray(ds.phase_images()),
                                  tables, CFG,
                                  float(CFG.phase_period))
    dz = np.asarray(direct.z)
    got = np.sort(pts[:, 2])
    want = np.sort(dz[dz > 0])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_run_replay_spatial_reanchor_keeps_fringe_order(tmp_path):
    """Spatial-mode re-anchoring must not snap the sequence onto a
    different global period offset: the re-anchor decode is pinned to
    the tracker's current absolute map (runner._decode_anchor
    prev_proj_u). Without the pin, the fresh spatial unwrap is absolute
    only up to one global period and can inject a period-sized depth
    jump at the anchor frame."""
    from slc_tpu.io.dataset import write_anchor_group

    root = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    calib = synthetic_calibration(cam_h=CFG.cam_h, cam_w=CFG.cam_w,
                                  pro_h=CFG.pro_h, pro_w=CFG.pro_w)
    z0, dz = 50.0, 0.3
    scene = synth.render_static_scene(calib, CFG,
                                      synth.plane_surface(z0),
                                      noise_sigma=1.0)
    frames, zs, _ = synth.render_dynamic_sequence(
        calib, CFG, 6, z0=z0, dz_per_frame=dz, stripe_period=12,
        noise_sigma=1.0)
    write_replay_dataset(root, scene.gray_images, scene.phase_images,
                         frames)
    asc = synth.render_static_scene(calib, CFG,
                                    synth.plane_surface(z0 + 4 * dz),
                                    noise_sigma=1.0, seed=5)
    write_anchor_group(root, 4, asc.gray_images, asc.phase_images)
    save_calibration(os.path.join(root, "parameters.yml"), calib)

    report = run_replay(root, os.path.join(root, "parameters.yml"), out,
                        CFG, mode="spatial")
    assert report.frames_done == 5
    recs = {r["frame"]: r for r in report.metrics.records}
    assert recs[4].get("reanchor") is True

    # Depth continuity across the re-anchor: whatever global offset the
    # spatial frame-0 decode picked, frames 3 -> 4 -> 5 must move by
    # ~dz, not by a fringe-period-sized jump.
    med = {}
    for f in (3, 4, 5):
        pts = np.loadtxt(os.path.join(out, f"cFrame{f}.txt"))
        med[f] = np.median(pts[:, 2])
    assert abs(med[4] - med[3]) < 5 * dz, med
    assert abs(med[5] - med[4]) < 5 * dz, med


def test_run_replay_preview(tmp_path):
    """--preview writes shaded depth BMPs (the depthMapUtils render
    chain) for frame 0 and the final tracked frame."""
    from slc_tpu.io.bmp import read_bmp

    root = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    _make_dataset(root)
    run_replay(root, os.path.join(root, "parameters.yml"), out, CFG,
               preview=True)
    p0 = os.path.join(out, "preview_iFrame.bmp")
    pf = os.path.join(out, "preview_cFrame3.bmp")
    assert os.path.exists(p0) and os.path.exists(pf)
    img = read_bmp(p0)
    assert img.shape == (CFG.cam_h, CFG.cam_w)
    # A lit plane has nonzero, non-saturated interior shading.
    interior = img[10:-10, 10:-10]
    assert 0 < interior.mean() < 255


def test_stream_and_strict_loops_agree(tmp_path):
    """The round-4 streaming product path (prefetch iterator +
    background writer, VERDICT r3 item 2) must reproduce the strict
    read->step->write loop exactly: same fault records under injection,
    same cloud files, same final stats."""
    root = str(tmp_path / "ds")
    _make_dataset(root)
    calib_path = os.path.join(root, "parameters.yml")

    reports = {}
    for name, stream in (("stream", True), ("strict", False)):
        out = str(tmp_path / name)
        reports[name] = run_replay(
            root, calib_path, out, CFG, stream=stream,
            fault_drop_prob=0.4, fault_seed=7)
    s_recs = reports["stream"].metrics.records
    t_recs = reports["strict"].metrics.records
    assert [r["frame"] for r in s_recs] == [r["frame"] for r in t_recs]
    assert ([r["frame"] for r in s_recs if "fault" in r]
            == [r["frame"] for r in t_recs if "fault" in r])
    for a, b in zip(s_recs, t_recs):
        assert abs(a["valid_frac"] - b["valid_frac"]) < 1e-6
    # Both paths wrote the same per-frame cloud set, with identical
    # content.
    fs = sorted(f for f in os.listdir(tmp_path / "stream")
                if f.endswith(".txt"))
    ft = sorted(f for f in os.listdir(tmp_path / "strict")
                if f.endswith(".txt"))
    assert fs == ft and len(fs) >= 2
    for f in fs:
        with open(tmp_path / "stream" / f) as fh_a, \
                open(tmp_path / "strict" / f) as fh_b:
            assert fh_a.read() == fh_b.read()
    # The streaming run records its write leg as hidden (writer-thread
    # summary), not as a per-frame stage.
    assert reports["stream"].metrics.summaries
    assert not any("t_write_ms" in r for r in s_recs[1:])


def test_stream_resume_matches_uninterrupted(tmp_path):
    """Checkpoint mid-sequence + resume through the streaming path must
    land on the same terminal state as an uninterrupted run."""
    root = str(tmp_path / "ds")
    _make_dataset(root)
    calib_path = os.path.join(root, "parameters.yml")

    out_full = str(tmp_path / "full")
    full = run_replay(root, calib_path, out_full, CFG,
                      write_clouds=False)

    out_res = str(tmp_path / "resumed")
    run_replay(root, calib_path, out_res, CFG, write_clouds=False,
               checkpoint_every=2, max_frames=3)
    resumed = run_replay(root, calib_path, out_res, CFG,
                         write_clouds=False, checkpoint_every=2,
                         resume=True)
    assert resumed.frames_done == full.frames_done
    a = full.metrics.records[-1]
    b = resumed.metrics.records[-1]
    assert a["frame"] == b["frame"]
    assert abs(a["z_mean"] - b["z_mean"]) < 1e-5


def test_run_replay_npz_output(tmp_path):
    """--out-format npz writes float32 x/y/z maps with pixel indexing
    preserved."""
    root = str(tmp_path / "ds")
    _make_dataset(root)
    out = str(tmp_path / "out")
    report = run_replay(root, os.path.join(root, "parameters.yml"), out,
                        CFG, out_format="npz")
    assert report.frames_done >= 1
    d = np.load(os.path.join(out, "iFrame.npz"))
    assert d["z"].shape == (CFG.cam_h, CFG.cam_w)
    assert d["z"].dtype == np.float32
    dyn = np.load(os.path.join(out, "cFrame1.npz"))
    assert (dyn["z"] > 0).mean() > 0.5


def test_run_replay_auto_phase_lock(tmp_path):
    """--phase-lock auto: when the dataset manifest records its
    stripe_period (as `synth`/`capture` now do), the runner must
    resolve the lock period + window from the frame-0 decode and track
    with substantially lower terminal error than the unlocked run on a
    longer sequence."""
    calib = synthetic_calibration(cam_h=CFG.cam_h, cam_w=CFG.cam_w,
                                  pro_h=CFG.pro_h, pro_w=CFG.pro_w)
    scene = synth.render_static_scene(calib, CFG,
                                      synth.plane_surface(50.0),
                                      noise_sigma=1.0)
    frames, zs, _ = synth.render_dynamic_sequence(
        calib, CFG, 30, z0=50.0, dz_per_frame=0.3, stripe_period=12,
        noise_sigma=1.0)
    root = str(tmp_path / "ds")
    write_replay_dataset(root, scene.gray_images, scene.phase_images,
                         frames, config_fields={"stripe_period": 12})
    save_calibration(os.path.join(root, "parameters.yml"), calib)

    errs = {}
    for name, lock in (("locked", "auto"), ("free", None)):
        out = str(tmp_path / name)
        run_replay(root, os.path.join(root, "parameters.yml"), out,
                   CFG, phase_lock=lock, out_format="npz")
        z = np.load(os.path.join(out, "cFrame29.npz"))["z"]
        r = CFG.reco_window // 2 + 2
        zi, gi = z[r:-r, r:-r], zs[29][r:-r, r:-r]
        v = zi > 0
        errs[name] = float(np.median(np.abs(zi[v] - gi[v])))
    assert errs["locked"] < 0.05, errs
    assert errs["locked"] < 0.5 * errs["free"], errs


def test_stream_writer_failure_fails_the_run(tmp_path, monkeypatch):
    """A failed async cloud write must fail the run (not silently drop
    frames): AsyncCloudWriter.close() raises and run_replay propagates
    it when the loop itself completed."""
    root = str(tmp_path / "ds")
    _make_dataset(root)
    out = str(tmp_path / "out")

    from slc_tpu import cloud as cloud_mod

    real = cloud_mod.write_xyz

    def boom(path, x, y, z, mask=None):
        if "cFrame" in os.path.basename(path):
            raise IOError("disk full (injected)")
        return real(path, x, y, z, mask)

    monkeypatch.setattr(cloud_mod, "write_xyz", boom)
    import pytest
    with pytest.raises(IOError, match="async cloud writes failed"):
        run_replay(root, os.path.join(root, "parameters.yml"), out,
                   CFG, stream=True)


def test_chunked_cli_loop_matches_per_frame(tmp_path):
    """run_replay(chunk=K) — one device dispatch per K frames — must
    reproduce the per-frame loop exactly: same per-frame records (incl.
    injected faults), same cloud files, same terminal state; anchors
    split chunks without changing semantics."""
    calib = synthetic_calibration(cam_h=CFG.cam_h, cam_w=CFG.cam_w,
                                  pro_h=CFG.pro_h, pro_w=CFG.pro_w)
    scene = synth.render_static_scene(calib, CFG,
                                      synth.plane_surface(50.0),
                                      noise_sigma=1.0)
    frames, zs, _ = synth.render_dynamic_sequence(
        calib, CFG, 11, z0=50.0, dz_per_frame=0.3, stripe_period=12,
        noise_sigma=1.0)
    root = str(tmp_path / "ds")
    write_replay_dataset(root, scene.gray_images, scene.phase_images,
                         frames)
    # An anchor group mid-sequence forces a chunk split.
    from slc_tpu.io.dataset import write_anchor_group
    asc = synth.render_static_scene(calib, CFG,
                                    synth.plane_surface(50.0 + 5 * 0.3),
                                    noise_sigma=1.0, seed=5)
    write_anchor_group(root, 5, asc.gray_images, asc.phase_images)
    save_calibration(os.path.join(root, "parameters.yml"), calib)

    reports = {}
    for name, k in (("per_frame", 1), ("chunked", 4)):
        out = str(tmp_path / name)
        reports[name] = run_replay(
            root, os.path.join(root, "parameters.yml"), out, CFG,
            chunk=k, fault_drop_prob=0.25, fault_seed=11,
            out_format="npz")
    a = reports["per_frame"].metrics.records
    b = reports["chunked"].metrics.records
    assert [r["frame"] for r in a] == [r["frame"] for r in b]
    assert ([r["frame"] for r in a if "fault" in r]
            == [r["frame"] for r in b if "fault" in r])
    assert ([r["frame"] for r in a if r.get("reanchor")]
            == [r["frame"] for r in b if r.get("reanchor")])
    for ra, rb in zip(a, b):
        assert abs(ra["valid_frac"] - rb["valid_frac"]) < 1e-6
        assert abs(ra["z_mean"] - rb["z_mean"]) < 1e-5
    fa = sorted(f for f in os.listdir(tmp_path / "per_frame")
                if f.endswith(".npz"))
    fb = sorted(f for f in os.listdir(tmp_path / "chunked")
                if f.endswith(".npz"))
    assert fa == fb and len(fa) >= 5
    for f in fa:
        za = np.load(os.path.join(tmp_path, "per_frame", f))["z"]
        zb = np.load(os.path.join(tmp_path, "chunked", f))["z"]
        np.testing.assert_allclose(za, zb, atol=1e-5)


def test_cli_sphere_dataset_tracks_true_geometry(tmp_path):
    """Regression (round 5): the synth CLI's default sphere scene used
    to pair a SPHERE frame-0 decode with MOVING-PLANE dynamic frames —
    every default CLI dataset was internally inconsistent and the
    tracker silently followed garbage (high valid_frac, wrong z).
    Now the decoded scene itself moves: tracked depth on the final
    frame must match the analytically moved sphere."""
    import jax.numpy as jnp
    from slc_tpu import synth
    from slc_tpu.__main__ import main as cli_main
    from slc_tpu.io import load_calibration
    from slc_tpu.io.dataset import load_manifest
    from slc_tpu.runner import run_replay

    root = str(tmp_path / "ds")
    n = 4
    rc = cli_main(["synth", root, "--frames", str(n), "--cam", "96x160",
                   "--pro", "96x640", "--gray-bits", "5",
                   "--scene", "sphere"])
    assert rc == 0
    m = load_manifest(root)
    cfg = SystemConfig(cam_h=m["cam_h"], cam_w=m["cam_w"],
                       pro_h=m["pro_h"], pro_w=m["pro_w"],
                       gray_bits=m["gray_bits"])
    out = str(tmp_path / "out")
    report = run_replay(root, os.path.join(root, "parameters.yml"), out,
                        cfg, out_format="npz")
    assert report.frames_done == n - 1

    z = np.load(os.path.join(out, f"cFrame{n - 1}.npz"))["z"]
    calib = load_calibration(os.path.join(root, "parameters.yml"))
    dz = 0.08                       # the CLI's per-frame z step
    z_gt, _ = synth.surface_geometry(
        calib, cfg,
        lambda dx, dy: synth.sphere_surface()(dx, dy) + dz * (n - 1))
    r = cfg.reco_window // 2 + 2
    zi, gi = z[r:-r, r:-r], z_gt[r:-r, r:-r]
    v = zi > 0
    assert v.mean() > 0.9
    med = float(np.median(np.abs(zi[v] - gi[v])))
    assert med < 0.1, med
