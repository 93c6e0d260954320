"""Benchmark suite: every BASELINE.md config as a machine-readable line.

Prints one JSON line per metric. The FIRST line is the headline —
BASELINE config 2, 2 MP phase-to-depth throughput on one chip:

    {"metric": "phase_to_depth_fps_2mp", "value": ..., "unit": "fps",
     "vs_baseline": ...}

followed by configs 1, 3, 4, 5 and per-kernel roofline lines (TPU
only). ``vs_baseline`` is achieved/target oriented so that >1.0 always
means "beats the target" (fps/60 for throughput targets, target/value
for error and latency metrics); null where BASELINE.md names no number.

The reference publishes no numbers of its own (BASELINE.md); targets
are the north-star rows of BASELINE.json.

Usage: python bench.py            # all configs
       python bench.py --parity-worker   # internal: CPU-mesh parity
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# Persistent compilation cache: TPU compiles here are remote and slow
# (minutes); cache them across processes.
_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_HERE, ".jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# HBM peak for the roofline denominator (v5e = 819 GB/s); override for
# other parts via the environment.
HBM_PEAK_GBPS = float(os.environ.get("SLC_HBM_PEAK_GBPS", "819.0"))

H2MP, W2MP = 1216, 1632               # ~2.0 MP, lane/sublane aligned


def emit(metric, value, unit, vs_baseline=None, **extra):
    rec = {"metric": metric, "value": value, "unit": unit,
           "vs_baseline": vs_baseline}
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def _timeit(fn, *args, n=30, repeats=3):
    """Steady-state seconds per call: best of ``repeats`` batches of
    ``n`` calls (compile + 1 warm-up excluded). The TPU here is reached
    through a tunnel whose latency spikes can double a single batch;
    min-of-batches reports the hardware, not the network."""
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def _rig_2mp():
    from slc_tpu.config import SystemConfig
    from slc_tpu.calib import synthetic_calibration, build_tables
    cfg = SystemConfig(cam_h=H2MP, cam_w=W2MP, pro_h=H2MP, pro_w=W2MP)
    calib = synthetic_calibration(cam_h=H2MP, cam_w=W2MP,
                                  pro_h=H2MP, pro_w=W2MP)
    return cfg, calib, build_tables(calib, H2MP, W2MP)


def bench_config2_headline():
    """2 MP 3-frequency heterodyne (12 fringes) -> x,y,z,P; >=60 fps,
    plus machine-readable accuracy at full 2 MP (VERDICT r2 item 4):
    RMSE vs an analytic plane on a rendered fringe stack, and a
    real-fringe timing (masked-store behavior differs from the
    0%-valid random-noise input used for the bandwidth line)."""
    from slc_tpu.config import HeterodyneConfig
    from slc_tpu.pipeline import decode_heterodyne_frame
    from slc_tpu import synth

    cfg, calib, tables = _rig_2mp()
    het = HeterodyneConfig()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (het.num_images, H2MP, W2MP),
                                    dtype=np.uint8))

    @jax.jit
    def step(images):
        r = decode_heterodyne_frame(images, tables, cfg, het)
        return r.x, r.y, r.z, r.proj_u

    dt = _timeit(step, imgs)
    fps = 1.0 / dt
    emit("phase_to_depth_fps_2mp", round(fps, 2), "fps",
         round(fps / 60.0, 3))

    real, z_gt, _ = synth.render_fringe_stack(
        calib, cfg, synth.plane_surface(55.0, 0.1, 0.05),
        het.periods(cfg.pro_w), het.phase_steps, noise_sigma=1.0)
    real_j = jnp.asarray(real)
    _, _, z, _ = step(real_j)
    z = np.asarray(z)
    v = z > 0
    rmse = float(np.sqrt(np.mean((z[v] - z_gt[v]) ** 2)))
    emit("c2_heterodyne_rmse_2mp", round(rmse, 5), "scene_units",
         round(0.5 / rmse, 2), valid_pct=round(100.0 * v.mean(), 2))
    dt_real = _timeit(step, real_j)
    emit("c2_fps_2mp_real_fringes", round(1.0 / dt_real, 2), "fps",
         round(1.0 / dt_real / 60.0, 3))


def bench_config1():
    """640x480 Gray+phase absolute decode of a sphere: RMSE vs analytic
    ground truth (target < 0.5 scene units)."""
    from slc_tpu.config import TEST_CONFIG
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu import synth
    from slc_tpu.pipeline import decode_first_frame

    cfg = TEST_CONFIG
    calib = synthetic_calibration()
    tables = build_tables(calib, cfg.cam_h, cfg.cam_w)
    scene = synth.render_static_scene(calib, cfg, synth.sphere_surface(),
                                      noise_sigma=1.0)
    res = decode_first_frame(jnp.asarray(scene.gray_images),
                             jnp.asarray(scene.phase_images), tables, cfg)
    z = np.asarray(res.z)
    v = z > 0
    rmse = float(np.sqrt(np.mean((z[v] - scene.z_gt[v]) ** 2)))
    emit("c1_absolute_decode_rmse_640x480", round(rmse, 5), "scene_units",
         round(0.5 / rmse, 2), valid_pct=round(100.0 * v.mean(), 2))


def bench_config3():
    """Quality-guided spatial unwrap + bilateral filter at 2 MP:
    wall time and fringe-order accuracy on a multi-period scene with a
    low-quality noise band (the tile-parallel variant is parity-tested
    in tests/test_unwrap_tiled.py; one chip here)."""
    from slc_tpu.ops.unwrap_spatial import unwrap_spatial
    from slc_tpu.ops.filters import bilateral_filter

    t = 32.0
    rng = np.random.default_rng(3)
    x = (np.linspace(0, 24 * t, W2MP)[None, :]
         + np.linspace(0, 3 * t, H2MP)[:, None]).astype(np.float32)
    psi = np.mod(x, t).astype(np.float32)
    q = np.ones((H2MP, W2MP), np.float32)
    band = slice(H2MP // 2, H2MP // 2 + 16)
    psi[band] = rng.uniform(0, t, size=(16, W2MP)).astype(np.float32)
    q[band] = 1e-3
    # Coarse anchor (a heterodyne-grade initial estimate): truth +
    # per-pixel bias, the same difficulty the hard-scene tests use
    # (tests/test_unwrap_spatial.py) — a scalar bias would make the
    # anchor trivially consistent with the truth.
    anchor = (x + rng.uniform(-t / 3, t / 3, size=x.shape)
              ).astype(np.float32)

    psi_j, q_j, a_j = jnp.asarray(psi), jnp.asarray(q), jnp.asarray(anchor)

    # Device-timed via the profiler trace on TPU: through the axon
    # tunnel, block_until_ready on data-dependent while_loop programs
    # returns before the loop finishes, making host wall clock report
    # microseconds for a ~36 ms solve.
    def timeit_solver(fn):
        if jax.default_backend() in ("tpu", "axon"):
            from slc_tpu.devtime import device_time_s
            return device_time_s(fn, n=3)
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(fn())
        return (time.perf_counter() - t0) / 3

    dt = timeit_solver(lambda: unwrap_spatial(
        psi_j, t, quality=q_j, anchor=a_j, max_iters=300))
    got, info = unwrap_spatial(psi_j, t, quality=q_j, anchor=a_j,
                               max_iters=300, return_info=True)
    # Jacobi-PCG variant (mg=False): cheaper per iteration but stalls
    # on low-frequency error — reported for the trade-off record.
    dt_j = timeit_solver(lambda: unwrap_spatial(
        psi_j, t, quality=q_j, anchor=a_j, max_iters=300, mg=False))
    _, info_j = unwrap_spatial(psi_j, t, quality=q_j, anchor=a_j,
                               max_iters=300, return_info=True, mg=False)
    emit("c3_spatial_unwrap_ms_2mp_jacobi", round(dt_j * 1e3, 3), "ms",
         None, cg_iters=int(info_j["cg_iters"]),
         rel_residual=float(info_j["rel_residual"]))
    got = np.asarray(got)
    good = np.ones_like(q, bool)
    good[band] = False
    order_err = float(
        (np.abs(got[good] - x[good]) > t / 2).mean() * 100.0)
    emit("c3_spatial_unwrap_ms_2mp", round(dt * 1e3, 3), "ms",
         None, cg_iters=int(info["cg_iters"]),
         rel_residual=float(info["rel_residual"]),
         residues=int(info["residue_count"]),
         suspect_px=int(info["suspect_count"]))
    emit("c3_unwrap_order_error_pct", round(order_err, 4), "%",
         None if order_err == 0 else round(0.01 / order_err, 3))

    z = jnp.asarray(50.0 + 20.0 * (x / x.max()), jnp.float32)
    # Device-timed like the solver above: through the tunnel, host wall
    # clock on a 0.06 ms kernel measures the RPC round trip (~3 ms).
    dt_b = timeit_solver(lambda: bilateral_filter(z))
    emit("c3_bilateral_ms_2mp", round(dt_b * 1e3, 3), "ms")


def bench_config4():
    """Streaming 2 MP dynamic tracking: per-frame latency with a
    device-resident feed (compute-bound truth), a host uint8 feed
    (H2D per frame), and a host feed + async z fetch (full loop).
    Target: >=60 fps on-chip."""
    from slc_tpu import synth
    from slc_tpu.dynamic import init_tracker
    from slc_tpu.streaming import run_streaming

    cfg, calib, tables = _rig_2mp()
    n = 33                     # 1 init + 32 streaming = 2 chunks of 16
    frames, z_gt, pu_gt = synth.render_dynamic_sequence(
        calib, cfg, n, z0=50.0, dz_per_frame=0.05, stripe_period=12,
        noise_sigma=1.0)

    def fresh_state():
        return init_tracker(jnp.asarray(frames[0]),
                            jnp.asarray(pu_gt[0], jnp.float32),
                            jnp.asarray(z_gt[0], jnp.float32), cfg)

    # (a) device-resident feed, results stay on device. Two numbers:
    # per-frame latency (sync_every=1 — includes one host<->device
    # round trip per frame, which through a tunneled TPU is tens of
    # ms), and pipelined throughput (one sync at the end — the number
    # a co-located host sees at steady state).
    dev_frames = [jax.device_put(f) for f in frames[1:]]
    _, warm = run_streaming(fresh_state(), dev_frames, tables, cfg,
                            fetch=lambda r: r)       # compile
    _, st = run_streaming(fresh_state(), dev_frames, tables, cfg,
                          fetch=lambda r: r)
    emit("c4_stream_latency_p50_ms_device_feed",
         st.summary()["p50_ms"], "ms",
         round((1000.0 / 60.0) / max(st.percentile_ms(50), 1e-9), 3))
    fps_t = max(run_streaming(fresh_state(), dev_frames, tables, cfg,
                              fetch=lambda r: r,
                              sync_every=len(dev_frames))[1].fps
                for _ in range(3))
    emit("c4_stream_fps_2mp_device_feed", round(fps_t, 2), "fps",
         round(fps_t / 60.0, 3))

    # (a') the on-chip config-4 headline: per-frame DEVICE time of the
    # streaming step loop, carried state and all, measured from the
    # profiler trace. The wall numbers above/below include per-step
    # RPC dispatch through the TPU tunnel (~ms each, absent on a
    # co-located host); this is what the chip itself sustains.
    from slc_tpu.devtime import device_time_s
    from slc_tpu.dynamic import dynamic_step
    import itertools as _it

    box = [fresh_state()]
    feed = _it.cycle(dev_frames)

    def one_step():
        st, res = dynamic_step(box[0], next(feed), tables, cfg)
        box[0] = st
        return res.z

    dt_dev = device_time_s(one_step, n=30)
    emit("c4_stream_fps_2mp_device_timed", round(1.0 / dt_dev, 1),
         "fps", round(1.0 / dt_dev / 60.0, 3),
         device_ms=round(dt_dev * 1e3, 4))

    # (a'') the same loop with PHASE-LOCKED tracking (the product
    # default when the dataset records its stripe period): fused
    # dynamic step + fused phase-lock kernel per frame.
    box = [fresh_state()]

    def one_step_locked():
        st, res = dynamic_step(box[0], next(feed), tables, cfg,
                               phase_lock=20.0, lock_win_u=21,
                               lock_win_v=9, frac_bits=7)
        box[0] = st
        return res.z

    dt_l = device_time_s(one_step_locked, n=30)
    emit("c4_stream_fps_2mp_phaselocked_device_timed",
         round(1.0 / dt_l, 1), "fps", round(1.0 / dt_l / 60.0, 3),
         device_ms=round(dt_l * 1e3, 4))

    # (b) host feed: one 2 MB uint8 H2D per frame, no result fetch.
    host_frames = list(frames[1:])
    _, st_h = run_streaming(fresh_state(), host_frames, tables, cfg,
                            fetch=lambda r: r)
    emit("c4_stream_p50_ms_host_feed", st_h.summary()["p50_ms"], "ms",
         round((1000.0 / 60.0) / max(st_h.percentile_ms(50), 1e-9), 3),
         fps=st_h.summary()["fps"])

    # (c) host feed + async z host fetch (default fetch): full loop.
    _, st_f = run_streaming(fresh_state(), host_frames, tables, cfg)
    emit("c4_stream_p50_ms_host_feed_zfetch", st_f.summary()["p50_ms"],
         "ms", None, fps=st_f.summary()["fps"])

    # (e) chunked megastep (VERDICT r2 item 1): one lax.scan dispatch +
    # one sync per K frames, amortizing the tunnel's per-step RPC
    # floor. Device-staged feed (a co-located production host hides the
    # uint8 H2D under compute at PCIe bandwidth; the dev tunnel's
    # ~24 MB/s link cannot, so the host-feed line below is
    # link-bandwidth-bound, not framework-bound).
    K = 16
    _ = run_streaming(fresh_state(), dev_frames, tables, cfg, chunk=K)
    best = None
    # best-of-5: the tunnel's per-RPC latency swings 2-3x hour to hour
    # and one blocking round trip per chunk is on this path's clock.
    for _i in range(5):
        _, stc = run_streaming(fresh_state(), dev_frames, tables, cfg,
                               chunk=K)
        if best is None or stc.fps > best.fps:
            best = stc
    chunk_ms = [s * 1e3 for s in best.chunk_latencies_s]
    emit("c4_stream_fps_2mp_chunked", round(best.fps, 2), "fps",
         round(best.fps / 60.0, 3), chunk=K,
         p50_chunk_latency_ms=round(float(np.median(chunk_ms)), 3))
    _, sth = run_streaming(fresh_state(), host_frames, tables, cfg,
                           chunk=K)
    emit("c4_stream_fps_2mp_chunked_hostfeed", round(sth.fps, 2),
         "fps", round(sth.fps / 60.0, 3), chunk=K)

    # (e') chunked, fully pipelined: dispatches enqueue ahead, ONE sync
    # at the end — the steady-state throughput a co-located host sees,
    # insensitive to the tunnel's per-RPC latency swings (the per-chunk
    # line above pays one blocking round trip per chunk).
    from slc_tpu.streaming import stream_chunks
    best_p = 0.0
    for _i in range(3):
        st0 = fresh_state()
        t0 = time.perf_counter()
        n_done = 0
        for st0, zs in stream_chunks(st0, dev_frames, tables, cfg, K):
            n_done += int(zs.shape[0])
        jax.block_until_ready(st0.z)
        best_p = max(best_p, n_done / (time.perf_counter() - t0))
    emit("c4_stream_fps_2mp_chunked_pipelined", round(best_p, 2),
         "fps", round(best_p / 60.0, 3), chunk=K)

    # (d) transfer/compute overlap, measured: pipelined vs strict
    # sequential, with pure-compute and pure-transfer legs. Efficiency
    # 1.0 = the cheaper leg fully hidden under the other. Through the
    # tunnel the per-frame H2D is ~40x the device step, so at R=1 the
    # quotient is pure noise (VERDICT r3 item 3); compute_repeats=
    # "auto" scales the compute leg into the transfer leg's range so
    # the measurement has a denominator. The raw host-feed case is
    # reported alongside as link-bound (unmeasurable efficiency).
    from slc_tpu.streaming import measure_overlap
    ov = measure_overlap(fresh_state(), host_frames, tables, cfg,
                         compute_repeats="auto")
    emit("c4_overlap_efficiency", ov["overlap_efficiency"], "fraction",
         None, **{k: v for k, v in ov.items()
                  if k != "overlap_efficiency"})


def bench_sequence100():
    """The reference's full-length scenario (DYNAFRAME_MAXNUM = 100,
    StaticParameters.cpp:31): terminal median |z - z_gt| drift after
    100 free-running deltaP-integration frames, for the improved
    tracker (sub-pixel + gradient scaling + robust combine) vs raw
    reference semantics — the machine-readable form of
    tests/test_sequence_100.py."""
    from slc_tpu.config import SystemConfig
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu import synth
    from slc_tpu.dynamic import init_tracker, run_sequence

    cfg = SystemConfig(cam_h=96, cam_w=160, pro_h=96, pro_w=640,
                       gray_bits=5)
    calib = synthetic_calibration(cam_h=cfg.cam_h, cam_w=cfg.cam_w,
                                  pro_h=cfg.pro_h, pro_w=cfg.pro_w)
    tables = build_tables(calib, cfg.cam_h, cfg.cam_w)
    frames, z_gt, pu_gt = synth.render_dynamic_sequence(
        calib, cfg, 100, z0=50.0, dz_per_frame=0.08, stripe_period=12,
        noise_sigma=1.0)

    def drift(z, gt):
        r = cfg.reco_window // 2 + 2
        z = z[r:-r, r:-r]
        gt = gt[r:-r, r:-r]
        v = z > 0
        return float(np.median(np.abs(z[v] - gt[v])))

    def run(scale_gradient, subpixel, robust, phase_lock=None):
        st = init_tracker(jnp.asarray(frames[0]),
                          jnp.asarray(pu_gt[0], jnp.float32),
                          jnp.asarray(z_gt[0], jnp.float32), cfg,
                          subpixel=subpixel)
        st, res = run_sequence(st, jnp.asarray(frames[1:]), tables, cfg,
                               scale_gradient=scale_gradient,
                               subpixel=subpixel, robust=robust,
                               phase_lock=phase_lock, lock_win_u=21,
                               lock_win_v=9)
        return drift(np.asarray(res.z[-1]), z_gt[-1])

    d_imp = run(True, True, True)
    d_ref = run(False, False, False)
    emit("c100_terminal_drift_improved", round(d_imp, 4), "scene_units",
         round(d_ref / max(d_imp, 1e-9), 2),
         frames=100, reference_semantics_drift=round(d_ref, 4))
    # Phase-locked tracking (round 4, VERDICT r3 item 1): snap the
    # integrated P to the wrapped stripe-carrier phase demodulated from
    # every dynamic frame — O(1) terminal error, no re-anchor groups.
    d_lock = run(True, True, True, phase_lock=12.0)
    emit("c100_terminal_drift_phaselocked", round(d_lock, 4),
         "scene_units", round(0.1 / max(d_lock, 1e-9), 2),
         frames=100, vs_free_running=round(d_imp / max(d_lock, 1e-9), 1))


def bench_config5():
    """16-scan bundle-adjustment fusion: ATE from noisy observations,
    plus the distributed-parity delta (landmark-sharded 8-way CPU mesh
    vs single device, run in a subprocess so the virtual-device flags
    don't disturb this process's backend)."""
    from slc_tpu import fusion

    rng = np.random.default_rng(5)
    obs, mask, rot_gt, trans_gt = fusion.synthetic_problem(
        rng, s=16, l=128, noise=0.01)
    rot, trans, _ = fusion.fuse_scans(obs, mask, iters=10)
    ate = float(fusion.ate_rmse(rot, trans, rot_gt, trans_gt))
    emit("c5_fusion_ate_16scan", round(ate, 5), "scene_units",
         round(0.05 / ate, 2))

    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--parity-worker"],
        env=env, capture_output=True, text=True, timeout=600,
        cwd=_HERE)
    if out.returncode != 0:
        print(f"parity worker failed: {out.stderr[-500:]}",
              file=sys.stderr)
        return
    delta = float(out.stdout.strip().splitlines()[-1])
    emit("c5_distributed_parity_delta", delta, "max_abs_diff",
         round(1e-3 / max(delta, 1e-12), 2))


def bench_config5_frontend():
    """Full config-5 FRONTEND at production scale (VERDICT r3 item 7):
    16 synthetic 2 MP depth scans ray-cast from known world poses,
    initial poses perturbed, then the complete alternating projective-
    association -> point-to-plane Schur-BA loop
    (fusion_frontend.register_scans) — wall time and terminal ATE in
    one line. Wall clock (labeled): the loop is a multi-dispatch
    pipeline, so through a tunneled TPU this includes per-round RPC; a
    co-located host sees less."""
    from slc_tpu import fusion, se3
    from slc_tpu.calib import synthetic_calibration
    from slc_tpu.synth import render_depth_from_pose
    from slc_tpu.fusion_frontend import register_scans

    rng = np.random.default_rng(7)
    # Wide-FOV rig (see tests/test_fusion.py): a narrow FOV sees only
    # the frontal sphere cap, which is normal-degenerate.
    cam_f = 130.0 * W2MP / 160.0
    calib = synthetic_calibration(cam_h=H2MP, cam_w=W2MP, cam_f=cam_f)
    s = 16
    rot_gt, trans_gt = [], []
    center = np.array([0.0, 0.0, 62.0])     # scene centroid
    for i in range(s):
        # Orbit about the scene center (full mutual overlap — the
        # multi-scan-fusion scenario config 5 describes; ~0.026 rad
        # per step, +-0.2 rad total).
        r = np.asarray(se3.exp_so3(jnp.asarray(
            [0.006 * (i - 8), 0.025 * (i - 8), 0.0], jnp.float32)),
            np.float64)
        t = (np.eye(3) - r) @ center
        rot_gt.append(r)
        trans_gt.append(t)
    rot_gt = np.stack(rot_gt)
    trans_gt = np.stack(trans_gt)
    depths = np.stack([
        render_depth_from_pose(calib, H2MP, W2MP, rot_gt[i], trans_gt[i])
        for i in range(s)]).astype(np.float32)

    rot0 = rot_gt.copy()
    trans0 = trans_gt.copy()
    for i in range(1, s):
        dr = np.asarray(se3.exp_so3(jnp.asarray(
            rng.normal(0, 0.01, 3), jnp.float32)), np.float64)
        rot0[i] = dr @ rot0[i]
        trans0[i] = trans0[i] + rng.normal(0, 0.15, 3)

    args = (jnp.asarray(depths), jnp.asarray(np.asarray(calib.cam_k),
                                             jnp.float32),
            jnp.asarray(rot0, jnp.float32),
            jnp.asarray(trans0, jnp.float32))
    kw = dict(rounds=8, gn_iters=5, grid_step=16, max_depth_err=2.0)
    rot_f, trans_f = register_scans(*args, **kw)     # warm-up/compile
    jax.block_until_ready(trans_f)
    t0 = time.perf_counter()
    rot_f, trans_f = register_scans(*args, **kw)
    jax.block_until_ready(trans_f)
    wall = time.perf_counter() - t0

    ate0 = float(fusion.ate_rmse(jnp.asarray(rot0, jnp.float32),
                                 jnp.asarray(trans0, jnp.float32),
                                 jnp.asarray(rot_gt, jnp.float32),
                                 jnp.asarray(trans_gt, jnp.float32)))
    ate = float(fusion.ate_rmse(rot_f, trans_f,
                                jnp.asarray(rot_gt, jnp.float32),
                                jnp.asarray(trans_gt, jnp.float32)))
    emit("c5_frontend_2mp_16scan_ms", round(wall * 1e3, 1),
         "ms_wall_via_tunnel", None, ate=round(ate, 5),
         ate_init=round(ate0, 5), rounds=8, gn_iters=5, grid_step=16,
         landmarks_per_scan=(H2MP // 16) * (W2MP // 16))
    emit("c5_frontend_2mp_16scan_ate", round(ate, 5), "scene_units",
         round(0.05 / max(ate, 1e-9), 2))


def bench_comms():
    """Halo-exchange bytes of the tiled dynamic step, measured from the
    COMPILED SPMD program (VERDICT r3 item 8): every collective
    instruction's result shape in the optimized HLO on an 8-virtual-
    device 2x4 tile mesh at 2 MP — the exact per-device transfer volume
    per frame, replacing the analytic ~37 KB estimate. Runs in a CPU
    subprocess so the virtual-device flags don't disturb this
    process's backend."""
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--comms-worker"],
        env=env, capture_output=True, text=True, timeout=900,
        cwd=_HERE)
    if out.returncode != 0:
        print(f"comms worker failed: {out.stderr[-500:]}",
              file=sys.stderr)
        return
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    px_tile = H2MP * W2MP // 8
    hbm_tile = 37 * px_tile
    emit("comms_halo_bytes_per_tile_frame", stats["collective-permute"],
         "bytes_from_compiled_hlo", None,
         collective_ops=stats["ops"],
         psum_bytes=stats["all-reduce"],
         hbm_bytes_per_tile=hbm_tile,
         byte_ratio_pct=round(
             100.0 * stats["collective-permute"] / hbm_tile, 3),
         mesh="1x2x4 (scan,ty,tx) @ 2MP")


def comms_worker():
    """Compile the tiled dynamic step on the 8-virtual-CPU mesh and
    print its collective byte stats (JSON)."""
    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
    import functools
    from jax.sharding import NamedSharding, PartitionSpec as P
    from slc_tpu.parallel.mesh import tile_mesh
    from slc_tpu.parallel.tiled import tiled_batched_dynamic_step
    from slc_tpu.dynamic import TrackerState
    from slc_tpu.config import SystemConfig
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu.devtime import hlo_collective_bytes

    cfg = SystemConfig(cam_h=H2MP, cam_w=W2MP, pro_h=H2MP, pro_w=W2MP)
    calib = synthetic_calibration(cam_h=H2MP, cam_w=W2MP,
                                  pro_h=H2MP, pro_w=W2MP)
    tables = build_tables(calib, H2MP, W2MP)
    mesh = tile_mesh(jax.devices(), scan=1, tiles=(2, 4))
    sh = NamedSharding(mesh, P(None, "ty", "tx"))
    rng = np.random.default_rng(0)
    put = lambda a: jax.device_put(a[None], sh)
    frame = put(rng.integers(0, 256, (H2MP, W2MP), np.uint8))
    f32 = lambda: put(rng.uniform(0, 100, (H2MP, W2MP)
                                  ).astype(np.float32))
    state = TrackerState(proj_u=f32(), strip_w=f32(), strip_b=f32(),
                         z=f32(), frame_idx=jnp.zeros((1,), jnp.int32))
    fn = jax.jit(functools.partial(tiled_batched_dynamic_step,
                                   tables=tables, cfg=cfg, mesh=mesh))
    txt = fn.lower(state, frame).compile().as_text()
    print(json.dumps(hlo_collective_bytes(txt)))


def parity_worker():
    """CPU-mesh 8-device distributed fusion vs single device (runs in a
    subprocess; prints the max-abs pose delta)."""
    # A site hook may pin jax_platforms at the config level, overriding
    # the env var this subprocess was launched with; force the CPU
    # backend via a config-value check (a default_backend() probe would
    # initialize the TPU platform first — tests/conftest.py).
    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
    from slc_tpu import fusion
    from slc_tpu.parallel.fusion_tiled import (fusion_mesh,
                                               shard_landmarks,
                                               tiled_fuse_scans)
    rng = np.random.default_rng(5)
    obs, mask, _, _ = fusion.synthetic_problem(rng, s=16, l=128,
                                               noise=0.01)
    rot_s, trans_s, _ = fusion.fuse_scans(obs, mask, iters=10)
    mesh = fusion_mesh(jax.devices())
    obs_d, mask_d = shard_landmarks(mesh, obs, mask)
    rot_d, trans_d, _ = tiled_fuse_scans(obs_d, mask_d, mesh, iters=10)
    delta = max(float(jnp.max(jnp.abs(rot_d - rot_s))),
                float(jnp.max(jnp.abs(trans_d - trans_s))))
    print(delta)


def bench_scaling():
    """Weak-scaling efficiency of the distributed step (BASELINE.md
    ">=80% at 2 hosts" row; VERDICT r2 item 2): real `jax.distributed`
    CPU clusters of 1, 2, 4 OS processes, each owning one scan over a
    fixed per-process tile grid (constant per-process work), wall-timed
    over a steady-state `tiled_batched_dynamic_step` loop. Efficiency =
    t(1 proc)/t(N procs); 1.0 = perfect weak scaling. This bounds the
    framework's own sync/collective overhead; it is a CPU-cluster
    proxy, not an ICI measurement (no multi-chip TPU in this
    environment) — see PERF.md for the analytic comms accounting."""
    import socket

    worker = os.path.join(_HERE, "tests", "multiproc_worker.py")
    if not os.path.exists(worker):
        print("scaling skipped: tests/multiproc_worker.py not found",
              file=sys.stderr)
        return

    def free_port():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    ncores = os.cpu_count() or 1

    def run_cluster(n_procs, local_devices=2, frames=30):
        """Weak scaling requires CONSTANT per-process resources: every
        rank in every cluster size is pinned (taskset) to exactly one
        core, so t(N)/t(1) measures the framework's sync/collective
        overhead, not core contention. With fewer cores than ranks the
        cluster is oversubscribed and the number is an upper bound on
        overhead, flagged in the emitted line."""
        port = free_port()
        procs, outs = [], []
        tmp = os.path.join(_HERE, ".bench_scaling_tmp")
        os.makedirs(tmp, exist_ok=True)
        for rank in range(n_procs):
            out = os.path.join(tmp, f"rank{rank}.json")
            if os.path.exists(out):
                os.remove(out)
            env = {k: v for k, v in os.environ.items()
                   if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
            env.update({
                "SLC_COORDINATOR": f"127.0.0.1:{port}",
                "SLC_NUM_PROCESSES": str(n_procs),
                "SLC_PROCESS_ID": str(rank),
                "SLC_LOCAL_DEVICES": str(local_devices),
                "SLC_BENCH_FRAMES": str(frames),
                "SLC_OUT": out,
                "PYTHONPATH": _HERE,
            })
            procs.append(subprocess.Popen(
                ["taskset", "-c", str(rank % ncores),
                 sys.executable, worker], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True))
            outs.append(out)
        for p in procs:
            p.communicate(timeout=570)
        times = []
        for out in outs:
            with open(out) as f:
                r = json.load(f)
            if not r.get("ok") or not r.get("bench_s_per_frame"):
                raise RuntimeError(f"scaling worker failed: {r}")
            times.append(r["bench_s_per_frame"])
        return max(times)          # slowest rank = cluster step time

    # Best-of-2 per cluster size: single-run CPU wall noise is ~±8%,
    # enough to report a nonsense >1.0 efficiency.
    t1 = min(run_cluster(1) for _ in range(3))
    t2 = min(run_cluster(2) for _ in range(3))
    eff2 = min(t1 / t2, 1.0)
    emit("c_scaling_efficiency_2proc", round(eff2, 3), "fraction",
         round(eff2 / 0.8, 3), t1_ms=round(t1 * 1e3, 2),
         t2_ms=round(t2 * 1e3, 2),
         oversubscribed=(2 > ncores), cores=ncores)
    t4 = min(run_cluster(4) for _ in range(2))
    eff4 = min(t1 / t4, 1.0)
    emit("c_scaling_efficiency_4proc", round(eff4, 3), "fraction",
         round(eff4 / 0.8, 3), t4_ms=round(t4 * 1e3, 2),
         oversubscribed=(4 > ncores), cores=ncores)


def bench_rooflines():
    """Achieved fraction of HBM peak for each fused Pallas kernel at
    2 MP. Bytes moved are the analytic kernel footprints (per pixel);
    since round 4 the decode/step kernels regenerate the bilinear C/D
    triangulation tables in-kernel (mathx.lin_coeffs), removing their
    8 B/px from the real traffic AND from the denominator here:
    stripe 1u8 in + 2f32 out = 9 B; dynamic step 1u8 + 3f32 in +
    6f32 out = 37 B; heterodyne 12u8 in + 4f32 out = 28 B;
    grayphase 16u8 in + 4f32 out = 32 B; bilateral 1f32 in +
    1f32 out = 8 B.

    Timing is ON-DEVICE via the JAX profiler (slc_tpu.devtime): host
    wall clock through the tunneled TPU both under-measures (async
    dispatch) and over-measures (RPC round trips) by up to 30x."""
    if jax.default_backend() not in ("tpu", "axon"):
        print("rooflines skipped: no TPU backend", file=sys.stderr)
        return
    from slc_tpu.config import SystemConfig, HeterodyneConfig
    from slc_tpu.devtime import device_time_s
    from slc_tpu.pallas.stripe import stripe_regression_pallas
    from slc_tpu.pallas.dynamic_step import dynamic_step_pallas
    from slc_tpu.pallas.heterodyne import heterodyne_decode_pallas

    cfg, _, tables = _rig_2mp()
    het = HeterodyneConfig()
    px = H2MP * W2MP
    rng = np.random.default_rng(1)
    frame = jnp.asarray(rng.integers(0, 256, (H2MP, W2MP), np.uint8))
    f32 = lambda: jnp.asarray(
        rng.uniform(0, 100, (H2MP, W2MP)).astype(np.float32))

    def line(name, dt, bytes_moved, **extra):
        gbs = bytes_moved / dt / 1e9
        emit(f"roofline_pct_{name}", round(100.0 * gbs / HBM_PEAK_GBPS, 2),
             "%_of_hbm_peak", None, achieved_gb_s=round(gbs, 1),
             device_ms=round(dt * 1e3, 4), **extra)

    # Headline stripe line = fast sub-pixel mode (frac_bits=7: parabola
    # fraction quantized into the packed tournament word — identical
    # winner, ~0.008 px quantization; VERDICT r3 item 4). The exact f32
    # carry is reported alongside.
    dt = device_time_s(
        lambda: stripe_regression_pallas(frame, cfg.reco_window,
                                         frac_bits=7))
    line("stripe", dt, 9 * px, mode="fast_subpixel_frac7")
    dt_stripe = dt
    dt = device_time_s(
        lambda: stripe_regression_pallas(frame, cfg.reco_window))
    line("stripe_exact", dt, 9 * px)

    # Measured DMA-pattern floor (VERDICT r4 item 2): the same
    # halo-block u8 read + 2 f32 writes with the compute deleted. The
    # pattern itself tops out well below HBM peak, so this — not the
    # 819 GB/s theoretical — is the kernel's speed-of-light.
    from slc_tpu.pallas.floors import halo_block_floor
    dt_fl = device_time_s(
        lambda: halo_block_floor(frame, halo=cfg.reco_window // 2,
                                 n_out=2))
    emit("floor_pct_stripe", round(100.0 * dt_fl / dt_stripe, 1),
         "%_of_measured_dma_floor", None,
         floor_ms=round(dt_fl * 1e3, 4),
         floor_gb_s=round(9 * px / dt_fl / 1e9, 1))

    scalars = jnp.stack([
        tables.a.astype(jnp.float32), tables.b.astype(jnp.float32),
        tables.fx.astype(jnp.float32), tables.fy.astype(jnp.float32),
        tables.cx.astype(jnp.float32), tables.cy.astype(jnp.float32),
        jnp.float32(cfg.fov_min), jnp.float32(cfg.fov_max)]).reshape(1, 8)
    sw, sb, pu = f32(), f32(), f32()
    dt = device_time_s(
        lambda: dynamic_step_pallas(
            frame, sw, sb, pu, tables.c, tables.d, scalars,
            window=cfg.reco_window, fov_min=cfg.fov_min,
            fov_max=cfg.fov_max, frac_bits=7))
    line("dynamic_step", dt, 37 * px, mode="fast_subpixel_frac7")
    emit("device_fps_dynamic_step_2mp", round(1.0 / dt, 1), "fps",
         round(1.0 / dt / 60.0, 3))
    dt = device_time_s(
        lambda: dynamic_step_pallas(
            frame, sw, sb, pu, tables.c, tables.d, scalars,
            window=cfg.reco_window, fov_min=cfg.fov_min,
            fov_max=cfg.fov_max))
    line("dynamic_step_exact", dt, 37 * px)

    # One-pass PHASE-LOCKED step (pallas/dynamic_lock.py): same 37 B/px
    # logical I/O as the open-loop step — the lock adds compute, not
    # traffic — so its roofline % reads low BY DESIGN; the stage
    # ablation below is the honest floor decomposition (the kernel is
    # VPU-bound on the lock-in triangle filters + transcendentals).
    from slc_tpu.pallas.dynamic_lock import dynamic_step_lock_pallas
    lock_args = dict(window=cfg.reco_window, fov_min=cfg.fov_min,
                     fov_max=cfg.fov_max, frac_bits=7, period=20.0,
                     win_u=21, win_v=9)
    dt_full = device_time_s(
        lambda: dynamic_step_lock_pallas(
            frame, sw, sb, pu, tables.c, tables.d, scalars,
            **lock_args))
    stage_ms = {}
    for ab in ("track", "dc", "corr"):
        d = device_time_s(
            lambda: dynamic_step_lock_pallas(
                frame, sw, sb, pu, tables.c, tables.d, scalars,
                ablate=ab, **lock_args))
        stage_ms[ab] = round(d * 1e3, 4)
    line("locked_step", dt_full, 37 * px,
         stage_floor_ms=stage_ms,
         note="VPU-bound; stage_floor_ms are cumulative device times "
              "with the kernel truncated after each stage")

    imgs = jnp.asarray(rng.integers(0, 256, (het.num_images, H2MP, W2MP),
                                    np.uint8))
    periods = het.periods(cfg.pro_w)
    dt = device_time_s(
        lambda: heterodyne_decode_pallas(
            imgs, tables.c, tables.d, scalars, periods=periods,
            extent=float(cfg.pro_w), n_steps=het.phase_steps,
            fov_min=cfg.fov_min, fov_max=cfg.fov_max))
    line("heterodyne", dt, 28 * px)
    emit("device_fps_heterodyne_decode_2mp", round(1.0 / dt, 1), "fps",
         round(1.0 / dt / 60.0, 3))

    from slc_tpu.pallas.bilateral import bilateral_filter_pallas
    zmap = jnp.asarray(
        (50.0 + rng.normal(0, 0.4, (H2MP, W2MP))).astype(np.float32))
    dt = device_time_s(lambda: bilateral_filter_pallas(zmap))
    line("bilateral", dt, 8 * px)
    dt_fl = device_time_s(
        lambda: halo_block_floor(zmap, halo=1, n_out=1))
    emit("floor_pct_bilateral", round(100.0 * dt_fl / dt, 1),
         "%_of_measured_dma_floor", None,
         floor_ms=round(dt_fl * 1e3, 4),
         floor_gb_s=round(8 * px / dt_fl / 1e9, 1))

    from slc_tpu.pallas.grayphase import grayphase_decode_pallas
    n_gp = 2 * cfg.gray_bits + cfg.phase_steps
    gp_imgs = jnp.asarray(rng.integers(0, 256, (n_gp, H2MP, W2MP),
                                       np.uint8))
    dt = device_time_s(
        lambda: grayphase_decode_pallas(
            gp_imgs, tables.c, tables.d, scalars,
            gray_bits=cfg.gray_bits, gray_period=float(cfg.gray_period),
            phase_period=float(cfg.phase_period), n_steps=cfg.phase_steps,
            fov_min=cfg.fov_min, fov_max=cfg.fov_max))
    line("grayphase", dt, (n_gp + 16) * px)
    emit("device_fps_grayphase_decode_2mp", round(1.0 / dt, 1), "fps",
         round(1.0 / dt / 60.0, 3))


def main():
    if "--parity-worker" in sys.argv:
        parity_worker()
        return
    if "--comms-worker" in sys.argv:
        comms_worker()
        return
    bench_config2_headline()
    for fn in (bench_config1, bench_config3, bench_config4,
               bench_sequence100, bench_config5,
               bench_config5_frontend, bench_scaling,
               bench_comms, bench_rooflines):
        try:
            fn()
        except Exception as e:  # keep the suite robust: later configs
            print(f"{fn.__name__} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
