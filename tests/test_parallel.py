"""Tile-parallel (shard_map + halo exchange) parity with the
single-device path, on the 8-virtual-CPU-device mesh (conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from slc_tpu.calib import synthetic_calibration, build_tables
from slc_tpu.config import SystemConfig
from slc_tpu import synth
from slc_tpu.dynamic import TrackerState, init_tracker, dynamic_step
from slc_tpu.ops.stripe import stripe_regression
from slc_tpu.pipeline import decode_first_frame
from slc_tpu.parallel import (tile_mesh, tiled_absolute_decode,
                              tiled_stripe_regression, tiled_dynamic_step,
                              tiled_batched_dynamic_step, shard_image)

CFG = SystemConfig(cam_h=96, cam_w=160, pro_h=96, pro_w=640,
                   gray_bits=5, phase_steps=4)


@pytest.fixture(scope="module")
def rig():
    calib = synthetic_calibration(cam_h=CFG.cam_h, cam_w=CFG.cam_w,
                                  pro_h=CFG.pro_h, pro_w=CFG.pro_w)
    tables = build_tables(calib, CFG.cam_h, CFG.cam_w)
    return calib, tables


def test_tile_mesh_shapes(eight_devices):
    mesh = tile_mesh(eight_devices)
    assert mesh.shape["scan"] == 1
    assert mesh.shape["ty"] * mesh.shape["tx"] == 8
    mesh2 = tile_mesh(eight_devices, scan=2, tiles=(2, 2))
    assert mesh2.shape == {"scan": 2, "ty": 2, "tx": 2}


def test_tiled_absolute_decode_matches_single(eight_devices, rig):
    calib, tables = rig
    mesh = tile_mesh(eight_devices, tiles=(2, 4))
    scene = synth.render_static_scene(calib, CFG, synth.plane_surface(50.0))
    gray = jnp.asarray(scene.gray_images)
    phase = jnp.asarray(scene.phase_images)

    ref = decode_first_frame(gray, phase, tables, CFG)
    got = tiled_absolute_decode(shard_image(gray, mesh),
                                shard_image(phase, mesh), tables, CFG, mesh)
    np.testing.assert_array_equal(np.asarray(got.proj_u),
                                  np.asarray(ref.proj_u))
    np.testing.assert_array_equal(np.asarray(got.z), np.asarray(ref.z))
    np.testing.assert_array_equal(np.asarray(got.x), np.asarray(ref.x))


def test_tiled_heterodyne_decode_matches_single(eight_devices, rig):
    """Tile-parallel heterodyne decode == single-device XLA path,
    bit-exact (pointwise math, identical per tile; only the global
    back-projection coordinates differ structurally)."""
    from slc_tpu.config import HeterodyneConfig
    from slc_tpu.pipeline import decode_heterodyne_frame
    from slc_tpu.parallel import tiled_heterodyne_decode

    calib, tables = rig
    het = HeterodyneConfig()
    mesh = tile_mesh(eight_devices, tiles=(2, 4))
    imgs, _, _ = synth.render_fringe_stack(
        calib, CFG, synth.plane_surface(55.0, 0.1, 0.05),
        het.periods(CFG.pro_w), het.phase_steps, noise_sigma=1.0)
    imgs = jnp.asarray(imgs)

    ref = decode_heterodyne_frame(imgs, tables, CFG, het,
                                  use_pallas=False)
    got = tiled_heterodyne_decode(shard_image(imgs, mesh), tables, CFG,
                                  het, mesh)
    np.testing.assert_array_equal(np.asarray(got.proj_u),
                                  np.asarray(ref.proj_u))
    np.testing.assert_array_equal(np.asarray(got.z), np.asarray(ref.z))
    np.testing.assert_array_equal(np.asarray(got.x), np.asarray(ref.x))
    np.testing.assert_array_equal(np.asarray(got.y), np.asarray(ref.y))


@pytest.mark.parametrize("subpixel", [False, True])
def test_tiled_stripe_regression_matches_single(eight_devices, rng, subpixel):
    mesh = tile_mesh(eight_devices, tiles=(4, 2))
    frame = rng.integers(0, 256, size=(CFG.cam_h, CFG.cam_w), dtype=np.uint8)
    f = jnp.asarray(frame)
    ref_w, ref_b = stripe_regression(f, CFG.reco_window, subpixel)
    got_w, got_b = tiled_stripe_regression(shard_image(f, mesh), CFG, mesh,
                                           subpixel)
    np.testing.assert_array_equal(np.asarray(got_w), np.asarray(ref_w))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(ref_b))


def test_tiled_dynamic_step_matches_single(eight_devices, rig):
    calib, tables = rig
    mesh = tile_mesh(eight_devices, tiles=(2, 4))
    frames, zs, pus = synth.render_dynamic_sequence(
        calib, CFG, 3, z0=50.0, dz_per_frame=0.5, stripe_period=12)

    state = init_tracker(jnp.asarray(frames[0]),
                         jnp.asarray(pus[0], jnp.float32),
                         jnp.asarray(zs[0], jnp.float32), CFG)
    # Copy scalar leaves: both steps donate their state argument, and a
    # shared buffer would be deleted by the first call.
    t_state = jax.tree.map(lambda a: shard_image(a, mesh)
                           if a.ndim == 2 else jnp.array(a), state)
    for f in range(1, 3):
        fr = jnp.asarray(frames[f])
        state, ref = dynamic_step(state, fr, tables, CFG)
        t_state, got = tiled_dynamic_step(t_state, shard_image(fr, mesh),
                                          tables, CFG, mesh)
        np.testing.assert_allclose(np.asarray(got.proj_u),
                                   np.asarray(ref.proj_u), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.z), np.asarray(ref.z),
                                   atol=1e-3)


def test_tiled_batched_step_dp_and_metrics(eight_devices, rig):
    """scan=2 DP groups x 2x2 tiles: each scan group must evolve its own
    sequence; metrics are psum-reduced across the whole mesh."""
    calib, tables = rig
    mesh = tile_mesh(eight_devices, scan=2, tiles=(2, 2))
    frames, zs, pus = synth.render_dynamic_sequence(
        calib, CFG, 2, z0=50.0, dz_per_frame=0.5, stripe_period=12)

    state = init_tracker(jnp.asarray(frames[0]),
                         jnp.asarray(pus[0], jnp.float32),
                         jnp.asarray(zs[0], jnp.float32), CFG)
    # Stack the same scan twice (S=2); results must match the
    # single-device step on each.
    from jax.sharding import NamedSharding
    def stack(a):
        if a.ndim == 2:
            out = jnp.stack([a, a])
            return jax.device_put(out, NamedSharding(
                mesh, P("scan", "ty", "tx")))
        return jnp.stack([a, a])
    states = jax.tree.map(stack, state)
    fr = jnp.asarray(frames[1])
    frs = jax.device_put(jnp.stack([fr, fr]),
                         NamedSharding(mesh, P("scan", "ty", "tx")))

    _, ref = dynamic_step(state, fr, tables, CFG)
    new_states, got, metrics = tiled_batched_dynamic_step(
        states, frs, tables, CFG, mesh)
    for s in range(2):
        np.testing.assert_allclose(np.asarray(got.z)[s],
                                   np.asarray(ref.z), atol=1e-3)
    valid = float((np.asarray(ref.z) > 0).mean())
    assert abs(float(metrics["valid_frac"]) - valid) < 1e-5


def test_tiled_unwrap_spatial_matches_single(eight_devices):
    """Distributed CG unwrap: same operator, lockstep scalars -> matches
    the single-device solver to float tolerance."""
    from slc_tpu.ops.unwrap_spatial import unwrap_spatial
    from slc_tpu.parallel.unwrap_tiled import tiled_unwrap_spatial
    t = 32.0
    h, w = 96, 128
    x = (np.linspace(0, 5 * t, w)[None, :]
         + 0.4 * np.arange(h)[:, None]).astype(np.float32)
    psi = np.mod(x, t).astype(np.float32)
    q = np.ones((h, w), np.float32)
    q[40:48] = 1e-3

    mesh = tile_mesh(eight_devices, tiles=(2, 4))
    ref = np.asarray(unwrap_spatial(jnp.asarray(psi), t,
                                    quality=jnp.asarray(q),
                                    max_iters=400,
                                    anchor=jnp.asarray(x)))
    got = np.asarray(tiled_unwrap_spatial(
        shard_image(jnp.asarray(psi), mesh), t, mesh,
        quality=shard_image(jnp.asarray(q), mesh),
        max_iters=400, anchor=shard_image(jnp.asarray(x), mesh)))
    good = np.ones((h, w), bool); good[40:48] = False
    np.testing.assert_allclose(got[good], ref[good], atol=1e-3)
    np.testing.assert_allclose(got[good], x[good], atol=1e-2)


def test_tiled_unwrap_hard_scene_matches_single(eight_devices, rng):
    """Tiled unwrap on the occlusion/step scene (VERDICT item 5): the
    distributed solver must match single-device on the discontinuous
    scene, and its psum-reduced diagnostics must agree with the
    single-device counts."""
    from slc_tpu.ops.unwrap_spatial import unwrap_spatial
    from slc_tpu.parallel.unwrap_tiled import tiled_unwrap_spatial
    from tests.test_unwrap_spatial import _box_step_scene
    t = 32.0
    x, psi, box, ring = _box_step_scene(rng, t=t, noise=0.05)
    q = np.ones(psi.shape, np.float32)
    q[ring] = 0.0
    anchor = (x + rng.uniform(-t / 3, t / 3, x.shape)).astype(np.float32)

    ref, ri = unwrap_spatial(jnp.asarray(psi), t, quality=jnp.asarray(q),
                             max_iters=800, anchor=jnp.asarray(anchor),
                             return_info=True)
    mesh = tile_mesh(eight_devices, tiles=(2, 4))
    got, gi = tiled_unwrap_spatial(
        shard_image(jnp.asarray(psi), mesh), t, mesh,
        quality=shard_image(jnp.asarray(q), mesh), max_iters=800,
        anchor=shard_image(jnp.asarray(anchor), mesh), return_info=True)
    good = ~ring
    np.testing.assert_allclose(np.asarray(got)[good],
                               np.asarray(ref)[good], atol=1e-3)
    assert int(gi["suspect_count"]) == int(ri["suspect_count"])
    assert int(gi["residue_count"]) == int(ri["residue_count"])
    assert int(gi["anchor_disagreement_count"]) \
        == int(ri["anchor_disagreement_count"])
    # Lockstep CG: the cycle schedule and operator are identical, so
    # iteration counts may differ only where the stopping test's
    # residual norm crosses tol between the two dot-product
    # associations (tiled = psum of per-tile partials, single = one
    # flat sum — a ~1 ulp difference that is the ONLY arithmetic
    # divergence). Allow exactly that: at most one iteration apart.
    assert abs(int(gi["cg_iters"]) - int(ri["cg_iters"])) <= 1, \
        (int(gi["cg_iters"]), int(ri["cg_iters"]))


def test_tiled_step_collective_bytes(eight_devices):
    """Comms accounting measured from the compiled artifact (VERDICT r3
    item 8): the tiled dynamic step's per-device collective traffic
    must be halo-dominated (collective-permute) and a tiny fraction of
    its HBM footprint — the property that makes image-tile SP nearly
    free on ICI."""
    import functools
    from jax.sharding import NamedSharding
    from slc_tpu.parallel.tiled import tiled_batched_dynamic_step
    from slc_tpu.devtime import hlo_collective_bytes

    h, w = 128, 256
    cfg = SystemConfig(cam_h=h, cam_w=w, pro_h=h, pro_w=640,
                       gray_bits=5)
    calib = synthetic_calibration(cam_h=h, cam_w=w, pro_h=h, pro_w=640)
    tables = build_tables(calib, h, w)
    mesh = tile_mesh(jax.devices(), scan=1, tiles=(2, 4))
    sh = NamedSharding(mesh, P(None, "ty", "tx"))
    rng = np.random.default_rng(0)
    put = lambda a: jax.device_put(a[None], sh)
    frame = put(rng.integers(0, 256, (h, w), np.uint8))
    f32 = lambda: put(rng.uniform(0, 100, (h, w)).astype(np.float32))
    state = TrackerState(proj_u=f32(), strip_w=f32(), strip_b=f32(),
                         z=f32(), frame_idx=jnp.zeros((1,), jnp.int32))
    fn = jax.jit(functools.partial(tiled_batched_dynamic_step,
                                   tables=tables, cfg=cfg, mesh=mesh))
    txt = fn.lower(state, frame).compile().as_text()
    stats = hlo_collective_bytes(txt)
    assert stats["ops"] > 0
    # Halo-dominated: psum carries only scalar metrics.
    assert stats["collective-permute"] > 100 * stats["all-reduce"]
    # Tiny vs the per-tile HBM footprint (37 B/px).
    hbm = 37 * h * w // 8
    assert stats["collective-permute"] < 0.1 * hbm, stats
