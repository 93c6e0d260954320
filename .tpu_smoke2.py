"""Real-TPU check: fused grayphase kernel vs XLA path + timings."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from slc_tpu.config import REFERENCE_CONFIG as cfg
from slc_tpu.calib import synthetic_calibration, build_tables
from slc_tpu import synth
from slc_tpu.pipeline import decode_first_frame

calib = synthetic_calibration(cam_h=cfg.cam_h, cam_w=cfg.cam_w,
                              pro_h=cfg.pro_h, pro_w=cfg.pro_w)
tables = build_tables(calib, cfg.cam_h, cfg.cam_w)
scene = synth.render_static_scene(calib, cfg, synth.sphere_surface(),
                                  noise_sigma=1.0)
g = jnp.asarray(scene.gray_images)
p = jnp.asarray(scene.phase_images)

rp = decode_first_frame(g, p, tables, cfg, use_pallas=True)
rx = decode_first_frame(g, p, tables, cfg, use_pallas=False)
for nm in ("x", "y", "z", "proj_u"):
    a, b = np.asarray(getattr(rp, nm)), np.asarray(getattr(rx, nm))
    print(f"grayphase {nm}: maxdiff {np.max(np.abs(a-b)):.3e}")

def bench(use_pallas, n=50):
    f = lambda: decode_first_frame(g, p, tables, cfg, use_pallas=use_pallas)
    jax.block_until_ready(f().z)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f()
    jax.block_until_ready(out.z)
    return (time.perf_counter() - t0) / n * 1e3

print(f"frame0 decode 1.3MP: XLA {bench(False):.3f} ms, "
      f"Pallas {bench(True):.3f} ms")
