"""Headline benchmark: 2 MP phase-to-depth throughput on one chip.

Measures the full BASELINE config-2 pipeline — 3-frequency x 4-step
heterodyne decode (12 fringe images) -> beat-cascade unwrap ->
modulation mask -> rational triangulation + back-projection — at
1632x1216 (~2.0 MP), and prints ONE JSON line:

    {"metric": "phase_to_depth_fps_2mp", "value": ..., "unit": "fps",
     "vs_baseline": ...}

vs_baseline is fps / 60 (the north-star >=60 fps target,
BASELINE.md; the reference publishes no numbers of its own).
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compilation cache: TPU compiles here are remote and slow
# (minutes); cache them across processes.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    from slc_tpu.config import SystemConfig, HeterodyneConfig
    from slc_tpu.calib import synthetic_calibration, build_tables
    from slc_tpu.pipeline import decode_heterodyne_frame

    h, w = 1216, 1632                       # ~2.0 MP, lane/sublane aligned
    cfg = SystemConfig(cam_h=h, cam_w=w, pro_h=1216, pro_w=1632)
    het = HeterodyneConfig()
    calib = synthetic_calibration(cam_h=h, cam_w=w, pro_h=1216, pro_w=1632)
    tables = build_tables(calib, h, w)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (het.num_images, h, w),
                                    dtype=np.uint8))

    def step(images):
        r = decode_heterodyne_frame(images, tables, cfg, het)
        return r.x, r.y, r.z, r.proj_u

    fn = jax.jit(step)
    jax.block_until_ready(fn(imgs))         # compile + warm up
    jax.block_until_ready(fn(imgs))

    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(imgs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "phase_to_depth_fps_2mp",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
