"""Structured per-frame metrics and stage timing.

The reference's observability is printf banners (CCalculation.cpp:183,
:228-243) and an unused z min/max scan (:668-698). Here every frame
yields a structured record (valid-pixel fraction, z range, deltaP stats,
wall-clock fps) and stages can be timed under ``jax.profiler`` trace
annotations for xprof.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def frame_stats(z: jax.Array, dp: Optional[jax.Array] = None
                ) -> Dict[str, jax.Array]:
    """Device-side per-frame stats, one fused reduction pass."""
    valid = z > 0
    nvalid = jnp.maximum(valid.sum(), 1)
    zv = jnp.where(valid, z, jnp.inf)
    stats = {
        "valid_frac": valid.mean(),
        "z_min": jnp.where(valid.any(), zv.min(), 0.0),
        "z_max": jnp.where(valid.any(), jnp.where(valid, z, -jnp.inf).max(),
                           0.0),
        "z_mean": jnp.where(valid, z, 0.0).sum() / nvalid,
    }
    if dp is not None:
        stats["dp_mean_abs"] = jnp.abs(dp).mean()
        stats["dp_max_abs"] = jnp.abs(dp).max()
    return stats


@dataclasses.dataclass
class MetricsLog:
    """Accumulates per-frame records; writes JSON-lines."""

    records: List[dict] = dataclasses.field(default_factory=list)
    _t_last: Optional[float] = None

    def log_frame(self, frame_idx: int, stats: Dict[str, jax.Array],
                  **extra) -> dict:
        now = time.perf_counter()
        fps = (1.0 / (now - self._t_last)
               if self._t_last is not None else None)
        self._t_last = now
        rec = {"frame": int(frame_idx),
               **{k: float(np.asarray(v)) for k, v in stats.items()},
               **extra}
        if fps is not None:
            rec["fps"] = round(fps, 2)
        self.records.append(rec)
        return rec

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            for rec in self.records:
                f.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def stage(name: str):
    """Profiler trace annotation (shows up in xprof) + wall-clock."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        yield
    _ = time.perf_counter() - t0


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
