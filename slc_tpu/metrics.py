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
    """Accumulates per-frame records; writes JSON-lines.

    Stage timings recorded via :func:`stage` between two ``log_frame``
    calls are folded into the next frame's record as
    ``t_<stage>_ms`` (and ``gbps_<stage>`` when bytes-moved is known),
    so a replay run's metrics.jsonl shows decode/track/write wall-clock
    per frame — the per-stage observability SURVEY.md §5 commits to.
    """

    records: List[dict] = dataclasses.field(default_factory=list)
    #: Run-level (non-per-frame) summary records, e.g. the async
    #: writer's totals; written after the frame records in save().
    summaries: List[dict] = dataclasses.field(default_factory=list)
    _t_last: Optional[float] = None
    _pending_stages: Dict[str, dict] = dataclasses.field(
        default_factory=dict)

    def log_stage(self, name: str, wall_s: float,
                  bytes_moved: Optional[int] = None) -> None:
        """Record one stage timing, attached to the next log_frame."""
        short = name.rsplit("/", 1)[-1]
        entry = {f"t_{short}_ms": round(wall_s * 1e3, 3)}
        if bytes_moved is not None and wall_s > 0:
            # 3 significant digits, not fixed decimals: tiny test-scale
            # stages are fractions of a MB and must not round to 0.
            gbps = bytes_moved / wall_s / 1e9
            entry[f"gbps_{short}"] = float(f"{gbps:.3g}")
        self._pending_stages.update(entry)

    def log_frame(self, frame_idx: int, stats: Dict[str, jax.Array],
                  **extra) -> dict:
        now = time.perf_counter()
        fps = (1.0 / (now - self._t_last)
               if self._t_last is not None else None)
        self._t_last = now
        rec = {"frame": int(frame_idx),
               **{k: float(np.asarray(v)) for k, v in stats.items()},
               **self._pending_stages,
               **extra}
        self._pending_stages = {}
        if fps is not None:
            rec["fps"] = round(fps, 2)
        self.records.append(rec)
        return rec

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            for rec in self.records:
                f.write(json.dumps(rec) + "\n")
            for rec in self.summaries:
                f.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def stage(name: str, log: Optional[MetricsLog] = None,
          bytes_moved: Optional[int] = None):
    """Profiler trace annotation (shows up in xprof) + wall-clock.

    With ``log``, the block's wall time (and achieved GB/s if
    ``bytes_moved`` is given) lands in the log's next frame record.
    JAX dispatch is asynchronous — block inside the ``with`` body
    (e.g. ``jax.block_until_ready``) for the time to mean device time
    rather than enqueue time.
    """
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        yield
        wall = time.perf_counter() - t0
    if log is not None:
        log.log_stage(name, wall, bytes_moved)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
