"""Streaming dynamic reconstruction with transfer/compute overlap
(BASELINE config 4).

The reference's dynamic loop is strictly synchronous: imread -> track ->
write, one frame at a time (CCalculation.cpp:221-316). Here the loop is
pipelined using JAX's asynchronous dispatch:

  * frame f+1's uint8 host->device transfer is issued while frame f's
    step is still executing on device (double buffering — the transfer
    rides the DMA engines, the step the compute units),
  * the depth result of frame f-1 is copied device->host concurrently
    (``copy_to_host_async``),

so steady-state wall time per frame is max(compute, transfer), not their
sum. The tracker state itself never leaves the device and is donated
buffer-to-buffer (slc_tpu.dynamic.dynamic_step).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Iterator, List, Optional, Tuple

import jax
import numpy as np

from slc_tpu.calib import TriangulationTables
from slc_tpu.config import SystemConfig
from slc_tpu.dynamic import TrackerState, dynamic_step
from slc_tpu.pipeline import FrameResult


@dataclasses.dataclass
class StreamStats:
    """Per-frame latency / throughput of a streaming run."""
    latencies_s: List[float]

    @property
    def fps(self) -> float:
        return len(self.latencies_s) / max(sum(self.latencies_s), 1e-12)

    def percentile_ms(self, q: float) -> float:
        return float(np.percentile(np.asarray(self.latencies_s), q) * 1e3)

    def summary(self) -> dict:
        return {"frames": len(self.latencies_s),
                "fps": round(self.fps, 2),
                "p50_ms": round(self.percentile_ms(50), 3),
                "p95_ms": round(self.percentile_ms(95), 3)}


def stream_frames(state: TrackerState, frames: Iterable[np.ndarray],
                  tables: TriangulationTables, cfg: SystemConfig,
                  fetch: Optional[Callable[[FrameResult], object]] = None,
                  scale_gradient: bool = True, subpixel: bool = True
                  ) -> Iterator[Tuple[TrackerState, object]]:
    """Pipelined streaming loop. Yields (state, fetched) per frame where
    ``fetched`` is ``fetch(result)`` (default: the result with its z
    transferred host-side asynchronously one frame behind).

    The yielded state of frame f is NOT synchronized; callers needing
    host values must block explicitly (the checkpoint path does).
    """
    if fetch is None:
        def fetch(res: FrameResult):
            res.z.copy_to_host_async()
            return res

    pending = None          # device frame awaiting compute
    for frame in frames:
        dev = jax.device_put(frame)         # async H2D for frame f+1
        if pending is not None:
            state, res = dynamic_step(state, pending, tables, cfg,
                                      scale_gradient, subpixel)
            yield state, fetch(res)
        pending = dev
    if pending is not None:
        state, res = dynamic_step(state, pending, tables, cfg,
                                  scale_gradient, subpixel)
        yield state, fetch(res)


def run_streaming(state: TrackerState, frames: Iterable[np.ndarray],
                  tables: TriangulationTables, cfg: SystemConfig,
                  sync_every: int = 1,
                  scale_gradient: bool = True, subpixel: bool = True,
                  fetch: Optional[Callable[[FrameResult], object]] = None
                  ) -> Tuple[TrackerState, StreamStats]:
    """Drive the streaming loop measuring per-frame wall latency.

    ``sync_every`` = N blocks on the depth map every N frames (N=1
    measures true per-frame latency; larger N measures pipelined
    throughput where transfers hide under compute). ``fetch`` overrides
    the per-frame result consumer (default: async z host copy); pass
    e.g. ``lambda r: r`` to keep results device-resident when the
    host link is slow (tunneled TPU).
    """
    lat: List[float] = []
    t0 = time.perf_counter()
    last = None
    for i, (state, res) in enumerate(
            stream_frames(state, frames, tables, cfg, fetch=fetch,
                          scale_gradient=scale_gradient,
                          subpixel=subpixel)):
        last = res
        if (i + 1) % sync_every == 0:
            # Block on the carried state's depth (always a device
            # array, regardless of what ``fetch`` returned).
            jax.block_until_ready(state.z)
            now = time.perf_counter()
            dt = (now - t0) / sync_every
            lat.extend([dt] * sync_every)
            t0 = now
    if last is not None:
        jax.block_until_ready(state.z)
    return state, StreamStats(lat)
