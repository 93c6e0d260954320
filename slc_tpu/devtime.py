"""Device-side kernel timing via the JAX profiler.

Host wall-clock through a tunneled TPU is unreliable in both
directions: asynchronous dispatch can under-measure (block_until_ready
returning before device completion in some runtime states) and RPC
round trips can over-measure by 5-30x. The worst observed case is
data-dependent ``lax.while_loop`` programs (the CG unwrap solver):
block_until_ready returned in ~0.9 ms for a solve whose device trace
shows 36 ms — wall-clock "measurements" of such programs through the
tunnel are meaningless; use this module. The profiler's XLA device
trace records the actual on-device duration of each executable, which
is what a roofline comparison needs.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import tempfile
from typing import Callable, Optional

import jax


def device_time_s(fn: Callable[[], object], n: int = 20,
                  match: Optional[str] = None) -> float:
    """Mean on-device seconds per call of ``fn`` (which should invoke
    exactly one jitted computation and return its output).

    Runs ``fn`` ``n`` times under ``jax.profiler.trace`` and returns
    the average duration of the dominant TPU device event (optionally
    filtered to names containing ``match``). Falls back to host wall
    clock if no device events are found (e.g. CPU backend).
    """
    import time

    jax.block_until_ready(fn())            # warm-up / compile
    tmp = tempfile.mkdtemp(prefix="slc_devtime_")
    try:
        with jax.profiler.trace(tmp):
            # Wall fallback timed around the loop only — the trace
            # context's exit serializes the trace to disk and must not
            # count against the kernel.
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn()
            jax.block_until_ready(out)
            wall = (time.perf_counter() - t0) / n
        traces = glob.glob(
            os.path.join(tmp, "**", "*.trace.json.gz"), recursive=True)
        if not traces:
            return wall
        with gzip.open(traces[-1]) as f:
            t = json.load(f)
        ev = t.get("traceEvents", [])
        pids = {e["pid"]: e["args"].get("name", "")
                for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        tpu_pids = {p for p, name in pids.items()
                    if "TPU" in name or "device" in name.lower()}
        totals = {}
        counts = {}
        for e in ev:
            if (e.get("ph") == "X" and "dur" in e
                    and e.get("pid") in tpu_pids):
                name = e.get("name", "")
                if match is not None and match not in name:
                    continue
                totals[name] = totals.get(name, 0.0) + e["dur"]
                counts[name] = counts.get(name, 0) + 1
        if not totals:
            return wall
        # The dominant device event is the computation itself; nested
        # events (the kernel inside the jit wrapper) double-count, so
        # take the single largest-total name.
        top = max(totals, key=totals.get)
        return totals[top] / counts[top] / 1e6
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
