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


_HLO_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
              "s16": 2, "u16": 2, "u8": 1, "s8": 1, "pred": 1,
              "f64": 8, "s64": 8, "u64": 8}


def hlo_collective_bytes(compiled_text: str) -> dict:
    """Per-device collective-communication bytes of a compiled (SPMD)
    program, counted from its optimized HLO: every `collective-permute`
    (halo exchange / ppermute), `all-reduce` (psum), `all-gather`, and
    `reduce-scatter` instruction's RESULT shape, summed per category.

    This is the exact per-execution transfer volume of the compiled
    artifact — the measured backing for comms accounting that analytic
    footprints only estimate (VERDICT r3 item 8). `collective-permute`
    result bytes equal the bytes each device receives (= sends) per
    execution; `all-reduce` counts the reduced tensor once per device.

    Use: ``hlo_collective_bytes(jax.jit(f).lower(*args).compile()
    .as_text())``.
    """
    import re
    totals = {"collective-permute": 0, "all-reduce": 0,
              "all-gather": 0, "reduce-scatter": 0, "ops": 0}
    # e.g.:  %collective-permute.3 = f32[620,408]{1,0} collective-permute(
    pat = re.compile(
        r"=\s*(?:\(([^)]*)\)|(\w+)\[([\d,]*)\][^ ]*)\s+"
        r"(collective-permute|all-reduce|all-gather|reduce-scatter)"
        r"(?:-start)?\(")
    shape_pat = re.compile(r"(\w+)\[([\d,]*)\]")

    def shape_bytes(dtype, dims):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        return n * _HLO_BYTES.get(dtype, 4)

    for m in pat.finditer(compiled_text):
        tuple_body, dtype, dims, kind = m.groups()
        if tuple_body is not None:
            b = sum(shape_bytes(dt, dm)
                    for dt, dm in shape_pat.findall(tuple_body))
            # -start ops carry (operand, result[, ...]) tuples; count
            # the result once (half the unique operand/result pair).
            b //= 2
        else:
            b = shape_bytes(dtype, dims)
        totals[kind] += b
        totals["ops"] += 1
    totals["total"] = (totals["collective-permute"]
                       + totals["all-reduce"] + totals["all-gather"]
                       + totals["reduce-scatter"])
    return totals
