"""REAL multi-process distribution: 2 and 4 OS processes join a
`jax.distributed` CPU cluster through slc_tpu.parallel.launch's SLC_*
environment contract, shard scan-parallel work with
`shard_host_batch`, run `tiled_batched_dynamic_step` whose psum metrics
cross the process boundary, and must reproduce the single-device golden.

This is the evidence for the BASELINE.md multi-host scaling row that
in-process virtual-device tests cannot provide (the reference is a
single Windows process, DynaFrame/main.cpp:42-45). Each worker is
tests/multiproc_worker.py; see its docstring for what it checks.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multiproc_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_cluster(tmp_path, n_procs: int, local_devices: int,
                    timeout: int = 570):
    port = _free_port()
    procs, outs = [], []
    for rank in range(n_procs):
        out = tmp_path / f"rank{rank}.json"
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env.update({
            "SLC_COORDINATOR": f"127.0.0.1:{port}",
            "SLC_NUM_PROCESSES": str(n_procs),
            "SLC_PROCESS_ID": str(rank),
            "SLC_LOCAL_DEVICES": str(local_devices),
            "SLC_OUT": str(out),
            "PYTHONPATH": _REPO,
        })
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outs.append(out)

    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)

    results = []
    for rank, out in enumerate(outs):
        assert out.exists(), (
            f"rank {rank} wrote no result; log:\n{logs[rank]}")
        results.append(json.loads(out.read_text()))
    for rank, res in enumerate(results):
        assert res.get("ok"), (
            f"rank {rank} failed: {json.dumps(res, indent=1)}\n"
            f"log:\n{logs[rank]}")
    return results


@pytest.mark.parametrize("n_procs,local_devices", [(2, 4), (4, 2)])
def test_multiprocess_cluster(tmp_path, n_procs, local_devices):
    results = _launch_cluster(tmp_path, n_procs, local_devices)
    for rank, res in enumerate(results):
        assert res["process_index"] == rank
        assert res["process_count"] == n_procs
        assert res["n_global_devices"] == n_procs * local_devices
        assert res["n_local_devices"] == local_devices
    # Every process owns a distinct contiguous scan block covering all.
    slices = sorted(tuple(r["local_scan_slice"]) for r in results)
    assert slices[0][0] == 0 and slices[-1][1] == n_procs
    assert all(slices[i][1] == slices[i + 1][0]
               for i in range(len(slices) - 1))
