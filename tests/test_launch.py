"""Multi-host launcher: single-process path, global mesh, host-batch feed.

The reference has no launcher (single Windows process, main.cpp:42-45);
this covers the north-star multi-host bootstrap on the 8-virtual-device
CPU backend (conftest.py sets xla_force_host_platform_device_count=8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from slc_tpu.parallel import launch
from slc_tpu.parallel.mesh import SCAN


def test_initialize_single_process():
    ctx = launch.initialize()
    assert ctx.process_count == 1
    assert ctx.process_index == 0
    assert ctx.is_coordinator
    assert len(ctx.global_devices) == 8
    # Idempotent.
    assert launch.initialize().process_count == 1


def test_global_tile_mesh_axes():
    launch.initialize()
    mesh = launch.global_tile_mesh(scan=2)
    assert mesh.shape[SCAN] == 2
    assert mesh.shape["ty"] * mesh.shape["tx"] == 4
    assert np.asarray(mesh.devices).size == 8


def test_shard_host_batch_roundtrip():
    launch.initialize()
    mesh = launch.global_tile_mesh(scan=4)
    data = np.arange(4 * 6 * 8, dtype=np.float32).reshape(4, 6, 8)
    sl = launch.local_scan_slice(mesh, 4)
    assert sl == slice(0, 4)  # single process owns everything
    arr = launch.shard_host_batch(mesh, P(SCAN), data[sl])
    assert arr.shape == (4, 6, 8)
    np.testing.assert_array_equal(np.asarray(arr), data)
    # And it is actually sharded over the scan axis.
    assert len({s.device.id for s in arr.addressable_shards}) == 8

    total = jax.jit(jnp.sum)(arr)
    np.testing.assert_allclose(float(total), data.sum())


def test_local_scan_slice_divisibility():
    launch.initialize()
    mesh = launch.global_tile_mesh(scan=4)
    with pytest.raises(ValueError):
        launch.local_scan_slice(mesh, 6)
