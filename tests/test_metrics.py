"""Metrics: stage wall-clock capture into MetricsLog records.

The reference's observability is printf banners (CCalculation.cpp:183,
:228-243); here per-stage timings must land in the structured per-frame
records (SURVEY.md §5).
"""

import json
import time

import jax.numpy as jnp
import pytest

from slc_tpu.metrics import MetricsLog, frame_stats, stage


def test_stage_records_wall_clock(tmp_path):
    log = MetricsLog()
    with stage("slc/dynamic_step", log):
        time.sleep(0.01)
    with stage("slc/write", log, bytes_moved=100_000_000):
        time.sleep(0.01)
    rec = log.log_frame(3, frame_stats(jnp.ones((4, 4))))
    assert rec["t_dynamic_step_ms"] >= 10.0
    assert rec["t_write_ms"] >= 10.0
    assert rec["gbps_write"] > 0
    # Timings attach to exactly one frame.
    rec2 = log.log_frame(4, frame_stats(jnp.ones((4, 4))))
    assert "t_dynamic_step_ms" not in rec2

    p = tmp_path / "metrics.jsonl"
    log.save(str(p))
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert lines[0]["t_dynamic_step_ms"] >= 10.0


def test_stage_without_log_is_fine():
    with stage("slc/anonymous"):
        pass


def test_pallas_decoders_reject_degenerate_steps():
    import jax.numpy as jnp
    import numpy as np
    from slc_tpu.pallas.grayphase import grayphase_decode_pallas
    from slc_tpu.pallas.heterodyne import heterodyne_decode_pallas

    h, w = 8, 128
    c = jnp.ones((h, w), jnp.float32)
    d = jnp.ones((h, w), jnp.float32)
    scalars = jnp.zeros((1, 8), jnp.float32)
    imgs = jnp.zeros((2 * 6 + 2, h, w), jnp.uint8)
    with pytest.raises(ValueError, match="n_steps"):
        grayphase_decode_pallas(imgs, c, d, scalars, gray_bits=6,
                                gray_period=20.0, phase_period=40.0,
                                n_steps=2, interpret=True)
    imgs2 = jnp.zeros((3 * 2, h, w), jnp.uint8)
    with pytest.raises(ValueError, match="n_steps"):
        heterodyne_decode_pallas(imgs2, c, d, scalars,
                                 periods=(20.0, 22.0, 24.0), extent=1280.0,
                                 n_steps=2, interpret=True)
