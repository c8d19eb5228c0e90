"""Observability subsystem: JSONL/TensorBoard metrics, profiler windows."""

import json
import os

import jax
import jax.numpy as jnp

from iclr_17_compression_tpu.train.observability import (
    MetricsLogger,
    ProfileWindow,
    step_annotation,
)


def test_metrics_logger_jsonl(tmp_path):
    with MetricsLogger(str(tmp_path), tensorboard=False) as mlog:
        mlog.log(1, {"loss": 0.5, "bpp": jnp.float32(0.25)})
        mlog.log(2, {"psnr": 30.0, "skipme": "not-a-number"}, prefix="test/")
    lines = [
        json.loads(l)
        for l in open(tmp_path / "events.jsonl").read().splitlines()
    ]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert abs(lines[0]["bpp"] - 0.25) < 1e-9
    assert lines[1]["test/psnr"] == 30.0
    assert "test/skipme" not in lines[1]


def test_metrics_logger_tensorboard(tmp_path):
    with MetricsLogger(str(tmp_path), tensorboard=True) as mlog:
        mlog.log(1, {"loss": 1.0})
    # torch.utils.tensorboard is in this image; the tb dir must have an event file
    tb = tmp_path / "tb"
    assert tb.is_dir() and any(tb.iterdir())


def test_profile_window_produces_trace(tmp_path):
    trace_dir = str(tmp_path / "trace")
    prof = ProfileWindow(trace_dir, start_step=2, num_steps=2)

    @jax.jit
    def f(x):
        return x * 2.0

    x = jnp.ones((8, 8))
    for step in range(6):
        prof.tick(step)
        with step_annotation("step"):
            x = f(x)
    prof.close()
    found = []
    for root, _, files in os.walk(trace_dir):
        found += files
    assert found, "profiler produced no trace files"


def test_profile_window_disabled_is_noop(tmp_path):
    prof = ProfileWindow("", start_step=0, num_steps=1)
    for step in range(3):
        prof.tick(step)
    prof.close()
