"""Observability: structured metrics, profiler traces, debug modes.

SURVEY.md §5 — the reference's observability is a TensorBoardX writer in one
trainer (reference train.py:130-133,193-196) and bare prints everywhere else
(train_2StepsNet.py:257-260); profiling exists only as commented-out
wall-clock accumulators (train.py:89-91,113,121,126-127,146-148). Here:

- ``MetricsLogger``: every metric dict goes to a JSONL event log (always,
  machine-readable) and to TensorBoard when a writer backend is available
  (torch.utils.tensorboard in this image). Scalar names mirror the
  reference's (``rd_loss``, ``psnr``, ``bpp``, and ``*_Test`` for eval).
- ``profile_trace``: a window of jitted steps wrapped in
  ``jax.profiler.start_trace`` → xprof/perfetto-compatible trace of XLA
  ops + ICI collectives, viewable in TensorBoard's profile tab.
- ``step_annotation``: named TraceAnnotation around host-side phases
  (data, step, eval) so device traces line up with the input pipeline.
- ``apply_debug_flags``: jax_debug_nans toggle (the TPU-applicable analog
  of a sanitizer run) — NaNs raise at the emitting op instead of surfacing
  as a corrupt checkpoint thousands of steps later.
"""

import json
import os
import time
from contextlib import contextmanager
from typing import Dict, Optional

import jax


class MetricsLogger:
    """JSONL event log + optional TensorBoard scalars."""

    def __init__(self, save_dir: str, tensorboard: bool = True):
        os.makedirs(save_dir, exist_ok=True)
        self._f = open(os.path.join(save_dir, "events.jsonl"), "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(save_dir, "tb"))
            except Exception:
                self._tb = None  # tensorboard backend not present: JSONL only

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            name = f"{prefix}{k}"
            try:
                row[name] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(name, row[name], int(step))
        self._f.write(json.dumps(row) + "\n")

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ProfileWindow:
    """Trace steps [start, start+num) of a training loop.

    Call ``tick(step)`` once per step; the trace starts/stops itself. The
    resulting directory opens in TensorBoard (profile plugin) / xprof.
    """

    def __init__(self, trace_dir: str, start_step: int = 10, num_steps: int = 5):
        self.trace_dir = trace_dir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def tick(self, step: int) -> None:
        if not self.trace_dir:
            return
        if step == self.start and not self._active:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


@contextmanager
def profile_trace(trace_dir: str):
    """Trace a whole block (eval sweeps, benchmark runs)."""
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Named annotation visible on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def apply_debug_flags(debug_nans: bool = False) -> None:
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
