"""Profiling helpers — the reference's TF-profiler inference traces
(``massiveMIMO_CSI_prediction_DNN.py:441-475``, gated by --execTime)
become `jax.profiler` traces plus simple wall-clock throughput counters.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf)."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_inference(fn: Callable, args: tuple, iters: int = 10,
                   logdir: str | None = None) -> Dict[str, float]:
    """Timed (optionally traced) repeated execution — the --execTime
    harness equivalent: per-iteration wall time + throughput."""
    out = fn(*args)
    jax.block_until_ready(out)
    ctx = trace(logdir) if logdir else contextlib.nullcontext()
    with ctx:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
    return {"seconds_per_call": dt, "calls_per_second": 1.0 / dt}


class StepsPerSecond:
    """Rolling steps/s counter for training loops."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def step(self, n: int = 1) -> None:
        self.steps += n

    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else 0.0
