"""Profiling / tracing hooks.

The reference never measures time (SURVEY.md §5.1 — tqdm bars only).  Here:
``trace`` wraps ``jax.profiler.trace`` for on-demand XLA traces viewable in
TensorBoard/Perfetto, and ``StepTimer`` gives cheap wall-clock step stats
(blocking only on the sentinel array it's handed, so device pipelines aren't
serialized by accident).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, *, enabled: bool = True):
    """Capture an XLA profiler trace into ``log_dir`` while the context runs."""
    if not enabled:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def measure_round_trip(iters: int = 5) -> float:
    """Mean dispatch+readback round trip of a trivial jitted program.

    On tunneled TPU backends this is ~30-130 ms — a real bias at ~1 s/chain
    that every bench harness must subtract (PERF.md "measurement
    methodology").  One implementation so the subtraction stays comparable
    across bench.py and the tools/ harnesses.
    """
    import jax.numpy as jnp

    triv = jax.jit(lambda x: x + 1.0)
    y = triv(jnp.zeros((8,)))
    _ = float(y[0])  # warm compile + first transfer
    t0 = time.perf_counter()
    for _ in range(iters):
        y = triv(y)
        _ = float(y[0])
    return (time.perf_counter() - t0) / iters


class StepTimer:
    """Wall-clock per-step timing with percentile summary."""

    def __init__(self):
        self.times: list[float] = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self, block_on=None):
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.times.append(time.perf_counter() - self._last)

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "total_s": float(arr.sum()),
        }
