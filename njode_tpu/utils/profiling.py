"""Profiling / tracing helpers.

The reference's only instrumentation is wall-clock epoch timing
(reference utils/training.py:199,263-265).  TPU-native additions: optional
``jax.profiler`` traces (viewable in XProf/TensorBoard) and a step timer
with proper ``block_until_ready`` semantics so device async dispatch doesn't
lie about latencies.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """Wrap a region in a jax.profiler trace when trace_dir is given."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield
    print(f"Profiler trace written to {trace_dir}")


class StepTimer:
    """Measures real device step time (blocks on results)."""

    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def measure(self, *block_on):
        t0 = time.perf_counter()
        yield
        for x in block_on:
            jax.block_until_ready(x)
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def compile_time(fn, *args, **kwargs) -> float:
    """Time the compile of a jitted function via AOT lower/compile."""
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args, **kwargs).compile()
    return time.perf_counter() - t0
