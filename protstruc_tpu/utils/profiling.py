"""Profiling and tracing helpers (SURVEY.md §5: the reference has none).

Thin wrappers over jax.profiler so featurization pipelines get named trace
annotations in XProf/TensorBoard; the Pallas kernel is already named
("trrosetta_pair_features").
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace", "profile_to", "Timer"]


@contextlib.contextmanager
def trace(name: str) -> Iterator[None]:
    """Named annotation visible in profiler traces (no-op cost when idle)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace for the enclosed block into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on device work (for benchmarks/logs)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.elapsed: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False

    def block(self, tree):
        """block_until_ready a pytree, then stop the clock."""
        jax.block_until_ready(tree)
        self.elapsed = time.perf_counter() - self._t0
        return tree
