"""Tracing / profiling hooks.

The reference's only observability is print statements (SURVEY.md §5.1).
Here: ``jax.profiler`` trace capture around any callable (view in
TensorBoard / Perfetto), a step timer that reports examples/s/chip, and an
optional NaN-check context (``jax_debug_nans``) as the numerical sanitizer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Wall-clock examples/s accounting for training loops."""

    def __init__(self, examples_per_step: int, num_chips: Optional[int] = None):
        self.examples_per_step = examples_per_step
        self.num_chips = num_chips or jax.device_count()
        self.steps = 0
        self.elapsed = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self._t0
        self.steps += 1
        return False

    @property
    def examples_per_sec(self) -> float:
        return self.steps * self.examples_per_step / max(self.elapsed, 1e-9)

    @property
    def examples_per_sec_per_chip(self) -> float:
        return self.examples_per_sec / self.num_chips
