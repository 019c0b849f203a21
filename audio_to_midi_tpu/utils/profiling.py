"""Profiling & tracing — first-class (SURVEY.md §5: the reference only has
commented-out ``jax.profiler.trace`` hooks, train.py:909, infer.py:361).

Provides:
  * ``trace(dir)`` — context manager around jax.profiler.trace (perfetto/
    tensorboard-consumable);
  * ``start_server(port)`` — live profiler server for capture-on-demand;
  * ``annotate`` — named_scope decorator used across the model so HLO ops
    carry readable names;
  * ``StepTimer`` — lightweight wall-time EMA per step for metrics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", create_perfetto_link: bool = False) -> Iterator[None]:
    with jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link):
        yield


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


def annotate(name: str):
    """Decorator: wrap a function in a named scope for HLO/trace readability."""
    def wrap(fn):
        return jax.named_scope(name)(fn)
    return wrap


class StepTimer:
    """EMA step timer with steps/sec and items/sec accessors."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None
        self._last = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else (1 - self.alpha) * self.ema + self.alpha * dt
        self._last = now
        return self.ema

    @property
    def steps_per_sec(self) -> float | None:
        return None if not self.ema else 1.0 / self.ema
