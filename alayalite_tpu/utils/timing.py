"""Wall-clock timing + profiling helpers.

The reference has a µs `Timer` logged around build/search
(include/utils/timer.hpp, hnsw_builder.hpp:111-129); here the same logging
plus `jax.profiler` trace capture — a strict upgrade (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

log = logging.getLogger("alayalite_tpu")


class Timer:
    """Monotonic wall-clock timer (reference Timer parity)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()

    def elapsed(self) -> float:
        """Seconds since construction/reset."""
        return time.perf_counter() - self._t0

    def elapsed_us(self) -> float:
        return self.elapsed() * 1e6


@contextlib.contextmanager
def timed(label: str, level: int = logging.INFO) -> Iterator[Timer]:
    """``with timed("build"):`` — logs '<label>: <secs>s' on exit."""
    t = Timer()
    try:
        yield t
    finally:
        log.log(level, "%s: %.3fs", label, t.elapsed())


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto).
    No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
