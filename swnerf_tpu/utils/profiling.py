"""Profiling hooks (SURVEY.md §5: the reference has none beyond wall-clock
prints; here jax.profiler traces are a first-class switch).

Set ``SWNERF_PROFILE_DIR=/path`` to capture an XLA/TensorBoard trace of the
first ``SWNERF_PROFILE_STEPS`` (default 20) training steps in any pipeline,
or use :func:`trace` directly.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Traces steps [start, start+n) of a training loop when
    SWNERF_PROFILE_DIR is set; otherwise free."""

    def __init__(self):
        self.logdir = os.environ.get("SWNERF_PROFILE_DIR")
        self.n = int(os.environ.get("SWNERF_PROFILE_STEPS", 20))
        self._active = False

    def step(self, i: int, start: int) -> None:
        if self.logdir is None:
            return
        import jax

        if i == start + 1 and not self._active:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif self._active and i >= start + self.n:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
