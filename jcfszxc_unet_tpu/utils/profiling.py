"""Tracing / profiling / debug instrumentation (SURVEY.md §5).

The reference has only a vestigial ``tic = time.time()`` (train.py:198) and
tqdm step timing; its NaN guards are always-on python checks
(train.py:259-294).  TPU-natively:

  * ``trace`` — context manager around ``jax.profiler`` trace capture for
    the hot loop (view with TensorBoard / xprof);
  * ``annotate`` — named TraceAnnotation for region labelling;
  * ``Throughput`` — steady-state patches/sec counter that excludes the
    first (compile-bearing) measurement;
  * ``enable_nan_debugging`` — flips ``jax_debug_nans`` so any NaN inside
    jit raises at the exact primitive (the debug-flag equivalent of the
    reference's per-step guards, which remain branchless in the train
    step itself).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation context (shows up in xprof timelines)."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_debugging(enable: bool = True) -> None:
    """Debug-flag NaN checking: raise at the first NaN-producing op inside
    jit.  Off by default — the train step's branchless skip-on-NaN
    (trainer.py) is the production behavior."""
    jax.config.update("jax_debug_nans", enable)


class Throughput:
    """Steady-state items/sec counter; drops the first sample (compile)."""

    def __init__(self) -> None:
        self._t0: Optional[float] = None
        self._items = 0
        self._seen_first = False

    def tick(self, n_items: int) -> Optional[float]:
        """Record n_items processed since the last tick; returns current
        steady-state rate (None until enough data)."""
        now = time.perf_counter()
        if not self._seen_first:
            # First interval carries compile time — start counting after it.
            self._seen_first = True
            self._t0 = now
            return None
        self._items += n_items
        dt = now - self._t0
        return self._items / dt if dt > 0 else None
