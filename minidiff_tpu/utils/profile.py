"""Profiling / tracing utilities.

The reference has no profiling subsystem (SURVEY.md §5.1 — its only
structural trace is the graphviz visualizer).  On TPU the right tool is the
XLA profiler, so this module is a thin, dependency-free layer over it plus
an honest wall-clock step timer:

* ``trace(logdir)`` — context manager writing an XLA/TensorBoard trace
  (view with TensorBoard's profile plugin or Perfetto).
* ``annotate(name)`` — names a region so tape phases show up in the trace.
* ``StepTimer`` — median/percentile wall-times of an iteration function
  with a device-sync per step, so asynchronous dispatch doesn't lie.
"""

from __future__ import annotations

import contextlib
import time
from typing import TYPE_CHECKING

import minidiff_tpu as md

if TYPE_CHECKING:
    from typing import Any, Callable, Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> "Iterator[None]":
    """Record an XLA profiler trace into ``logdir`` (xla backend only;
    a no-op on the numpy backend so instrumented code runs anywhere)."""
    if md.backend_name() != "xla":
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> "Iterator[None]":
    """Label the enclosed work in profiler traces (no-op off-xla)."""
    if md.backend_name() != "xla":
        yield
        return
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def _sync(value: "Any") -> None:
    """Block until ``value``'s device work is done (pull one scalar)."""
    leaf = value
    if isinstance(leaf, (tuple, list)):
        leaf = leaf[0]
    if isinstance(leaf, md.Tensor):
        data = leaf._data
        if hasattr(data, "block_until_ready"):
            data.block_until_ready()
        else:  # numpy backend: already synchronous
            pass


class StepTimer:
    """Wall-clock step statistics with per-step device sync.

    >>> timer = StepTimer()
    >>> for batch in loader:
    ...     with timer:
    ...         state = step(state, batch)
    ...     timer.sync(state)
    >>> timer.summary()  # {'steps': N, 'median_ms': ..., 'p90_ms': ...}
    """

    def __init__(self) -> None:
        self.times: list = []
        self._t0: "Optional[float]" = None
        self._pending = False

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        self._pending = False
        return self

    def __exit__(self, *exc: "Any") -> None:
        if exc[0] is not None:
            self._t0 = None
            return
        # record dispatch wall time now; a following .sync() upgrades this
        # entry to device-true time (measured from the same start)
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._pending = True

    def sync(self, value: "Any") -> None:
        """Record device-true time (blocks on ``value``).  Works both
        inside the ``with`` block and right after it (upgrading the
        dispatch-time entry __exit__ recorded); without any sync the
        recorded time is dispatch wall time."""
        if self._t0 is None:
            return
        _sync(value)
        elapsed = time.perf_counter() - self._t0
        if self._pending:   # called after __exit__: upgrade its entry
            self.times[-1] = elapsed
        else:               # called inside the with block
            self.times.append(elapsed)
        self._t0 = None
        self._pending = False

    def summary(self) -> "Dict[str, float]":
        if not self.times:
            return {"steps": 0}
        xs = sorted(self.times)
        n = len(xs)
        return {
            "steps": n,
            "median_ms": 1e3 * xs[n // 2],
            "p90_ms": 1e3 * xs[min(n - 1, int(0.9 * n))],
            "total_s": sum(xs),
        }


def profile_fn(fn: "Callable", *args: "Any", iters: int = 10,
               warmup: int = 2) -> "Dict[str, float]":
    """Time ``fn(*args)`` with device sync; returns StepTimer.summary()."""
    for _ in range(warmup):
        _sync(fn(*args))
    timer = StepTimer()
    for _ in range(iters):
        with timer:
            out = fn(*args)
        timer.sync(out)
    return timer.summary()
