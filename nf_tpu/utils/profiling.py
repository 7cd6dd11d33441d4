"""Tracing / profiling helpers.

The reference's observability is tqdm bars and datetime deltas (SURVEY.md
section 5).  Here: ``jax.profiler`` trace capture for TensorBoard/Perfetto
plus a lightweight wall-clock timer that forces device completion, so timings
measure compute rather than dispatch.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto.

    >>> with profiling.trace("/tmp/jax-trace"):
    ...     train_step(...)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on device work.

    >>> with Timer() as t:
    ...     out = step(x)
    ...     t.block_on(out)
    >>> t.seconds
    """

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def block_on(self, tree):
        jax.block_until_ready(tree)
        return tree

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        return False


def benchmark(fn, *args, reps: int = 10, warmup: int = 2):
    """Best-of-``reps`` timing of a jitted callable (compiles on warmup)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
