"""Phase timers and throughput metrics (SURVEY.md §2 #19, §5.1).

The reference used ``omp_get_wtime`` around phases; on TPU a phase is only
finished when the device queue drains, so every timer exit calls
``jax.block_until_ready`` on the phase result.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


class PhaseTimers:
    def __init__(self):
        self.seconds: dict[str, float] = {}

    @contextmanager
    def phase(self, name: str, result_holder: list | None = None):
        t0 = time.perf_counter()
        yield
        if result_holder:
            jax.block_until_ready(result_holder)
        self.seconds[name] = self.seconds.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> dict:
        return dict(self.seconds)


def timeit(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Steady-state mean seconds per call (post-warmup).

    Blocks on every call: remote-executor backends (axon relay) can
    acknowledge enqueued work early, so chaining unblocked dispatches
    under-measures badly.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def timeit_chained(fn, a, x, warmup: int = 2, iters: int = 10) -> float:
    """Like timeit for y=f(A,x) ops, feeding the output back as input so the
    device must serialize the chain (robust even if intermediate dispatches
    aren't individually blocked)."""
    y = x
    for _ in range(warmup):
        y = fn(a, y)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(a, y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def gnnz_per_s(nnz: int, seconds: float) -> float:
    return nnz / seconds / 1e9
