"""Phase timers and throughput metrics (SURVEY.md §2 #19, §5.1).

The reference used ``omp_get_wtime`` around phases; on TPU a phase is only
finished when the device queue drains, so every timer exit calls
``jax.block_until_ready`` on the phase result.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import jax.numpy as jnp


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


def _sync(out) -> None:
    """Force TRUE completion of ``out``.

    ``jax.block_until_ready`` is NOT sufficient under remote-executor
    backends (the axon relay acknowledges work before it finishes — observed
    impossible >1 TB/s "measurements"). Pulling a dependent scalar to host is
    the only reliable barrier, so timing helpers sync by transferring a tiny
    reduction of the last output.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(jnp.ravel(leaf)[:1]))


def timeit(fn, *args, warmup: int = 2, iters: int = 20) -> float:
    """Steady-state mean seconds per call: ``iters`` enqueued back-to-back,
    one host-transfer sync at the end (amortizes the relay round-trip)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def timeit_fused(fn, a, x, iters: int = 50, reps: int = 3) -> float:
    """Seconds per op for y=f(A,x), with the iteration loop INSIDE one jit
    dispatch (lax.fori_loop feeding y back). The axon relay adds ~1.6 ms of
    fixed overhead per dispatch, so only single-dispatch loops measure
    sub-millisecond kernels faithfully; the loop also serializes iterations
    through the data dependence."""
    import jax.lax as lax

    @jax.jit
    def run(a, x):
        return lax.fori_loop(0, iters, lambda i, y: fn(a, y), x)

    _sync(run(a, x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(run(a, x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def timeit_chained(fn, a, x, warmup: int = 2, iters: int = 20) -> float:
    """timeit for y=f(A,x): output feeds the next input (serialized chain)."""
    y = x
    for _ in range(warmup):
        y = fn(a, y)
    _sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(a, y)
    _sync(y)
    return (time.perf_counter() - t0) / iters


def gnnz_per_s(nnz: int, seconds: float) -> float:
    return nnz / seconds / 1e9
