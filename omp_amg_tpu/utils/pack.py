"""Batched host→device uploads for the setup phase.

Measured on the attached chip (BASELINE.md environment): the axon relay
charges ~0.4 s of round-trip per host→device ARRAY regardless of its size
(16×2 KB arrays: 6.4 s; the same bytes in one buffer: <1 s). A hierarchy
setup ships O(50) arrays (routed plans, DIA planes, dinv/λmax scalars per
level), so per-array transfer dominated the measured 30 s PMIS setup.

``DeferredUpload`` collects host arrays during setup and ships ONE buffer
per dtype, unpacking on device inside a single jitted computation (static
slices — one XLA compile per hierarchy shape set, one dispatch). On
non-TPU backends it defaults to eager `jnp.asarray` (host→device is free
there and the per-setup unpack compile is not).

Usage:
    batch = DeferredUpload()
    h = batch.add(np_array)          # Handle (or device array if eager)
    ... build pytrees containing handles ...
    tree = batch.resolve(tree)       # materialize + swap handles in-place
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


class Handle:
    """Placeholder for a deferred-uploaded array."""

    __slots__ = ("_batch", "_idx", "shape", "dtype")

    def __init__(self, batch, idx, shape, dtype):
        self._batch = batch
        self._idx = idx
        self.shape = shape
        self.dtype = dtype

    def get(self):
        return self._batch.resolved[self._idx]


@functools.lru_cache(maxsize=64)
def _unpack_fn(spec):
    """spec: tuple of (buf_index, offset, size, shape) per part."""

    def unpack(*bufs):
        return tuple(bufs[g][off:off + size].reshape(shape)
                     for g, off, size, shape in spec)

    return jax.jit(unpack)


class DeferredUpload:
    def __init__(self, eager: bool | None = None):
        if eager is None:
            eager = jax.default_backend() != "tpu"
        self.eager = eager
        self._parts: list = []
        self.resolved = None

    def add(self, arr, dtype=None):
        """Register a host array; returns a Handle (eager: device array).

        ``dtype`` (numpy-compatible) converts before upload.
        """
        arr = np.asarray(arr)
        if dtype is not None:
            arr = np.asarray(arr, dtype)
        if self.eager:
            return jnp.asarray(arr)
        h = Handle(self, len(self._parts), arr.shape, arr.dtype)
        self._parts.append(arr)   # ravel() at materialize handles layout
        return h

    def materialize(self):
        if self.eager or self.resolved is not None:
            return
        import os
        import sys
        import time

        timers = os.environ.get("OMP_AMG_SETUP_TIMERS") == "1"
        t0 = time.perf_counter()
        groups: dict = {}
        for i, a in enumerate(self._parts):
            groups.setdefault(np.dtype(a.dtype).str, []).append(i)
        keys = sorted(groups)
        spec = [None] * len(self._parts)
        bufs = []
        for g, key in enumerate(keys):
            off = 0
            flats = []
            for i in groups[key]:
                a = self._parts[i]
                spec[i] = (g, off, a.size, a.shape)
                flats.append(a.ravel())
                off += a.size
            bufs.append(np.concatenate(flats) if flats
                        else np.zeros(0, np.dtype(key)))
        t1 = time.perf_counter()
        fn = _unpack_fn(tuple(spec))
        self.resolved = fn(*bufs)
        if timers:
            jax.block_until_ready(self.resolved)
            mb = sum(b.nbytes for b in bufs) / 1e6
            print(f"[setup] upload batch: {len(self._parts)} parts, "
                  f"{mb:.1f} MB, pack {t1 - t0:.3f}s, "
                  f"unpack-call {time.perf_counter() - t1:.3f}s",
                  file=sys.stderr, flush=True)

    def resolve(self, tree):
        """Materialize and substitute every Handle leaf in ``tree``."""
        if self.eager:
            return tree
        self.materialize()
        return jax.tree_util.tree_map(
            lambda x: x.get() if isinstance(x, Handle) else x, tree,
            is_leaf=lambda x: isinstance(x, Handle))
