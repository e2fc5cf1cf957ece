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
        if self._idx & _SCATTER_BIT:
            return self._batch.resolved_scatter[self._idx & ~_SCATTER_BIT]
        return self._batch.resolved[self._idx]


_SCATTER_BIT = 1 << 60


@functools.lru_cache(maxsize=64)
def _unpack_fn(spec, scatter_spec, n_dense):
    """spec: (buf_index, offset, size, shape) per dense part.
    scatter_spec: per (dtype, cap-run) group of sparse parts,
    (dtype_str, total_size, parts=((off, size, shape), ...)) — one fused
    scatter per group (sorted unique global indices), then static slices.
    Scatter operands arrive as extra trailing bufs: idx0, val0, idx1, ...
    Keeping the program to a few scatters is what keeps the relay-side XLA
    compile of the unpack bounded. All inputs are DONATED so the packed
    staging buffers free as the outputs materialize (256³-scale plans
    approach HBM capacity)."""

    def unpack(*bufs):
        parts = tuple(bufs[g][off:off + size].reshape(shape)
                      for g, off, size, shape in spec)
        scat = []
        for gi, (dts, total, sparts) in enumerate(scatter_spec):
            idx = bufs[n_dense + 2 * gi]
            val = bufs[n_dense + 2 * gi + 1]
            filled = jnp.zeros(total, np.dtype(dts)).at[idx].set(
                val, indices_are_sorted=True, unique_indices=True)
            for off, size, shape in sparts:
                scat.append(filled[off:off + size].reshape(shape))
        return parts, tuple(scat)

    nbufs = n_dense + 2 * len(scatter_spec)
    return jax.jit(unpack, donate_argnums=tuple(range(nbufs)))


class DeferredUpload:
    def __init__(self, eager: bool | None = None):
        if eager is None:
            eager = jax.default_backend() != "tpu"
        self.eager = eager
        self._parts: list = []
        self._scatter: list = []
        self.resolved = None

    def add(self, arr, dtype=None, sparse=False):
        """Register a host array; returns a Handle (eager: device array).

        ``dtype`` (numpy-compatible) converts before upload. ``sparse``
        ships only the nonzero entries (index + value) and scatter-fills a
        zeros array on device — a big win for padded plan arrays (routed
        val4/lidx4 pack at ~0.1 efficiency, so the dense transfer is ~90%
        zeros). Falls back to dense when the sparse encoding isn't at
        least 2× smaller.
        """
        arr = np.asarray(arr)
        if dtype is not None:
            arr = np.asarray(arr, dtype)
        if self.eager:
            return jnp.asarray(arr)
        if self.resolved is not None:
            raise RuntimeError(
                "DeferredUpload.add() after resolve()/materialize(): this "
                "batch is sealed — the new array would never be uploaded. "
                "Create a fresh DeferredUpload for late registrations.")
        if sparse:
            flat = np.ascontiguousarray(arr.ravel())
            # one threaded native pass (csrc sparse_encode) replaces the
            # flatnonzero + fancy-gather chain below — ~4 s over the
            # ~620 MB of plan arrays at 27-pt 128³ on the 2-core host
            from .. import native

            enc = native.sparse_encode(flat)
            if enc is not None:
                idx, vals = enc
            else:
                probe = flat
                if flat.dtype.itemsize == 2 and flat.dtype.num >= 100:
                    # ml_dtypes (bfloat16 etc.): elementwise compares run
                    # at ~10 MB/s — the bit pattern's nonzeroness is
                    # equivalent (−0.0 ships as an extra explicit zero,
                    # harmless)
                    probe = flat.view(np.uint16)
                idx = np.flatnonzero(probe)
                vals = flat[idx]
            # ship sparse when ≥1.35× smaller: transfer through the relay
            # (~15–35 MB/s) dwarfs the one fused scatter the sparse path
            # adds, so even modest compression wins (round-3 measurement:
            # A[1] val4 at 1.7× compression was left dense by the old 2×
            # threshold — 65 MB of avoidable transfer)
            if idx.size * (4 + arr.itemsize) * 27 < arr.nbytes * 20:
                h = Handle(self, len(self._scatter) | _SCATTER_BIT,
                           arr.shape, arr.dtype)
                self._scatter.append((idx, vals, arr.size, arr.shape,
                                      np.dtype(arr.dtype).name))
                return h
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
        # Cap each fused buffer/scatter group: at 256³-scale hierarchies the
        # plan arrays alone approach HBM capacity, so ONE giant packed
        # buffer + its unpacked copies OOM the chip (and a fused scatter
        # group must stay under int32 indexing anyway). Groups are split at
        # the cap and the unpack donates its inputs so the packed staging
        # buffers can be reclaimed as the outputs materialize.
        cap_elems = 1 << 28
        groups: dict = {}
        for i, a in enumerate(self._parts):
            groups.setdefault(np.dtype(a.dtype).name, []).append(i)
        keys = sorted(groups)
        spec = [None] * len(self._parts)
        bufs = []

        def _runs(idx_list, size_of):
            run, total = [], 0
            for i in idx_list:
                s = size_of(i)
                if run and total + s > cap_elems:
                    yield run
                    run, total = [], 0
                run.append(i)
                total += s
            if run:
                yield run

        for key in keys:
            for run in _runs(groups[key], lambda i: self._parts[i].size):
                g = len(bufs)
                off = 0
                flats = []
                for i in run:
                    a = self._parts[i]
                    spec[i] = (g, off, a.size, a.shape)
                    flats.append(a.ravel())
                    off += a.size
                bufs.append(np.concatenate(flats) if flats
                            else np.zeros(0, np.dtype(key)))
        n_dense_bufs = len(bufs)
        # fuse sparse parts: one scatter per (dtype, cap run) — indices are
        # globally offset host-side, stay sorted and unique
        sgroups: dict = {}
        for si, (idx, val, size, shape, dts) in enumerate(self._scatter):
            sgroups.setdefault(dts, []).append(si)
        scatter_spec = []
        order = []
        for dts in sorted(sgroups):
            for run in _runs(sgroups[dts],
                             lambda si: self._scatter[si][2]):
                off = 0
                sparts = []
                idxs, vals = [], []
                for si in run:
                    idx, val, size, shape, _ = self._scatter[si]
                    sparts.append((off, size, shape))
                    idxs.append(idx + off)
                    vals.append(val)
                    order.append(si)
                    off += size
                if off >= 2 ** 31:
                    raise ValueError("scatter group exceeds int32 indexing")
                scatter_spec.append((dts, off, tuple(sparts)))
                bufs.append(np.concatenate(idxs).astype(np.int32) if idxs
                            else np.zeros(0, np.int32))
                bufs.append(np.concatenate(vals) if vals
                            else np.zeros(0, np.dtype(dts)))
        t1 = time.perf_counter()
        fn = _unpack_fn(tuple(spec), tuple(scatter_spec), n_dense_bufs)
        parts_out, scat_out = fn(*bufs)
        self.resolved = parts_out
        inv = [0] * len(self._scatter)
        for pos, si in enumerate(order):
            inv[si] = pos
        self.resolved_scatter = [scat_out[inv[si]]
                                 for si in range(len(self._scatter))]
        if timers:
            jax.block_until_ready((self.resolved,
                                   tuple(self.resolved_scatter)))
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
