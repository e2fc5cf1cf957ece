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
        if self._idx & _LANES_BIT:
            return self._batch.resolved_lanes[
                self._idx & ~(_LANES_BIT | _SCATTER_BIT)]
        if self._idx & _SCATTER_BIT:
            return self._batch.resolved_scatter[self._idx & ~_SCATTER_BIT]
        return self._batch.resolved[self._idx]


_SCATTER_BIT = 1 << 60
_LANES_BIT = 1 << 59


def _delta_encode(idx):
    """Sorted unique positions → (u8 gap stream, exception arrays).

    Decode convention (see _unpack_fn): pos = cumsum(d) − 1 with
    d[0] = idx[0] + 1. Gaps ≥ 255 escape: the stream stores 255 and the
    true gap lands in (exc_pos, exc_gap), applied with one tiny scatter
    before the cumsum. This ships 1 B/entry instead of 4 — the relay
    transfer (~150 MB/s for big batches) is the setup's floor."""
    n = len(idx)
    if n == 0:
        return (np.zeros(0, np.uint8), np.zeros(0, np.int32),
                np.zeros(0, np.int32))
    d = np.empty(n, np.int32)
    d[0] = int(idx[0]) + 1
    np.subtract(idx[1:], idx[:-1], out=d[1:], casting="unsafe")
    exc_pos = np.flatnonzero(d >= 255).astype(np.int32)
    exc_gap = d[exc_pos]
    du8 = d.astype(np.uint8)
    if len(exc_pos):
        du8[exc_pos] = 255   # escape marker (value itself is ignored)
    return du8, exc_pos, exc_gap


@functools.lru_cache(maxsize=64)
def _unpack_fn(spec, scatter_spec, n_dense):
    """spec: (buf_index, offset, size, shape) per dense part.
    scatter_spec: per (dtype, lanes?, cap-run) group of sparse parts,
    (dtype_str, total_size, with_lanes, parts=((off, size, shape), ...)) —
    one fused scatter per group (sorted unique global indices), then
    static slices. Group operands arrive as extra trailing bufs:

        deltas_u8, exc_pos_i32, exc_gap_i32, vals [, lanes_u8]

    Indices ship DELTA-ENCODED (u8 gaps; gaps ≥ 255 escape through the
    exception arrays) — 1 B/entry instead of 4 through the relay — and are
    rebuilt on device with one cumsum. ``with_lanes`` groups additionally
    carry a u8 lane stream (routed-ELL plans): the lanes scatter through
    the SAME rebuilt indices and each part's packed lidx words
    (sparse/routed.py layout — 4 slots' 7-bit lanes per int32) are derived
    by a reshape+shift reduction, so the lidx plan arrays never cross the
    host→device boundary at all. Keeping the program to a few scatters is
    what keeps the relay-side XLA compile of the unpack bounded. All
    inputs are DONATED so the packed staging buffers free as the outputs
    materialize (256³-scale plans approach HBM capacity)."""

    def unpack(*bufs):
        parts = tuple(bufs[g][off:off + size].reshape(shape)
                      for g, off, size, shape in spec)
        scat = []
        bi = n_dense
        for dts, total, with_lanes, sparts in scatter_spec:
            deltas, exc_pos, exc_gap = bufs[bi], bufs[bi + 1], bufs[bi + 2]
            val = bufs[bi + 3]
            bi += 4
            d = deltas.astype(jnp.int32)
            if exc_pos.shape[0]:
                d = d.at[exc_pos].set(exc_gap, unique_indices=True)
            idx = jnp.cumsum(d) - 1
            filled = jnp.zeros(total, np.dtype(dts)).at[idx].set(
                val, indices_are_sorted=True, unique_indices=True)
            if with_lanes:
                lanes = bufs[bi]
                bi += 1
                lfill = jnp.zeros(total, jnp.uint8).at[idx].set(
                    lanes, indices_are_sorted=True, unique_indices=True)
            for off, size, shape in sparts:
                scat.append(filled[off:off + size].reshape(shape))
                if with_lanes:
                    nc, kc = shape[0], shape[1]
                    l4 = lfill[off:off + size].astype(jnp.int32).reshape(
                        nc, kc // 4, 4, shape[2], shape[3])
                    words = (l4[:, :, 0] | (l4[:, :, 1] << 8)
                             | (l4[:, :, 2] << 16) | (l4[:, :, 3] << 24))
                    scat.append(words)
        return parts, tuple(scat)

    nbufs = n_dense + sum(5 if g[2] else 4 for g in scatter_spec)
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
            # ship sparse when ≥1.35× smaller STREAM-side: the index
            # stream is delta-encoded to ~1 B/entry (u8 gaps + rare
            # exceptions), so the sparse encoding costs ~(1 + itemsize)
            # B/entry against itemsize B/slot dense. Transfer through the
            # relay (~150 MB/s for big batches) dwarfs the fused scatter +
            # cumsum the sparse path adds.
            if idx.size * (1 + arr.itemsize) * 27 < arr.nbytes * 20:
                h = Handle(self, len(self._scatter) | _SCATTER_BIT,
                           arr.shape, arr.dtype)
                self._scatter.append((idx, vals, arr.size, arr.shape,
                                      np.dtype(arr.dtype).name, None))
                return h
        h = Handle(self, len(self._parts), arr.shape, arr.dtype)
        self._parts.append(arr)   # ravel() at materialize handles layout
        return h

    def add_routed(self, val4, lidxp, kc: int):
        """Register a routed-ELL plan's (val4, packed-lidx) pair.

        When val4's sparse encoding wins, the lidx plan array is NOT
        shipped at all: a u8 lane stream aligned with val4's nonzero
        positions rides the same fused scatter, and the packed words are
        rebuilt on device (see _unpack_fn). Returns (val4_handle,
        lidx_handle). Falls back to dense val4 + sparse lidx (the round-4
        scheme) when val4 ships dense — there is then no index stream to
        derive the lanes from."""
        val4 = np.asarray(val4)
        lidxp = np.ascontiguousarray(lidxp, np.int32)
        if self.eager:
            return jnp.asarray(val4), jnp.asarray(lidxp)
        if self.resolved is not None:
            raise RuntimeError("DeferredUpload.add_routed() after "
                               "resolve(): batch is sealed")
        flat = np.ascontiguousarray(val4.ravel())
        from .. import native

        lanes = None
        enc = native.sparse_encode_routed(flat, lidxp, kc)
        if enc is not None:
            idx, vals, lanes = enc
        else:
            enc2 = native.sparse_encode(flat)
            if enc2 is not None:
                idx, vals = enc2
            else:
                probe = flat
                if flat.dtype.itemsize == 2 and flat.dtype.num >= 100:
                    probe = flat.view(np.uint16)
                idx = np.flatnonzero(probe)
                vals = flat[idx]
        if idx.size * (2 + val4.itemsize) * 27 < val4.nbytes * 20:
            if lanes is None:
                lanes = native.routed_lanes_at(lidxp, idx, kc)
            if lanes is None:
                p = np.asarray(idx, np.int64)
                lane = p & 127
                u = p >> 7
                s = u & 7
                q = u >> 3
                ks = q % kc
                w = (((q // kc) * (kc // 4) + (ks >> 2)) * 8 + s) * 128 \
                    + lane
                lanes = ((lidxp.ravel().view(np.uint32)[w]
                          >> (8 * (ks & 3)).astype(np.uint32))
                         & np.uint32(0x7F)).astype(np.uint8)
            hv = Handle(self, len(self._scatter) | _SCATTER_BIT,
                        val4.shape, val4.dtype)
            hl = Handle(self,
                        len(self._scatter) | _SCATTER_BIT | _LANES_BIT,
                        lidxp.shape, lidxp.dtype)
            self._scatter.append((idx, vals, val4.size, val4.shape,
                                  np.dtype(val4.dtype).name, lanes))
            return hv, hl
        hv = Handle(self, len(self._parts), val4.shape, val4.dtype)
        self._parts.append(val4)
        return hv, self.add(lidxp, sparse=True)

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
                tb = time.perf_counter()
                if len(flats) == 1:
                    bufs.append(flats[0])   # single big array: no copy
                else:
                    bufs.append(np.concatenate(flats) if flats
                                else np.zeros(0, np.dtype(key)))
                if timers and os.environ.get("OMP_AMG_PACK_TRACE"):
                    print(f"[pack] dense {key} x{len(flats)} "
                          f"{bufs[-1].nbytes/1e6:.0f} MB "
                          f"{time.perf_counter()-tb:.3f}s",
                          file=sys.stderr, flush=True)
        n_dense_bufs = len(bufs)
        # fuse sparse parts: one scatter per (dtype, lanes?, cap run) —
        # indices are globally offset host-side, stay sorted and unique,
        # and ship as u8 DELTAS (+ int32 exceptions for gaps ≥ 255)
        sgroups: dict = {}
        for si, (idx, val, size, shape, dts, lanes) in enumerate(
                self._scatter):
            sgroups.setdefault((dts, lanes is not None), []).append(si)
        scatter_spec = []
        order = []
        for dts, wl in sorted(sgroups):
            for run in _runs(sgroups[(dts, wl)],
                             lambda si: self._scatter[si][2]):
                off = 0
                sparts = []
                parts, vals, lns = [], [], []
                for si in run:
                    idx, val, size, shape, _, lanes = self._scatter[si]
                    sparts.append((off, size, shape))
                    parts.append((idx, off))
                    vals.append(val)
                    if wl:
                        lns.append(lanes)
                    order.append(si)
                    off += size
                if off >= 2 ** 31:
                    raise ValueError("scatter group exceeds int32 indexing")
                scatter_spec.append((dts, off, wl, tuple(sparts)))
                tb = time.perf_counter()
                from .. import native

                enc = native.delta_encode_parts(parts)
                if enc is None:
                    if not parts:
                        flat_idx = np.zeros(0, np.int64)
                    elif len(parts) == 1:
                        flat_idx = parts[0][0]
                    else:
                        flat_idx = np.concatenate(
                            [idx if o == 0 else idx + o
                             for idx, o in parts])
                    enc = _delta_encode(flat_idx)
                deltas, exc_pos, exc_gap = enc
                bufs.append(deltas)
                bufs.append(exc_pos)
                bufs.append(exc_gap)
                bufs.append(vals[0] if len(vals) == 1
                            else (np.concatenate(vals) if vals
                                  else np.zeros(0, np.dtype(dts))))
                if wl:
                    bufs.append(lns[0] if len(lns) == 1
                                else np.concatenate(lns))
                if timers and os.environ.get("OMP_AMG_PACK_TRACE"):
                    nb = deltas.nbytes + bufs[-1].nbytes \
                        + (bufs[-2].nbytes if wl else 0)
                    print(f"[pack] scatter {dts}{'+lanes' if wl else ''} "
                          f"x{len(vals)} {nb/1e6:.0f} MB "
                          f"({len(exc_pos)} exc) "
                          f"{time.perf_counter()-tb:.3f}s",
                          file=sys.stderr, flush=True)
        t1 = time.perf_counter()
        fn = _unpack_fn(tuple(spec), tuple(scatter_spec), n_dense_bufs)
        parts_out, scat_out = fn(*bufs)
        self.resolved = parts_out
        # unpack emits outputs in scatter_spec order, lanes parts emitting
        # (values, packed-lidx-words) pairs — map back to registration ids
        self.resolved_scatter = [None] * len(self._scatter)
        self.resolved_lanes = [None] * len(self._scatter)
        oi = iter(order)
        pos = 0
        for dts, total, wl, sparts in scatter_spec:
            for _ in sparts:
                si = next(oi)
                self.resolved_scatter[si] = scat_out[pos]
                pos += 1
                if wl:
                    self.resolved_lanes[si] = scat_out[pos]
                    pos += 1
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
