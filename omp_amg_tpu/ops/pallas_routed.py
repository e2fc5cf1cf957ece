"""Pallas TPU kernel for routed-ELL SpMV (general / PMIS-hierarchy operators).

See :mod:`omp_amg_tpu.sparse.routed` for the format and planner. Per grid
step (one 1024-row block):

- one contiguous span DMA from HBM x (double-buffered: block i prefetches
  block i+1's span before waiting on its own — the per-block base lives
  fully in SMEM so it is readable ahead of the grid step);
- per slot k: 8 dynamic sublane slices of the span (one per sublane group)
  + one width-128 ``take_along_axis`` + one fma. Both primitives measured
  at full VPU speed on the real chip (scripts/probe_span_slice.py:
  19 Gnnz/s padded-slot throughput, ~190 GB/s streamed).

Two variants, chosen statically at plan time (``RoutedEll.resident``):

- **resident** (padded x + plan blocks fit VMEM, ~12 MB cap): the whole
  (nxp, 128) x lives in VMEM for the kernel's duration and ``soff`` holds
  ABSOLUTE x chunk indices — no manual DMA at all. The streamed variant
  measured DMA-latency-bound at ~5.5 µs per 1024-row block on hierarchy
  levels; resident removes that floor.
- **streamed** (big x): per-block contiguous span DMA as described above.

The XLA emulation (`spmv_routed_xla`) computes the identical sum with a
plain gather — the CPU-backend path and the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.routed import (
    BLOCK_ROWS, CHUNK_U, K_BLK, LANES, UNROLL_K, RoutedEll,
)

RING = 2

# Slot-loop shape: Python-unroll fully up to UNROLL_K; above it, a
# lax.fori_loop with a CHUNK_U-slot unrolled body bounds the Mosaic program
# size (a K≈200 full unroll produced a compile payload the relay rejects
# outright — HTTP 413) while keeping most of the unrolled throughput
# (measured: plain fori_loop halves padded Gnnz/s vs unrolled).


def _slot_accumulate(win_of, lidx_ref, val_ref, *, K):
    """acc = Σ_k val[k] * win_of(k)[lidx[k]] with bounded program size.

    ``lidx_ref`` holds 4 slots' 7-bit lane indices per int32 word
    (sparse/routed.pack_lidx4) — the unpack shift/mask runs on the VPU and
    buys a 5/8 plan-stream reduction in the bandwidth-bound hot loop. The
    sub-word position is static under both loop shapes (CHUNK_U is a
    multiple of 4), so the shift amounts are immediates."""
    def slot(k, kw, sub, acc):
        word = lidx_ref[pl.ds(kw, 1)][0]
        lane = jnp.right_shift(word, 8 * sub) & 0x7F
        g = jnp.take_along_axis(win_of(k), lane, axis=1)
        return acc + val_ref[pl.ds(k, 1)][0].astype(jnp.float32) * g

    acc = jnp.zeros((8, LANES), jnp.float32)
    if K <= UNROLL_K:
        for k in range(K):
            acc = slot(k, k // 4, k % 4, acc)
        return acc

    def chunk(c, acc):
        for u in range(CHUNK_U):  # Mosaic supports only unroll=1/full, so
            acc = slot(c * CHUNK_U + u, c * (CHUNK_U // 4) + u // 4,
                       u % 4, acc)  # unroll by hand inside the body
        return acc

    n_full = K // CHUNK_U
    acc = jax.lax.fori_loop(0, n_full, chunk, acc)
    for k in range(n_full * CHUNK_U, K):  # remainder (planner pads K away)
        acc = slot(k, k // 4, k % 4, acc)
    return acc


def _accumulate_out(o_ref, acc, *, nkb=None, epi=None):
    """Output blocks are revisited across the K-chunk grid dim (kb is the
    innermost grid dimension, so the block stays VMEM-resident). ``epi``
    (fused epilogue — residual/Jacobi) is applied once the block's last
    K-chunk has accumulated."""
    kb = pl.program_id(1)
    if epi is None:
        @pl.when(kb == 0)
        def _():
            o_ref[:, :] = acc

        @pl.when(kb != 0)
        def _():
            o_ref[:, :] = o_ref[:, :] + acc
        return
    if nkb == 1:
        o_ref[:, :] = epi(acc)
        return

    @pl.when(kb == 0)
    def _():
        o_ref[:, :] = acc

    @pl.when(jnp.logical_and(kb != 0, kb != nkb - 1))
    def _():
        o_ref[:, :] = o_ref[:, :] + acc

    @pl.when(jnp.logical_and(kb != 0, kb == nkb - 1))
    def _():
        o_ref[:, :] = epi(o_ref[:, :] + acc)


def _routed_kernel(sbase_ref, soff_ref, lidx_ref, val_ref, x_hbm, *rest,
                   kb_slots, S, nb, nkb, mode):
    n_vec = {"spmv": 0, "residual": 1, "correct": 1, "jacobi": 3}[mode]
    vec_refs = rest[:n_vec]
    o_ref = rest[n_vec]
    span = rest[n_vec + 1]
    sems = rest[n_vec + 2]
    i = pl.program_id(0)
    kb = pl.program_id(1)

    def copy(p):
        slot = jax.lax.rem(p, RING)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(sbase_ref[0, p], S), :],
            span.at[slot], sems.at[slot])

    @pl.when(jnp.logical_and(i == 0, kb == 0))
    def _():
        copy(jnp.int32(0)).start()

    @pl.when(jnp.logical_and(kb == 0, i + 1 < nb))
    def _():
        copy(i + 1).start()

    @pl.when(kb == 0)  # the slot persists across this block's K-chunks
    def _():
        copy(i).wait()

    sl = jax.lax.rem(i, RING)

    def win_of(k):
        return jnp.concatenate(
            [span[sl, pl.ds(soff_ref[kb, k * 8 + s], 1), :] for s in range(8)],
            axis=0)

    _accumulate_out(
        o_ref, _slot_accumulate(win_of, lidx_ref, val_ref, K=kb_slots),
        nkb=nkb, epi=_make_epilogue(mode, vec_refs))


@functools.lru_cache(maxsize=256)
def _make_routed_call(nb, K, S, P, nbp, nxp, dtype_name, interpret=False,
                      mode="spmv"):
    kb_slots = min(K, K_BLK)
    nkb = K // kb_slots
    n_vec = {"spmv": 0, "residual": 1, "correct": 1, "jacobi": 3}[mode]
    kernel = functools.partial(_routed_kernel, kb_slots=kb_slots, S=S,
                               nb=nb, nkb=nkb, mode=mode)
    vec_spec = pl.BlockSpec((8, LANES), lambda i, kb: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nb, nkb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # sbase (1,nbp)
            # whole block's soff (all K-chunks): the TPU lowering wants the
            # last two block dims equal to the array dims (nkb is not
            # 8-divisible); the kernel indexes chunk kb directly
            pl.BlockSpec((None, nkb, P), lambda i, kb: (i, 0, 0),
                         memory_space=pltpu.SMEM),            # soff
            pl.BlockSpec((None, kb_slots // 4, 8, LANES),
                         lambda i, kb: (i, kb, 0, 0),
                         memory_space=pltpu.VMEM),            # lidx4 (packed)
            pl.BlockSpec((None, kb_slots, 8, LANES),
                         lambda i, kb: (i, kb, 0, 0),
                         memory_space=pltpu.VMEM),            # val4 chunk
            pl.BlockSpec(memory_space=pl.ANY),                # x2 (nxp,128) HBM
        ] + [vec_spec] * n_vec,
        out_specs=pl.BlockSpec((8, LANES), lambda i, kb: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * 8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RING, S, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((RING,)),
        ],
        interpret=interpret,
    )


def _make_epilogue(mode, vec_refs):
    """Fused level-stage epilogues (the ConstDia fusion pattern applied to
    the routed kernel): residual r = b − Ax; Jacobi x' = x + s·(b − Ax)."""
    if mode == "spmv":
        return None
    if mode == "residual":
        (b_ref,) = vec_refs
        return lambda y: b_ref[:, :] - y
    if mode == "correct":
        (x_ref,) = vec_refs
        return lambda y: x_ref[:, :] + y
    x_ref, b_ref, s_ref = vec_refs
    return lambda y: x_ref[:, :] + s_ref[:, :] * (b_ref[:, :] - y)


def _routed_resident_kernel(soff_ref, lidx_ref, val_ref, x_ref, *rest,
                            kb_slots, nkb, mode):
    n_vec = {"spmv": 0, "residual": 1, "correct": 1, "jacobi": 3}[mode]
    vec_refs = rest[:n_vec]
    o_ref = rest[n_vec]
    kb = pl.program_id(1)

    def win_of(k):
        return jnp.concatenate(
            [x_ref[pl.ds(soff_ref[kb, k * 8 + s], 1), :] for s in range(8)],
            axis=0)

    _accumulate_out(
        o_ref, _slot_accumulate(win_of, lidx_ref, val_ref, K=kb_slots),
        nkb=nkb, epi=_make_epilogue(mode, vec_refs))


def _routed_resident_kact_kernel(kact_ref, soff_ref, lidx_ref, val_ref,
                                 x_ref, *rest, kb_slots, mode):
    """Resident kernel with per-block ACTIVE K-chunk early exit.

    Low-efficiency plans (PMIS coarse operators pack at ~0.2) pad K to the
    worst block's slot demand; this variant skips the all-padding chunks:
    compute runs only while ``kb < kact[i]`` and the plan-array index map
    clamps to the last active chunk so the pipeline elides the dead DMAs.
    """
    n_vec = {"spmv": 0, "residual": 1, "correct": 1, "jacobi": 3}[mode]
    vec_refs = rest[:n_vec]
    o_ref = rest[n_vec]
    i = pl.program_id(0)
    kb = pl.program_id(1)
    ka = kact_ref[i]
    epi = _make_epilogue(mode, vec_refs)

    def win_of(k):
        return jnp.concatenate(
            [x_ref[pl.ds(soff_ref[kb, k * 8 + s], 1), :] for s in range(8)],
            axis=0)

    @pl.when(kb < ka)
    def _():
        acc = _slot_accumulate(win_of, lidx_ref, val_ref, K=kb_slots)
        prev = jnp.where(kb == 0, jnp.zeros_like(acc), o_ref[:, :])
        cur = prev + acc
        if epi is None:
            o_ref[:, :] = cur
        else:
            o_ref[:, :] = jnp.where(kb == ka - 1, epi(cur), cur)


@functools.lru_cache(maxsize=256)
def _make_resident_call(nb, K, P, nxp, dtype_name, interpret=False,
                        mode="spmv", kact=False):
    kb_slots = min(K, K_BLK)
    nkb = K // kb_slots
    n_vec = {"spmv": 0, "residual": 1, "correct": 1, "jacobi": 3}[mode]
    vec_spec = pl.BlockSpec((8, LANES), lambda i, kb: (i, 0),
                            memory_space=pltpu.VMEM)
    if kact and nkb > 1:
        kernel = functools.partial(_routed_resident_kact_kernel,
                                   kb_slots=kb_slots, mode=mode)

        def plan_map(i, kb, ka):
            return (i, jnp.minimum(kb, ka[i] - 1), 0, 0)

        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb, nkb),
                in_specs=[
                    pl.BlockSpec((None, nkb, P),
                                 lambda i, kb, ka: (i, 0, 0),
                                 memory_space=pltpu.SMEM),     # soff
                    pl.BlockSpec((None, kb_slots // 4, 8, LANES), plan_map,
                                 memory_space=pltpu.VMEM),     # lidx4
                    pl.BlockSpec((None, kb_slots, 8, LANES), plan_map,
                                 memory_space=pltpu.VMEM),     # val4
                    pl.BlockSpec((nxp, LANES),
                                 lambda i, kb, ka: (0, 0),
                                 memory_space=pltpu.VMEM),     # x2, whole
                ] + [pl.BlockSpec((8, LANES), lambda i, kb, ka: (i, 0),
                                  memory_space=pltpu.VMEM)] * n_vec,
                out_specs=pl.BlockSpec((8, LANES),
                                       lambda i, kb, ka: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((nb * 8, LANES), jnp.float32),
            interpret=interpret,
        )
    kernel = functools.partial(_routed_resident_kernel, kb_slots=kb_slots,
                               nkb=nkb, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(nb, nkb),
        in_specs=[
            pl.BlockSpec((None, nkb, P), lambda i, kb: (i, 0, 0),
                         memory_space=pltpu.SMEM),            # soff (absolute)
            pl.BlockSpec((None, kb_slots // 4, 8, LANES),
                         lambda i, kb: (i, kb, 0, 0),
                         memory_space=pltpu.VMEM),            # lidx4 (packed)
            pl.BlockSpec((None, kb_slots, 8, LANES),
                         lambda i, kb: (i, kb, 0, 0),
                         memory_space=pltpu.VMEM),            # val4 chunk
            pl.BlockSpec((nxp, LANES), lambda i, kb: (0, 0),
                         memory_space=pltpu.VMEM),            # x2, whole
        ] + [vec_spec] * n_vec,
        out_specs=pl.BlockSpec((8, LANES), lambda i, kb: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * 8, LANES), jnp.float32),
        interpret=interpret,
    )


def _pad_x(a: RoutedEll, x: jax.Array) -> jax.Array:
    pad = a.nxp * LANES - a.n_cols
    xp = jnp.concatenate([x.astype(jnp.float32), jnp.zeros((pad,), jnp.float32)])
    return xp.reshape(a.nxp, LANES)


def _pad_vec(a: RoutedEll, v: jax.Array) -> jax.Array:
    nb = a.val4.shape[0]
    pad = nb * BLOCK_ROWS - a.n_rows
    vp = jnp.concatenate([v.astype(jnp.float32),
                          jnp.zeros((pad,), jnp.float32)])
    return vp.reshape(nb * 8, LANES)


def _routed_call(a: RoutedEll, x: jax.Array, vecs, mode: str,
                 interpret: bool):
    nb, K = a.val4.shape[:2]
    dt = jnp.dtype(a.val4.dtype).name
    vps = tuple(_pad_vec(a, v) for v in vecs)
    if a.resident:
        use_kact = a.kact is not None and min(K, K_BLK) < K
        call = _make_resident_call(nb, K, a.soff.shape[2], a.nxp, dt,
                                   interpret, mode, kact=use_kact)
        if use_kact:
            y = call(a.kact[0, :nb], a.soff, a.lidx4, a.val4,
                     _pad_x(a, x), *vps)
        else:
            y = call(a.soff, a.lidx4, a.val4, _pad_x(a, x), *vps)
    else:
        call = _make_routed_call(nb, K, a.span, a.soff.shape[2],
                                 a.sbase.shape[1], a.nxp, dt, interpret,
                                 mode)
        y = call(a.sbase, a.soff, a.lidx4, a.val4, _pad_x(a, x), *vps)
    return y.reshape(-1)[: a.n_rows].astype(x.dtype)


def spmv_routed(a: RoutedEll, x: jax.Array, interpret: bool = False):
    """y = A @ x via the routed-ELL Pallas kernel."""
    return _routed_call(a, x, (), "spmv", interpret)


def residual_routed(a: RoutedEll, x: jax.Array, b: jax.Array,
                    interpret: bool = False):
    """r = b − A·x, subtraction fused into the kernel's last K-chunk
    (one pass over the level instead of SpMV + XLA axpy stages — the
    ConstDia fusion pattern for general sparsity)."""
    return _routed_call(a, x, (b,), "residual", interpret)


def correct_routed(a: RoutedEll, xc: jax.Array, x: jax.Array,
                   interpret: bool = False):
    """x + P·xc in one fused pass (the coarse-grid correction stage)."""
    return _routed_call(a, xc, (x,), "correct", interpret)


def jacobi_routed(a: RoutedEll, x: jax.Array, b: jax.Array, s: jax.Array,
                  interpret: bool = False):
    """x' = x + s·(b − A·x) in one fused pass (s = ω·D⁻¹ per row)."""
    return _routed_call(a, x, (x, b, s), "jacobi", interpret)


def spmv_routed_xla(a: RoutedEll, x: jax.Array):
    """XLA-gather formulation of the same sum (CPU path / oracle)."""
    nb, K = a.val4.shape[:2]
    x2 = _pad_x(a, x)
    kb_slots = K // a.soff.shape[1]
    k = jnp.arange(K)[:, None]
    s = jnp.arange(8)[None, :]
    soff3 = a.soff[:, k // kb_slots, (k % kb_slots) * 8 + s]  # (nb, K, 8)
    rowidx = soff3 if a.resident else (
        a.sbase[0, :nb, None, None] + soff3)              # (nb, K, 8)
    win = jnp.take(x2, rowidx.reshape(-1), axis=0).reshape(nb, K, 8, LANES)
    sub = jnp.arange(K) % 4
    lidx = (jnp.right_shift(a.lidx4[:, jnp.arange(K) // 4],
                            (8 * sub)[None, :, None, None]) & 0x7F)
    g = jnp.take_along_axis(win, lidx, axis=3)
    y = jnp.sum(a.val4.astype(jnp.float32) * g, axis=1)   # (nb, 8, 128)
    return y.reshape(-1)[: a.n_rows].astype(x.dtype)
