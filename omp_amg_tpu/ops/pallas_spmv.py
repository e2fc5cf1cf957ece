"""Pallas TPU kernel for banded (DIA) SpMV — the framework's hot kernel.

Replaces the reference's OpenMP CSR row loop (SURVEY.md §4.5) on banded
operators. Design (per /opt/skills/guides/pallas_guide.md):

- vectors are viewed as (n/128, 128) sublane×lane tiles; the kernel processes
  row-blocks of ``bm`` sublanes per grid step;
- each diagonal offset ``d`` splits as ``d = q*128 + r`` (q sublane shift,
  r lane shift, both static). The kernel forms every shifted view with two
  static lane-slices of adjacent sublane rows — no gather, no dynamic
  addressing, pure VPU fma;
- the q's are grouped into *clusters* (e.g. the z−1 / center / z+1 plane
  groups of a 7-point stencil). Each cluster gets its own overlapping
  ``pl.Element`` x window of ``bm + spread`` sublanes, so x traffic is
  ~(#clusters)× the vector size instead of (bandwidth/bm)×;
- x is NOT copied/padded on the host (that cost ~20% of SoL): windows that
  would overhang the high end use Mosaic element-window padding; Mosaic has
  no *low* padding yet, so the first ``k0`` row-blocks (whose windows would
  start negative) are computed by a cheap XLA head path and concatenated —
  the concat fuses into the output materialization.

Requires n % 128 == 0 — falls back to XLA otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.formats import Dia

LANES = 128


def _cluster_qs(offsets, gap=16):
    """Group sublane shifts q=d//128 into contiguous clusters (static)."""
    qs = sorted({d // LANES for d in offsets})
    clusters = [[qs[0]]]
    for q in qs[1:]:
        if q - clusters[-1][-1] <= gap:
            clusters[-1].append(q)
        else:
            clusters.append([q])
    return [(c[0], c[-1]) for c in clusters]  # (q_min, q_max) per cluster


def _dia_kernel(*refs, offsets, bm, clusters, cluster_of):
    # refs: [x_win_0, ..., x_win_{C-1}, data, out]
    nwin = len(clusters)
    data_ref = refs[nwin]
    o_ref = refs[nwin + 1]
    shift_cache = {}  # trace-time reuse across taps sharing (cluster, q, r)
    acc = jnp.zeros((bm, LANES), jnp.float32)
    for k, d in enumerate(offsets):
        q, r = divmod(d, LANES)
        c = cluster_of[k]
        if (c, q, r) not in shift_cache:
            x_ref = refs[c]
            lo, _hi, delta = clusters[c]
            base = (q - lo) + delta  # row offset within this cluster window
            a = x_ref[base : base + bm, :]
            if r == 0:
                shifted = a
            else:
                b = x_ref[base + 1 : base + 1 + bm, :]
                shifted = jnp.concatenate([a[:, r:], b[:, :r]], axis=1)
            shift_cache[(c, q, r)] = shifted
        acc = acc + data_ref[k] * shift_cache[(c, q, r)]
    o_ref[:, :] = acc


@functools.lru_cache(maxsize=64)
def _make_call(m, offsets, bm, dtype_name, interpret=False):
    dtype = jnp.dtype(dtype_name)
    assert bm % 8 == 0, "bm must be a sublane multiple"
    raw = _cluster_qs(offsets)
    cluster_of = tuple(
        next(i for i, (lo, hi) in enumerate(raw) if lo <= d // LANES <= hi)
        for d in offsets
    )
    # Mosaic requires 8-aligned window starts: align each cluster's start
    # down and compensate with an in-window delta.
    clusters, win_rows, starts = [], [], []
    for lo, hi in raw:
        aligned = (lo // 8) * 8
        delta = lo - aligned
        rows = bm + (hi - lo) + 1 + delta
        rows += (-rows) % 8
        clusters.append((lo, hi, delta))
        win_rows.append(rows)
        starts.append(aligned)
    # Edge blocks whose windows would overhang the array are computed by the
    # XLA edge path instead: Mosaic has no low element-window padding, and
    # high-padding contents are unspecified (0·NaN would poison masked slots).
    st_min = min(starts)
    k0 = max(0, -(st_min // bm)) if st_min < 0 else 0
    over = max(st + rows - bm for st, rows in zip(starts, win_rows))
    k1 = max(0, -(-over // bm))
    nblocks = m // bm - k0 - k1
    if nblocks <= 0:
        return None, None, None, None
    ndiag = len(offsets)

    kernel = functools.partial(_dia_kernel, offsets=tuple(offsets), bm=bm,
                               clusters=tuple(clusters),
                               cluster_of=cluster_of)
    x_specs = [
        pl.BlockSpec((pl.Element(rows), pl.Element(LANES)),
                     (lambda i, st=st: (pl.multiple_of((i + k0) * bm + st, 8),
                                        0)),
                     memory_space=pltpu.VMEM)
        for st, rows in zip(starts, win_rows)
    ]
    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=x_specs + [
            pl.BlockSpec((ndiag, bm, LANES), lambda i: (0, i + k0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * bm, LANES), dtype),
        interpret=interpret,
    )
    return call, len(clusters), k0, k1


def _plane_decompose(offsets, plane):
    """offset → (pz, q, r): plane shift, sublane shift, lane shift."""
    out = []
    for d in offsets:
        pz = int(round(d / plane))
        rem = d - pz * plane
        q, r = divmod(rem, LANES)
        out.append((pz, q, r))
    return out


def _plane_kernel(x_hbm, data_ref, *rest, decomp, pr, srows,
                  ring, nz, mode="spmv"):
    n_vec = {"spmv": 0, "residual": 1, "jacobi": 2}[mode]
    vec_refs = rest[:n_vec]
    o_ref, xbuf, sems = rest[n_vec:]
    i = pl.program_id(0)

    def dma(p):
        slot = jax.lax.rem(p + ring, ring)
        last = p >= nz - 1

        @pl.when(~last)
        def _():
            pltpu.make_async_copy(x_hbm.at[pl.ds(p * pr, srows), :],
                                  xbuf.at[slot], sems.at[slot]).start()

        @pl.when(last)
        def _():
            pltpu.make_async_copy(x_hbm.at[pl.ds(p * pr, pr), :],
                                  xbuf.at[slot, :pr, :],
                                  sems.at[slot]).start()

    def wait(p):
        slot = jax.lax.rem(p + ring, ring)
        last = p >= nz - 1

        @pl.when(~last)
        def _():
            pltpu.make_async_copy(x_hbm.at[pl.ds(p * pr, srows), :],
                                  xbuf.at[slot], sems.at[slot]).wait()

        @pl.when(last)
        def _():
            pltpu.make_async_copy(x_hbm.at[pl.ds(p * pr, pr), :],
                                  xbuf.at[slot, :pr, :],
                                  sems.at[slot]).wait()

    @pl.when(i == 0)
    def _():
        # finite-garbage guard for never-DMA'd carry rows and ghost planes
        xbuf[...] = jnp.zeros_like(xbuf)
        dma(jnp.int32(0))
        dma(jnp.int32(1))
        wait(jnp.int32(0))
        wait(jnp.int32(1))
        if nz > 2:
            dma(jnp.int32(2))

    @pl.when(i > 0)
    def _():
        @pl.when(i + 2 < nz)
        def _():
            dma(i + 2)

        @pl.when(i + 1 < nz)
        def _():
            wait(i + 1)

    # trace-time memoization: wide stencils (27-pt) reuse the same row view
    # / lane-shifted view across many taps — building each once keeps the
    # kernel VPU-lean (27-pt 128³ record 23 → 81.4 Gnnz/s together with the
    # plane-major/bf16 layout)
    rows_cache = {}
    shift_cache = {}

    def rows(pz, q):
        """(pr, 128) view of plane i+pz shifted down by q sublane rows."""
        if (pz, q) in rows_cache:
            return rows_cache[(pz, q)]
        if q >= 0:
            slot = jax.lax.rem(i + pz + ring, ring)
            out = xbuf[slot, q : q + pr, :]
        else:
            slot_prev = jax.lax.rem(i + pz - 1 + ring, ring)
            slot_cur = jax.lax.rem(i + pz + ring, ring)
            head = xbuf[slot_prev, pr + q : pr, :]
            tail = xbuf[slot_cur, 0 : pr + q, :]
            out = jnp.concatenate([head, tail], axis=0)
        rows_cache[(pz, q)] = out
        return out

    def shifted_view(pz, q, r):
        if (pz, q, r) in shift_cache:
            return shift_cache[(pz, q, r)]
        a = rows(pz, q)
        if r == 0:
            out = a
        else:
            b = rows(pz, q + 1)
            out = jnp.concatenate([a[:, r:], b[:, :r]], axis=1)
        shift_cache[(pz, q, r)] = out
        return out

    acc = jnp.zeros((pr, LANES), jnp.float32)
    for k, (pz, q, r) in enumerate(decomp):
        acc = acc + data_ref[k] * shifted_view(pz, q, r)
    # fused level-stage epilogues (the ConstDia/routed fusion pattern):
    # the plane's own x rows are already VMEM-resident in the ring
    # (rows(0,0)), so Jacobi costs no extra x operand.
    if mode == "residual":
        (b_ref,) = vec_refs
        o_ref[:, :] = b_ref[:, :] - acc
    elif mode == "jacobi":
        b_ref, s_ref = vec_refs
        o_ref[:, :] = rows(0, 0) + s_ref[:, :] * (b_ref[:, :] - acc)
    else:
        o_ref[:, :] = acc


@functools.lru_cache(maxsize=64)
def _make_plane_call(nz, pr, offsets, plane, dtype_name, interpret=False,
                     plane_major=False, mode="spmv"):
    dtype = jnp.dtype(dtype_name)
    decomp = tuple(_plane_decompose(offsets, plane))
    if any(abs(pz) > 1 or q < -8 or q + 1 > 8 for pz, q, r in decomp):
        return None
    ring = 6
    srows = pr + 8
    ndiag = len(offsets)
    n_vec = {"spmv": 0, "residual": 1, "jacobi": 2}[mode]
    kernel = functools.partial(_plane_kernel, decomp=decomp, pr=pr,
                               srows=srows, ring=ring, nz=nz, mode=mode)
    if plane_major:
        # (nz, ndiag, pr, 128): one CONTIGUOUS slab DMA per grid step —
        # measured 2.1× over the strided diag-major reads at 7-pt 256³
        data_spec = pl.BlockSpec((None, ndiag, pr, LANES),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        data_spec = pl.BlockSpec((ndiag, pr, LANES), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((pr, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_dtype = jnp.float32 if mode != "spmv" else dtype
    return pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            data_spec,
        ] + [vec_spec] * n_vec,
        out_specs=pl.BlockSpec((pr, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz * pr, LANES), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((ring, srows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((ring,)),
        ],
        interpret=interpret,
    )


def _plane_call(a, x: jax.Array, vecs, mode: str, interpret: bool):
    nz, ndiag, pr, lanes = a.data4.shape
    plane = pr * lanes
    call = _make_plane_call(nz, pr, tuple(a.offsets), plane,
                            jnp.dtype(x.dtype).name, interpret,
                            plane_major=True, mode=mode)
    if call is None:
        return None
    m = a.n_rows // LANES
    vps = tuple(v.astype(jnp.float32).reshape(m, LANES) for v in vecs)
    return call(x.reshape(m, LANES), a.data4, *vps).reshape(-1)


def spmv_plane_dia(a, x: jax.Array, interpret: bool = False) -> jax.Array:
    """y = A @ x for a PlaneDia operator (plane-major rolling kernel)."""
    y = _plane_call(a, x, (), "spmv", interpret)
    if y is None:
        from ..sparse.formats import plane_to_dia
        from .spmv import spmv_dia

        return spmv_dia(plane_to_dia(a), x)
    return y


def residual_plane_dia(a, x: jax.Array, b: jax.Array,
                       interpret: bool = False):
    """r = b − A·x fused into the rolling-plane pass (one level stage
    instead of SpMV + XLA subtract). None when the plane contract fails."""
    return _plane_call(a, x, (b,), "residual", interpret)


def jacobi_plane_dia(a, x: jax.Array, b: jax.Array, s: jax.Array,
                     interpret: bool = False):
    """x' = x + s·(b − A·x) in one fused pass; the x term reads the
    VMEM-resident plane ring (no extra operand)."""
    return _plane_call(a, x, (b, s), "jacobi", interpret)


def spmv_dia_planes(a: Dia, x: jax.Array, interpret: bool = False):
    """Rolling-plane kernel: x streamed from HBM exactly once (plus an 8-row
    carry per plane) through a 6-slot VMEM ring — the minimum-traffic SpMV
    for 3D stencil operators. Returns None when the operator doesn't fit the
    plane contract (caller falls back to the cluster-window kernel)."""
    if a.dims is None or len(a.dims) != 3:
        return None
    nz, ny, nx = a.dims
    plane = ny * nx
    if plane % LANES != 0 or plane // LANES < 16 or nz < 8:
        return None
    pr = plane // LANES
    call = _make_plane_call(nz, pr, tuple(a.offsets), plane,
                            jnp.dtype(x.dtype).name, interpret)
    if call is None:
        return None
    m = a.n_rows // LANES
    y2 = call(x.reshape(m, LANES),
              a.data.reshape(len(a.offsets), m, LANES))
    return y2.reshape(-1)


def _edge_spmv(a: Dia, x: jax.Array, r0: int, nrows: int) -> jax.Array:
    """XLA path for rows [r0, r0+nrows) — edge blocks only (tiny pads)."""
    n = a.n_rows
    offs = a.offsets
    lo = max(0, -min(offs))
    hi = max(0, max(offs))
    lo_clip = max(0, r0 - lo)
    hi_clip = min(n, r0 + nrows + hi)
    xw = jnp.pad(x[lo_clip:hi_clip],
                 (lo_clip - (r0 - lo), (r0 + nrows + hi) - hi_clip))
    y = jnp.zeros((nrows,), x.dtype)
    for k, off in enumerate(offs):
        y = y + a.data[k, r0 : r0 + nrows] * jax.lax.dynamic_slice(
            xw, (off + lo,), (nrows,))
    return y


def spmv_dia_pallas(a: Dia, x: jax.Array, bm: int = 256,
                    interpret: bool = False) -> jax.Array:
    """y = A @ x via the Pallas banded kernels (rolling-plane when the
    operator carries 3D grid dims, cluster-window otherwise)."""
    y = spmv_dia_planes(a, x, interpret=interpret)
    if y is not None:
        return y
    n = a.n_rows
    while bm > 8 and n % (LANES * bm) != 0:
        bm //= 2  # shrink the row block until it tiles the operator
    if n % (LANES * bm) != 0 or not a.offsets:
        from .spmv import spmv_dia

        return spmv_dia(a, x)

    m = n // LANES
    call, ncl, k0, k1 = _make_call(m, tuple(a.offsets), bm,
                                   jnp.dtype(x.dtype).name, interpret)
    if call is None:  # operator band wider than the whole grid
        from .spmv import spmv_dia

        return spmv_dia(a, x)
    x2 = x.reshape(m, LANES)
    data3 = a.data.reshape(len(a.offsets), m, LANES)
    y_main = call(*([x2] * ncl), data3).reshape(-1)
    parts = []
    if k0:
        parts.append(_edge_spmv(a, x, 0, k0 * bm * LANES))
    parts.append(y_main)
    if k1:
        tail_rows = k1 * bm * LANES
        parts.append(_edge_spmv(a, x, n - tail_rows, tail_rows))
    return jnp.concatenate(parts) if len(parts) > 1 else y_main
