"""Pallas TPU kernel for matrix-free masked-constant stencil SpMV.

The speed-of-light SpMV for the BASELINE Dirichlet stencil operators
(SURVEY.md §4.5; reference unreadable — behavior from BASELINE.json):
when the operator is ``ConstDia`` (``data[k,i] = c_k · valid_k(i)``), no
operator bytes need to be streamed at all. The kernel moves only the x-block
in and the y-block out ≈ 8 B/point — versus ~22 B/point for the bf16
PlaneDia rolling kernel — so the throughput ceiling is ~ndiag·BW/8 ≈
340 Gnnz/s for the 7-point operator at the measured ~390 GB/s.

Design (v2 — multi-plane blocks):

- each grid step processes a block of ``nb`` z-planes (~1 MB), streamed
  through a 4-slot VMEM ring. Measured: one-plane steps leave the kernel
  per-step-overhead-bound (104 Gnnz/s at 256³ = 256 tiny steps); blocking
  amortizes the fixed step cost into megabyte DMAs.
- blocks are EXACTLY ``nb·pr`` rows (no tail carry): any tap read that
  crosses a block boundary slices the neighbor ring slot directly, which
  is always resident (slot i−1 kept, slot i+1 prefetched two steps ahead).
- a tiny ``(nmask, pr, 128)`` array of deduplicated in-plane validity masks
  is fetched ONCE (constant index_map → Pallas skips later re-copies).
  Mask multiplies also zero the finite garbage read from out-of-range ring
  rows (the framework's "0·finite" invariant, CLAUDE.md); z-boundary taps
  are killed by a per-plane scalar scale instead (their xy-mask is trivial).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _const_kernel(*refs, plan, pr, nb, ring, nz, mode="spmv"):
    """Body for y=Ax and its fused variants.

    ``refs`` layout: x_hbm, masks_ref, [p_hbm], [b_ref], [s_ref], o_ref,
    xbuf, [pbuf], sems, [sems2].

    Modes (s = ω·D⁻¹ scalar — valid because a ConstDia diagonal is
    constant; b_ref is a Pallas-managed pipeline stream, x_hbm/p_hbm are
    manually double-buffered halo streams):

    - "spmv":     o = A·x
    - "residual": o = b − A·x
    - "jacobi":   o = x + s·(b − A·x)           (one weighted-Jacobi sweep)
    - "zjr":      o = x − s·(A·x)   with x := b (zero-guess pre-smooth +
                  residual of a V(1,1) level in ONE pass over b: the
                  pre-smoothed iterate s·b never materializes)
    - "cja":      o = u + s·(x − A·u), u = s·x + p, with x := b and
                  p := prolonged coarse correction (coarse-grid correction
                  + post-smooth in ONE pass; both x and p stream through
                  halo rings since A·u taps need halos of u)
    """
    x_hbm, masks_ref = refs[0], refs[1]
    k = 2
    p_hbm = b_ref = s_ref = None
    if mode == "cja":
        p_hbm = refs[k]
        k += 1
    if mode in ("residual", "jacobi"):
        b_ref = refs[k]
        k += 1
    if mode in ("jacobi", "zjr", "cja"):
        s_ref = refs[k]
        k += 1
    o_ref, xbuf = refs[k], refs[k + 1]
    k += 2
    pbuf = None
    if mode == "cja":
        pbuf = refs[k]
        k += 1
    sems = refs[k]
    sems2 = refs[k + 1] if mode == "cja" else None
    i = pl.program_id(0)          # block index
    nsteps = nz // nb
    brows = nb * pr
    streams = [(x_hbm, xbuf, sems)]
    if mode == "cja":
        streams.append((p_hbm, pbuf, sems2))

    def dma(p):
        slot = jax.lax.rem(p + ring, ring)
        for hbm, buf, sem in streams:
            pltpu.make_async_copy(hbm.at[pl.ds(p * brows, brows), :],
                                  buf.at[slot], sem.at[slot]).start()

    def wait(p):
        slot = jax.lax.rem(p + ring, ring)
        for hbm, buf, sem in streams:
            pltpu.make_async_copy(hbm.at[pl.ds(p * brows, brows), :],
                                  buf.at[slot], sem.at[slot]).wait()

    @pl.when(i == 0)
    def _():
        # finite-garbage guard for the never-DMA'd ghost blocks
        xbuf[...] = jnp.zeros_like(xbuf)
        if pbuf is not None:
            pbuf[...] = jnp.zeros_like(pbuf)
        dma(jnp.int32(0))
        if nsteps > 1:
            dma(jnp.int32(1))
        wait(jnp.int32(0))
        if nsteps > 1:
            wait(jnp.int32(1))
        if nsteps > 2:
            dma(jnp.int32(2))

    @pl.when(i > 0)
    def _():
        @pl.when(i + 2 < nsteps)
        def _():
            dma(i + 2)

        @pl.when(i + 1 < nsteps)
        def _():
            wait(i + 1)

    # trace-time caches: row windows / shifted+masked views reused across
    # taps and local planes (wide stencils share most of them)
    rows_cache = {}
    view_cache = {}

    def _buf_rows(buf, off):
        """(pr, 128) rows [off, off+pr) of a ring buffer, relative to this
        block's start."""
        if (id(buf), off) in rows_cache:
            return rows_cache[(id(buf), off)]
        slot_cur = jax.lax.rem(i + ring, ring)
        if 0 <= off and off + pr <= brows:
            out = buf[slot_cur, off : off + pr, :]
        elif off < 0:
            slot_prev = jax.lax.rem(i - 1 + ring, ring)
            if off + pr <= 0:
                out = buf[slot_prev, brows + off : brows + off + pr, :]
            else:
                head = buf[slot_prev, brows + off : brows, :]
                tail = buf[slot_cur, 0 : pr + off, :]
                out = jnp.concatenate([head, tail], axis=0)
        else:
            slot_next = jax.lax.rem(i + 1 + ring, ring)
            if off >= brows:
                out = buf[slot_next, off - brows : off - brows + pr, :]
            else:
                head = buf[slot_cur, off : brows, :]
                tail = buf[slot_next, 0 : off + pr - brows, :]
                out = jnp.concatenate([head, tail], axis=0)
        rows_cache[(id(buf), off)] = out
        return out

    def rows(off):
        """Rows of the vector A is applied to: x for spmv/residual/jacobi,
        b for zjr, u = s·b + p for cja (combined once, cached)."""
        if mode != "cja":
            return _buf_rows(xbuf, off)
        key = ("u", off)
        if key in rows_cache:
            return rows_cache[key]
        s = s_ref[0, 0]
        out = s * _buf_rows(xbuf, off) + _buf_rows(pbuf, off)
        rows_cache[key] = out
        return out

    def masked_view(off, r, mk):
        """Lane-shifted (pr, 128) x view, zeroed where the tap leaves the
        plane (mask rows are plane-periodic, so one mask serves every j)."""
        key = (off, r, mk)
        if key in view_cache:
            return view_cache[key]
        if (off, r, -1) in view_cache:
            a = view_cache[(off, r, -1)]
        else:
            a = rows(off)
            if r:
                # lane shift r: columns [r:] of row t + columns [:r] of t+1
                b = rows(off + 1)
                a = jnp.concatenate([a[:, r:], b[:, :r]], axis=1)
            view_cache[(off, r, -1)] = a
        out = a * masks_ref[mk] if mk >= 0 else a
        view_cache[key] = out
        return out

    for j in range(nb):
        acc = jnp.zeros((pr, LANES), jnp.float32)
        for pz, q, r, mk, c in plan:
            off = (j + pz) * pr + q
            v = masked_view(off, r, mk)
            if pz == 0:
                acc = acc + jnp.float32(c) * v
            else:
                g = i * nb + j + pz  # global plane index of the tap source
                ok = (g >= 0) & (g < nz)
                acc = acc + jnp.where(ok, jnp.float32(c), jnp.float32(0)) * v
        rows_j = slice(j * pr, (j + 1) * pr)
        if mode == "spmv":
            o_ref[rows_j, :] = acc
        elif mode == "residual":
            o_ref[rows_j, :] = b_ref[rows_j, :] - acc
        elif mode == "jacobi":
            s = s_ref[0, 0]
            xv = rows(j * pr)
            o_ref[rows_j, :] = xv + s * (b_ref[rows_j, :] - acc)
        elif mode == "zjr":
            s = s_ref[0, 0]
            bv = rows(j * pr)  # the x stream carries b here
            o_ref[rows_j, :] = bv - s * acc
        else:  # cja: u + s·(b − A·u)
            s = s_ref[0, 0]
            uv = rows(j * pr)
            bv = _buf_rows(xbuf, j * pr)
            o_ref[rows_j, :] = uv + s * (bv - acc)


@functools.lru_cache(maxsize=64)
def _make_const_call(nz, pr, nb, plan, nmask, dtype_name, interpret=False,
                     mode="spmv"):
    dtype = jnp.dtype(dtype_name)
    ring = 4
    nsteps = nz // nb
    kernel = functools.partial(_const_kernel, plan=plan, pr=pr, nb=nb,
                               ring=ring, nz=nz, mode=mode)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
        pl.BlockSpec((nmask, pr, LANES), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),  # masks: fetched once
    ]
    if mode == "cja":
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # p: 2nd ring
    if mode in ("residual", "jacobi"):
        # b is halo-free → Pallas-managed pipeline (its own DMA stream)
        in_specs.append(pl.BlockSpec((nb * pr, LANES), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    if mode in ("jacobi", "zjr", "cja"):
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
    scratch = [pltpu.VMEM((ring, nb * pr, LANES), jnp.float32)]
    if mode == "cja":
        scratch.append(pltpu.VMEM((ring, nb * pr, LANES), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((ring,)))
    if mode == "cja":
        scratch.append(pltpu.SemaphoreType.DMA((ring,)))
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb * pr, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz * pr, LANES), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )


def _const_plan(a):
    """Static per-tap kernel plan: (pz, q, r, mask_idx, coeff) or None.

    ``pz`` must equal the grid tap's dz (|dz| ≤ 1 — ring depth) and the
    in-plane remainder must fit a ±8-sublane window (q bounded so a tap
    never reaches past the adjacent block).
    """
    nz, ny, nx = a.dims
    plane = ny * nx
    plan = []
    for off, (dz, dy, dx), mk, c in zip(a.offsets, a.taps, a.mask_of,
                                        a.coeffs):
        if c == 0.0:
            continue
        rem = dy * nx + dx
        if off != dz * plane + rem:
            return None
        q, r = divmod(rem, LANES)
        if q < -8 or q + 1 > 8:
            return None
        plan.append((dz, q, r, mk, float(c)))
    return tuple(plan)


def _pick_nb(nz: int, pr: int) -> int | None:
    """Planes per block: ~1 MB blocks, ≥4 grid steps, power-of-2 divisor.

    Cross-block reads span at most ``pr + 8`` rows into a neighbor slot, so
    a block must hold at least that many: ``(nb-1)·pr ≥ 8`` ⇒ nb ≥ 2.
    """
    if nz % 2 != 0 or nz // 2 < 4:
        return None
    nb = 2
    while (nb * 2 <= 8 and nz % (nb * 2) == 0 and nz // (nb * 2) >= 4
           and (nb * 2) * pr <= 2048):
        nb *= 2
    return nb


def _resolve(a, nb, interpret, mode, dtype_name):
    if not interpret and jax.default_backend() != "tpu":
        return None  # callers fall back to the XLA composition
    nz, ny, nx = a.dims
    plane = ny * nx
    pr = plane // LANES
    plan = _const_plan(a) if (pr >= 8 and nz >= 8) else None
    if nb is None:
        nb = _pick_nb(nz, pr)
    if (plan is None or nb is None or nz % nb != 0
            or (nb - 1) * pr < 8):  # neighbor-slot reads must fit one slot
        return None
    return _make_const_call(nz, pr, nb, plan, int(a.masks.shape[0]),
                            dtype_name, interpret, mode=mode)


def spmv_const(a, x: jax.Array, interpret: bool = False,
               nb: int | None = None) -> jax.Array:
    """y = A @ x for a ConstDia operator via the matrix-free Pallas kernel."""
    call = _resolve(a, nb, interpret, "spmv", jnp.dtype(x.dtype).name)
    if call is None:
        from .spmv import spmv_const_xla

        return spmv_const_xla(a, x)
    m = a.n_rows // LANES
    return call(x.reshape(m, LANES), a.masks).reshape(-1)


def residual_const(a, x: jax.Array, b: jax.Array,
                   interpret: bool = False, nb: int | None = None):
    """r = b − A·x in ONE fused pass (b rides a separate managed stream).

    Bitwise-identical to ``b - spmv_const(a, x)`` — same tap products and
    accumulation order, the subtraction merely moves inside the kernel.
    """
    call = _resolve(a, nb, interpret, "residual", jnp.dtype(x.dtype).name)
    if call is None:
        from .spmv import spmv_const_xla

        return b - spmv_const_xla(a, x)
    m = a.n_rows // LANES
    return call(x.reshape(m, LANES), a.masks,
                b.reshape(m, LANES)).reshape(-1)


def jacobi_const(a, x: jax.Array, b: jax.Array, s,
                 interpret: bool = False, nb: int | None = None):
    """One weighted-Jacobi sweep x + s·(b − A·x) in ONE fused pass.

    ``s`` is the scalar ω·D⁻¹ (a ConstDia diagonal is constant, so the
    usual per-element ω·dinv vector is one number). Tap products and
    accumulation order match the unfused ``x + s*(b - spmv(a, x))`` sweep
    exactly; the final update may contract into an FMA (≤1 ulp, tighter).
    """
    call = _resolve(a, nb, interpret, "jacobi", jnp.dtype(x.dtype).name)
    if call is None:
        from .spmv import spmv_const_xla

        return x + s * (b - spmv_const_xla(a, x))
    m = a.n_rows // LANES
    s_arr = jnp.asarray(s, jnp.float32).reshape(1, 1)
    return call(x.reshape(m, LANES), a.masks, b.reshape(m, LANES),
                s_arr).reshape(-1)


def presmooth_residual_const(a, b: jax.Array, s, interpret: bool = False,
                             nb: int | None = None):
    """r = b − s·(A·b): zero-guess pre-smooth + residual of a V(1,1) level
    in ONE pass over b (128 MB of traffic at 256³ vs ~380 MB unfused).

    Algebra: with x₀ = 0 and one Jacobi sweep, x₁ = s·b and
    r = b − A·x₁ = b − s·(A·b) — the smoothed iterate never materializes;
    the matching correction step is :func:`correct_jacobi_const`.
    Accumulation reassociates s·Σ(c·b) vs Σ(c·(s·b)) → ≤1 ulp/tap vs the
    unfused composition.
    """
    call = _resolve(a, nb, interpret, "zjr", jnp.dtype(b.dtype).name)
    if call is None:
        from .spmv import spmv_const_xla

        return b - s * spmv_const_xla(a, b)
    m = a.n_rows // LANES
    s_arr = jnp.asarray(s, jnp.float32).reshape(1, 1)
    return call(b.reshape(m, LANES), a.masks, s_arr).reshape(-1)


def correct_jacobi_const(a, b: jax.Array, p: jax.Array, s,
                         interpret: bool = False, nb: int | None = None):
    """x' = u + s·(b − A·u) with u = s·b + p, in ONE pass.

    The V(1,1) epilogue: apply the prolonged coarse correction ``p`` to the
    (never-materialized) pre-smoothed iterate s·b, then one post-smoothing
    Jacobi sweep. Both b and p stream through halo rings because the A·u
    taps need halo rows of u.
    """
    call = _resolve(a, nb, interpret, "cja", jnp.dtype(b.dtype).name)
    if call is None:
        from .spmv import spmv_const_xla

        u = s * b + p
        return u + s * (b - spmv_const_xla(a, u))
    m = a.n_rows // LANES
    s_arr = jnp.asarray(s, jnp.float32).reshape(1, 1)
    return call(b.reshape(m, LANES), a.masks, p.reshape(m, LANES),
                s_arr).reshape(-1)
