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

    ``refs`` layout: x_hbm, masks_ref, [b_ref], [s_ref], o_ref, xbuf, sems.
    ``mode``: "spmv" → o = A·x; "residual" → o = b − A·x;
    "jacobi" → o = x + s·(b − A·x)  (weighted-Jacobi sweep, s = ω·D⁻¹
    scalar — valid because a ConstDia diagonal is constant). The fused
    epilogues stream b through the Pallas-managed pipeline (an extra
    concurrent DMA stream) and eliminate the separate XLA triad pass of
    the unfused smoother/residual (~2× level traffic).
    """
    x_hbm, masks_ref = refs[0], refs[1]
    k = 2
    b_ref = s_ref = None
    if mode in ("residual", "jacobi"):
        b_ref = refs[k]
        k += 1
    if mode == "jacobi":
        s_ref = refs[k]
        k += 1
    o_ref, xbuf, sems = refs[k], refs[k + 1], refs[k + 2]
    i = pl.program_id(0)          # block index
    nsteps = nz // nb
    brows = nb * pr

    def dma(p):
        slot = jax.lax.rem(p + ring, ring)
        pltpu.make_async_copy(x_hbm.at[pl.ds(p * brows, brows), :],
                              xbuf.at[slot], sems.at[slot]).start()

    def wait(p):
        slot = jax.lax.rem(p + ring, ring)
        pltpu.make_async_copy(x_hbm.at[pl.ds(p * brows, brows), :],
                              xbuf.at[slot], sems.at[slot]).wait()

    @pl.when(i == 0)
    def _():
        # finite-garbage guard for the never-DMA'd ghost blocks
        xbuf[...] = jnp.zeros_like(xbuf)
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

    def rows(off):
        """(pr, 128) x rows [off, off+pr) relative to this block's start."""
        if off in rows_cache:
            return rows_cache[off]
        slot_cur = jax.lax.rem(i + ring, ring)
        if 0 <= off and off + pr <= brows:
            out = xbuf[slot_cur, off : off + pr, :]
        elif off < 0:
            slot_prev = jax.lax.rem(i - 1 + ring, ring)
            if off + pr <= 0:
                out = xbuf[slot_prev, brows + off : brows + off + pr, :]
            else:
                head = xbuf[slot_prev, brows + off : brows, :]
                tail = xbuf[slot_cur, 0 : pr + off, :]
                out = jnp.concatenate([head, tail], axis=0)
        else:
            slot_next = jax.lax.rem(i + 1 + ring, ring)
            if off >= brows:
                out = xbuf[slot_next, off - brows : off - brows + pr, :]
            else:
                head = xbuf[slot_cur, off : brows, :]
                tail = xbuf[slot_next, 0 : off + pr - brows, :]
                out = jnp.concatenate([head, tail], axis=0)
        rows_cache[off] = out
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
        else:  # jacobi: x + s·(b − A x); x-block rows live at offset j·pr
            s = s_ref[0, 0]
            xv = rows(j * pr)
            o_ref[rows_j, :] = xv + s * (b_ref[rows_j, :] - acc)


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
    if mode in ("residual", "jacobi"):
        # b is halo-free → Pallas-managed pipeline (its own DMA stream)
        in_specs.append(pl.BlockSpec((nb * pr, LANES), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    if mode == "jacobi":
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb * pr, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz * pr, LANES), dtype),
        scratch_shapes=[
            pltpu.VMEM((ring, nb * pr, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((ring,)),
        ],
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
