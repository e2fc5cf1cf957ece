"""Pallas TPU panel-SpMM kernel: U = A · X for X an (n, C) dense panel.

Parity: the device numeric phase of the reference's SpGEMM layer
(SURVEY.md §2 #3; BASELINE north-star "two-phase symbolic+numeric SpGEMM").
The colored-probing RAP (ops/probe_rap.py) reduces the Galerkin triple
product to exactly this primitive.

Per grid step (one 128-row output block, see sparse/panels.py for the
plan):

- one contiguous span DMA from the chunk-major panel buffer
  ``Xt[(base)*C : (base+S)*C, 128]`` (double-buffered ring);
- per slot k: one (C, 128) window slice + a one-hot selection matmul

      sel[m, l] = (lidx[k, l] == m)             # VPU compare, 0/1 exact
      U_block += val[k] * (win_hi @ sel + win_lo @ sel)

  The MXU performs the per-lane gather *and* the accumulation: the one-hot
  matmul evaluates win[:, lidx[l]] for all C panel columns at once. Every
  measured elementwise gather on this chip is orders of magnitude slower
  (XLA gather 0.1 Gelem/s, XLA take_along_axis 0.04 Gelem/s, in-kernel
  take_along ~19 G lane/s = C×-scaled cost); the one-hot matmul is the only
  formulation whose per-slot cost does not scale with C on the VPU.

Window precision: the panel is split into a bf16 (hi, lo) pair —
``hi = bf16(x); lo = bf16(x - hi)`` — and the one-hot is exact 0/1 in
bf16, so the two bf16 matmuls reconstruct the f32 gather to ~2⁻¹⁶ relative
(the MXU's native bf16 rate is ~8× its f32 rate). An f32 single-matmul
variant exists for full f32 precision (``precision='f32'``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse.panels import (
    CHUNK_U, K_BLK, LANES, UNROLL_K, PanelPlan, pack_panels, unpack_panels,
)

RING = 2


def _slot_accumulate(win_of, lidx_ref, val_ref, *, K, C, precision):
    iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)

    def slot(k, acc):
        lrow = lidx_ref[pl.ds(k, 1)]            # (1, 128)
        vrow = val_ref[pl.ds(k, 1)]             # (1, 128)
        eq = iota == lrow
        if precision == "f32":
            (wref,) = win_of(k)
            sel = jnp.where(eq, vrow, 0.0)
            return acc + jnp.dot(wref, sel,
                                 preferred_element_type=jnp.float32)
        wins = win_of(k)
        selb = eq.astype(jnp.bfloat16)
        g = jnp.dot(wins[0], selb, preferred_element_type=jnp.float32)
        for wref in wins[1:]:
            g = g + jnp.dot(wref, selb, preferred_element_type=jnp.float32)
        return acc + vrow * g

    acc = jnp.zeros((C, LANES), jnp.float32)
    if K <= UNROLL_K:
        for k in range(K):
            acc = slot(k, acc)
        return acc

    def chunk(c, acc):
        for u in range(CHUNK_U):
            acc = slot(c * CHUNK_U + u, acc)
        return acc

    n_full = K // CHUNK_U
    acc = jax.lax.fori_loop(0, n_full, chunk, acc)
    for k in range(n_full * CHUNK_U, K):
        acc = slot(k, acc)
    return acc


def _accumulate_out(o_ref, acc):
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _():
        o_ref[:, :] = acc

    @pl.when(kb != 0)
    def _():
        o_ref[:, :] = o_ref[:, :] + acc


def _n_split(precision: str) -> int:
    return {"f32": 1, "bf16x2": 2, "bf16x3": 3}[precision]


def _spmm_kernel(sbase_ref, soff_ref, lidx_ref, val_ref, *rest,
                 kb_slots, S, C, nb, precision):
    n_x = _n_split(precision)
    x_hbms = rest[:n_x]
    o_ref = rest[n_x]
    spans = rest[n_x + 1:n_x + 1 + n_x]
    sems = rest[n_x + 1 + n_x]

    i = pl.program_id(0)
    kb = pl.program_id(1)

    def copy(p, which):
        slot = jax.lax.rem(p, RING)
        return pltpu.make_async_copy(
            x_hbms[which].at[pl.ds(sbase_ref[0, p] * C, S * C), :],
            spans[which].at[slot], sems.at[which, slot])

    @pl.when(jnp.logical_and(i == 0, kb == 0))
    def _():
        for w in range(n_x):
            copy(jnp.int32(0), w).start()

    @pl.when(jnp.logical_and(kb == 0, i + 1 < nb))
    def _():
        for w in range(n_x):
            copy(i + 1, w).start()

    @pl.when(kb == 0)
    def _():
        for w in range(n_x):
            copy(i, w).wait()

    sl = jax.lax.rem(i, RING)

    def win_of(k):
        j = soff_ref[kb, k]
        return tuple(spans[w][sl, pl.ds(j * C, C), :] for w in range(n_x))

    _accumulate_out(
        o_ref,
        _slot_accumulate(win_of, lidx_ref, val_ref, K=kb_slots, C=C,
                         precision=precision))


@functools.lru_cache(maxsize=256)
def _make_spmm_call(nb, K, S, P, nxp, C, precision, interpret=False):
    kb_slots = min(K, K_BLK)
    nkb = K // kb_slots
    n_x = _n_split(precision)
    xdt = jnp.float32 if precision == "f32" else jnp.bfloat16
    kernel = functools.partial(_spmm_kernel, kb_slots=kb_slots, S=S, C=C,
                               nb=nb, precision=precision)
    nbp = -(-nb // LANES) * LANES
    return pl.pallas_call(
        kernel,
        grid=(nb, nkb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # sbase (1,nbp)
            pl.BlockSpec((None, nkb, P), lambda i, kb: (i, 0, 0),
                         memory_space=pltpu.SMEM),            # soff
            pl.BlockSpec((None, kb_slots, LANES),
                         lambda i, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),            # lidx chunk
            pl.BlockSpec((None, kb_slots, LANES),
                         lambda i, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),            # val chunk
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_x,        # Xt HBM
        out_specs=pl.BlockSpec((C, LANES), lambda i, kb: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * C, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RING, S * C, LANES), xdt)
                        for _ in range(n_x)]
        + [pltpu.SemaphoreType.DMA((n_x, RING))],
        interpret=interpret,
    )


def vmem_fit(S: int, C: int, K: int, precision: str = "bf16x2",
             budget: int = 13 << 20) -> bool:
    """Does the streamed window ring + plan pipeline fit VMEM?"""
    n_x = _n_split(precision)
    xbytes = 4 if precision == "f32" else 2
    ring = RING * n_x * S * C * LANES * xbytes
    kb = min(K, K_BLK)
    plan = 2 * 2 * kb * LANES * 4          # lidx+val, double-buffered
    out = C * LANES * 4
    return ring + plan + out <= budget


def spmm_panel(a: PanelPlan, xt: jax.Array, C: int,
               precision: str = "bf16x2", interpret: bool = False):
    """U = A @ X in chunk-major panel form.

    ``xt`` is the packed panel (see ``pack_panels``): float32
    ``(nxp*C, 128)`` for precision='f32', or a TUPLE of 2 (bf16x2) or 3
    (bf16x3 — f32-exact) bf16 split arrays. Returns U in the same packed
    form ``(nb*C, 128)`` float32 (directly consumable as the next SpMM's
    xt after a dtype split).
    """
    nb, K = a.val.shape[:2]
    call = _make_spmm_call(nb, K, a.span, a.soff.shape[2], a.nxp, C,
                           precision, interpret)
    if precision == "f32":
        return call(a.sbase, a.soff, a.lidx, a.val, xt)
    return call(a.sbase, a.soff, a.lidx, a.val, *xt)


def split_bf16(xt: jax.Array, n: int = 2):
    """f32 packed panel → exact n-way bf16 split (n=3 recovers f32 fully:
    8+8+8 mantissa bits cover f32's 24).

    The optimization barrier is load-bearing: under jit, XLA folds the
    f32→bf16→f32 convert round-trip as a no-op, which silently zeroes the
    residual splits (measured: 3e-3 relative error on chip — exactly the
    hi-only signature — while the eager computation was exact)."""
    parts = []
    rem = xt
    for _ in range(n - 1):
        hi = jax.lax.optimization_barrier(rem.astype(jnp.bfloat16))
        parts.append(hi)
        rem = rem - hi.astype(jnp.float32)
    parts.append(rem.astype(jnp.bfloat16))
    return tuple(parts)


# ---------------------------------------------------------------------------
# v3 "rolling window": the panel analog of the rolling-plane SpMV kernel.
#
# The v1 kernel re-DMAs its span window per 128-row block (~46 GB per RAP
# sweep at 7-pt 96³ — window starts advance ~8 chunks per block while the
# span is ~290, so ~97% of every DMA repeats the previous one). When the
# per-block window bases are (near-)monotone — true for R = Pᵀ with coarse
# ids numbered in fine order — the panel can stream through a CIRCULAR
# VMEM ring exactly once: each grid step WAITS for the chunks its block
# needs and ISSUES chunk DMAs up to the next block's high-water mark, with
# two SMEM counters (issued, waited) carrying the pipeline state across
# grid steps. Window traffic drops from nb·span·C to nxp·C elements.
# ---------------------------------------------------------------------------

ROLL_DC = 8       # x-chunks per rolling DMA (C rows each)
ROLL_NSEM = 8     # in-flight rolling DMAs per split


def roll_ring_chunks(plan: dict) -> int:
    """Ring capacity (chunks) the rolling kernel needs for this plan:
    max over blocks of (issue high-water at block i) − sbase_i, DC-padded.
    Monotone-enough plans give ≈ span + one block's advance."""
    import numpy as np

    nb = plan["val"].shape[0]
    sbase = plan["sbase"][0, :nb].astype(np.int64)
    hi = np.maximum(plan["block_hi"], sbase + 1)
    hi_next = np.empty(nb, np.int64)
    hi_next[: nb - 1] = hi[1:]
    hi_next[nb - 1] = hi[nb - 1]
    water = np.maximum.accumulate(np.maximum(hi, hi_next))
    need = int((water - sbase).max())
    return -(-(need + ROLL_DC) // ROLL_DC) * ROLL_DC


def _spmm_roll_kernel(sbase_ref, hi_ref, soff_ref, lidx_ref, val_ref, *rest,
                      kb_slots, s_ring, C, nb, nxp, precision):
    n_x = _n_split(precision)
    x_hbms = rest[:n_x]
    o_ref = rest[n_x]
    rings = rest[n_x + 1:n_x + 1 + n_x]
    sems = rest[n_x + 1 + n_x]
    cnt = rest[n_x + 2 + n_x]          # SMEM (2,): [issued, waited] in DC units

    i = pl.program_id(0)
    kb = pl.program_id(1)
    nd_total = -(-nxp // ROLL_DC)
    nring = s_ring // ROLL_DC

    def issue(d):
        """Start the rolling DMA for DC-chunk group d (all splits)."""
        rslot = jax.lax.rem(d, nring)
        for w in range(n_x):
            pltpu.make_async_copy(
                x_hbms[w].at[pl.ds(d * ROLL_DC * C, ROLL_DC * C), :],
                rings[w].at[pl.ds(rslot * ROLL_DC * C, ROLL_DC * C), :],
                sems.at[w, jax.lax.rem(d, ROLL_NSEM)]).start()

    def wait(d):
        rslot = jax.lax.rem(d, nring)
        for w in range(n_x):
            pltpu.make_async_copy(
                x_hbms[w].at[pl.ds(d * ROLL_DC * C, ROLL_DC * C), :],
                rings[w].at[pl.ds(rslot * ROLL_DC * C, ROLL_DC * C), :],
                sems.at[w, jax.lax.rem(d, ROLL_NSEM)]).wait()

    @pl.when(jnp.logical_and(i == 0, kb == 0))
    def _():
        d0 = sbase_ref[0] // ROLL_DC
        cnt[0] = d0
        cnt[1] = d0

    @pl.when(kb == 0)
    def _():
        # issue up to the high-water mark of this AND the next block
        # (bounded in-flight), then wait for this block's needs
        i_next = jnp.minimum(i + 1, nb - 1)
        need = jnp.minimum(-(-hi_ref[i] // ROLL_DC), nd_total)
        target = jnp.maximum(
            need, jnp.minimum(-(-hi_ref[i_next] // ROLL_DC), nd_total))
        issued0 = cnt[0]
        waited0 = cnt[1]

        def issue_body(d, w):
            # keep ≤ ROLL_NSEM in flight: wait the oldest when saturated
            w = jax.lax.cond(d - w >= ROLL_NSEM,
                             lambda ww: (wait(ww), ww + 1)[1],
                             lambda ww: ww, w)
            issue(d)
            return w

        waited1 = jax.lax.fori_loop(issued0, target, issue_body, waited0)

        def wait_body(d, c):
            wait(d)
            return c

        jax.lax.fori_loop(waited1, need, wait_body, 0)
        cnt[0] = jnp.maximum(issued0, target)
        cnt[1] = jnp.maximum(waited1, need)

    base = sbase_ref[i]

    def win_of(k):
        # chunk j lives at ring rows (j mod s_ring)·C — consistent with
        # the group placement (s_ring is a ROLL_DC multiple)
        j = base + soff_ref[kb, k]
        rr = jax.lax.rem(j, jnp.int32(s_ring))
        return tuple(rings[w][pl.ds(rr * C, C), :] for w in range(n_x))

    _accumulate_out(
        o_ref,
        _slot_accumulate(win_of, lidx_ref, val_ref, K=kb_slots, C=C,
                         precision=precision))


@functools.lru_cache(maxsize=256)
def _make_spmm_roll_call(nb, K, s_ring, P, nxp, C, precision,
                         interpret=False):
    kb_slots = min(K, K_BLK)
    nkb = K // kb_slots
    n_x = _n_split(precision)
    xdt = jnp.float32 if precision == "f32" else jnp.bfloat16
    kernel = functools.partial(_spmm_roll_kernel, kb_slots=kb_slots,
                               s_ring=s_ring, C=C, nb=nb, nxp=nxp,
                               precision=precision)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,     # sbase (nb,), hi (nb,)
            grid=(nb, nkb),
            in_specs=[
                pl.BlockSpec((None, nkb, P), lambda i, kb, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM),        # soff
                pl.BlockSpec((None, kb_slots, LANES),
                             lambda i, kb, *_: (i, kb, 0),
                             memory_space=pltpu.VMEM),        # lidx chunk
                pl.BlockSpec((None, kb_slots, LANES),
                             lambda i, kb, *_: (i, kb, 0),
                             memory_space=pltpu.VMEM),        # val chunk
            ] + [pl.BlockSpec(memory_space=pl.ANY)] * n_x,    # Xt HBM
            out_specs=pl.BlockSpec((C, LANES), lambda i, kb, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((s_ring * C, LANES), xdt)
                            for _ in range(n_x)]
            + [pltpu.SemaphoreType.DMA((n_x, ROLL_NSEM)),
               pltpu.SMEM((2,), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((nb * C, LANES), jnp.float32),
        interpret=interpret,
    )


def spmm_panel_roll(a: PanelPlan, hi, s_ring: int, xt, C: int,
                    precision: str = "bf16x3", interpret: bool = False):
    """U = A @ X with the rolling-window kernel. ``hi`` is the per-block
    window high-water chunk array (plan block_hi, int32, length nb);
    ``s_ring`` from :func:`roll_ring_chunks`. The packed panel must be
    padded to a ROLL_DC multiple of chunks (the rolling DMAs move whole
    DC-groups)."""
    nb, K = a.val.shape[:2]
    nxp_roll = -(-a.nxp // ROLL_DC) * ROLL_DC
    first = xt if precision == "f32" else xt[0]
    assert first.shape[0] == nxp_roll * C, (
        f"rolling panel wants {nxp_roll}·C rows, got {first.shape[0]}")
    call = _make_spmm_roll_call(nb, K, int(s_ring), a.soff.shape[2],
                                nxp_roll, C, precision, interpret)
    if precision == "f32":
        return call(a.sbase[0, :nb], hi, a.soff, a.lidx, a.val, xt)
    return call(a.sbase[0, :nb], hi, a.soff, a.lidx, a.val, *xt)


# ---------------------------------------------------------------------------
# v2: multi-group shared windows + per-block K early exit.
#
# The v1 kernel re-DMAs its span window for every 128-row block; on real
# PMIS levels that was ~50 GB per RAP sweep (measured: the entire cost).
# v2 processes R_g consecutive blocks per grid step over ONE shared
# element window whose start comes from a scalar-prefetched schedule, so
# window traffic drops to ~(S_win / (R_g·step)) × the panel size. A
# per-block slot count (kact) skips K-chunks that are pure padding (the
# R operands pack at eff ~0.1, so most K-chunks are empty for most
# blocks).
# ---------------------------------------------------------------------------


def _static(**kw):
    import dataclasses

    return dataclasses.field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PanelPlanV2:
    """Scheduled panel-SpMM operand (multi-group shared windows)."""

    val: jax.Array     # (nsteps*R_g, K, 128) f32
    lidx: jax.Array    # (nsteps*R_g, K, 128) int32
    soff: jax.Array    # (nsteps*R_g, nkb, P) int32 — span-relative chunks
    sbases: jax.Array  # (nsteps, 1, R_g) int32 — per-block base chunk
    kact: jax.Array    # (nsteps, 1, R_g) int32 — actual slots per block
    starts: jax.Array  # (nsteps,) int32 — window start chunk per step
    n_rows: int = _static()
    n_cols: int = _static()
    s_win: int = _static()   # shared window chunks per step
    nxp: int = _static()     # padded panel length in chunks
    nnz: int = _static()
    r_g: int = _static()
    c_panel: int = _static()


def build_plan_v2(m, C: int, precision: str = "bf16x3",
                  budget: int = 12 << 20):
    """Plan + schedule for the v2 kernel. None if nothing fits."""
    from ..sparse.panels import plan_panel_spmm

    plan = plan_panel_spmm(m)
    if plan is None:
        return None
    return schedule_plan_v2(plan, C, precision, budget)


def schedule_plan_v2(plan: dict, C: int, precision: str = "bf16x3",
                     budget: int = 12 << 20):
    """Schedule an existing ``plan_panel_spmm`` dict for the v2 kernel."""
    import numpy as np

    nb = plan["val"].shape[0]
    K = plan["K"]
    kb_slots = min(K, K_BLK)
    sbase = plan["sbase"][0, :nb].astype(np.int64)
    hi = np.maximum(plan["block_hi"], sbase + 1)
    n_x = _n_split(precision)
    xbytes = 4 if precision == "f32" else 2

    chosen = None
    for r_g in (128, 96, 64, 48, 32, 24, 16, 8):
        nsteps = -(-nb // r_g)
        cuts = np.arange(0, nb, r_g)
        starts = np.minimum.reduceat(sbase, cuts)
        s_win = int((np.maximum.reduceat(hi, cuts) - starts).max())
        s_win = -(-s_win // 8) * 8
        win = s_win * C * LANES * xbytes * n_x * 2      # double-buffered
        plans = r_g * kb_slots * LANES * 8 * 2
        out = r_g * C * LANES * 4
        if win + plans + out <= budget:
            chosen = (r_g, nsteps, starts, s_win)
            break
    if chosen is None:
        return None
    r_g, nsteps, starts, s_win = chosen
    # window must stay in-bounds: extend the panel padding so st+S_win
    # never overhangs (padding is zeros — exact under val=0 slots)
    nxp = max(int(plan["nxp"]), int(starts.max()) + s_win)

    def pad_blocks(a):
        import numpy as np

        if a.shape[0] == nsteps * r_g:
            return a
        pad = np.zeros((nsteps * r_g - a.shape[0],) + a.shape[1:], a.dtype)
        return np.concatenate([a, pad])

    kact = pad_blocks(plan["block_kact"].astype(np.int32))
    sb = pad_blocks(plan["sbase"][0, :nb].astype(np.int32))
    import jax.numpy as jnp

    return PanelPlanV2(
        val=jnp.asarray(pad_blocks(plan["val"]), jnp.float32),
        lidx=jnp.asarray(pad_blocks(plan["lidx"])),
        soff=jnp.asarray(pad_blocks(plan["soff"])),
        sbases=jnp.asarray(sb.reshape(nsteps, 1, r_g)),
        kact=jnp.asarray(kact.reshape(nsteps, 1, r_g)),
        starts=jnp.asarray(starts.astype(np.int32)),
        n_rows=plan["n_rows"], n_cols=plan["n_cols"],
        s_win=int(s_win), nxp=int(nxp), nnz=plan["nnz"],
        r_g=int(r_g), c_panel=int(C),
    )


def _spmm_v2_kernel(starts_ref, sbase_ref, kact_ref, soff_ref, lidx_ref,
                    val_ref, *rest, r_g, kb_slots, C, precision):
    n_x = _n_split(precision)
    win_refs = rest[:n_x]
    o_ref = rest[n_x]
    kb = pl.program_id(1)
    start = starts_ref[pl.program_id(0)]
    iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)

    def group(g, carry):
        ka = kact_ref[0, g]
        off = sbase_ref[0, g] - start

        def compute(_):
            def slot(k, acc):
                j = (soff_ref[g, kb, k] + off) * C
                lrow = lidx_ref[g, pl.ds(k, 1)]
                vrow = val_ref[g, pl.ds(k, 1)]
                eq = iota == lrow
                if precision == "f32":
                    sel = jnp.where(eq, vrow, 0.0)
                    w = win_refs[0][pl.ds(j, C), :]
                    return acc + jnp.dot(w, sel,
                                         preferred_element_type=jnp.float32)
                selb = eq.astype(jnp.bfloat16)
                gsum = jnp.zeros((C, LANES), jnp.float32)
                for wref in win_refs:
                    gsum = gsum + jnp.dot(wref[pl.ds(j, C), :], selb,
                                          preferred_element_type=jnp.float32)
                return acc + vrow * gsum

            acc = jnp.zeros((C, LANES), jnp.float32)
            return jax.lax.fori_loop(0, kb_slots,
                                     lambda k, a: slot(k, a), acc)

        acc = jax.lax.cond(kb * kb_slots < ka, compute,
                           lambda _: jnp.zeros((C, LANES), jnp.float32),
                           0)

        @pl.when(kb == 0)
        def _():
            o_ref[pl.ds(g * C, C), :] = acc

        @pl.when(kb != 0)
        def _():
            o_ref[pl.ds(g * C, C), :] = o_ref[pl.ds(g * C, C), :] + acc

        return carry

    jax.lax.fori_loop(0, r_g, group, 0)


@functools.lru_cache(maxsize=256)
def _make_spmm_v2_call(nsteps, r_g, K, P, s_win, nxp, C, precision,
                       interpret=False):
    kb_slots = min(K, K_BLK)
    nkb = K // kb_slots
    n_x = _n_split(precision)
    xdt = jnp.float32 if precision == "f32" else jnp.bfloat16
    kernel = functools.partial(_spmm_v2_kernel, r_g=r_g, kb_slots=kb_slots,
                               C=C, precision=precision)
    grid = (nsteps, nkb)
    win_spec = pl.BlockSpec(
        (pl.Element(s_win * C), pl.Element(LANES)),
        lambda i, kb, st: (pl.multiple_of(st[i] * C, 8), 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, 1, r_g), lambda i, kb, st: (i, 0, 0),
                             memory_space=pltpu.SMEM),     # sbases
                pl.BlockSpec((None, 1, r_g), lambda i, kb, st: (i, 0, 0),
                             memory_space=pltpu.SMEM),     # kact
                pl.BlockSpec((r_g, nkb, P), lambda i, kb, st: (i, 0, 0),
                             memory_space=pltpu.SMEM),     # soff
                pl.BlockSpec((r_g, kb_slots, LANES),
                             lambda i, kb, st: (i, kb, 0),
                             memory_space=pltpu.VMEM),     # lidx
                pl.BlockSpec((r_g, kb_slots, LANES),
                             lambda i, kb, st: (i, kb, 0),
                             memory_space=pltpu.VMEM),     # val
            ] + [win_spec] * n_x,
            out_specs=pl.BlockSpec((r_g * C, LANES),
                                   lambda i, kb, st: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nsteps * r_g * C, LANES),
                                       jnp.float32),
        interpret=interpret,
    )


def spmm_panel_v2(a: PanelPlanV2, xt, precision: str = "bf16x3",
                  interpret: bool = False):
    """U = A @ X with the scheduled multi-group kernel.

    ``xt``: packed panel(s) as in :func:`spmm_panel`. Output is in packed
    form ``(nb*C, 128)`` float32 where nb = ceil(n_rows/128) blocks come
    from the first nb of the padded step grid.
    """
    nsteps = a.sbases.shape[0]
    C = a.c_panel
    K = a.val.shape[1]
    call = _make_spmm_v2_call(nsteps, a.r_g, K, a.soff.shape[2], a.s_win,
                              a.nxp, C, precision, interpret)
    if precision == "f32":
        out = call(a.starts, a.sbases, a.kact, a.soff, a.lidx, a.val, xt)
    else:
        out = call(a.starts, a.sbases, a.kact, a.soff, a.lidx, a.val, *xt)
    nb = -(-a.n_rows // LANES)
    return out[: nb * C]


def _extract_kernel(w_ref, idx_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(w_ref[:, :], idx_ref[:, :], axis=1)


@functools.lru_cache(maxsize=64)
def _make_extract_call(nrb, njb, interpret=False):
    return pl.pallas_call(
        _extract_kernel,
        grid=(nrb, njb),
        in_specs=[
            pl.BlockSpec((LANES, LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LANES, LANES), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrb * LANES, njb * LANES),
                                       jnp.float32),
        interpret=interpret,
    )


def extract_lanes(w: jax.Array, idx: jax.Array, interpret: bool = False):
    """out[i, s] = w[i, idx[i, s]] — the width-128 take-along form Mosaic
    runs at VPU speed (XLA's own take_along_axis measured 0.04 Gelem/s on
    this chip). ``w`` is (R, 128); idx (R, S·128) int32; R, S·128 both
    multiples of 128."""
    nrb = w.shape[0] // LANES
    njb = idx.shape[1] // LANES
    call = _make_extract_call(nrb, njb, interpret)
    return call(w.astype(jnp.float32), idx)


def spmm_panel_xla(a: PanelPlan, x: jax.Array):
    """XLA gather formulation over the same plan (CPU path / test oracle).

    ``x`` is the plain (n_cols, C) panel; returns (n_rows, C) float32.
    """
    nb, K = a.val.shape[:2]
    C = x.shape[1]
    kb_slots = K // a.soff.shape[1]
    n_pad = a.nxp * LANES
    xp = jnp.concatenate(
        [x.astype(jnp.float32),
         jnp.zeros((n_pad - x.shape[0], C), jnp.float32)], axis=0)
    k = jnp.arange(K)
    soff2 = a.soff[:, k // kb_slots, k % kb_slots]      # (nb, K)
    chunk = soff2 + a.sbase[0, :nb, None]               # absolute chunk
    cols = chunk[:, :, None] * LANES + a.lidx           # (nb, K, 128)
    g = jnp.take(xp, cols.reshape(-1), axis=0).reshape(nb, K, LANES, C)
    u = jnp.sum(a.val.astype(jnp.float32)[..., None] * g, axis=1)
    return u.reshape(nb * LANES, C)[: a.n_rows]
