"""Routed-ELL: the TPU-fast general-sparsity SpMV format (host planner).

Parity: the reference's general CSR SpMV (SURVEY.md §2 #2, §4.5 — reference
unreadable, behavior from BASELINE.json north-star). The XLA gather
formulation runs at ~0.1 Gelem/s on this chip (BASELINE.md), which made PMIS
(unstructured) hierarchies solve at XLA-gather speed. This format routes
every nonzero through the two primitives Mosaic executes at full VPU speed
(measured 2026-08-18, scripts/probe_span_slice.py: 18.7–19.3 Gnnz/s padded,
exact):

- a per-(slot, sublane) *dynamic sublane slice* of a VMEM buffer (whole x in
  resident mode, a per-block contiguous span in streamed mode), and
- ``jnp.take_along_axis(win, lidx, axis=1)`` at width exactly 128 (the only
  gather Mosaic supports).

Layout (round-3 "compact chunk" revision). Rows are tiled into blocks of
1024 = 8 sublane groups × 128 lanes (row r → block r//1024, sublane
(r//128)%8, lane r%128); x is viewed as 128-wide *chunks* (row j of the
(nxp, 128) view). Slots are grouped into fixed *slot-chunks* of KC = 16
slots, and the plan arrays store only each block's ACTIVE chunks, back to
back:

    val4  (NC, KC, 8, 128)   slot values
    lidx4 (NC, KC//4, 8, 128) 4 slots' 7-bit lane indices per int32 word
    soff  (NC, 128)           x-chunk row per (slot, sublane): [k*8 + s]
    cbase (1, NBP)            first chunk of block b
    kch   (1, NBP)            ACTIVE chunk count of block b (≥ 1)
    sbase (1, NBP)            span base chunk (streamed mode)

where NC = Σ_b kch[b]. Per (block, sublane-group) packing as before:
nonzeros grouped by x-chunk j; a group with max-per-row multiplicity m
occupies m slots. Unlike the round-1/2 layout there is NO worst-case-K
padding across blocks: a block with 40 active slots stores ceil(40/16) = 3
chunks whether or not some other block needs 12. The kernel
(ops/pallas_routed.py) walks chunks with an in-kernel DMA loop whose trip
count is per-block ``kch`` — padded compute and padded HBM bytes both
scale with the *local* demand. This is the round-2 VERDICT #1 fix: the old
(nb, K/K_BLK) grid paid ~3 µs of pipeline overhead per grid step at
worst-case K for every block (measured grid-step-bound at 3.89 Gnnz/s on
PMIS A[1] @96³, packing efficiency 0.216).

Planner runs once per operator in the amortized setup phase (vectorized
numpy with an optional native OpenMP fill — csrc). Returns None when the
operator violates the caps (caller falls back to the XLA ELL path).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
BLOCK_ROWS = 8 * LANES  # 1024

# Slots per chunk: the kernel's DMA/compute granularity. 16 slots → one
# 64 KB val DMA + one 16 KB lidx DMA + one 512 B soff DMA per chunk, and
# per-block padding waste ≤ 15 slots.
KC = 16

# Row-blocks per grid step in the resident kernel (ops/pallas_routed.py):
# the flattened chunk loop covers RB blocks so grid-step overhead is paid
# nb/RB times and the DMA pipeline runs across block boundaries.
RB = 8

# Tail padding chunks appended to the plan arrays: cbase is a cumsum, so a
# grid step's chunks are GLOBALLY contiguous and the kernel DMAs DG chunks
# per transfer (round-4: the kernel was measured DMA-overhead-bound at 3
# small DMAs/chunk); the last group of the last step may read up to
# DMA_PAD − 1 chunks past the real count.
DMA_PAD = 8

# Caps: beyond these the plan would strain SMEM/HBM — fall back to XLA.
# span: 2 × S × 512 B of streamed-mode VMEM scratch (4 MB at the cap).
# 4096 admits the 256³ restriction operators, whose ext+i windows span ~4
# fine z-planes = ~2080 chunks (measured round 4 — 2048 shut ALL of R[0]'s
# blocks out by ~1%, dropping R to the XLA-ELL path whose padded gather
# temps then OOM'd the V-cycle at the headline size).
S_CAP = 4096
# blocks: cbase/kch/sbase live fully in SMEM as scalar-prefetch arrays
# (~64 KB each at 16 k blocks — chip-validated at the 256³ scale, round 4;
# was 8192, which shut the classical pipeline out of the 256³ headline)
NB_CAP = 32768
NC_CAP = 1 << 20  # total chunks (plan arrays ≈ NC × 82 KB of HBM)

# Resident mode: when padded x plus the chunk rings fit VMEM (~16 MB/core),
# keep the WHOLE x in VMEM for the kernel's duration and index chunk rows
# absolutely — no span DMA at all.
RESIDENT_CAP_BYTES = 12 << 20
_RING_BYTES = 4 * (KC * 8 * LANES * 4 + (KC // 4) * 8 * LANES * 4)


def _resident(nxp: int, kmax: int = 0) -> bool:
    return nxp * LANES * 4 + _RING_BYTES <= RESIDENT_CAP_BYTES


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RoutedEll:
    """Routed-ELL operator: compact chunk arrays + static geometry.

    ``soff`` chunk rows hold ABSOLUTE x chunk indices in resident mode,
    span-relative indices (against ``sbase``) in streamed mode.
    """

    val4: jax.Array   # (NC, KC, 8, 128) float
    lidx4: jax.Array  # (NC, KC//4, 8, 128) int32 — 4 slots' lanes per word
    soff: jax.Array   # (NC, 128) int32 — x-chunk row per (slot, sublane)
    cbase: jax.Array  # (1, NBP) int32 — first chunk of block b
    kch: jax.Array    # (1, NBP) int32 — active chunk count of block b
    sbase: jax.Array  # (1, NBP) int32 — span base chunk per block
    n_rows: int = _static()
    n_cols: int = _static()
    span: int = _static()   # S: span chunks DMA'd per block (streamed mode)
    nxp: int = _static()    # padded x length in chunks
    nnz: int = _static()    # structural nonzeros (metrics)
    kmax: int = _static(default=KC)  # max slot capacity of any block
    resident: bool = _static(default=False)  # x fully VMEM-resident kernel
    ws: int = _static(default=1)  # window-share run: ws consecutive slots of
    # a sublane-group share one x-chunk, so the kernel builds each (8,128)
    # window stack once per ws takes (slices are the dominant slot cost)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def width(self) -> int:
        return self.kmax

    @property
    def dtype(self):
        return self.val4.dtype

    @property
    def n_blocks(self) -> int:
        return max(1, -(-self.n_rows // BLOCK_ROWS))


def _pad_to(x: int, q: int) -> int:
    return -(-x // q) * q


def plan_lidx_packed(plan: dict) -> np.ndarray:
    """Packed lane indices of a plan (native plans carry them packed)."""
    if "lidx4p" in plan:
        return plan["lidx4p"]
    return pack_lidx4(plan["lidx4"])


def _plan_native(m, s_min, n_rows, n_cols, nb, nbp, nc2, ws=1,
                 want_map=False):
    """Native OpenMP planner (csrc/native.cc) — bit-identical layout to the
    numpy path below, ~15× faster at PMIS-96³ scale; f32 values, packed
    lanes. Returns None to fall through to numpy (lib unavailable),
    "overflow" when the span cap is hit (plan impossible)."""
    from .. import native

    nat = native.routed_plan(m, s_min=s_min, s_cap=S_CAP, ws=ws)
    if nat is None or nat == "overflow":
        return nat
    sbase_b, bk, span, fill = nat
    kch_b = np.maximum(-(-bk.astype(np.int64) // KC), 1)
    nchunks = int(kch_b.sum())
    if nchunks > NC_CAP:
        return "overflow"
    cbase_b = np.concatenate([[0], np.cumsum(kch_b)[:-1]]).astype(np.int32)
    pos = None
    if want_map:
        val4, lidxp, soff, pos = fill(cbase_b, nchunks + DMA_PAD,
                                      want_map=True)
    else:
        val4, lidxp, soff = fill(cbase_b, nchunks + DMA_PAD)
    sbase = np.zeros((1, nbp), np.int32)
    sbase[0, :nb] = sbase_b
    cbase = np.zeros((1, nbp), np.int32)
    cbase[0, :nb] = cbase_b
    kch = np.zeros((1, nbp), np.int32)
    kch[0, :nb] = kch_b
    nxp = max(int(sbase_b.max(initial=0)) + span, nc2)
    out = dict(
        val4=val4, lidx4p=lidxp, soff=soff, cbase=cbase, kch=kch,
        sbase=sbase, n_rows=n_rows, n_cols=n_cols, span=span, nxp=nxp,
        nnz=m.nnz, kmax=int(kch_b.max()) * KC,
        eff=m.nnz / (nchunks * KC * BLOCK_ROWS), ws=ws,
    )
    if pos is not None:
        out["pos"] = pos
    return out


def plan_routed(m, dtype=np.float32, s_min: int = 0, ws: int = 1,
                want_map: bool = False):
    """Build compact routed-ELL plan arrays from a scipy sparse matrix.

    Returns a dict of plan arrays + stats, or None if the operator exceeds
    the format caps. ``s_min`` forces a minimum span so multiple plans
    (e.g. per-shard local windows) can share one static span. ``ws`` packs
    each (sublane-group, x-chunk) slot run ws-aligned so the kernel can
    share one window stack across ws takes (KC % ws == 0 required). f32
    plans run through the native OpenMP planner when built; other dtypes
    (and environments without the toolchain) use the vectorized-numpy twin
    — the layouts are bit-identical (tested)."""
    import scipy.sparse as sp

    if ws not in (1, 2, 4, 8, 16) or KC % ws:
        raise ValueError(f"ws={ws} must divide KC={KC}")
    m = sp.csr_matrix(m)
    m.sort_indices()
    n_rows, n_cols = m.shape
    nb = max(1, -(-n_rows // BLOCK_ROWS))
    if nb > NB_CAP:
        return None
    nbp = _pad_to(nb, LANES)
    nc2_early = max(1, -(-n_cols // LANES))

    if np.dtype(dtype) == np.float32 and m.nnz > 0:
        plan = _plan_native(m, s_min, n_rows, n_cols, nb, nbp, nc2_early,
                            ws=ws, want_map=want_map)
        if plan == "overflow":
            return None
        if plan is not None:
            return plan

    coo = m.tocoo()
    rows = coo.row.astype(np.int64)
    cols = coo.col.astype(np.int64)
    vals = coo.data
    nnz = len(rows)
    nc2 = max(1, -(-n_cols // LANES))

    if nnz == 0:
        S = max(_pad_to(max(s_min, 8), 8), 8)
        kch = np.zeros((1, nbp), np.int32)
        kch[0, :nb] = 1
        cbase = np.zeros((1, nbp), np.int32)
        cbase[0, :nb] = np.arange(nb)
        return dict(
            val4=np.zeros((nb + DMA_PAD, KC, 8, LANES), dtype),
            lidx4=np.zeros((nb + DMA_PAD, KC, 8, LANES), np.int32),
            soff=np.zeros((nb + DMA_PAD, LANES), np.int32),
            cbase=cbase, kch=kch,
            sbase=np.zeros((1, nbp), np.int32),
            n_rows=n_rows, n_cols=n_cols, span=S, nxp=max(S, nc2), nnz=0,
            kmax=KC, eff=0.0, ws=ws,
            **({"pos": np.zeros(0, np.int64)} if want_map else {}),
        )

    b = rows // BLOCK_ROWS
    s = (rows // LANES) % 8
    lane = (rows % LANES).astype(np.int64)
    chunk = cols // LANES
    lid = (cols % LANES).astype(np.int32)

    base = np.full(nb, np.iinfo(np.int64).max)
    np.minimum.at(base, b, chunk)
    base[base == np.iinfo(np.int64).max] = 0
    j = chunk - base[b]
    S = _pad_to(max(int(j.max()) + 1, s_min, 8), 8)
    if S > S_CAP:
        return None

    # ---- per-(block, sublane-group) slot packing --------------------------
    g = b * 8 + s
    order = np.lexsort((rows, j, g))
    g_o, j_o, r_o = g[order], j[order], rows[order]
    # runs of identical (g, j, row): occurrence index t within the run
    new_run = np.r_[True, (g_o[1:] != g_o[:-1]) | (j_o[1:] != j_o[:-1])
                    | (r_o[1:] != r_o[:-1])]
    run_starts = np.flatnonzero(new_run)
    run_len = np.diff(np.r_[run_starts, nnz])
    t = np.arange(nnz) - np.repeat(run_starts, run_len)
    # groups of identical (g, j): slot demand = max run length
    new_gj = np.r_[True, (g_o[1:] != g_o[:-1]) | (j_o[1:] != j_o[:-1])]
    gj_id = np.cumsum(new_gj) - 1
    gj_starts = np.flatnonzero(new_gj)
    n_gj = len(gj_starts)
    gj_of_run = gj_id[run_starts]
    m_gj = np.zeros(n_gj, np.int64)
    np.maximum.at(m_gj, gj_of_run, run_len)
    if ws > 1:
        # ws-aligned runs: the kernel reads soff once per ws slots, so every
        # (g, j) run is padded to a ws multiple (padding slots keep j with
        # val = 0 — "0·finite" reads, the usual routed invariant)
        m_gj = -(-m_gj // ws) * ws
    # slot base: exclusive cumsum of m_gj, reset at each new g
    csum = np.cumsum(m_gj)
    slot_base = csum - m_gj
    g_of_gj = g_o[gj_starts]
    new_g = np.r_[True, g_of_gj[1:] != g_of_gj[:-1]]
    g_grp = np.cumsum(new_g) - 1
    g_offset = slot_base[np.flatnonzero(new_g)][g_grp]
    slot_base -= g_offset
    k_per_g = (csum - g_offset)[np.r_[np.flatnonzero(new_g)[1:] - 1, n_gj - 1]]

    # per-BLOCK slot demand → active chunk counts and chunk bases
    bk = np.zeros(nb, np.int64)
    np.maximum.at(bk, g_of_gj[np.flatnonzero(new_g)] // 8, k_per_g)
    kch_b = np.maximum(-(-bk // KC), 1)
    nchunks = int(kch_b.sum())
    if nchunks > NC_CAP:
        return None
    cbase_b = np.concatenate([[0], np.cumsum(kch_b)[:-1]])
    kmax = int(kch_b.max()) * KC

    slot = slot_base[gj_id] + t  # per sorted nnz

    # ---- fill compact plan arrays (+DMA_PAD zero tail chunks) -----------
    b_o, s_o = g_o // 8, g_o % 8
    ci = cbase_b[b_o] + slot // KC     # chunk index per sorted nnz
    ks = slot % KC                     # slot-in-chunk
    val4 = np.zeros((nchunks + DMA_PAD, KC, 8, LANES), dtype)
    lidx4 = np.zeros((nchunks + DMA_PAD, KC, 8, LANES), np.int32)
    val4[ci, ks, s_o, lane[order]] = vals[order]
    lidx4[ci, ks, s_o, lane[order]] = lid[order]

    soff = np.zeros((nchunks + DMA_PAD, LANES), np.int32)
    # each gj group fills slots [slot_base, slot_base + m) of (b, s) with j
    rep_b = np.repeat(b_o[gj_starts], m_gj)
    rep_s = np.repeat(s_o[gj_starts], m_gj)
    rep_j = np.repeat(j_o[gj_starts], m_gj)
    seq = np.arange(int(m_gj.sum())) - np.repeat(csum - m_gj, m_gj)
    rep_k = np.repeat(slot_base, m_gj) + seq
    soff[cbase_b[rep_b] + rep_k // KC, (rep_k % KC) * 8 + rep_s] = rep_j

    sbase = np.zeros((1, nbp), np.int32)
    sbase[0, :nb] = base
    cbase = np.zeros((1, nbp), np.int32)
    cbase[0, :nb] = cbase_b
    kch = np.zeros((1, nbp), np.int32)
    kch[0, :nb] = kch_b
    nxp = max(int(base.max()) + S, nc2)

    out = dict(
        val4=val4, lidx4=lidx4, soff=soff, cbase=cbase, kch=kch,
        sbase=sbase, n_rows=n_rows, n_cols=n_cols, span=S, nxp=nxp,
        nnz=nnz, kmax=kmax, eff=nnz / (nchunks * KC * BLOCK_ROWS), ws=ws,
    )
    if want_map:
        # value-refresh scatter map: flat val4 index of CSR entry p
        # (m.tocoo() of the sorted CSR walks entries in CSR order)
        flat = ((ci * KC + ks) * 8 + s_o) * LANES + lane[order]
        pos = np.empty(nnz, np.int64)
        pos[order] = flat
        out["pos"] = pos
    return out


def pack_lidx4(lidx4: np.ndarray) -> np.ndarray:
    """(NC, KC, 8, 128) int32 lane indices → (NC, KC//4, 8, 128) int32 with
    4 slots' 7-bit lanes packed per word (¼ the plan bytes: less relay
    upload AND less HBM streaming in the kernel's hot loop)."""
    nc, K = lidx4.shape[:2]
    if K % 4:
        pad = np.zeros((nc, 4 - K % 4, 8, LANES), lidx4.dtype)
        lidx4 = np.concatenate([lidx4, pad], axis=1)
        K = lidx4.shape[1]
    l = lidx4.reshape(nc, K // 4, 4, 8, LANES).astype(np.uint32)
    packed = (l[:, :, 0] | (l[:, :, 1] << np.uint32(8))
              | (l[:, :, 2] << np.uint32(16))
              | (l[:, :, 3] << np.uint32(24)))
    return packed.astype(np.int32)


def unpack_lidx4(packed: np.ndarray, K: int) -> np.ndarray:
    nc = packed.shape[0]
    p = packed.view(np.uint32) if packed.dtype == np.int32 \
        else packed.astype(np.uint32)
    out = np.empty((nc, K, 8, LANES), np.int32)
    for j in range(4):
        out[:, j::4] = ((p >> np.uint32(8 * j)) & np.uint32(0x7F)
                        ).astype(np.int32)
    return out


def absolute_soff(plan: dict) -> np.ndarray:
    """Resident-mode soff: x-chunk rows made absolute (span base folded in
    per chunk's owning block). Real blocks always have kch ≥ 1, so the
    per-chunk owner map is a plain repeat over the leading blocks."""
    kch_b = plan["kch"][0]
    nb = int(np.max(np.nonzero(kch_b)[0])) + 1
    blk_of_chunk = np.repeat(np.arange(nb), kch_b[:nb])
    pad = plan["soff"].shape[0] - len(blk_of_chunk)
    if pad:  # DMA_PAD tail chunks (all-zero) fold in block 0's base
        blk_of_chunk = np.r_[blk_of_chunk, np.zeros(pad, np.int64)]
    return plan["soff"] + plan["sbase"][0, blk_of_chunk, None]


def auto_ws(m) -> int:
    """Window-share run length for an operator (chip-calibrated, round 4).

    ws > 1 shares one window stack across ws takes at the price of the slot
    inflation F(ws) (scripts/analyze_wshare.py: A[1]@96³ F(2)=1.12,
    F(4)=1.38). The chip sweep (scripts/bench_ws_sweep.py) measured the
    kernel DMA/take-bound, NOT slice-bound — with the v4 grouped-DMA kernel
    every ws > 1 lost to its own inflation (A[1]: 6.6 → 6.1 → 5.95 Gnnz/s
    at ws 1/2/4). ws = 1 is the calibrated answer; the machinery stays for
    operators whose F(ws) ≈ 1 (none among the PMIS family measured)."""
    return 1


def routed_from_scipy(m, dtype=jnp.float32, put=None, ws: int | None = None,
                      map_out: dict | None = None):
    """scipy sparse → RoutedEll device operator (None if uneconomical).

    ``put`` overrides the host→device transfer (e.g. a
    ``DeferredUpload.add`` to batch all plan arrays of a hierarchy into
    one relay transfer — see utils/pack.py). Compact chunk arrays are
    ~50–80% dense, so they ship as plain dense parts (the round-2 sparse
    scatter-fill path is no longer a win). ``ws`` selects the window-share
    run length (None = auto per operator shape). ``map_out`` (a dict, when
    given) receives the value-refresh scatter map: ``pos`` (flat val4
    index per CSR entry) and the val4 shape — see amg/refresh.py."""
    if ws is None:
        ws = auto_ws(m)
    if put is None:
        put = jnp.asarray
    # feature-detect the batched-upload sparse path (DeferredUpload.add):
    # low-efficiency plan chunks (restrictions pack at ~0.17) still win
    # with scatter-fill shipping; add() itself falls back to dense unless
    # the sparse encoding is ≥2× smaller per array.
    import inspect

    try:
        sparse_ok = "sparse" in inspect.signature(put).parameters
    except (TypeError, ValueError):
        sparse_ok = False
    sput = (lambda a: put(a, sparse=True)) if sparse_ok else put
    try:
        np_dt = np.dtype(jnp.dtype(dtype).name)
    except TypeError:
        np_dt = np.float32
    if np_dt not in (np.float32, np.float64):
        # bf16 (and friends): PLAN with the fast native f32 path and cast
        # val4 at put time — the half-width values halve plan HBM and DMA
        # bytes (used for P/R transfer operators at 256³ scale, where the
        # full-f32 plan set exceeds the chip's 16 GB). The numpy planner
        # in an ml_dtypes dtype ran ~20× slower (software arithmetic).
        np_dt = np.float32
    plan = plan_routed(m, dtype=np_dt, ws=ws, want_map=map_out is not None)
    if plan is None:
        return None
    if map_out is not None:
        map_out["pos"] = plan["pos"]
        map_out["val4_shape"] = plan["val4"].shape
    soff = plan["soff"]
    resident = _resident(plan["nxp"], plan["kmax"])
    if resident:
        soff = absolute_soff(plan)
    val4_h = plan["val4"]
    if jnp.dtype(dtype) != val4_h.dtype:
        if jnp.dtype(dtype) == jnp.bfloat16 and val4_h.dtype == np.float32:
            # round-to-nearest-even repack (native OpenMP; numpy uint
            # fallback) — the ml_dtypes elementwise cast of a multi-GB
            # val4 ran at ~10 MB/s (219 s in the 256³ L0 operator form)
            from .. import native

            packed = native.bf16_round_pack(val4_h)
            if packed is None:
                import ml_dtypes

                b = val4_h.view(np.uint32)
                rnd = ((b >> np.uint32(16)) & np.uint32(1)) \
                    + np.uint32(0x7FFF)
                packed = ((b + rnd) >> np.uint32(16)).astype(
                    np.uint16).view(ml_dtypes.bfloat16)
            val4_h = packed
        else:
            val4_h = np.asarray(val4_h, jnp.dtype(dtype))
    # paired val4+lidx upload (utils/pack.add_routed): when val4 ships
    # sparse, the packed-lidx plan array is derived ON DEVICE from a
    # 1 B/nnz lane stream riding val4's index stream — the lidx words
    # never cross the host→device boundary (round-5 transfer cut)
    add_routed = getattr(getattr(put, "__self__", None), "add_routed", None)
    if add_routed is not None and sparse_ok:
        val4_d, lidx4_d = add_routed(val4_h, plan_lidx_packed(plan), KC)
    else:
        val4_d, lidx4_d = sput(val4_h), sput(plan_lidx_packed(plan))
    return RoutedEll(
        val4=val4_d,
        lidx4=lidx4_d,
        soff=put(np.ascontiguousarray(soff)),
        cbase=put(plan["cbase"]),
        kch=put(plan["kch"]),
        sbase=put(plan["sbase"]),
        n_rows=plan["n_rows"], n_cols=plan["n_cols"],
        span=plan["span"], nxp=plan["nxp"], nnz=plan["nnz"],
        kmax=plan["kmax"], resident=resident, ws=plan.get("ws", 1),
    )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SplitRoutedEll:
    """Column-split composition of routed plans (cap-overflow fallback,
    VERDICT r3 #8). When a single plan would exceed the span/chunk caps
    (e.g. one row-block touching columns > S_CAP·128 apart), the operator
    is split by COLUMN RANGES into parts that each plan cleanly:
    y = Σ_k A[:, b_k:b_{k+1}] · x[b_k:b_{k+1}]. Every part runs the full
    Pallas routed kernel, so a cap-exceeding operator keeps TPU-speed SpMV
    instead of falling to the ~0.1 Gelem/s XLA gather path. The static
    per-part slice of x and the adds fuse under jit."""

    parts: Tuple[RoutedEll, ...]
    bounds: Tuple[int, ...] = _static()   # len(parts)+1 column offsets
    n_rows: int = _static()
    n_cols: int = _static()
    nnz: int = _static()

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.parts[0].dtype


def spmv_split(a: SplitRoutedEll, x: jax.Array) -> jax.Array:
    from ..ops.spmv import spmv

    y = None
    for part, b0 in zip(a.parts, a.bounds[:-1]):
        yi = spmv(part, jax.lax.slice(x, (b0,), (b0 + part.n_cols,)))
        y = yi if y is None else y + yi
    return y


def routed_split_from_scipy(m, dtype=jnp.float32, put=None,
                            ws: int | None = None, max_parts: int = 16):
    """Column-split routed plan for a cap-exceeding operator.

    Doubles the part count (column ranges, 128-aligned) until every part
    plans under the caps; returns ``SplitRoutedEll`` or None when even
    ``max_parts`` parts cannot plan (caller falls back + warns)."""
    import scipy.sparse as sp

    m = sp.csr_matrix(m)
    n_rows, n_cols = m.shape
    mc = None
    n_parts = 2
    while n_parts <= max_parts:
        k = -(-n_cols // n_parts)
        k = _pad_to(max(k, LANES), LANES)
        bounds = tuple(min(i * k, n_cols) for i in range(n_parts + 1))
        if len(set(bounds)) != n_parts + 1:
            return None   # more parts than 128-wide column groups
        if mc is None:
            mc = m.tocsc()
        parts = []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            sub = mc[:, b0:b1].tocsr()
            rt = routed_from_scipy(sub, dtype=dtype, put=put, ws=ws)
            if rt is None:
                parts = None
                break
            parts.append(rt)
        if parts is not None:
            return SplitRoutedEll(parts=tuple(parts), bounds=bounds,
                                  n_rows=n_rows, n_cols=n_cols, nnz=m.nnz)
        n_parts *= 2
    return None


def routed_to_scipy(a: RoutedEll):
    """Exact inverse of the plan (tests / interop)."""
    import scipy.sparse as sp

    val4 = np.asarray(a.val4, np.float64)
    lidx4 = unpack_lidx4(np.asarray(a.lidx4), val4.shape[1]).astype(np.int64)
    soff = np.asarray(a.soff)
    sbase = np.asarray(a.sbase)
    nb = a.n_blocks
    kch = np.asarray(a.kch)[0, :nb]
    cbase = np.asarray(a.cbase)[0, :nb]
    # chunk → owning block (chunks may be shared only as all-zero fillers)
    blk_of_chunk = np.full(val4.shape[0], -1, np.int64)
    for bi in range(nb):
        blk_of_chunk[cbase[bi]:cbase[bi] + kch[bi]] = bi
    ci, ki, si, li = np.nonzero(val4)
    blk = blk_of_chunk[ci]
    rows = blk * BLOCK_ROWS + si * LANES + li
    srow = soff[ci, ki * 8 + si].astype(np.int64)
    if not a.resident:   # streamed mode: soff is span-relative
        srow = srow + sbase[0, blk].astype(np.int64)
    cols = srow * LANES + lidx4[ci, ki, si, li]
    vals = val4[ci, ki, si, li]
    return sp.csr_matrix((vals, (rows, cols)), shape=(a.n_rows, a.n_cols))
