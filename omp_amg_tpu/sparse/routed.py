"""Routed-ELL: the TPU-fast general-sparsity SpMV format (host planner).

Parity: the reference's general CSR SpMV (SURVEY.md §2 #2, §4.5 — reference
unreadable, behavior from BASELINE.json north-star). The XLA gather
formulation runs at ~0.1 Gelem/s on this chip (BASELINE.md), which made PMIS
(unstructured) hierarchies solve at XLA-gather speed. This format routes
every nonzero through the two primitives Mosaic executes at full VPU speed
(measured 2026-08-18, scripts/probe_span_slice.py: 18.7–19.3 Gnnz/s padded,
exact):

- a per-(slot, sublane) *dynamic sublane slice* of a VMEM ``span`` buffer
  (one contiguous slab of x chunks DMA'd per 1024-row block), and
- ``jnp.take_along_axis(win, lidx, axis=1)`` at width exactly 128 (the only
  gather Mosaic supports).

Layout. Rows are tiled into blocks of 1024 = 8 sublane groups × 128 lanes
(row r → block r//1024, sublane (r//128)%8, lane r%128). x is viewed as
128-wide *chunks*. For each block the planner picks one contiguous chunk
span [base, base+S) covering every column the block touches (measured:
S ≤ ~160 chunks on all PMIS hierarchy operators — stencil lineage keeps
column locality even though *diagonal* locality is poor). Each of K slots
holds, per sublane s, one span row ``soff[k,s]`` plus per-lane lane indices
and values:

    y[s, l] += val4[k, s, l] * span[soff[k, s], lidx4[k, s, l]]

Packing (per block, per sublane group): nonzeros grouped by span row j; a
group with max-per-row multiplicity m occupies m slots; K = max over
(block, group) of the per-group slot total. Per-sublane packing is what
keeps K near the ELL width for interpolation/restriction operators (the
block-wide alternative wasted 8–30×).

Planner is pure vectorized numpy, runs once per operator in the amortized
setup phase. Returns None when the operator violates the caps (caller falls
back to the XLA ELL path).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
BLOCK_ROWS = 8 * LANES  # 1024

# Kernel slot-loop shape (ops/pallas_routed.py): ≤ UNROLL_K slots unroll
# fully; above that the kernel runs a fori_loop over CHUNK_U-slot chunks, so
# the planner pads K to a multiple of CHUNK_U (padding slots are val=0,
# soff=0 — exact and in-bounds). Above K_BLK slots the kernel grid gains a
# second dimension: each step covers K_BLK slots and accumulates into the
# output block, so VMEM per step and compile size stay bounded at any K
# (K is then padded to a multiple of K_BLK; soff is laid out per K-chunk).
UNROLL_K = 32
CHUNK_U = 8
K_BLK = 64

# Caps: beyond these the plan would strain SMEM/HBM — fall back to XLA.
S_CAP = 2048     # span chunks (2 × S × 512 B of VMEM scratch)
K_CAP = 4096     # slots (plan arrays are nb × K × 8 KB of HBM)
NB_CAP = 8192    # blocks (sbase lives fully in SMEM)

# Resident mode: when padded x plus the pipelined plan blocks fit VMEM
# (~16 MB/core), keep the WHOLE x in VMEM for the kernel's duration and
# index span rows absolutely — no per-block span DMA at all. The streamed
# (per-block span DMA) variant was measured DMA-latency-bound at ~5.5 µs
# per 1024-row block; resident removes that entirely.
RESIDENT_CAP_BYTES = 12 << 20


def _resident(nxp: int, K: int) -> bool:
    x_bytes = nxp * LANES * 4
    kb = min(K, K_BLK)  # val4+lidx4 pipeline one K-chunk per grid step
    plan_bytes = 2 * 2 * kb * 8 * LANES * 8  # two operands, double-buffered
    return x_bytes + plan_bytes <= RESIDENT_CAP_BYTES


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RoutedEll:
    """Routed-ELL operator: plan arrays + static geometry.

    ``soff`` packs the per-slot sublane span rows as (nb, 1, pad128(8K))
    int32 (SMEM-resident in the kernel); ``sbase`` is the per-block span
    base chunk as (1, pad128(nb)) int32 (fully SMEM-resident so block i can
    prefetch block i+1's span).
    """

    val4: jax.Array   # (nb, K, 8, 128) float
    lidx4: jax.Array  # (nb, K//4, 8, 128) int32 — 4 slots' lanes packed
                      # per word (see pack_lidx4)
    soff: jax.Array   # (nb, nkb, P) int32 — span row per (slot, sublane),
                      # laid out per K-chunk of kb_slots = K // nkb: slot k
                      # lives at [b, k // kb_slots, (k % kb_slots)*8 + s];
                      # ABSOLUTE x chunk in resident mode, else span-relative
    sbase: jax.Array  # (1, NBP) int32 — span base chunk per block
    n_rows: int = _static()
    n_cols: int = _static()
    span: int = _static()   # S: span chunks DMA'd per block (streamed mode)
    nxp: int = _static()    # padded x length in chunks
    nnz: int = _static()    # structural nonzeros (metrics)
    resident: bool = _static(default=False)  # x fully VMEM-resident kernel
    kact: object = None  # (1, NBP) int32 — per-block ACTIVE K-chunk count
                         # (resident kernel skips all-padding K-chunks:
                         # low-eff plans pad K to the worst block's demand)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def width(self) -> int:
        return self.val4.shape[1]

    @property
    def dtype(self):
        return self.val4.dtype


def _pad_to(x: int, q: int) -> int:
    return -(-x // q) * q


def plan_routed(m, dtype=np.float32, k_min: int = 0, s_min: int = 0):
    """Build routed-ELL plan arrays (numpy) from a scipy sparse matrix.

    Returns a dict of plan arrays + stats, or None if the operator exceeds
    the format caps. ``k_min``/``s_min`` force minimum K/span so multiple
    plans (e.g. per-shard local windows) can share one static layout.
    """
    import scipy.sparse as sp

    m = sp.csr_matrix(m)
    m.sort_indices()
    n_rows, n_cols = m.shape
    nb = max(1, -(-n_rows // BLOCK_ROWS))
    if nb > NB_CAP:
        return None

    coo = m.tocoo()
    rows = coo.row.astype(np.int64)
    cols = coo.col.astype(np.int64)
    vals = coo.data
    nnz = len(rows)
    nc2 = max(1, -(-n_cols // LANES))

    if nnz == 0:
        K, S = 4, 8
        return dict(
            val4=np.zeros((nb, K, 8, LANES), dtype),
            lidx4=np.zeros((nb, K, 8, LANES), np.int32),
            soff=np.zeros((nb, 1, _pad_to(8 * K, LANES)), np.int32),
            sbase=np.zeros((1, _pad_to(nb, LANES)), np.int32),
            kact_kb=np.ones((1, _pad_to(nb, LANES)), np.int32),
            n_rows=n_rows, n_cols=n_cols, span=S, nxp=max(S, nc2), nnz=0,
            K=K, eff=0.0,
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
    S = _pad_to(max(int(j.max()) + 1, s_min), 8)
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
    # slot base: exclusive cumsum of m_gj, reset at each new g
    csum = np.cumsum(m_gj)
    slot_base = csum - m_gj
    g_of_gj = g_o[gj_starts]
    new_g = np.r_[True, g_of_gj[1:] != g_of_gj[:-1]]
    g_grp = np.cumsum(new_g) - 1
    g_offset = slot_base[np.flatnonzero(new_g)][g_grp]
    slot_base -= g_offset
    k_per_g = (csum - g_offset)[np.r_[np.flatnonzero(new_g)[1:] - 1, n_gj - 1]]
    K = max(int(k_per_g.max()), int(k_min))
    K = _pad_to(K, 4)   # lidx4 lane indices pack 4-per-int32 word
    if K > UNROLL_K:
        K = _pad_to(K, CHUNK_U)
    if K > K_BLK:
        K = _pad_to(K, K_BLK)
    if K > K_CAP:
        return None
    kb_slots = min(K, K_BLK)
    nkb = K // kb_slots
    # per-BLOCK slot demand → active K-chunk count (kernel early-exit)
    bk = np.zeros(nb, np.int64)
    np.maximum.at(bk, g_of_gj[np.flatnonzero(new_g)] // 8, k_per_g)
    kact_kb = np.zeros((1, _pad_to(nb, LANES)), np.int32)
    kact_kb[0, :nb] = np.clip(-(-bk // kb_slots), 1, nkb)

    slot = slot_base[gj_id] + t  # per sorted nnz

    # ---- fill plan arrays -------------------------------------------------
    b_o, s_o = g_o // 8, g_o % 8
    val4 = np.zeros((nb, K, 8, LANES), dtype)
    lidx4 = np.zeros((nb, K, 8, LANES), np.int32)
    val4[b_o, slot, s_o, lane[order]] = vals[order]
    lidx4[b_o, slot, s_o, lane[order]] = lid[order]

    P = _pad_to(8 * kb_slots, LANES)
    soff = np.zeros((nb, nkb, P), np.int32)
    # each gj group fills slots [slot_base, slot_base + m) of (b, s) with j
    rep_b = np.repeat(b_o[gj_starts], m_gj)
    rep_s = np.repeat(s_o[gj_starts], m_gj)
    rep_j = np.repeat(j_o[gj_starts], m_gj)
    seq = np.arange(int(m_gj.sum())) - np.repeat(csum - m_gj, m_gj)
    rep_k = np.repeat(slot_base, m_gj) + seq
    soff[rep_b, rep_k // kb_slots, (rep_k % kb_slots) * 8 + rep_s] = rep_j

    sbase = np.zeros((1, _pad_to(nb, LANES)), np.int32)
    sbase[0, :nb] = base
    nxp = max(int(base.max()) + S, nc2)

    return dict(
        val4=val4, lidx4=lidx4, soff=soff, sbase=sbase, kact_kb=kact_kb,
        n_rows=n_rows, n_cols=n_cols, span=S, nxp=nxp, nnz=nnz,
        K=K, eff=nnz / (nb * K * BLOCK_ROWS),
    )


def pack_lidx4(lidx4: np.ndarray) -> np.ndarray:
    """(nb, K, 8, 128) int32 lane indices → (nb, K//4, 8, 128) int32 with
    4 slots' 7-bit lanes packed per word (5/8 the plan bytes: less relay
    upload AND less HBM streaming in the kernel's hot loop)."""
    nb, K = lidx4.shape[:2]
    if K % 4:
        pad = np.zeros((nb, 4 - K % 4, 8, LANES), lidx4.dtype)
        lidx4 = np.concatenate([lidx4, pad], axis=1)
        K = lidx4.shape[1]
    l = lidx4.reshape(nb, K // 4, 4, 8, LANES).astype(np.uint32)
    packed = (l[:, :, 0] | (l[:, :, 1] << np.uint32(8))
              | (l[:, :, 2] << np.uint32(16))
              | (l[:, :, 3] << np.uint32(24)))
    return packed.astype(np.int32)


def unpack_lidx4(packed: np.ndarray, K: int) -> np.ndarray:
    nb = packed.shape[0]
    p = packed.view(np.uint32) if packed.dtype == np.int32         else packed.astype(np.uint32)
    out = np.empty((nb, K, 8, LANES), np.int32)
    for j in range(4):
        out[:, j::4] = ((p >> np.uint32(8 * j)) & np.uint32(0x7F)
                        ).astype(np.int32)
    return out


def routed_from_scipy(m, dtype=jnp.float32, put=None):
    """scipy sparse → RoutedEll device operator (None if uneconomical).

    ``put`` overrides the host→device transfer (e.g. a
    ``DeferredUpload.add`` to batch all plan arrays of a hierarchy into
    one relay transfer — see utils/pack.py).
    """
    if put is None:
        put = jnp.asarray
    plan = plan_routed(m, dtype=np.float64)
    if plan is None:
        return None
    nb = plan["val4"].shape[0]
    K = plan["val4"].shape[1]
    soff = plan["soff"]
    resident = _resident(plan["nxp"], K)
    if resident:
        # absolute x chunk per (slot, sublane); padded tail stays in-bounds
        soff = soff + plan["sbase"][0, :nb, None, None]
    def sput(a):   # plans pack at ~0.1 eff: ship nonzeros only when
        try:           # the put supports the sparse (scatter-fill) path
            return put(a, sparse=True)
        except TypeError:
            return put(a)

    return RoutedEll(
        val4=sput(np.asarray(plan["val4"], jnp.dtype(dtype))),
        lidx4=sput(pack_lidx4(plan["lidx4"])),
        soff=sput(np.ascontiguousarray(soff)),
        sbase=put(plan["sbase"]),
        kact=put(plan["kact_kb"]),
        n_rows=plan["n_rows"], n_cols=plan["n_cols"],
        span=plan["span"], nxp=plan["nxp"], nnz=plan["nnz"],
        resident=resident,
    )


def routed_to_scipy(a: RoutedEll):
    """Exact inverse of the plan (tests / interop)."""
    import scipy.sparse as sp

    val4 = np.asarray(a.val4, np.float64)
    lidx4 = unpack_lidx4(np.asarray(a.lidx4), val4.shape[1]).astype(np.int64)
    soff = np.asarray(a.soff)
    sbase = np.asarray(a.sbase)
    nb, K = val4.shape[:2]
    bi, ki, si, li = np.nonzero(val4)
    rows = bi * BLOCK_ROWS + si * LANES + li
    kb_slots = K // soff.shape[1]
    srow = soff[bi, ki // kb_slots,
                (ki % kb_slots) * 8 + si].astype(np.int64)
    if not a.resident:   # streamed mode: soff is span-relative
        srow = srow + sbase[0, bi].astype(np.int64)
    cols = srow * LANES + lidx4[bi, ki, si, li]
    vals = val4[bi, ki, si, li]
    return sp.csr_matrix((vals, (rows, cols)), shape=(a.n_rows, a.n_cols))
