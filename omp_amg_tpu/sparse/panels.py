"""Panel-SpMM plans: sparse × dense-128-panel products for the MXU.

Parity: the reference's SpGEMM/SpMM layer (SURVEY.md §2 #3; reference
unreadable, behavior from the BASELINE.json north-star "two-phase
symbolic+numeric SpGEMM"). This is the *device numeric* half for general
sparsity: the colored-probing RAP (ops/probe_rap.py) evaluates
U = A·X with X an (n, 128) color-indicator panel, so every sparse×sparse
product becomes sparse×dense work the MXU executes as one-hot matmuls
(ops/pallas_spmm.py).

Layout. Output rows are tiled into 128-lane blocks (row r → block r//128,
lane r%128). X is viewed transposed in chunk-major panel form
``Xt[j, c, m] = X[j*128 + m, c]`` (one (C, 128) window per x-chunk j,
contiguous in HBM) so a kernel window load is a plain dynamic slice. For
each block the planner picks a contiguous chunk span [base, base+S); each
of K slots holds one span chunk ``soff[k]`` plus per-lane lane indices and
values:

    U[block, :, lane] += val[k, lane] * Xt[base + soff[k], :, lidx[k, lane]]

executed as (C,128) @ one-hot(128,128) MXU matmuls — see pallas_spmm.
Packing groups a block's nonzeros by span chunk; a chunk whose per-row
multiplicity is m occupies m slots. K = max per-block slot total.

The planner is pure vectorized numpy and runs once per operator in the
amortized host setup phase (SURVEY.md §4.2).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128

# Kernel slot-loop shape (ops/pallas_spmm.py): K is padded to a multiple of
# CHUNK_U above UNROLL_K so the fori_loop body can hand-unroll; above K_BLK
# the grid gains a K-chunk dimension (VMEM per step stays bounded).
UNROLL_K = 16
CHUNK_U = 4
K_BLK = 32

S_CAP = 1024    # span chunks; window buffer is RING * S * C * 128 * bytes
K_CAP = 4096
NB_CAP = 65536


def _pad_to(x: int, q: int) -> int:
    return -(-x // q) * q


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PanelPlan:
    """Sparse operand of a panel SpMM: plan arrays + static geometry."""

    val: jax.Array    # (nb, K, 128) float32 — value per (slot, lane)
    lidx: jax.Array   # (nb, K, 128) int32 — lane within the span chunk
    soff: jax.Array   # (nb, nkb, P) int32 — span chunk per slot (SMEM),
                      # laid out per K-chunk: slot k at [b, k//kb, k%kb]
    sbase: jax.Array  # (1, NBP) int32 — span base chunk per block
    n_rows: int = _static()
    n_cols: int = _static()
    span: int = _static()   # S: chunks DMA'd per block
    nxp: int = _static()    # padded x length in chunks
    nnz: int = _static()

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)


def plan_panel_spmm(m, dtype=np.float32):
    """Build panel-SpMM plan arrays (numpy) from a scipy sparse matrix.

    Returns a dict of plan arrays + stats, or None when the operator
    exceeds the format caps (caller falls back to the XLA path).
    """
    import scipy.sparse as sp

    m = sp.csr_matrix(m)
    m.sort_indices()
    n_rows, n_cols = m.shape
    nb = max(1, -(-n_rows // LANES))
    if nb > NB_CAP:
        return None

    coo = m.tocoo()
    rows = coo.row.astype(np.int64)
    cols = coo.col.astype(np.int64)
    vals = coo.data
    nnz = len(rows)
    nc2 = max(1, -(-n_cols // LANES))

    if nnz == 0:
        K, S = 1, 8
        return dict(
            val=np.zeros((nb, K, LANES), dtype),
            lidx=np.zeros((nb, K, LANES), np.int32),
            soff=np.zeros((nb, 1, _pad_to(K, LANES)), np.int32),
            sbase=np.zeros((1, _pad_to(nb, LANES)), np.int32),
            n_rows=n_rows, n_cols=n_cols, span=S, nxp=max(S, nc2), nnz=0,
            K=K, eff=0.0,
        )

    b = rows // LANES
    lane = (rows % LANES).astype(np.int64)
    chunk = cols // LANES
    lid = (cols % LANES).astype(np.int32)

    base = np.full(nb, np.iinfo(np.int64).max)
    np.minimum.at(base, b, chunk)
    base[base == np.iinfo(np.int64).max] = 0
    j = chunk - base[b]
    S = int(j.max()) + 1
    if S > S_CAP:
        return None

    # ---- per-block slot packing (group nonzeros by span chunk) ------------
    order = np.lexsort((rows, j, b))
    b_o, j_o, r_o = b[order], j[order], rows[order]
    new_run = np.r_[True, (b_o[1:] != b_o[:-1]) | (j_o[1:] != j_o[:-1])
                    | (r_o[1:] != r_o[:-1])]
    run_starts = np.flatnonzero(new_run)
    run_len = np.diff(np.r_[run_starts, nnz])
    t = np.arange(nnz) - np.repeat(run_starts, run_len)
    new_gj = np.r_[True, (b_o[1:] != b_o[:-1]) | (j_o[1:] != j_o[:-1])]
    gj_id = np.cumsum(new_gj) - 1
    gj_starts = np.flatnonzero(new_gj)
    n_gj = len(gj_starts)
    gj_of_run = gj_id[run_starts]
    m_gj = np.zeros(n_gj, np.int64)
    np.maximum.at(m_gj, gj_of_run, run_len)
    csum = np.cumsum(m_gj)
    slot_base = csum - m_gj
    g_of_gj = b_o[gj_starts]
    new_g = np.r_[True, g_of_gj[1:] != g_of_gj[:-1]]
    g_grp = np.cumsum(new_g) - 1
    g_offset = slot_base[np.flatnonzero(new_g)][g_grp]
    slot_base -= g_offset
    k_per_g = (csum - g_offset)[np.r_[np.flatnonzero(new_g)[1:] - 1, n_gj - 1]]
    K = int(k_per_g.max())
    if K > UNROLL_K:
        K = _pad_to(K, CHUNK_U)
    if K > K_BLK:
        K = _pad_to(K, K_BLK)
    if K > K_CAP:
        return None
    kb_slots = min(K, K_BLK)
    nkb = K // kb_slots

    slot = slot_base[gj_id] + t

    # ---- fill plan arrays -------------------------------------------------
    val = np.zeros((nb, K, LANES), dtype)
    lidx = np.zeros((nb, K, LANES), np.int32)
    val[b_o, slot, lane[order]] = vals[order]
    lidx[b_o, slot, lane[order]] = lid[order]

    P = _pad_to(kb_slots, LANES)
    soff = np.zeros((nb, nkb, P), np.int32)
    rep_b = np.repeat(b_o[gj_starts], m_gj)
    rep_j = np.repeat(j_o[gj_starts], m_gj)
    seq = np.arange(int(m_gj.sum())) - np.repeat(csum - m_gj, m_gj)
    rep_k = np.repeat(slot_base, m_gj) + seq
    soff[rep_b, rep_k // kb_slots, rep_k % kb_slots] = rep_j

    sbase = np.zeros((1, _pad_to(nb, LANES)), np.int32)
    sbase[0, :nb] = base
    nxp = max(int(base.max()) + S, nc2)

    # per-block actual chunk extent + slot count (multi-group scheduling
    # and K-chunk early exit in the v2 kernel)
    hi = np.zeros(nb, np.int64)
    np.maximum.at(hi, b, chunk + 1)
    kact = np.zeros(nb, np.int64)
    g_ids = np.flatnonzero(new_g)
    kact[b_o[gj_starts[g_ids]]] = k_per_g

    return dict(
        val=val, lidx=lidx, soff=soff, sbase=sbase,
        n_rows=n_rows, n_cols=n_cols, span=S, nxp=nxp, nnz=nnz,
        K=K, eff=nnz / (nb * K * LANES),
        block_hi=hi, block_kact=kact,
    )


def panel_plan_from_scipy(m, dtype=jnp.float32):
    """scipy sparse → PanelPlan device operand (None if uneconomical)."""
    plan = plan_panel_spmm(m, dtype=np.float64)
    if plan is None:
        return None
    return panel_plan_from_dict(plan, dtype)


def panel_plan_from_dict(plan: dict, dtype=jnp.float32):
    return PanelPlan(
        val=jnp.asarray(plan["val"], dtype=dtype),
        lidx=jnp.asarray(plan["lidx"]),
        soff=jnp.asarray(plan["soff"]),
        sbase=jnp.asarray(plan["sbase"]),
        n_rows=plan["n_rows"], n_cols=plan["n_cols"],
        span=plan["span"], nxp=plan["nxp"], nnz=plan["nnz"],
    )


def panel_plan_to_scipy(p: PanelPlan):
    """Exact inverse of the plan (tests / interop)."""
    import scipy.sparse as sp

    val = np.asarray(p.val, np.float64)
    lidx = np.asarray(p.lidx, np.int64)
    soff = np.asarray(p.soff)
    sbase = np.asarray(p.sbase)
    nb, K = val.shape[:2]
    kb_slots = K // soff.shape[1]
    bi, ki, li = np.nonzero(val)
    rows = bi * LANES + li
    srow = soff[bi, ki // kb_slots, ki % kb_slots].astype(np.int64)
    cols = (srow + sbase[0, bi]) * LANES + lidx[bi, ki, li]
    return sp.csr_matrix((val[bi, ki, li], (rows, cols)),
                         shape=(p.n_rows, p.n_cols))


def pack_panels(x: jax.Array, nxp: int) -> jax.Array:
    """(n, C) panel → chunk-major (nxp * C, 128) kernel window layout."""
    n, C = x.shape
    pad = nxp * LANES - n
    xp = jnp.concatenate([x, jnp.zeros((pad, C), x.dtype)], axis=0)
    # (nxp, 128, C) -> (nxp, C, 128) -> (nxp * C, 128)
    return xp.reshape(nxp, LANES, C).transpose(0, 2, 1).reshape(nxp * C, LANES)


def unpack_panels(ut: jax.Array, n_rows: int, C: int) -> jax.Array:
    """Kernel output (nb * C, 128) → (n_rows, C)."""
    nb = ut.shape[0] // C
    x = ut.reshape(nb, C, LANES).transpose(0, 2, 1).reshape(nb * LANES, C)
    return x[:n_rows]
