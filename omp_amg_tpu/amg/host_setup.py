"""Vectorized numpy setup kernels (host path of the two-flavor setup).

``amg_setup`` is host-orchestrated either way (SURVEY.md §7); the *component
kernels* (strength/PMIS/interpolation) come in two equivalent flavors:

- device (:mod:`strength`, :mod:`pmis`, :mod:`interp`): jitted jnp — used
  when the setup should stay resident on the accelerator;
- host (this module): vectorized numpy with *gather-only* PMIS rounds over a
  pre-symmetrized adjacency — no scatter ops in the loop, so it runs at
  memcpy-ish speed on the host CPU and avoids per-level XLA compiles
  entirely (the dominant setup cost through the remote-TPU relay).

Both flavors implement bit-identical algorithms (hash01 weights, exact
lexicographic tie-breaks); ``tests/test_host_setup.py`` asserts equality.
"""

from __future__ import annotations

import numpy as np

UNDECIDED, CPOINT, FPOINT = 0, 1, 2


def hash01_np(idx) -> np.ndarray:
    x = np.asarray(idx, dtype=np.uint32)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint32(16))) * np.uint32(0x7FEB352D)
        x = (x ^ (x >> np.uint32(15))) * np.uint32(0x846CA68B)
        x = x ^ (x >> np.uint32(16))
    return (x >> np.uint32(8)).astype(np.float32) * np.float32(1.0 / (1 << 24))


def strength_mask_np(col: np.ndarray, val: np.ndarray, theta: float) -> np.ndarray:
    """Boolean (n, K) strong-dependency mask (mirrors strength.strength_mask)."""
    n = col.shape[0]
    rows = np.arange(n, dtype=col.dtype)[:, None]
    is_diag = col == rows
    is_pad = val == 0
    offdiag = ~is_diag & ~is_pad
    diag = np.where(is_diag, val, 0).sum(axis=1, keepdims=True)
    sign = np.where(diag >= 0, 1.0, -1.0).astype(val.dtype)
    s = np.where(offdiag, -sign * val, 0)
    row_max = s.max(axis=1, keepdims=True)
    return offdiag & (s > 0) & (s >= theta * row_max) & (row_max > 0)


def _sym_adjacency(col: np.ndarray, mask: np.ndarray):
    """Symmetrized strength adjacency S ∪ S^T as padded ELL (gather-only PMIS).

    Returns (adj, valid): adj (n, K2) neighbor ids (self-padded), valid mask.
    """
    import scipy.sparse as sp

    n = col.shape[0]
    k = col.shape[1]
    rows = (np.arange(n, dtype=np.int32)[:, None] * np.ones((1, k), np.int32))
    r = rows[mask]
    c = col[mask]
    s = sp.csr_matrix((np.ones(len(r), np.int8), (r, c)), shape=(n, n))
    sym = (s + s.T).tocsr()  # entries 1/2; diagonal absent (mask excludes it)
    lengths = np.diff(sym.indptr)
    k2 = max(int(lengths.max(initial=0)), 1)
    adj = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, k2))  # self-pad
    pos = np.arange(sym.nnz, dtype=np.int64) - np.repeat(
        sym.indptr[:-1].astype(np.int64), lengths)
    rr = np.repeat(np.arange(n, dtype=np.int64), lengths)
    adj[rr, pos] = sym.indices
    valid = np.zeros((n, k2), dtype=bool)
    valid[rr, pos] = True
    return adj, valid


def pmis_np(col: np.ndarray, mask: np.ndarray, max_rounds: int = 64) -> np.ndarray:
    """C/F split, bit-identical to pmis.pmis (gather-only formulation)."""
    n = col.shape[0]
    # influence count |S^T_i| (exact integer scatter via bincount)
    cnt = np.bincount(col[mask].ravel(), minlength=n).astype(np.int64)
    weight = cnt.astype(np.float32) + hash01_np(np.arange(n))

    adj, valid = _sym_adjacency(col, mask)
    state = np.zeros(n, np.int32)
    key = np.full(n, -1.0, np.float32)
    for _ in range(max_rounds):
        u = np.flatnonzero(state == UNDECIDED)
        if len(u) == 0:
            break
        # active-set rounds: only undecided rows do neighborhood reductions
        key[:] = -1.0
        key[u] = weight[u]
        adj_u, valid_u = adj[u], valid[u]
        kn = key[adj_u]
        kn[~valid_u] = -1.0
        nb_key = kn.max(axis=1, initial=-1.0)
        nb_idx = np.where(valid_u & (kn == nb_key[:, None]), adj_u, -1).max(
            axis=1, initial=-1)
        ku = weight[u]
        cand_u = (ku > nb_key) | ((ku == nb_key) & (u > nb_idx))
        cand = np.zeros(n, bool)
        cand[u[cand_u]] = True
        has_c_u = (cand[adj_u] & valid_u).any(axis=1)
        state[u[cand_u]] = CPOINT
        state[u[~cand_u & has_c_u]] = FPOINT
    else:
        raise RuntimeError("PMIS did not terminate")
    # promote stranded F-points (strong deps but none on a C-point)
    is_c = state == CPOINT
    dep_c = (mask & is_c[col]).any(axis=1)
    any_dep = mask.any(axis=1)
    return np.where((state == FPOINT) & any_dep & ~dep_c, CPOINT, state)


def direct_interpolation_np(col, val, mask, state, cmap, n_coarse):
    """P as ELL planes, mirroring interp.direct_interpolation (signed sums)."""
    n, k = col.shape
    rows = np.arange(n, dtype=col.dtype)[:, None]
    is_diag = col == rows
    is_c = state == CPOINT

    # boolean-multiply formulation (cheaper than np.where chains), f32 math
    diag = (val * is_diag).sum(axis=1)
    neg = val < 0          # diagonal is positive for our SPD targets; even if
    pos = (val > 0) & ~is_diag  # not, is_diag excl. keeps it out of `pos`
    neg &= ~is_diag
    sum_neg = (val * neg).sum(axis=1)
    sum_pos = (val * pos).sum(axis=1)
    strong_c = mask & is_c[col]
    sum_c_neg = (val * (strong_c & neg)).sum(axis=1)
    sum_c_pos = (val * (strong_c & pos)).sum(axis=1)

    alpha = np.where(sum_c_neg != 0,
                     sum_neg / np.where(sum_c_neg != 0, sum_c_neg, 1), 0)
    beta = np.where(sum_c_pos != 0,
                    sum_pos / np.where(sum_c_pos != 0, sum_c_pos, 1), 0)
    dtil = diag + sum_pos * (sum_c_pos == 0)
    scale = np.where(val < 0, alpha[:, None], beta[:, None])
    w = (-(1.0 / dtil))[:, None] * scale * val

    p_val = (w * strong_c).astype(val.dtype)
    p_col = np.where(strong_c, cmap[col], 0).astype(np.int32)
    # C-rows: identity in slot 0
    p_col[is_c] = 0
    p_val[is_c] = 0
    p_col[is_c, 0] = cmap[is_c]
    p_val[is_c, 0] = 1.0
    return p_col, p_val
