"""Galerkin triple product A_c = Pᵀ A P (SURVEY.md §2 #9, §3.4).

``galerkin_product`` is the setup-path entry: native OpenMP Gustavson
SpGEMM (csrc/native.cc) or scipy, in f64 (exact, amortized host phase).

The PRODUCTION device RAP engines live elsewhere: the per-axis-factored
MXU RAP and surrogate-grid const RAP for structured hierarchies
(amg/comb_rap.py) and the colored-probing panel-SpMM RAP for general/PMIS
hierarchies (ops/probe_rap.py) — those are what the benchmark measures on
TPU. ``build_rap_plan`` / ``rap_numeric`` below are a TEST ORACLE only: a
flat gather-multiply-segment-sum formulation kept because it is
obviously-correct and exercises the numeric phase end-to-end in
tests/test_amg_setup.py; XLA gather runs at ~0.1 Gelem/s on this chip
(BASELINE.md), so this path must never be wired into setup or bench.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def galerkin_product(a_sp, p_sp, pt_sp=None, patterns_out: dict = None):
    """A_c = Pᵀ A P on host (f64, setup phase).

    Uses the native OpenMP Gustavson SpGEMM (csrc/native.cc) when built,
    scipy's single-threaded product otherwise. ``pt_sp`` (optional)
    supplies an already-computed Pᵀ in CSR form so the setup's transpose
    is not repeated here (the product casts data to f64 regardless, so a
    f32-valued transpose gives bit-identical results).

    ``patterns_out`` (a dict, when given) receives the STRUCTURAL
    intermediate patterns — ``ap`` (A·P) and ``acs`` (Pᵀ·(A·P) before
    zero elimination) as (indptr, indices, n_cols) triples. The value-only
    refresh needs exactly these (csrc spgemm keeps structural zeros, so
    the value-product pattern equals the structural one); recording them
    at setup time saves the cold refresh's full re-derivation (~150 s of
    structural SpGEMMs at 256³)."""
    import scipy.sparse as sp

    from ..native import available, spgemm

    a64 = sp.csr_matrix(a_sp, dtype=np.float64)
    p64 = sp.csr_matrix(p_sp, dtype=np.float64)
    if available():
        pt = pt_sp if pt_sp is not None else p64.T.tocsr()
        ap = spgemm(a64, p64)
        ac = spgemm(pt, ap)
        if patterns_out is not None:
            patterns_out["ap"] = (ap.indptr, ap.indices, int(ap.shape[1]))
            patterns_out["acs"] = (ac.indptr.copy(), ac.indices.copy(),
                                   int(ac.shape[1]))
        del ap
    else:
        ac = (p64.T @ a64 @ p64).tocsr()
        ac.sum_duplicates()
        if patterns_out is not None:
            # scipy's product drops nothing either; acs == pre-elimination
            patterns_out["acs"] = (ac.indptr.copy(), ac.indices.copy(),
                                   int(ac.shape[1]))
    ac.eliminate_zeros()
    ac.sort_indices()
    return ac


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RapPlan:
    """Flat index plan: A_c.val[out] = Σ P.val[pi] · A.val[ai] · P.val[pj].

    One entry per (k,m,I,J) product term with k,m over A's nnz and I∈P-row k,
    J∈P-row m. Built once on host; the numeric phase is a pure device
    gather-multiply-segment-sum (deterministic, static shapes).
    """

    pi: jax.Array   # (n_terms,) int32 → index into P.val flat nnz
    ai: jax.Array   # (n_terms,) int32 → index into A.val flat nnz
    pj: jax.Array   # (n_terms,) int32 → index into P.val flat nnz
    out: jax.Array  # (n_terms,) int32 → index into A_c.val flat nnz
    nnz_out: int = _static()


def build_rap_plan(a_sp, p_sp) -> RapPlan:
    """Symbolic phase on host: enumerate all product terms and their target.

    Term count = Σ_{(k,m)∈A} |P_k| · |P_m| — bounded by nnz(A)·K_P² (small
    K_P for direct interpolation). Memory-heavy for huge fine levels; the
    benchmark uses it per-level where it fits (SURVEY.md §7 notes chunking
    as the scale-out path).
    """
    import scipy.sparse as sp

    a = sp.csr_matrix(a_sp)
    a.sort_indices()
    p = sp.csr_matrix(p_sp)
    p.sort_indices()
    ac = galerkin_product(a, p)

    # flat nnz ids
    p_indptr = p.indptr.astype(np.int64)
    p_len = np.diff(p_indptr)

    # expand A entries (k, m, a_idx)
    k_of_a = np.repeat(np.arange(a.shape[0], dtype=np.int64), np.diff(a.indptr))
    m_of_a = a.indices.astype(np.int64)
    a_idx = np.arange(a.nnz, dtype=np.int64)

    # For each A entry: cross P-row(k) × P-row(m)
    lk, lm = p_len[k_of_a], p_len[m_of_a]
    terms_per = lk * lm
    n_terms = int(terms_per.sum())
    base = np.concatenate([[0], np.cumsum(terms_per)[:-1]])

    t = np.arange(n_terms, dtype=np.int64)
    owner = np.searchsorted(np.cumsum(terms_per), t, side="right")
    local = t - base[owner]
    li = local // lm[owner]   # position within P-row k
    lj = local % lm[owner]    # position within P-row m
    pi = p_indptr[k_of_a[owner]] + li
    pj = p_indptr[m_of_a[owner]] + lj
    ai = a_idx[owner]

    # target: (I, J) = (p.indices[pi], p.indices[pj]) → flat index into ac.
    # ac is canonical CSR, so (row, col) composite keys are globally sorted.
    I = p.indices[pi].astype(np.int64)
    J = p.indices[pj].astype(np.int64)
    ncols = ac.shape[1]
    i_of_ac = np.repeat(np.arange(ac.shape[0], dtype=np.int64), np.diff(ac.indptr))
    ac_keys = i_of_ac * ncols + ac.indices.astype(np.int64)
    out = np.searchsorted(ac_keys, I * ncols + J)

    return RapPlan(
        pi=jnp.asarray(pi, jnp.int32),
        ai=jnp.asarray(ai, jnp.int32),
        pj=jnp.asarray(pj, jnp.int32),
        out=jnp.asarray(out, jnp.int32),
        nnz_out=int(ac.nnz),
    )


@jax.jit
def rap_numeric(plan: RapPlan, a_val: jax.Array, p_val: jax.Array) -> jax.Array:
    """Device numeric phase: one fused gather-multiply-segment-sum."""
    terms = p_val[plan.pi] * a_val[plan.ai] * p_val[plan.pj]
    return jax.ops.segment_sum(terms, plan.out, num_segments=plan.nnz_out)
