"""Plain-numpy classical AMG — the test oracle.

The upstream reference repo was unreadable (SURVEY.md §0), so this
deliberately unvectorized, obvious implementation of the same classical
algorithms (strength / PMIS / direct interpolation / RAP / V-cycle / PCG,
SURVEY.md §3) is the stand-in spec. The framework must match it *exactly* on
structure (strength masks, C/F splits, P structure) and to rounding on values.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def hash01_np(idx):
    """Must match omp_amg_tpu.amg.pmis.hash01 bit-for-bit."""
    x = np.asarray(idx, dtype=np.uint32)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint32(16))) * np.uint32(0x7FEB352D)
        x = (x ^ (x >> np.uint32(15))) * np.uint32(0x846CA68B)
        x = x ^ (x >> np.uint32(16))
    return (x >> np.uint32(8)).astype(np.float32) * np.float32(1.0 / (1 << 24))


def strength_graph(a: sp.csr_matrix, theta: float) -> sp.csr_matrix:
    """Boolean CSR S: S[i,j]=True iff i strongly depends on j."""
    a = sp.csr_matrix(a)
    n = a.shape[0]
    rows, cols = [], []
    diag = a.diagonal()
    for i in range(n):
        lo, hi = a.indptr[i], a.indptr[i + 1]
        js, vs = a.indices[lo:hi], a.data[lo:hi]
        off = js != i
        sgn = 1.0 if diag[i] >= 0 else -1.0
        s = np.where(off, -sgn * vs, 0.0)
        smax = s.max(initial=0.0)
        if smax <= 0:
            continue
        for j, sv in zip(js, s):
            if sv > 0 and sv >= theta * smax:
                rows.append(i)
                cols.append(j)
    return sp.csr_matrix(
        (np.ones(len(rows), bool), (rows, cols)), shape=(n, n)
    )


UNDECIDED, CPOINT, FPOINT = 0, 1, 2


def pmis(s: sp.csr_matrix, max_rounds: int = 64) -> np.ndarray:
    n = s.shape[0]
    sym = ((s + s.T) > 0).tocsr()  # symmetrized adjacency
    weight = np.asarray(s.sum(axis=0)).ravel().astype(np.float32) + hash01_np(
        np.arange(n)
    )
    state = np.zeros(n, np.int32)
    for _ in range(max_rounds):
        und = state == UNDECIDED
        if not und.any():
            break
        new_c = []
        for i in np.where(und)[0]:
            nbrs = sym.indices[sym.indptr[i]:sym.indptr[i + 1]]
            nbrs = [j for j in nbrs if state[j] == UNDECIDED and j != i]
            wi = (weight[i], i)
            if all(wi > (weight[j], j) for j in nbrs):
                new_c.append(i)
        state[new_c] = CPOINT
        for i in new_c:
            nbrs = sym.indices[sym.indptr[i]:sym.indptr[i + 1]]
            for j in nbrs:
                if state[j] == UNDECIDED:
                    state[j] = FPOINT
    # promote stranded F-points (strong deps but none on C)
    for i in np.where(state == FPOINT)[0]:
        deps = s.indices[s.indptr[i]:s.indptr[i + 1]]
        if len(deps) and not any(state[j] == CPOINT for j in deps):
            state[i] = CPOINT
    return state


def direct_interpolation(a: sp.csr_matrix, s: sp.csr_matrix, state) -> sp.csr_matrix:
    a = sp.csr_matrix(a)
    n = a.shape[0]
    is_c = state == CPOINT
    cmap = np.cumsum(is_c) - 1
    nc = int(is_c.sum())
    rows, cols, vals = [], [], []
    for i in range(n):
        if is_c[i]:
            rows.append(i)
            cols.append(cmap[i])
            vals.append(1.0)
            continue
        lo, hi = a.indptr[i], a.indptr[i + 1]
        js, vs = a.indices[lo:hi], a.data[lo:hi]
        sset = set(s.indices[s.indptr[i]:s.indptr[i + 1]])
        aii = vs[js == i][0]
        off = js != i
        sum_neg = vs[off & (vs < 0)].sum()
        sum_pos = vs[off & (vs > 0)].sum()
        cj = [(j, v) for j, v in zip(js, vs) if j in sset and is_c[j]]
        sum_c_neg = sum(v for _, v in cj if v < 0)
        sum_c_pos = sum(v for _, v in cj if v > 0)
        if sum_c_neg == 0 and sum_c_pos == 0:
            continue  # zero row (weakly coupled F-point)
        alpha = sum_neg / sum_c_neg if sum_c_neg != 0 else 0.0
        beta = sum_pos / sum_c_pos if sum_c_pos != 0 else 0.0
        dtil = aii + (sum_pos if sum_c_pos == 0 else 0.0)
        for j, v in cj:
            scale = alpha if v < 0 else beta
            if scale == 0.0:
                continue
            rows.append(i)
            cols.append(cmap[j])
            vals.append(-scale * v / dtil)
    return sp.csr_matrix((vals, (rows, cols)), shape=(n, nc))


def amg_hierarchy(a: sp.csr_matrix, theta=0.25, coarse_size=40, max_levels=20):
    """Returns [(A, P), ...] with final level's A the coarse matrix."""
    levels = []
    a = sp.csr_matrix(a, dtype=np.float64)
    while a.shape[0] > coarse_size and len(levels) < max_levels - 1:
        s = strength_graph(a, theta)
        state = pmis(s)
        p = direct_interpolation(a, s, state)
        if p.shape[1] >= a.shape[0] or p.shape[1] == 0:
            break
        ac = (p.T @ a @ p).tocsr()
        levels.append((a, p))
        a = ac
    return levels, a


def vcycle(levels, a_coarse, b, nu1=1, nu2=1, omega=2.0 / 3.0):
    """One V(nu1,nu2) cycle with weighted Jacobi, zero initial guess."""
    def cycle(l, bl):
        if l == len(levels):
            return np.linalg.solve(a_coarse.toarray(), bl)
        a, p = levels[l]
        dinv = 1.0 / a.diagonal()
        x = np.zeros_like(bl)
        for _ in range(nu1):
            x = x + omega * dinv * (bl - a @ x)
        r = bl - a @ x
        xc = cycle(l + 1, p.T @ r)
        x = x + p @ xc
        for _ in range(nu2):
            x = x + omega * dinv * (bl - a @ x)
        return x

    return cycle(0, b)


def pcg(a, b, precond, tol=1e-8, maxiter=200):
    x = np.zeros_like(b)
    r = b - a @ x
    bnorm = np.linalg.norm(b)
    z = precond(r)
    p = z.copy()
    rz = r @ z
    for k in range(maxiter):
        if np.linalg.norm(r) <= tol * bnorm:
            return x, k
        q = a @ p
        alpha = rz / (p @ q)
        x = x + alpha * p
        r = r - alpha * q
        z = precond(r)
        rz_new = r @ z
        beta = rz_new / rz
        rz = rz_new
        p = z + beta * p
    return x, maxiter
