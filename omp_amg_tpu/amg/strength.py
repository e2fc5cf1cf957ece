"""Strength-of-connection graph (reference component: SURVEY.md §2 #6, §3.1).

Classical M-matrix-aware test: i strongly depends on j (j ≠ i) iff

    s_ij >= theta * max_{k != i} s_ik,   s_ij = -a_ij (sign(a_ii)-adjusted)

i.e. only *negative* off-diagonal couplings (relative to a positive diagonal)
count, which on the anisotropic 9-point config correctly drops the weak
cross-stream couplings (BASELINE.json config 3 stress test).

TPU-first realization: the strength "graph" is not a new sparse structure —
it is a boolean mask over the ELL slots of A, computed with rowwise
max/compare ops. Everything downstream (PMIS, interpolation) consumes the
(A_ell, mask) pair with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sparse.formats import Ell


def strength_mask(a: Ell, theta: float) -> jax.Array:
    """Boolean (n, K) mask of strong dependencies, aligned with ``a``'s slots."""
    n = a.n_rows
    rows = jnp.arange(n, dtype=a.col.dtype)[:, None]
    is_diag = a.col == rows
    # padding slots have val == 0 and col == 0; exclude them like diagonals
    is_pad = (a.val == 0)
    offdiag = ~is_diag & ~is_pad

    diag = jnp.sum(jnp.where(is_diag, a.val, 0), axis=1, keepdims=True)
    sign = jnp.where(diag >= 0, jnp.ones_like(diag), -jnp.ones_like(diag))
    s = jnp.where(offdiag, -sign * a.val, 0.0)

    row_max = jnp.max(s, axis=1, keepdims=True)
    thresh = theta * row_max
    return offdiag & (s > 0) & (s >= thresh) & (row_max > 0)
