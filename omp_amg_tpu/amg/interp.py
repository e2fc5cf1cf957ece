"""Direct interpolation operator P (reference: SURVEY.md §2 #8, §3.3).

Classical *direct* interpolation for an F-point i with strong C-neighbors
C_i (SURVEY.md §3.3; exact-variant caveat noted there — the reference was
unreadable, and iteration-count parity on the four BASELINE configs is the
oracle):

    e_i ≈ Σ_{j ∈ C_i}  w_ij e_j,
    w_ij = - (Σ_{k ∈ N_i} a_ik / Σ_{l ∈ C_i} a_il) * (a_ij / a_ii)

C-points interpolate by identity. TPU-first realization: P is built entirely
on device in one shot — it reuses A's ELL slot structure (strong-C slots of
row i are a subset of A's row-i slots), so P is an (n_fine, K) ELL with
``col = cmap[a.col]`` on the masked slots. No dynamic-shape compaction, no
host round-trip; the (data-dependent) coarse size only affects the *metadata*
``n_cols``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sparse.formats import Ell
from .pmis import CPOINT


def direct_interpolation(a: Ell, mask: jax.Array, state: jax.Array,
                         cmap: jax.Array, n_coarse: int) -> Ell:
    """Build P (n_fine × n_coarse) as ELL of width K_A (+1 diag slot reuse)."""
    n = a.n_rows
    rows = jnp.arange(n, dtype=a.col.dtype)[:, None]
    is_diag = a.col == rows
    is_c = state == CPOINT

    diag = jnp.sum(jnp.where(is_diag, a.val, 0), axis=1)
    # signed-sum (hypre-style) direct interpolation: negative and positive
    # couplings are scaled independently; positive couplings with no strong-C
    # counterpart are lumped into the diagonal. (Padding val==0 contributes 0.)
    offdiag = ~is_diag
    neg = offdiag & (a.val < 0)
    pos = offdiag & (a.val > 0)
    sum_neg = jnp.sum(jnp.where(neg, a.val, 0), axis=1)
    sum_pos = jnp.sum(jnp.where(pos, a.val, 0), axis=1)

    strong_c = mask & is_c[a.col]
    sum_c_neg = jnp.sum(jnp.where(strong_c & neg, a.val, 0), axis=1)
    sum_c_pos = jnp.sum(jnp.where(strong_c & pos, a.val, 0), axis=1)

    # F-rows with no strong C slot get a zero row (PMIS post-pass promotes
    # strongly-connected stranded points to C, so only genuinely
    # weakly-coupled rows land here — their error is handled by smoothing).
    alpha = jnp.where(sum_c_neg != 0,
                      sum_neg / jnp.where(sum_c_neg != 0, sum_c_neg, 1.0), 0.0)
    beta = jnp.where(sum_c_pos != 0,
                     sum_pos / jnp.where(sum_c_pos != 0, sum_c_pos, 1.0), 0.0)
    dtil = diag + jnp.where(sum_c_pos == 0, sum_pos, 0.0)
    scale = jnp.where(a.val < 0, alpha[:, None], beta[:, None])
    w = -(1.0 / dtil)[:, None] * scale * a.val  # (n, K)

    f_val = jnp.where(strong_c, w, 0.0)
    f_col = jnp.where(strong_c, cmap[a.col], 0)

    # C-point rows: identity onto their coarse index. Overwrite the whole row:
    # slot 0 ← (cmap[i], 1.0), the rest padding.
    is_c_col = is_c[:, None]
    slot0 = jnp.zeros((n, a.col.shape[1]), jnp.bool_).at[:, 0].set(True)
    col = jnp.where(is_c_col, jnp.where(slot0, cmap[:, None], 0), f_col)
    val = jnp.where(is_c_col, jnp.where(slot0, 1.0, 0.0), f_val)
    return Ell(col=col.astype(jnp.int32), val=val.astype(a.val.dtype),
               n_cols=int(n_coarse))
