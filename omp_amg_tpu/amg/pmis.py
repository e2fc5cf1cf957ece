"""Deterministic PMIS coarsening (reference: SURVEY.md §2 #7, §3.2).

Luby-style parallel maximal independent set on the symmetrized strength graph
S ∪ S^T, with the weight of node i

    w(i) = (# nodes strongly influenced by i)  +  hash01(i)

where ``hash01`` is a pure function of the *global* row index — the
BASELINE.json determinism contract: the C/F split is bit-identical for any
device count / partition layout, because every step is a pointwise map, an
exact integer scatter-add, or an exact max reduction (no float-accumulation
order dependence anywhere).

Tie-breaking is exact: lexicographic (weight, index) via a two-pass max
(neighbor max of the key, then neighbor max of the index restricted to
key-achieving neighbors), so hash collisions in f32 cannot deadlock a round.

Rounds are jitted device steps; the (data-dependent, ~5–10 iteration) round
loop runs on host during the amortized setup phase — SURVEY.md §7 "hard
parts" strategy for dynamic control flow under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from ..sparse.formats import Ell

UNDECIDED, CPOINT, FPOINT = 0, 1, 2


def hash01(idx: jax.Array) -> jax.Array:
    """Deterministic uint32 finalizer (murmur3-style) → f32 in [0, 1)."""
    x = idx.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return (x >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def influence_count(a: Ell, mask: jax.Array) -> jax.Array:
    """|S^T_i|: how many rows strongly depend on column i (exact int scatter)."""
    ones = mask.astype(jnp.int32)
    return jnp.zeros((a.n_rows,), jnp.int32).at[a.col].add(ones)


@partial(jax.jit, donate_argnums=(2,))
def _pmis_round(a: Ell, mask: jax.Array, state: jax.Array, weight: jax.Array):
    n = a.n_rows
    rows = jnp.arange(n, dtype=jnp.int32)
    und = state == UNDECIDED
    key = jnp.where(und, weight, -1.0)

    # --- neighbor max of key over S ∪ S^T ---
    key_at_col = jnp.where(mask, key[a.col], -1.0)
    nb_key = jnp.max(key_at_col, axis=1, initial=-1.0)
    contrib = jnp.where(mask, key[:, None] * jnp.ones_like(a.val), -1.0)
    nb_key = jnp.maximum(nb_key, jnp.full((n,), -1.0).at[a.col].max(contrib)[rows])

    # --- neighbor argmax (index restricted to key-achieving neighbors) ---
    idx_at_col = jnp.where(mask & (key_at_col == nb_key[:, None]), a.col, -1)
    nb_idx = jnp.max(idx_at_col, axis=1, initial=-1)
    nb_key_at_col = nb_key[a.col]
    idx_contrib = jnp.where(
        mask & (key[:, None] == nb_key_at_col), rows[:, None], -1
    )
    nb_idx = jnp.maximum(nb_idx, jnp.full((n,), -1, jnp.int32).at[a.col].max(idx_contrib))

    # --- select new C-points: strict lexicographic local maxima ---
    cand = und & ((key > nb_key) | ((key == nb_key) & (rows > nb_idx)))

    # --- undecided neighbors (either direction) of new C-points become F ---
    c_at_col = mask & cand[a.col]
    has_c = jnp.any(c_at_col, axis=1)
    c_contrib = jnp.where(mask & cand[:, None], 1, 0)
    has_c = has_c | (jnp.zeros((n,), jnp.int32).at[a.col].max(c_contrib) > 0)

    state = jnp.where(cand, CPOINT, state)
    state = jnp.where(und & ~cand & has_c, FPOINT, state)
    return state, jnp.sum(state == UNDECIDED)


@jax.jit
def _promote_stranded(a: Ell, mask: jax.Array, state: jax.Array) -> jax.Array:
    """F-points with strong dependencies but none on a C-point become C.

    PMIS can strand an F-point whose neighbors-in-C are only S^T-adjacent;
    direct interpolation needs a strong C *dependency*, so promote (safe:
    promoting cannot create new stranded points).
    """
    is_c = state == CPOINT
    dep_c = jnp.any(mask & is_c[a.col], axis=1)
    any_dep = jnp.any(mask, axis=1)
    return jnp.where((state == FPOINT) & any_dep & ~dep_c, CPOINT, state)


def pmis(a: Ell, mask: jax.Array, max_rounds: int = 64) -> jax.Array:
    """C/F splitting; returns int32 state array (1=C, 2=F)."""
    n = a.n_rows
    weight = influence_count(a, mask).astype(jnp.float32) + hash01(
        jnp.arange(n, dtype=jnp.int32)
    )
    # nodes with no strong connections in either direction are their own
    # (vacuous) local maxima and become C in round 1 — harmless, and keeps
    # every node decided.
    state = jnp.zeros((n,), jnp.int32)
    for _ in range(max_rounds):
        state, left = _pmis_round(a, mask, state, weight)
        if int(left) == 0:
            break
    else:
        raise RuntimeError("PMIS did not terminate (tie-breaking bug?)")
    return _promote_stranded(a, mask, state)


def coarse_map(state: jax.Array):
    """(cmap, n_coarse): coarse index of each C-point (exact int cumsum)."""
    is_c = (state == CPOINT).astype(jnp.int32)
    cmap = jnp.cumsum(is_c) - 1
    return cmap, int(jnp.sum(is_c))
