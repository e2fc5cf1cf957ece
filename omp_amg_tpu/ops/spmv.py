"""Sparse matrix–vector products (the framework's hot kernel).

Parity: reference SpMV kernel, SURVEY.md §2 #2 / §4.5 (OpenMP row loop;
reference unreadable — behavior from BASELINE.json north-star).

TPU-first design (not a row-loop translation):

- ``Dia``: gather-free shift-and-fma over static diagonals. For the benchmark
  stencil operators this streams ~(ndiag+2)·4 bytes per row and hits HBM
  speed-of-light; XLA fuses the whole sum into one pass.
- ``Ell``: one gather of ``x`` at ``(n, K)`` indices + dense multiply/rowsum.
  Static shapes, VPU-friendly; the general-matrix path (coarse AMG levels).
- ``Csr``: segment-sum formulation (gather + ``jax.ops.segment_sum``) — the
  fully general fallback, also used to cross-check the others in tests.

A Pallas double-buffered DIA kernel lives in ``ops/pallas_spmv.py``; this
module is the XLA baseline and the dispatch point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sparse.formats import Csr, Dia, Ell


def spmv_csr(a: Csr, x: jax.Array) -> jax.Array:
    gathered = a.val * jnp.take(x, a.col, axis=0)
    return jax.ops.segment_sum(gathered, a.row_ids, num_segments=a.n_rows)


def spmv_ell(a: Ell, x: jax.Array) -> jax.Array:
    return jnp.sum(a.val * jnp.take(x, a.col, axis=0), axis=1)


def spmv_dia(a: Dia, x: jax.Array) -> jax.Array:
    n = a.n_rows
    offs = a.offsets
    lo = max(0, max(-min(offs), 0))
    hi = max(0, max(max(offs), 0))
    xp = jnp.pad(x, (lo, hi))
    y = jnp.zeros_like(x, shape=(n,))
    for k, off in enumerate(offs):
        # data[k, i] * x[i + off]; xp index i + off + lo is always in-bounds.
        y = y + a.data[k] * jax.lax.dynamic_slice(xp, (off + lo,), (n,))
    return y


def spmv_const_xla(a, x: jax.Array) -> jax.Array:
    """XLA fallback for ConstDia: iota-derived masks fused into shift-fma.

    Bitwise-identical to ``spmv_dia`` on the materialized operator: the
    products ``(c_k·m)·x`` and ``(c_k)·(m·x)`` agree exactly for m ∈ {0,1}
    and the accumulation order is the same.
    """
    from ..sparse.formats import _const_expected_masks

    n = a.n_rows
    offs = a.offsets
    lo = max(0, -min(offs))
    hi = max(0, max(offs))
    xp = jnp.pad(x, (lo, hi))
    masks = _const_expected_masks(jnp, None, a.taps, a.dims)
    y = jnp.zeros_like(x, shape=(n,))
    for k, off in enumerate(offs):
        data_k = jnp.where(masks[k], jnp.asarray(a.coeffs[k], x.dtype),
                           jnp.asarray(0, x.dtype))
        y = y + data_k * jax.lax.dynamic_slice(xp, (off + lo,), (n,))
    return y


def spmv(a, x: jax.Array) -> jax.Array:
    """y = A @ x for any supported format (dispatch is static under jit)."""
    from ..amg.structured import (
        GridProlong, GridRestrict, apply_prolong, apply_restrict,
    )
    from ..sparse.formats import ConstDia, PlaneDia, plane_to_dia

    from ..sparse.routed import RoutedEll

    if isinstance(a, ConstDia):
        if jax.default_backend() == "tpu":
            from .pallas_const import spmv_const

            return spmv_const(a, x)
        return spmv_const_xla(a, x)
    if isinstance(a, GridProlong):
        return apply_prolong(a, x)
    if isinstance(a, GridRestrict):
        return apply_restrict(a, x)
    if isinstance(a, RoutedEll):
        if jax.default_backend() == "tpu":
            from .pallas_routed import spmv_routed

            return spmv_routed(a, x)
        from .pallas_routed import spmv_routed_xla

        return spmv_routed_xla(a, x)
    from ..sparse.routed import SplitRoutedEll, spmv_split

    if isinstance(a, SplitRoutedEll):
        return spmv_split(a, x)
    if isinstance(a, PlaneDia):
        if jax.default_backend() == "tpu":
            from .pallas_spmv import spmv_plane_dia

            return spmv_plane_dia(a, x)
        return spmv_dia(plane_to_dia(a), x)
    if isinstance(a, Dia):
        if jax.default_backend() == "tpu":
            from .pallas_spmv import spmv_dia_pallas

            return spmv_dia_pallas(a, x)
        return spmv_dia(a, x)
    if isinstance(a, Ell):
        return spmv_ell(a, x)
    if isinstance(a, Csr):
        return spmv_csr(a, x)
    raise TypeError(type(a))


def residual(a, x: jax.Array, b: jax.Array) -> jax.Array:
    """r = b − A·x (one fused Pallas pass for ConstDia on TPU; XLA fuses
    the subtraction into the SpMV epilogue everywhere else). Bitwise-equal
    to ``b - spmv(a, x)``."""
    from ..sparse.formats import ConstDia
    from ..sparse.routed import RoutedEll

    if isinstance(a, ConstDia) and jax.default_backend() == "tpu":
        from .pallas_const import residual_const

        return residual_const(a, x, b)
    if isinstance(a, RoutedEll) and jax.default_backend() == "tpu":
        from .pallas_routed import residual_routed

        return residual_routed(a, x, b)
    from ..sparse.formats import PlaneDia

    if isinstance(a, PlaneDia) and jax.default_backend() == "tpu":
        from .pallas_spmv import residual_plane_dia

        r = residual_plane_dia(a, x, b)
        if r is not None:
            return r
    return b - spmv(a, x)


def spmv_t_ell(a: Ell, x: jax.Array) -> jax.Array:
    """y = A^T @ x via deterministic scatter-add (used when R isn't materialized)."""
    contrib = a.val * x[:, None]
    return jnp.zeros((a.n_cols,), a.dtype).at[a.col].add(contrib)


def nnz_count(a) -> int:
    """Structural nonzero count used for nnz/s metrics (host, static)."""
    import numpy as np

    if isinstance(a, Dia):
        n = a.n_rows
        return int(sum(n - abs(o) for o in a.offsets))
    if isinstance(a, Ell):
        val = np.asarray(a.val)
        col = np.asarray(a.col)
        rows = np.arange(val.shape[0])[:, None]
        valid = (val != 0) | ((col == 0) & (val != 0))
        # padding is col=0,val=0; a true stored zero is indistinguishable — count
        # slots with nonzero value plus explicit diagonal zeros is not needed for
        # the metric; use nonzero values.
        del rows
        return int(valid.sum())
    if isinstance(a, Csr):
        return a.nnz
    from ..sparse.routed import RoutedEll, SplitRoutedEll

    if isinstance(a, (RoutedEll, SplitRoutedEll)):
        return a.nnz
    from ..sparse.formats import ConstDia

    if isinstance(a, ConstDia):
        nz, ny, nx = a.dims
        return int(sum(
            (nz - abs(dz)) * (ny - abs(dy)) * (nx - abs(dx))
            for (dz, dy, dx), c in zip(a.taps, a.coeffs) if c != 0.0
        ))
    raise TypeError(type(a))
