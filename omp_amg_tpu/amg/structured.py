"""Structured (tensor-grid) coarsening mode — the TPU fast path.

For stencil operators on regular grids (all BASELINE.json configs), the
hierarchy can stay *banded at every level*: strength-driven semicoarsening
(coarsen by 2 in every strong axis, PFMG/SMG-style) with tensor-product
linear interpolation and exact Galerkin RAP keeps each coarse operator a
bounded stencil on a regular sub-grid. Consequences on TPU:

- every level's operator is DIA → the Pallas banded SpMV kernel applies at
  every level (no gathers anywhere in the V-cycle; XLA gather runs at
  ~0.1 Gelem/s on TPU — measured, see ops/pallas_spmv.py);
- prolongation/restriction are constant-weight separable grid ops: on TPU
  each axis is contracted against its small banded transfer matrix as an
  MXU matmul (stride-2 slices lower to Mosaic relayouts — 8.8× slower,
  measured); the slice/add formulation remains the CPU/reference path.
  Both are gather-free.

Axis selection is *algebraic*: an axis is coarsened iff its axis-aligned
coupling passes the classical strength test (θ) against the row's strongest
coupling — e.g. the ε=1e-3 anisotropic config semicoarsens in y only until
the Galerkin operators become isotropic enough to coarsen x too.

This mirrors hypre's PFMG/SMG family as the structured companion to the
general PMIS path (SURVEY.md §2 keeps both; the algebraic path handles
arbitrary sparsity).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GridProlong:
    """Tensor-product linear interpolation (coarse → fine); constant weights."""
    fine_shape: Tuple[int, ...] = _static()
    coarse_shape: Tuple[int, ...] = _static()
    coarsened: Tuple[bool, ...] = _static()

    @property
    def shape(self):
        return (int(np.prod(self.fine_shape)), int(np.prod(self.coarse_shape)))

    @property
    def n_cols(self):
        return self.shape[1]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GridRestrict:
    """Transpose of GridProlong (fine → coarse)."""
    fine_shape: Tuple[int, ...] = _static()
    coarse_shape: Tuple[int, ...] = _static()
    coarsened: Tuple[bool, ...] = _static()

    @property
    def shape(self):
        return (int(np.prod(self.coarse_shape)), int(np.prod(self.fine_shape)))

    @property
    def n_cols(self):
        return self.shape[1]


def _prolong_axis(x: jax.Array, axis: int, n_f: int) -> jax.Array:
    """Linear interpolation along one axis: (..., nc, ...) → (..., n_f, ...).

    even i → x_c[i/2]; odd i → (x_c[(i-1)/2] + x_c[(i+1)/2]) / 2 (Dirichlet:
    a missing right neighbor contributes 0).
    """
    nc = x.shape[axis]
    xm = jnp.moveaxis(x, axis, -1)
    left = xm
    right = jnp.concatenate(
        [xm[..., 1:], jnp.zeros_like(xm[..., :1])], axis=-1)
    odd = 0.5 * (left + right)                      # value at fine index 2j+1
    inter = jnp.stack([xm, odd], axis=-1).reshape(*xm.shape[:-1], 2 * nc)
    out = inter[..., :n_f]
    return jnp.moveaxis(out, -1, axis)


def _restrict_axis(x: jax.Array, axis: int, nc: int) -> jax.Array:
    """Transpose of ``_prolong_axis``: y_c[j] = x[2j] + (x[2j-1]+x[2j+1])/2."""
    n_f = x.shape[axis]
    xm = jnp.moveaxis(x, axis, -1)
    pad = jnp.zeros_like(xm[..., :1])
    xp = jnp.concatenate([pad, xm, pad, pad], axis=-1)  # 1 left, 2 right pad
    # fine index i lives at xp index i+1
    ext = 2 * nc
    even = xp[..., 1 : 1 + ext : 2][..., :nc]           # x[2j]
    lft = xp[..., 0 : ext : 2][..., :nc]                # x[2j-1]
    rgt = xp[..., 2 : 2 + ext : 2][..., :nc]            # x[2j+1]
    out = even + 0.5 * (lft + rgt)
    return jnp.moveaxis(out, -1, axis)


import functools


@functools.lru_cache(maxsize=256)
def _axis_restrict_mat(n_f: int, nc: int) -> np.ndarray:
    """Dense (nc, n_f) restriction matrix: y_c[j] = x[2j] + ½(x[2j−1]+x[2j+1])
    with Dirichlet (zero) taps outside the grid — exactly `_restrict_axis`."""
    m = np.zeros((nc, n_f), np.float32)
    j = np.arange(nc)
    m[j, 2 * j] = 1.0
    m[j[1:], 2 * j[1:] - 1] = 0.5
    ok = 2 * j + 1 < n_f
    m[j[ok], 2 * j[ok] + 1] = 0.5
    return m


def _transfer_matmul(x: jax.Array, shape_in, shape_out, coarsened,
                     prolong: bool) -> jax.Array:
    """Grid transfer as a cascade of per-axis banded matmuls (MXU).

    XLA lowers the slice-based `_restrict_axis`/`_prolong_axis` to
    lane-stride-2 ops that Mosaic executes as relayouts (~gather speed) —
    measured 13.7 ms for the level-0 restrict+prolong round trip at 256³,
    70% of the whole V-cycle. Contracting each axis against its small
    (nc×nf) transfer matrix instead keeps the work on the MXU: same trick
    as the per-axis-factored RAP. Weights are powers of two, products are
    exact; only the f32 summation order differs from the slice path
    (HIGHEST precision keeps full f32 accumulation).
    """
    hi = jax.lax.Precision.HIGHEST
    nz, ny, nx = shape_in
    mz, my, mx = shape_out
    t = x.reshape(shape_in)
    if coarsened[2]:
        m = _axis_restrict_mat(*((nx, mx) if not prolong else (mx, nx)))
        m = jnp.asarray(m.T if not prolong else m, t.dtype)
        t = jnp.matmul(t.reshape(nz * ny, nx), m, precision=hi)
    t = t.reshape(nz, ny, mx)
    if coarsened[1]:
        m = _axis_restrict_mat(*((ny, my) if not prolong else (my, ny)))
        m = jnp.asarray(m if not prolong else m.T, t.dtype)
        t = jnp.einsum("vy,zyx->zvx", m, t, precision=hi)
    t = t.reshape(nz, my * mx)
    if coarsened[0]:
        m = _axis_restrict_mat(*((nz, mz) if not prolong else (mz, nz)))
        m = jnp.asarray(m if not prolong else m.T, t.dtype)
        t = jnp.matmul(m, t, precision=hi)
    return t.reshape(-1)


def _axis_mat_apply(x: jax.Array, axis: int, m: jax.Array) -> jax.Array:
    """y[..., i, ...] = Σ_j m[i, j]·x[..., j, ...] — one axis contracted
    against a small transfer matrix on the MXU (restrict: m = R;
    prolong: m = Rᵀ). Used by the slab (distributed) transfers for their
    fully-local within-plane axes."""
    hi = jax.lax.Precision.HIGHEST
    if axis == x.ndim - 1:
        out = jnp.matmul(x.reshape(-1, x.shape[-1]), m.T, precision=hi)
        return out.reshape(*x.shape[:-1], m.shape[0])
    if axis == x.ndim - 2:
        return jnp.einsum("vy,...yx->...vx", m, x, precision=hi)
    t = jnp.tensordot(m, x, axes=(1, axis), precision=hi)
    return jnp.moveaxis(t, 0, axis)


def _use_matmul_transfers(ndim: int) -> bool:
    import os

    mode = os.environ.get("OMP_AMG_TRANSFER", "auto")
    if mode == "matmul":
        return ndim == 3
    if mode == "slice":
        return False
    return ndim == 3 and jax.default_backend() == "tpu"


def apply_prolong(p: GridProlong, xc: jax.Array) -> jax.Array:
    if _use_matmul_transfers(len(p.fine_shape)):
        return _transfer_matmul(xc, p.coarse_shape, p.fine_shape,
                                p.coarsened, prolong=True)
    x = xc.reshape(p.coarse_shape)
    for ax, c in enumerate(p.coarsened):
        if c:
            x = _prolong_axis(x, ax, p.fine_shape[ax])
    return x.reshape(-1)


def apply_restrict(r: GridRestrict, xf: jax.Array) -> jax.Array:
    if _use_matmul_transfers(len(r.fine_shape)):
        return _transfer_matmul(xf, r.fine_shape, r.coarse_shape,
                                r.coarsened, prolong=False)
    x = xf.reshape(r.fine_shape)
    for ax, c in enumerate(r.coarsened):
        if c:
            x = _restrict_axis(x, ax, r.coarse_shape[ax])
    return x.reshape(-1)


# ---------------------------------------------------------------------------
# Host-side setup helpers
# ---------------------------------------------------------------------------

def prolong_to_scipy(p: GridProlong):
    """Materialize P as scipy CSR (setup-time Galerkin product + tests)."""
    import scipy.sparse as sp

    mats = []
    for ax, c in enumerate(p.coarsened):
        n_f, nc = p.fine_shape[ax], p.coarse_shape[ax]
        if not c:
            mats.append(sp.identity(n_f, format="csr"))
            continue
        rows, cols, vals = [], [], []
        for i in range(n_f):
            if i % 2 == 0:
                rows.append(i); cols.append(i // 2); vals.append(1.0)
            else:
                rows.append(i); cols.append((i - 1) // 2); vals.append(0.5)
                if (i + 1) // 2 < nc:
                    rows.append(i); cols.append((i + 1) // 2); vals.append(0.5)
        mats.append(sp.csr_matrix((vals, (rows, cols)), shape=(n_f, nc)))
    out = mats[0]
    for m in mats[1:]:
        out = sp.kron(out, m, format="csr")
    return out


def axis_deltas(offsets: Sequence[int], dims: Tuple[int, ...]) -> np.ndarray:
    """Balanced per-axis decomposition of scalar DIA offsets (valid under
    the masked-zero invariant: stored taps never wrap a grid row)."""
    d = len(dims)
    strides = [1] * d
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * dims[k + 1]
    out = np.zeros((len(offsets), d), np.int64)
    for ki, off in enumerate(offsets):
        rem = int(off)
        for ax in range(d):
            q = int(round(rem / strides[ax]))
            out[ki, ax] = q
            rem -= q * strides[ax]
    return out


def strong_axes_from_values(offsets, values, dims: Tuple[int, ...],
                            theta: float) -> Tuple[bool, ...]:
    """Axis selection from one representative value per diagonal (see
    strong_axes; ``values`` may be medians or nonzero-means — identical for
    constant-stencil interiors)."""
    values = np.asarray(values, np.float64)
    deltas = axis_deltas(offsets, dims)
    c = np.zeros(len(dims))
    for ax in range(len(dims)):
        c[ax] = max(0.0, float(np.sum(-values * (deltas[:, ax] ** 2))))
    cmax = c.max()
    if cmax <= 0:
        return tuple(False for _ in dims)
    return tuple(bool(c[ax] >= theta * cmax and dims[ax] > 2)
                 for ax in range(len(dims)))


def strong_axes(a_sp, dims: Tuple[int, ...], theta: float) -> Tuple[bool, ...]:
    """Directional-stiffness axis selection.

    Axis ax is coarsened iff c_ax ≥ θ · max c, with
    c_ax = Σ_taps (−a_tap) · δ_ax² (median tap value over fully-interior
    rows). This signed sum measures the operator's stiffness along each
    axis: positive (weak, mass-like) couplings cancel their companion
    negative couplings, so the ε-weak direction of an anisotropic FEM
    operator scores ~0, while Galerkin operators whose strength has
    drifted into edge/corner taps still score strong on every axis
    (axis-aligned-only tests stall on those — seen at the 8³ level of a
    repeatedly-coarsened 7-point operator).
    """
    from ..sparse.formats import Dia, dia_from_scipy

    if isinstance(a_sp, tuple):  # (offsets, data) host planes — no transfers
        offsets, data = list(a_sp[0]), np.asarray(a_sp[1])
    else:
        d = a_sp if isinstance(a_sp, Dia) else dia_from_scipy(a_sp)
        data = np.asarray(d.data)
        offsets = list(d.offsets)
    n = data.shape[1]
    # sample rows: translation-invariant interiors (every operator in the
    # Galerkin chain of a constant stencil) have identical interior values
    # per plane, so a strided sample's median equals the full median — and
    # the full scan was the hottest setup phase at 128³ (2.6 s → 35 ms)
    stride = max(1, n // 65536)
    if stride > 1 and dims:
        # keep the stride coprime with the grid dims so the sample walks
        # all plane/column positions instead of aliasing one of them
        # (a stride that divides nx would sample a single column)
        import math

        while any(math.gcd(stride, max(d, 1)) != 1 for d in dims):
            stride += 1
    sub = np.ascontiguousarray(data[:, ::stride]) if stride > 1 else data
    interior = np.abs(sub).min(axis=0) > 0  # rows where every tap is active
    if stride > 1 and interior.mean() < 0.01:
        # anomalously thin sampled interior → fall back to the full scan
        sub = data
        interior = np.abs(sub).min(axis=0) > 0
    if not interior.any():
        interior = np.ones(sub.shape[1], bool)
    med = np.array([float(np.median(sub[k][interior]))
                    for k in range(len(offsets))])
    return strong_axes_from_values(offsets, med, dims, theta)
