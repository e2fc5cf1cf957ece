"""AMG hierarchy container and setup driver (SURVEY.md §2 #10, §4.2).

Setup is host-orchestrated, device-executed (SURVEY.md §7 "hard parts"):
the data-dependent decisions (level count, coarse sizes, ELL widths) happen
in Python during the amortized setup phase, while each structural step
(strength, PMIS rounds, interpolation values) is a jitted device computation.
The Galerkin product runs through :mod:`omp_amg_tpu.ops.rap` (host symbolic /
device-capable numeric, f64 for setup accuracy).

The resulting ``Hierarchy`` is a static-shaped pytree: the V-cycle jits once
per hierarchy and unrolls over levels.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.formats import (
    Dia, Ell, dia_to_ell, dia_to_scipy, ell_from_scipy, ell_to_scipy,
    transpose_ell, diagonal,
)
from .interp import direct_interpolation
from .params import AMGParams
from .pmis import coarse_map, pmis
from .smoothers import estimate_lmax
from .strength import strength_mask


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Level:
    a: object          # Dia | Ell — the level operator
    dinv: jax.Array    # (n,) inverse diagonal
    p: Ell             # prolongation to this level from level l+1  (n_l × n_{l+1})
    r: Ell             # restriction = P^T, materialized as ELL
    lmax: jax.Array    # scalar: largest eigenvalue of D⁻¹A (Chebyshev bounds)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Hierarchy:
    levels: Tuple[Level, ...]
    coarse_chol: jax.Array        # dense Cholesky factor (lower) of coarsest A
    coarse_a: jax.Array           # dense coarsest operator (for diagnostics)
    params: AMGParams = _static()

    @property
    def n_levels(self) -> int:
        return len(self.levels) + 1


def _to_ell(a) -> Ell:
    if isinstance(a, Ell):
        return a
    if isinstance(a, Dia):
        return dia_to_ell(a)
    raise TypeError(type(a))


def _to_scipy(a):
    if isinstance(a, Ell):
        return ell_to_scipy(a)
    if isinstance(a, Dia):
        return dia_to_scipy(a)
    raise TypeError(type(a))


def amg_setup(a, params: AMGParams = AMGParams(), *, keep_host: bool = False):
    """Build the AMG hierarchy for operator ``a`` (Dia, Ell, or scipy CSR).

    Returns ``Hierarchy`` (and with ``keep_host=True`` also the per-level
    host scipy operators, used by tests and the mixed-precision outer loop).
    """
    import scipy.sparse as sp

    from ..ops.rap import galerkin_product

    if isinstance(a, (Dia, Ell)):
        a_dev: object = a
        a_sp = _to_scipy(a)
    else:
        a_sp = sp.csr_matrix(a)
        a_dev = ell_from_scipy(a_sp)

    dtype = jnp.float32 if not isinstance(a_dev, (Dia, Ell)) else a_dev.dtype

    levels = []
    host_ops = [a_sp]
    while (
        a_sp.shape[0] > params.coarse_size
        and len(levels) < params.max_levels - 1
    ):
        a_ell = _to_ell(a_dev)
        mask = strength_mask(a_ell, params.theta)
        state = pmis(a_ell, mask, max_rounds=params.max_coarsen_rounds)
        cmap, nc = coarse_map(state)
        n = a_ell.n_rows
        if nc == 0 or n / max(nc, 1) < params.min_coarsen_factor:
            break  # coarsening stalled; stop and direct-solve this level
        p = direct_interpolation(a_ell, mask, state, cmap, nc)
        p_sp = ell_to_scipy(p)
        ac_sp = galerkin_product(host_ops[-1], p_sp)
        r = transpose_ell(p)
        dinv = 1.0 / diagonal(a_dev)
        lmax = estimate_lmax(a_dev, dinv)
        levels.append(Level(a=a_dev, dinv=dinv.astype(dtype), p=p, r=r,
                            lmax=lmax.astype(dtype)))
        a_sp = ac_sp
        a_dev = ell_from_scipy(ac_sp, dtype=dtype)
        host_ops.append(a_sp)

    dense = np.asarray(a_sp.toarray(), dtype=np.float64)
    chol = np.linalg.cholesky(dense)
    hier = Hierarchy(
        levels=tuple(levels),
        coarse_chol=jnp.asarray(chol, dtype=dtype),
        coarse_a=jnp.asarray(dense, dtype=dtype),
        params=params,
    )
    if keep_host:
        return hier, host_ops
    return hier


def hierarchy_stats(hier: Hierarchy, host_ops=None) -> dict:
    """Grid/operator complexities and per-level sizes (reference metrics)."""
    sizes = [lv.a.shape[0] for lv in hier.levels] + [hier.coarse_a.shape[0]]
    out = {"levels": len(sizes), "sizes": sizes}
    if host_ops is not None:
        nnzs = [int(op.nnz) for op in host_ops]
        out["nnz"] = nnzs
        out["operator_complexity"] = float(sum(nnzs) / nnzs[0])
        out["grid_complexity"] = float(sum(sizes) / sizes[0])
    return out
