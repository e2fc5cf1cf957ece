"""Matrix I/O and hierarchy checkpointing (SURVEY.md §2 #17, §5.4).

- MatrixMarket read via scipy (the reference shipped NIST mmio.c).
- Hierarchy save/load as a single ``.npz`` so expensive setups can be reused
  across benchmark runs/processes.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..amg.hierarchy import Hierarchy, Level
from ..amg.params import AMGParams
from ..sparse.formats import Dia, Ell


def read_matrix_market(path, dtype=jnp.float32):
    """Read a MatrixMarket file → general Ell operator (+ host CSR)."""
    import scipy.io
    import scipy.sparse as sp

    from ..sparse.formats import ell_from_scipy

    a = sp.csr_matrix(scipy.io.mmread(path))
    return ell_from_scipy(a, dtype=dtype), a


def write_matrix_market(path, a, comment: str = "") -> None:
    """Write any supported operator format as a MatrixMarket file
    (the reference's mmio.c is read+write — SURVEY.md §2 #17)."""
    import scipy.io

    from ..sparse.formats import (
        ConstDia, Csr, PlaneDia, const_to_dia, csr_to_scipy, dia_to_scipy,
        ell_to_scipy, plane_to_dia,
    )

    if isinstance(a, ConstDia):
        a = const_to_dia(a)
    if isinstance(a, PlaneDia):
        a = plane_to_dia(a)
    if isinstance(a, Dia):
        m = dia_to_scipy(a)
    elif isinstance(a, Ell):
        m = ell_to_scipy(a)
    elif isinstance(a, Csr):
        m = csr_to_scipy(a)
    else:
        import scipy.sparse as sp

        m = sp.csr_matrix(a)  # scipy/dense passthrough
    scipy.io.mmwrite(path, m, comment=comment)


def _pack_op(prefix: str, op, out: dict, meta: dict):
    from ..amg.structured import GridProlong, GridRestrict

    if isinstance(op, (GridProlong, GridRestrict)):
        meta[prefix + ":kind"] = ("gridp" if isinstance(op, GridProlong)
                                  else "gridr")
        meta[prefix + ":fine"] = list(op.fine_shape)
        meta[prefix + ":coarse"] = list(op.coarse_shape)
        meta[prefix + ":axes"] = [bool(c) for c in op.coarsened]
        return
    from ..sparse.formats import PlaneDia

    if isinstance(op, PlaneDia):
        meta[prefix + ":kind"] = "pdia"
        meta[prefix + ":offsets"] = list(op.offsets)
        meta[prefix + ":dims"] = list(op.dims)
        out[prefix + ":data4"] = np.asarray(op.data4)
        return
    from ..sparse.formats import ConstDia

    if isinstance(op, ConstDia):
        # fully metadata-defined — masks are rebuilt from the taps on load
        meta[prefix + ":kind"] = "cdia"
        meta[prefix + ":offsets"] = list(op.offsets)
        meta[prefix + ":dims"] = list(op.dims)
        meta[prefix + ":taps"] = [list(t) for t in op.taps]
        meta[prefix + ":coeffs"] = list(op.coeffs)
        return
    from ..sparse.routed import RoutedEll

    if isinstance(op, RoutedEll):
        meta[prefix + ":kind"] = "routed"
        meta[prefix + ":geom"] = [op.n_rows, op.n_cols, op.span, op.nxp,
                                  op.nnz, int(op.resident), op.kmax]
        for name in ("val4", "lidx4", "soff", "cbase", "kch", "sbase"):
            out[prefix + ":" + name] = np.asarray(getattr(op, name))
        return
    if isinstance(op, Dia):
        meta[prefix + ":kind"] = "dia"
        meta[prefix + ":offsets"] = list(op.offsets)
        meta[prefix + ":dims"] = list(op.dims) if op.dims else None
        out[prefix + ":data"] = np.asarray(op.data)
    elif isinstance(op, Ell):
        meta[prefix + ":kind"] = "ell"
        meta[prefix + ":n_cols"] = op.n_cols
        out[prefix + ":col"] = np.asarray(op.col)
        out[prefix + ":val"] = np.asarray(op.val)
    else:
        raise TypeError(type(op))


def _unpack_op(prefix: str, data: dict, meta: dict):
    kind = meta[prefix + ":kind"]
    if kind in ("gridp", "gridr"):
        from ..amg.structured import GridProlong, GridRestrict

        cls = GridProlong if kind == "gridp" else GridRestrict
        return cls(fine_shape=tuple(meta[prefix + ":fine"]),
                   coarse_shape=tuple(meta[prefix + ":coarse"]),
                   coarsened=tuple(meta[prefix + ":axes"]))
    if kind == "pdia":
        from ..sparse.formats import PlaneDia

        return PlaneDia(data4=jnp.asarray(data[prefix + ":data4"]),
                        offsets=tuple(meta[prefix + ":offsets"]),
                        dims=tuple(meta[prefix + ":dims"]))
    if kind == "cdia":
        from ..sparse.formats import ConstDia, _const_xy_masks

        taps = tuple(tuple(t) for t in meta[prefix + ":taps"])
        dims = tuple(meta[prefix + ":dims"])
        masks, mask_of = _const_xy_masks(taps, dims)
        return ConstDia(masks=masks,
                        coeffs=tuple(float(c) for c in
                                     meta[prefix + ":coeffs"]),
                        offsets=tuple(meta[prefix + ":offsets"]),
                        taps=taps, mask_of=mask_of, dims=dims)
    if kind == "routed":
        from ..sparse.routed import RoutedEll

        n_rows, n_cols, span, nxp, nnz, res, kmax = meta[prefix + ":geom"]
        return RoutedEll(
            val4=jnp.asarray(data[prefix + ":val4"]),
            lidx4=jnp.asarray(data[prefix + ":lidx4"]),
            soff=jnp.asarray(data[prefix + ":soff"]),
            cbase=jnp.asarray(data[prefix + ":cbase"]),
            kch=jnp.asarray(data[prefix + ":kch"]),
            sbase=jnp.asarray(data[prefix + ":sbase"]),
            n_rows=n_rows, n_cols=n_cols, span=span, nxp=nxp, nnz=nnz,
            kmax=kmax, resident=bool(res))
    if kind == "dia":
        dims = meta.get(prefix + ":dims")
        return Dia(data=jnp.asarray(data[prefix + ":data"]),
                   offsets=tuple(meta[prefix + ":offsets"]),
                   dims=tuple(dims) if dims else None)
    return Ell(col=jnp.asarray(data[prefix + ":col"]),
               val=jnp.asarray(data[prefix + ":val"]),
               n_cols=int(meta[prefix + ":n_cols"]))


def save_hierarchy(path: str, hier: Hierarchy) -> None:
    import dataclasses
    import json

    arrays: dict = {}
    meta: dict = {
        "n_levels": len(hier.levels),
        "params": dataclasses.asdict(hier.params),
    }
    for i, lv in enumerate(hier.levels):
        _pack_op(f"l{i}:a", lv.a, arrays, meta)
        _pack_op(f"l{i}:p", lv.p, arrays, meta)
        _pack_op(f"l{i}:r", lv.r, arrays, meta)
        arrays[f"l{i}:dinv"] = np.asarray(lv.dinv)
        arrays[f"l{i}:lmax"] = np.asarray(lv.lmax)
    arrays["coarse_chol"] = np.asarray(hier.coarse_chol)
    arrays["coarse_a"] = np.asarray(hier.coarse_a)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_hierarchy(path: str) -> Hierarchy:
    import json

    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    meta = json.loads(bytes(data.pop("__meta__")).decode())
    levels = []
    for i in range(meta["n_levels"]):
        levels.append(Level(
            a=_unpack_op(f"l{i}:a", data, meta),
            dinv=jnp.asarray(data[f"l{i}:dinv"]),
            p=_unpack_op(f"l{i}:p", data, meta),
            r=_unpack_op(f"l{i}:r", data, meta),
            lmax=jnp.asarray(data[f"l{i}:lmax"]),
        ))
    return Hierarchy(
        levels=tuple(levels),
        coarse_chol=jnp.asarray(data["coarse_chol"]),
        coarse_a=jnp.asarray(data["coarse_a"]),
        params=AMGParams(**meta["params"]),
    )
