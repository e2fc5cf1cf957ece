"""Host-side hierarchy partitioner (SURVEY.md §2 #22, §5.8).

Turns a (globally built) :class:`~omp_amg_tpu.amg.hierarchy.Hierarchy` into a
row-block-sharded :class:`~omp_amg_tpu.parallel.dist.DistHierarchy` for a 1D
device mesh:

- every level's rows are split into ``ndev`` contiguous blocks (padded);
- per operator, the minimal halo width H is computed from the actual column
  windows (stencil hierarchies are banded, so H ≪ m); ELL columns are
  re-localized to the shard's window;
- levels whose per-device block would fall below ``agg_rows_per_dev`` are
  *agglomerated*: replicated on every shard (the standard coarse-level
  strategy; the shard→replicated transition uses a Pᵀ-scatter + psum).

The partitioner is deterministic and purely structural: the sharded solve
produces the same iterates as the single-device solve up to float reduction
order (tests assert allclose + identical iteration counts).
"""

from __future__ import annotations

import math
from dataclasses import replace

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..amg.hierarchy import Hierarchy
from ..sparse.formats import Dia, Ell, dia_to_ell
from .dist import AXIS, DistHierarchy, DistLevel, DistOp, dist_specs
from .slab import SlabDia, SlabProlong, SlabRestrict, slab_halos


def _ell_np(op) -> tuple[np.ndarray, np.ndarray, int]:
    from ..amg.structured import GridProlong, GridRestrict, prolong_to_scipy
    from ..sparse.formats import ell_planes_from_scipy

    if isinstance(op, (GridProlong, GridRestrict)):
        # materialize constant-weight grid transfers for the sharded path
        p_sp = prolong_to_scipy(op if isinstance(op, GridProlong)
                                else GridProlong(fine_shape=op.fine_shape,
                                                 coarse_shape=op.coarse_shape,
                                                 coarsened=op.coarsened))
        m = p_sp if isinstance(op, GridProlong) else p_sp.T.tocsr()
        col, val, n_cols = ell_planes_from_scipy(m)
        return col, val, n_cols
    from ..sparse.formats import ConstDia, PlaneDia, const_to_dia, plane_to_dia

    if isinstance(op, ConstDia):
        op = const_to_dia(op)
    if isinstance(op, PlaneDia):
        op = plane_to_dia(op)
    ell = dia_to_ell(op) if isinstance(op, Dia) else op
    return np.asarray(ell.col), np.asarray(ell.val), ell.n_cols


def _pad_rows(arr: np.ndarray, n_to: int, fill=0):
    if arr.shape[0] == n_to:
        return arr
    pad = np.full((n_to - arr.shape[0],) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _routed_dist_plans(local, valp, ndev, m_in, h):
    """Per-shard routed-ELL plans over the local halo windows, stacked on
    the sharded leading axis. With the compact-chunk layout
    (sparse/routed.py) each shard keeps its own cbase/kch — those are data
    arrays, not static layout — so only the chunk-array extents (common
    chunk count NC, span, nxp) need padding to the max over shards.

    Returns the extra DistOp fields, or None when any shard's window
    exceeds the routed caps (caller keeps the gather formulation)."""
    import scipy.sparse as sp

    from ..sparse.routed import (
        _resident, absolute_soff, plan_lidx_packed, plan_routed,
    )

    n_tot, k = local.shape
    m_out = n_tot // ndev
    ncols = m_in + 2 * h
    mats = []
    for s in range(ndev):
        c = local[s * m_out:(s + 1) * m_out].astype(np.int64)
        v = valp[s * m_out:(s + 1) * m_out]
        rows = np.repeat(np.arange(m_out, dtype=np.int64), k)
        valid = (v != 0).ravel()
        mats.append(sp.csr_matrix(
            (np.asarray(v, np.float64).ravel()[valid],
             (rows[valid], c.ravel()[valid])), shape=(m_out, ncols)))
    s_t = 0
    plans = []
    for m in mats:
        p = plan_routed(m, s_min=s_t)
        if p is None:
            return None
        if p["span"] > s_t:   # re-plan earlier shards to the common span
            s_t = p["span"]
            plans = [plan_routed(mm, s_min=s_t) for mm in mats[:len(plans)]]
            if any(pp is None for pp in plans):
                return None
        plans.append(p)
    nxp = max(p["nxp"] for p in plans)
    kmax = max(p["kmax"] for p in plans)
    nc_t = max(p["val4"].shape[0] for p in plans)
    resident = _resident(nxp, kmax)
    val4, lidx4, soff, cbase, kch, sbase = [], [], [], [], [], []
    for p in plans:
        so = absolute_soff(p) if resident else p["soff"]
        pad = nc_t - p["val4"].shape[0]
        val4.append(np.pad(p["val4"], ((0, pad),) + ((0, 0),) * 3))
        lidx4.append(np.pad(plan_lidx_packed(p),
                            ((0, pad),) + ((0, 0),) * 3))
        soff.append(np.pad(so, ((0, pad), (0, 0))))
        cbase.append(p["cbase"])
        kch.append(p["kch"])
        sbase.append(p["sbase"])
    return dict(
        rt_val4=jnp.asarray(np.concatenate(val4), jnp.float32),
        rt_lidx4=jnp.asarray(np.concatenate(lidx4)),
        rt_soff=jnp.asarray(np.concatenate(soff)),
        rt_cbase=jnp.asarray(np.concatenate(cbase)),
        rt_kch=jnp.asarray(np.concatenate(kch)),
        rt_sbase=jnp.asarray(np.concatenate(sbase)),
        rt_span=int(s_t), rt_nxp=int(nxp), rt_kmax=int(kmax),
        rt_resident=bool(resident),
    )


def _make_dist_op(col, val, *, ndev, out_sharded, in_sharded, m_in,
                  n_in_real, transition=False, routed=None) -> DistOp:
    """Build a DistOp from global ELL planes (host numpy).

    ``routed`` controls building the per-shard routed-ELL window plans
    (halo mode); default: on for the TPU backend (where the gather
    formulation is unusable), off on CPU meshes (tests opt in)."""
    n_out, k = col.shape
    if not out_sharded:
        return DistOp(col=jnp.asarray(col), val=jnp.asarray(val),
                      mode="replicated", halo=0, m_in=int(n_in_real),
                      n_in=int(n_in_real), n_in_real=int(n_in_real))

    m_out = math.ceil(n_out / ndev)
    colp = _pad_rows(col, ndev * m_out)
    valp = _pad_rows(val, ndev * m_out)

    if transition or not in_sharded:
        # rows sharded, input replicated: keep global columns
        return DistOp(col=jnp.asarray(colp), val=jnp.asarray(valp),
                      mode="replicated", halo=0, m_in=int(n_in_real),
                      n_in=int(n_in_real), n_in_real=int(n_in_real))

    # both sharded: compute halo width from actual column windows
    valid = valp != 0
    shard_of_row = np.repeat(np.arange(ndev), m_out)
    in_start = shard_of_row * m_in
    rel = colp - in_start[:, None]          # col offset relative to input block
    rel_valid = np.where(valid, rel, 0)
    h_left = max(0, int(-(rel_valid.min(initial=0))))
    h_right = max(0, int(rel_valid.max(initial=0)) - (m_in - 1))
    h = max(h_left, h_right)

    if h > m_in:
        # halo wider than a block — nearest-neighbor exchange insufficient
        return DistOp(col=jnp.asarray(colp), val=jnp.asarray(valp),
                      mode="gather", halo=0, m_in=int(m_in),
                      n_in=int(ndev * m_in), n_in_real=int(n_in_real))

    local = np.where(valid, rel + h, h).astype(np.int32)

    # comm/compute overlap split: leading/trailing rows (per shard, maxed)
    # that reference halo columns; the contiguous interior depends only on
    # the local block
    bnd_lo = bnd_hi = 0
    if h > 0:
        touch = (valid & ((local < h) | (local >= h + m_in))).any(axis=1)
        touch = touch.reshape(ndev, m_out)
        mid = m_out // 2
        for s in range(ndev):
            idx = np.flatnonzero(touch[s])
            if len(idx) == 0:
                continue
            lo_idx = idx[idx < mid]
            hi_idx = idx[idx >= mid]
            if len(lo_idx):
                bnd_lo = max(bnd_lo, int(lo_idx.max()) + 1)
            if len(hi_idx):
                bnd_hi = max(bnd_hi, m_out - int(hi_idx.min()))
        if bnd_lo + bnd_hi >= m_out:
            bnd_lo = bnd_hi = 0  # no interior worth splitting
    if routed is None:
        routed = jax.default_backend() == "tpu"
    rt = (_routed_dist_plans(local, valp, ndev, m_in, h) or {}) if routed \
        else {}
    return DistOp(col=jnp.asarray(local), val=jnp.asarray(valp),
                  mode="halo", halo=int(h), m_in=int(m_in),
                  n_in=int(ndev * m_in), n_in_real=int(n_in_real),
                  bnd_lo=int(bnd_lo), bnd_hi=int(bnd_hi), **rt)


def _structured_dias(hier: Hierarchy):
    """Per-level Dia operators of a structured hierarchy (None if mixed)."""
    from ..amg.structured import GridProlong
    from ..sparse.formats import ConstDia, PlaneDia, const_to_dia, plane_to_dia

    dias = []
    for lv in hier.levels:
        a = lv.a
        if isinstance(a, ConstDia):
            a = const_to_dia(a)
        if isinstance(a, PlaneDia):
            a = plane_to_dia(a)
        if not isinstance(a, Dia) or a.dims is None \
                or not isinstance(lv.p, GridProlong):
            return None
        dias.append(a)
    return dias


def _partition_structured(hier: Hierarchy, ndev: int,
                          agg_rows_per_dev: int,
                          transport: str = "ppermute"):
    """Z-slab partition of a structured hierarchy (gather-free dist ops).

    Levels shard while their leading grid axis splits evenly over the mesh
    (and evenly into coarse pairs when that axis is being coarsened); the
    remaining coarse levels replicate (agglomeration). Returns None when
    level 0 itself cannot shard — caller falls back to the ELL partitioner.
    """
    dias = _structured_dias(hier)
    if dias is None:
        return None
    nlev = len(hier.levels)
    sizes = [a.n_rows for a in dias] + [hier.coarse_a.shape[0]]

    sharded = []
    prev = True
    for l in range(nlev):
        a, p = dias[l], hier.levels[l].p
        nz = a.dims[0]
        ok = prev and nz % ndev == 0 and (
            ndev == 1 or sizes[l] // ndev >= agg_rows_per_dev)
        if ok and p.coarsened[0]:
            ok = nz % (2 * ndev) == 0
        sharded.append(bool(ok))
        prev = ok
    sharded.append(False)  # dense coarse level always replicated
    if not sharded[0]:
        return None

    levels = []
    for l, lv in enumerate(hier.levels):
        a = dias[l]
        p_g = lv.p
        if sharded[l]:
            hl, hr = slab_halos(a.offsets, a.dims)
            a_op = SlabDia(data=jnp.asarray(a.data), offsets=a.offsets,
                           dims=a.dims, hl=hl, hr=hr, transport=transport)
            trans = not sharded[l + 1]
            p_op = SlabProlong(fine_shape=p_g.fine_shape,
                               coarse_shape=p_g.coarse_shape,
                               coarsened=p_g.coarsened, slice_in=trans)
            r_op = SlabRestrict(fine_shape=p_g.fine_shape,
                                coarse_shape=p_g.coarse_shape,
                                coarsened=p_g.coarsened, gather_out=trans)
        else:
            a_op, p_op, r_op = a, lv.p, lv.r
        levels.append(DistLevel(
            a=a_op, dinv=jnp.asarray(lv.dinv), p=p_op, r=r_op, lmax=lv.lmax,
            sharded=bool(sharded[l]), next_sharded=bool(sharded[l + 1]),
            n_next=int(sizes[l + 1]),
        ))
    return DistHierarchy(levels=tuple(levels), coarse_chol=hier.coarse_chol,
                         params=hier.params)


def partition_hierarchy(hier: Hierarchy, ndev: int,
                        agg_rows_per_dev: int = 2048,
                        transport: str = "ppermute",
                        routed=None) -> DistHierarchy:
    dh = _partition_structured(hier, ndev, agg_rows_per_dev, transport)
    if dh is not None:
        return dh
    nlev = len(hier.levels)
    sizes = [lv.a.shape[0] for lv in hier.levels] + [hier.coarse_a.shape[0]]

    # vector level l is sharded iff its block is big enough; monotone: once a
    # level replicates, all coarser levels replicate. The coarsest (dense
    # solve) level is always replicated.
    sharded = []
    prev = True
    for l, n in enumerate(sizes):
        s = prev and (l < nlev) and (math.ceil(n / ndev) >= agg_rows_per_dev) \
            and ndev > 1
        sharded.append(s)
        prev = s
    # degenerate single-device mesh: keep level 0 sharded so the code path
    # still exercises shard_map semantics
    if ndev == 1:
        sharded = [l < nlev for l in range(nlev + 1)]
        sharded[0] = True

    m = [math.ceil(n / ndev) if s else n for n, s in zip(sizes, sharded)]

    levels = []
    for l, lv in enumerate(hier.levels):
        n_l, n_c = sizes[l], sizes[l + 1]
        a_col, a_val, _ = _ell_np(lv.a)
        p_col, p_val, _ = _ell_np(lv.p)
        r_col, r_val, _ = _ell_np(lv.r)

        a_op = _make_dist_op(a_col, a_val, ndev=ndev, out_sharded=sharded[l],
                             in_sharded=sharded[l], m_in=m[l], n_in_real=n_l,
                             routed=routed)
        transition = sharded[l] and not sharded[l + 1]
        p_op = _make_dist_op(p_col, p_val, ndev=ndev, out_sharded=sharded[l],
                             in_sharded=sharded[l + 1], m_in=m[l + 1],
                             n_in_real=n_c, transition=transition,
                             routed=routed)
        r_op = None
        if not transition:
            r_op = _make_dist_op(r_col, r_val, ndev=ndev,
                                 out_sharded=sharded[l + 1],
                                 in_sharded=sharded[l], m_in=m[l],
                                 n_in_real=n_l, routed=routed)

        dinv = np.asarray(lv.dinv)
        if sharded[l]:
            dinv = _pad_rows(dinv, ndev * m[l], fill=1.0)
        levels.append(DistLevel(
            a=a_op, dinv=jnp.asarray(dinv), p=p_op, r=r_op, lmax=lv.lmax,
            sharded=bool(sharded[l]), next_sharded=bool(sharded[l + 1]),
            n_next=int(ndev * m[l + 1] if sharded[l + 1] else n_c),
        ))

    return DistHierarchy(levels=tuple(levels), coarse_chol=hier.coarse_chol,
                         params=hier.params)


def place_hierarchy(dh: DistHierarchy, mesh) -> DistHierarchy:
    """Device-put every array with its NamedSharding (leading-axis blocks)."""
    specs = dist_specs(dh)

    def put(x, spec):
        if x is None or not hasattr(x, "shape"):
            return x
        if isinstance(spec, P):
            return jax.device_put(x, NamedSharding(mesh, spec))
        return x

    return jax.tree_util.tree_map(
        put, dh, specs,
        is_leaf=lambda x: x is None or isinstance(x, (jax.Array, P)),
    )


def pad_vector(x, dh: DistHierarchy, ndev: int):
    a0 = dh.levels[0].a
    n0 = a0.col.shape[0] if hasattr(a0, "col") else a0.data.shape[1]
    x = np.asarray(x)
    return jnp.asarray(_pad_rows(x, n0))


def unpad_vector(x, n_real: int):
    return x[:n_real]
