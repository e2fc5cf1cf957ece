"""Distributed (per-shard) PMIS setup: strength → PMIS → ext+i → RAP with
ghost-row semantics.

Parity: SURVEY.md §2 #22 / BASELINE north-star "distributed hierarchy
partitioner" + "halo exchange for SpMV/SpGEMM contributions". The
structured path has :mod:`dist_setup` (per-shard comb RAP); this module is
its general-sparsity twin: every setup kernel runs per row-block shard
using ONLY the shard's owned rows plus explicitly-exchanged ghost data,
and the result is bit-identical across shard counts — the deterministic
hash01 PMIS weights (SURVEY §3.2) exist precisely to make C/F selection
partition-invariant.

Exchange pattern per level (what a real multi-host run communicates; the
single-process orchestrator here moves the same owner→ghost slices):

1. ghost A rows (graph distance ≤ 2) — ext+i reads the strong-F
   neighbors' rows; the shard-local Gustavson RAP reads A·P rows for its
   contributing fine rows (hypre-style external rows);
2. per PMIS round: (a) keys/states of halo rows, (b) the round's new
   C-selections of halo rows (two nearest-neighbor exchanges per round);
3. coarse-count prefix sum (one tiny collective) for the global coarse
   numbering;
4. ghost P rows (distance ≤ 2) for the shard-local triple product.

Bit-parity guarantees (tested in tests/test_dist_pmis_setup.py):
- strength/PMIS/promotion: elementwise/max ops on identical inputs;
- ext+i: the native kernel is per-row deterministic and the shard's
  compact ext system preserves column order (sorted global ids);
- RAP: per coarse row, the Gustavson accumulation order (contributing
  fine rows ascending) matches the serial native product exactly;
- lmax: power-iteration reductions use canonical 1024-row block partial
  sums — invariant to the partition by construction (a plain shard-order
  psum would round differently at each shard count).
"""

from __future__ import annotations

import numpy as np

from ..amg import host_setup as hs
from ..amg.params import AMGParams

_CANON_BLOCK = 1024


def _canon_sum(x: np.ndarray) -> float:
    """Shard-count-invariant reduction: fixed 1024-row block partials
    summed in block order (owners of straddled blocks exchange the few
    boundary rows so every partial covers exactly its rows)."""
    x = np.asarray(x, np.float64)
    if x.size == 0:
        return 0.0
    partials = np.add.reduceat(x, np.arange(0, x.size, _CANON_BLOCK))
    return float(np.sum(partials))


def _canon_norm(x: np.ndarray) -> float:
    return float(np.sqrt(_canon_sum(np.asarray(x, np.float64) ** 2)))


def _shard_ranges(n: int, ndev: int):
    m = -(-n // ndev)
    return [(s * m, min((s + 1) * m, n)) for s in range(ndev)]


def _row_cols(a_csr, rows: np.ndarray) -> np.ndarray:
    """Unique columns of a set of rows (vectorized CSR slice-gather)."""
    lo = a_csr.indptr[rows]
    hi = a_csr.indptr[rows + 1]
    lens = (hi - lo).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    pos = (np.arange(total, dtype=np.int64)
           - np.repeat(np.cumsum(lens) - lens, lens)
           + np.repeat(lo.astype(np.int64), lens))
    return np.unique(a_csr.indices[pos].astype(np.int64))


def _ghost_ids(a_csr, r0: int, r1: int, dist: int) -> np.ndarray:
    """Global ids within graph distance ``dist`` of the owned rows (the
    ghost set a real shard requests from its neighbors)."""
    cur = np.arange(r0, r1, dtype=np.int64)
    out = []
    for _ in range(dist):
        nxt = _row_cols(a_csr, cur)
        nxt = nxt[(nxt < r0) | (nxt >= r1)]
        out.append(nxt)
        cur = nxt
    return (np.unique(np.concatenate(out)) if out
            else np.empty(0, np.int64))


def _strength_mask_ranges(col, val, theta, ranges):
    """Per-shard strength masks with globally-correct row ids (the same
    formula as host_setup.strength_mask_np, row-block local)."""
    n, k = col.shape
    mask = np.zeros((n, k), bool)
    for (r0, r1) in ranges:
        c = col[r0:r1]
        v = val[r0:r1]
        rows = np.arange(r0, r1, dtype=col.dtype)[:, None]
        is_diag = c == rows
        is_pad = v == 0
        offdiag = ~is_diag & ~is_pad
        diag = np.where(is_diag, v, 0).sum(axis=1, keepdims=True)
        sign = np.where(diag >= 0, 1.0, -1.0).astype(v.dtype)
        s = np.where(offdiag, -sign * v, 0)
        row_max = s.max(axis=1, keepdims=True)
        mask[r0:r1] = offdiag & (s > 0) & (s >= theta * row_max) \
            & (row_max > 0)
    return mask


def _pmis_distributed(col, mask, ranges, max_rounds=64):
    """PMIS with per-shard round updates + explicit ghost exchanges.

    Bit-identical to the serial ``pmis_np`` (tested): weights are the
    global hash01 + influence counts; each round every shard updates ONLY
    its owned rows from (key, state, cand) of its own + ghost rows.
    """
    n = col.shape[0]
    # influence counts: per-shard partial bincounts, owner-summed (exact —
    # integer addition commutes)
    cnt = np.zeros(n, np.int64)
    for (r0, r1) in ranges:
        cnt += np.bincount(col[r0:r1][mask[r0:r1]].ravel(), minlength=n)
    weight = cnt.astype(np.float32) + hs.hash01_np(np.arange(n))

    adj, valid = hs._sym_adjacency(col, mask)

    state = np.zeros(n, np.int32)
    key = np.full(n, -1.0, np.float32)
    for _ in range(max_rounds):
        und = state == hs.UNDECIDED
        if not und.any():
            break
        key[:] = -1.0
        key[und] = weight[und]
        # phase A: candidacy for owned undecided rows (reads ghost keys)
        cand = np.zeros(n, bool)
        for (r0, r1) in ranges:
            u = np.flatnonzero(und[r0:r1]) + r0
            if len(u) == 0:
                continue
            adj_u, valid_u = adj[u], valid[u]
            kn = key[adj_u]
            kn[~valid_u] = -1.0
            nb_key = kn.max(axis=1, initial=-1.0)
            nb_idx = np.where(valid_u & (kn == nb_key[:, None]), adj_u,
                              -1).max(axis=1, initial=-1)
            ku = weight[u]
            cand[u[(ku > nb_key) | ((ku == nb_key) & (u > nb_idx))]] = True
        # exchange ghost cand; phase B: state updates per shard
        for (r0, r1) in ranges:
            u = np.flatnonzero(und[r0:r1]) + r0
            if len(u) == 0:
                continue
            adj_u, valid_u = adj[u], valid[u]
            has_c = (cand[adj_u] & valid_u).any(axis=1)
            cu = cand[u]
            state[u[cu]] = hs.CPOINT
            state[u[~cu & has_c]] = hs.FPOINT
    else:
        raise RuntimeError("distributed PMIS did not terminate")

    # stranded-F promotion (row-local; reads ghost states)
    is_c = state == hs.CPOINT
    out = state.copy()
    for (r0, r1) in ranges:
        sl = slice(r0, r1)
        dep_c = (mask[sl] & is_c[col[sl]]).any(axis=1)
        any_dep = mask[sl].any(axis=1)
        out[sl] = np.where((state[sl] == hs.FPOINT) & any_dep & ~dep_c,
                           hs.CPOINT, state[sl])
    return out


def _extpi_shard(a_csr, r0, r1, ghosts2, state, cmap, n_coarse, theta,
                 max_elements):
    """Ext+i P rows for owned rows, from the shard's compact ext system.

    The compact system holds rows for own ∪ ghost ids with columns
    remapped to the (sorted) ext id space; distance-2 ghost rows lose
    their distance-3 columns, which only corrupts rows the shard never
    keeps (ext+i reads full rows only at distance ≤ 1)."""
    import scipy.sparse as sp

    from ..sparse.formats import ell_planes_from_scipy

    own = np.arange(r0, r1, dtype=np.int64)
    ext = np.unique(np.concatenate([own, ghosts2]))
    lookup = np.full(a_csr.shape[0], -1, np.int64)
    lookup[ext] = np.arange(len(ext))
    sub = a_csr[ext].tocoo()
    cl = lookup[sub.col]
    keep = cl >= 0
    sub_l = sp.csr_matrix((sub.data[keep], (sub.row[keep], cl[keep])),
                          shape=(len(ext), len(ext)))
    col_l, val_l, _ = ell_planes_from_scipy(sub_l, dtype=np.float32)
    # strength over the compact system == global mask rows (local diag ids
    # map 1:1; all kept columns are the rows' true columns for dist ≤ 1)
    mask_l = hs.strength_mask_np(col_l, val_l, theta)
    pc, pv = hs.extpi_interpolation(col_l, val_l, mask_l, state[ext],
                                    cmap[ext], n_coarse, max_elements)
    own_l = lookup[own]
    return pc[own_l], pv[own_l]


class DistSetupCache:
    """Symbolic record of a per-shard PMIS setup (``dist_pmis_setup(
    cache=)``): strength masks, C/F states, coarse numbering, interpolation
    patterns and the per-shard Galerkin patterns — everything
    :func:`dist_pmis_refresh` needs to re-derive VALUES only for a
    same-sparsity operator. This is the distributed analog of
    :class:`omp_amg_tpu.amg.refresh.SetupCache` (VERDICT r4 missing #1:
    the two-phase symbolic+numeric amortization where the setup is
    row-partitioned, not only single-device)."""

    def __init__(self):
        self.levels = []
        self.params = None
        self.ndev = None
        self.part_kw = None
        self.mesh = None


def dist_pmis_setup(a, ndev: int, params: AMGParams = AMGParams(),
                    mesh=None, agg_rows_per_dev: int = 2048,
                    keep_host: bool = False, transport: str = "ppermute",
                    routed=None, cache: "DistSetupCache | None" = None):
    """Per-shard PMIS hierarchy setup over ``ndev`` row-block shards.

    Returns the sharded :class:`DistHierarchy` (placed on ``mesh`` when
    given); ``keep_host=True`` additionally returns the assembled
    single-device :class:`Hierarchy` and the per-level host operators
    (tests / mixed-precision outer loops). The assembled hierarchy is
    bit-identical for every ``ndev`` (tests pin 1 vs 2 vs 8).

    ``cache`` (a :class:`DistSetupCache`) records the setup's symbolic
    decisions so :func:`dist_pmis_refresh` can rebuild values only.
    """
    import scipy.sparse as sp

    import jax.numpy as jnp

    from ..amg.hierarchy import Hierarchy, Level, _coarse_factor
    from ..sparse.formats import (
        Ell, dia_to_scipy, ell_from_scipy, ell_planes_from_scipy,
        ell_planes_to_scipy,
    )
    from .. import native
    from ..utils.memtune import tune_malloc
    from .partition import partition_hierarchy, place_hierarchy

    tune_malloc()
    if hasattr(a, "offsets"):
        a_sp = sp.csr_matrix(dia_to_scipy(a))
    else:
        a_sp = sp.csr_matrix(a)
    a_sp = a_sp.astype(np.float64)
    a_sp.sort_indices()
    if params.interp != "extpi":
        raise ValueError("dist_pmis_setup implements the ext+i default")

    dtype = jnp.float32
    levels = []
    host_ops = [a_sp]
    exchanges = []      # per-level ghost-row accounting (comm volume)

    cur = a_sp
    while (cur.shape[0] > params.coarse_size
           and len(levels) < params.max_levels - 1):
        n = cur.shape[0]
        ranges = _shard_ranges(n, ndev)
        col, val, _ = ell_planes_from_scipy(cur, dtype=np.float32)

        mask = _strength_mask_ranges(col, val, params.theta, ranges)
        state = _pmis_distributed(col, mask, ranges,
                                  params.max_coarsen_rounds)
        is_c = state == hs.CPOINT
        nc = int(is_c.sum())
        if nc == 0 or n / max(nc, 1) < params.min_coarsen_factor:
            break
        # coarse numbering: per-shard counts + prefix sum (collective)
        counts = [int(is_c[r0:r1].sum()) for (r0, r1) in ranges]
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        cmap = np.zeros(n, np.int64)
        for (r0, r1), off in zip(ranges, offs):
            cmap[r0:r1] = off + np.cumsum(is_c[r0:r1]) - 1

        # ext+i per shard on compact ghost systems (global coarse ids go
        # straight into the kernel, so no post-remap is needed)
        kP = params.interp_max_elements
        p_col = np.zeros((n, kP), np.int32)
        p_val = np.zeros((n, kP), np.float32)
        ghost_rows = 0
        for (r0, r1) in ranges:
            g2 = _ghost_ids(cur, r0, r1, 2)
            ghost_rows += len(g2)
            pc, pv = _extpi_shard(cur, r0, r1, g2, state, cmap, nc,
                                  params.theta, kP)
            p_col[r0:r1] = pc
            p_val[r0:r1] = pv
        p_sp = ell_planes_to_scipy(p_col, p_val.astype(np.float64), nc)
        p_sp = p_sp.tocsr()
        p_sp.sort_indices()
        if cache is not None:
            cache.levels.append(dict(
                n=n, nc=nc, ranges=ranges, mask=mask, state=state,
                cmap=cmap, counts=counts, offs=offs, p_col=p_col.copy(),
                p_valid=p_val != 0,
                a_pat=(cur.indptr.copy(), cur.indices.copy(),
                       int(cur.shape[1])),
                shards=[]))

        # RAP per shard: owned coarse rows via shard-local Gustavson over
        # exchanged A/P ghost rows; per-row accumulation order matches
        # the serial native product → bit-identical assembly
        pt = p_sp.T.tocsr()
        pt.sort_indices()
        if cache is not None:
            # p-CSR → pᵀ-CSR data permutation (refresh derives pt values
            # from refreshed P values without a per-refresh transpose)
            tag = sp.csr_matrix(
                (np.arange(p_sp.nnz, dtype=np.int64), p_sp.indices,
                 p_sp.indptr), shape=p_sp.shape)
            from ..amg.refresh import _i32 as _p32
            cache.levels[-1]["pt_perm"] = _p32(tag.T.tocsr().data)
            cache.levels[-1]["pt_indptr"] = pt.indptr.copy()
        ac_rows = []
        for si, (r0, r1) in enumerate(ranges):
            c_lo, c_hi = int(offs[si]), int(offs[si]) + counts[si]
            if c_hi == c_lo:
                ac_rows.append(sp.csr_matrix((0, nc)))
                if cache is not None:
                    cache.levels[-1]["shards"].append(None)
                continue
            pt_own = pt[c_lo:c_hi]
            ks = np.unique(pt_own.indices.astype(np.int64))
            ghost_rows += int((ks < r0).sum() + (ks >= r1).sum())
            a_rows = cur[ks]
            ap_rows = native.spgemm(a_rows, p_sp)      # rows = ks
            lk = np.full(n, -1, np.int64)
            lk[ks] = np.arange(len(ks))
            pt_l = sp.csr_matrix(
                (pt_own.data, lk[pt_own.indices], pt_own.indptr),
                shape=(c_hi - c_lo, len(ks)))
            acs = native.spgemm(pt_l, ap_rows)
            ac_rows.append(acs)
            if cache is not None:
                # data positions of cur[ks] inside cur.data (CSR row
                # slicing concatenates the row segments in ks order)
                lo = cur.indptr[ks]
                ln = (cur.indptr[ks + 1] - lo).astype(np.int64)
                from ..amg.refresh import _i32
                a_sel = _i32(np.arange(int(ln.sum()), dtype=np.int64)
                             - np.repeat(np.cumsum(ln) - ln, ln)
                             + np.repeat(lo.astype(np.int64), ln))
                _p = lambda m: (m.indptr.copy(), m.indices.copy(),
                                int(m.shape[1]))
                cache.levels[-1]["shards"].append(dict(
                    ks=ks, a_sel=a_sel, c_lo=c_lo, c_hi=c_hi,
                    a_pat=_p(a_rows), ap_pat=_p(ap_rows),
                    ptl_pat=_p(pt_l), acs_pat=_p(acs)))
        ac_sp = sp.vstack(ac_rows).tocsr()
        ac_sp.sort_indices()
        ac_sp.eliminate_zeros()
        if cache is not None:
            # stacked per-shard structural rows → final (zero-eliminated)
            # ac pattern: keep map + dropped guard, like the serial cache
            stacked = sp.vstack([r for r in ac_rows]).tocsr()
            st_rows = np.repeat(np.arange(stacked.shape[0], dtype=np.int64),
                                np.diff(stacked.indptr))
            st_keys = st_rows * nc + stacked.indices.astype(np.int64)
            ac_rows_idx = np.repeat(np.arange(ac_sp.shape[0],
                                              dtype=np.int64),
                                    np.diff(ac_sp.indptr))
            ac_keys = ac_rows_idx * nc + ac_sp.indices.astype(np.int64)
            keep = np.searchsorted(st_keys, ac_keys)
            if (keep >= len(st_keys)).any() or not np.array_equal(
                    st_keys[keep], ac_keys):
                raise AssertionError("dist cache: ac pattern mismatch")
            drop_mask = np.ones(len(st_keys), bool)
            drop_mask[keep] = False
            from ..amg.refresh import _i32 as _c32
            cache.levels[-1]["keep"] = _c32(keep)
            cache.levels[-1]["dropped"] = _c32(np.flatnonzero(drop_mask))
            cache.levels[-1]["ac_pat"] = (ac_sp.indptr.copy(),
                                          ac_sp.indices.copy(), int(nc))

        if params.smoother == "l1jacobi":
            dinv_np = 1.0 / np.asarray(np.abs(cur).sum(axis=1)).ravel()
        else:
            dinv_np = 1.0 / cur.diagonal()
        lmax = _lmax_distributed(cur, dinv_np, ranges)

        levels.append(Level(
            a=ell_from_scipy(cur, dtype=dtype),
            dinv=jnp.asarray(dinv_np, dtype),
            p=Ell(col=jnp.asarray(p_col), val=jnp.asarray(p_val, dtype),
                  n_cols=nc),
            r=ell_from_scipy(pt, dtype=dtype),
            lmax=jnp.asarray(lmax, dtype)))
        exchanges.append(dict(n=n, ghost_rows=int(ghost_rows)))
        host_ops.append(ac_sp)
        cur = ac_sp

    dense = np.asarray(cur.toarray(), np.float64)
    fac = _coarse_factor(dense, params)
    hier = Hierarchy(levels=tuple(levels),
                     coarse_chol=jnp.asarray(fac, dtype),
                     coarse_a=jnp.asarray(dense, dtype),
                     params=params)
    dh = partition_hierarchy(hier, ndev, agg_rows_per_dev=agg_rows_per_dev,
                             transport=transport, routed=routed)
    if mesh is not None:
        dh = place_hierarchy(dh, mesh)
    if cache is not None:
        cache.params = params
        cache.ndev = ndev
        cache.part_kw = dict(agg_rows_per_dev=agg_rows_per_dev,
                             transport=transport, routed=routed)
        cache.mesh = mesh
    if keep_host:
        return dh, hier, host_ops
    return dh


def dist_pmis_refresh(a_new, cache: DistSetupCache, *,
                      verify_mask: bool = True, keep_host: bool = False):
    """Value-only rebuild of a cached per-shard PMIS hierarchy.

    The distributed analog of :func:`omp_amg_tpu.amg.refresh.amg_refresh`
    (VERDICT r4 missing #1): strength graphs, C/F splits, the coarse
    numbering, interpolation patterns and every per-shard Galerkin
    pattern come from ``cache``; only VALUES are recomputed, per shard,
    with the same ghost-row semantics as the fresh setup:

    - strength: per-shard mask recomputed from the new values and
      compared with the cache (``verify_mask``) — drift raises
      :class:`~omp_amg_tpu.amg.refresh.PatternChangedError`;
    - ext+i: per-shard numeric re-run on the compact ghost systems;
      near-tie truncation flips are repaired with the selection pinned
      to the cached pattern (full-system ``extpi_pinned_rows``, exactly
      the serial refresh's semantics — partition-invariant since ext+i
      reads only distance ≤ 1 rows); an unrepairable pattern change
      raises;
    - Galerkin: per-shard numeric-only SpGEMM (csrc ``spgemm_numeric``)
      into the cached A·P and Pᵀ_l·(A·P) patterns, assembled through the
      cached keep map; a structurally-eliminated entry turning nonzero
      raises;
    - Pᵀ values come from P through the cached transpose permutation —
      no per-refresh transpose;
    - dinv/λmax: recomputed with the canonical partition-invariant
      reductions.

    The refreshed hierarchy equals a fresh ``dist_pmis_setup`` on the new
    operator exactly in structure and to f32 roundoff in values (pinned
    across 1/2/8 shards by tests/test_dist_pmis_setup.py). The device
    partitioning (plans/padding) is re-derived from the refreshed host
    values — geometry-identical since the patterns are unchanged.
    """
    import scipy.sparse as sp

    import jax.numpy as jnp

    from ..amg.hierarchy import Hierarchy, Level, _coarse_factor
    from ..amg.refresh import PatternChangedError
    from ..sparse.formats import (
        Ell, dia_to_scipy, ell_from_scipy, ell_planes_from_scipy,
        ell_planes_to_scipy,
    )
    from ..utils.memtune import tune_malloc
    from .. import native
    from .partition import partition_hierarchy, place_hierarchy

    tune_malloc()
    if cache.params is None:
        raise ValueError("cache was not produced by dist_pmis_setup")
    params = cache.params
    dtype = jnp.float32

    if hasattr(a_new, "offsets"):
        a_sp = sp.csr_matrix(dia_to_scipy(a_new))
    else:
        a_sp = sp.csr_matrix(a_new)
    a_sp = a_sp.astype(np.float64)
    a_sp.sort_indices()

    levels = []
    host_ops = [a_sp]
    cur_data = np.ascontiguousarray(a_sp.data, np.float64)
    for li, lc in enumerate(cache.levels):
        ip, ix, ncols = lc["a_pat"]
        if li == 0:
            if (a_sp.shape != (len(ip) - 1, ncols)
                    or a_sp.nnz != len(ix)
                    or not np.array_equal(a_sp.indices, ix)
                    or not np.array_equal(a_sp.indptr, ip)):
                raise PatternChangedError("L0: CSR pattern changed")
        cur = sp.csr_matrix((cur_data, ix, ip),
                            shape=(len(ip) - 1, ncols))
        cur.has_sorted_indices = True
        n, nc = lc["n"], lc["nc"]
        ranges = lc["ranges"]
        state, cmap = lc["state"], lc["cmap"]
        col, val, _ = ell_planes_from_scipy(cur, dtype=np.float32)
        if col.shape != lc["mask"].shape:
            raise PatternChangedError(f"L{li}: ELL width changed")
        if verify_mask:
            m2 = _strength_mask_ranges(col, val, params.theta, ranges)
            if not np.array_equal(m2, lc["mask"]):
                raise PatternChangedError(f"L{li}: strength mask changed")

        kP = params.interp_max_elements
        p_col = np.zeros((n, kP), np.int32)
        p_val = np.zeros((n, kP), np.float32)
        for (r0, r1) in ranges:
            g2 = _ghost_ids(cur, r0, r1, 2)
            pc, pv = _extpi_shard(cur, r0, r1, g2, state, cmap, nc,
                                  params.theta, kP)
            p_col[r0:r1] = pc
            p_val[r0:r1] = pv
        if not np.array_equal(p_col, lc["p_col"]) or not np.array_equal(
                p_val != 0, lc["p_valid"]):
            # near-tie truncation flips: recompute JUST those rows with
            # the truncation selection pinned to the cached pattern,
            # mirroring the serial refresh (amg/refresh.py). The repair
            # runs on the full-system planes — partition-invariant by
            # construction (ext+i reads only distance ≤ 1 rows, which
            # every shard's compact system preserves for its owned rows,
            # so full-system == per-shard values bitwise).
            bad = np.flatnonzero((p_col != lc["p_col"]).any(axis=1)
                                 | ((p_val != 0)
                                    != lc["p_valid"]).any(axis=1))
            try:
                pv_rows = hs.extpi_pinned_rows(
                    col, val, lc["mask"], state, cmap, nc, bad,
                    lc["p_col"], lc["p_valid"])
            except ValueError as e:
                raise PatternChangedError(f"L{li}: {e}") from e
            p_col = lc["p_col"]
            p_val = p_val.copy()
            p_val[bad] = pv_rows
            p_val[~lc["p_valid"]] = 0
        p_sp = ell_planes_to_scipy(p_col, p_val.astype(np.float64), nc)
        p_sp = p_sp.tocsr()
        p_sp.sort_indices()
        p_data = np.ascontiguousarray(p_sp.data, np.float64)
        pt_data = native.perm_gather(lc["pt_perm"], p_data)
        pt_indptr = lc["pt_indptr"]

        # per-shard Galerkin numeric into the cached patterns
        acs_vals = []
        for si, sh in enumerate(lc["shards"]):
            if sh is None:
                continue
            a_rows_data = native.perm_gather(sh["a_sel"], cur_data)
            ap_val = native.spgemm_numeric(sh["a_pat"], a_rows_data,
                                           (p_sp.indptr, p_sp.indices, nc),
                                           p_data, sh["ap_pat"])
            ptl_data = pt_data[pt_indptr[sh["c_lo"]]:pt_indptr[sh["c_hi"]]]
            acs_vals.append(native.spgemm_numeric(
                sh["ptl_pat"], ptl_data, sh["ap_pat"], ap_val,
                sh["acs_pat"]))
        stacked = (np.concatenate(acs_vals) if acs_vals
                   else np.zeros(0, np.float64))
        dropped = lc["dropped"]
        if len(dropped):
            scale = np.abs(stacked).max() if len(stacked) else 1.0
            # f32-roundoff-sized tolerance, matching the serial refresh
            # guard (amg/refresh.py::_rap_numeric): interpolation values
            # flow through f32 planes, so non-dyadic value changes leave
            # ~1e-8·scale residue on setup-cancelled entries; that noise
            # is dropped either way, only larger drift is a real pattern
            # change
            if np.abs(stacked[dropped]).max() > 1e-6 * max(scale, 1e-300):
                raise PatternChangedError(
                    f"L{li}: Galerkin entry eliminated at setup became "
                    "nonzero")
        ac_data = native.perm_gather(lc["keep"], stacked)

        if params.smoother == "l1jacobi":
            dinv_np = 1.0 / np.asarray(np.abs(cur).sum(axis=1)).ravel()
        else:
            dinv_np = 1.0 / cur.diagonal()
        lmax = _lmax_distributed(cur, dinv_np, ranges)

        pt = sp.csr_matrix((pt_data, *_pt_pattern_of(p_sp)),
                           shape=(nc, n))
        levels.append(Level(
            a=ell_from_scipy(cur, dtype=dtype),
            dinv=jnp.asarray(dinv_np, dtype),
            p=Ell(col=jnp.asarray(p_col), val=jnp.asarray(p_val, dtype),
                  n_cols=nc),
            r=ell_from_scipy(pt, dtype=dtype),
            lmax=jnp.asarray(lmax, dtype)))
        cur_data = ac_data
        ac_ip, ac_ix, _ = lc["ac_pat"]
        host_ops.append(sp.csr_matrix((ac_data, ac_ix, ac_ip),
                                      shape=(nc, nc)))

    last = host_ops[-1]
    dense = np.asarray(last.toarray(), np.float64)
    fac = _coarse_factor(dense, params)
    hier = Hierarchy(levels=tuple(levels),
                     coarse_chol=jnp.asarray(fac, dtype),
                     coarse_a=jnp.asarray(dense, dtype),
                     params=params)
    dh = partition_hierarchy(hier, cache.ndev, **cache.part_kw)
    if cache.mesh is not None:
        dh = place_hierarchy(dh, cache.mesh)
    if keep_host:
        return dh, hier, host_ops
    return dh


def _pt_pattern_of(p_sp):
    """(indices, indptr) of Pᵀ in CSR — structural transpose only (values
    come from the cached permutation); scipy's .T.tocsr() on a pattern
    copy keeps this deterministic and identical to the fresh setup's."""
    import scipy.sparse as sp

    tag = sp.csr_matrix((np.ones(p_sp.nnz), p_sp.indices, p_sp.indptr),
                        shape=p_sp.shape)
    pt = tag.T.tocsr()
    pt.sort_indices()
    return pt.indices, pt.indptr


def _lmax_distributed(a_csr, dinv, ranges, iters: int = 20):
    """Power iteration: shard-local SpMV (ghost x) + canonical reductions."""
    n = a_csr.shape[0]
    v = hs.hash01_np(np.arange(n)).astype(np.float64) - 0.5
    v = v / _canon_norm(v)

    def apply(v):
        w = np.empty(n, np.float64)
        for (r0, r1) in ranges:
            w[r0:r1] = dinv[r0:r1] * (a_csr[r0:r1] @ v)
        return w

    for _ in range(iters):
        w = apply(v)
        v = w / _canon_norm(w)
    w = apply(v)
    return _canon_sum(v * w) / _canon_sum(v * v)
