"""Distributed PMIS setup: bit-identity across shard counts + solve parity.

SURVEY.md §2 #22 contract: the per-shard setup (ghost-row semantics) must
produce the same hierarchy at every shard count — that is what the
deterministic hash01 PMIS weights buy — and the sharded solve must match.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.parallel.dist import make_dist_solver
from omp_amg_tpu.parallel.dist_pmis_setup import dist_pmis_setup
from omp_amg_tpu.parallel.partition import pad_vector, unpad_vector


def _hier_arrays(hier):
    out = []
    for lv in hier.levels:
        out.append(("a.col", np.asarray(lv.a.col)))
        out.append(("a.val", np.asarray(lv.a.val)))
        out.append(("p.col", np.asarray(lv.p.col)))
        out.append(("p.val", np.asarray(lv.p.val)))
        out.append(("dinv", np.asarray(lv.dinv)))
        out.append(("lmax", np.asarray(lv.lmax)))
    out.append(("coarse", np.asarray(hier.coarse_a)))
    return out


@pytest.mark.parametrize("gen,n", [(amg.poisson3d_7pt, 20),
                                   (amg.poisson2d_5pt, 48)])
def test_bit_identical_across_shard_counts(gen, n):
    a = gen(n)
    results = {}
    for ndev in (1, 2, 8):
        _, hier, hops = dist_pmis_setup(a, ndev, keep_host=True)
        results[ndev] = (_hier_arrays(hier), hops)
    base_arrays, base_ops = results[1]
    for ndev in (2, 8):
        arrays, hops = results[ndev]
        assert len(arrays) == len(base_arrays)
        for (name, ref), (_, got) in zip(base_arrays, arrays):
            np.testing.assert_array_equal(ref, got, err_msg=f"{ndev} {name}")
        for l, (h1, h2) in enumerate(zip(base_ops, hops)):
            assert (h1 != h2).nnz == 0, f"level {l} operator differs"
            np.testing.assert_array_equal(h1.data, h2.data)


def test_matches_serial_setup():
    """The per-shard hierarchy must match the serial amg_setup result:
    same C/F split, same patterns, values within f64 lmax reduction-order
    tolerance (the only non-bit-equal piece vs serial is the canonical
    lmax reduction)."""
    a = amg.poisson3d_7pt(20)
    prm = AMGParams(coarsening="pmis", interp="extpi")
    _, hier_d, hops_d = dist_pmis_setup(a, 4, prm, keep_host=True)
    hier_s, hops_s = amg_setup(a, prm, keep_host=True)
    assert len(hops_d) == len(hops_s)
    for l, (hd, hs_) in enumerate(zip(hops_d, hops_s)):
        hd = sp.csr_matrix(hd)
        hs_ = sp.csr_matrix(hs_)
        assert hd.shape == hs_.shape, l
        d = abs(hd - hs_)
        scale = abs(hs_).max()
        assert (d.max() if d.nnz else 0.0) <= 1e-12 * scale, l
    for lv_d, lv_s in zip(hier_d.levels, hier_s.levels):
        np.testing.assert_allclose(np.asarray(lv_d.lmax),
                                   np.asarray(lv_s.lmax), rtol=1e-5)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_solve_parity(ndev):
    """Solve through the distributed-setup hierarchy: same iteration count
    at every shard count and vs the 1-shard mesh."""
    a = amg.poisson3d_7pt(20)
    b = amg.default_rhs(a, "random", seed=0)
    a_sp = amg.dia_to_scipy(a)

    iters_by = {}
    for nd in (1, ndev):
        mesh = jax.make_mesh((nd,), ("rows",))
        dh = dist_pmis_setup(a, nd, mesh=mesh, agg_rows_per_dev=512)
        solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=60)
        xp, iters, rel = solve(dh, pad_vector(b, dh, nd))
        x = unpad_vector(xp, a.n_rows)
        r = np.asarray(b, np.float64) - a_sp @ np.asarray(x, np.float64)
        true_rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(b))
        assert true_rel < 1e-5
        iters_by[nd] = int(iters)
    assert iters_by[1] == iters_by[ndev]


def test_dist_refresh_matches_fresh_across_shards():
    """Value-only distributed refresh (round 5, VERDICT r4 missing #1):
    for a same-sparsity operator, dist_pmis_refresh must reproduce a
    FRESH per-shard setup — same structure, values to f32 roundoff — at
    every shard count, reusing every cached symbolic decision."""
    import numpy as np

    import omp_amg_tpu as amg
    from omp_amg_tpu.amg.params import AMGParams
    from omp_amg_tpu.parallel.dist_pmis_setup import (
        DistSetupCache, dist_pmis_refresh, dist_pmis_setup,
    )
    from omp_amg_tpu.sparse.formats import Dia

    a = amg.poisson3d_7pt(20)
    a2 = Dia(data=np.asarray(a.data) * 2.0, offsets=a.offsets, dims=a.dims)
    prm = AMGParams(coarsening="pmis")
    for ndev in (1, 2, 8):
        cache = DistSetupCache()
        dist_pmis_setup(a, ndev, prm, cache=cache)
        _, h_ref, ops_ref = dist_pmis_refresh(a2, cache, keep_host=True)
        _, h_fresh, ops_fresh = dist_pmis_setup(a2, ndev, prm,
                                                keep_host=True)
        assert len(h_ref.levels) == len(h_fresh.levels)
        for lr, lf in zip(h_ref.levels, h_fresh.levels):
            np.testing.assert_array_equal(np.asarray(lr.p.col),
                                          np.asarray(lf.p.col))
            np.testing.assert_allclose(np.asarray(lr.p.val),
                                       np.asarray(lf.p.val), rtol=2e-6,
                                       atol=1e-7)
            np.testing.assert_allclose(np.asarray(lr.dinv),
                                       np.asarray(lf.dinv), rtol=2e-6)
            np.testing.assert_allclose(float(lr.lmax), float(lf.lmax),
                                       rtol=1e-4)
        for mr, mf in zip(ops_ref[1:], ops_fresh[1:]):
            assert (mr.indptr == mf.indptr).all()
            assert (mr.indices == mf.indices).all()
            np.testing.assert_allclose(mr.data, mf.data, rtol=1e-12)


def test_dist_refresh_repairs_non_dyadic_tie_flips():
    """Round-5 session-3: a NON-dyadic value change (×1.7) flips near-tie
    ext+i truncation decisions; the distributed refresh must repair them
    with the selection pinned to the cached pattern (like the serial
    refresh) instead of raising — and stay partition-invariant."""
    import numpy as np

    import omp_amg_tpu as amg
    from omp_amg_tpu.amg.params import AMGParams
    from omp_amg_tpu.parallel.dist_pmis_setup import (
        DistSetupCache, dist_pmis_refresh,
        dist_pmis_setup,
    )
    from omp_amg_tpu.sparse.formats import Dia

    a = amg.poisson3d_7pt(20)
    a2 = Dia(data=np.asarray(a.data) * 1.7, offsets=a.offsets, dims=a.dims)
    prm = AMGParams(coarsening="pmis")
    ref_vals = None
    for ndev in (1, 2, 8):
        cache = DistSetupCache()
        dist_pmis_setup(a, ndev, prm, cache=cache)
        _, h_ref, _ = dist_pmis_refresh(a2, cache, keep_host=True)
        # pattern pinned to the cached one
        for lr, lc in zip(h_ref.levels, cache.levels):
            np.testing.assert_array_equal(np.asarray(lr.p.col),
                                          lc["p_col"])
        vals = [np.asarray(lv.p.val) for lv in h_ref.levels]
        if ref_vals is None:
            ref_vals = vals
        else:  # repaired values identical across shard counts
            for v1, v2 in zip(ref_vals, vals):
                np.testing.assert_array_equal(v1, v2)


def test_dist_refresh_detects_pattern_change():
    import numpy as np

    import omp_amg_tpu as amg
    from omp_amg_tpu.amg.params import AMGParams
    from omp_amg_tpu.amg.refresh import PatternChangedError
    from omp_amg_tpu.parallel.dist_pmis_setup import (
        DistSetupCache, dist_pmis_refresh, dist_pmis_setup,
    )
    from omp_amg_tpu.sparse.formats import Dia

    a = amg.poisson2d_5pt(24)
    cache = DistSetupCache()
    dist_pmis_setup(a, 2, AMGParams(coarsening="pmis"), cache=cache)
    data = np.asarray(a.data).copy()
    for i, o in enumerate(a.offsets):
        if abs(o) == 1:
            data[i] *= 1e-6
    with pytest.raises(PatternChangedError):
        dist_pmis_refresh(Dia(data=data, offsets=a.offsets, dims=a.dims),
                          cache)


def test_facade_dist_refresh_solves():
    """AMGSolver(mesh=..., refreshable=True).refresh(a_new) — the
    NotImplementedError for the distributed family is gone (PMIS)."""
    import numpy as np

    import jax

    import omp_amg_tpu as amg
    from omp_amg_tpu.amg.params import AMGParams
    from omp_amg_tpu.sparse.formats import Dia

    mesh = jax.make_mesh((4,), ("rows",))
    a = amg.poisson3d_7pt(16)
    s = amg.AMGSolver(a, AMGParams(coarsening="pmis"), mesh=mesh,
                      agg_rows_per_dev=64, refreshable=True)
    b = amg.default_rhs(a, "random", seed=0)
    x1 = s.solve(b, tol=1e-8)
    a2 = Dia(data=np.asarray(a.data) * 4.0, offsets=a.offsets, dims=a.dims)
    s.refresh(a2)
    x2 = s.solve(b, tol=1e-8)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1) / 4.0,
                               rtol=1e-6, atol=1e-9)
    assert s.last_info["certified_f64"] and s.last_info["distributed"]
