"""Routed-ELL plans in the sharded PMIS path (SURVEY §2 #22 follow-up:
the distributed general-sparsity SpMV must not be gather-bound on TPU).

On the CPU mesh the routed window plans execute through the XLA
emulation; the test pins exact operator equivalence (plan → scipy
round-trip per shard window) and solve parity vs the gather formulation.
"""

import numpy as np
import pytest

import jax

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.parallel.dist import make_dist_solver
from omp_amg_tpu.parallel.partition import (
    pad_vector, partition_hierarchy, place_hierarchy, unpad_vector,
)


@pytest.mark.parametrize("ndev", [2, 8])
def test_routed_dist_solve_matches_gather(ndev):
    a = amg.poisson3d_7pt(20)
    b = amg.default_rhs(a, "random", seed=0)
    a_sp = amg.dia_to_scipy(a)
    hier = amg_setup(a, AMGParams(coarsening="pmis", interp="extpi",
                                  routed="off"))
    mesh = jax.make_mesh((ndev,), ("rows",))

    results = {}
    for routed in (False, True):
        dh = place_hierarchy(
            partition_hierarchy(hier, ndev, agg_rows_per_dev=512,
                                routed=routed), mesh)
        if routed:
            assert any(
                getattr(lv.a, "rt_val4", None) is not None
                for lv in dh.levels if getattr(lv.a, "mode", "") == "halo"), \
                "no routed plan was built on any halo level"
        solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=60)
        xp, iters, rel = solve(dh, pad_vector(b, dh, ndev))
        x = np.asarray(unpad_vector(xp, a.n_rows), np.float64)
        r = np.asarray(b, np.float64) - a_sp @ x
        true_rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(b))
        assert true_rel < 1e-5, (routed, true_rel)
        results[routed] = (int(iters), x)

    assert results[False][0] == results[True][0]
    np.testing.assert_allclose(results[True][1], results[False][1],
                               rtol=0, atol=1e-5 * abs(results[False][1]).max())


def test_routed_window_plans_roundtrip():
    """Each shard's stacked plan decodes back to its local window matrix."""
    import scipy.sparse as sp

    from omp_amg_tpu.parallel.partition import _make_dist_op, _ell_np

    a = amg.poisson3d_7pt(16)
    hier = amg_setup(a, AMGParams(coarsening="pmis", interp="extpi",
                                  routed="off"))
    lv = hier.levels[0]
    a_col, a_val, _ = _ell_np(lv.a)
    ndev = 4
    n = a_col.shape[0]
    import math
    m = math.ceil(n / ndev)
    op = _make_dist_op(a_col, a_val, ndev=ndev, out_sharded=True,
                       in_sharded=True, m_in=m, n_in_real=n, routed=True)
    assert op.mode == "halo" and op.rt_val4 is not None
    from omp_amg_tpu.sparse.routed import RoutedEll, routed_to_scipy

    nc = op.rt_val4.shape[0] // ndev
    colp = np.asarray(op.col)
    valp = np.asarray(op.val)
    for s in range(ndev):
        rt = RoutedEll(
            val4=op.rt_val4[s * nc:(s + 1) * nc],
            lidx4=op.rt_lidx4[s * nc:(s + 1) * nc],
            soff=op.rt_soff[s * nc:(s + 1) * nc],
            cbase=op.rt_cbase[s:s + 1],
            kch=op.rt_kch[s:s + 1],
            sbase=op.rt_sbase[s:s + 1],
            n_rows=m, n_cols=op.m_in + 2 * op.halo,
            span=op.rt_span, nxp=op.rt_nxp, nnz=0,
            kmax=op.rt_kmax, resident=op.rt_resident)
        got = sp.csr_matrix(routed_to_scipy(rt))
        c = colp[s * m:(s + 1) * m]
        v = valp[s * m:(s + 1) * m]
        rows = np.repeat(np.arange(m), c.shape[1])
        valid = (v != 0).ravel()
        ref = sp.csr_matrix(
            (v.ravel()[valid].astype(np.float64),
             (rows[valid], c.ravel()[valid])),
            shape=(m, op.m_in + 2 * op.halo))
        d = abs(got.astype(np.float64) - ref)
        assert (d.max() if d.nnz else 0.0) < 1e-6, s
