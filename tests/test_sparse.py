"""Sparse format + SpMV oracle tests (scipy is the oracle; SURVEY.md §4)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from omp_amg_tpu.sparse import formats as F
from omp_amg_tpu.ops.spmv import spmv, spmv_csr, spmv_dia, spmv_ell, spmv_t_ell
from omp_amg_tpu.problems.poisson import (
    aniso2d_9pt, poisson2d_5pt, poisson3d_7pt, poisson3d_27pt,
)


def random_csr(n, m, density, seed):
    rng = np.random.default_rng(seed)
    a = sp.random(n, m, density=density, random_state=rng, format="csr")
    a.data = rng.standard_normal(a.nnz)
    # ensure at least one entry per row so ELL width > 0
    d = sp.coo_matrix((rng.standard_normal(min(n, m)) + 2.0,
                       (np.arange(min(n, m)), np.arange(min(n, m)))), shape=(n, m))
    return (a + d).tocsr()


@pytest.mark.parametrize("n,m", [(50, 50), (64, 33), (1, 1), (17, 90)])
def test_csr_ell_roundtrip_and_spmv(n, m):
    a = random_csr(n, m, 0.1, seed=n * 100 + m)
    x = np.random.default_rng(1).standard_normal(m)
    y_ref = a @ x

    acsr = F.csr_from_scipy(a)
    aell = F.ell_from_scipy(a)
    xj = jnp.asarray(x, dtype=jnp.float32)

    np.testing.assert_allclose(spmv_csr(acsr, xj), y_ref, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(spmv_ell(aell, xj), y_ref, rtol=2e-5, atol=1e-5)

    # roundtrips preserve the matrix exactly (structure + f32 values)
    back = F.csr_to_scipy(acsr)
    assert (abs(back - a) > 1e-6).nnz == 0
    back2 = F.ell_to_scipy(aell)
    assert (abs(back2 - a) > 1e-6).nnz == 0


def test_ell_transpose_spmv():
    a = random_csr(40, 23, 0.15, seed=7)
    aell = F.ell_from_scipy(a)
    x = np.random.default_rng(2).standard_normal(40)
    xj = jnp.asarray(x, dtype=jnp.float32)
    np.testing.assert_allclose(spmv_t_ell(aell, xj), a.T @ x, rtol=2e-5, atol=1e-5)
    at = F.transpose_ell(aell)
    np.testing.assert_allclose(spmv_ell(at, xj), a.T @ x, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("gen,args", [
    (poisson2d_5pt, (9, 7)),
    (poisson3d_7pt, (5, 4, 3)),
    (poisson3d_27pt, (4, 5, 3)),
    (aniso2d_9pt, (8, 6)),
])
def test_generators_dia_vs_scipy(gen, args):
    adia = gen(*args)
    a_sp = F.dia_to_scipy(adia)
    n = adia.n_rows
    assert a_sp.shape == (n, n)
    # symmetric operator
    assert abs(a_sp - a_sp.T).max() < 1e-12
    # DIA spmv matches scipy
    x = np.random.default_rng(3).standard_normal(n)
    xj = jnp.asarray(x, dtype=jnp.float32)
    np.testing.assert_allclose(spmv_dia(adia, xj), a_sp @ x, rtol=2e-5, atol=1e-4)
    # conversions agree
    aell = F.dia_to_ell(adia)
    np.testing.assert_allclose(spmv(aell, xj), a_sp @ x, rtol=2e-5, atol=1e-4)
    # roundtrip through scipy dia
    adia2 = F.dia_from_scipy(a_sp)
    np.testing.assert_allclose(spmv_dia(adia2, xj), a_sp @ x, rtol=2e-5, atol=1e-4)


def test_5pt_row_sums_and_diag():
    a = poisson2d_5pt(6)
    a_sp = F.dia_to_scipy(a)
    # interior rows sum to 0; boundary rows positive (Dirichlet elimination)
    rs = np.asarray(a_sp.sum(axis=1)).ravel()
    assert rs.min() >= 0
    assert (rs > 0).sum() == 6 * 6 - 4 * 4
    d = np.asarray(F.diagonal(a))
    np.testing.assert_allclose(d, 4.0)
    dell = np.asarray(F.diagonal(F.dia_to_ell(a)))
    np.testing.assert_allclose(dell, 4.0)


def test_coo_assembly_sums_duplicates():
    rows = [0, 0, 1, 2, 2]
    cols = [0, 0, 1, 0, 2]
    vals = [1.0, 2.0, 5.0, 1.0, 4.0]
    a = F.coo_to_csr(rows, cols, vals, shape=(3, 3))
    dense = F.csr_to_scipy(a).toarray()
    np.testing.assert_allclose(dense, [[3, 0, 0], [0, 5, 0], [1, 0, 4]])


def test_device_backend_generator_matches_host():
    for gen, args in [(poisson3d_7pt, (8,)), (poisson2d_5pt, (9, 7)),
                      (aniso2d_9pt, (8,)), (poisson3d_27pt, (5,))]:
        a_h = gen(*args)
        a_d = gen(*args, backend="device")
        assert a_h.offsets == a_d.offsets
        np.testing.assert_allclose(np.asarray(a_d.data), np.asarray(a_h.data),
                                   rtol=1e-6, atol=0)


def test_ell_planes_from_scipy_does_not_mutate_caller():
    """ADVICE r3 (low): an unsorted CSR input must not be canonicalized in
    place (sp.csr_matrix(csr) shares the caller's arrays)."""
    import scipy.sparse as sp

    rows = np.array([0, 0, 1, 1])
    cols = np.array([2, 0, 1, 0])
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    a = sp.csr_matrix((vals, (rows, cols)), shape=(2, 3)).tocsr()
    # force an unsorted-indices CSR
    a.indices[:2] = a.indices[:2][::-1]
    a.data[:2] = a.data[:2][::-1]
    a.has_sorted_indices = False
    idx_before = a.indices.copy()
    from omp_amg_tpu.sparse.formats import ell_planes_from_scipy

    col, val, nc = ell_planes_from_scipy(a)
    np.testing.assert_array_equal(a.indices, idx_before)  # untouched
    # and the conversion itself is correct
    b = np.zeros((2, 3))
    for i in range(2):
        for j in range(col.shape[1]):
            if val[i, j] != 0:
                b[i, col[i, j]] += val[i, j]
    np.testing.assert_array_equal(b, a.toarray())
