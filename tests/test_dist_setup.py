"""Distributed (per-shard) structured setup tests — 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.parallel.dist import AXIS, make_dist_solver
from omp_amg_tpu.parallel.dist_setup import dist_structured_setup
from omp_amg_tpu.parallel.partition import pad_vector, unpad_vector
from omp_amg_tpu.parallel.slab import SlabDia
from omp_amg_tpu.sparse.formats import PlaneDia, plane_to_dia


def make_mesh(ndev):
    return jax.make_mesh((ndev,), (AXIS,))


def _level_dia(lv):
    from omp_amg_tpu.sparse.formats import ConstDia, const_to_dia

    a = lv.a
    if isinstance(a, ConstDia):
        a = const_to_dia(a)
    if isinstance(a, PlaneDia):
        a = plane_to_dia(a)
    return a


@pytest.mark.parametrize("maker,n,grid", [
    ("poisson3d_7pt", 16, (16, 16, 16)),
    ("poisson3d_27pt", 16, (16, 16, 16)),
    ("aniso2d_9pt", 32, (32, 32)),
])
def test_dist_setup_matches_host_setup(maker, n, grid):
    a = getattr(amg, maker)(n)
    params = AMGParams(coarse_size=60)
    mesh = make_mesh(4)
    dh = dist_structured_setup(a, grid, mesh, params, agg_rows_per_dev=32)
    hier = amg_setup(a, params, grid=grid)

    assert len(dh.levels) == len(hier.levels)
    assert isinstance(dh.levels[0].a, SlabDia)
    for dl, hl in zip(dh.levels, hier.levels):
        h_a = _level_dia(hl)
        assert tuple(dl.a.offsets) == tuple(h_a.offsets)
        np.testing.assert_allclose(np.asarray(dl.a.data),
                                   np.asarray(h_a.data, np.float32),
                                   rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(float(dl.lmax), float(hl.lmax), rtol=1e-3)


def test_dist_setup_bitwise_deterministic_across_shard_counts():
    a = amg.poisson3d_7pt(16)
    params = AMGParams(coarse_size=60)
    datas = {}
    for ndev in (2, 8):
        dh = dist_structured_setup(a, (16, 16, 16), make_mesh(ndev), params,
                                   agg_rows_per_dev=16)
        datas[ndev] = [np.asarray(lv.a.data) for lv in dh.levels
                       if isinstance(lv.a, SlabDia)]
    assert len(datas[2]) >= 2
    for d2, d8 in zip(datas[2], datas[8]):
        assert np.array_equal(d2, d8), "setup not bit-stable across shards"


@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_setup_solve_matches_single_device(ndev):
    a = amg.poisson3d_7pt(16)
    a_sp = amg.dia_to_scipy(a)
    params = AMGParams(coarse_size=60)
    mesh = make_mesh(ndev)
    dh = dist_structured_setup(a, (16, 16, 16), mesh, params,
                               agg_rows_per_dev=32)
    hier = amg_setup(a, params, grid=(16, 16, 16))
    b = amg.default_rhs(a, "random", seed=0)

    from omp_amg_tpu.solvers.cg import amg_pcg

    res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=100)
    x, iters, rel = solve(dh, pad_vector(b, dh, ndev))
    assert abs(int(iters) - int(res.iters)) <= 1
    x = unpad_vector(x, a.n_rows)
    true_rel = np.linalg.norm(
        np.asarray(b, np.float64) - a_sp @ np.asarray(x, np.float64)
    ) / np.linalg.norm(np.asarray(b, np.float64))
    assert true_rel <= 5e-5
