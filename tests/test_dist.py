"""Distributed (shard_map) layer tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.parallel.dist import (
    AXIS, dist_spmv, dist_specs, make_dist_solver, make_dist_vcycle,
)
from omp_amg_tpu.parallel.partition import (
    pad_vector, partition_hierarchy, place_hierarchy, unpad_vector,
)
from omp_amg_tpu.amg.vcycle import vcycle
from omp_amg_tpu.solvers.cg import amg_pcg


def make_mesh(ndev):
    return jax.make_mesh((ndev,), (AXIS,))


@pytest.mark.parametrize("ndev", [1, 2, 4, 8])
def test_dist_spmv_matches_scipy(ndev):
    a = amg.poisson3d_7pt(12)  # 1728 rows
    a_sp = amg.dia_to_scipy(a)
    hier = amg_setup(a, AMGParams(coarse_size=50))
    dh = partition_hierarchy(hier, ndev, agg_rows_per_dev=64)
    mesh = make_mesh(ndev)
    dh = place_hierarchy(dh, mesh)
    x = np.random.default_rng(0).standard_normal(a.n_rows)
    xp = pad_vector(jnp.asarray(x, jnp.float32), dh, ndev)

    op = dh.levels[0].a
    f = jax.jit(jax.shard_map(
        dist_spmv, mesh=mesh,
        in_specs=(dist_specs(dh).levels[0].a, P(AXIS)), out_specs=P(AXIS),
    ))
    y = unpad_vector(f(op, xp), a.n_rows)
    np.testing.assert_allclose(np.asarray(y), a_sp @ x, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_vcycle_matches_single_device(ndev):
    a = amg.poisson2d_5pt(32)
    hier = amg_setup(a, AMGParams(coarse_size=40))
    mesh = make_mesh(ndev)
    dh = place_hierarchy(partition_hierarchy(hier, ndev, agg_rows_per_dev=64),
                         mesh)
    b = amg.default_rhs(a, "random", seed=3)
    z_single = np.asarray(jax.jit(vcycle)(hier, b))
    z_dist = np.asarray(unpad_vector(
        make_dist_vcycle(mesh, dh)(dh, pad_vector(b, dh, ndev)), a.n_rows))
    err = np.linalg.norm(z_dist - z_single) / np.linalg.norm(z_single)
    assert err < 1e-5, f"sharded V-cycle deviates: {err}"


@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_pcg_matches_single_device(ndev):
    a = amg.poisson3d_7pt(12)
    a_sp = amg.dia_to_scipy(a)
    hier = amg_setup(a, AMGParams(coarse_size=50))
    mesh = make_mesh(ndev)
    dh = place_hierarchy(partition_hierarchy(hier, ndev, agg_rows_per_dev=64),
                         mesh)
    b = amg.default_rhs(a, "random", seed=0)

    res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=100)
    x, iters, rel = solve(dh, pad_vector(b, dh, ndev))
    x = unpad_vector(x, a.n_rows)

    # same iteration count; same solution within float-reduction tolerance
    assert int(iters) == int(res.iters), (int(iters), int(res.iters))
    true_rel = np.linalg.norm(
        np.asarray(b, np.float64) - a_sp @ np.asarray(x, np.float64)
    ) / np.linalg.norm(np.asarray(b, np.float64))
    assert float(rel) <= 1e-6
    assert true_rel <= 5e-5
    np.testing.assert_allclose(np.asarray(x),
                               np.asarray(res.x), rtol=2e-3, atol=2e-4)


def test_dist_solution_identical_across_shard_counts():
    """Structure-determinism contract: same solve on 2 vs 8 shards."""
    a = amg.poisson2d_5pt(40)
    hier = amg_setup(a)
    sols = {}
    for ndev in (2, 8):
        mesh = make_mesh(ndev)
        dh = place_hierarchy(
            partition_hierarchy(hier, ndev, agg_rows_per_dev=64), mesh)
        solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=100)
        x, iters, rel = solve(dh, pad_vector(amg.default_rhs(a, "random", 0),
                                             dh, ndev))
        sols[ndev] = (np.asarray(unpad_vector(x, a.n_rows)), int(iters))
    assert sols[2][1] == sols[8][1]
    np.testing.assert_allclose(sols[2][0], sols[8][0], rtol=2e-3, atol=2e-4)


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == args[1].shape
    ge.dryrun_multichip(8)


@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_structured_hierarchy(ndev):
    """Sharded solve over a structured (grid-transfer) hierarchy."""
    a = amg.poisson3d_7pt(16)
    a_sp = amg.dia_to_scipy(a)
    hier = amg_setup(a, grid=(16, 16, 16))
    mesh = make_mesh(ndev)
    dh = place_hierarchy(partition_hierarchy(hier, ndev, agg_rows_per_dev=64),
                         mesh)
    b = amg.default_rhs(a, "random", seed=0)
    res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=100)
    x, iters, rel = solve(dh, pad_vector(b, dh, ndev))
    assert int(iters) == int(res.iters), (int(iters), int(res.iters))
    x = unpad_vector(x, a.n_rows)
    true_rel = np.linalg.norm(
        np.asarray(b, np.float64) - a_sp @ np.asarray(x, np.float64)
    ) / np.linalg.norm(np.asarray(b, np.float64))
    assert true_rel <= 5e-5


@pytest.mark.parametrize("smoother", ["chebyshev", "l1jacobi"])
@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_smoothers_match_single_device(smoother, ndev):
    """VERDICT r1 #7: distributed Chebyshev / l1-Jacobi parity with the
    single-device solve (iteration count + solution)."""
    a = amg.poisson3d_7pt(12)
    a_sp = amg.dia_to_scipy(a)
    prm = AMGParams(smoother=smoother, coarse_size=50)
    hier = amg_setup(a, prm)
    mesh = make_mesh(ndev)
    dh = place_hierarchy(partition_hierarchy(hier, ndev, agg_rows_per_dev=64),
                         mesh)
    b = amg.default_rhs(a, "random", seed=0)
    res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=100)
    x, iters, rel = solve(dh, pad_vector(b, dh, ndev))
    assert int(iters) == int(res.iters), (int(iters), int(res.iters))
    x = unpad_vector(x, a.n_rows)
    true_rel = np.linalg.norm(
        np.asarray(b, np.float64) - a_sp @ np.asarray(x, np.float64)
    ) / np.linalg.norm(np.asarray(b, np.float64))
    assert true_rel <= 5e-5


@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_27pt_chebyshev(ndev):
    """BASELINE config 4's stencil+smoother distributed (VERDICT r1 #7):
    3D 27-point Poisson with the Chebyshev smoother, sharded solve parity."""
    a = amg.poisson3d_27pt(16)
    a_sp = amg.dia_to_scipy(a)
    prm = AMGParams(smoother="chebyshev")
    hier = amg_setup(a, prm, grid=(16, 16, 16))
    mesh = make_mesh(ndev)
    dh = place_hierarchy(partition_hierarchy(hier, ndev, agg_rows_per_dev=64),
                         mesh)
    b = amg.default_rhs(a, "random", seed=0)
    res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=100)
    x, iters, rel = solve(dh, pad_vector(b, dh, ndev))
    assert int(iters) == int(res.iters), (int(iters), int(res.iters))
    x = unpad_vector(x, a.n_rows)
    true_rel = np.linalg.norm(
        np.asarray(b, np.float64) - a_sp @ np.asarray(x, np.float64)
    ) / np.linalg.norm(np.asarray(b, np.float64))
    assert true_rel <= 5e-5
