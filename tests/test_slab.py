"""Z-slab structured distributed layer tests (8-device virtual CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.amg.structured import (
    GridProlong, GridRestrict, apply_prolong, apply_restrict,
)
from omp_amg_tpu.parallel.dist import AXIS, dist_spmv, make_dist_solver
from omp_amg_tpu.parallel.partition import (
    pad_vector, partition_hierarchy, place_hierarchy, unpad_vector,
)
from omp_amg_tpu.parallel.slab import (
    SlabDia, SlabProlong, SlabRestrict, slab_halos,
)


def make_mesh(ndev):
    return jax.make_mesh((ndev,), (AXIS,))


def _slab_of(a):
    hl, hr = slab_halos(a.offsets, a.dims)
    return SlabDia(data=jnp.asarray(a.data), offsets=a.offsets, dims=a.dims,
                   hl=hl, hr=hr)


@pytest.mark.parametrize("ndev", [1, 2, 4, 8])
@pytest.mark.parametrize("maker,n", [("poisson3d_7pt", 16),
                                     ("poisson3d_27pt", 8),
                                     ("poisson2d_5pt", 24)])
def test_slab_spmv_exact(ndev, maker, n):
    a = getattr(amg, maker)(n)
    op = _slab_of(a)
    a_sp = amg.dia_to_scipy(a)
    mesh = make_mesh(ndev)
    x = np.random.default_rng(0).standard_normal(a.n_rows).astype(np.float32)
    f = jax.jit(jax.shard_map(
        dist_spmv, mesh=mesh,
        in_specs=(SlabDia(data=P(None, AXIS), offsets=op.offsets,
                          dims=op.dims, hl=op.hl, hr=op.hr), P(AXIS)),
        out_specs=P(AXIS)))
    y = np.asarray(f(op, jnp.asarray(x)))
    np.testing.assert_allclose(y, a_sp @ x, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("ndev", [1, 2, 4])
@pytest.mark.parametrize("coarsened", [(True, True, True),
                                       (True, False, True),
                                       (False, True, True)])
def test_slab_transfers_match_global(ndev, coarsened):
    fs = (8, 12, 16)
    cs = tuple((d + 1) // 2 if c else d for d, c in zip(fs, coarsened))
    p = GridProlong(fine_shape=fs, coarse_shape=cs, coarsened=coarsened)
    r = GridRestrict(fine_shape=fs, coarse_shape=cs, coarsened=coarsened)
    sp = SlabProlong(fine_shape=fs, coarse_shape=cs, coarsened=coarsened)
    sr = SlabRestrict(fine_shape=fs, coarse_shape=cs, coarsened=coarsened)
    mesh = make_mesh(ndev)
    rng = np.random.default_rng(1)
    xc = jnp.asarray(rng.standard_normal(int(np.prod(cs))), jnp.float32)
    xf = jnp.asarray(rng.standard_normal(int(np.prod(fs))), jnp.float32)

    fp = jax.jit(jax.shard_map(dist_spmv, mesh=mesh,
                               in_specs=(sp, P(AXIS)), out_specs=P(AXIS)))
    fr = jax.jit(jax.shard_map(dist_spmv, mesh=mesh,
                               in_specs=(sr, P(AXIS)), out_specs=P(AXIS)))
    np.testing.assert_allclose(np.asarray(fp(sp, xc)),
                               np.asarray(apply_prolong(p, xc)),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fr(sr, xf)),
                               np.asarray(apply_restrict(r, xf)),
                               rtol=1e-6, atol=1e-5)


def test_slab_transfer_replicated_transition():
    """gather_out / slice_in transition variants on a 4-dev mesh."""
    ndev = 4
    fs = (8, 8, 8)
    cs = (4, 4, 4)
    cz = (True, True, True)
    p = GridProlong(fine_shape=fs, coarse_shape=cs, coarsened=cz)
    sp = SlabProlong(fine_shape=fs, coarse_shape=cs, coarsened=cz,
                     slice_in=True)
    sr = SlabRestrict(fine_shape=fs, coarse_shape=cs, coarsened=cz,
                      gather_out=True)
    mesh = make_mesh(ndev)
    rng = np.random.default_rng(2)
    xc = jnp.asarray(rng.standard_normal(int(np.prod(cs))), jnp.float32)
    xf = jnp.asarray(rng.standard_normal(int(np.prod(fs))), jnp.float32)

    fp = jax.jit(jax.shard_map(dist_spmv, mesh=mesh,
                               in_specs=(sp, P(None)), out_specs=P(AXIS)))
    fr = jax.jit(jax.shard_map(dist_spmv, mesh=mesh,
                               in_specs=(sr, P(AXIS)), out_specs=P(None)))
    np.testing.assert_allclose(
        np.asarray(fp(sp, xc)),
        np.asarray(apply_prolong(p, xc)), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fr(sr, xf)),
        np.asarray(apply_restrict(
            GridRestrict(fine_shape=fs, coarse_shape=cs, coarsened=cz), xf)),
        rtol=1e-6, atol=1e-5)


def test_structured_partition_uses_slab_ops():
    a = amg.poisson3d_7pt(16)
    hier = amg_setup(a, grid=(16, 16, 16))
    dh = partition_hierarchy(hier, 8, agg_rows_per_dev=64)
    assert isinstance(dh.levels[0].a, SlabDia)
    assert isinstance(dh.levels[0].p, SlabProlong)
    # coarse replicated levels stay plain structured objects
    assert not dh.levels[-1].sharded or len(dh.levels) == 1


@pytest.mark.parametrize("ndev", [2, 8])
def test_slab_solve_matches_single_device(ndev):
    a = amg.poisson3d_7pt(16)
    a_sp = amg.dia_to_scipy(a)
    hier = amg_setup(a, grid=(16, 16, 16), params=AMGParams(coarse_size=80))
    mesh = make_mesh(ndev)
    dh = place_hierarchy(partition_hierarchy(hier, ndev, agg_rows_per_dev=64),
                         mesh)
    assert isinstance(dh.levels[0].a, SlabDia)
    b = amg.default_rhs(a, "random", seed=0)
    from omp_amg_tpu.solvers.cg import amg_pcg

    res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=100)
    x, iters, rel = solve(dh, pad_vector(b, dh, ndev))
    assert int(iters) == int(res.iters)
    x = unpad_vector(x, a.n_rows)
    true_rel = np.linalg.norm(
        np.asarray(b, np.float64) - a_sp @ np.asarray(x, np.float64)
    ) / np.linalg.norm(np.asarray(b, np.float64))
    assert true_rel <= 5e-5
    np.testing.assert_allclose(np.asarray(x), np.asarray(res.x),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("ndev", [2, 8])
@pytest.mark.parametrize("maker,n", [("poisson3d_7pt", 16),
                                     ("poisson3d_27pt", 8)])
def test_slab_spmv_pallas_transport_matches(ndev, maker, n):
    """Async-remote-copy halo transport == ppermute transport (interpret)."""
    a = getattr(amg, maker)(n)
    hl, hr = slab_halos(a.offsets, a.dims)
    op = SlabDia(data=jnp.asarray(a.data), offsets=a.offsets, dims=a.dims,
                 hl=hl, hr=hr, transport="pallas")
    a_sp = amg.dia_to_scipy(a)
    mesh = make_mesh(ndev)
    x = np.random.default_rng(0).standard_normal(a.n_rows).astype(np.float32)
    from omp_amg_tpu.parallel.slab import slab_op_spec

    f = jax.jit(jax.shard_map(
        dist_spmv, mesh=mesh, in_specs=(slab_op_spec(op), P(AXIS)),
        out_specs=P(AXIS), check_vma=False))
    y = np.asarray(f(op, jnp.asarray(x)))
    np.testing.assert_allclose(y, a_sp @ x, rtol=1e-5, atol=1e-4)


def test_slab_solve_pallas_transport():
    """Full sharded AMG-PCG with the Pallas halo transport (interpret)."""
    ndev = 4
    a = amg.poisson3d_7pt(16)
    hier = amg_setup(a, AMGParams(coarse_size=80), grid=(16, 16, 16))
    mesh = make_mesh(ndev)
    dh = place_hierarchy(
        partition_hierarchy(hier, ndev, agg_rows_per_dev=64,
                            transport="pallas"), mesh)
    assert dh.levels[0].a.transport == "pallas"
    b = amg.default_rhs(a, "random", seed=0)
    from omp_amg_tpu.solvers.cg import amg_pcg

    res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=100)
    x, iters, rel = solve(dh, pad_vector(b, dh, ndev))
    assert int(iters) == int(res.iters)
    a_sp = amg.dia_to_scipy(a)
    x = unpad_vector(x, a.n_rows)
    true_rel = np.linalg.norm(
        np.asarray(b, np.float64) - a_sp @ np.asarray(x, np.float64)
    ) / np.linalg.norm(np.asarray(b, np.float64))
    assert true_rel <= 5e-5


@pytest.mark.parametrize("ndev", [2, 4])
def test_slab_solve_2d_and_noncubic(ndev):
    """Slab distribution on a 2D grid and a non-cubic 3D grid."""
    from omp_amg_tpu.solvers.cg import amg_pcg

    cases = [(amg.poisson2d_5pt(32), (32, 32)),
             (amg.poisson3d_7pt(16, 24, 8), None)]
    for a, grid in cases:
        grid = a.dims if grid is None else grid
        hier = amg_setup(a, AMGParams(coarse_size=60), grid=grid)
        mesh = make_mesh(ndev)
        dh = place_hierarchy(
            partition_hierarchy(hier, ndev, agg_rows_per_dev=32), mesh)
        assert isinstance(dh.levels[0].a, SlabDia), grid
        b = amg.default_rhs(a, "random", seed=0)
        res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
        solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=100)
        x, iters, rel = solve(dh, pad_vector(b, dh, ndev))
        assert int(iters) == int(res.iters)
        a_sp = amg.dia_to_scipy(a)
        x = unpad_vector(x, a.n_rows)
        true_rel = np.linalg.norm(
            np.asarray(b, np.float64) - a_sp @ np.asarray(x, np.float64)
        ) / np.linalg.norm(np.asarray(b, np.float64))
        assert true_rel <= 5e-5
