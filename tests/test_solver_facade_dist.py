"""AMGSolver facade with a mesh (distributed path) — CPU 8-device mesh."""

import numpy as np

import jax

import omp_amg_tpu as amg
from omp_amg_tpu.parallel.slab import SlabDia


def test_facade_distributed_structured():
    mesh = jax.make_mesh((4,), ("rows",))
    a = amg.poisson3d_7pt(16)
    solver = amg.AMGSolver(a, grid=(16, 16, 16), mesh=mesh, agg_rows_per_dev=64)
    st = solver.stats()
    assert st["sharded"][0] is True
    assert isinstance(solver.hierarchy.levels[0].a, SlabDia)
    b = amg.default_rhs(a, "random", seed=0)
    x = solver.solve(b, tol=1e-6, maxiter=100, certify=False)
    a_sp = amg.dia_to_scipy(a)
    rel = np.linalg.norm(np.asarray(b, np.float64)
                         - a_sp @ np.asarray(x, np.float64)) \
        / np.linalg.norm(np.asarray(b, np.float64))
    assert rel < 5e-5
    assert solver.last_info["distributed"]
    z = solver.precondition(b)
    assert z.shape == b.shape


def test_facade_distributed_pmis_uses_per_shard_setup(monkeypatch):
    """PMIS + mesh reaches the distributed per-shard setup (VERDICT r2 #5:
    the facade must not central-build PMIS hierarchies when a mesh is
    given), and the solve matches the operator on host."""
    import omp_amg_tpu.solver as solver_mod
    from omp_amg_tpu.parallel import dist_pmis_setup as dps

    calls = {}
    orig = dps.dist_pmis_setup

    def spy(*a, **kw):
        calls["hit"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(dps, "dist_pmis_setup", spy)
    mesh = jax.make_mesh((2,), ("rows",))
    a = amg.poisson2d_5pt(32)
    from omp_amg_tpu.amg.params import AMGParams

    solver = amg.AMGSolver(a, AMGParams(coarsening="pmis"), mesh=mesh,
                           agg_rows_per_dev=64)
    assert calls.get("hit"), "facade did not call dist_pmis_setup"
    b = amg.default_rhs(a, "random", seed=1)
    x = solver.solve(b, tol=1e-6, maxiter=100, certify=False)
    a_sp = amg.dia_to_scipy(a)
    rel = np.linalg.norm(np.asarray(b, np.float64)
                         - a_sp @ np.asarray(x, np.float64)) \
        / np.linalg.norm(np.asarray(b, np.float64))
    assert rel < 5e-5


def test_facade_mesh_respects_pmis_request():
    """coarsening='pmis' + grid + mesh must NOT silently run structured."""
    mesh = jax.make_mesh((4,), ("rows",))
    a = amg.poisson3d_7pt(16)
    from omp_amg_tpu.amg.params import AMGParams
    from omp_amg_tpu.parallel.dist import DistOp

    solver = amg.AMGSolver(a, AMGParams(coarsening="pmis"),
                           grid=(16, 16, 16), mesh=mesh, agg_rows_per_dev=64)
    assert not isinstance(solver.hierarchy.levels[0].a, SlabDia)
    assert isinstance(solver.hierarchy.levels[0].a, DistOp)
    b = amg.default_rhs(a, "random", seed=0)
    x = solver.solve(b, tol=1e-6, maxiter=100, certify=False)
    a_sp = amg.dia_to_scipy(a)
    rel = np.linalg.norm(np.asarray(b, np.float64)
                         - a_sp @ np.asarray(x, np.float64)) \
        / np.linalg.norm(np.asarray(b, np.float64))
    assert rel < 5e-5


def test_facade_distributed_certified_structured():
    """VERDICT r3 #5: AMGSolver(mesh=...).solve(certify=True) must return a
    TRUE f64-certified residual via the sharded df64 refinement loop — no
    warning, certified_f64=True, and the host-f64 cross-check agrees."""
    import warnings

    mesh = jax.make_mesh((4,), ("rows",))
    a = amg.poisson3d_7pt(16)
    solver = amg.AMGSolver(a, grid=(16, 16, 16), mesh=mesh,
                           agg_rows_per_dev=64)
    b = amg.default_rhs(a, "random", seed=0)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the old f32-only warning must not fire
        x = solver.solve(b, tol=1e-8, maxiter=200)
    assert solver.last_info["certified_f64"] is True
    assert solver.last_info["distributed"] is True
    assert solver.last_info["rel_residual"] <= 1e-8
    a_sp = amg.dia_to_scipy(a)
    b64 = np.asarray(b, np.float64)
    rel = np.linalg.norm(b64 - a_sp @ np.asarray(x, np.float64)) \
        / np.linalg.norm(b64)
    assert rel <= 2e-8  # independent host-f64 verification


def test_facade_distributed_certified_pmis():
    """Same contract through the PMIS (halo-ELL) fine operator."""
    mesh = jax.make_mesh((2,), ("rows",))
    a = amg.poisson2d_5pt(32)
    from omp_amg_tpu.amg.params import AMGParams

    solver = amg.AMGSolver(a, AMGParams(coarsening="pmis"), mesh=mesh,
                           agg_rows_per_dev=64)
    b = amg.default_rhs(a, "random", seed=1)
    x = solver.solve(b, tol=1e-8, maxiter=200)
    assert solver.last_info["certified_f64"] is True
    assert solver.last_info["rel_residual"] <= 1e-8
    a_sp = amg.dia_to_scipy(a)
    b64 = np.asarray(b, np.float64)
    rel = np.linalg.norm(b64 - a_sp @ np.asarray(x, np.float64)) \
        / np.linalg.norm(b64)
    assert rel <= 2e-8


def test_facade_distributed_fully_replicated_hierarchy():
    """A problem small enough that EVERY level stays below the
    agglomeration threshold must still solve (and certify) under a mesh:
    b/x then stay full-length on every shard (round-5 fix — the vector
    specs used to assume a sharded fine level and crashed with a
    block/full shape mismatch)."""
    import numpy as np

    from omp_amg_tpu.amg.params import AMGParams

    mesh = jax.make_mesh((8,), ("rows",))
    a = amg.poisson3d_7pt(24)          # 13824 rows / 8 < default 2048
    solver = amg.AMGSolver(a, AMGParams(coarsening="pmis"), mesh=mesh)
    assert not solver.hierarchy.levels[0].sharded
    b = amg.default_rhs(a, "random", seed=0)
    x = solver.solve(b, tol=1e-8)
    assert solver.last_info["certified_f64"]
    a_sp = amg.dia_to_scipy(a)
    rel = np.linalg.norm(np.asarray(b, np.float64)
                         - a_sp @ np.asarray(x, np.float64)) \
        / np.linalg.norm(np.asarray(b, np.float64))
    assert rel <= 1e-8
    # one V-cycle apply through the replicated path as well
    z = solver.precondition(b)
    assert z.shape == b.shape
