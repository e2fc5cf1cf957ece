"""Checkpoint I/O, MatrixMarket, and CLI driver tests."""

import json
import subprocess
import sys

import numpy as np

import jax
import jax.numpy as jnp

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.vcycle import vcycle
from omp_amg_tpu.solvers.cg import amg_pcg
from omp_amg_tpu.utils.io import load_hierarchy, read_matrix_market, save_hierarchy


def test_hierarchy_save_load_roundtrip(tmp_path):
    a = amg.poisson2d_5pt(24)
    hier = amg_setup(a)
    path = str(tmp_path / "h.npz")
    save_hierarchy(path, hier)
    h2 = load_hierarchy(path)
    assert len(h2.levels) == len(hier.levels)
    assert h2.params == hier.params
    b = amg.default_rhs(a, "random", seed=1)
    z1 = np.asarray(jax.jit(vcycle)(hier, b))
    z2 = np.asarray(jax.jit(vcycle)(h2, b))
    np.testing.assert_array_equal(z1, z2)


def test_matrix_market_roundtrip(tmp_path):
    import scipy.io
    import scipy.sparse as sp

    a_sp = amg.dia_to_scipy(amg.poisson2d_5pt(8))
    path = str(tmp_path / "a.mtx")
    scipy.io.mmwrite(path, a_sp)
    a_ell, a_back = read_matrix_market(path)
    assert (abs(a_back - a_sp) > 1e-12).nnz == 0
    x = np.random.default_rng(0).standard_normal(a_sp.shape[0])
    y = amg.spmv(a_ell, jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(np.asarray(y), a_sp @ x, rtol=1e-5, atol=1e-5)


def test_mm_solve_general_matrix(tmp_path):
    """A general (non-generated) SPD matrix through the full pipeline."""
    import scipy.sparse as sp

    rng = np.random.default_rng(7)
    n = 300
    # random SPD M-matrix-ish: Laplacian of a random graph + diagonal shift
    g = sp.random(n, n, density=0.02, random_state=rng)
    w = (abs(g) + abs(g).T) / 2
    lap = sp.diags(np.asarray(w.sum(axis=1)).ravel()) - w
    a_sp = (lap + sp.diags(0.1 * np.ones(n))).tocsr()
    a_ell = amg.ell_from_scipy(a_sp)
    hier = amg_setup(a_ell)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    res = amg_pcg(a_ell, b, hier, tol=1e-6, maxiter=300)
    assert float(res.rel_residual) <= 1e-6


def test_cli_json(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "omp_amg_tpu.cli", "--problem", "2d5pt",
         "--n", "32", "--tol", "1e-8", "--json",
         "--save-hierarchy", str(tmp_path / "h.npz")],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["true_rel_residual"] <= 1e-8
    assert summary["n_rows"] == 1024
    # reload path
    out2 = subprocess.run(
        [sys.executable, "-m", "omp_amg_tpu.cli", "--problem", "2d5pt",
         "--n", "32", "--tol", "1e-8", "--json", "--no-ir",
         "--load-hierarchy", str(tmp_path / "h.npz")],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""},
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    s2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert s2["rel_residual"] <= 1e-8


def test_solver_facade():
    a = amg.poisson2d_5pt(32)
    solver = amg.AMGSolver(a, grid=(32, 32))
    b = np.asarray(amg.default_rhs(a, "random", seed=0))
    x = solver.solve(b, tol=1e-8)
    assert solver.last_info["rel_residual"] <= 1e-8
    assert solver.last_info["certified_f64"]
    x2 = solver.solve(b, tol=1e-6, certify=False)
    assert solver.last_info["iters"] > 0
    st = solver.stats()
    assert st["sizes"][0] == 1024
    z = solver.precondition(jnp.asarray(b, jnp.float32))
    assert z.shape == (1024,)


def test_routed_hierarchy_save_load_roundtrip(tmp_path):
    """PMIS hierarchy with routed-ELL views checkpoints and re-solves."""
    from omp_amg_tpu.amg.params import AMGParams
    from omp_amg_tpu.sparse.routed import RoutedEll

    a = amg.poisson3d_7pt(12)
    hier = amg_setup(a, AMGParams(coarsening="pmis", routed="force"))
    assert any(isinstance(lv.p, RoutedEll) for lv in hier.levels)
    path = str(tmp_path / "hr.npz")
    save_hierarchy(path, hier)
    h2 = load_hierarchy(path)
    assert h2.params == hier.params
    b = amg.default_rhs(a, "random", seed=0)
    y1 = np.asarray(jax.jit(vcycle)(hier, b))
    y2 = np.asarray(jax.jit(vcycle)(h2, b))
    np.testing.assert_array_equal(y1, y2)


def test_matrix_market_roundtrip(tmp_path):
    """mmwrite of every operator format reads back equal (ref mmio parity)."""
    import numpy as np
    import omp_amg_tpu as amg
    from omp_amg_tpu.sparse.formats import dia_to_ell, to_const_dia
    from omp_amg_tpu.utils.io import read_matrix_market, write_matrix_market

    a = amg.poisson3d_7pt(8)
    ref = amg.dia_to_scipy(a)
    ops = {"dia": a, "ell": dia_to_ell(a)}
    cd = to_const_dia(a)
    if cd is not None:
        ops["cdia"] = cd
    for name, op in ops.items():
        p = str(tmp_path / f"{name}.mtx")
        write_matrix_market(p, op, comment=name)
        _, back = read_matrix_market(p)
        assert abs(back - ref).max() < 1e-6, name
