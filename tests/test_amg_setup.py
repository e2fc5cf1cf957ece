"""AMG setup pipeline vs the plain-numpy reference implementation."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import omp_amg_tpu as amg
from omp_amg_tpu.amg.interp import direct_interpolation
from omp_amg_tpu.amg.pmis import CPOINT, FPOINT, coarse_map, hash01, pmis
from omp_amg_tpu.amg.strength import strength_mask
from omp_amg_tpu.ops.rap import build_rap_plan, galerkin_product, rap_numeric

import reference_amg as ref


def mask_to_pairs(a_ell, mask):
    col = np.asarray(a_ell.col)
    m = np.asarray(mask)
    rows = np.arange(col.shape[0])[:, None] * np.ones_like(col)
    return set(zip(rows[m].tolist(), col[m].tolist()))


OPERATORS = {
    "5pt": lambda: amg.dia_to_scipy(amg.poisson2d_5pt(10)),
    "7pt": lambda: amg.dia_to_scipy(amg.poisson3d_7pt(5)),
    "27pt": lambda: amg.dia_to_scipy(amg.poisson3d_27pt(4)),
    "aniso": lambda: amg.dia_to_scipy(amg.aniso2d_9pt(12, eps=1e-3)),
}


def test_hash01_matches_reference():
    idx = jnp.arange(1000, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(hash01(idx)), ref.hash01_np(np.arange(1000)))


@pytest.mark.parametrize("name", list(OPERATORS))
@pytest.mark.parametrize("theta", [0.25, 0.5])
def test_strength_matches_reference(name, theta):
    a_sp = OPERATORS[name]()
    a_ell = amg.ell_from_scipy(a_sp)
    mask = strength_mask(a_ell, theta)
    s_ref = ref.strength_graph(a_sp, theta)
    assert mask_to_pairs(a_ell, mask) == set(zip(*s_ref.nonzero()))


def test_aniso_strength_drops_cross_stream():
    """eps=1e-3 9-point FEM: strong couplings only toward the y-neighbor rows.

    The pure-x couplings are positive (weak) and must be dropped; the corner
    couplings sit at ratio (1+eps)/(2(2-eps)) ≈ 0.2504, marginally ≥ θ=0.25,
    so the strong graph is the y-direction band {±nx-1, ±nx, ±nx+1}. At
    θ=0.3 the graph must collapse to exactly ±nx (pure semicoarsening).
    """
    nx = 12
    a_sp = amg.dia_to_scipy(amg.aniso2d_9pt(nx, eps=1e-3))
    s = ref.strength_graph(a_sp, 0.25)
    for i, j in zip(*s.nonzero()):
        assert abs(j - i) in (nx - 1, nx, nx + 1), f"x-direction strong coupling {i}->{j}"
    a_ell = amg.ell_from_scipy(a_sp)
    mask = strength_mask(a_ell, 0.25)
    assert mask_to_pairs(a_ell, mask) == set(zip(*s.nonzero()))

    s2 = ref.strength_graph(a_sp, 0.3)
    for i, j in zip(*s2.nonzero()):
        assert abs(j - i) == nx, f"non-semicoarsening strong coupling {i}->{j}"
    mask2 = strength_mask(a_ell, 0.3)
    assert mask_to_pairs(a_ell, mask2) == set(zip(*s2.nonzero()))


@pytest.mark.parametrize("name", list(OPERATORS))
def test_pmis_matches_reference(name):
    a_sp = OPERATORS[name]()
    a_ell = amg.ell_from_scipy(a_sp)
    mask = strength_mask(a_ell, 0.25)
    state_dev = np.asarray(pmis(a_ell, mask))
    s_ref = ref.strength_graph(a_sp, 0.25)
    state_ref = ref.pmis(s_ref)
    np.testing.assert_array_equal(state_dev, state_ref)
    # valid CF split: every node decided; C-points exist
    assert set(np.unique(state_dev)) <= {CPOINT, FPOINT}
    assert (state_dev == CPOINT).any()


@pytest.mark.parametrize("name", list(OPERATORS))
def test_interpolation_matches_reference(name):
    a_sp = OPERATORS[name]()
    a_ell = amg.ell_from_scipy(a_sp)
    mask = strength_mask(a_ell, 0.25)
    state = pmis(a_ell, mask)
    cmap, nc = coarse_map(state)
    p = direct_interpolation(a_ell, mask, state, cmap, nc)
    p_dev = amg.ell_to_scipy(p)

    s_ref = ref.strength_graph(a_sp, 0.25)
    p_ref = ref.direct_interpolation(a_sp, s_ref, np.asarray(state))
    assert p_dev.shape == p_ref.shape
    assert (p_dev != 0).nnz == (p_ref != 0).nnz
    assert abs(p_dev - p_ref).max() < 1e-6
    # rows of P for C-points are unit vectors
    state_np = np.asarray(state)
    rowsum = np.asarray(p_dev[state_np == CPOINT].sum(axis=1)).ravel()
    np.testing.assert_allclose(rowsum, 1.0)


@pytest.mark.parametrize("name", ["5pt", "aniso"])
def test_rap_plan_matches_scipy(name):
    a_sp = OPERATORS[name]()
    a_ell = amg.ell_from_scipy(a_sp)
    mask = strength_mask(a_ell, 0.25)
    state = pmis(a_ell, mask)
    cmap, nc = coarse_map(state)
    p = direct_interpolation(a_ell, mask, state, cmap, nc)
    p_sp = amg.ell_to_scipy(p)

    ac_ref = galerkin_product(a_sp, p_sp)
    plan = build_rap_plan(a_sp, p_sp)
    a_csr = amg.csr_from_scipy(a_sp)
    p_csr = amg.csr_from_scipy(p_sp)
    vals = rap_numeric(plan, a_csr.val, p_csr.val)
    np.testing.assert_allclose(np.asarray(vals), ac_ref.data, rtol=1e-5, atol=1e-6)


def test_pmis_all_isolated_nodes_become_C():
    """Diagonal matrix: no strong connections → every node is a (vacuous) C."""
    a_sp = sp.diags(np.ones(10)).tocsr()
    a_ell = amg.ell_from_scipy(a_sp)
    mask = strength_mask(a_ell, 0.25)
    assert not np.asarray(mask).any()
    state = np.asarray(pmis(a_ell, mask))
    np.testing.assert_array_equal(state, CPOINT)


def test_aniso_pmis_theta_semantics():
    """Config-3 strength semantics through the CLASSICAL pipeline: the 9-pt
    FEM aniso operator's corner couplings sit at ratio (1+eps)/4 — a hair
    above the classical theta=0.25 line — and including them destroys the
    1D strength graph the config exists to test (~10x the iterations).
    theta=0.5 (hypre's 9-pt recommendation) must stay fast; pin both so a
    planner/strength change can't silently regress either behavior."""
    import numpy as np

    import omp_amg_tpu as amg
    from omp_amg_tpu.amg.hierarchy import amg_setup
    from omp_amg_tpu.amg.params import AMGParams
    from omp_amg_tpu.solvers.cg import amg_pcg

    a = amg.aniso2d_9pt(64)
    b = amg.default_rhs(a, "random", seed=0)
    h5 = amg_setup(a, AMGParams(coarsening="pmis", theta=0.5))
    r5 = amg_pcg(a, b, h5, tol=1e-6, maxiter=200)
    assert int(r5.iters) <= 20, int(r5.iters)
    # strength graph at theta=0.5 is essentially 1D: strong couplings
    # per interior row = the two y-neighbors only
    from omp_amg_tpu.amg import host_setup as hs
    from omp_amg_tpu.sparse.formats import dia_to_scipy, ell_planes_from_scipy

    col, val, _ = ell_planes_from_scipy(dia_to_scipy(a), dtype=np.float32)
    mask = hs.strength_mask_host(col, val, 0.5)
    interior = np.flatnonzero(mask.sum(axis=1) > 0)
    assert mask[interior].sum(axis=1).max() == 2


def test_lmax_lanczos_beats_power20():
    """The adaptive lmax path (Lanczos-12 at n >= 2^22, round 5) must be
    at least as accurate as the power-20 default it replaces: both
    converge to lambda_max from below, so "closer" = "larger"."""
    import numpy as np

    from omp_amg_tpu.amg.hierarchy import (
        _estimate_lmax_host, _lanczos_lmax_host,
    )
    from omp_amg_tpu.native import CsrMatvec

    for gen, n in ((amg.poisson3d_7pt, 40), (amg.aniso2d_9pt, 96)):
        a_sp = amg.dia_to_scipy(gen(n)).tocsr()
        a_sp.sort_indices()
        dinv = 1.0 / a_sp.diagonal()
        mv = CsrMatvec(a_sp.indptr, a_sp.indices, a_sp.data,
                       n_cols=a_sp.shape[1])
        l12 = _lanczos_lmax_host(mv, dinv, a_sp.shape[0])
        p20 = _estimate_lmax_host(a_sp, dinv, iters=20)
        p60 = _estimate_lmax_host(a_sp, dinv, iters=60)
        assert l12 >= p20 - 1e-12          # no accuracy regression
        assert l12 <= p60 * 1.0001         # still a from-below estimate
        assert abs(l12 - p60) / p60 < 0.02
