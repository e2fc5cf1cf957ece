"""Host (numpy) vs device (jnp) setup kernel equivalence."""

import numpy as np
import pytest

import jax.numpy as jnp

import omp_amg_tpu as amg
from omp_amg_tpu.amg import host_setup as hs
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.amg.interp import direct_interpolation
from omp_amg_tpu.amg.pmis import coarse_map, pmis
from omp_amg_tpu.amg.strength import strength_mask
from omp_amg_tpu.sparse.formats import ell_planes_from_scipy


OPERATORS = {
    "5pt": lambda: amg.dia_to_scipy(amg.poisson2d_5pt(14)),
    "7pt": lambda: amg.dia_to_scipy(amg.poisson3d_7pt(6)),
    "aniso": lambda: amg.dia_to_scipy(amg.aniso2d_9pt(12, eps=1e-3)),
    "27pt": lambda: amg.dia_to_scipy(amg.poisson3d_27pt(5)),
}


@pytest.mark.parametrize("name", list(OPERATORS))
@pytest.mark.parametrize("theta", [0.25, 0.5])
def test_host_kernels_match_device(name, theta):
    a_sp = OPERATORS[name]()
    col, val, _ = ell_planes_from_scipy(a_sp, dtype=np.float32)
    a_ell = amg.ell_from_scipy(a_sp)

    m_h = hs.strength_mask_np(col, val, theta)
    m_d = np.asarray(strength_mask(a_ell, theta))
    np.testing.assert_array_equal(m_h, m_d)

    s_h = hs.pmis_np(col, m_h)
    s_d = np.asarray(pmis(a_ell, strength_mask(a_ell, theta)))
    np.testing.assert_array_equal(s_h, s_d)

    cmap_d, nc_d = coarse_map(pmis(a_ell, strength_mask(a_ell, theta)))
    is_c = s_h == hs.CPOINT
    cmap_h = np.cumsum(is_c.astype(np.int64)) - 1
    nc_h = int(is_c.sum())
    assert nc_h == nc_d

    pc_h, pv_h = hs.direct_interpolation_np(col, val, m_h, s_h, cmap_h, nc_h)
    p_d = direct_interpolation(a_ell, strength_mask(a_ell, theta),
                               pmis(a_ell, strength_mask(a_ell, theta)),
                               cmap_d, nc_d)
    np.testing.assert_array_equal(pc_h * (pv_h != 0),
                                  np.asarray(p_d.col) * (np.asarray(p_d.val) != 0))
    np.testing.assert_allclose(pv_h, np.asarray(p_d.val), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("name", ["5pt", "aniso"])
def test_setup_flavors_produce_same_hierarchy(name):
    a_sp = OPERATORS[name]()
    a_ell = amg.ell_from_scipy(a_sp)
    params = AMGParams(interp="direct")  # device flavor implements direct only
    h_host, ops_host = amg_setup(a_ell, keep_host=True, flavor="host", params=params)
    h_dev, ops_dev = amg_setup(a_ell, keep_host=True, flavor="device", params=params)
    assert len(h_host.levels) == len(h_dev.levels)
    for oh, od in zip(ops_host, ops_dev):
        assert (oh != 0).nnz == (od != 0).nnz
        assert abs(oh - od).max() < 1e-5 * max(1.0, abs(oh).max())
    for lh, ld in zip(h_host.levels, h_dev.levels):
        np.testing.assert_allclose(np.asarray(lh.dinv), np.asarray(ld.dinv),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(lh.lmax), float(ld.lmax), rtol=1e-3)


def test_extpi_interpolation_properties():
    """Ext+i: C-rows identity, F-rows interpolate only from C, row sums
    reproduce constants away from boundaries (sum-preserving truncation)."""
    import omp_amg_tpu as amg
    from omp_amg_tpu.amg import host_setup as hs
    from omp_amg_tpu.sparse.formats import ell_planes_from_scipy

    a = amg.poisson3d_7pt(12)
    a_sp = amg.dia_to_scipy(a)
    col, val, _ = ell_planes_from_scipy(a_sp)
    mask = hs.strength_mask_np(col, val, 0.25)
    state = hs.pmis_np(col, mask)
    is_c = state == hs.CPOINT
    cmap = np.cumsum(is_c) - 1
    nc = int(is_c.sum())
    p_col, p_val = hs.extpi_interpolation_np(col, val, mask, state, cmap, nc)

    # C-point rows are identity
    crows = np.flatnonzero(is_c)
    assert (p_val[crows, 0] == 1.0).all()
    assert (p_val[crows, 1:] == 0).all()
    assert (p_col[crows, 0] == cmap[crows]).all()
    # all columns are valid coarse indices
    assert p_col.min() >= 0 and p_col.max() < nc
    # F-rows have at least one interpolation weight
    frows = np.flatnonzero(state == hs.FPOINT)
    assert (np.abs(p_val[frows]).sum(axis=1) > 0).all()


def test_extpi_grid_independent_iterations():
    import omp_amg_tpu as amg
    from omp_amg_tpu.amg.hierarchy import amg_setup
    from omp_amg_tpu.amg.params import AMGParams
    from omp_amg_tpu.solvers.cg import amg_pcg

    iters = []
    for n in (32, 64, 128):
        a = amg.poisson2d_5pt(n)
        hier = amg_setup(a, AMGParams(coarsening="pmis", interp="extpi"))
        b = amg.default_rhs(a, "random", seed=0)
        iters.append(int(amg_pcg(a, b, hier, tol=1e-8, maxiter=200).iters))
    assert max(iters) - min(iters) <= 1, iters
    assert max(iters) <= 12, iters
