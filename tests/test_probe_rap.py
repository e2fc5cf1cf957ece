"""Colored-probing RAP vs the host Galerkin product (scipy oracle).

SURVEY.md §2 #9 / BASELINE north-star "two-phase symbolic+numeric SpGEMM":
the host symbolic phase + device numeric phase must reproduce
``galerkin_product`` to f32 tolerance on real PMIS hierarchy levels.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.ops.probe_rap import (
    build_rap_probe, d2_color, _d2_color_np, rap_probe_numeric,
)
from omp_amg_tpu.ops.rap import galerkin_product
from omp_amg_tpu.sparse.formats import dia_to_scipy, ell_planes_from_scipy


def _pmis_level_pair(gen, n, lvl=0):
    a = gen(n)
    hier, hops = amg_setup(a, AMGParams(coarsening="pmis", interp="extpi"),
                           keep_host=True)
    a_sp = sp.csr_matrix(hops[lvl])
    from omp_amg_tpu.sparse.formats import ell_to_scipy
    from omp_amg_tpu.sparse.routed import RoutedEll, routed_to_scipy

    pop = hier.levels[lvl].p
    p_sp = (routed_to_scipy(pop) if isinstance(pop, RoutedEll)
            else ell_to_scipy(pop))
    return sp.csr_matrix(a_sp), sp.csr_matrix(p_sp)


@pytest.mark.parametrize("gen,n,lvl", [
    (amg.poisson3d_7pt, 24, 0),
    (amg.poisson3d_7pt, 24, 1),
    (amg.poisson2d_5pt, 64, 0),
    (amg.poisson3d_27pt, 12, 0),
])
def test_probe_rap_matches_galerkin(gen, n, lvl):
    a_sp, p_sp = _pmis_level_pair(gen, n, lvl)
    probe, ac_sp = build_rap_probe(a_sp, p_sp)
    assert probe is not None
    ac_ell, ac_val_ref, _ = ell_planes_from_scipy(ac_sp, dtype=np.float64)

    scale = abs(ac_val_ref).max()
    for engine, interp in (("xla", False), ("pallas", True)):
        vals = np.asarray(rap_probe_numeric(probe, engine=engine,
                                            interpret=interp))
        assert vals.shape == ac_val_ref.shape
        np.testing.assert_allclose(vals, ac_val_ref, rtol=0,
                                   atol=3e-6 * scale)


def test_setup_rap_probe_chain():
    """amg_setup(rap='probe'): every coarse operator's values come from the
    device numeric phase; the full chain stays within f32 rounding of the
    host-Gustavson hierarchy and the solve converges identically."""
    a = amg.poisson3d_7pt(20)
    h1, ops1 = amg_setup(a, AMGParams(coarsening="pmis", interp="extpi",
                                      rap="host"), keep_host=True)
    h2, ops2 = amg_setup(a, AMGParams(coarsening="pmis", interp="extpi",
                                      rap="probe"), keep_host=True)
    assert len(ops1) == len(ops2)
    for lvl, (o1, o2) in enumerate(zip(ops1, ops2)):
        assert o1.nnz == o2.nnz
        d = abs(o1 - o2)
        rel = (d.max() if d.nnz else 0.0) / abs(o1).max()
        assert rel < 5e-6 * max(1, 2 * lvl), (lvl, rel)


def test_coloring_flavors_identical():
    a_sp, p_sp = _pmis_level_pair(amg.poisson3d_7pt, 16)
    ac = galerkin_product(a_sp, p_sp)
    out_native = d2_color(ac)
    out_np = _d2_color_np(ac)
    assert out_np is not None
    if out_native is not None:
        np.testing.assert_array_equal(out_native[0], out_np[0])
        assert out_native[1] == out_np[1]


def test_probe_rap_multi_panel():
    """>128 colors exercises the multi-panel path (dense-ish operator)."""
    rng = np.random.default_rng(0)
    n, nc = 600, 200
    a = sp.random(n, n, density=0.02, random_state=1, format="csr")
    a = a + a.T + 10 * sp.eye(n)
    p = sp.random(n, nc, density=0.05, random_state=2, format="csr")
    p = sp.csr_matrix(p)
    probe, ac_sp = build_rap_probe(a, p)
    if probe is None:
        pytest.skip("color cap exceeded")
    assert probe.n_colors > 128
    ac_ell, ac_val_ref, _ = ell_planes_from_scipy(ac_sp, dtype=np.float64)
    scale = abs(ac_val_ref).max()
    for engine, interp in (("xla", False), ("pallas", True)):
        vals = np.asarray(rap_probe_numeric(probe, engine=engine,
                                            interpret=interp))
        np.testing.assert_allclose(vals, ac_val_ref, rtol=0,
                                   atol=5e-6 * scale)
