"""Native (csrc) setup kernels vs their numpy twins.

The native library is the default host-setup engine when built; these tests
pin its results to the vectorized-numpy implementations (SURVEY.md §4 test
strategy: scipy/numpy oracles per component).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import omp_amg_tpu as amg
from omp_amg_tpu import native
from omp_amg_tpu.amg import host_setup as hs
from omp_amg_tpu.sparse.formats import (
    dia_to_scipy, ell_planes_from_scipy, ell_planes_to_scipy,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _setup_planes(a_sp, theta=0.25):
    col, val, _ = ell_planes_from_scipy(a_sp, dtype=np.float32)
    mask = hs.strength_mask_np(col, val, theta)
    state = hs.pmis_np(col, mask)
    is_c = state == hs.CPOINT
    cmap = np.cumsum(is_c.astype(np.int64)) - 1
    return col, val, mask, state, cmap, int(is_c.sum())


@pytest.mark.parametrize("gen,n", [(amg.poisson3d_7pt, 20),
                                   (amg.poisson2d_5pt, 48)])
def test_extpi_native_matches_numpy(gen, n):
    a_sp = sp.csr_matrix(dia_to_scipy(gen(n)))
    col, val, mask, state, cmap, nc = _setup_planes(a_sp)
    pc_np, pv_np = hs.extpi_interpolation_np(col, val, mask, state, cmap, nc)
    out = native.extpi_interp(col, val, mask, state, cmap, nc)
    assert out is not None
    pc_n, pv_n = out
    p_np = ell_planes_to_scipy(pc_np, pv_np.astype(np.float64), nc).tocsr()
    p_n = ell_planes_to_scipy(pc_n, pv_n, nc).tocsr()
    assert p_np.nnz == p_n.nnz
    d = abs(p_np - p_n)
    scale = max(abs(p_np).max(), 1e-30)
    assert (d.max() if d.nnz else 0.0) / scale < 1e-6


def test_extpi_native_27pt_sign_class_sums():
    """27-pt has many |w| near-ties: f32(numpy) vs f64(native) rounding can
    legitimately flip which tied entry truncation keeps. The sign-class
    rescale preserves per-row positive/negative sums, so THOSE must agree
    across flavors even when the selected columns differ."""
    a_sp = sp.csr_matrix(dia_to_scipy(amg.poisson3d_27pt(12)))
    col, val, mask, state, cmap, nc = _setup_planes(a_sp)
    pc_np, pv_np = hs.extpi_interpolation_np(col, val, mask, state, cmap, nc)
    out = native.extpi_interp(col, val, mask, state, cmap, nc)
    assert out is not None
    pc_n, pv_n = out
    for sign in (1.0, -1.0):
        s_np = (pv_np * (np.sign(pv_np) == sign)).sum(axis=1)
        s_n = (pv_n * (np.sign(pv_n) == sign)).sum(axis=1)
        np.testing.assert_allclose(s_np, s_n, rtol=0, atol=2e-5)
    # row widths agree
    np.testing.assert_array_equal((pv_np != 0).sum(axis=1),
                                  (pv_n != 0).sum(axis=1))


def test_extpi_dispatch_prefers_native():
    a_sp = sp.csr_matrix(dia_to_scipy(amg.poisson2d_5pt(32)))
    col, val, mask, state, cmap, nc = _setup_planes(a_sp)
    pc, pv = hs.extpi_interpolation(col, val, mask, state, cmap, nc)
    assert pv.dtype == val.dtype
    # C rows identity
    is_c = state == hs.CPOINT
    np.testing.assert_array_equal(pc[is_c, 0], np.asarray(cmap)[is_c])
    np.testing.assert_allclose(pv[is_c, 0], 1.0)


@pytest.mark.parametrize("gen,n", [(amg.poisson2d_5pt, 32),
                                   (amg.poisson3d_7pt, 12)])
def test_d2_color_validity(gen, n):
    """No row of A may contain two columns of the same color (that is what
    makes column probing exact: each (row, color) pair hits ≤1 column)."""
    a_sp = sp.csr_matrix(dia_to_scipy(gen(n)))
    # color the coarse operator of a PMIS hierarchy level (the real use)
    col, val, mask, state, cmap, nc = _setup_planes(a_sp)
    pc, pv = hs.extpi_interpolation(col, val, mask, state, cmap, nc)
    p_sp = ell_planes_to_scipy(pc, np.asarray(pv, np.float64), nc)
    from omp_amg_tpu.ops.rap import galerkin_product

    ac = galerkin_product(a_sp, p_sp)
    out = native.d2_color(ac)
    assert out is not None
    colors, ncolors = out
    assert ncolors >= 1
    csr = sp.csr_matrix(ac)
    for i in range(csr.shape[0]):
        cc = colors[csr.indices[csr.indptr[i]:csr.indptr[i + 1]]]
        assert len(np.unique(cc)) == len(cc), f"row {i} color clash"
    # bound: greedy needs at most max conflict degree + 1 colors
    deg = int(max((csr != 0).sum(axis=1).max(), 1))
    assert ncolors <= deg * deg + 1


def test_native_strength_pmis_bit_identical():
    """Native strength mask + PMIS rounds == the numpy flavors bit-exactly
    (the determinism contract extends to the native port)."""
    import numpy as np

    import omp_amg_tpu as amg
    from omp_amg_tpu import native
    from omp_amg_tpu.amg import host_setup as hs
    from omp_amg_tpu.sparse.formats import dia_to_scipy, ell_planes_from_scipy

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    for gen, n, theta in ((amg.poisson3d_7pt, 20, 0.25),
                          (amg.poisson2d_5pt, 48, 0.25),
                          (amg.aniso2d_9pt, 48, 0.25),
                          (amg.aniso2d_9pt, 48, 0.5),
                          (amg.poisson3d_27pt, 12, 0.25)):
        a = gen(n)
        col, val, _ = ell_planes_from_scipy(dia_to_scipy(a),
                                            dtype=np.float32)
        m_np = hs.strength_mask_np(col, val, theta)
        m_nat = native.strength_mask(col, val, theta)
        np.testing.assert_array_equal(m_nat, m_np, err_msg=str(gen))
        s_np = hs.pmis_np(col, m_np)
        s_nat = native.pmis(col, m_np)
        np.testing.assert_array_equal(s_nat, s_np, err_msg=str(gen))
        # the dispatchers take the native path and agree too
        np.testing.assert_array_equal(hs.pmis_host(col, m_np), s_np)
        np.testing.assert_array_equal(hs.strength_mask_host(col, val, theta),
                                      m_np)


def test_native_plane_pack_and_bf16():
    """Native plane packer == the numpy transpose+cast chain; the bf16
    losslessness test matches the cast-roundtrip definition exactly."""
    import numpy as np

    import ml_dtypes
    import pytest

    import omp_amg_tpu as amg
    from omp_amg_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    a = amg.poisson3d_7pt(32)
    data = np.asarray(a.data, np.float64)
    nz, pr = 32, 32 * 32 // 128
    ref = np.ascontiguousarray(
        data.reshape(len(a.offsets), nz, pr, 128).transpose(1, 0, 2, 3)
    ).astype(np.float32)
    out = native.plane_pack(data, nz, pr)
    np.testing.assert_array_equal(out, ref)
    assert native.bf16_lossless(out) == bool(np.array_equal(
        ref.astype(ml_dtypes.bfloat16).astype(np.float32), ref))
    if native.bf16_lossless(out):
        np.testing.assert_array_equal(np.asarray(native.bf16_pack(out)),
                                      ref.astype(ml_dtypes.bfloat16))
    # a genuinely lossy array is detected
    lossy = ref.copy()
    lossy.reshape(-1)[7] = np.float32(1.0000001)
    assert native.bf16_lossless(lossy) is False


def test_native_dia_planes_matches_numpy():
    """Native CSR→DIA extractor == the numpy twin (offsets + planes)."""
    import numpy as np
    import pytest
    import scipy.sparse as sp

    import omp_amg_tpu as amg
    from omp_amg_tpu import native
    from omp_amg_tpu.sparse.formats import dia_to_scipy

    if not native.available():
        pytest.skip("native lib unavailable")
    for gen, n in ((amg.poisson3d_27pt, 12), (amg.aniso2d_9pt, 40),
                   (amg.poisson3d_7pt, 16)):
        a_sp = sp.csr_matrix(dia_to_scipy(gen(n)))
        a_sp.sort_indices()
        o_nat, d_nat = native.dia_planes(a_sp)
        nn = a_sp.shape[0]
        lengths = np.diff(a_sp.indptr)
        row_of = np.repeat(np.arange(nn, dtype=np.int64), lengths)
        offs_all = a_sp.indices.astype(np.int64) - row_of
        offsets = np.unique(offs_all)
        di = np.searchsorted(offsets, offs_all)
        d_np = np.zeros((len(offsets), nn), np.float64)
        d_np[di, row_of] = a_sp.data
        assert o_nat == [int(o) for o in offsets]
        np.testing.assert_array_equal(d_nat, d_np)


def test_native_pmis_directed_mask_fuzz():
    """ADVICE r3 (high): chained stranded-F promotion on DIRECTED strength
    masks must match pmis_np bit-exactly. The pre-fix native kernel read
    live state inside the promotion loop, so chains of stranded F-points
    resolved schedule-dependently; the numpy flavor promotes from a
    pre-promotion snapshot. Fuzz asymmetric masks to exercise chains."""
    rng = np.random.default_rng(7)
    for trial in range(60):
        n = int(rng.integers(20, 200))
        k = int(rng.integers(2, 6))
        col = rng.integers(0, n, size=(n, k)).astype(np.int32)
        # directed mask: row i may strongly depend on j without j -> i
        mask = rng.random((n, k)) < rng.uniform(0.1, 0.6)
        # self-edges are never strong
        mask &= col != np.arange(n, dtype=np.int32)[:, None]
        s_np = hs.pmis_np(col, mask)
        s_nat = native.pmis(col, mask)
        np.testing.assert_array_equal(
            s_nat, s_np, err_msg=f"trial {trial} n={n} k={k}")


def test_native_strength_nondyadic_theta_tie():
    """ADVICE r3 (low): exact-threshold couplings at non-dyadic theta must
    compare in f32 like numpy (an f64 compare flips the tie row)."""
    # row 0: diag 2, off-diagonals -1.0 (max) and -f32(0.7) (the tie)
    col = np.array([[0, 1, 2], [1, 0, 0], [2, 0, 0]], np.int32)
    val = np.array([[2.0, -1.0, -np.float32(0.7)],
                    [2.0, -1.0, 0.0],
                    [2.0, -np.float32(0.7), 0.0]], np.float32)
    theta = 0.7
    m_np = hs.strength_mask_np(col, val, theta)
    m_nat = native.strength_mask(col, val, theta)
    np.testing.assert_array_equal(m_nat, m_np)
    # the tie entry IS strong under f32 semantics
    assert m_np[0, 2]


def test_native_dia_planes_rejects_nonsquare():
    """ADVICE r3 (medium): the native extractor's offset table is sized from
    rows only — non-square input must fall back (None), not corrupt heap."""
    a = sp.csr_matrix(np.array([[1.0, 0, 2.0, 3.0],
                                [0, 4.0, 0, 5.0]]))
    assert native.dia_planes(a) is None


def test_spgemm_numeric_containment_debug_check(monkeypatch):
    """OMP_AMG_DEBUG_SPGEMM=1 catches a cached output pattern that does not
    contain the structural A@B product (ADVICE r4: the native kernel would
    silently leak partial sums across rows otherwise)."""
    rng = np.random.default_rng(0)
    a = sp.random(20, 15, density=0.3, random_state=rng, format="csr")
    b = sp.random(15, 18, density=0.3, random_state=rng, format="csr")
    a.sort_indices(); b.sort_indices()
    c = (a @ b).tocsr(); c.sort_indices()
    pat = lambda m: (m.indptr.astype(np.int64), m.indices.astype(np.int32),
                     m.shape[1])
    monkeypatch.setenv("OMP_AMG_DEBUG_SPGEMM", "1")
    val = native.spgemm_numeric(pat(a), a.data, pat(b), b.data, pat(c))
    np.testing.assert_allclose(val, c.data, rtol=1e-13)
    # drop one structural entry from the cached pattern -> must raise
    bad = c.copy()
    keep = np.ones(bad.nnz, bool)
    keep[bad.nnz // 2] = False
    bad = sp.csr_matrix((bad.data[keep],
                         bad.indices[keep],
                         np.searchsorted(np.flatnonzero(
                             np.repeat(True, bad.nnz))[keep],
                             bad.indptr, side="left")), shape=bad.shape)
    with pytest.raises(ValueError, match="not contained"):
        native.spgemm_numeric(pat(a), a.data, pat(b), b.data, pat(bad))
