"""Routed-ELL format: planner exactness, SpMV paths, hierarchy integration.

The routed plan must be an exact re-encoding of the operator
(sparse/routed.py compact-chunk layout), the XLA emulation and the Pallas
kernel (interpret mode) must agree with scipy, and a PMIS hierarchy built
with routed views must converge identically to the ELL one.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.ops.pallas_routed import spmv_routed, spmv_routed_xla
from omp_amg_tpu.ops.spmv import spmv
from omp_amg_tpu.problems.poisson import poisson2d_5pt, poisson3d_7pt
from omp_amg_tpu.solvers.cg import amg_pcg
from omp_amg_tpu.sparse.formats import dia_to_scipy
from omp_amg_tpu.sparse.routed import (
    KC, RoutedEll, absolute_soff, pack_lidx4, plan_lidx_packed,
    plan_routed, routed_from_scipy, routed_to_scipy,
)


def _random_sparse(n_rows, n_cols, density, seed, band=None):
    rng = np.random.default_rng(seed)
    nnz = int(n_rows * n_cols * density)
    rows = rng.integers(0, n_rows, nnz)
    if band is None:
        cols = rng.integers(0, n_cols, nnz)
    else:
        cols = np.clip(rows * n_cols // n_rows
                       + rng.integers(-band, band + 1, nnz), 0, n_cols - 1)
    vals = rng.standard_normal(nnz)
    m = sp.csr_matrix((vals, (rows, cols)), shape=(n_rows, n_cols))
    m.sum_duplicates()
    m.eliminate_zeros()
    return m


def _skewed_sparse(n=4096, seed=7):
    """Worst-block skew: a few rows are far denser than the rest, so
    per-block chunk counts (kch) genuinely vary."""
    rng = np.random.default_rng(seed)
    rows = np.concatenate([np.repeat(np.arange(n), 3),
                           np.repeat(np.arange(200), 80)])
    cols = np.clip(rows + rng.integers(-300, 300, len(rows)), 0, n - 1)
    m = sp.csr_matrix((rng.standard_normal(len(rows)), (rows, cols)),
                      shape=(n, n))
    m.sum_duplicates()
    return m


CASES = [
    _random_sparse(1024, 1024, 0.01, 0),
    _random_sparse(3000, 3000, 0.004, 1),          # n not a block multiple
    _random_sparse(2048, 300, 0.01, 2),            # tall (prolongation-like)
    _random_sparse(300, 2048, 0.02, 3, band=40),   # wide (restriction-like)
    _random_sparse(130, 130, 0.05, 4),             # single partial block
    sp.csr_matrix((512, 512)),                     # empty
    _random_sparse(600, 4096, 0.06, 6),            # dense rows → many chunks
    _skewed_sparse(),                              # kch skew across blocks
]


def _from_plan(plan, resident=False):
    soff = absolute_soff(plan) if resident else plan["soff"]
    return RoutedEll(val4=plan["val4"], lidx4=plan_lidx_packed(plan),
                     soff=soff, cbase=plan["cbase"], kch=plan["kch"],
                     sbase=plan["sbase"], n_rows=plan["n_rows"],
                     n_cols=plan["n_cols"], span=plan["span"],
                     nxp=plan["nxp"], nnz=plan["nnz"], kmax=plan["kmax"],
                     resident=resident, ws=plan.get("ws", 1))


@pytest.mark.parametrize("i", range(len(CASES)))
def test_plan_roundtrip_exact(i):
    m = CASES[i]
    plan = plan_routed(m, dtype=np.float64)
    assert plan is not None
    back = routed_to_scipy(_from_plan(plan))
    assert (back != m).nnz == 0
    assert plan["nnz"] == m.nnz


def test_compact_chunks_scale_with_local_demand():
    """The compact layout must NOT pad every block to the worst block's
    slot demand (that was the round-2 kernel's 0.216 packing efficiency)."""
    plan = plan_routed(CASES[7])
    assert plan is not None
    nb = -(-CASES[7].shape[0] // 1024)
    kch = plan["kch"][0, :nb]
    assert kch.max() > kch.min()          # skew is present
    assert plan["val4"].shape[0] == kch.sum() + 8   # compact + DMA_PAD tail
    assert plan["kmax"] == int(kch.max()) * KC


@pytest.mark.parametrize("i", range(len(CASES)))
def test_native_plan_matches_numpy(i):
    """The native OpenMP planner (csrc) must reproduce the numpy planner's
    layout bit-exactly (f32 values = f64 rounded once)."""
    from omp_amg_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    m = CASES[i]
    if m.nnz == 0:
        pytest.skip("empty matrix takes the shared zero-plan path")
    p_np = plan_routed(m, dtype=np.float64)
    p_nat = plan_routed(m, dtype=np.float32)
    assert "lidx4p" in p_nat, "native path was not taken"
    np.testing.assert_array_equal(p_nat["val4"],
                                  p_np["val4"].astype(np.float32))
    np.testing.assert_array_equal(p_nat["lidx4p"], plan_lidx_packed(p_np))
    for key in ("soff", "cbase", "kch", "sbase"):
        np.testing.assert_array_equal(p_nat[key], p_np[key])
    for key in ("span", "nxp", "kmax", "nnz"):
        assert p_nat[key] == p_np[key], key


@pytest.mark.parametrize("i", range(len(CASES)))
def test_spmv_xla_matches_scipy(i):
    m = CASES[i]
    a = routed_from_scipy(m)
    x = np.random.default_rng(10 + i).standard_normal(m.shape[1])
    y = spmv_routed_xla(a, jnp.asarray(x, jnp.float32))
    ref = m @ x
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(np.asarray(y) - ref).max() / scale < 5e-6


@pytest.mark.parametrize("mode", ["resident", "streamed"])
@pytest.mark.parametrize("i", [0, 2, 3, 4, 5, 6, 7])
def test_spmv_kernel_interpret_matches_scipy(i, mode, monkeypatch):
    if mode == "streamed":   # force the per-block span-DMA variant
        import omp_amg_tpu.sparse.routed as routed_mod
        monkeypatch.setattr(routed_mod, "RESIDENT_CAP_BYTES", 0)
    m = CASES[i]
    a = routed_from_scipy(m)
    assert a.resident == (mode == "resident")
    x = np.random.default_rng(20 + i).standard_normal(m.shape[1])
    y = spmv_routed(a, jnp.asarray(x, jnp.float32), interpret=True)
    ref = m @ x
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(np.asarray(y) - ref).max() / scale < 5e-6


@pytest.mark.parametrize("i", range(len(CASES)))
def test_resident_roundtrip_exact(i):
    """Resident mode (absolute soff) roundtrips exactly through
    routed_to_scipy's resident branch."""
    m = CASES[i]
    plan = plan_routed(m, dtype=np.float64)
    back = routed_to_scipy(_from_plan(plan, resident=True))
    assert (back != m).nnz == 0
    # routed_from_scipy builds the same absolute soff
    dev = routed_from_scipy(m)
    assert dev.resident
    assert np.array_equal(np.asarray(dev.soff), absolute_soff(plan))


def test_spmv_dispatch_uses_routed():
    m = CASES[0]
    a = routed_from_scipy(m)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(m.shape[0]),
                    jnp.float32)
    y = spmv(a, x)
    ref = m @ np.asarray(x)
    assert np.abs(np.asarray(y) - ref).max() / np.abs(ref).max() < 5e-6


def test_plan_efficiency_on_pmis_levels():
    """Per-sublane packing + compact chunks keep padded work near the nnz
    count on real PMIS coarse operators."""
    a = poisson3d_7pt(24)
    h, ops = amg_setup(a, AMGParams(coarsening="pmis"), keep_host=True,
                       flavor="host")
    a1 = ops[1]
    plan = plan_routed(a1)
    assert plan is not None
    ell_k = int(np.diff(a1.indptr).max())
    assert plan["kmax"] <= 4 * ell_k + KC
    assert plan["eff"] > 0.2


@pytest.mark.parametrize("prob", ["2d", "3d"])
def test_pmis_solve_routed_matches_ell(prob):
    """Hierarchy with routed views converges like the ELL hierarchy."""
    a = poisson2d_5pt(48) if prob == "2d" else poisson3d_7pt(14)
    params_off = AMGParams(coarsening="pmis", routed="off")
    params_on = AMGParams(coarsening="pmis", routed="force")
    h0 = amg_setup(a, params_off, flavor="host")
    h1 = amg_setup(a, params_on, flavor="host")
    # routed views actually present on some level operator
    assert any(isinstance(lv.a, RoutedEll) or isinstance(lv.p, RoutedEll)
               for lv in h1.levels)
    a_sp = dia_to_scipy(a)
    b = np.random.default_rng(5).standard_normal(a.shape[0])
    bj = jnp.asarray(b, jnp.float32)
    res0 = amg_pcg(a, bj, h0, tol=1e-6, maxiter=60)
    res1 = amg_pcg(a, bj, h1, tol=1e-6, maxiter=60)
    assert int(res1.iters) <= int(res0.iters) + 2
    r1 = b - a_sp @ np.asarray(res1.x, np.float64)
    assert np.linalg.norm(r1) / np.linalg.norm(b) < 5e-6


def test_fused_residual_jacobi_interpret():
    """Fused routed epilogues == unfused math (interpret mode)."""
    from omp_amg_tpu.ops.pallas_routed import (
        correct_routed, jacobi_routed, residual_routed,
    )

    rng = np.random.default_rng(5)
    n = 3000
    rows = np.repeat(np.arange(n), 6)
    cols = np.clip(rows + rng.integers(-400, 400, len(rows)), 0, n - 1)
    a_sp = sp.csr_matrix((rng.standard_normal(len(rows)), (rows, cols)),
                         shape=(n, n))
    a_sp.sum_duplicates()
    rt = routed_from_scipy(a_sp)
    assert rt is not None
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
    y = spmv_routed(rt, x, interpret=True)
    r = residual_routed(rt, x, b, interpret=True)
    np.testing.assert_allclose(np.asarray(r), np.asarray(b - y),
                               rtol=0, atol=1e-5)
    xj = jacobi_routed(rt, x, b, s, interpret=True)
    np.testing.assert_allclose(np.asarray(xj),
                               np.asarray(x + s * (b - y)),
                               rtol=0, atol=1e-5)
    # rectangular P (fine×coarse): x + P·xc fused correction
    nc = 1100
    pc = np.clip(rows // 3 + rng.integers(-20, 20, len(rows)), 0, nc - 1)
    p_sp = sp.csr_matrix((rng.standard_normal(len(rows)), (rows, pc)),
                         shape=(n, nc))
    p_sp.sum_duplicates()
    pt = routed_from_scipy(p_sp)
    assert pt is not None
    xc = jnp.asarray(rng.standard_normal(nc).astype(np.float32))
    xcorr = correct_routed(pt, xc, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(xcorr), np.asarray(x) + p_sp @ np.asarray(xc),
        rtol=0, atol=1e-4)


def test_skewed_kch_kernel_matches_xla():
    """Per-block chunk-loop trip counts (kch skew): the kernel must remain
    exact when blocks have very different active chunk counts, in both
    resident and streamed modes and with a fused epilogue."""
    from omp_amg_tpu.ops.pallas_routed import residual_routed

    m = _skewed_sparse()
    rng = np.random.default_rng(3)
    for force_streamed in (False, True):
        if force_streamed:
            import omp_amg_tpu.sparse.routed as routed_mod
            old = routed_mod.RESIDENT_CAP_BYTES
            routed_mod.RESIDENT_CAP_BYTES = 0
        try:
            rt = routed_from_scipy(m)
        finally:
            if force_streamed:
                routed_mod.RESIDENT_CAP_BYTES = old
        assert rt.resident == (not force_streamed)
        kch = np.asarray(rt.kch)[0, : rt.n_blocks]
        assert kch.min() >= 1 and kch.max() > kch.min()
        x = jnp.asarray(rng.standard_normal(m.shape[1]).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(m.shape[0]).astype(np.float32))
        y1 = spmv_routed(rt, x, interpret=True)
        y2 = spmv_routed_xla(rt, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=0, atol=1e-4)
        r = residual_routed(rt, x, b, interpret=True)
        np.testing.assert_allclose(np.asarray(r), np.asarray(b - y1),
                                   rtol=0, atol=1e-4)


@pytest.mark.parametrize("ws", [2, 4, 8])
@pytest.mark.parametrize("i", [0, 1, 3, 4, 6, 7])
def test_ws_plan_roundtrip_exact(i, ws):
    """Window-share packing (ws-aligned slot runs) is still an exact
    re-encoding; padded slots carry valid windows with val == 0."""
    m = CASES[i]
    plan = plan_routed(m, dtype=np.float64, ws=ws)
    assert plan is not None
    assert plan["ws"] == ws
    back = routed_to_scipy(_from_plan(plan))
    assert (back != m).nnz == 0
    # every ws-boundary slot that any active slot maps to shares its window:
    # soff within a run is constant by construction — verified via the
    # roundtrip above plus demand never shrinking below the ws=1 plan
    p1 = plan_routed(m, dtype=np.float64, ws=1)
    assert plan["val4"].shape[0] >= p1["val4"].shape[0]


@pytest.mark.parametrize("ws", [2, 4])
@pytest.mark.parametrize("i", [0, 2, 3, 7])
def test_ws_native_plan_matches_numpy(i, ws):
    from omp_amg_tpu import native

    if not native.available():
        pytest.skip("native lib unavailable")
    m = CASES[i]
    p_np = plan_routed(m, dtype=np.float64, ws=ws)
    p_nat = plan_routed(m, dtype=np.float32, ws=ws)
    assert "lidx4p" in p_nat, "native path was not taken"
    np.testing.assert_array_equal(p_nat["val4"],
                                  p_np["val4"].astype(np.float32))
    np.testing.assert_array_equal(p_nat["lidx4p"], plan_lidx_packed(p_np))
    for key in ("soff", "cbase", "kch", "sbase"):
        np.testing.assert_array_equal(p_nat[key], p_np[key])
    for key in ("span", "nxp", "kmax", "nnz", "ws"):
        assert p_nat[key] == p_np[key], key


@pytest.mark.parametrize("mode", ["resident", "streamed"])
@pytest.mark.parametrize("ws", [2, 4])
def test_ws_kernel_interpret_matches_scipy(ws, mode, monkeypatch):
    if mode == "streamed":
        import omp_amg_tpu.sparse.routed as routed_mod
        monkeypatch.setattr(routed_mod, "RESIDENT_CAP_BYTES", 0)
    for i in (0, 3, 7):
        m = CASES[i]
        a = routed_from_scipy(m, ws=ws)
        assert a.ws == ws
        x = np.random.default_rng(40 + i).standard_normal(m.shape[1])
        y = spmv_routed(a, jnp.asarray(x, jnp.float32), interpret=True)
        ref = m @ x
        scale = max(1.0, np.abs(ref).max())
        assert np.abs(np.asarray(y) - ref).max() / scale < 5e-6
        # XLA oracle agrees on the same ws plan
        y2 = spmv_routed_xla(a, jnp.asarray(x, jnp.float32))
        assert np.abs(np.asarray(y2) - ref).max() / scale < 5e-6


def _span_overflow_matrix(n=600_000):
    # a long-range coupling makes one row-block's column span exceed
    # S_CAP (4096 chunks = 524288 columns) -> plan_routed refuses
    d = np.ones(n)
    a_sp = sp.diags([2.0 * d, -0.5 * d[:-1], -0.5 * d[:-1]],
                    [0, 1, -1]).tocsr()
    a_sp = a_sp.tolil()
    a_sp[0, n - 1] = -0.1
    a_sp[n - 1, 0] = -0.1
    return a_sp.tocsr()


def test_split_routed_spmv_exact():
    """Column-split routed plans (cap-overflow fallback, VERDICT r3 #8)
    reproduce the operator exactly."""
    from omp_amg_tpu.ops.spmv import spmv
    from omp_amg_tpu.sparse.routed import (
        SplitRoutedEll, plan_routed, routed_split_from_scipy,
    )

    a_sp = _span_overflow_matrix()
    assert plan_routed(a_sp) is None
    srt = routed_split_from_scipy(a_sp)
    assert isinstance(srt, SplitRoutedEll)
    assert len(srt.parts) >= 2 and srt.nnz == a_sp.nnz
    import jax

    x = np.random.default_rng(7).standard_normal(a_sp.shape[1])
    y = jax.jit(spmv)(srt, jnp.asarray(x, jnp.float32))
    ref = a_sp @ x
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(np.asarray(y) - ref).max() / scale < 5e-6


def test_cap_exceeding_operator_splits_and_solves():
    """VERDICT r3 #8: an operator beyond a single routed plan's caps now
    routes through the column-split composition (TPU-kernel SpMV, no
    warning) and the end-to-end solve works."""
    import warnings

    from omp_amg_tpu.sparse.routed import SplitRoutedEll

    a_sp = _span_overflow_matrix()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        h = amg_setup(a_sp, AMGParams(coarsening="pmis", routed="force",
                                      max_levels=8, coarse_size=800))
    msgs = [str(w.message) for w in rec]
    assert not any("plan caps" in m for m in msgs), msgs
    assert isinstance(h.levels[0].a, SplitRoutedEll)
    n = a_sp.shape[0]
    b = np.ones(n, np.float32)
    res = amg_pcg(h.levels[0].a, jnp.asarray(b), h, tol=1e-6, maxiter=200)
    rel = np.linalg.norm(b - a_sp @ np.asarray(res.x, np.float64)) \
        / np.linalg.norm(b)
    assert rel < 5e-5


def test_cap_exceeding_operator_warns_when_split_fails(monkeypatch):
    """When even the column split cannot plan, the setup must warn loudly
    before falling to the XLA gather path (never silent)."""
    import warnings

    from omp_amg_tpu.sparse import routed as routed_mod

    a_sp = _span_overflow_matrix(200_000 * 3)
    monkeypatch.setattr(routed_mod, "routed_split_from_scipy",
                        lambda *a, **k: None)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        h = amg_setup(a_sp, AMGParams(coarsening="pmis", routed="force",
                                      max_levels=8, coarse_size=800))
    msgs = [str(w.message) for w in rec]
    assert any("plan caps" in m for m in msgs), msgs
    from omp_amg_tpu.sparse.formats import ell_from_scipy

    n = a_sp.shape[0]
    b = np.ones(n, np.float32)
    res = amg_pcg(ell_from_scipy(a_sp), jnp.asarray(b), h, tol=1e-6,
                  maxiter=200)
    rel = np.linalg.norm(b - a_sp @ np.asarray(res.x, np.float64)) \
        / np.linalg.norm(b)
    assert rel < 5e-5


def test_bf16_routed_plan_and_spmv():
    """bf16 routed plans go through the fast native planner (cast at put)
    and the kernel/oracle compute within bf16 tolerance — the transfer-
    operator compression used at 256³ scale."""
    m = CASES[0]
    a16 = routed_from_scipy(m, dtype=jnp.bfloat16)
    assert a16 is not None
    assert str(a16.val4.dtype) == "bfloat16"
    x = np.random.default_rng(3).standard_normal(m.shape[1])
    y = spmv_routed_xla(a16, jnp.asarray(x, jnp.float32))
    ref = m @ x
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(y) - ref).max() / scale < 2e-2
    yk = spmv_routed(a16, jnp.asarray(x, jnp.float32), interpret=True)
    assert np.abs(np.asarray(yk) - ref).max() / scale < 2e-2
