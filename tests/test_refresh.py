"""Value-only hierarchy refresh (amg/refresh.py) vs fresh setups.

The refresh contract: for a same-sparsity operator whose values preserve
every symbolic decision, ``amg_refresh`` must reproduce a FRESH setup's
hierarchy — same structure, same plan geometry, values equal to f32
roundoff — while skipping strength/PMIS/planning. Pattern drift must be
detected, never silently mis-applied.
"""

import dataclasses

import numpy as np
import pytest

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.amg.refresh import (
    PatternChangedError, SetupCache, amg_refresh,
)
from omp_amg_tpu.sparse.formats import Dia, dia_to_scipy
from omp_amg_tpu.sparse.routed import RoutedEll, routed_to_scipy


def _scale_dia(a, s):
    return Dia(data=np.asarray(a.data) * s, offsets=a.offsets, dims=a.dims)


def _compare_hier(h_ref, h_new, rtol=2e-6):
    assert len(h_ref.levels) == len(h_new.levels)
    for lr, ln in zip(h_ref.levels, h_new.levels):
        assert type(lr.a) is type(ln.a)
        np.testing.assert_allclose(np.asarray(ln.dinv), np.asarray(lr.dinv),
                                   rtol=rtol)
        np.testing.assert_allclose(float(ln.lmax), float(lr.lmax),
                                   rtol=1e-4)
        for attr in ("a", "p", "r"):
            opr, opn = getattr(lr, attr), getattr(ln, attr)
            if isinstance(opr, RoutedEll):
                # identical geometry...
                for f in ("soff", "cbase", "kch", "sbase", "lidx4"):
                    np.testing.assert_array_equal(
                        np.asarray(getattr(opn, f)),
                        np.asarray(getattr(opr, f)), err_msg=f)
                # ...and values to f32 roundoff
                np.testing.assert_allclose(
                    np.asarray(opn.val4), np.asarray(opr.val4),
                    rtol=rtol, atol=1e-7)
            elif hasattr(opr, "val"):
                np.testing.assert_array_equal(np.asarray(opn.col),
                                              np.asarray(opr.col))
                np.testing.assert_allclose(np.asarray(opn.val),
                                           np.asarray(opr.val), rtol=rtol,
                                           atol=1e-7)
    np.testing.assert_allclose(np.asarray(h_new.coarse_chol),
                               np.asarray(h_ref.coarse_chol), rtol=1e-5,
                               atol=1e-8)


@pytest.mark.parametrize("gen,n,prm,backend", [
    (amg.poisson3d_7pt, 20, AMGParams(coarsening="pmis"), None),
    (amg.poisson2d_5pt, 48, AMGParams(coarsening="pmis"), None),
    (amg.aniso2d_9pt, 48, AMGParams(coarsening="pmis", theta=0.5), None),
    # numpy-backed Dia takes the setup's DIA-plane fast path: the refresh
    # must reconstruct the SAME plane layout (round-5 fix — the 27-pt
    # refresh guard used to trip on layout, not on actual drift)
    (amg.poisson3d_27pt, 12,
     AMGParams(coarsening="pmis", smoother="chebyshev"), "numpy"),
    (amg.poisson3d_7pt, 20, AMGParams(coarsening="pmis"), "numpy"),
])
def test_refresh_matches_fresh_setup(gen, n, prm, backend):
    # ×2 is exact in f32: no rounding, hence no truncation-tie flips — the
    # fresh setup and the refresh must agree to f32 roundoff everywhere
    a = gen(n, backend=backend) if backend else gen(n)
    cache = SetupCache()
    amg_setup(a, prm, cache=cache)
    a2 = _scale_dia(a, 2.0)
    h_fresh = amg_setup(a2, prm)
    h_ref = amg_refresh(a2, cache)
    _compare_hier(h_fresh, h_ref)
    # second refresh takes the WARM pure-numeric path (reconstructed ELL
    # planes, p_pos ordering, shared R stream, spgemm_numeric) — it too
    # must match a fresh setup, not just the cold refresh (ADVICE r4)
    a4 = _scale_dia(a, 4.0)
    h_fresh4 = amg_setup(a4, prm)
    h_warm = amg_refresh(a4, cache)
    _compare_hier(h_fresh4, h_warm)


def test_refresh_pinned_pattern_on_tie_flips():
    """Non-dyadic scaling perturbs f32 ratios enough to flip ext+i
    truncation near-ties; the refresh must PIN the cached pattern (not
    fail), and the result must still solve to full accuracy."""
    a = amg.poisson3d_7pt(20)
    prm = AMGParams(coarsening="pmis")
    cache = SetupCache()
    h0 = amg_setup(a, prm, cache=cache)
    a2 = _scale_dia(a, 1.7)
    h = amg_refresh(a2, cache)   # raised PatternChangedError pre-pinning
    # identical geometry with the ORIGINAL hierarchy (shared plans)
    for l0, ln in zip(h0.levels, h.levels):
        if isinstance(l0.a, RoutedEll):
            assert ln.a.lidx4 is l0.a.lidx4   # geometry arrays shared
    from omp_amg_tpu.solvers.cg import amg_pcg

    b = amg.default_rhs(a2, "random", seed=5)
    res = amg_pcg(a2, b, h, tol=1e-6, maxiter=100)
    h2 = amg_setup(a2, prm)
    res2 = amg_pcg(a2, b, h2, tol=1e-6, maxiter=100)
    assert abs(int(res.iters) - int(res2.iters)) <= 1
    a_sp = dia_to_scipy(a2)
    b64 = np.asarray(b, np.float64)
    rel = np.linalg.norm(b64 - a_sp @ np.asarray(res.x, np.float64)) \
        / np.linalg.norm(b64)
    assert rel < 5e-5


def test_refresh_solves_identically():
    a = amg.poisson3d_7pt(20)
    prm = AMGParams(coarsening="pmis")
    cache = SetupCache()
    amg_setup(a, prm, cache=cache)
    a2 = _scale_dia(a, 0.35)
    h = amg_refresh(a2, cache)
    from omp_amg_tpu.solvers.cg import amg_pcg

    b = amg.default_rhs(a2, "random", seed=3)
    res = amg_pcg(a2, b, h, tol=1e-6, maxiter=100)
    h2 = amg_setup(a2, prm)
    res2 = amg_pcg(a2, b, h2, tol=1e-6, maxiter=100)
    assert int(res.iters) == int(res2.iters)
    a_sp = dia_to_scipy(a2)
    b64 = np.asarray(b, np.float64)
    rel = np.linalg.norm(b64 - a_sp @ np.asarray(res.x, np.float64)) \
        / np.linalg.norm(b64)
    assert rel < 5e-5


def test_refresh_roundtrip_operator_values():
    """The refreshed routed operators encode exactly the new matrices."""
    a = amg.poisson3d_7pt(16)
    prm = AMGParams(coarsening="pmis")
    cache = SetupCache()
    h0, ops = amg_setup(a, prm, cache=cache, keep_host=True)
    a2 = _scale_dia(a, 2.5)
    h = amg_refresh(a2, cache)
    _, ops2 = amg_setup(a2, prm, keep_host=True)
    for li, lv in enumerate(h.levels):
        if isinstance(lv.a, RoutedEll):
            back = routed_to_scipy(lv.a)
            d = abs(back - ops2[li].astype(np.float32)).max()
            assert d < 1e-5 * abs(ops2[li]).max()


def test_refresh_detects_pattern_change():
    a = amg.poisson2d_5pt(32)
    prm = AMGParams(coarsening="pmis")
    cache = SetupCache()
    amg_setup(a, prm, cache=cache)
    # break the strength pattern: weaken the ±1 bands massively (the
    # operator becomes strongly 1D along the other axis)
    data = np.asarray(a.data).copy()
    for i, o in enumerate(a.offsets):
        if abs(o) == 1:
            data[i] *= 1e-6
    a_bad = Dia(data=data, offsets=a.offsets, dims=a.dims)
    with pytest.raises(PatternChangedError):
        amg_refresh(a_bad, cache)


def test_refresh_warm_csr_guard_checks_indptr():
    """Two CSR operators with identical concatenated column indices but a
    shifted row boundary must be DETECTED by the warm L0 guard (it used to
    compare only nnz + the flat indices array — ADVICE r4 medium)."""
    a = amg.poisson2d_5pt(24)
    a0 = dia_to_scipy(a).tocsr()
    a0.sort_indices()
    prm = AMGParams(coarsening="pmis", routed="force")
    cache = SetupCache()
    amg_setup(a0, prm, cache=cache)      # CSR-input setup: L0 stays ELL
    a_sp = (a0 * 2.0).tocsr()
    a_sp.sort_indices()
    amg_refresh(a_sp, cache)             # cold: freezes the CSR dataflow
    amg_refresh(a_sp * 1.5, cache)       # warm control: same pattern, ok
    bad = a_sp.copy()
    ip = bad.indptr.copy()
    ip[1] -= 1    # last entry of row 0 becomes the head of row 1
    bad.indptr = ip
    bad.has_sorted_indices = True        # bypass the canonicalizing sort
    with pytest.raises(PatternChangedError, match="CSR pattern changed"):
        amg_refresh(bad, cache)


def test_cache_rejects_structured_and_device_flavors():
    a = amg.poisson3d_7pt(16)
    with pytest.raises(ValueError):
        amg_setup(a, AMGParams(coarsening="structured"), grid=(16,) * 3,
                  cache=SetupCache())


def test_facade_refresh():
    a = amg.poisson3d_7pt(16)
    s = amg.AMGSolver(a, AMGParams(coarsening="pmis"), refreshable=True)
    b = amg.default_rhs(a, "random", seed=0)
    x1 = s.solve(b, tol=1e-8)
    a2 = _scale_dia(a, 4.0)
    s.refresh(a2)
    x2 = s.solve(b, tol=1e-8)
    # exact scaling: x2 == x1 / 4 (same rhs)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1) / 4.0,
                               rtol=1e-6, atol=1e-9)
    assert s.last_info["certified_f64"]


def test_facade_refresh_falls_back_on_pattern_change():
    a = amg.poisson2d_5pt(32)
    s = amg.AMGSolver(a, AMGParams(coarsening="pmis"), refreshable=True)
    data = np.asarray(a.data).copy()
    # weaken the ±1 bands SYMMETRICALLY (keeps SPD, breaks the strength
    # pattern: the operator becomes strongly 1D in the other direction)
    for i, o in enumerate(a.offsets):
        if abs(o) == 1:
            data[i] *= 1e-6
    a_bad = Dia(data=data, offsets=a.offsets, dims=a.dims)
    with pytest.warns(UserWarning, match="pattern guard"):
        s.refresh(a_bad)
    b = amg.default_rhs(a_bad, "random", seed=1)
    x = s.solve(b, tol=1e-8)
    rel = np.linalg.norm(np.asarray(b, np.float64)
                         - dia_to_scipy(a_bad) @ np.asarray(x, np.float64)) \
        / np.linalg.norm(np.asarray(b))
    assert rel <= 1e-7


def test_refresh_bf16_streams_certify():
    """stream_dtype="bf16" halves the refresh transfer bytes (the warm
    refresh is relay-transfer-floor-bound — BASELINE.md); the routed
    values land bf16-rounded but the f64 IR still certifies 1e-8."""
    import omp_amg_tpu as amg
    from omp_amg_tpu.solvers.ir import solve_ir
    from omp_amg_tpu.sparse.formats import Dia, dia_to_scipy
    from omp_amg_tpu.sparse.routed import RoutedEll

    a = amg.poisson3d_7pt(48)
    cache = SetupCache()
    amg_setup(a, AMGParams(coarsening="pmis", routed="force"), cache=cache)
    a2 = Dia(data=np.asarray(a.data) * 1.3, offsets=a.offsets, dims=a.dims)
    h32 = amg_refresh(a2, cache)
    h16 = amg_refresh(a2, cache, stream_dtype="bf16")
    diffs = [
        np.abs(np.asarray(getattr(l1, nm).val4, np.float32)
               - np.asarray(getattr(l2, nm).val4, np.float32)).max()
        for l1, l2 in zip(h32.levels, h16.levels)
        for nm in ("a", "p", "r")
        if isinstance(getattr(l1, nm), RoutedEll)
    ]
    assert diffs and max(diffs) > 0          # rounding genuinely applied
    assert max(diffs) < 0.1                  # ...and bf16-sized
    b = amg.default_rhs(a2, "random", seed=0)
    res = solve_ir(dia_to_scipy(a2), np.asarray(b, np.float64), a2, h16,
                   tol=1e-8, maxiter=300)
    assert res.rel_residual <= 1e-8


def test_facade_refresh_stream_dtype_kwarg():
    """AMGSolver.refresh(a_new, stream_dtype="bf16") passes the knob
    through (VERDICT r4 missing #3: the facade exposed no way to pick the
    half-width streams)."""
    a = amg.poisson3d_7pt(24)
    s = amg.AMGSolver(a, AMGParams(coarsening="pmis", routed="force"),
                      refreshable=True)
    b = amg.default_rhs(a, "random", seed=2)
    x1 = s.solve(b, tol=1e-8)
    a2 = _scale_dia(a, 1.5)
    s.refresh(a2, stream_dtype="bf16")
    # routed values are bf16-rounded -> not exactly x1/1.5 pre-certify,
    # but the f64 IR still certifies the final residual
    x2 = s.solve(b, tol=1e-8)
    assert s.last_info["certified_f64"]
    a_sp = dia_to_scipy(a2)
    rel = np.linalg.norm(np.asarray(b, np.float64)
                         - a_sp @ np.asarray(x2, np.float64)) \
        / np.linalg.norm(np.asarray(b))
    assert rel <= 1e-8


def test_stream_dtype_auto_resolution(monkeypatch):
    """"auto" (the round-5 default) resolves by fine-operator element
    count: f32 below OMP_AMG_STREAM_BF16_NNZ, bf16 at/above — and the
    cut is stable across cold/warm refreshes (same input → same dtype,
    so the device scatter program compiles once)."""
    from omp_amg_tpu.amg.refresh import _resolve_stream_dtype

    assert _resolve_stream_dtype("auto", 6_000_000) == "f32"   # 7pt 96^3
    assert _resolve_stream_dtype("auto", 56_623_104) == "bf16"  # 27pt 128^3
    assert _resolve_stream_dtype("f32", 10**9) == "f32"        # explicit
    assert _resolve_stream_dtype("bf16", 1) == "bf16"
    monkeypatch.setenv("OMP_AMG_STREAM_BF16_NNZ", "100")
    assert _resolve_stream_dtype("auto", 101) == "bf16"


def test_refresh_auto_picks_bf16_above_threshold(monkeypatch):
    """End-to-end: with the auto threshold lowered, the default refresh
    ships bf16 streams (values match an explicit stream_dtype="bf16"
    refresh bitwise) and the f64 IR still certifies."""
    import omp_amg_tpu as amg
    from omp_amg_tpu.sparse.formats import Dia
    from omp_amg_tpu.sparse.routed import RoutedEll

    a = amg.poisson3d_7pt(24)
    cache = SetupCache()
    amg_setup(a, AMGParams(coarsening="pmis", routed="force"), cache=cache)
    a2 = Dia(data=np.asarray(a.data) * 1.7, offsets=a.offsets, dims=a.dims)
    monkeypatch.setenv("OMP_AMG_STREAM_BF16_NNZ", "1")
    h_auto = amg_refresh(a2, cache)                      # auto -> bf16
    h16 = amg_refresh(a2, cache, stream_dtype="bf16")
    for l1, l2 in zip(h_auto.levels, h16.levels):
        for nm in ("a", "p", "r"):
            o1, o2 = getattr(l1, nm), getattr(l2, nm)
            if isinstance(o1, RoutedEll):
                np.testing.assert_array_equal(
                    np.asarray(o1.val4, np.float32),
                    np.asarray(o2.val4, np.float32))


def test_refresh_non_dyadic_scale_does_not_trip_dropped_guard():
    """Regression (round 5): the interp value pipeline is f32, so a
    NON-dyadic value change (×1.7 — not exactly representable) leaves
    ~1e-8·scale residue on Galerkin entries that cancelled exactly at
    setup. The dropped-entry guard must tolerate f32-roundoff-sized
    residue (it used a f64-sized 1e-12 bar and spuriously raised
    PatternChangedError; measured residue 1.4e-8 at 24³)."""
    import omp_amg_tpu as amg
    from omp_amg_tpu.sparse.formats import Dia

    a = amg.poisson3d_7pt(24)
    cache = SetupCache()
    amg_setup(a, AMGParams(coarsening="pmis", routed="force"), cache=cache)
    a2 = Dia(data=np.asarray(a.data) * 1.7, offsets=a.offsets, dims=a.dims)
    h = amg_refresh(a2, cache)   # must not raise
    h2 = amg_refresh(a2, cache)  # warm path either
    assert len(h.levels) == len(h2.levels)


def test_setup_recorded_galerkin_patterns_match_derivation():
    """The setup-recorded structural A*P / Pt(AP) patterns (round 5:
    galerkin_product patterns_out) must equal the ones-product derivation
    the cold refresh otherwise runs — the Gustavson pattern is
    value-independent."""
    import scipy.sparse as sp

    from omp_amg_tpu import native
    from omp_amg_tpu.amg.refresh import _csr_of, _pat

    a = amg.poisson3d_7pt(16)
    prm = AMGParams(coarsening="pmis")
    cache = SetupCache()
    amg_setup(a, prm, cache=cache)
    for li, c in enumerate(cache.levels):
        assert "ap_pat" in c and "acs_pat" in c
        # re-derive structurally from the cached A/P patterns
        amg_refresh(_scale_dia(a, 2.0), cache)  # cold builds num w/ cache
        num = c["num"]
        a64 = _csr_of(num["a_pat"], np.ones(len(num["a_pat"][1])))
        p64 = _csr_of(num["p_pat"], np.ones(len(num["p_pat"][1])))
        pt64 = _csr_of(num["pt_pat"], np.ones(len(num["pt_pat"][1])))
        ap = native.spgemm(a64, p64)
        acs = native.spgemm(pt64, ap)
        ap_pat = _pat(ap.indptr, ap.indices, ap.shape[1])
        acs_pat = _pat(acs.indptr, acs.indices, acs.shape[1])
        for got, want in ((num["ap_pat"], ap_pat),
                          (num["acs_pat"], acs_pat)):
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])
            assert got[2] == want[2]
        break   # L0 suffices (deeper levels exercise the same code)
