"""Structured (tensor-grid semicoarsening) mode tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup, hierarchy_stats
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.amg.structured import (
    GridProlong, GridRestrict, apply_prolong, apply_restrict,
    prolong_to_scipy, strong_axes,
)
from omp_amg_tpu.amg.vcycle import vcycle
from omp_amg_tpu.sparse.formats import Dia
from omp_amg_tpu.solvers.cg import amg_pcg


@pytest.mark.parametrize("dims,coarsened", [
    ((8,), (True,)),
    ((9, 7), (True, True)),
    ((6, 10), (False, True)),
    ((5, 6, 7), (True, False, True)),
])
def test_grid_transfers_match_matrix(dims, coarsened):
    coarse = tuple((d + 1) // 2 if c else d for d, c in zip(dims, coarsened))
    p = GridProlong(fine_shape=dims, coarse_shape=coarse, coarsened=coarsened)
    r = GridRestrict(fine_shape=dims, coarse_shape=coarse, coarsened=coarsened)
    p_sp = prolong_to_scipy(p)
    rng = np.random.default_rng(0)
    xc = rng.standard_normal(int(np.prod(coarse)))
    xf = rng.standard_normal(int(np.prod(dims)))
    np.testing.assert_allclose(
        np.asarray(apply_prolong(p, jnp.asarray(xc, jnp.float32))),
        p_sp @ xc, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(apply_restrict(r, jnp.asarray(xf, jnp.float32))),
        p_sp.T @ xf, rtol=1e-6, atol=1e-5)


def test_strong_axes_detection():
    a = amg.aniso2d_9pt(16, eps=1e-3)
    assert strong_axes(a, (16, 16), 0.25) == (True, False)  # y only
    a2 = amg.poisson3d_7pt(8)
    assert strong_axes(a2, (8, 8, 8), 0.25) == (True, True, True)


@pytest.mark.parametrize("gen,dims,bound", [
    (lambda: amg.poisson2d_5pt(64), (64, 64), 12),
    (lambda: amg.poisson3d_7pt(16), (16, 16, 16), 12),
    (lambda: amg.poisson3d_27pt(12), (12, 12, 12), 12),
    (lambda: amg.aniso2d_9pt(48, eps=1e-3), (48, 48), 16),
])
def test_structured_solve_configs(gen, dims, bound):
    a = gen()
    b = amg.default_rhs(a, "random", seed=0)
    hier = amg_setup(a, grid=dims)
    # every level operator is banded (Dia) or matrix-free constant-stencil
    # (ConstDia) — the TPU no-gather invariant
    from omp_amg_tpu.sparse.formats import ConstDia

    for lv in hier.levels:
        assert isinstance(lv.a, (Dia, ConstDia))
        assert isinstance(lv.p, GridProlong)
    res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    assert float(res.rel_residual) <= 1e-6
    assert int(res.iters) <= bound, f"structured solve took {int(res.iters)}"
    # ground truth
    a_sp = amg.dia_to_scipy(a)
    true_rel = np.linalg.norm(
        np.asarray(b, np.float64) - a_sp @ np.asarray(res.x, np.float64)
    ) / np.linalg.norm(np.asarray(b, np.float64))
    assert true_rel <= 1e-4


def test_structured_grid_independence():
    iters = []
    for n in (16, 32, 48):
        a = amg.poisson2d_5pt(n)
        b = amg.default_rhs(a, "random", seed=0)
        hier = amg_setup(a, grid=(n, n))
        res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
        iters.append(int(res.iters))
    assert max(iters) - min(iters) <= 2, iters


def test_structured_vs_pmis_both_available():
    a = amg.poisson2d_5pt(32)
    h_pmis = amg_setup(a, AMGParams(coarsening="pmis"), grid=(32, 32))
    h_struct = amg_setup(a, AMGParams(coarsening="structured"), grid=(32, 32))
    assert not isinstance(h_pmis.levels[0].p, GridProlong)
    assert isinstance(h_struct.levels[0].p, GridProlong)
    b = amg.default_rhs(a, "random", seed=0)
    for h in (h_pmis, h_struct):
        res = amg_pcg(a, b, h, tol=1e-6, maxiter=100)
        assert float(res.rel_residual) <= 1e-6


@pytest.mark.parametrize("gen,dims", [
    (lambda: amg.poisson2d_5pt(12), (12, 12)),
    (lambda: amg.poisson3d_7pt(6), (6, 6, 6)),
    (lambda: amg.aniso2d_9pt(10, eps=1e-3), (10, 10)),
    (lambda: amg.poisson3d_27pt(5), (5, 5, 5)),
])
def test_comb_rap_matches_scipy_galerkin(gen, dims):
    """Lattice-comb RAP == exact scipy sparse triple product."""
    from omp_amg_tpu.amg import comb_rap as cr
    from omp_amg_tpu.ops.rap import galerkin_product
    from omp_amg_tpu.sparse.formats import Dia, dia_to_scipy

    a = gen()
    axes = strong_axes(a, dims, 0.25)
    if not any(axes):
        axes = tuple(True for _ in dims)
    coarse = tuple((d + 1) // 2 if c else d for d, c in zip(dims, axes))
    offs, data = list(a.offsets), np.asarray(a.data, np.float64)
    offs_c, data_c = cr.comb_rap(offs, data, dims, coarse, axes, xp=np)

    p = GridProlong(fine_shape=dims, coarse_shape=coarse, coarsened=axes)
    ac_ref = galerkin_product(amg.dia_to_scipy(a), prolong_to_scipy(p))
    nc = ac_ref.shape[0]
    dense = np.zeros((nc, nc))
    for k, off in enumerate(offs_c):
        i0, i1 = max(0, -off), min(nc, nc - off)
        idx = np.arange(i0, i1)
        dense[idx, idx + off] = data_c[k, i0:i1]
    assert np.abs(dense - ac_ref.toarray()).max() < 1e-10 * abs(ac_ref).max()


def test_structured_non_cubic_grid():
    a = amg.poisson3d_7pt(24, 16, 12)  # dims (12, 16, 24)
    b = amg.default_rhs(a, "random", seed=0)
    hier = amg_setup(a, grid=(12, 16, 24))
    res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    assert float(res.rel_residual) <= 1e-6
    assert int(res.iters) <= 14
    a_sp = amg.dia_to_scipy(a)
    true_rel = np.linalg.norm(
        np.asarray(b, np.float64) - a_sp @ np.asarray(res.x, np.float64)
    ) / np.linalg.norm(np.asarray(b, np.float64))
    assert true_rel <= 1e-4


def test_structured_odd_sizes():
    a = amg.poisson2d_5pt(37, 23)  # odd, non-square
    b = amg.default_rhs(a, "random", seed=0)
    hier = amg_setup(a, grid=(23, 37))
    res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    assert float(res.rel_residual) <= 1e-6
    assert int(res.iters) <= 14


def test_device_structured_setup_matches_host():
    """Accelerator-resident setup: same hierarchy shape, converging solve."""
    a = amg.poisson3d_7pt(16)
    b = amg.default_rhs(a, "random", seed=0)
    h_host = amg_setup(a, grid=(16, 16, 16))
    h_dev = amg_setup(a, grid=(16, 16, 16), flavor="device")
    assert len(h_dev.levels) == len(h_host.levels)
    for lh, ld in zip(h_host.levels, h_dev.levels):
        assert lh.p.coarse_shape == ld.p.coarse_shape
        assert lh.p.coarsened == ld.p.coarsened
        np.testing.assert_allclose(float(lh.lmax), float(ld.lmax), rtol=1e-2)
    res = amg_pcg(a, b, h_dev, tol=1e-6, maxiter=100)
    assert float(res.rel_residual) <= 1e-6
    assert int(res.iters) <= 12


def test_device_structured_setup_aniso():
    a = amg.aniso2d_9pt(32, eps=1e-3)
    h_dev = amg_setup(a, grid=(32, 32), flavor="device")
    assert h_dev.levels[0].p.coarsened == (True, False)  # semicoarsening kept
    b = amg.default_rhs(a, "random", seed=0)
    res = amg_pcg(a, b, h_dev, tol=1e-6, maxiter=100)
    assert float(res.rel_residual) <= 1e-6


def test_factored_rap_matches_comb():
    """Per-axis-factored (MXU matmul) RAP == f64 comb oracle to f32 eps."""
    import jax.numpy as jnp

    from omp_amg_tpu.amg.comb_rap import (
        _device_factored_fn, comb_rap, comb_rap_device,
    )

    cases = [("poisson3d_7pt", (10,)), ("poisson3d_7pt", (8, 12, 6)),
             ("poisson3d_27pt", (7,)), ("aniso2d_9pt", (14,)),
             ("poisson2d_5pt", (2, 8)),  # nx=2: two deltas alias one offset
             ("poisson2d_5pt", (16, 11))]
    for maker, args in cases:
        a = getattr(amg, maker)(*args)
        dims = tuple(a.dims)
        d = len(dims)
        for axes in {(True,) * d, (True, False) + (True,) * (d - 2),
                     (False, True) + (True,) * (d - 2)}:
            axes = axes[:d]
            if any(c and dd < 3 for c, dd in zip(axes, dims)):
                continue
            cdims = tuple((dd + 1) // 2 if c else dd
                          for dd, c in zip(dims, axes))
            offs, data = list(a.offsets), np.asarray(a.data, np.float64)
            o1, d1 = comb_rap(offs, data, dims, cdims, axes, xp=np)
            fn = _device_factored_fn(tuple(offs), tuple(dims), tuple(cdims),
                                     tuple(axes))
            o2, d2 = fn(jnp.asarray(data, jnp.float32))
            d2 = np.asarray(d2, np.float64)
            keep = [k for k in range(len(o2)) if np.abs(d2[k]).max() > 0]
            assert o1 == [o2[k] for k in keep], (maker, dims, axes)
            np.testing.assert_allclose(d1, d2[keep], atol=3e-6 * max(
                1.0, np.abs(d1).max()), err_msg=f"{maker}{dims}{axes}")
            # full entry (auto engine → factored) agrees after zero-filter
            o3, _ = comb_rap_device(offs, jnp.asarray(data, jnp.float32),
                                    dims, cdims, axes)
            assert o3 == o1


def test_direct_rap_matches_comb():
    """Direct convolution RAP == comb probe RAP (offsets, values, masks)."""
    import numpy as np
    import omp_amg_tpu as amg
    from omp_amg_tpu.amg.comb_rap import comb_rap, direct_rap

    cases = []
    for maker, n in (("poisson3d_7pt", 16), ("poisson3d_27pt", 8),
                     ("aniso2d_9pt", 16)):
        a = getattr(amg, maker)(n)
        cases.append((list(a.offsets), np.asarray(a.data, np.float64),
                      a.dims))
    a = amg.poisson3d_7pt(15)  # odd extent
    cases.append((list(a.offsets), np.asarray(a.data, np.float64), a.dims))
    for offsets, data, dims in cases:
        d = len(dims)
        for axes in {(True,) * d, (True, False) + (True,) * (d - 2),
                     (False, True) + (True,) * (d - 2)}:
            axes = axes[:d]
            cdims = tuple((dd + 1) // 2 if c else dd
                          for dd, c in zip(dims, axes))
            o1, d1 = comb_rap(offsets, data, dims, cdims, axes, xp=np)
            o2, d2 = direct_rap(offsets, data, dims, cdims, axes, xp=np)
            keep = [k for k in range(len(o2)) if np.abs(d2[k]).max() > 0]
            assert o1 == [o2[k] for k in keep], (dims, axes)
            np.testing.assert_allclose(d1, d2[keep], atol=1e-12)


def test_matmul_transfers_match_slice_path():
    """MXU-matmul grid transfers == slice-based transfers (f32-tight).

    Products are exact (power-of-two weights); only summation order may
    differ, so compare with a tiny relative tolerance.
    """
    import jax.numpy as jnp
    import numpy as np
    from omp_amg_tpu.amg.structured import (
        GridProlong, GridRestrict, _transfer_matmul, apply_prolong,
        apply_restrict,
    )

    rng = np.random.default_rng(3)
    for dims in ((16, 12, 8), (9, 7, 128), (17, 16, 15)):
        for axes in ((True, True, True), (True, False, True),
                     (False, True, False)):
            cdims = tuple((d + 1) // 2 if c else d
                          for d, c in zip(dims, axes))
            r = GridRestrict(fine_shape=dims, coarse_shape=cdims,
                             coarsened=axes)
            p = GridProlong(fine_shape=dims, coarse_shape=cdims,
                            coarsened=axes)
            xf = jnp.asarray(
                rng.standard_normal(int(np.prod(dims))), jnp.float32)
            xc = jnp.asarray(
                rng.standard_normal(int(np.prod(cdims))), jnp.float32)
            got_r = _transfer_matmul(xf, dims, cdims, axes, prolong=False)
            got_p = _transfer_matmul(xc, cdims, dims, axes, prolong=True)
            ref_r = apply_restrict(r, xf)   # slice path (CPU backend)
            ref_p = apply_prolong(p, xc)
            np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref_r),
                                       rtol=2e-6, atol=2e-6)
            np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p),
                                       rtol=2e-6, atol=2e-6)


def test_axis_mat_apply_matches_axis_ops():
    """Slab-transfer helper: per-axis matmul == slice-based axis ops."""
    import jax.numpy as jnp
    import numpy as np
    from omp_amg_tpu.amg.structured import (
        _axis_mat_apply, _axis_restrict_mat, _prolong_axis, _restrict_axis,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((6, 10, 12)), jnp.float32)
    for ax, (nf, nc) in ((0, (6, 3)), (1, (10, 5)), (2, (12, 6))):
        m = jnp.asarray(_axis_restrict_mat(nf, nc))
        got = _axis_mat_apply(x, ax, m)
        ref = _restrict_axis(x, ax, nc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)
        xc = jnp.asarray(rng.standard_normal(
            tuple(nc if a == ax else s for a, s in enumerate(x.shape))),
            jnp.float32)
        got = _axis_mat_apply(xc, ax, m.T)
        ref = _prolong_axis(xc, ax, nf)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)


def test_const_synthesized_host_planes_match_pull(monkeypatch):
    """Host setup on an accelerator-resident ConstDia-eligible operator
    synthesizes its f64 planes from index math (no bulk pull) — the
    hierarchy must be identical to the pull-based one."""
    import numpy as np
    import omp_amg_tpu as amg
    from omp_amg_tpu.amg.hierarchy import amg_setup

    monkeypatch.setenv("OMP_AMG_CONST_SYNTH_MIN_MB", "0")  # force synthesis
    a_dev = amg.poisson3d_27pt(16)                  # jnp-backed data
    a_np = amg.poisson3d_27pt(16, backend="numpy")  # np-backed data
    h1 = amg_setup(a_dev, grid=(16,) * 3)
    h2 = amg_setup(a_np, grid=(16,) * 3)
    assert len(h1.levels) == len(h2.levels)
    np.testing.assert_array_equal(np.asarray(h1.coarse_a),
                                  np.asarray(h2.coarse_a))
    for l1, l2 in zip(h1.levels, h2.levels):
        assert type(l1.a) is type(l2.a)
        np.testing.assert_array_equal(np.asarray(l1.dinv),
                                      np.asarray(l2.dinv))


def test_structured_setup_warning_free_f64_planes():
    """VERDICT r1 #8: the structured setup's host planes stay numpy f64
    end-to-end — no silent f64→f32 truncation through jnp.asarray under
    default JAX config (x64 off)."""
    import warnings

    a = amg.poisson3d_7pt(12)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)  # any truncation → fail
        hier, host_ops = amg_setup(a, grid=(12, 12, 12), keep_host=True)
    # host scipy operators carry full f64 precision
    for op in host_ops:
        assert op.dtype == np.float64, op.dtype
    # device-facing arrays are f32 (the solve dtype)
    assert hier.levels[0].dinv.dtype == jnp.float32
