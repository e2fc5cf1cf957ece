"""ConstDia: matrix-free masked-constant stencil operators.

Detection (exact value check), XLA fallback and Pallas kernel correctness,
bitwise equivalence with the DIA path, hierarchy/io/partition integration.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import omp_amg_tpu as amg
from omp_amg_tpu.ops.spmv import nnz_count, spmv, spmv_const_xla, spmv_dia
from omp_amg_tpu.sparse.formats import (
    ConstDia, const_to_dia, diagonal, to_const_dia,
)


@pytest.mark.parametrize("gen,args", [
    (amg.poisson3d_7pt, (128, 16, 8)),     # (nx, ny, nz) → dims (8, 16, 128)
    (amg.poisson3d_27pt, (64, 16, 8)),
    (amg.poisson3d_7pt, (32, 8, 16)),      # plane 256, non-pow2 pr
])
def test_detect_and_xla_matches_scipy(gen, args):
    a = gen(*args)
    cd = to_const_dia(a)
    assert isinstance(cd, ConstDia)
    n = a.n_rows
    x = np.random.default_rng(0).standard_normal(n)
    xj = jnp.asarray(x, jnp.float32)
    y = spmv_const_xla(cd, xj)
    ref = amg.dia_to_scipy(a) @ x
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=1e-4)
    # products and accumulation order match the DIA path exactly
    np.testing.assert_array_equal(np.asarray(y), np.asarray(spmv_dia(a, xj)))
    # structural metadata
    assert nnz_count(cd) == amg.dia_to_scipy(a).nnz
    np.testing.assert_array_equal(np.asarray(diagonal(cd)),
                                  np.asarray(diagonal(a)))
    # materialized round-trip
    np.testing.assert_array_equal(np.asarray(const_to_dia(cd).data),
                                  np.asarray(a.data))


def test_detect_numpy_backend():
    a = amg.poisson3d_7pt(128, 16, 8, backend="numpy")
    cd = to_const_dia(a)
    assert isinstance(cd, ConstDia)
    assert cd.coeffs[cd.offsets.index(0)] == 6.0


def test_detect_rejects_non_constant():
    a = amg.poisson3d_7pt(128, 16, 8, backend="numpy")
    data = np.array(a.data)
    data[a.offsets.index(0), 5] *= 1.0000002  # perturb one valid value
    assert to_const_dia(amg.Dia(data=data, offsets=a.offsets,
                                dims=a.dims)) is None


def test_detect_rejects_galerkin_coarse_level():
    """Coarse Galerkin operators have boundary-MODIFIED (not just masked)
    values and must stay DIA; the finest level becomes ConstDia."""
    a = amg.poisson3d_7pt(32)
    hier = amg_setup_structured(a, 32)
    assert isinstance(hier.levels[0].a, ConstDia)
    for lv in hier.levels[1:]:
        assert not isinstance(lv.a, ConstDia)


def amg_setup_structured(a, n, **kw):
    return amg.amg_setup(a, grid=(n, n, n), **kw)


def test_pallas_const_kernel_interpret():
    from omp_amg_tpu.ops.pallas_const import spmv_const

    for gen, args in [(amg.poisson3d_7pt, (128, 16, 8)),
                      (amg.poisson3d_27pt, (128, 16, 8)),
                      (amg.poisson3d_7pt, (256, 16, 12))]:
        a = gen(*args)
        cd = to_const_dia(a)
        assert cd is not None
        n = a.n_rows
        x = np.random.default_rng(1).standard_normal(n)
        y = spmv_const(cd, jnp.asarray(x, jnp.float32), interpret=True)
        ref = amg.dia_to_scipy(a) @ x
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=1e-4)


def test_pallas_const_small_falls_back():
    from omp_amg_tpu.ops.pallas_const import spmv_const

    a = amg.poisson3d_7pt(32, 8, 4)  # nz=4 < 8 → XLA fallback inside
    cd = to_const_dia(a)
    assert cd is not None
    x = np.random.default_rng(2).standard_normal(a.n_rows)
    y = spmv_const(cd, jnp.asarray(x, jnp.float32), interpret=True)
    np.testing.assert_allclose(np.asarray(y), amg.dia_to_scipy(a) @ x,
                               rtol=2e-5, atol=1e-4)


def test_vcycle_bitwise_equal_const_vs_dia():
    a = amg.poisson3d_7pt(32)
    b = amg.default_rhs(a, "random", seed=0)
    h_on = amg_setup_structured(a, 32)
    h_off = amg.amg_setup(a, amg.AMGParams(const_stencil="off"),
                          grid=(32, 32, 32))
    assert isinstance(h_on.levels[0].a, ConstDia)
    assert not isinstance(h_off.levels[0].a, ConstDia)
    y_on = amg.vcycle(h_on, b)
    y_off = amg.vcycle(h_off, b)
    np.testing.assert_array_equal(np.asarray(y_on), np.asarray(y_off))


def test_hierarchy_io_roundtrip_const(tmp_path):
    from omp_amg_tpu.utils.io import load_hierarchy, save_hierarchy

    a = amg.poisson3d_7pt(32)
    b = amg.default_rhs(a, "random", seed=0)
    hier = amg_setup_structured(a, 32)
    assert isinstance(hier.levels[0].a, ConstDia)
    path = str(tmp_path / "h.npz")
    save_hierarchy(path, hier)
    h2 = load_hierarchy(path)
    assert isinstance(h2.levels[0].a, ConstDia)
    np.testing.assert_array_equal(np.asarray(amg.vcycle(hier, b)),
                                  np.asarray(amg.vcycle(h2, b)))


def test_partition_hierarchy_with_const_levels():
    from omp_amg_tpu.parallel.partition import partition_hierarchy

    a = amg.poisson3d_7pt(32)
    hier = amg_setup_structured(a, 32)
    assert isinstance(hier.levels[0].a, ConstDia)
    dh = partition_hierarchy(hier, 2, agg_rows_per_dev=256)
    assert dh is not None


@pytest.mark.parametrize("smoother", ["jacobi", "chebyshev"])
def test_presmoother_zero_guess_bitwise(smoother):
    """_smooth_zero (first-SpMV-skipping) == _smooth from explicit zeros."""
    from omp_amg_tpu.amg.vcycle import _smooth, _smooth_zero

    params = amg.AMGParams(smoother=smoother)
    a = amg.poisson3d_7pt(16)
    hier = amg.amg_setup(a, params, grid=(16, 16, 16))
    lv = hier.levels[0]
    b = amg.default_rhs(a, "random", seed=3)
    for sweeps in (1, 2):
        x0 = _smooth(lv, params, jnp.zeros_like(b), b, sweeps)
        x1 = _smooth_zero(lv, params, b, sweeps)
        np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))


@pytest.mark.parametrize("nb", [2, 4, 8])
def test_pallas_const_block_sizes(nb):
    from omp_amg_tpu.ops.pallas_const import spmv_const

    a = amg.poisson3d_27pt(128, 16, 32)  # dims (32, 16, 128), pr=16
    cd = to_const_dia(a)
    x = np.random.default_rng(4).standard_normal(a.n_rows)
    y = spmv_const(cd, jnp.asarray(x, jnp.float32), interpret=True, nb=nb)
    ref = amg.dia_to_scipy(a) @ x
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=1e-4)


def test_fused_residual_jacobi_interpret():
    """Fused Pallas epilogues == unfused compositions (bitwise)."""
    from omp_amg_tpu.ops.pallas_const import (
        jacobi_const, residual_const, spmv_const,
    )

    a = amg.poisson3d_7pt(128, 16, 8)
    cd = to_const_dia(a)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(a.n_rows), jnp.float32)
    b = jnp.asarray(rng.standard_normal(a.n_rows), jnp.float32)
    y = spmv_const(cd, x, interpret=True)
    r = residual_const(cd, x, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(r), np.asarray(b - y))
    s = jnp.float32(0.123)
    xj = jacobi_const(cd, x, b, s, interpret=True)
    # the final update may contract into an FMA inside the kernel (≤1 ulp)
    np.testing.assert_allclose(np.asarray(xj), np.asarray(x + s * (b - y)),
                               rtol=3e-7, atol=3e-7)


def test_fused_v11_prologue_epilogue_interpret():
    """zjr / cja fused V(1,1) stages == their unfused compositions."""
    from omp_amg_tpu.ops.pallas_const import (
        correct_jacobi_const, presmooth_residual_const, spmv_const,
    )

    a = amg.poisson3d_7pt(128, 16, 8)
    cd = to_const_dia(a)
    rng = np.random.default_rng(11)
    b = jnp.asarray(rng.standard_normal(a.n_rows), jnp.float32)
    p = jnp.asarray(rng.standard_normal(a.n_rows), jnp.float32)
    s = jnp.float32(0.137)

    r = presmooth_residual_const(cd, b, s, interpret=True)
    ref_r = b - s * spmv_const(cd, b, interpret=True)
    np.testing.assert_allclose(np.asarray(r), np.asarray(ref_r),
                               rtol=3e-7, atol=3e-7)

    x = correct_jacobi_const(cd, b, p, s, interpret=True)
    u = s * b + p
    ref_x = u + s * (b - spmv_const(cd, u, interpret=True))
    # u is recomputed per tap inside the kernel (s·b_view + p_view) —
    # same products, FMA contraction allowed: tight elementwise tolerance
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref_x),
                               rtol=3e-6, atol=3e-6)


def test_fused_vcycle_matches_unfused_cpu_reference():
    """jit(vcycle) on a ConstDia hierarchy: the fused V(1,1) path (forced
    via the interpret-mode kernels is TPU-only, so here we check the
    *fallback* algebra used by the fused entry points) equals the standard
    path to f32 tolerance."""
    import omp_amg_tpu as amg2
    from omp_amg_tpu.amg.hierarchy import amg_setup
    from omp_amg_tpu.amg.vcycle import vcycle
    from omp_amg_tpu.ops.pallas_const import (
        correct_jacobi_const, presmooth_residual_const,
    )
    from omp_amg_tpu.ops.spmv import spmv

    a = amg2.poisson3d_7pt(32)
    hier = amg_setup(a, grid=(32,) * 3)
    b = amg2.default_rhs(a, "random", seed=0)
    lv = hier.levels[0]
    params = hier.params
    omega = 4.0 / (3.0 * 1.1 * lv.lmax)
    s = omega * lv.dinv[0]
    # one fused-algebra level step vs the standard step (CPU fallbacks)
    r_f = presmooth_residual_const(lv.a, b, s)
    x1 = omega * lv.dinv * b
    r_s = b - spmv(lv.a, x1)
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_s),
                               rtol=3e-6, atol=3e-6)
    pc = jnp.asarray(np.random.default_rng(1).standard_normal(a.n_rows),
                     jnp.float32)
    x_f = correct_jacobi_const(lv.a, b, pc, s)
    u = x1 + pc
    x_s = u + omega * lv.dinv * (b - spmv(lv.a, u))
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_s),
                               rtol=3e-6, atol=1e-5)
