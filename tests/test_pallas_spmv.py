"""Pallas DIA kernel correctness (interpret mode on the CPU backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

import omp_amg_tpu as amg
from omp_amg_tpu.ops.pallas_spmv import spmv_dia_pallas


@pytest.mark.parametrize("gen,args", [
    # n divisible by 128*bm(8): 2D 32x32=1024, 3D 16^3=4096? 4096/1024=4 ok
    (amg.poisson2d_5pt, (32, 32)),
    (amg.poisson3d_7pt, (16, 16, 16)),
    (amg.poisson3d_27pt, (16, 8, 8)),
    (amg.aniso2d_9pt, (64, 16)),
])
def test_pallas_dia_matches_scipy(gen, args):
    a = gen(*args)
    n = a.n_rows
    assert n % 1024 == 0, "test operator must tile"
    x = np.random.default_rng(0).standard_normal(n)
    xj = jnp.asarray(x, jnp.float32)
    y = spmv_dia_pallas(a, xj, interpret=True)
    ref = amg.dia_to_scipy(a) @ x
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=1e-4)


def test_pallas_dia_fallback_unaligned():
    a = amg.poisson2d_5pt(10)  # n=100, not divisible by 1024 → XLA fallback
    x = jnp.ones((100,), jnp.float32)
    y = spmv_dia_pallas(a, x, interpret=True)
    ref = amg.dia_to_scipy(a) @ np.ones(100)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-6)


def test_pallas_dia_large_offsets():
    # 3D with nx=128: offsets ±1, ±128 (full lane wrap), ±16384 (128 sublanes)
    a = amg.poisson3d_7pt(128, 8, 8)
    n = a.n_rows
    x = np.random.default_rng(1).standard_normal(n)
    y = spmv_dia_pallas(a, jnp.asarray(x, jnp.float32), interpret=True)
    ref = amg.dia_to_scipy(a) @ x
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=1e-4)


def test_plane_kernel_matches_scipy_interpret():
    """Rolling-plane kernel correctness (interpret mode)."""
    from omp_amg_tpu.ops.pallas_spmv import spmv_dia_planes

    for gen, args in [(amg.poisson3d_7pt, (64, 32, 8)),
                      (amg.poisson3d_27pt, (32, 64, 9))]:
        a = gen(*args)
        assert a.dims is not None
        n = a.n_rows
        x = np.random.default_rng(0).standard_normal(n)
        y = spmv_dia_planes(a, jnp.asarray(x, jnp.float32), interpret=True)
        assert y is not None, "plane kernel should engage"
        ref = amg.dia_to_scipy(a) @ x
        np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=1e-4)


def test_plane_kernel_fallback_conditions():
    from omp_amg_tpu.ops.pallas_spmv import spmv_dia_planes

    a2d = amg.poisson2d_5pt(32)  # 2D → no plane kernel
    assert spmv_dia_planes(a2d, jnp.ones(a2d.n_rows), interpret=True) is None
    a_small = amg.poisson3d_7pt(4)  # nz < 8 → fallback
    assert spmv_dia_planes(a_small, jnp.ones(64, jnp.float32),
                           interpret=True) is None


def test_bf16_plane_dia_option():
    """bf16 operator storage: structure preserved, values to bf16 precision,
    and the f64 IR loop still certifies 1e-8 on a solve."""
    from omp_amg_tpu.sparse.formats import to_plane_dia, plane_to_dia

    a = amg.poisson3d_7pt(64, 32, 8)
    apm = to_plane_dia(a, dtype=jnp.bfloat16)
    assert apm is not None and apm.data4.dtype == jnp.bfloat16
    x = np.random.default_rng(0).standard_normal(a.n_rows)
    y = amg.spmv(apm, jnp.asarray(x, jnp.float32))  # CPU fallback path
    ref = amg.dia_to_scipy(a) @ x
    rel = np.abs(np.asarray(y, np.float64) - ref).max() / np.abs(ref).max()
    assert rel < 2e-2  # bf16 operator precision


def test_plane_fused_epilogues_interpret():
    """Fused PlaneDia residual/Jacobi == unfused math (interpret mode) —
    the PMIS fine level's last unfused V-cycle stages (round 3)."""
    import numpy as np

    import jax.numpy as jnp

    import omp_amg_tpu as amg
    from omp_amg_tpu.ops.pallas_spmv import (
        jacobi_plane_dia, residual_plane_dia, spmv_plane_dia,
    )
    from omp_amg_tpu.sparse.formats import dia_to_scipy, to_plane_dia

    a = amg.poisson3d_7pt(48)   # plane (48*48) must clear the pr >= 16 gate
    pm = to_plane_dia(a, dtype=None)
    assert pm is not None
    rng = np.random.default_rng(0)
    n = a.n_rows
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
    y = spmv_plane_dia(pm, x, interpret=True)
    ref = dia_to_scipy(a) @ np.asarray(x, np.float64)
    assert np.abs(np.asarray(y, np.float64) - ref).max() < 1e-4
    r = residual_plane_dia(pm, x, b, interpret=True)
    np.testing.assert_allclose(np.asarray(r), np.asarray(b - y),
                               rtol=0, atol=1e-5)
    xj = jacobi_plane_dia(pm, x, b, s, interpret=True)
    np.testing.assert_allclose(np.asarray(xj),
                               np.asarray(x + s * (b - y)),
                               rtol=0, atol=1e-5)
