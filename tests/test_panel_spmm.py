"""Panel-SpMM planner + kernel correctness (scipy oracle; interpret mode).

SURVEY.md §4 test strategy: per-component scipy oracles. The Pallas kernel
runs in interpret mode on CPU; the XLA formulation is the portable path.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from omp_amg_tpu.sparse.panels import (
    panel_plan_from_scipy, panel_plan_to_scipy, pack_panels, unpack_panels,
)
from omp_amg_tpu.ops.pallas_spmm import (
    spmm_panel, spmm_panel_xla, split_bf16,
)


def _rand_sparse(rng, n, m, row_nnz, banded=2000):
    rows = np.repeat(np.arange(n), row_nnz)
    cols = np.clip(rows * m // n + rng.integers(-banded, banded,
                                                len(rows)), 0, m - 1)
    vals = rng.standard_normal(len(rows))
    a = sp.csr_matrix((vals, (rows, cols)), shape=(n, m))
    a.sum_duplicates()
    return a


def test_plan_roundtrip():
    rng = np.random.default_rng(0)
    a = _rand_sparse(rng, 700, 513, 5, banded=60)
    plan = panel_plan_from_scipy(a)
    assert plan is not None
    back = panel_plan_to_scipy(plan)
    # plan values are stored f32
    d = abs(a.astype(np.float32).astype(np.float64) - back)
    assert (d.max() if d.nnz else 0.0) < 1e-12
    assert plan.nnz == a.nnz


@pytest.mark.parametrize("n,m,k", [(700, 513, 5), (256, 2048, 3),
                                   (130, 130, 2)])
def test_xla_formulation_matches_scipy(n, m, k):
    rng = np.random.default_rng(1)
    a = _rand_sparse(rng, n, m, k, banded=300)
    plan = panel_plan_from_scipy(a)
    C = 64
    x = rng.standard_normal((m, C)).astype(np.float32)
    u = np.asarray(spmm_panel_xla(plan, jnp.asarray(x)))
    ref = a @ x.astype(np.float64)
    np.testing.assert_allclose(u, ref, rtol=0, atol=3e-5 * abs(ref).max())


@pytest.mark.parametrize("precision", ["f32", "bf16x2"])
def test_pallas_kernel_interpret(precision):
    rng = np.random.default_rng(2)
    n, m, C = 640, 520, 128
    a = _rand_sparse(rng, n, m, 4, banded=80)
    plan = panel_plan_from_scipy(a)
    x = rng.standard_normal((m, C)).astype(np.float32)
    xt = pack_panels(jnp.asarray(x), plan.nxp)
    if precision == "f32":
        ut = spmm_panel(plan, xt, C, precision="f32", interpret=True)
    else:
        ut = spmm_panel(plan, split_bf16(xt), C, precision="bf16x2",
                        interpret=True)
    u = np.asarray(unpack_panels(ut, n, C))
    ref = np.asarray(a @ x.astype(np.float64))
    tol = 5e-6 if precision == "f32" else 4e-4
    np.testing.assert_allclose(u, ref, rtol=0, atol=tol * abs(ref).max())


@pytest.mark.parametrize("n,m,k,C", [(900, 700, 5, 64),
                                     (300, 4096, 40, 32)])
def test_v2_kernel_interpret(n, m, k, C):
    """v2: multi-group shared windows + kact early exit (scipy oracle)."""
    from omp_amg_tpu.ops.pallas_spmm import build_plan_v2, spmm_panel_v2

    rng = np.random.default_rng(7)
    a = _rand_sparse(rng, n, m, k, banded=max(60, m // 4))
    plan = build_plan_v2(a, C)
    assert plan is not None
    x = rng.standard_normal((m, C)).astype(np.float32)
    xt = pack_panels(jnp.asarray(x), plan.nxp)
    ut = spmm_panel_v2(plan, split_bf16(xt, 3), precision="bf16x3",
                       interpret=True)
    nb = -(-n // 128)
    u = np.asarray(unpack_panels(ut[: nb * C], n, C))
    ref = np.asarray(a @ x.astype(np.float64))
    np.testing.assert_allclose(u, ref, rtol=0, atol=3e-6 * abs(ref).max())


def test_pallas_kernel_kchunked_interpret():
    """K > K_BLK exercises the K-chunk grid dimension."""
    rng = np.random.default_rng(3)
    n, m, C = 256, 4096, 64
    a = _rand_sparse(rng, n, m, 40, banded=2048)
    plan = panel_plan_from_scipy(a)
    assert plan.val.shape[1] > 32  # K-chunked
    x = rng.standard_normal((m, C)).astype(np.float32)
    xt = pack_panels(jnp.asarray(x), plan.nxp)
    ut = spmm_panel(plan, split_bf16(xt), C, precision="bf16x2",
                    interpret=True)
    u = np.asarray(unpack_panels(ut, n, C))
    ref = np.asarray(a @ x.astype(np.float64))
    np.testing.assert_allclose(u, ref, rtol=0, atol=4e-4 * abs(ref).max())


def test_roll_kernel_matches_v1(monkeypatch):
    """Rolling-window panel SpMM == the per-block-window kernel (interpret
    mode), including a non-monotone-base operator (the ring sizes itself
    from the issue high-water accounting)."""
    import numpy as np
    import scipy.sparse as sp

    import jax.numpy as jnp

    from omp_amg_tpu.ops.pallas_spmm import (
        ROLL_DC, roll_ring_chunks, spmm_panel, spmm_panel_roll, split_bf16,
    )
    from omp_amg_tpu.sparse.panels import (
        pack_panels, panel_plan_from_dict, plan_panel_spmm, unpack_panels,
    )

    rng = np.random.default_rng(11)

    def make(n, nc, band, shuffle=False):
        rows = np.repeat(np.arange(n), 5)
        cols = np.clip(rows * nc // n + rng.integers(-band, band + 1,
                                                     len(rows)), 0, nc - 1)
        if shuffle:
            # a few rows far from their band → non-monotone block windows
            sel = rng.integers(0, len(rows), len(rows) // 50)
            cols[sel] = rng.integers(0, nc, len(sel))
        m = sp.csr_matrix((rng.standard_normal(len(rows)), (rows, cols)),
                          shape=(n, nc))
        m.sum_duplicates()
        return m

    for shuffle in (False, True):
        m = make(2048, 3000, 60, shuffle)
        d = plan_panel_spmm(m, dtype=np.float64)
        assert d is not None
        plan = panel_plan_from_dict(d, jnp.float32)
        C = 16
        x = rng.standard_normal((m.shape[1], C)).astype(np.float32)
        xt = pack_panels(jnp.asarray(x), plan.nxp)
        u1 = spmm_panel(plan, split_bf16(xt, 3), C, precision="bf16x3",
                        interpret=True)
        ref = unpack_panels(u1, m.shape[0], C)
        s_ring = roll_ring_chunks(d)
        nb = d["val"].shape[0]
        hi = jnp.asarray(np.maximum(d["block_hi"],
                                    d["sbase"][0, :nb] + 1).astype(np.int32))
        nxp_roll = -(-plan.nxp // ROLL_DC) * ROLL_DC
        xt_r = pack_panels(jnp.asarray(x), nxp_roll)
        ur = spmm_panel_roll(plan, hi, s_ring, split_bf16(xt_r, 3), C,
                             precision="bf16x3", interpret=True)
        got = unpack_panels(ur, m.shape[0], C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5,
                                   err_msg=f"shuffle={shuffle}")
        # sanity against scipy too
        dense_ref = m @ x
        scale = np.abs(dense_ref).max()
        assert np.abs(np.asarray(got) - dense_ref).max() < 3e-6 * scale
