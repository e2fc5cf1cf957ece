"""On-chip validation of round-3 paths that CPU tests can't reach:

1. the STREAMED routed kernel (x too big for VMEM → per-block span DMA +
   in-kernel chunk loop) — forced by dropping the resident cap;
2. routed window plans inside shard_map on a 1-device mesh (the dist
   PMIS fast path runs the Pallas kernel under shard_map);
3. PlaneDia fused residual/jacobi epilogues vs unfused math on chip.

Run: python scripts/chip_validate_r3.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

import omp_amg_tpu as amg


def main():
    print("backend:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    # ---- 1. streamed routed kernel on chip ----
    import omp_amg_tpu.sparse.routed as routed_mod
    from omp_amg_tpu.ops.pallas_routed import (
        jacobi_routed, residual_routed, spmv_routed,
    )
    from omp_amg_tpu.sparse.routed import routed_from_scipy

    a = amg.poisson3d_7pt(48)
    m = sp.csr_matrix(amg.dia_to_scipy(a))
    old = routed_mod.RESIDENT_CAP_BYTES
    routed_mod.RESIDENT_CAP_BYTES = 0
    try:
        rt = routed_from_scipy(m)
    finally:
        routed_mod.RESIDENT_CAP_BYTES = old
    assert rt is not None and not rt.resident
    x = jnp.asarray(rng.standard_normal(m.shape[1]).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(m.shape[0]).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.1, 1.0, m.shape[0]).astype(np.float32))
    y = np.asarray(spmv_routed(rt, x))
    ref = m @ np.asarray(x, np.float64)
    err = np.abs(y - ref).max() / max(1.0, np.abs(ref).max())
    print(f"streamed routed spmv rel err: {err:.2e}", flush=True)
    assert err < 5e-6
    r = np.asarray(residual_routed(rt, x, b))
    err_r = np.abs(r - (np.asarray(b) - ref)).max() / max(1.0,
                                                          np.abs(ref).max())
    xj = np.asarray(jacobi_routed(rt, x, b, s))
    ref_j = np.asarray(x) + np.asarray(s) * (np.asarray(b) - ref)
    err_j = np.abs(xj - ref_j).max() / max(1.0, np.abs(ref_j).max())
    print(f"streamed fused residual/jacobi rel err: {err_r:.2e} {err_j:.2e}",
          flush=True)
    assert err_r < 5e-6 and err_j < 5e-6

    # resident variant on the same operator (cross-check both kernels)
    rt2 = routed_from_scipy(m)
    assert rt2.resident
    y2 = np.asarray(spmv_routed(rt2, x))
    print(f"resident-vs-streamed max diff: {np.abs(y2 - y).max():.2e}",
          flush=True)

    # ---- 2. routed plans under shard_map (1-device mesh on chip) ----
    from omp_amg_tpu.amg.hierarchy import amg_setup
    from omp_amg_tpu.amg.params import AMGParams
    from omp_amg_tpu.parallel.dist import make_dist_solver
    from omp_amg_tpu.parallel.partition import (
        pad_vector, partition_hierarchy, place_hierarchy, unpad_vector,
    )

    a2 = amg.poisson3d_7pt(32)
    b2 = amg.default_rhs(a2, "random", seed=1)
    hier = amg_setup(a2, AMGParams(coarsening="pmis", routed="off"))
    mesh = jax.make_mesh((1,), ("rows",))
    dh = place_hierarchy(
        partition_hierarchy(hier, 1, agg_rows_per_dev=2048, routed=True),
        mesh)
    n_rt = sum(getattr(lv.a, "rt_val4", None) is not None
               for lv in dh.levels if hasattr(lv.a, "mode"))
    print(f"dist levels with routed window plans: {n_rt}", flush=True)
    solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=100)
    xp, iters, rel = solve(dh, pad_vector(b2, dh, 1))
    xs = np.asarray(unpad_vector(xp, a2.n_rows), np.float64)
    a_sp = amg.dia_to_scipy(a2)
    true_rel = np.linalg.norm(np.asarray(b2, np.float64) - a_sp @ xs) \
        / np.linalg.norm(np.asarray(b2))
    print(f"shard_map routed solve: iters={int(iters)} "
          f"true_rel={true_rel:.2e}", flush=True)
    assert true_rel < 1e-5
    assert n_rt > 0, "no routed window plans engaged under shard_map"

    # ---- 3. PlaneDia fused epilogues on chip ----
    from omp_amg_tpu.ops.pallas_spmv import (
        jacobi_plane_dia, residual_plane_dia, spmv_plane_dia,
    )
    from omp_amg_tpu.sparse.formats import to_plane_dia

    a3 = amg.poisson3d_7pt(64)
    pm = to_plane_dia(a3, dtype=None)
    assert pm is not None
    n3 = a3.n_rows
    x3 = jnp.asarray(rng.standard_normal(n3).astype(np.float32))
    b3 = jnp.asarray(rng.standard_normal(n3).astype(np.float32))
    s3 = jnp.asarray(rng.uniform(0.1, 1.0, n3).astype(np.float32))
    y3 = spmv_plane_dia(pm, x3)
    r3 = np.asarray(residual_plane_dia(pm, x3, b3))
    j3 = np.asarray(jacobi_plane_dia(pm, x3, b3, s3))
    err_rp = np.abs(r3 - np.asarray(b3 - y3)).max()
    err_jp = np.abs(j3 - np.asarray(x3 + s3 * (b3 - y3))).max()
    print(f"plane fused epilogues max abs err: {err_rp:.2e} {err_jp:.2e}",
          flush=True)
    assert err_rp < 1e-5 and err_jp < 1e-5
    print("ALL CHIP VALIDATIONS PASSED", flush=True)


if __name__ == "__main__":
    main()
