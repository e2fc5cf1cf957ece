"""PMIS 96³ on-chip profile: setup phases, per-level stage costs, V-cycle
variants (coarse-size truncation), probe-RAP engines.

One TPU process; run in the background (axon relay claims the chip).
    OMP_AMG_SETUP_TIMERS=1 python scripts/profile_pmis96.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OMP_AMG_SETUP_TIMERS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from omp_amg_tpu.amg.hierarchy import amg_setup, hierarchy_stats
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.amg.vcycle import vcycle
from omp_amg_tpu.problems.poisson import poisson3d_7pt, default_rhs
from omp_amg_tpu.solvers.cg import amg_pcg
from omp_amg_tpu.sparse.routed import RoutedEll
from omp_amg_tpu.utils.timers import timeit, timeit_fused


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    print("backend:", jax.devices()[0], flush=True)
    a = poisson3d_7pt(n)
    b = default_rhs(a, "random", seed=0)

    t0 = time.time()
    hier = amg_setup(a, AMGParams(coarsening="pmis"))
    print(f"setup (native planner + sparse val upload): {time.time()-t0:.1f}s",
          flush=True)
    print(hierarchy_stats(hier), flush=True)

    # ---- per-level stage costs (fused loops; chained where possible) ----
    from omp_amg_tpu.ops.pallas_routed import (
        correct_routed, jacobi_routed, residual_routed, spmv_routed,
    )
    from omp_amg_tpu.ops.spmv import spmv

    for li, lv in enumerate(hier.levels):
        nl = lv.a.shape[0]
        x = jnp.ones((nl,), jnp.float32)
        bb = jnp.ones((nl,), jnp.float32)
        s = lv.dinv
        if isinstance(lv.a, RoutedEll):
            t_res = timeit_fused(lambda A, xv: residual_routed(A, xv, bb),
                                 lv.a, x, iters=30)
            t_jac = timeit_fused(lambda A, xv: jacobi_routed(A, xv, bb, s),
                                 lv.a, x, iters=30)
            kind = "routed"
        else:
            t_res = timeit_fused(lambda A, xv: bb - spmv(A, xv), lv.a, x,
                                 iters=30)
            t_jac = timeit_fused(
                lambda A, xv: xv + s * (bb - spmv(A, xv)), lv.a, x, iters=30)
            kind = type(lv.a).__name__
        print(f"L{li} A ({kind}, n={nl}): residual {t_res*1e3:7.3f} ms  "
              f"jacobi {t_jac*1e3:7.3f} ms", flush=True)
        # transfers (not chainable shapes: time one-shot loops via fused
        # with same-input; overhead-dominated levels show the stage floor)
        nc = lv.p.shape[1] if hasattr(lv.p, "shape") else None
        if isinstance(lv.p, RoutedEll):
            xc = jnp.ones((lv.p.n_cols,), jnp.float32)
            t_p = timeit_fused(
                lambda P, c: correct_routed(P, c, x)[:1] * 0 + c,
                lv.p, xc, iters=30)
            print(f"L{li} P correct: {t_p*1e3:7.3f} ms", flush=True)
        if isinstance(lv.r, RoutedEll):
            t_r = timeit_fused(
                lambda R, xv: spmv_routed(R, xv)[:1] * 0 + xv,
                lv.r, x, iters=30)
            print(f"L{li} R spmv:    {t_r*1e3:7.3f} ms", flush=True)

    # ---- V-cycle variants ----
    vsec = timeit(jax.jit(vcycle), hier, b, warmup=2, iters=10)
    print(f"vcycle (default): {vsec*1e3:.2f} ms", flush=True)

    for cs, solver in ((3000, "inv"), (3000, "chol"), (500, "inv")):
        t0 = time.time()
        h2 = amg_setup(a, AMGParams(coarsening="pmis", coarse_size=cs,
                                    coarse_solver=solver))
        su = time.time() - t0
        v2 = timeit(jax.jit(vcycle), h2, b, warmup=2, iters=10)
        r2 = amg_pcg(a, b, h2, tol=1e-6, maxiter=100)
        float(jnp.sum(r2.x[:1]))
        t0 = time.time()
        r2 = amg_pcg(a, b, h2, tol=1e-6, maxiter=100)
        float(jnp.sum(r2.x[:1]))
        sol = time.time() - t0
        print(f"vcycle (coarse_size={cs},{solver}): {v2*1e3:.2f} ms  "
              f"setup {su:.1f}s  solve {sol:.3f}s iters={int(r2.iters)}",
              flush=True)

    # baseline solve for comparison
    r1 = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    float(jnp.sum(r1.x[:1]))
    t0 = time.time()
    r1 = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    float(jnp.sum(r1.x[:1]))
    print(f"solve (default): {time.time()-t0:.3f}s iters={int(r1.iters)}",
          flush=True)

    # ---- probe RAP engines at L0 ----
    if os.environ.get("SKIP_RAP") != "1":
        import dataclasses

        import scipy.sparse as sp

        from omp_amg_tpu.ops.probe_rap import (
            build_rap_probe, rap_probe_numeric,
        )
        from omp_amg_tpu.ops.rap import galerkin_product
        from omp_amg_tpu.sparse.formats import dia_to_scipy, ell_to_scipy
        from omp_amg_tpu.sparse.routed import routed_to_scipy

        h3, hops = amg_setup(a, AMGParams(coarsening="pmis", routed="off"),
                             keep_host=True, flavor="host")
        a0 = sp.csr_matrix(hops[0])
        p0 = ell_to_scipy(h3.levels[0].p)
        t0 = time.time()
        ac = galerkin_product(a0, p0)
        t_host = time.time() - t0
        print(f"host Gustavson RAP L0: {t_host*1e3:.0f} ms "
              f"({a0.nnz/t_host/1e9:.4f} Gnnz/s)", flush=True)
        probe, _ = build_rap_probe(a0, sp.csr_matrix(p0), ac_sp=ac)
        if probe is None:
            print("probe: caps exceeded", flush=True)
            return
        print(f"probe: colors={probe.n_colors} c_panel={probe.c_panel} "
              f"(v2 {'on' if probe.a_v2 is not None else 'off'})",
              flush=True)

        def rap_step(pr, y):
            pr2 = dataclasses.replace(pr, p_val=pr.p_val + y[0, 0] * 1e-30)
            return rap_probe_numeric(pr2, engine="pallas")

        y0 = jnp.zeros((probe.n_coarse, probe.kc), jnp.float32)
        s_v = timeit_fused(rap_step, probe, y0, iters=5)
        print(f"probe RAP ({'v2' if probe.a_v2 is not None else 'v1'}): "
              f"{s_v*1e3:.1f} ms ({a0.nnz/s_v/1e9:.4f} Gnnz/s) "
              f"[{t_host/s_v:.1f}x host]", flush=True)
        if probe.a_v2 is not None:
            pr_v1 = dataclasses.replace(probe, a_v2=None, r_v2=None)
            s_1 = timeit_fused(rap_step, pr_v1, y0, iters=5)
            print(f"probe RAP (v1): {s_1*1e3:.1f} ms "
                  f"({a0.nnz/s_1/1e9:.4f} Gnnz/s)", flush=True)


if __name__ == "__main__":
    main()
