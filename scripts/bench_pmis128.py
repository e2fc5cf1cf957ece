"""PMIS-at-scale records: 7-pt 128³ and 27-pt 128³ through the classical
pipeline with the round-3 native setup (planner, PMIS, plane pack).

One TPU process:  OMP_AMG_SETUP_TIMERS=1 python scripts/bench_pmis128.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OMP_AMG_SETUP_TIMERS", "1")

import jax
import jax.numpy as jnp
import numpy as np

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup, hierarchy_stats
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.amg.vcycle import vcycle
from omp_amg_tpu.solvers.cg import amg_pcg
from omp_amg_tpu.solvers.ir import solve_ir
from omp_amg_tpu.sparse.routed import RoutedEll
from omp_amg_tpu.utils.timers import timeit, timeit_fused


def run(name, a, prm, grid):
    b = amg.default_rhs(a, "random", seed=0)
    t0 = time.time()
    hier = amg_setup(a, prm)
    su = time.time() - t0
    print(f"{name}: setup {su:.1f}s", flush=True)
    print(hierarchy_stats(hier), flush=True)
    vs = timeit(jax.jit(vcycle), hier, b, warmup=2, iters=10)
    r = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    float(jnp.sum(r.x[:1]))
    t0 = time.time()
    r = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    float(jnp.sum(r.x[:1]))
    sol = time.time() - t0
    print(f"{name}: vcycle {vs*1e3:.2f} ms, warm solve {sol:.3f}s, "
          f"iters {int(r.iters)}", flush=True)
    # certified 1e-8
    a_sp = amg.dia_to_scipy(a)
    t0 = time.time()
    res = solve_ir(a_sp, np.asarray(b, np.float64), a, hier, tol=1e-8,
                   maxiter=300)
    print(f"{name}: certified solve {time.time()-t0:.2f}s, "
          f"iters {sum(res.inner_iters)} (+{res.outer_iters} outer), "
          f"f64 rel {res.rel_residual:.2e}", flush=True)
    # per-level routed SpMV rates
    from omp_amg_tpu.ops.pallas_routed import spmv_routed

    for li, lv in enumerate(hier.levels):
        if isinstance(lv.a, RoutedEll):
            x1 = jnp.ones((lv.a.shape[1],), jnp.float32)
            s1 = timeit_fused(lambda A, xv: spmv_routed(A, xv), lv.a, x1,
                              iters=20)
            print(f"{name} A[{li}] routed: {s1*1e3:.3f} ms = "
                  f"{lv.a.nnz/s1/1e9:.2f} Gnnz/s "
                  f"[res={lv.a.resident}]", flush=True)


def main():
    print("backend:", jax.devices()[0], flush=True)
    run("7pt-128", amg.poisson3d_7pt(128),
        AMGParams(coarsening="pmis"), (128,) * 3)
    run("27pt-128", amg.poisson3d_27pt(128),
        AMGParams(coarsening="pmis", smoother="chebyshev"), (128,) * 3)


if __name__ == "__main__":
    main()
