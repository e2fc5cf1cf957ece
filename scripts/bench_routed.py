"""Benchmark: routed-ELL SpMV + PMIS-hierarchy V-cycle/solve on the chip.

Compares the routed Pallas kernel against the XLA ELL-gather path per level
operator, then times the full PMIS-path V-cycle and AMG-PCG solve.

Run on the real chip:  python scripts/bench_routed.py [n]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from omp_amg_tpu.amg.hierarchy import amg_setup, hierarchy_stats
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.amg.vcycle import vcycle
from omp_amg_tpu.ops.pallas_routed import spmv_routed
from omp_amg_tpu.ops.spmv import spmv_ell, nnz_count
from omp_amg_tpu.problems.poisson import poisson3d_7pt, default_rhs
from omp_amg_tpu.solvers.cg import amg_pcg
from omp_amg_tpu.sparse.routed import RoutedEll
from omp_amg_tpu.sparse.formats import ell_from_scipy
from omp_amg_tpu.utils.timers import timeit_fused


def _chainable(fn):
    """Wrap y=f(A,x) so the fused timing loop can feed y back as x even for
    non-square operators (truncate or pad with the old x's tail)."""
    def step(a, xv):
        y = fn(a, xv)
        if y.shape[0] >= xv.shape[0]:
            return y[: xv.shape[0]]
        return jnp.concatenate([y, xv[y.shape[0]:]])
    return step


def bench_level_spmv(name, rt, ell, n_cols):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n_cols),
                    jnp.float32)

    nnz = rt.nnz
    t_rt = timeit_fused(_chainable(spmv_routed), rt, x, iters=20)
    t_ell = timeit_fused(_chainable(spmv_ell), ell, x, iters=20)
    eff = nnz / (rt.val4.shape[0] * rt.val4.shape[1] * 1024)
    print(f"{name}: routed {t_rt*1e3:8.3f} ms ({nnz/t_rt/1e9:7.2f} Gnnz/s)  "
          f"xla-ell {t_ell*1e3:8.3f} ms ({nnz/t_ell/1e9:7.2f} Gnnz/s)  "
          f"speedup {t_ell/t_rt:6.1f}x  [kmax={rt.kmax} S={rt.span} "
          f"NC={rt.val4.shape[0]} eff={eff:.2f} res={rt.resident}]",
          flush=True)
    return dict(name=name, routed_s=t_rt, xla_s=t_ell, nnz=nnz,
                routed_gnnz=nnz / t_rt / 1e9)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print("backend:", jax.devices()[0], flush=True)
    a = poisson3d_7pt(n)
    params = AMGParams(coarsening="pmis")

    t0 = time.time()
    hier, ops = amg_setup(a, params, keep_host=True, flavor="host")
    print(f"setup (host flavor + routed planning): {time.time()-t0:.1f}s",
          flush=True)
    print(hierarchy_stats(hier, ops), flush=True)

    results = []
    for li, lv in enumerate(hier.levels):
        p_sp = None
        for tag, op in (("A", lv.a), ("P", lv.p), ("R", lv.r)):
            if not isinstance(op, RoutedEll):
                continue
            if tag == "A":
                msp = ops[li]
            else:
                if p_sp is None:
                    from omp_amg_tpu.sparse.routed import routed_to_scipy
                    p_sp = routed_to_scipy(lv.p if isinstance(lv.p, RoutedEll)
                                           else None)
                msp = p_sp if tag == "P" else p_sp.T.tocsr()
            ell = ell_from_scipy(msp)
            results.append(bench_level_spmv(f"{tag}[{li}]", op, ell,
                                            op.n_cols))

    b = default_rhs(a, "random")

    # Full V-cycle
    def vstep(h, r):
        return vcycle(h, r)

    t_v = timeit_fused(vstep, hier, b, iters=5)
    print(f"V-cycle: {t_v*1e3:.2f} ms", flush=True)

    # Full solve
    t0 = time.time()
    res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    res.x.block_until_ready()
    print(f"PCG compile+solve: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    res = amg_pcg(a, b, hier, tol=1e-6, maxiter=100)
    float(res.rel_residual)
    t_solve = time.time() - t0
    print(f"PCG warm solve: {t_solve:.3f}s  iters={int(res.iters)}  "
          f"rel={float(res.rel_residual):.2e}", flush=True)

    out = dict(n=n, vcycle_ms=t_v * 1e3, solve_s=t_solve,
               iters=int(res.iters), levels=results)
    with open("/tmp/bench_routed.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
