"""Experiment: V-cycle wall vs hierarchy depth and coarse-solver kind.

The relay's ~0.5 ms serialized-stage latency floor makes the tiny coarse
levels of a hierarchy cost wall-clock while contributing nothing numerically
measurable. This measures, on chip, V-cycle time / PCG iters / warm-solve
time for the full hierarchy vs truncated variants (dense direct solve at a
few hundred to a few thousand rows) x coarse_solver in {chol, inv}.

Run on the real chip:
  python scripts/bench_trunc.py pmis 64
  python scripts/bench_trunc.py structured 128
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import Hierarchy, _coarse_factor, amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.amg.vcycle import vcycle
from omp_amg_tpu.solvers.cg import amg_pcg
from omp_amg_tpu.utils.timers import timeit_fused


def variant(hier, host_ops, k, solver):
    """Truncate to k levels (dense solve on host_ops[k]) + coarse solver."""
    params = dataclasses.replace(hier.params, coarse_solver=solver)
    dense = np.asarray(host_ops[k].toarray(), np.float64)
    fac = _coarse_factor(dense, params)
    dt = hier.coarse_chol.dtype
    return Hierarchy(levels=hier.levels[:k],
                     coarse_chol=jnp.asarray(fac, dtype=dt),
                     coarse_a=jnp.asarray(dense, dtype=dt), params=params)


def run_variant(name, h, a, b, a_sp):
    t_v = timeit_fused(vcycle, h, b, iters=10)
    t0 = time.time()
    res = amg_pcg(a, b, h, tol=1e-6, maxiter=100)
    float(res.rel_residual)
    t0 = time.time()
    res = amg_pcg(a, b, h, tol=1e-6, maxiter=100)
    float(res.rel_residual)
    t_solve = time.time() - t0
    x = np.asarray(res.x, np.float64)
    bb = np.asarray(b, np.float64)
    rel = np.linalg.norm(bb - a_sp @ x) / np.linalg.norm(bb)
    print(f"{name}: vcycle {t_v*1e3:7.2f} ms  solve {t_solve:6.3f}s  "
          f"iters {int(res.iters):3d}  true_rel {rel:.2e}", flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "pmis"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    print("backend:", jax.devices()[0], flush=True)
    a = amg.poisson3d_7pt(n)
    grid = (n,) * 3 if mode == "structured" else None
    params = AMGParams(coarsening=mode)
    t0 = time.time()
    hier, host_ops = amg_setup(a, params, keep_host=True, flavor="host",
                               grid=grid)
    print(f"setup: {time.time()-t0:.1f}s  "
          f"sizes={[op.shape[0] for op in host_ops]}", flush=True)
    b = amg.default_rhs(a, "random", seed=0)
    a_sp = host_ops[0]

    nl = len(hier.levels)
    run_variant(f"full({nl}lv,chol)", hier, a, b, a_sp)
    for k in range(nl - 1, 0, -1):
        nc = host_ops[k].shape[0]
        if nc > 10000:
            break
        for solver in ("chol", "inv"):
            h = variant(hier, host_ops, k, solver)
            run_variant(f"trunc@{nc}({k}lv,{solver})", h, a, b, a_sp)


if __name__ == "__main__":
    main()
