"""The 256³ headline problem through the CLASSICAL (PMIS) pipeline.

Round-4 record run (VERDICT r3 #2): NB_CAP now admits 16 k-block routed
plans, so the reference's pipeline runs the reference's headline size on
one chip: setup (phase-traced), V-cycle, warm PCG, f64-certified 1e-8.

The operator is built HOST-side (backend="numpy") — the PMIS setup is
host-orchestrated anyway, and a 940 MB device→host pull through the relay
both dominates the wall and trips transient relay errors. The solve-side
fine operator is the hierarchy's own device form (ConstDia for 7-pt); the
f64 certification residual runs on host via the native DIA apply.

One TPU process:  python scripts/bench_pmis256.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OMP_AMG_SETUP_TIMERS", "1")

import jax
import jax.numpy as jnp
import numpy as np

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import (
    amg_setup, hierarchy_stats, last_setup_trace,
)
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.amg.vcycle import vcycle
from omp_amg_tpu.solvers.cg import amg_pcg
from omp_amg_tpu.solvers.ir import solve_ir
from omp_amg_tpu.sparse.routed import RoutedEll
from omp_amg_tpu.utils.timers import timeit, timeit_fused


def main():
    n = int(os.environ.get("BENCH_PMIS256_N", "256"))
    print("backend:", jax.devices()[0], flush=True)
    a = amg.poisson3d_7pt(n, backend="numpy")
    prm = AMGParams(coarsening="pmis")
    b = amg.default_rhs(a, "random", seed=0)

    t0 = time.time()
    hier = amg_setup(a, prm)
    jax.block_until_ready(hier.levels[0].dinv)
    su = time.time() - t0
    print(f"pmis-{n}: setup {su:.1f}s", flush=True)
    print(hierarchy_stats(hier), flush=True)
    a0 = hier.levels[0].a   # device fine-operator form (ConstDia for 7-pt)

    vs = timeit(jax.jit(vcycle), hier, b, warmup=2, iters=10)
    print(f"pmis-{n}: V-cycle {vs*1e3:.2f} ms", flush=True)

    r = amg_pcg(a0, b, hier, tol=1e-6, maxiter=100)
    float(jnp.sum(r.x[:1]))
    t0 = time.time()
    r = amg_pcg(a0, b, hier, tol=1e-6, maxiter=100)
    float(jnp.sum(r.x[:1]))
    sol = time.time() - t0
    print(f"pmis-{n}: warm solve {sol:.3f}s, iters {int(r.iters)}, "
          f"rel {float(r.rel_residual):.2e}", flush=True)

    # certified 1e-8: host f64 residual via the native DIA apply (no big
    # device pulls; b/x cross at 67/134 MB per outer — measured tolerable)
    data64 = np.asarray(a.data, np.float64)
    t0 = time.time()
    res = solve_ir((list(a.offsets), data64), np.asarray(b, np.float64),
                   a0, hier, tol=1e-8, maxiter=300)
    t_cert = time.time() - t0
    print(f"pmis-{n}: certified solve {t_cert:.2f}s, "
          f"iters {sum(res.inner_iters)} (+{res.outer_iters} outer), "
          f"f64 rel {res.rel_residual:.2e}", flush=True)
    assert res.rel_residual <= 1e-8

    rates = {}
    from omp_amg_tpu.ops.pallas_routed import spmv_routed

    for li, lv in enumerate(hier.levels):
        if isinstance(lv.a, RoutedEll):
            x1 = jnp.ones((lv.a.shape[1],), jnp.float32)
            s1 = timeit_fused(lambda A, xv: spmv_routed(A, xv), lv.a,
                              x1, iters=20)
            rates[f"A[{li}]"] = lv.a.nnz / s1 / 1e9
            print(f"pmis-{n} A[{li}] routed: {s1*1e3:.3f} ms = "
                  f"{lv.a.nnz/s1/1e9:.2f} Gnnz/s [res={lv.a.resident}]",
                  flush=True)

    out = dict(n=n, setup_s=su, vcycle_ms=vs * 1e3, warm_solve_s=sol,
               warm_iters=int(r.iters), cert_s=t_cert,
               cert_iters=sum(res.inner_iters),
               cert_outers=res.outer_iters,
               cert_rel=res.rel_residual, routed_gnnz=rates,
               phases=last_setup_trace())
    with open("/tmp/bench_pmis256.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "phases"}),
          flush=True)


if __name__ == "__main__":
    main()
