"""Chip sweep: window-share run length (ws) for the routed-ELL kernel.

Round-4 occupancy attack (VERDICT r3 #1): the kernel is slot-compute-bound
and the 8 dynamic sublane slices per slot dominate. ws shares one window
stack across ws takes; this sweep measures the realized Gnnz/s per PMIS
operator and ws so auto_ws can be calibrated from data.

Run on the real chip:  python scripts/bench_ws_sweep.py [n]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.ops.pallas_routed import spmv_routed
from omp_amg_tpu.problems.poisson import poisson3d_7pt
from omp_amg_tpu.sparse.formats import ell_to_scipy
from omp_amg_tpu.sparse.routed import routed_from_scipy
from omp_amg_tpu.utils.timers import timeit_fused


def _chainable(fn):
    def step(a, xv):
        y = fn(a, xv)
        if y.shape[0] >= xv.shape[0]:
            return y[: xv.shape[0]]
        return jnp.concatenate([y, xv[y.shape[0]:]])
    return step


def bench(name, msp, ws_list, results):
    x = np.random.default_rng(0).standard_normal(msp.shape[1])
    ref = msp @ x
    scale = max(1.0, np.abs(ref).max())
    xd = jnp.asarray(x, jnp.float32)
    for ws in ws_list:
        t0 = time.time()
        rt = routed_from_scipy(msp, ws=ws)
        if rt is None:
            print(f"{name} ws={ws}: plan refused", flush=True)
            continue
        plan_t = time.time() - t0
        y = np.asarray(spmv_routed(rt, xd))
        err = np.abs(y - ref).max() / scale
        assert err < 5e-6, (name, ws, err)
        t = timeit_fused(_chainable(spmv_routed), rt, xd, iters=20)
        nc = rt.val4.shape[0]
        eff = rt.nnz / (nc * 16 * 1024)
        print(f"{name} ws={ws}: {t*1e3:7.3f} ms  {rt.nnz/t/1e9:6.2f} Gnnz/s"
              f"  NC={nc} eff={eff:.3f} res={rt.resident} plan={plan_t:.2f}s",
              flush=True)
        results.append(dict(name=name, ws=ws, t_s=t, nnz=rt.nnz,
                            gnnz=rt.nnz / t / 1e9, nc=nc, eff=eff))
        del rt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    print("backend:", jax.devices()[0], flush=True)
    a = poisson3d_7pt(n)
    t0 = time.time()
    hier, ops = amg_setup(a, AMGParams(coarsening="pmis", routed="off"),
                          keep_host=True, flavor="host")
    print(f"setup: {time.time()-t0:.1f}s", flush=True)
    # warm the relay before timing anything
    jnp.ones((8, 128)).sum().block_until_ready()

    results = []
    bench("A[1]", ops[1], (1, 2, 4, 8), results)
    if len(ops) > 2:
        bench("A[2]", ops[2], (1, 2, 4), results)
    lv = hier.levels[0]
    p_sp = ell_to_scipy(lv.p).tocsr()
    bench("P[0]", p_sp, (1, 2), results)
    bench("R[0]", p_sp.T.tocsr(), (1, 2, 4), results)

    with open("/tmp/bench_ws_sweep.json", "w") as f:
        json.dump(dict(n=n, results=results), f, indent=1)


if __name__ == "__main__":
    main()
