"""Chip record: value-only refresh @ 7-pt 96³ PMIS (VERDICT r3 #4).

Measures fresh cached setup, then cold + warm amg_refresh (the warm number
is the amortized figure — refresh exists for repeated re-setups), and
verifies the refreshed hierarchy solves to 1e-8.

One TPU process:  python scripts/bench_refresh.py [n]
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
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.amg.refresh import SetupCache, amg_refresh
from omp_amg_tpu.solvers.ir import solve_ir
from omp_amg_tpu.sparse.formats import Dia, dia_to_scipy


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    print("backend:", jax.devices()[0], flush=True)
    a = amg.poisson3d_7pt(n)
    prm = AMGParams(coarsening="pmis")
    cache = SetupCache()
    t0 = time.time()
    amg_setup(a, prm, cache=cache)
    print(f"fresh setup (cached): {time.time()-t0:.1f}s", flush=True)

    times = []
    for i, s in enumerate((1.5, 0.75, 1.25)):
        a2 = Dia(data=np.asarray(a.data) * s, offsets=a.offsets,
                 dims=a.dims)
        t0 = time.time()
        h = amg_refresh(a2, cache)
        jax.block_until_ready(h.levels[0].dinv)
        dt = time.time() - t0
        times.append(dt)
        print(f"refresh #{i} (x{s}): {dt:.2f}s", flush=True)

    # certified solve on the last refreshed hierarchy
    b = amg.default_rhs(a2, "random", seed=0)
    a_sp = dia_to_scipy(a2)
    res = solve_ir(a_sp, np.asarray(b, np.float64), a2, h, tol=1e-8,
                   maxiter=200)
    print(f"refreshed solve: iters {sum(res.inner_iters)} "
          f"(+{res.outer_iters} outer), f64 rel {res.rel_residual:.2e}",
          flush=True)
    assert res.rel_residual <= 1e-8

    with open("/tmp/bench_refresh.json", "w") as f:
        json.dump(dict(n=n, refresh_s=times,
                       cert_rel=res.rel_residual,
                       cert_iters=sum(res.inner_iters)), f)


if __name__ == "__main__":
    main()
