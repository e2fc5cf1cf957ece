"""Profile routed-ELL plan building at bench scale (CPU-only).

The round-2 bench showed "operator form" ≈ 26 s at PMIS 7-pt 96³ —
dominated by plan_routed's numpy passes. This script isolates the planner
cost per hierarchy operator and the hot numpy lines (VERDICT r2 #2).

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          python scripts/profile_planner.py [n]
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.problems.poisson import poisson3d_7pt
from omp_amg_tpu.sparse.routed import plan_lidx_packed, plan_routed


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    t0 = time.time()
    a = poisson3d_7pt(n)
    hier, ops = amg_setup(a, AMGParams(coarsening="pmis", routed="off"),
                          keep_host=True, flavor="host")
    print(f"setup (routed off): {time.time()-t0:.1f}s", flush=True)

    import scipy.sparse as sp

    from omp_amg_tpu.sparse.routed import routed_to_scipy  # noqa

    mats = []
    for li, lv in enumerate(hier.levels):
        mats.append((f"A[{li}]", ops[li]))
    # P/R come from the host levels if kept; rebuild quickly from hierarchy
    total = 0.0
    for name, m in mats:
        m = sp.csr_matrix(m)
        t0 = time.time()
        plan = plan_routed(m)
        dt = time.time() - t0
        t1 = time.time()
        packed = plan_lidx_packed(plan) if plan else None
        dtp = time.time() - t1
        total += dt + dtp
        if plan:
            print(f"{name}: n={m.shape[0]} nnz={m.nnz/1e6:.2f}M "
                  f"plan {dt:.2f}s pack {dtp:.2f}s "
                  f"NC={plan['val4'].shape[0]} kmax={plan['kmax']} "
                  f"eff={plan['eff']:.3f} "
                  f"bytes={plan['val4'].nbytes/1e6:.0f}+"
                  f"{packed.nbytes/1e6:.0f}MB", flush=True)
    print(f"total planner time: {total:.2f}s", flush=True)

    # hot lines of the biggest operator
    name, m = max(mats, key=lambda t: sp.csr_matrix(t[1]).nnz)
    m = sp.csr_matrix(m)
    pr = cProfile.Profile()
    pr.enable()
    plan_routed(m)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(15)
    print(s.getvalue())


if __name__ == "__main__":
    main()
