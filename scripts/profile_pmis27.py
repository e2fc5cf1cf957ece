"""Phase profile of the 27-pt 128³ classical setup (VERDICT r3 #3).

One TPU process:  python scripts/profile_pmis27.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OMP_AMG_SETUP_TIMERS", "1")

import jax

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup, hierarchy_stats
from omp_amg_tpu.amg.params import AMGParams


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print("backend:", jax.devices()[0], flush=True)
    a = amg.poisson3d_27pt(n, backend="numpy")
    t0 = time.time()
    hier = amg_setup(a, AMGParams(coarsening="pmis", smoother="chebyshev"))
    jax.block_until_ready(hier.levels[0].dinv)
    print(f"27pt-{n} setup: {time.time()-t0:.1f}s", flush=True)
    print(hierarchy_stats(hier), flush=True)


if __name__ == "__main__":
    main()
