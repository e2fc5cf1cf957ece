"""A/B the routed kloop kernel's grid fan-in (RB) and DMA ring depth on a
real PMIS level. One TPU process."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

import omp_amg_tpu as amg
import omp_amg_tpu.ops.pallas_routed as pr
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.sparse.routed import routed_from_scipy
from omp_amg_tpu.utils.timers import timeit_fused


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    print("backend:", jax.devices()[0], flush=True)
    a = amg.poisson3d_7pt(n)
    h, hops = amg_setup(a, AMGParams(coarsening="pmis", routed="off",
                                     rap="host"), keep_host=True,
                        flavor="host")
    a1 = sp.csr_matrix(hops[1])
    rt = routed_from_scipy(a1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(a1.shape[1])
                    .astype(np.float32))
    ref = a1 @ np.asarray(x, np.float64)
    scale = np.abs(ref).max()

    for rb, ring in ((8, 4), (16, 4), (4, 4), (8, 6), (16, 6), (32, 4)):
        pr._make_kloop_call.cache_clear()
        old_rb, old_ring = pr.RB, pr.RING
        pr.RB, pr.RING = rb, ring
        try:
            y = pr.spmv_routed(rt, x)
            err = np.abs(np.asarray(y, np.float64) - ref).max() / scale
            t = timeit_fused(lambda A, xv: pr.spmv_routed(A, xv), rt, x,
                             iters=20)
            print(f"RB={rb:3d} RING={ring}: {t*1e3:7.3f} ms = "
                  f"{rt.nnz/t/1e9:5.2f} Gnnz/s  (err {err:.1e})",
                  flush=True)
        finally:
            pr.RB, pr.RING = old_rb, old_ring
    pr._make_kloop_call.cache_clear()


if __name__ == "__main__":
    main()
