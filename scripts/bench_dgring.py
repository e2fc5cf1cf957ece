"""Chip sweep of the routed kernel's DMA grouping (DG) and ring depth.

Loads the saved 96³ PMIS operators (/tmp/*.npz from diag runs) to skip the
~2 min setup; times spmv_routed for (DG, RING) combinations.

Run on the real chip:  python scripts/bench_dgring.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

import omp_amg_tpu.ops.pallas_routed as pr
from omp_amg_tpu.sparse.routed import routed_from_scipy
from omp_amg_tpu.utils.timers import timeit_fused


def main():
    print("backend:", jax.devices()[0], flush=True)
    ops = {}
    for name, f in (("A[1]", "/tmp/a1_96.npz"), ("R[0]", None),
                    ("P[0]", "/tmp/p0_96.npz")):
        if f is None:
            ops[name] = sp.load_npz("/tmp/p0_96.npz").T.tocsr()
        else:
            ops[name] = sp.load_npz(f)
    jnp.ones((8, 128)).sum().block_until_ready()

    devs = {}
    for name, m in ops.items():
        devs[name] = (routed_from_scipy(m), m)

    for dg, ring in ((4, 4), (4, 8), (8, 4), (8, 8), (2, 8), (4, 6)):
        pr.DG = dg
        pr.RING = ring
        pr._make_kloop_call.cache_clear()
        for name, (rt, m) in devs.items():
            x = np.random.default_rng(0).standard_normal(m.shape[1])
            xd = jnp.asarray(x, jnp.float32)
            y = np.asarray(pr.spmv_routed(rt, xd))
            ref = m @ x
            err = np.abs(y - ref).max() / max(1.0, np.abs(ref).max())
            assert err < 5e-6, (name, dg, ring, err)

            def chain(a, xv):
                yy = pr.spmv_routed(a, xv)
                return xv + 1e-20 * (yy[:xv.shape[0]] if yy.shape[0] >=
                                     xv.shape[0] else
                                     jnp.pad(yy, (0, xv.shape[0] -
                                                  yy.shape[0])))

            t = timeit_fused(chain, rt, xd, iters=20)
            nc = rt.val4.shape[0]
            print(f"DG={dg} RING={ring} {name}: {t*1e3:7.3f} ms  "
                  f"{rt.nnz/t/1e9:6.2f} Gnnz/s  {t/nc*1e9:6.0f} ns/chunk",
                  flush=True)


if __name__ == "__main__":
    main()
