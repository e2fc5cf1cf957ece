"""Chip check: routed kernel at 16 k row-blocks (256³-scale SMEM load).

NB_CAP was 8192 because cbase/kch/sbase ride scalar prefetch (SMEM). This
validates compile + exactness + throughput with nb = 16384 blocks
(16.8 M rows — the 256³ P[0] shape) on a synthetic banded operator.

Run on the real chip:  python scripts/chip_nb16k.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from omp_amg_tpu.ops.pallas_routed import spmv_routed
from omp_amg_tpu.sparse.routed import routed_from_scipy
from omp_amg_tpu.utils.timers import timeit_fused


def main():
    print("backend:", jax.devices()[0], flush=True)
    n = 16384 * 1024  # 16.8M rows, 16384 blocks
    nc = n // 8       # prolongation-like: 8x coarsening
    rng = np.random.default_rng(0)
    # 4 nnz/row banded at the P[0]-like ratio
    rows = np.repeat(np.arange(n, dtype=np.int64), 4)
    cols = np.clip(rows // 8 + rng.integers(-6, 7, len(rows)), 0, nc - 1)
    m = sp.csr_matrix((rng.standard_normal(len(rows)).astype(np.float32),
                       (rows, cols)), shape=(n, nc))
    m.sum_duplicates()
    print(f"nnz={m.nnz/1e6:.1f}M nb=16384", flush=True)
    import time
    t0 = time.time()
    rt = routed_from_scipy(m)
    print(f"plan: {time.time()-t0:.1f}s  NC={rt.val4.shape[0]} "
          f"span={rt.span} resident={rt.resident}", flush=True)
    x = rng.standard_normal(nc).astype(np.float32)
    xd = jnp.asarray(x)
    y = np.asarray(spmv_routed(rt, xd))
    ref = m @ x
    err = np.abs(y - ref).max() / max(1.0, np.abs(ref).max())
    print("max rel err:", err, flush=True)
    assert err < 5e-6

    def chain(a, xv):
        yy = spmv_routed(a, xv)
        return xv + 1e-20 * yy[:xv.shape[0]]

    t = timeit_fused(chain, rt, xd, iters=10)
    print(f"spmv: {t*1e3:.3f} ms  {rt.nnz/t/1e9:.2f} Gnnz/s", flush=True)


if __name__ == "__main__":
    main()
