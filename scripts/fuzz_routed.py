"""Randomized stress sweep: routed-ELL planner/kernels and the rolling
panel-SpMM vs scipy oracles across many shapes/densities (CPU-only).

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          python scripts/fuzz_routed.py [n_cases] [seed]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from omp_amg_tpu.ops.pallas_routed import (
    jacobi_routed, residual_routed, spmv_routed, spmv_routed_xla,
)
from omp_amg_tpu.sparse.routed import routed_from_scipy, routed_to_scipy


def random_case(rng):
    kind = rng.integers(0, 5)
    n_rows = int(rng.integers(1, 6000))
    n_cols = int(rng.integers(1, 6000))
    if kind == 0:      # uniform random
        nnz = int(rng.integers(0, max(1, n_rows * 4)))
        rows = rng.integers(0, n_rows, nnz)
        cols = rng.integers(0, n_cols, nnz)
    elif kind == 1:    # banded
        band = int(rng.integers(1, 300))
        nnz = int(rng.integers(1, max(2, n_rows * 6)))
        rows = rng.integers(0, n_rows, nnz)
        cols = np.clip(rows * n_cols // max(n_rows, 1)
                       + rng.integers(-band, band + 1, nnz), 0, n_cols - 1)
    elif kind == 2:    # a few dense rows
        rows = np.concatenate([rng.integers(0, n_rows, n_rows * 2),
                               np.repeat(rng.integers(0, n_rows, 3),
                                         min(n_cols, 500))])
        cols = rng.integers(0, n_cols, len(rows))
    elif kind == 3:    # block-sparse clusters
        nb = max(1, n_rows // 700)
        rows = rng.integers(0, n_rows, n_rows * 3)
        centers = rng.integers(0, max(1, n_cols), nb)
        cols = np.clip(centers[rows * nb // max(n_rows, 1)]
                       + rng.integers(-64, 65, len(rows)), 0, n_cols - 1)
    else:              # empty / tiny
        n_rows = int(rng.integers(1, 200))
        n_cols = int(rng.integers(1, 200))
        rows = rng.integers(0, n_rows, int(rng.integers(0, 50)))
        cols = rng.integers(0, n_cols, len(rows))
    m = sp.csr_matrix((rng.standard_normal(len(rows)), (rows, cols)),
                      shape=(n_rows, n_cols))
    m.sum_duplicates()
    m.eliminate_zeros()
    return m


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    skipped = 0
    from omp_amg_tpu.utils.pack import DeferredUpload

    for t in range(n_cases):
        m = random_case(rng)
        if t % 3 == 0:
            # every third case goes through the batched-upload path
            # (round-5 transfer format: delta-encoded index streams +
            # device-derived lidx words) instead of the eager puts
            batch = DeferredUpload(eager=False)
            rt = routed_from_scipy(m, put=batch.add)
            if rt is not None:
                rt = batch.resolve(rt)
        else:
            rt = routed_from_scipy(m)
        if rt is None:
            skipped += 1
            continue
        back = routed_to_scipy(rt)
        d = (back - m)
        err_plan = abs(d).max() if d.nnz else 0.0
        scale = max(1.0, abs(m).max() if m.nnz else 1.0)
        assert err_plan < 2e-7 * scale, (t, "roundtrip", err_plan)
        x = rng.standard_normal(m.shape[1]).astype(np.float32)
        ref = m @ x.astype(np.float64)
        y = np.asarray(spmv_routed_xla(rt, jnp.asarray(x)), np.float64)
        assert np.abs(y - ref).max() < 5e-5 * max(1.0, np.abs(ref).max()), \
            (t, "xla")
        if t % 10 == 0:   # interpret-mode kernel on a subsample (slow)
            y2 = np.asarray(spmv_routed(rt, jnp.asarray(x), interpret=True),
                            np.float64)
            assert np.abs(y2 - y).max() < 1e-5 * max(1.0, np.abs(y).max()), \
                (t, "kernel")
            if m.shape[0] == m.shape[1]:
                b = rng.standard_normal(m.shape[0]).astype(np.float32)
                s = rng.uniform(0.1, 1.0, m.shape[0]).astype(np.float32)
                r = np.asarray(residual_routed(rt, jnp.asarray(x),
                                               jnp.asarray(b),
                                               interpret=True))
                assert np.abs(r - (b - y)).max() < 1e-4, (t, "residual")
        if t % 20 == 0:
            print(f"case {t}: n={m.shape} nnz={m.nnz} "
                  f"res={rt.resident} ok", flush=True)
    print(f"FUZZ PASSED: {n_cases - skipped} cases ({skipped} over caps)",
          flush=True)


if __name__ == "__main__":
    main()
