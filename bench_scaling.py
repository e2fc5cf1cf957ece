"""Weak/strong-scaling harness for the row-sharded solver (BASELINE config 5).

On real multi-chip hardware this measures the >=80% weak-scaling gate; in
this container (one chip) it runs on a virtual CPU mesh, validating the
scaling *machinery* and reporting the efficiency of the sharded solve vs the
single-device solve at equal problem size (strong scaling) — run with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python bench_scaling.py
"""

import json
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") != "tpu":
    os.environ["JAX_PLATFORMS"] = "cpu"  # axon env preselects the TPU
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import omp_amg_tpu as amg
from omp_amg_tpu.parallel.dist import make_dist_solver
from omp_amg_tpu.parallel.dist_setup import dist_structured_setup
from omp_amg_tpu.parallel.partition import (
    pad_vector, partition_hierarchy, place_hierarchy, unpad_vector,
)


def timed_solve(solve, dh, bp, reps=3):
    x, it, rel = solve(dh, bp)  # compile
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        x, it, rel = solve(dh, bp)
        jax.block_until_ready(x)
        best = min(best, time.perf_counter() - t0)
    return best, int(it), float(rel)


def main():
    n = int(os.environ.get("SCALE_N", "48"))
    a = amg.poisson3d_7pt(n)
    b = amg.default_rhs(a, "random", seed=0)
    hier = amg.amg_setup(a, grid=(n, n, n))
    results = {"n": n, "devices": {}}
    base_t = None
    transport = os.environ.get("SCALE_TRANSPORT", "ppermute")
    for ndev in (1, 2, 4, 8):
        if ndev > len(jax.devices()):
            break
        mesh = jax.make_mesh((ndev,), ("rows",))
        # distributed setup phase (per-shard comb RAP) — timed per mesh size
        t0 = time.perf_counter()
        try:
            dh = dist_structured_setup(a, (n, n, n), mesh,
                                       agg_rows_per_dev=2048,
                                       transport=transport)
            setup_s = time.perf_counter() - t0
        except ValueError:
            dh = place_hierarchy(
                partition_hierarchy(hier, ndev, agg_rows_per_dev=2048,
                                    transport=transport), mesh)
            setup_s = None
        solve = make_dist_solver(mesh, dh, tol=1e-6, maxiter=100)
        bp = pad_vector(b, dh, ndev)
        t, it, rel = timed_solve(solve, dh, bp)
        if base_t is None:
            base_t = t
        results["devices"][ndev] = {
            "solve_s": t, "iters": it, "rel_residual": rel,
            "speedup_vs_1dev": base_t / t, "dist_setup_s": setup_s,
        }
        print(f"ndev={ndev}: solve {t*1e3:.1f} ms, iters={it}, "
              f"speedup {base_t/t:.2f}, dist-setup "
              f"{'n/a' if setup_s is None else f'{setup_s:.2f}s'}",
              file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
