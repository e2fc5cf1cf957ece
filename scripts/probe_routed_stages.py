"""Probe: separate the routed-SpMV kernel's true cost from the relay's
per-stage latency floor.

Times, on the A[0]/A[1] operators of the 7-pt 64^3 PMIS hierarchy:
  raw      — the bare pallas_call on pre-padded (nxp,128) x, y kept (nb*8,128)
  wrapped  — spmv_routed (pad -> kernel -> slice/astype, 3 XLA stages)
  streamed — same raw kernel but the span-DMA variant (resident forced off)

Run on the real chip:  python scripts/probe_routed_stages.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
import omp_amg_tpu.sparse.routed as routed_mod
from omp_amg_tpu.sparse.routed import RoutedEll, routed_from_scipy
from omp_amg_tpu.ops.pallas_routed import (
    LANES, _make_resident_call, _make_routed_call, spmv_routed,
)
from omp_amg_tpu.problems.poisson import poisson3d_7pt
from omp_amg_tpu.utils.timers import timeit_fused


def raw_call(a: RoutedEll):
    nb, K = a.val4.shape[:2]
    dt = jnp.dtype(a.val4.dtype).name
    if a.resident:
        call = _make_resident_call(nb, K, a.soff.shape[2], a.nxp, dt)
        return lambda x2: call(a.soff, a.lidx4, a.val4, x2)
    call = _make_routed_call(nb, K, a.span, a.soff.shape[2],
                             a.sbase.shape[1], a.nxp, dt)
    return lambda x2: call(a.sbase, a.soff, a.lidx4, a.val4, x2)


def bench_op(name, rt, rt_streamed):
    n = rt.n_cols
    x2 = jnp.asarray(
        np.random.default_rng(0).standard_normal((rt.nxp, LANES)), jnp.float32)
    nb = rt.val4.shape[0]

    # raw: y is (nb*8, 128); feed back a (nxp,128) slab to keep the chain.
    # The operator must be a jit ARGUMENT — closing over it inlines the plan
    # arrays as HLO constants (a ~100 MB compile payload → relay HTTP 413).
    def step_raw(a_, x):
        y = raw_call(a_)(x)
        return jax.lax.dynamic_update_slice(x, y[: min(nb * 8, rt.nxp)], (0, 0))

    t_raw = timeit_fused(step_raw, rt, x2, iters=50)
    t_str = timeit_fused(step_raw, rt_streamed, x2, iters=50)

    x1 = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    t_wrap = timeit_fused(spmv_routed, rt, x1, iters=50)

    nnz = rt.nnz
    pad = nb * rt.width * 1024
    print(f"{name}: raw(resident) {t_raw*1e6:9.1f} us ({nnz/t_raw/1e9:6.2f} "
          f"Gnnz/s, {pad/t_raw/1e9:6.2f} padded)  raw(streamed) "
          f"{t_str*1e6:9.1f} us  wrapped {t_wrap*1e6:9.1f} us  "
          f"[nb={nb} K={rt.width} S={rt.span} nxp={rt.nxp}]", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print("backend:", jax.devices()[0], flush=True)
    a = poisson3d_7pt(n)
    hier, ops = amg_setup(a, AMGParams(coarsening="pmis", routed="off"),
                          keep_host=True, flavor="host")
    for li in range(min(3, len(ops) - 1)):
        m = ops[li]
        rt = routed_from_scipy(m)
        cap = routed_mod.RESIDENT_CAP_BYTES
        routed_mod.RESIDENT_CAP_BYTES = 0
        rt_s = routed_from_scipy(m)
        routed_mod.RESIDENT_CAP_BYTES = cap
        if rt is None or rt_s is None:
            continue
        bench_op(f"A[{li}]", rt, rt_s)


if __name__ == "__main__":
    main()
