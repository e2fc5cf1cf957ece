"""Per-stage V-cycle timing at N^3 (default 256): where does the time go?

Times each level-0/1 stage with fused-loop dispatch (relay-safe):
zero-guess pre-smooth, fused residual, restrict, prolong, correct+post-
smooth — plus each coarser level's total. Guides which fusion to build
next (BASELINE: stage-latency floor ~0.5 ms/dispatch hides small stages).

Run: python scripts/profile_vcycle.py  (claims the TPU; background it)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup, hierarchy_stats
from omp_amg_tpu.amg.smoothers import jacobi
from omp_amg_tpu.amg.vcycle import vcycle
from omp_amg_tpu.ops.spmv import residual, spmv
from omp_amg_tpu.utils.timers import timeit, timeit_fused

print(f"backend: {jax.devices()[0]}", flush=True)
n = int(os.environ.get("N", "256"))
a = amg.poisson3d_7pt(n, backend="device")
b = amg.default_rhs(a, "random", seed=0)
t0 = time.time()
hier = amg_setup(a, grid=(n, n, n), flavor=os.environ.get(
    "SETUP_FLAVOR", "device"))
jax.block_until_ready(hier.coarse_chol)
print(f"setup: {time.time()-t0:.1f}s {hierarchy_stats(hier)}", flush=True)

params = hier.params
for l, lv in enumerate(hier.levels[:3]):
    nl = lv.a.n_rows if hasattr(lv.a, "n_rows") else lv.a.shape[0]
    bl = amg.default_rhs_n(nl, seed=l) if hasattr(amg, "default_rhs_n") \
        else jnp.asarray(jax.random.normal(jax.random.PRNGKey(l), (nl,)),
                         jnp.float32)
    xl = jnp.asarray(jax.random.normal(jax.random.PRNGKey(l + 7), (nl,)),
                     jnp.float32)
    om = float(params.omega) if params.omega else 0.8

    t_sm = timeit_fused(lambda op, v: jacobi(op, lv.dinv, v, bl, om, 1),
                        lv.a, xl, iters=30)
    t_res = timeit_fused(lambda op, v: residual(op, v, bl), lv.a, xl,
                         iters=30)
    # restrict+prolong round trip (fine -> coarse -> fine: 2 transfer passes)
    t_rp = timeit_fused(lambda op, v: spmv(lv.p, spmv(op, v)), lv.r, xl,
                        iters=30)
    print(f"L{l} (n={nl}): smooth {t_sm*1e3:.3f} | residual "
          f"{t_res*1e3:.3f} | restrict+prolong {t_rp*1e3:.3f} ms  "
          f"[{type(lv.a).__name__}]", flush=True)

vsec = timeit(jax.jit(vcycle), hier, b, warmup=2, iters=10)
print(f"vcycle total: {vsec*1e3:.2f} ms", flush=True)
print("DONE", flush=True)
