"""Isolate the warm solve_ir_device overhead at 256^3.

profile_solve256 showed: amg_pcg(tol=1e-6,maxiter=200) warm = 0.23 s,
df64 residual step = 33 ms, scalar pulls = 47 ms — yet the certified
solve wall was 6.9 s. Suspects: maxiter=500 graph, per-call retrace,
_accumulate_step, the outer-loop Python glue.

Run: python scripts/profile_ir256.py  (claims the TPU; background it)
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
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.solvers.cg import amg_pcg
from omp_amg_tpu.solvers.ir import solve_ir_device

print(f"backend: {jax.devices()[0]}", flush=True)
n = 256
a = amg.poisson3d_7pt(n, backend="device")
b = amg.default_rhs(a, "random", seed=0)
t0 = time.time()
hier = amg_setup(a, grid=(n, n, n), flavor="device")
jax.block_until_ready(hier.coarse_chol)
print(f"setup: {time.time()-t0:.1f}s", flush=True)

# amg_pcg with maxiter=500 (exact graph used by the certified path)
def pcg500():
    r = amg_pcg(a, b, hier, tol=1e-6, maxiter=500)
    float(jnp.sum(r.x[:1]))
    return r

t0 = time.time(); res = pcg500()
print(f"amg_pcg(500) first: {time.time()-t0:.2f}s iters={int(res.iters)}",
      flush=True)
for k in range(2):
    t0 = time.time(); res = pcg500()
    print(f"amg_pcg(500) warm[{k}]: {time.time()-t0:.3f}s", flush=True)

# full certified path, three times
for k in range(3):
    t0 = time.time()
    out = solve_ir_device(a, b, hier, tol=1e-8)
    wall = time.time() - t0
    print(f"solve_ir_device[{k}]: {wall:.3f}s inner={out.inner_iters} "
          f"rel={out.rel_residual:.2e}", flush=True)
print("DONE", flush=True)
