"""BASELINE headline config end-to-end: 3D 7-pt 256^3 AMG-PCG to 1e-8.

Measures: setup (device flavor, cold+warm), V-cycle wall, certified solve
via AMGSolver (device-resident df64 IR — no host residual transfers), and
the true f64 residual recomputed on host as an independent check.

Records to beat (2026-08-18): warm solve wall 15.9 s (host-IR),
setup 438 s cold / O(s) warm.

Run: python scripts/measure_256.py  (claims the TPU; background it)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup, hierarchy_stats
from omp_amg_tpu.amg.vcycle import vcycle
from omp_amg_tpu.utils.timers import timeit

print(f"backend: {jax.devices()[0]}", flush=True)

n = int(os.environ.get("N", "256"))
flavor = os.environ.get("SETUP_FLAVOR", "device")

t0 = time.time()
a = amg.poisson3d_7pt(n, backend="device")
b = amg.default_rhs(a, "random", seed=0)
jax.block_until_ready(a.data)
print(f"gen {n}^3 on device: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
solver = amg.AMGSolver(a, grid=(n, n, n), flavor=flavor)
hier = solver.hierarchy
jax.block_until_ready(hier.coarse_chol)
print(f"setup[{flavor}] {n}^3: {time.time()-t0:.1f}s; "
      f"{hierarchy_stats(hier)}", flush=True)
print(f"level-0 type: {type(hier.levels[0].a).__name__}", flush=True)

vsec = timeit(jax.jit(vcycle), hier, b, warmup=2, iters=10)
print(f"vcycle {n}^3: {vsec*1e3:.2f} ms", flush=True)

t0 = time.time()
x = solver.solve(b, tol=1e-8)
print(f"solve first (incl compile): {time.time()-t0:.1f}s "
      f"info={solver.last_info}", flush=True)
t0 = time.time()
x = solver.solve(b, tol=1e-8)
wall = time.time() - t0
print(f"solve warm: {wall:.2f}s info={solver.last_info}", flush=True)

# independent host f64 check via the native DIA apply (no CSR materialize)
t0 = time.time()
from omp_amg_tpu import native
a_np = amg.poisson3d_7pt(n, backend="numpy")
b64 = np.asarray(b, np.float64)
x64 = np.asarray(x, np.float64)
r = b64 - native.dia_apply(list(a_np.offsets),
                           np.asarray(a_np.data, np.float64), x64)
rel = np.linalg.norm(r) / np.linalg.norm(b64)
print(f"host f64 check: rel={rel:.2e} ({time.time()-t0:.1f}s)", flush=True)
print("DONE", flush=True)
