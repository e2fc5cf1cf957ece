"""Measure the fused ConstDia epilogues on chip.

1. SpMV @256^3: const vs plane (headline confirmation)
2. V-cycle @128^3 structured with fused residual/jacobi (record: 5.3 ms)
3. Warm PCG solve @128^3 (record: 0.05 s)

Run: python scripts/measure_fused.py  (claims the TPU; background it)
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
from omp_amg_tpu.ops.spmv import spmv, residual
from omp_amg_tpu.utils.timers import timeit, timeit_fused

print(f"backend: {jax.devices()[0]}", flush=True)

# ---- 1. SpMV headline @256^3 ----
n = 256
a = amg.poisson3d_7pt(n, backend="device")
b = amg.default_rhs(a, "random", seed=0)
jax.block_until_ready(a.data)
nnz = sum(a.n_rows - abs(o) for o in a.offsets)
for name, op in [("const", amg.to_const_dia(a)),
                 ("plane", amg.to_plane_dia(a, dtype="auto"))]:
    sec = timeit_fused(spmv, op, b, iters=50)
    print(f"SpMV 7pt {n}^3 [{name}]: {sec*1e3:.3f} ms, "
          f"{nnz/sec/1e9:.1f} Gnnz/s", flush=True)

# fused residual on the const form @256^3
cd = amg.to_const_dia(a)
x0 = amg.default_rhs(a, "random", seed=1)
sec = timeit_fused(lambda o, v: residual(o, v, b), cd, x0, iters=50)
print(f"residual 7pt {n}^3 [const fused]: {sec*1e3:.3f} ms "
      f"({nnz/sec/1e9:.1f} Gnnz/s-equiv)", flush=True)
sec = timeit_fused(lambda o, v: b - spmv(o, v), cd, x0, iters=50)
print(f"residual 7pt {n}^3 [const unfused]: {sec*1e3:.3f} ms", flush=True)

# ---- 2. V-cycle + PCG @128^3 ----
from omp_amg_tpu.amg.hierarchy import amg_setup, hierarchy_stats
from omp_amg_tpu.amg.vcycle import vcycle
from omp_amg_tpu.solvers.cg import amg_pcg

ns = 128
a2 = amg.poisson3d_7pt(ns)
b2 = amg.default_rhs(a2, "random", seed=0)
t0 = time.time()
hier = amg_setup(a2, grid=(ns, ns, ns))
print(f"setup {ns}^3: {time.time()-t0:.1f}s; levels: "
      f"{hierarchy_stats(hier)}", flush=True)

lv0 = hier.levels[0].a
print(f"level-0 operator type: {type(lv0).__name__}", flush=True)

vsec = timeit(jax.jit(vcycle), hier, b2, warmup=2, iters=10)
print(f"vcycle {ns}^3: {vsec*1e3:.2f} ms (record 5.3)", flush=True)


def _solve():
    r = amg_pcg(a2, b2, hier, tol=1e-6, maxiter=200)
    float(jnp.sum(r.x[:1]))
    return r


t0 = time.time(); res = _solve()
print(f"solve first (incl compile): {time.time()-t0:.2f}s", flush=True)
t0 = time.time(); res = _solve()
print(f"solve warm: {time.time()-t0:.3f}s, iters {int(res.iters)}, "
      f"rel {float(res.rel_residual):.2e} (records: 0.05s, 10)", flush=True)

# correctness spot-check vs scipy at 64^3
a3 = amg.poisson3d_7pt(64)
b3 = amg.default_rhs(a3, "random", seed=0)
h3 = amg_setup(a3, grid=(64,) * 3)
r3 = amg_pcg(a3, b3, h3, tol=1e-8, maxiter=100)
x_np = np.asarray(r3.x, np.float64)
a_sp = amg.dia_to_scipy(a3)
rr = np.linalg.norm(np.asarray(b3, np.float64) - a_sp @ x_np) \
    / np.linalg.norm(np.asarray(b3, np.float64))
print(f"64^3 check: iters {int(r3.iters)}, true f64 rel {rr:.2e}", flush=True)
print("DONE", flush=True)
