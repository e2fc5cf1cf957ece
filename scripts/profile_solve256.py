"""Break down the warm certified 256^3 solve wall (6.9 s vs ~0.5 s of
device compute): inner amg_pcg calls, df64 residual steps, scalar syncs.

Run: python scripts/profile_solve256.py  (claims the TPU; background it)
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
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.ops.df64 import _accumulate_step, _residual_step
from omp_amg_tpu.solvers.cg import amg_pcg

print(f"backend: {jax.devices()[0]}", flush=True)
n = 256
a = amg.poisson3d_7pt(n, backend="device")
b = amg.default_rhs(a, "random", seed=0)
t0 = time.time()
hier = amg_setup(a, grid=(n, n, n), flavor="device")
jax.block_until_ready(hier.coarse_chol)
print(f"setup: {time.time()-t0:.1f}s", flush=True)

# --- inner PCG alone, warm ---
def pcg_once():
    r = amg_pcg(a, b, hier, tol=1e-6, maxiter=200)
    float(jnp.sum(r.x[:1]))
    return r

t0 = time.time(); res = pcg_once()
print(f"amg_pcg first: {time.time()-t0:.2f}s iters={int(res.iters)}",
      flush=True)
for k in range(3):
    t0 = time.time(); res = pcg_once()
    print(f"amg_pcg warm[{k}]: {time.time()-t0:.3f}s iters={int(res.iters)}",
          flush=True)

# --- df64 residual step alone ---
offsets = tuple(int(o) for o in a.offsets)
data_h = jnp.asarray(a.data, jnp.float32)
bh = jnp.asarray(b, jnp.float32)
bl = jnp.zeros_like(bh)
xh = jnp.asarray(res.x, jnp.float32)
xl = jnp.zeros_like(bh)
out = _residual_step(offsets, data_h, None, bh, bl, xh, xl)
float(out[3])
for k in range(3):
    t0 = time.time()
    out = _residual_step(offsets, data_h, None, bh, bl, xh, xl)
    float(out[3])
    print(f"df64 residual_step warm[{k}]: {time.time()-t0:.3f}s", flush=True)

# --- int()/float() pulls on PCG result fields (relay scalar syncs) ---
res = pcg_once()
t0 = time.time(); it = int(res.iters); rel = float(res.rel_residual)
print(f"scalar pulls: {time.time()-t0:.3f}s", flush=True)
print("DONE", flush=True)
