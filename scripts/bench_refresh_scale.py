"""Refresh where it pays (VERDICT r4 next-#2): cache+refresh at the sizes
whose fresh setup is expensive — 27-pt 128³ classical and 7-pt 256³
classical. Reports fresh (cached) setup, cold refresh (freezes the
numeric dataflow), warm refresh (pure numeric), cache host footprint, and
a certified solve on the refreshed hierarchy.

One TPU process:
    python scripts/bench_refresh_scale.py [n=128] [stencil=3d27pt]
    BENCH_REFRESH_BF16=1  additionally measures a bf16-stream warm refresh
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OMP_AMG_SETUP_TIMERS", "1")

import jax
import jax.numpy as jnp
import numpy as np

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.amg.refresh import SetupCache, amg_refresh, cache_nbytes
from omp_amg_tpu.solvers.ir import solve_ir
from omp_amg_tpu.sparse.formats import Dia


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    stencil = sys.argv[2] if len(sys.argv) > 2 else "3d27pt"
    gen = {"3d7pt": amg.poisson3d_7pt, "3d27pt": amg.poisson3d_27pt}[stencil]
    prm = AMGParams(coarsening="pmis",
                    smoother="chebyshev" if stencil == "3d27pt" else "jacobi")
    print("backend:", jax.devices()[0], flush=True)
    float(jax.jit(lambda v: v @ v)(jnp.ones((8,), jnp.float32)))  # warm relay

    a = gen(n, backend="numpy")
    out = {"n": n, "stencil": stencil}

    cache = SetupCache()
    t0 = time.time()
    hier = amg_setup(a, prm, cache=cache)
    jax.block_until_ready(hier.levels[0].dinv)
    out["setup_s"] = time.time() - t0
    print(f"{stencil}-{n}: cached fresh setup {out['setup_s']:.1f}s",
          flush=True)

    def scaled(s):
        return Dia(data=np.asarray(a.data) * s, offsets=a.offsets,
                   dims=a.dims)

    t0 = time.time()
    h2 = amg_refresh(scaled(2.0), cache, release_old_values=True)
    jax.block_until_ready(h2.levels[0].dinv)
    out["refresh_cold_s"] = time.time() - t0
    print(f"{stencil}-{n}: COLD refresh {out['refresh_cold_s']:.1f}s",
          flush=True)

    h2 = hier = None   # old value sets must not coexist at 256^3
    t0 = time.time()
    h4 = amg_refresh(scaled(4.0), cache, release_old_values=True)
    jax.block_until_ready(h4.levels[0].dinv)
    out["refresh_warm_s"] = time.time() - t0
    h4 = None
    t0 = time.time()
    h4 = amg_refresh(scaled(4.0), cache, release_old_values=True)
    jax.block_until_ready(h4.levels[0].dinv)
    out["refresh_warm2_s"] = time.time() - t0
    print(f"{stencil}-{n}: WARM refresh #2 {out['refresh_warm2_s']:.1f}s",
          flush=True)
    out["cache_mb"] = cache_nbytes(cache) / 1e6
    print(f"{stencil}-{n}: WARM refresh {out['refresh_warm_s']:.1f}s "
          f"(cache {out['cache_mb']:.0f} MB host, "
          f"{out['refresh_warm_s']/out['setup_s']:.2f}x of fresh)",
          flush=True)

    # certified solve on the (f32-stream) refreshed hierarchy
    a4 = scaled(4.0)
    b = amg.default_rhs(a4, "random", seed=0)
    t0 = time.time()
    res = solve_ir((list(a4.offsets), np.asarray(a4.data, np.float64)),
                   np.asarray(b, np.float64), h4.levels[0].a, h4,
                   tol=1e-8, maxiter=300)
    out["cert_s"] = time.time() - t0
    out["cert_iters"] = int(sum(res.inner_iters))
    out["cert_rel"] = float(res.rel_residual)
    print(f"{stencil}-{n}: certified on refreshed hierarchy "
          f"{out['cert_iters']} it rel {res.rel_residual:.2e} "
          f"({out['cert_s']:.1f}s)", flush=True)
    assert res.rel_residual <= 1e-8

    if os.environ.get("BENCH_REFRESH_BF16") == "1":
        h4 = None    # three value sets never fit at 256^3
        t0 = time.time()
        hb = amg_refresh(scaled(4.0), cache, stream_dtype="bf16",
                         release_old_values=True)
        jax.block_until_ready(hb.levels[0].dinv)
        out["refresh_warm_bf16_s"] = time.time() - t0
        print(f"{stencil}-{n}: WARM refresh bf16 streams "
              f"{out['refresh_warm_bf16_s']:.1f}s", flush=True)
        bres = solve_ir((list(a4.offsets), np.asarray(a4.data, np.float64)),
                        np.asarray(b, np.float64), hb.levels[0].a, hb,
                        tol=1e-8, maxiter=300)
        out["cert_iters_bf16"] = int(sum(bres.inner_iters))
        out["cert_rel_bf16"] = float(bres.rel_residual)
        print(f"{stencil}-{n}: certified on bf16-refreshed hierarchy "
              f"{out['cert_iters_bf16']} it rel {bres.rel_residual:.2e}",
              flush=True)
        assert bres.rel_residual <= 1e-8

    with open(f"/tmp/bench_refresh_{stencil}_{n}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
