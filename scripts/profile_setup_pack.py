"""CPU-side profile of the PMIS setup's host phases + pack path.

Forces DeferredUpload non-eager so the batched-upload pack runs (and its
jitted unpack executes on the CPU backend — transfer is free, so the trace
isolates HOST pack cost from relay transfer). routed="force" builds the
plan arrays the TPU path would build.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        OMP_AMG_SETUP_TIMERS=1 OMP_AMG_PACK_TRACE=1 \
        python scripts/profile_setup_pack.py [n] [stencil]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OMP_AMG_SETUP_TIMERS", "1")

import jax

import omp_amg_tpu as amg
from omp_amg_tpu.amg.hierarchy import amg_setup
from omp_amg_tpu.amg.params import AMGParams
from omp_amg_tpu.utils import pack


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    stencil = sys.argv[2] if len(sys.argv) > 2 else "3d7pt"
    pack.DeferredUpload.__init__.__defaults__ = (False,)  # force non-eager
    gen = {"3d7pt": amg.poisson3d_7pt, "3d27pt": amg.poisson3d_27pt}[stencil]
    a = gen(n, backend="numpy")
    print("backend:", jax.devices()[0], "n:", a.n_rows, flush=True)
    t0 = time.time()
    hier = amg_setup(a, AMGParams(coarsening="pmis", routed="force"))
    jax.block_until_ready(hier.levels[0].dinv)
    print(f"{stencil}-{n} setup: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
