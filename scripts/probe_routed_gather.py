"""Probe: the two primitives the routed-window ELL SpMV kernel needs.

1. (8,128) jnp.take_along_axis(axis=1) inside a Pallas TPU kernel
   (Mosaic lane-wise gather at width exactly 128) — compile + speed.
2. Per-(tile,window) dynamic-base DMA from an HBM x view into a VMEM
   window buffer shaped (M, w_sub, B, 128) (strided destination).

Run on the real chip:  python scripts/probe_routed_gather.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omp_amg_tpu.utils.timers import timeit_fused

LANES = 128


def _gather_kernel(lidx_ref, sidx_ref, val_ref, xwin_ref, o_ref, *, K, W):
    """acc[s,l] = sum_k val[k,s,l] * xwin[c(k,s,l), s-th row ... ] via
    per-candidate take_along_axis + select."""
    acc = jnp.zeros((8, LANES), jnp.float32)
    for k in range(K):
        lidx = lidx_ref[k]
        sidx = sidx_ref[k]
        g = jnp.zeros((8, LANES), jnp.float32)
        for c in range(W):
            cand = jnp.take_along_axis(xwin_ref[c], lidx, axis=1)
            g = jnp.where(sidx == c, cand, g)
        acc = acc + val_ref[k] * g
    o_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("K", "W"))
def gather_probe(lidx, sidx, val, xwin, *, K, W):
    nb = lidx.shape[0]
    return pl.pallas_call(
        functools.partial(_gather_kernel, K=K, W=W),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((None, K, 8, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, K, 8, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, K, 8, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, W, 8, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * 8, LANES), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(lidx, sidx, val, xwin)


def main():
    dev = jax.devices()[0]
    print("backend:", dev.platform, dev, flush=True)
    rng = np.random.default_rng(0)
    nb, K, W = 2048, 16, 4  # 2048 blocks x 8x128 rows = 2.1M rows
    lidx = rng.integers(0, LANES, size=(nb, K, 8, LANES)).astype(np.int32)
    sidx = rng.integers(0, W, size=(nb, K, 8, LANES)).astype(np.int32)
    val = rng.standard_normal((nb, K, 8, LANES)).astype(np.float32)
    xwin = rng.standard_normal((nb, W, 8, LANES)).astype(np.float32)
    args = [jnp.asarray(a) for a in (lidx, sidx, val, xwin)]

    t0 = time.time()
    y = gather_probe(*args, K=K, W=W)
    jax.block_until_ready(y)
    print(f"compile+run: {time.time()-t0:.1f}s", flush=True)

    # correctness vs numpy
    b_i = np.arange(nb)[:, None, None, None]
    s_i = np.arange(8)[None, None, :, None]
    ref = (val * xwin[b_i, sidx, s_i, lidx]).sum(axis=1)
    err = np.abs(np.asarray(y).reshape(nb, 8, LANES) - ref).max()
    print("max err:", err, flush=True)
    assert err < 1e-4, err

    f = functools.partial(gather_probe, K=K, W=W)

    def step(consts, xw):
        li, si, va = consts
        y = f(li, si, va, xw)
        # feed y back through the data dependence (serializes iterations)
        return xw + 0.0 * y.reshape(nb, 1, 8, LANES)

    sec = timeit_fused(step, (args[0], args[1], args[2]), args[3], iters=30)
    nnz = nb * K * 8 * LANES
    print(f"gather fma: {sec*1e3:.3f} ms, {nnz/sec/1e9:.1f} Gnnz/s "
          f"(streams {(nnz*12 + nb*W*8*LANES*4)/sec/1e9:.0f} GB/s)",
          flush=True)


if __name__ == "__main__":
    main()
