"""Probe: dynamic sublane-offset slicing of a VMEM span inside a Pallas kernel.

The routed-ELL SpMV kernel needs, per slot k:
    win = span[off_k : off_k + 8, :]        # off_k read from SMEM plan data
    g   = jnp.take_along_axis(win, lidx_k, axis=1)
    acc += val_k * g
Two variants probed:
  A. slab:      off_k scalar (8 contiguous span rows)
  B. sublane:   off_{k,s} per sublane (8 separate (1,128) dynamic slices)

Run on the real chip:  python scripts/probe_span_slice.py
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


def _kernel_slab(soff_ref, lidx_ref, val_ref, span_ref, o_ref, *, K):
    acc = jnp.zeros((8, LANES), jnp.float32)
    for k in range(K):
        off = soff_ref[0, k]
        win = span_ref[pl.ds(off, 8), :]
        g = jnp.take_along_axis(win, lidx_ref[k], axis=1)
        acc = acc + val_ref[k] * g
    o_ref[:, :] = acc


def _kernel_sublane(soff_ref, lidx_ref, val_ref, span_ref, o_ref, *, K):
    acc = jnp.zeros((8, LANES), jnp.float32)
    for k in range(K):
        rows = [span_ref[pl.ds(soff_ref[0, k * 8 + s], 1), :] for s in range(8)]
        win = jnp.concatenate(rows, axis=0)
        g = jnp.take_along_axis(win, lidx_ref[k], axis=1)
        acc = acc + val_ref[k] * g
    o_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("K", "S", "variant"))
def probe(soff, lidx, val, span, *, K, S, variant):
    nb = lidx.shape[0]
    kernel = dict(slab=_kernel_slab, sublane=_kernel_sublane)[variant]
    return pl.pallas_call(
        functools.partial(kernel, K=K),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((None, 1, soff.shape[2]), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, K, 8, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, K, 8, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * 8, LANES), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(soff, lidx, val, span)


def run(variant, nb, K, S):
    rng = np.random.default_rng(0)
    noff = K * 8 if variant == "sublane" else K
    soff = rng.integers(0, S - 8, size=(nb, noff)).astype(np.int32)
    noff_pad = -(-noff // 128) * 128
    soff_pad = np.zeros((nb, 1, noff_pad), np.int32)
    soff_pad[:, 0, :noff] = soff
    lidx = rng.integers(0, LANES, size=(nb, K, 8, LANES)).astype(np.int32)
    val = rng.standard_normal((nb, K, 8, LANES)).astype(np.float32)
    span = rng.standard_normal((nb, S, LANES)).astype(np.float32)
    args = [jnp.asarray(a) for a in (soff_pad, lidx, val, span)]

    t0 = time.time()
    y = probe(*args, K=K, S=S, variant=variant)
    jax.block_until_ready(y)
    dt = time.time() - t0

    # numpy oracle
    b_i = np.arange(nb)[:, None, None, None]
    s_i = np.arange(8)[None, None, :, None]
    if variant == "slab":
        srow = soff[:, :, None, None] + s_i
    else:
        srow = soff.reshape(nb, K, 8)[:, :, :, None] + 0 * lidx
    ref = (val * span[b_i, srow, lidx]).sum(axis=1)
    err = np.abs(np.asarray(y).reshape(nb, 8, LANES) - ref).max()
    print(f"[{variant}] compile+run {dt:.1f}s  max err {err:.2e}", flush=True)
    assert err < 1e-4, err

    f = functools.partial(probe, K=K, S=S, variant=variant)

    def step(consts, sp):
        so, li, va = consts
        y = f(so, li, va, sp)
        # feed y back through the data dependence (serializes iterations)
        return sp.at[:, :1, :].add(0.0 * y.reshape(nb, 8, LANES)[:, :1, :])

    sec = timeit_fused(step, (args[0], args[1], args[2]), args[3], iters=30)
    nnz = nb * K * 8 * LANES
    bts = nnz * 8 + nb * S * LANES * 4
    print(f"[{variant}] {sec*1e3:.3f} ms  {nnz/sec/1e9:.1f} Gnnz/s "
          f"(streams {bts/sec/1e9:.0f} GB/s)", flush=True)


def main():
    dev = jax.devices()[0]
    print("backend:", dev.platform, dev, flush=True)
    for variant in ("slab", "sublane"):
        try:
            run(variant, nb=2048, K=16, S=64)
        except Exception as e:
            print(f"[{variant}] FAILED: {type(e).__name__}: {str(e)[:500]}",
                  flush=True)


if __name__ == "__main__":
    main()
