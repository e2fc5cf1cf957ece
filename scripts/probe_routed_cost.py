"""On-chip cost decomposition of the routed-ELL kernel's per-chunk budget.

Round-4 measurement: the ws sweep showed per-chunk cost 0.94 µs (ws=1) →
0.53 µs (ws=8 hoisted slices), i.e. a ~0.5 µs base beyond the dynamic
sublane slices. This probe runs stripped kernel variants on a synthetic
resident plan (A[1]-like shape) to attribute the base: DMA issue/wait,
val/lidx streams, takes, fma, scalar loads, loop/locate overhead.

Run on the real chip:  python scripts/probe_routed_cost.py
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
KC = 16
RB = 8
RING = 4


def make_kernel(variant, rb, nxp, ring=RING):
    def kernel(kch_ref, cb_ref, soff_hbm, lidx_hbm, val_hbm, x_ref, o_ref,
               vbuf, lbuf, sbuf, sems):
        i = pl.program_id(0)
        g0 = i * rb
        ka = [kch_ref[g0 + r] for r in range(rb)]
        cums = [jnp.int32(0)]
        for r in range(rb):
            cums.append(cums[-1] + ka[r])
        T = cums[rb]

        def locate(c):
            r = jnp.int32(0)
            start = jnp.int32(0)
            for jj in range(1, rb):
                sel = c >= cums[jj]
                r = jnp.where(sel, jnp.int32(jj), r)
                start = jnp.where(sel, cums[jj], start)
            return r, c - start

        def chunk_dma(c, k):
            r, lc = locate(c)
            gc = cb_ref[g0 + r] + lc
            slot = jax.lax.rem(c, ring)
            return pltpu.make_async_copy(
                (val_hbm.at[gc], lidx_hbm.at[gc], soff_hbm.at[gc])[k],
                (vbuf.at[slot], lbuf.at[slot], sbuf.at[slot])[k],
                sems.at[slot, k])

        def start_chunk(c):
            for k in range(3):
                chunk_dma(c, k).start()

        dma_on = variant not in ("nodma",)
        pre = ring - 1
        if dma_on:
            for j in range(pre):
                @pl.when(j < T)
                def _(j=j):
                    start_chunk(jnp.int32(j))

        def win_read(srow):
            return x_ref[pl.ds(srow, 1), :]

        def body(c, acc):
            r, lc = locate(c)
            if dma_on:
                @pl.when(c + pre < T)
                def _():
                    start_chunk(c + pre)
            slot = jax.lax.rem(c, ring)
            if dma_on:
                for k in range(3):
                    chunk_dma(c, k).wait()
            acc = jnp.where(lc == 0, jnp.zeros((8, LANES), jnp.float32), acc)
            if variant == "dmaonly":
                acc = acc + vbuf[slot, 0].astype(jnp.float32)
            elif variant in ("base", "nodma", "ring8"):
                for k in range(KC):
                    word = lbuf[slot, k // 4]
                    lane = jnp.right_shift(word, 8 * (k % 4)) & 0x7F
                    win = jnp.concatenate(
                        [win_read(sbuf[slot, k * 8 + s]) for s in range(8)],
                        axis=0)
                    g = jnp.take_along_axis(win, lane, axis=1)
                    acc = acc + vbuf[slot, k].astype(jnp.float32) * g
            elif variant == "ws16":
                win = jnp.concatenate(
                    [win_read(sbuf[slot, s]) for s in range(8)], axis=0)
                for k in range(KC):
                    word = lbuf[slot, k // 4]
                    lane = jnp.right_shift(word, 8 * (k % 4)) & 0x7F
                    g = jnp.take_along_axis(win, lane, axis=1)
                    acc = acc + vbuf[slot, k].astype(jnp.float32) * g
            elif variant == "noslice":
                win = x_ref[0:8, :]
                for k in range(KC):
                    word = lbuf[slot, k // 4]
                    lane = jnp.right_shift(word, 8 * (k % 4)) & 0x7F
                    g = jnp.take_along_axis(win, lane, axis=1)
                    acc = acc + vbuf[slot, k].astype(jnp.float32) * g
            elif variant == "notake":
                for k in range(KC):
                    win = jnp.concatenate(
                        [win_read(sbuf[slot, k * 8 + s]) for s in range(8)],
                        axis=0)
                    acc = acc + vbuf[slot, k].astype(jnp.float32) * win
            elif variant == "sliceonly":
                for k in range(KC):
                    win = jnp.concatenate(
                        [win_read(sbuf[slot, k * 8 + s]) for s in range(8)],
                        axis=0)
                    acc = acc + win
            elif variant == "valonly":
                for k in range(KC):
                    acc = acc + vbuf[slot, k].astype(jnp.float32)
            else:
                raise ValueError(variant)

            @pl.when(lc == kch_ref[g0 + r] - 1)
            def _():
                o_ref[pl.ds(r * 8, 8), :] = acc
            return acc

        jax.lax.fori_loop(0, T, body, jnp.zeros((8, LANES), jnp.float32))

    return kernel


@functools.lru_cache(maxsize=64)
def make_call(variant, nbg, rb, nxp, ring=RING):
    kernel = make_kernel(variant, rb, nxp, ring)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nbg,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((nxp, LANES), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8 * rb, LANES), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ring, KC, 8, LANES), jnp.float32),
                pltpu.VMEM((ring, KC // 4, 8, LANES), jnp.int32),
                pltpu.SMEM((ring, 8 * KC), jnp.int32),
                pltpu.SemaphoreType.DMA((ring, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nbg * rb * 8, LANES), jnp.float32),
    )


def main():
    print("backend:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    nb = 272                      # ~A[1]@96^3 block count
    kch_u = 9                     # ~A[1] mean chunks/block
    nc = nb * kch_u
    nxp = 704
    kch = np.full(nb, kch_u, np.int32)
    cbase = (np.arange(nb) * kch_u).astype(np.int32)
    soff = rng.integers(0, nxp, (nc, 128)).astype(np.int32)
    lidx = rng.integers(0, 1 << 31, (nc, KC // 4, 8, LANES)).astype(np.int32)
    val = rng.standard_normal((nc, KC, 8, LANES)).astype(np.float32)
    x = rng.standard_normal((nxp, LANES)).astype(np.float32)

    kch_d = jnp.asarray(kch)
    cb_d = jnp.asarray(cbase)
    soff_d = jnp.asarray(soff)
    lidx_d = jnp.asarray(lidx)
    val_d = jnp.asarray(val)
    x_d = jnp.asarray(x)
    nbg = nb // RB

    jnp.ones((8, 128)).sum().block_until_ready()  # warm the relay

    slots = nc * KC
    res = {}
    for variant in ("base", "ws16", "noslice", "notake", "sliceonly",
                    "valonly", "dmaonly", "nodma", "ring8"):
        ring = 8 if variant == "ring8" else RING
        call = make_call(variant, nbg, RB, nxp, ring)

        def step(xv):
            y = call(kch_d, cb_d, soff_d, lidx_d, val_d, xv)
            # feed a slice of y back so timing loops chain (anti-DCE)
            return xv + 1e-20 * y[:nxp, :]

        t = timeit_fused(lambda _none, xv: step(xv), None, x_d, iters=30)
        res[variant] = t
        print(f"{variant:9s}: {t*1e3:7.3f} ms  "
              f"{t/nc*1e9:7.1f} ns/chunk  {t/slots*1e9:6.2f} ns/slot",
              flush=True)

    import json
    with open("/tmp/probe_routed_cost.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
