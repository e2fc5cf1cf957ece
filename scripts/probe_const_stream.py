"""Probe: streaming-pattern variants for the ConstDia kernel.

Finding to beat (2026-08-19): the v2 blocked ring kernel saturates at
~195 GB/s combined x+y even with a 1-tap body — the pattern, not the math,
is the limit. Variants probed here:

- P1 deeper prefetch (ring 6, dma(i+3), wait(i+1))
- P3 self-contained slots: each slot DMAs its block PLUS a (pr+8)-row halo
  on both sides, so compute i waits only on its own slot (issued 3 steps
  ahead) and never touches neighbor slots.

Run: python scripts/probe_const_stream.py  (claims the TPU; background it)
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel_p3(x_hbm, masks_ref, o_ref, xbuf, sems, *, plan, pr, nb, ring,
               nz, depth):
    """Self-contained halo slots; wait only own slot; prefetch ``depth``."""
    i = pl.program_id(0)
    nsteps = nz // nb
    brows = nb * pr
    halo = pr + 8
    srows = brows + 2 * halo

    def dma(p):
        slot = jax.lax.rem(p + ring, ring)
        start = p * brows - halo
        first = p == 0
        last = p >= nsteps - 1

        @pl.when(first)
        def _():
            # skip the nonexistent low halo (rows stay zero-init)
            rows = brows + halo if nsteps > 1 else brows
            pltpu.make_async_copy(x_hbm.at[pl.ds(0, rows), :],
                                  xbuf.at[slot, halo : halo + rows, :],
                                  sems.at[slot]).start()

        @pl.when(last & ~first)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds((nsteps - 1) * brows - halo, halo + brows), :],
                xbuf.at[slot, : halo + brows, :], sems.at[slot]).start()

        @pl.when(~first & ~last)
        def _():
            pltpu.make_async_copy(x_hbm.at[pl.ds(start, srows), :],
                                  xbuf.at[slot], sems.at[slot]).start()

    def wait(p):
        slot = jax.lax.rem(p + ring, ring)
        sems_ref = sems.at[slot]
        first = p == 0
        last = p >= nsteps - 1

        @pl.when(first)
        def _():
            rows = brows + halo if nsteps > 1 else brows
            pltpu.make_async_copy(x_hbm.at[pl.ds(0, rows), :],
                                  xbuf.at[slot, halo : halo + rows, :],
                                  sems_ref).wait()

        @pl.when(last & ~first)
        def _():
            pltpu.make_async_copy(
                x_hbm.at[pl.ds((p) * brows - halo, halo + brows), :],
                xbuf.at[slot, : halo + brows, :], sems_ref).wait()

        @pl.when(~first & ~last)
        def _():
            pltpu.make_async_copy(x_hbm.at[pl.ds(p * brows - halo, srows), :],
                                  xbuf.at[slot], sems_ref).wait()

    @pl.when(i == 0)
    def _():
        xbuf[...] = jnp.zeros_like(xbuf)
        for p in range(min(depth, nz // nb)):
            dma(jnp.int32(p))
        wait(jnp.int32(0))

    @pl.when(i > 0)
    def _():
        @pl.when(i + depth - 1 < nsteps)
        def _():
            dma(i + depth - 1)

        wait(i)

    slot_cur = jax.lax.rem(i + ring, ring)
    rows_cache = {}
    view_cache = {}

    def rows(off):
        if off not in rows_cache:
            rows_cache[off] = xbuf[slot_cur, halo + off : halo + off + pr, :]
        return rows_cache[off]

    def masked_view(off, r, mk):
        key = (off, r, mk)
        if key in view_cache:
            return view_cache[key]
        if (off, r, -1) in view_cache:
            a = view_cache[(off, r, -1)]
        else:
            a = rows(off)
            if r:
                b = rows(off + 1)
                a = jnp.concatenate([a[:, r:], b[:, :r]], axis=1)
            view_cache[(off, r, -1)] = a
        out = a * masks_ref[mk] if mk >= 0 else a
        view_cache[key] = out
        return out

    for j in range(nb):
        acc = jnp.zeros((pr, LANES), jnp.float32)
        for pz, q, r, mk, c in plan:
            off = (j + pz) * pr + q
            v = masked_view(off, r, mk)
            if pz == 0:
                acc = acc + jnp.float32(c) * v
            else:
                g = i * nb + j + pz
                ok = (g >= 0) & (g < nz)
                acc = acc + jnp.where(ok, jnp.float32(c), jnp.float32(0)) * v
        o_ref[j * pr : (j + 1) * pr, :] = acc


@functools.lru_cache(maxsize=64)
def make_p3(nz, pr, nb, plan, nmask, ring=6, depth=4, interpret=False):
    nsteps = nz // nb
    srows = nb * pr + 2 * (pr + 8)
    kernel = functools.partial(_kernel_p3, plan=plan, pr=pr, nb=nb,
                               ring=ring, nz=nz, depth=depth)
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((nmask, pr, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb * pr, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz * pr, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ring, srows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((ring,)),
        ],
        interpret=interpret,
    )


def main():
    import omp_amg_tpu as amg
    from omp_amg_tpu.utils.timers import timeit_fused
    from omp_amg_tpu.ops.pallas_const import (
        _make_const_call, _const_plan,
    )
    from omp_amg_tpu.ops.spmv import spmv_dia

    n = int(os.environ.get("PROBE_N", "256"))
    a = amg.poisson3d_7pt(n, backend="device")
    b = amg.default_rhs(a, "random", seed=0)
    jax.block_until_ready(a.data)
    cd = amg.to_const_dia(a)
    nnz = sum(a.n_rows - abs(o) for o in a.offsets)
    pr = n * n // 128
    full = tuple(_const_plan(cd))
    m = cd.n_rows // 128
    x2 = b.reshape(m, 128)
    y_ref = jax.jit(spmv_dia)(a, b).reshape(m, 128)

    def bench(label, call):
        y = call(x2, cd.masks)
        err = float(jnp.max(jnp.abs(y.reshape(m, 128) - y_ref)))
        f = lambda mm, yy, _c=call: _c(yy, mm).reshape(m, 128)
        sec = timeit_fused(f, cd.masks, x2, iters=50)
        print(f"{label}: {sec*1e3:.3f} ms = {nnz/sec/1e9:6.1f} Gnnz/s "
              f"({2*cd.n_rows*4/sec/1e9:.0f} GB/s xy) maxdiff={err}",
              flush=True)

    for nb in (2, 4):
        for ring, depth in ((6, 4), (8, 6)):
            try:
                bench(f"P3 nb={nb} ring={ring} depth={depth}",
                      make_p3(n, pr, nb, full, int(cd.masks.shape[0]),
                              ring=ring, depth=depth))
            except Exception as e:
                print(f"P3 nb={nb} r{ring} d{depth}: FAIL {str(e)[:150]}",
                      flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
