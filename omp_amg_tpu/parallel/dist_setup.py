"""Distributed (per-shard) structured AMG setup.

Completes SURVEY.md §2 #22: the *setup phase* itself runs sharded — no level
operator is ever materialized on a single device. Each level lives as
z-plane slabs (:class:`~omp_amg_tpu.parallel.slab.SlabDia`) across the 1D
mesh and the Galerkin product A_c = R A P is computed per shard by
lattice-comb probing (the same exact-algebra scheme as
:mod:`omp_amg_tpu.amg.comb_rap`), rebuilt from the slab primitives:

- the 3^d probe chains ``R (A (P v_t))`` run inside one jitted ``shard_map``
  per level, with plane halo exchanges as the only communication;
- probe vectors and assembly selectors are built from *global* coordinates
  (``axis_index`` offsets), so the result is bit-identical across shard
  counts — the determinism contract that replaces the reference's
  OpenMP race discipline (SURVEY.md §5.2);
- λmax per level is a distributed power iteration (``psum`` dots) with the
  same deterministic hash-seed as the single-device flavors;
- structure decisions (strong axes, level sizes, termination) stay on the
  host — O(ndiag) scalars per level, the host-orchestration contract of
  SURVEY.md §7.

Coarse levels below the slab-alignment/size thresholds are agglomerated:
their (tiny) operator is pulled to the host once and the remaining levels
are built by the host structured setup, replicated on every shard.
"""

from __future__ import annotations

from functools import partial
from itertools import product as iproduct
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..amg.comb_rap import coarse_offsets
from ..amg.params import AMGParams
from ..amg.pmis import hash01
from ..amg.structured import strong_axes_from_values
from ..sparse.formats import Dia
from .dist import DistHierarchy, DistLevel, pdot, pnorm
from .slab import (
    AXIS, SlabDia, SlabProlong, SlabRestrict, slab_halos, slab_op_spec,
    slab_prolong, slab_restrict, slab_spmv,
)


def _prod(t) -> int:
    return int(np.prod(t, dtype=np.int64)) if len(t) else 1


def _global_coords(coarse_dims, nc_local: int):
    """Per-axis GLOBAL coordinates of the local coarse slab rows (traced)."""
    d = len(coarse_dims)
    cplane = _prod(coarse_dims[1:])
    nzc_l = nc_local // cplane
    idx = jnp.arange(nc_local, dtype=jnp.int32)
    coords = [idx // cplane + lax.axis_index(AXIS) * nzc_l]
    for ax in range(1, d):
        stride = _prod(coarse_dims[ax + 1:])
        coords.append((idx // stride) % coarse_dims[ax])
    return coords


def _comb_rap_local(op: SlabDia, *, coarse_dims, axes):
    """Local coarse DIA planes of R A P (inside shard_map; comm = halos).

    Mirrors :func:`omp_amg_tpu.amg.comb_rap.comb_rap` exactly (period-3
    lattice combs separate every coarse row's couplings) but on slabs:
    probes and selectors use global coordinates, the chain uses the slab
    apply/transfer primitives. Also returns a validation residual of the
    radius-1 contract (max over shards via psum of the partial max).
    """
    dims = op.dims
    d = len(dims)
    dtype = op.data.dtype
    cplane = _prod(coarse_dims[1:])
    nzc_l = coarse_dims[0] // lax.axis_size(AXIS)
    nc_l = nzc_l * cplane

    sp = SlabProlong(fine_shape=dims, coarse_shape=coarse_dims,
                     coarsened=axes)
    sr = SlabRestrict(fine_shape=dims, coarse_shape=coarse_dims,
                      coarsened=axes)

    def chain(v):
        return slab_restrict(sr, slab_spmv(op, slab_prolong(sp, v)))

    coords = _global_coords(coarse_dims, nc_l)

    # ONE chain body lax.scan'ned over the 3^d comb phases + fori_loop
    # assembly — same compile-light structure as comb_rap._device_comb_fn
    # (the naive 3^d-times-inlined graph costs minutes of XLA compile per
    # level on a relay'd chip)
    tlist = np.array(list(iproduct(range(3), repeat=d)), np.int32)

    def chain_body(_, tvec):
        m = jnp.ones((nc_l,), bool)
        for ax in range(d):
            m = m & (coords[ax] % 3 == tvec[ax])
        return None, chain(m.astype(dtype))

    _, ws = lax.scan(chain_body, None, jnp.asarray(tlist))  # (3^d, nc_l)

    strides_c = [1] * d
    for k in range(d - 2, -1, -1):
        strides_c[k] = strides_c[k + 1] * coarse_dims[k + 1]
    rows, offs = [], []
    ntaps = 3 ** d
    for delta in iproduct((-1, 0, 1), repeat=d):
        if any(abs(dl) >= cd for dl, cd in zip(delta, coarse_dims)):
            continue
        tsel = jnp.zeros((nc_l,), jnp.int32)
        for ax in range(d):
            tsel = tsel * 3 + (coords[ax] + delta[ax]) % 3

        def body(i, row):
            return row + ws[i] * (tsel == i).astype(dtype)

        # pcast-to-varying: the carry accumulates device-varying ws, so the
        # initial zeros must carry the same vma type under shard_map's checker
        init = lax.pcast(jnp.zeros((nc_l,), dtype), AXIS, to="varying")
        rows.append(lax.fori_loop(0, ntaps, body, init))
        offs.append(sum(dl * st for dl, st in zip(delta, strides_c)))
    # small coarse grids alias distinct deltas onto interleaved/duplicate
    # flat offsets — pair rows to coarse_offsets() order with a STABLE sort
    order = np.argsort(offs, kind="stable")
    data_c = jnp.stack([rows[int(k)] for k in order])

    # radius-contract validation: one deterministic random probe
    gid = jnp.arange(nc_l, dtype=jnp.int32) + lax.axis_index(AXIS) * nc_l
    x = (hash01(gid) - 0.5).astype(dtype)
    offs_c = coarse_offsets(coarse_dims)
    chl, chr = slab_halos(offs_c, coarse_dims)
    cop = SlabDia(data=data_c, offsets=tuple(offs_c), dims=coarse_dims,
                  hl=chl, hr=chr)
    y1 = slab_spmv(cop, x)
    y2 = chain(x)
    err = lax.pmax(jnp.max(jnp.abs(y1 - y2)), AXIS)
    scale = lax.pmax(jnp.max(jnp.abs(y2)), AXIS)
    return data_c, err, scale


def _lmax_local(op: SlabDia, dinv, *, iters: int = 20):
    """Distributed power iteration for λmax(D⁻¹A) (same seed as
    smoothers.estimate_lmax / hierarchy._estimate_lmax_host)."""
    n_loc = dinv.shape[0]
    gid = jnp.arange(n_loc, dtype=jnp.int32) + lax.axis_index(AXIS) * n_loc
    v = hash01(gid).astype(dinv.dtype) - 0.5

    def body(_, v):
        w = dinv * slab_spmv(op, v)
        return w / pnorm(w)

    v = lax.fori_loop(0, iters, body, v / pnorm(v))
    w = dinv * slab_spmv(op, v)
    return pdot(v, w) / pdot(v, v)


def dist_structured_setup(a: Dia, grid, mesh, params: AMGParams = AMGParams(),
                          agg_rows_per_dev: int = 2048,
                          transport: str = "ppermute") -> DistHierarchy:
    """Build a sharded structured hierarchy without global materialization.

    ``a`` is the fine DIA operator (host or single-device; on a real pod the
    per-shard generator output device_puts directly into the same layout).
    Levels shard while the leading grid axis splits evenly across ``mesh``
    and the per-device block stays above ``agg_rows_per_dev``; the rest are
    agglomerated via the host structured setup and replicated.
    """
    if params.coarsening == "pmis":
        raise ValueError(
            "dist_structured_setup is the structured-coarsening path; "
            "PMIS hierarchies distribute via partition_hierarchy")
    ndev = mesh.devices.size
    dims = tuple(int(g) for g in grid)
    if _prod(dims) != a.n_rows:
        raise ValueError("grid does not match operator size")
    dtype = a.dtype
    offsets = list(a.offsets)
    sharding = NamedSharding(mesh, P(None, AXIS))
    data = jax.device_put(jnp.asarray(a.data), sharding)

    sh_levels = []  # (offsets, dims, data, dinv, lmax, axes)
    n = _prod(dims)
    while n > params.coarse_size and len(sh_levels) < params.max_levels - 1:
        if dims[0] % ndev != 0 or n // ndev < agg_rows_per_dev:
            break
        sums = jnp.sum(data, axis=1)
        counts = jnp.sum(data != 0, axis=1)
        means = np.asarray(sums / jnp.maximum(counts, 1), np.float64)
        axes = strong_axes_from_values(offsets, means, dims, params.theta)
        if not any(axes):
            break
        if axes[0] and dims[0] % (2 * ndev) != 0:
            break
        coarse_dims = tuple((dd + 1) // 2 if c else dd
                            for dd, c in zip(dims, axes))
        hl, hr = slab_halos(offsets, dims)

        op = SlabDia(data=data, offsets=tuple(offsets), dims=dims,
                     hl=hl, hr=hr)
        fn = jax.jit(jax.shard_map(
            partial(_comb_rap_local, coarse_dims=coarse_dims, axes=axes),
            mesh=mesh,
            in_specs=(slab_op_spec(op),),
            out_specs=(P(None, AXIS), P(), P()),
        ))
        data_c, err, scale = fn(op)
        if float(err) > 2e-4 * (float(scale) + 1e-30):
            raise ValueError(
                f"distributed comb RAP radius contract violated: {float(err)}")

        offs_c = coarse_offsets(coarse_dims)
        maxes = np.asarray(jnp.max(jnp.abs(data_c), axis=1))
        keep = [k for k in range(len(offs_c)) if maxes[k] > 0]
        offs_c = [offs_c[k] for k in keep]
        data_c = jax.device_put(data_c[np.asarray(keep, np.int64)], sharding)

        if params.smoother == "l1jacobi":
            dinv = 1.0 / jnp.sum(jnp.abs(data), axis=0)
        else:
            dinv = 1.0 / data[offsets.index(0)]
        lmax_fn = jax.jit(jax.shard_map(
            _lmax_local, mesh=mesh,
            in_specs=(slab_op_spec(op), P(AXIS)),
            out_specs=P(),
        ))
        lmax = lmax_fn(op, dinv).astype(dtype)
        sh_levels.append((list(offsets), dims, data, dinv.astype(dtype),
                          lmax, axes, coarse_dims, hl, hr))
        offsets, data, dims = offs_c, data_c, coarse_dims
        n = _prod(dims)

    # agglomerated tail: pull the (small) remaining operator once, finish
    # with the host structured setup, replicate those levels
    from ..amg.hierarchy import amg_setup
    from ..sparse.formats import PlaneDia, plane_to_dia

    import dataclasses

    a_tail = Dia(data=jnp.asarray(np.asarray(data)), offsets=tuple(offsets),
                 dims=dims)
    # the tail shares the user's level budget with the sharded prefix
    tail_params = dataclasses.replace(
        params, max_levels=max(2, params.max_levels - len(sh_levels)))
    tail = amg_setup(a_tail, tail_params, grid=dims)

    levels = []
    nsh = len(sh_levels)
    if nsh == 0:
        raise ValueError(
            "no level met the slab sharding constraints — use the "
            "single-device setup (amg_setup) for this problem/mesh")
    for l, (offs, dms, dat, dinv, lmax, axes, cdims, hl, hr) \
            in enumerate(sh_levels):
        trans = l + 1 == nsh
        levels.append(DistLevel(
            a=SlabDia(data=dat, offsets=tuple(offs), dims=dms, hl=hl, hr=hr,
                      transport=transport),
            dinv=dinv,
            p=SlabProlong(fine_shape=dms, coarse_shape=cdims, coarsened=axes,
                          slice_in=trans),
            r=SlabRestrict(fine_shape=dms, coarse_shape=cdims, coarsened=axes,
                           gather_out=trans),
            lmax=lmax, sharded=True, next_sharded=not trans,
            n_next=_prod(cdims),
        ))
    for l, lv in enumerate(tail.levels):
        a_l = lv.a
        if isinstance(a_l, PlaneDia):
            a_l = plane_to_dia(a_l)
        n_next = (tail.levels[l + 1].a.shape[0] if l + 1 < len(tail.levels)
                  else tail.coarse_a.shape[0])
        levels.append(DistLevel(
            a=a_l, dinv=lv.dinv, p=lv.p, r=lv.r, lmax=lv.lmax,
            sharded=False, next_sharded=False, n_next=int(n_next),
        ))
    return DistHierarchy(levels=tuple(levels), coarse_chol=tail.coarse_chol,
                         params=params)
