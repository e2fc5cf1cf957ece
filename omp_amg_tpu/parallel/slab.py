"""Z-slab structured distributed operators — the gather-free dist layer.

The reference parallelized CSR row loops with OpenMP threads (SURVEY.md §2
#21; the reference mount was empty, behavior pinned by BASELINE.json). For
*structured* hierarchies the TPU-native analog is better than row-sharded
ELL: every level is a DIA stencil on a tensor grid, so sharding the leading
grid axis (z-planes) over the 1D mesh makes every distributed primitive a
plane exchange:

- ``SlabDia``    — a level operator stored as global DIA planes
  ``(ndiag, n)`` sharded on rows; SpMV exchanges ``hl``/``hr`` boundary
  *planes* via non-circular ``ppermute`` (zeros beyond the global ends match
  the Dirichlet masked-zero invariant) and is otherwise the same shift+fma
  loop as the single-device DIA kernel — zero gathers anywhere.
- ``SlabProlong``/``SlabRestrict`` — tensor-product grid transfers applied
  slab-locally; only the z-axis needs one neighbor plane (exchanged after
  the within-plane axes are restricted, so the strip is coarse-plane sized).
- Interior/boundary row split lets XLA's latency-hiding scheduler overlap
  the ppermute strips with the interior fma work (the halo-overlap analog
  of the reference's compute-while-communicating absence — SURVEY.md §5.8).

All apply functions run INSIDE ``shard_map``; static geometry lives in the
frozen dataclass aux data, so the same objects double as their own
PartitionSpec carriers (they hold at most one array leaf).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

AXIS = "rows"  # the 1D mesh axis name (single definition; dist re-exports)


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


def _prod(t) -> int:
    return int(np.prod(t, dtype=np.int64)) if len(t) else 1


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SlabDia:
    """DIA operator sharded by z-plane slabs (global array, rows sharded)."""

    data: jax.Array                    # (ndiag, n) — P(None, AXIS)
    offsets: Tuple[int, ...] = _static()
    dims: Tuple[int, ...] = _static()  # GLOBAL grid extents (C order)
    hl: int = _static(default=0)       # left halo planes
    hr: int = _static(default=0)       # right halo planes
    # halo transport: "ppermute" (XLA collective) or "pallas" (Pallas
    # async remote copy over ICI — DMA-level overlap; requires the
    # enclosing shard_map to run with check_vma=False)
    transport: str = _static(default="ppermute")

    @property
    def plane(self) -> int:
        return _prod(self.dims[1:])

    @property
    def n_rows(self) -> int:
        return self.data.shape[1]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SlabProlong:
    """Tensor-product prolongation applied on z-slabs (no array leaves)."""

    fine_shape: Tuple[int, ...] = _static()
    coarse_shape: Tuple[int, ...] = _static()
    coarsened: Tuple[bool, ...] = _static()
    slice_in: bool = _static(default=False)  # input replicated: slice my window


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SlabRestrict:
    """Transpose transfer on z-slabs (no array leaves)."""

    fine_shape: Tuple[int, ...] = _static()
    coarse_shape: Tuple[int, ...] = _static()
    coarsened: Tuple[bool, ...] = _static()
    gather_out: bool = _static(default=False)  # all_gather the coarse slab


def slab_halos(offsets, dims) -> Tuple[int, int]:
    """(hl, hr) halo plane counts for a DIA offset set on ``dims``.

    Truncating division gives the MINIMAL plane halo: the in-plane remainder
    (|rem| < plane) may push a flat read one plane further, but only where
    the tap crosses a grid-row boundary — exactly where the masked-zero
    invariant guarantees the stored value is 0, so a zero pad covers it.
    """
    plane = _prod(dims[1:])
    pzs = [int(o / plane) for o in offsets] or [0]  # trunc toward zero
    return max(0, -min(pzs)), max(0, max(pzs))


def _exchange_planes(x: jax.Array, plane: int, hl: int, hr: int) -> jax.Array:
    """[left strips | x | right strips] via NON-circular ppermute.

    Devices with no source (global ends) receive zeros — exactly the
    Dirichlet contract of the masked-zero DIA invariant.
    """
    d = lax.axis_size(AXIS)
    parts = []
    if hl:
        strip = x[-hl * plane:]
        if d > 1:
            strip = lax.ppermute(strip, AXIS, [(i, i + 1) for i in range(d - 1)])
        else:
            strip = jnp.zeros_like(strip)
        parts.append(strip)
    parts.append(x)
    if hr:
        strip = x[: hr * plane]
        if d > 1:
            strip = lax.ppermute(strip, AXIS, [(i + 1, i) for i in range(d - 1)])
        else:
            strip = jnp.zeros_like(strip)
        parts.append(strip)
    return jnp.concatenate(parts) if len(parts) > 1 else x


def _remote_halo_kernel(x_ref, left_ref, right_ref, *sems, nl, nr):
    """Bidirectional neighbor exchange via async remote DMA (one kernel).

    Circular at the DMA level (uniform SPMD — no conditional semaphores);
    the wrap-around strips are zero-masked by the caller to restore the
    Dirichlet/non-circular contract. Pattern follows the public Pallas TPU
    distributed guide (right-permute with send/recv DMA semaphores).
    """
    my = lax.axis_index(AXIS)
    d = lax.axis_size(AXIS)
    right_nb = lax.rem(my + 1, d)
    left_nb = lax.rem(my + d - 1, d)
    n = x_ref.shape[0]
    ops = []
    si = 0
    if nl:
        # my LAST nl rows become the RIGHT neighbor's left halo
        ops.append(pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(n - nl, nl)], dst_ref=left_ref,
            send_sem=sems[si], recv_sem=sems[si + 1], device_id=(right_nb,),
            device_id_type=pltpu.DeviceIdType.MESH))
        si += 2
    if nr:
        # my FIRST nr rows become the LEFT neighbor's right halo
        ops.append(pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(0, nr)], dst_ref=right_ref,
            send_sem=sems[si], recv_sem=sems[si + 1], device_id=(left_nb,),
            device_id_type=pltpu.DeviceIdType.MESH))
    for o in ops:
        o.start()
    for o in ops:
        o.wait()


def _exchange_planes_remote(x: jax.Array, plane: int, hl: int,
                            hr: int) -> jax.Array:
    """Pallas async-remote-copy variant of :func:`_exchange_planes`."""
    d = lax.axis_size(AXIS)
    if d == 1 or (hl == 0 and hr == 0):
        return _exchange_planes(x, plane, hl, hr)
    nl, nr = hl * plane, hr * plane
    interpret = (pltpu.InterpretParams()
                 if jax.default_backend() != "tpu" else False)
    kernel = functools.partial(_remote_halo_kernel, nl=nl, nr=nr)
    nsem = 2 * ((nl > 0) + (nr > 0))
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[jax.ShapeDtypeStruct((max(nl, 1),), x.dtype),
                   jax.ShapeDtypeStruct((max(nr, 1),), x.dtype)],
        scratch_shapes=[pltpu.SemaphoreType.DMA] * nsem,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    left, right = call(x)
    i = lax.axis_index(AXIS)
    parts = []
    if nl:
        parts.append(jnp.where(i == 0, 0.0, left).astype(x.dtype))
    parts.append(x)
    if nr:
        parts.append(jnp.where(i == d - 1, 0.0, right).astype(x.dtype))
    return jnp.concatenate(parts)


def slab_spmv(op: SlabDia, x_local: jax.Array) -> jax.Array:
    """y_local = (A @ x)_local with plane halo exchange (inside shard_map).

    Interior rows (planes that never reach a halo) are computed from the
    local block only, so their fma chain has no data dependence on the
    halo strips — XLA overlaps communication with this compute.
    """
    offs = op.offsets
    plane = op.plane
    n_loc = x_local.shape[0]
    hl, hr = op.hl, op.hr
    data = op.data
    if max(hl, hr) * plane > n_loc:
        # slab thinner than its halo (tiny coarse levels): full exchange
        return _slab_spmv_full(op, x_local)
    exchange = (_exchange_planes_remote if op.transport == "pallas"
                else _exchange_planes)
    pad = plane  # covers the within-plane (lane/row) part of any offset

    def rows(r0: int, nrows: int, xsrc, xbase: int):
        y = jnp.zeros((nrows,), x_local.dtype)
        for k, off in enumerate(offs):
            y = y + data[k, r0 : r0 + nrows] * lax.dynamic_slice(
                xsrc, (xbase + r0 + off,), (nrows,))
        return y

    nb_lo, nb_hi = hl * plane, hr * plane
    n_int = n_loc - nb_lo - nb_hi
    if (hl == 0 and hr == 0) or n_int <= 0:
        xw = exchange(x_local, plane, hl, hr)
        xwp = jnp.pad(xw, (pad, pad))
        return rows(0, n_loc, xwp, nb_lo + pad)

    xw = exchange(x_local, plane, hl, hr)
    xwp = jnp.pad(xw, (pad, pad))
    base = nb_lo + pad
    # interior: reads stay within the local block (out-of-block flat reads
    # only occur where the masked-zero invariant guarantees data == 0)
    xip = jnp.pad(x_local, (pad, pad))
    y_lo = rows(0, nb_lo, xwp, base)
    y_int = rows(nb_lo, n_int, xip, pad)
    y_hi = rows(nb_lo + n_int, nb_hi, xwp, base)
    return jnp.concatenate([y_lo, y_int, y_hi])


def _slab_spmv_full(op: SlabDia, x_local: jax.Array) -> jax.Array:
    """Fallback when the halo is wider than a slab: reconstruct the full
    vector with a psum-scatter, then apply the local rows against it."""
    n_loc = x_local.shape[0]
    d = lax.axis_size(AXIS)
    i = lax.axis_index(AXIS)
    xg = lax.psum(
        lax.dynamic_update_slice(jnp.zeros((d * n_loc,), x_local.dtype),
                                 x_local, (i * n_loc,)), AXIS)
    offs = op.offsets
    pad = max([abs(o) for o in offs] + [1])
    xgp = jnp.pad(xg, (pad, pad))
    y = jnp.zeros((n_loc,), x_local.dtype)
    for k, off in enumerate(offs):
        y = y + op.data[k] * lax.dynamic_slice(
            xgp, (i * n_loc + pad + off,), (n_loc,))
    return y


def slab_prolong(p: SlabProlong, xc: jax.Array) -> jax.Array:
    """x_fine_local = P @ x_coarse (coarse input local slab, or replicated
    full vector when ``slice_in``). z first (one coarse-plane halo), then the
    fully-local within-plane axes."""
    from ..amg.structured import (
        _axis_mat_apply, _axis_restrict_mat, _prolong_axis,
        _use_matmul_transfers,
    )

    cs, fs, cz = p.coarse_shape, p.fine_shape, p.coarsened
    cplane = _prod(cs[1:])
    d = lax.axis_size(AXIS)

    if p.slice_in:
        nzc_l = cs[0] // d
        i = lax.axis_index(AXIS)
        if cz[0]:
            xfull = jnp.pad(xc, (0, cplane))  # zero halo beyond the global end
            v = lax.dynamic_slice(xfull, (i * nzc_l * cplane,),
                                  ((nzc_l + 1) * cplane,))
            v = v.reshape(nzc_l + 1, *cs[1:])
        else:
            v = lax.dynamic_slice(xc, (i * nzc_l * cplane,),
                                  (nzc_l * cplane,)).reshape(nzc_l, *cs[1:])
    else:
        nzc_l = xc.shape[0] // cplane
        v = xc.reshape(nzc_l, *cs[1:])
        if cz[0]:
            # right halo: my fine plane 2j+1 at the slab top needs c(j+1)
            strip = v[0].reshape(-1)
            if d > 1:
                strip = lax.ppermute(strip, AXIS,
                                     [(i + 1, i) for i in range(d - 1)])
            else:
                strip = jnp.zeros_like(strip)
            v = jnp.concatenate([v, strip.reshape(1, *cs[1:])], axis=0)
        else:
            nzc_l = v.shape[0]

    if cz[0]:
        a = v[:nzc_l]
        b = v[1 : nzc_l + 1]
        x = jnp.stack([a, 0.5 * (a + b)], axis=1).reshape(2 * nzc_l, *cs[1:])
    else:
        x = v[:nzc_l] if p.slice_in else v
    for ax in range(1, len(fs)):
        if cz[ax]:
            if _use_matmul_transfers(len(fs)):
                m = jnp.asarray(_axis_restrict_mat(fs[ax], cs[ax]).T, x.dtype)
                x = _axis_mat_apply(x, ax, m)
            else:
                x = _prolong_axis(x, ax, fs[ax])
    return x.reshape(-1)


def slab_restrict(r: SlabRestrict, xf: jax.Array) -> jax.Array:
    """x_coarse = Pᵀ @ x_fine_local. Within-plane axes first (so the one
    exchanged z-strip is already coarse-plane sized), then z with a left
    neighbor plane. ``gather_out`` returns the full replicated coarse
    vector (shard→replicated agglomeration transition)."""
    from ..amg.structured import (
        _axis_mat_apply, _axis_restrict_mat, _restrict_axis,
        _use_matmul_transfers,
    )

    fs, cs, cz = r.fine_shape, r.coarse_shape, r.coarsened
    fplane = _prod(fs[1:])
    d = lax.axis_size(AXIS)
    nzf_l = xf.shape[0] // fplane
    x = xf.reshape(nzf_l, *fs[1:])
    for ax in range(1, len(fs)):
        if cz[ax]:
            if _use_matmul_transfers(len(fs)):
                m = jnp.asarray(_axis_restrict_mat(fs[ax], cs[ax]), x.dtype)
                x = _axis_mat_apply(x, ax, m)
            else:
                x = _restrict_axis(x, ax, cs[ax])

    if cz[0]:
        strip = x[-1].reshape(-1)
        if d > 1:
            strip = lax.ppermute(strip, AXIS,
                                 [(i, i + 1) for i in range(d - 1)])
        else:
            strip = jnp.zeros_like(strip)
        ext = jnp.concatenate([strip.reshape(1, *x.shape[1:]), x], axis=0)
        nzc_l = nzf_l // 2
        even = ext[1::2]                   # f(2j)
        lft = ext[0::2][:nzc_l]            # f(2j-1)
        rgt = ext[2::2]                    # f(2j+1)
        x = even + 0.5 * (lft + rgt)
    out = x.reshape(-1)
    if r.gather_out:
        # psum-scatter gather: infers as replicated under shard_map's VMA
        # check (all_gather does not), matching the ELL transition path
        d = lax.axis_size(AXIS)
        i = lax.axis_index(AXIS)
        full = lax.dynamic_update_slice(
            jnp.zeros((d * out.shape[0],), out.dtype), out,
            (i * out.shape[0],))
        out = lax.psum(full, AXIS)
    return out


def slab_op_spec(op):
    """PartitionSpec pytree matching ``op``'s array leaves."""
    from jax.sharding import PartitionSpec as P

    if isinstance(op, SlabDia):
        return SlabDia(data=P(None, AXIS), offsets=op.offsets, dims=op.dims,
                       hl=op.hl, hr=op.hr, transport=op.transport)
    return op  # transfers carry no array leaves
