"""Certified distributed solve: df64 iterative refinement over the mesh.

Closes the round-3 gap (VERDICT #3 missing): ``AMGSolver(mesh=…).solve()``
previously returned an uncertified f32 residual because the f64 outer loop
was host-side. Here the defect-correction outer runs with DEVICE-resident
double-float32 residuals (ops/df64 error-free transforms), evaluated
shard-locally inside ``shard_map`` with the same halo exchanges as the f32
solve and reduced with one psum — the distributed analog of
``solvers.ir.solve_ir_device``. The only per-outer host traffic is one
scalar norm.

The df64 fine-level SpMV mirrors :func:`..parallel.dist.dist_spmv` for the
fine-operator families (z-slab DIA, halo/gather ELL); it runs once per
outer iteration (2–3 per solve), so it takes the simple gather/slice
formulations rather than the Pallas kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.df64 import (
    df_add, df_from_f64, df_norm2, df_mul_f32, two_prod,
)
from ..solvers.ir import IRResult
from .dist import (
    DistHierarchy, DistOp, _op_spec, dist_specs, halo_exchange,
    make_dist_solver,
)
from .slab import (
    AXIS, SlabDia, _exchange_planes,
)


def _df_slab_spmv(op: SlabDia, xh, xl):
    """df64 y = A·x for a z-slab DIA operator (inside shard_map).

    Plane halos are exchanged for BOTH df components; taps accumulate via
    Dekker two-prod. Uses the plain ppermute transport + full-row slices
    (no interior split) — this runs once per IR outer, not per V-cycle."""
    plane = op.plane
    n_loc = xh.shape[0]
    hl, hr = op.hl, op.hr
    if max(hl, hr) * plane > n_loc:
        # slab thinner than its halo: reconstruct the full vector (psum
        # scatter, as _slab_spmv_full) for both components
        d = lax.axis_size(AXIS)
        i = lax.axis_index(AXIS)

        def full(v):
            return lax.psum(
                lax.dynamic_update_slice(jnp.zeros((d * n_loc,), v.dtype),
                                         v, (i * n_loc,)), AXIS)

        xgh, xgl = full(xh), full(xl)
        pad = max([abs(o) for o in op.offsets] + [1])
        xghp = jnp.pad(xgh, (pad, pad))
        xglp = jnp.pad(xgl, (pad, pad))
        yh = jnp.zeros((n_loc,), xh.dtype)
        yl = jnp.zeros_like(yh)
        for k, off in enumerate(op.offsets):
            a = op.data[k]
            sh = lax.dynamic_slice(xghp, (i * n_loc + pad + off,), (n_loc,))
            sl = lax.dynamic_slice(xglp, (i * n_loc + pad + off,), (n_loc,))
            p, e = two_prod(a, sh)
            e = e + a * sl
            yh, yl = df_add(yh, yl, p, e)
        return yh, yl

    xwh = _exchange_planes(xh, plane, hl, hr)
    xwl = _exchange_planes(xl, plane, hl, hr)
    pad = plane
    xwhp = jnp.pad(xwh, (pad, pad))
    xwlp = jnp.pad(xwl, (pad, pad))
    base = hl * plane + pad
    yh = jnp.zeros((n_loc,), xh.dtype)
    yl = jnp.zeros_like(yh)
    for k, off in enumerate(op.offsets):
        a = op.data[k]
        sh = lax.dynamic_slice(xwhp, (base + off,), (n_loc,))
        sl = lax.dynamic_slice(xwlp, (base + off,), (n_loc,))
        p, e = two_prod(a, sh)
        e = e + a * sl
        yh, yl = df_add(yh, yl, p, e)
    return yh, yl


def _df_ell_rowsum(val, col, xwh, xwl):
    yh = jnp.zeros((val.shape[0],), xwh.dtype)
    yl = jnp.zeros_like(yh)
    for k in range(val.shape[1]):
        a = val[:, k]
        sh = jnp.take(xwh, col[:, k], axis=0)
        sl = jnp.take(xwl, col[:, k], axis=0)
        p, e = two_prod(a, sh)
        e = e + a * sl
        yh, yl = df_add(yh, yl, p, e)
    return yh, yl


def dist_df_spmv(op, xh, xl):
    """df64 fine-level SpMV, polymorphic like dist.dist_spmv."""
    if isinstance(op, SlabDia):
        return _df_slab_spmv(op, xh, xl)
    if isinstance(op, DistOp):
        if op.mode == "halo":
            xwh = halo_exchange(xh, op.halo)
            xwl = halo_exchange(xl, op.halo)
            return _df_ell_rowsum(op.val, op.col, xwh, xwl)
        if op.mode == "gather":
            xwh = lax.all_gather(xh, AXIS, tiled=True)[: op.n_in_real]
            xwl = lax.all_gather(xl, AXIS, tiled=True)[: op.n_in_real]
            return _df_ell_rowsum(op.val, op.col, xwh, xwl)
        if op.mode == "replicated" and op.col.shape[0] == xh.shape[0]:
            # fully replicated fine level (small hierarchy): x is the full
            # vector on every shard, columns are global — plain local rowsum
            return _df_ell_rowsum(op.val, op.col, xh, xl)
    raise TypeError(f"df64 SpMV unsupported for fine operator {type(op)}")


def _residual_local(a_op, bh, bl, xh, xl, replicated=False):
    """One shard-local IR refresh: r = b − A·x (df64), psum norm, unit r.

    ``replicated=True``: the fine level (hence b/x) is full-length on every
    shard — the psum'd norm² counts each entry ndev times and must be
    rescaled (this norm is compared against the HOST bnorm, so the
    inflation does not cancel the way the inner PCG's ratios do)."""
    ah, al = dist_df_spmv(a_op, xh, xl)
    rh, rl = df_add(bh, bl, -ah, -al)
    rn2 = lax.psum(df_norm2(rh, rl), AXIS)
    if replicated:
        rn2 = rn2 / lax.axis_size(AXIS)
    rnorm = jnp.sqrt(jnp.maximum(rn2, 0.0))
    safe = jnp.where(rnorm == 0, 1.0, rnorm)
    return rh / safe, rnorm


def supports_df64(dh: DistHierarchy) -> bool:
    """True when the fine operator family has a df64 distributed SpMV."""
    a0 = dh.levels[0].a
    if isinstance(a0, SlabDia):
        return True
    if not isinstance(a0, DistOp):
        return False
    return a0.mode in ("halo", "gather") or (
        a0.mode == "replicated" and not dh.levels[0].sharded)


def make_dist_ir_solver(mesh, dh: DistHierarchy, tol: float = 1e-8,
                        inner_tol: float = 1e-6, maxiter: int = 200,
                        max_outer: int = 8, variant: str = "standard"):
    """Build the certified distributed solver: (dh, b_f64_padded) → IRResult.

    ``b`` is the padded host f64 right-hand side; it is split exactly into
    (hi, lo) f32 shards. Returns IRResult with x as the padded host f64
    solution (hi + lo pulled once at the end)."""
    sharded0 = bool(dh.levels[0].sharded)
    a_spec = _op_spec(dh.levels[0].a, sharded0)
    inner = make_dist_solver(mesh, dh, tol=inner_tol, maxiter=maxiter,
                             variant=variant)
    vspec = P(AXIS) if sharded0 else P()
    vec = NamedSharding(mesh, vspec)

    @jax.jit
    def residual(dh_in, bh, bl, xh, xl):
        fn = jax.shard_map(partial(_residual_local,
                                   replicated=not sharded0),
                           mesh=mesh,
                           in_specs=(a_spec,) + (vspec,) * 4,
                           out_specs=(vspec, P()),
                           check_vma=False)
        return fn(dh_in.levels[0].a, bh, bl, xh, xl)

    @jax.jit
    def accumulate(xh, xl, e, s):
        ph, pl_ = df_mul_f32(s, jnp.zeros_like(s), e)
        return df_add(xh, xl, ph, pl_)

    def solve(dh_in, b) -> IRResult:
        b = np.asarray(b, np.float64)
        bh_np, bl_np = df_from_f64(b)
        bh = jax.device_put(bh_np, vec)
        bl = jax.device_put(bl_np, vec)
        bnorm = float(np.linalg.norm(b))
        if bnorm == 0:
            return IRResult(np.zeros_like(b), 0, [], 0.0)
        xh = jax.device_put(np.zeros_like(bh_np), vec)
        xl = jax.device_put(np.zeros_like(bh_np), vec)
        inner_iters = []
        rel = 1.0
        for outer in range(max_outer + 1):
            r_unit, rnorm = residual(dh_in, bh, bl, xh, xl)
            rel = float(rnorm) / bnorm
            if rel <= tol or outer == max_outer:
                break
            tau = max(inner_tol, 0.3 * tol / rel)
            e, iters, _ = inner(dh_in, r_unit, tau)
            inner_iters.append(int(iters))
            xh, xl = accumulate(xh, xl, e, rnorm)
        x = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
        return IRResult(x, len(inner_iters), inner_iters, rel)

    return solve
