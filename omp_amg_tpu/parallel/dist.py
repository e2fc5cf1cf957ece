"""Distributed (row-sharded) operators and solver — SURVEY.md §2 #21–22, §5.8.

The reference's only parallelism was OpenMP threads over CSR rows. The
TPU-native equivalent is SPMD row-block sharding of every hierarchy level
over a 1D device mesh, with three operator modes (decided per level at
partition time, host-side):

- ``halo``: banded operator; each shard's column window is covered by its own
  block plus ≤ one strip from each neighbor, exchanged with ``ppermute``
  (nearest-neighbor ICI traffic). ELL columns are pre-localized to the
  window, so the device step is exchange → gather → rowsum.
- ``gather``: general fallback — ``all_gather`` the input vector.
- ``replicated``: coarse levels too small to shard (agglomeration,
  SURVEY.md §2 note): all shards hold the full operator and compute
  identically; the shard→replicated transition restricts via a local
  Pᵀ-scatter followed by one ``psum``.

Global dots/norms are ``psum`` reductions — the only global sync points in
PCG (SURVEY.md §4.3). Everything runs inside one jitted ``shard_map``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..amg.structured import (
    GridProlong, GridRestrict, apply_prolong, apply_restrict,
)
from ..sparse.formats import Dia
from .slab import (
    AXIS, SlabDia, SlabProlong, SlabRestrict, slab_op_spec, slab_prolong,
    slab_restrict, slab_spmv,
)


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DistOp:
    """One row-sharded ELL operator (global arrays; leading axis sharded)."""

    col: jax.Array   # (ndev*m_out, K) int32 — window-local ("halo") or global cols
    val: jax.Array   # (ndev*m_out, K)
    mode: str = _static()        # "halo" | "gather" | "replicated"
    halo: int = _static()        # strip width (halo mode)
    m_in: int = _static()        # input rows per shard (padded)
    n_in: int = _static()        # global (padded) input length
    n_in_real: int = _static()   # unpadded input length (for gather/replicated cols)
    # comm/compute overlap split (halo mode): leading/trailing row counts per
    # shard that reference halo columns; interior rows touch only the local
    # block, so XLA's latency-hiding scheduler computes them while the
    # ppermute strips are in flight (BASELINE "overlapped halo exchange").
    bnd_lo: int = _static(default=0)
    bnd_hi: int = _static(default=0)
    # routed-ELL plan over the shard's local window (halo mode): per-shard
    # compact-chunk plans (sparse/routed.py) padded to a common chunk count
    # and stacked on the sharded leading axis, so the local slice inside
    # shard_map IS a RoutedEll — the PMIS path's sharded SpMV then runs
    # the Pallas kernel instead of the gather formulation (XLA gather ≈
    # 0.1 Gelem/s on chip). Per-shard cbase/kch are data, so shards keep
    # their own chunk layouts; only the array extents are common.
    rt_val4: jax.Array | None = None    # (ndev*NC, KC, 8, 128)
    rt_lidx4: jax.Array | None = None   # (ndev*NC, KC//4, 8, 128) int32
    rt_soff: jax.Array | None = None    # (ndev*NC, 128) int32
    rt_cbase: jax.Array | None = None   # (ndev, NBP) int32
    rt_kch: jax.Array | None = None     # (ndev, NBP) int32
    rt_sbase: jax.Array | None = None   # (ndev, NBP) int32
    rt_span: int = _static(default=0)
    rt_nxp: int = _static(default=0)
    rt_kmax: int = _static(default=0)
    rt_resident: bool = _static(default=False)


def halo_exchange(x_local: jax.Array, h: int) -> jax.Array:
    """Return [left strip | x_local | right strip] via nearest-neighbor ppermute."""
    if h == 0:
        return x_local
    d = lax.axis_size(AXIS)
    if d == 1:
        z = jnp.zeros((h,), x_local.dtype)
        return jnp.concatenate([z, x_local, z])
    fwd = [(i, (i + 1) % d) for i in range(d)]
    bwd = [(i, (i - 1) % d) for i in range(d)]
    left = lax.ppermute(x_local[-h:], AXIS, fwd)    # from left neighbor
    right = lax.ppermute(x_local[:h], AXIS, bwd)    # from right neighbor
    return jnp.concatenate([left, x_local, right])


def dist_spmv(op, x_local: jax.Array) -> jax.Array:
    """y_local = (A @ x)_local — called inside shard_map.

    Polymorphic over the operator families: z-slab structured ops
    (:mod:`.slab` — gather-free plane exchanges), replicated structured ops
    (plain DIA / grid transfers on full vectors), and row-sharded ELL
    (``DistOp`` — the general-sparsity PMIS path).
    """
    if isinstance(op, SlabDia):
        return slab_spmv(op, x_local)
    if isinstance(op, SlabProlong):
        return slab_prolong(op, x_local)
    if isinstance(op, SlabRestrict):
        return slab_restrict(op, x_local)
    if isinstance(op, Dia):  # replicated coarse level
        from ..amg.comb_rap import dia_apply

        return dia_apply(op.offsets, op.data, x_local, jnp)
    if isinstance(op, GridProlong):
        return apply_prolong(op, x_local)
    if isinstance(op, GridRestrict):
        return apply_restrict(op, x_local)
    if op.mode == "halo":
        if op.rt_val4 is not None:
            # routed-ELL local-window kernel: the sharded general-sparsity
            # fast path (plans were built per shard over [left strip |
            # block | right strip] columns)
            from ..sparse.routed import RoutedEll
            from ..ops.pallas_routed import spmv_routed, spmv_routed_xla

            xw = halo_exchange(x_local, op.halo)
            m_out = op.col.shape[0]   # local rows (shard_map local view)
            rt = RoutedEll(
                val4=op.rt_val4, lidx4=op.rt_lidx4, soff=op.rt_soff,
                cbase=op.rt_cbase.reshape(1, -1),
                kch=op.rt_kch.reshape(1, -1),
                sbase=op.rt_sbase.reshape(1, -1),
                n_rows=m_out,
                n_cols=x_local.shape[0] + 2 * op.halo,
                span=op.rt_span, nxp=op.rt_nxp,
                nnz=0, kmax=op.rt_kmax, resident=op.rt_resident)
            fn = (spmv_routed if jax.default_backend() == "tpu"
                  else spmv_routed_xla)
            return fn(rt, xw)
        lo, hi = op.bnd_lo, op.bnd_hi
        xw = halo_exchange(x_local, op.halo)
        if lo or hi:
            # interior rows only touch the local block → their compute has no
            # data dependence on the ppermute strips and overlaps with them
            m_loc = x_local.shape[0]
            n_int = op.col.shape[0] - lo - hi
            if n_int > 0:
                int_col = jnp.clip(op.col[lo : lo + n_int] - op.halo,
                                   0, m_loc - 1)
                y_int = jnp.sum(op.val[lo : lo + n_int]
                                * jnp.take(x_local, int_col, axis=0), axis=1)
                y_lo = jnp.sum(op.val[:lo] * jnp.take(xw, op.col[:lo], axis=0),
                               axis=1)
                y_hi = jnp.sum(op.val[lo + n_int :]
                               * jnp.take(xw, op.col[lo + n_int :], axis=0),
                               axis=1)
                return jnp.concatenate([y_lo, y_int, y_hi])
        return jnp.sum(op.val * jnp.take(xw, op.col, axis=0), axis=1)
    elif op.mode == "gather":
        xg = lax.all_gather(x_local, AXIS, tiled=True)
        xw = xg[: op.n_in_real]
    elif op.mode == "replicated":
        xw = x_local  # caller passes the full (replicated) vector
    else:
        raise ValueError(op.mode)
    return jnp.sum(op.val * jnp.take(xw, op.col, axis=0), axis=1)


def restrict_to_replicated(p_op: DistOp, r_local: jax.Array, nc: int) -> jax.Array:
    """r_c = Pᵀ r at a shard→replicated transition.

    ``p_op`` is P sharded by *fine* rows with GLOBAL coarse column indices
    (mode "gather" is reused as the storage convention). Local scatter-add
    then one psum; result replicated on all shards.
    """
    contrib = p_op.val * r_local[:, None]
    partial_rc = jnp.zeros((nc,), r_local.dtype).at[p_op.col].add(contrib)
    return lax.psum(partial_rc, AXIS)


def prolong_from_replicated(p_op: DistOp, xc_full: jax.Array) -> jax.Array:
    """x_f_local += P xc at a transition: plain local ELL·(replicated vector)."""
    return jnp.sum(p_op.val * jnp.take(xc_full, p_op.col, axis=0), axis=1)


def pdot(a: jax.Array, b: jax.Array) -> jax.Array:
    return lax.psum(jnp.vdot(a, b), AXIS)


def pnorm(a: jax.Array) -> jax.Array:
    return jnp.sqrt(pdot(a, a))


# ---------------------------------------------------------------------------
# Distributed hierarchy
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DistLevel:
    a: DistOp
    dinv: jax.Array            # sharded (or replicated full) inverse diagonal
    p: DistOp                  # prolongation from level l+1
    r: Optional[DistOp]        # restriction (None at a replication transition)
    lmax: jax.Array
    sharded: bool = _static()          # this level's vectors are sharded
    next_sharded: bool = _static()     # level l+1's vectors are sharded
    n_next: int = _static()            # (padded or full) next-level length


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DistHierarchy:
    levels: Tuple[DistLevel, ...]
    coarse_chol: jax.Array     # replicated
    params: object = _static()


def _op_spec(op, sharded_rows: bool):
    if isinstance(op, SlabDia):
        return slab_op_spec(op)
    if isinstance(op, Dia):
        return Dia(data=P(None, None), offsets=op.offsets, dims=op.dims)
    if isinstance(op, (SlabProlong, SlabRestrict, GridProlong, GridRestrict)):
        return op  # no array leaves
    s = P(AXIS) if sharded_rows else P(None)
    rt = {}
    if op.rt_val4 is not None:
        rt = dict(rt_val4=s, rt_lidx4=s, rt_soff=s, rt_cbase=s, rt_kch=s,
                  rt_sbase=s, rt_span=op.rt_span, rt_nxp=op.rt_nxp,
                  rt_kmax=op.rt_kmax, rt_resident=op.rt_resident)
    return DistOp(col=s, val=s, mode=op.mode, halo=op.halo, m_in=op.m_in,
                  n_in=op.n_in, n_in_real=op.n_in_real,
                  bnd_lo=op.bnd_lo, bnd_hi=op.bnd_hi, **rt)


def dist_specs(dh: DistHierarchy) -> DistHierarchy:
    """Parallel pytree of PartitionSpecs matching ``dh``'s array leaves."""
    levels = []
    for lv in dh.levels:
        vec = P(AXIS) if lv.sharded else P(None)
        levels.append(DistLevel(
            a=_op_spec(lv.a, lv.sharded),
            dinv=vec,
            p=_op_spec(lv.p, lv.sharded),
            r=None if lv.r is None else _op_spec(lv.r, lv.next_sharded),
            lmax=P(),
            sharded=lv.sharded,
            next_sharded=lv.next_sharded,
            n_next=lv.n_next,
        ))
    return DistHierarchy(levels=tuple(levels), coarse_chol=P(None, None),
                         params=dh.params)


# ---------------------------------------------------------------------------
# Solver components (run inside shard_map; vectors are local blocks for
# sharded levels and full vectors for replicated levels)
# ---------------------------------------------------------------------------

def _smooth(lv: DistLevel, params, x, b, sweeps: int, x_is_zero=False):
    """``x_is_zero=True`` skips the first residual SpMV+halo exactly
    (A·0 ≡ 0) — the V-cycle pre-smoother path (see amg/vcycle._smooth_zero)."""
    if params.smoother in ("jacobi", "l1jacobi"):
        # l1jacobi differs only in what setup stored in dinv (1/Σ|a_ij|)
        omega = (params.omega if params.omega is not None
                 else 4.0 / (3.0 * 1.1 * lv.lmax))
        for s in range(sweeps):
            if s == 0 and x_is_zero:
                x = omega * lv.dinv * b
            else:
                x = x + omega * lv.dinv * (b - dist_spmv(lv.a, x))
        return x
    # Chebyshev (same recurrence as the single-device smoother)
    upper = 1.1 * lv.lmax
    lower = upper / params.cheby_ratio
    theta = (upper + lower) / 2.0
    delta = (upper - lower) / 2.0
    sigma = theta / delta
    for s in range(sweeps):
        rho = 1.0 / sigma
        if s == 0 and x_is_zero:
            r = lv.dinv * b
            d = r / theta
            x = d
        else:
            r = lv.dinv * (b - dist_spmv(lv.a, x))
            d = r / theta
            x = x + d
        for _ in range(params.cheby_degree - 1):
            r = r - lv.dinv * dist_spmv(lv.a, d)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * r
            rho = rho_new
            x = x + d
    return x


def dist_vcycle(dh: DistHierarchy, b_local: jax.Array) -> jax.Array:
    params = dh.params
    levels = dh.levels

    def coarse_visit(l, bc, cyc):
        """Per-cycle-type coarse visits (mirrors amg/vcycle.coarse_visit)."""
        if l == len(levels) or cyc == "v" or l > 8:
            return descend(l, bc, "v")
        x1 = descend(l, bc, cyc)
        r2 = bc - dist_spmv(levels[l].a, x1)
        return x1 + descend(l, r2, "v" if cyc == "f" else cyc)

    def descend(l, bl, cyc):
        if l == len(levels):
            if getattr(params, "coarse_solver", "chol") == "inv":
                return dh.coarse_chol @ bl  # precomputed inverse
            y = jax.scipy.linalg.solve_triangular(dh.coarse_chol, bl, lower=True)
            return jax.scipy.linalg.solve_triangular(dh.coarse_chol.T, y,
                                                     lower=False)
        lv = levels[l]
        x = _smooth(lv, params, jnp.zeros_like(bl), bl, params.nu_pre,
                    x_is_zero=True)
        r = bl - dist_spmv(lv.a, x)
        if lv.r is not None:
            bc = dist_spmv(lv.r, r)
        else:  # transition to replicated coarse level
            bc = restrict_to_replicated(lv.p, r, lv.n_next)
        xc = coarse_visit(l + 1, bc, cyc)
        if lv.r is not None:
            x = x + dist_spmv(lv.p, xc)
        else:
            x = x + prolong_from_replicated(lv.p, xc)
        return _smooth(lv, params, x, bl, params.nu_post)

    return descend(0, b_local, getattr(params, "cycle", "v"))


def _dist_pcg_pipelined_local(dh: DistHierarchy, b, tol: float,
                              maxiter: int):
    """Single-reduction sharded PCG (Chronopoulos–Gear): the three scalar
    reductions of standard PCG collapse into ONE fused psum of a (3,)
    vector per iteration — one global sync point instead of three (the
    latency lever on a mesh). Convergence checks the entry residual (one
    iteration of lag vs standard; same solution)."""
    a = dh.levels[0].a
    x = jnp.zeros_like(b)
    r = b
    bnorm2 = lax.psum(jnp.vdot(b, b), AXIS)
    bnorm2 = jnp.where(bnorm2 == 0, 1.0, bnorm2)
    u = dist_vcycle(dh, r)
    w = dist_spmv(a, u)
    p = jnp.zeros_like(b)
    s = jnp.zeros_like(b)
    rn2 = lax.psum(jnp.vdot(r, r), AXIS)

    def cond(st):
        k, x, r, u, w, p, s, g_prev, a_prev, rn2 = st
        return (rn2 > tol * tol * bnorm2) & (k < maxiter)

    def body(st):
        k, x, r, u, w, p, s, g_prev, a_prev, _ = st
        # ONE collective: [γ, δ, ‖r‖²] partials fused into a single psum
        parts = jnp.stack([jnp.vdot(r, u), jnp.vdot(w, u), jnp.vdot(r, r)])
        gamma, delta, rn2 = lax.psum(parts, AXIS)
        beta = jnp.where(k == 0, 0.0, gamma / g_prev)
        alpha = gamma / (delta - beta * gamma / a_prev)
        p = u + beta * p
        s = w + beta * s
        x = x + alpha * p
        r = r - alpha * s
        u = dist_vcycle(dh, r)
        w = dist_spmv(a, u)
        return (k + 1, x, r, u, w, p, s, gamma, alpha, rn2)

    one = jnp.asarray(1.0, b.dtype)
    k, x, r, u, w, p, s, g, al, rn2 = lax.while_loop(
        cond, body, (jnp.int32(0), x, r, u, w, p, s, one, one, rn2))
    # exact exit residual (outside the loop; one extra reduction total)
    rel = pnorm(r) / jnp.sqrt(bnorm2)
    return x, k, rel


def _dist_pcg_local(dh: DistHierarchy, b, tol: float, maxiter: int):
    a = dh.levels[0].a
    x = jnp.zeros_like(b)
    r = b
    bnorm = pnorm(b)
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    z = dist_vcycle(dh, r)
    p = z
    rz = pdot(r, z)

    def cond(st):
        k, x, r, z, p, rz = st
        return (pnorm(r) > tol * bnorm) & (k < maxiter)

    def body(st):
        k, x, r, z, p, rz = st
        q = dist_spmv(a, p)
        alpha = rz / pdot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        z = dist_vcycle(dh, r)
        rz_new = pdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (k + 1, x, r, z, p, rz_new)

    k, x, r, z, p, rz = lax.while_loop(cond, body,
                                       (jnp.int32(0), x, r, z, p, rz))
    return x, k, pnorm(r) / bnorm


def _check_vma(dh: DistHierarchy) -> bool:
    # the Pallas remote-DMA halo transport needs check_vma=False (kernel
    # axis-index arithmetic is not vma-traceable), and so does any level
    # whose sharded SpMV runs the routed-ELL Pallas kernel on TPU
    # (pallas_call out_shapes carry no vma annotation — caught on-chip in
    # round 3; CPU tests run the XLA formulation and never hit it)
    import jax as _jax

    routed_pallas = _jax.default_backend() == "tpu" and any(
        getattr(lv.a, "rt_val4", None) is not None for lv in dh.levels)
    return not routed_pallas and not any(
        isinstance(lv.a, SlabDia) and lv.a.transport == "pallas"
        for lv in dh.levels)


def make_dist_solver(mesh, dh: DistHierarchy, tol: float = 1e-6,
                     maxiter: int = 200, variant: str = "standard"):
    """Build the jitted sharded AMG-PCG: (dh, b_padded[, tol]) →
    (x, iters, rel).

    ``variant="pipelined"`` uses single-reduction CG: one fused psum per
    iteration instead of three global sync points. ``tol`` is the default
    tolerance; the returned callable also accepts a per-call tolerance as a
    TRACED scalar (third argument), so tolerance sweeps — the distributed
    IR outer loop — reuse one compile.
    """
    specs = dist_specs(dh)
    cv = _check_vma(dh)
    local = (_dist_pcg_pipelined_local if variant == "pipelined"
             else _dist_pcg_local)
    # small hierarchies can be ENTIRELY replicated (every level below the
    # agglomeration threshold): b/x then stay full-length on every shard
    # (the psum'd dots inflate by ndev, which cancels in every ratio the
    # PCG uses — alpha, beta, tol·bnorm, rel)
    vspec = P(AXIS) if dh.levels[0].sharded else P()

    @jax.jit
    def solve_t(dh, b, tol_s):
        fn = jax.shard_map(
            partial(local, maxiter=maxiter),
            mesh=mesh,
            in_specs=(specs, vspec, P()),
            out_specs=(vspec, P(), P()),
            check_vma=cv,
        )
        return fn(dh, b, tol_s)

    def solve(dh, b, tol_s=None):
        if tol_s is None:
            tol_s = tol
        return solve_t(dh, b, jnp.asarray(tol_s, jnp.float32))

    return solve


def make_dist_vcycle(mesh, dh: DistHierarchy):
    """Jitted sharded single V-cycle apply: (dh, b_padded) → z_padded."""
    specs = dist_specs(dh)
    cv = _check_vma(dh)
    vspec = P(AXIS) if dh.levels[0].sharded else P()

    @jax.jit
    def apply(dh, b):
        return jax.shard_map(dist_vcycle, mesh=mesh,
                             in_specs=(specs, vspec),
                             out_specs=vspec, check_vma=cv)(dh, b)

    return apply
