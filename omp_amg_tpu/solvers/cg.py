"""AMG-preconditioned conjugate gradient (SURVEY.md §2 #15, §3.9, §4.3).

One jitted ``lax.while_loop``; the only global reductions are the two dots
and the residual norm (psum points under sharding). The residual history is
device-side (no per-iteration host sync) — SURVEY.md §5.5.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..amg.hierarchy import Hierarchy
from ..amg.vcycle import vcycle
from ..ops.spmv import spmv


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array          # scalar int32
    rel_residual: jax.Array   # scalar: ‖r_k‖/‖b‖ (recursive residual)
    history: jax.Array        # (maxiter+1,) ‖r_k‖, NaN-padded after exit


def pcg(a, b, precond: Callable, tol: float = 1e-8, maxiter: int = 500,
        x0=None) -> CGResult:
    """Solve A x = b with preconditioner ``precond`` (M⁻¹ apply).

    ``precond`` must be a fixed SPD linear operator (for AMG: one V-cycle
    with zero initial guess — see §3.9). Un-jitted building block: callers
    jit the wrapper that closes over it (``amg_pcg``/``cg``) so operator and
    hierarchy arrays stay *traced arguments*, not baked-in constants.
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - spmv(a, x)
    bnorm = jnp.linalg.norm(b)
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    z = precond(r)
    p = z
    rz = jnp.vdot(r, z)
    hist = jnp.full((maxiter + 1,), jnp.nan, b.dtype).at[0].set(jnp.linalg.norm(r))

    def cond(state):
        k, x, r, z, p, rz, hist = state
        return (jnp.linalg.norm(r) > tol * bnorm) & (k < maxiter)

    def body(state):
        k, x, r, z, p, rz, hist = state
        q = spmv(a, p)
        alpha = rz / jnp.vdot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        hist = hist.at[k + 1].set(jnp.linalg.norm(r))
        return (k + 1, x, r, z, p, rz_new, hist)

    k, x, r, z, p, rz, hist = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x, r, z, p, rz, hist)
    )
    return CGResult(x=x, iters=k, rel_residual=jnp.linalg.norm(r) / bnorm,
                    history=hist)


def pcg_pipelined(a, b, precond: Callable, tol: float = 1e-8,
                  maxiter: int = 500, x0=None) -> CGResult:
    """Single-reduction PCG (Chronopoulos–Gear).

    Standard PCG has three serialized reduction points per iteration
    ((r,z), (p,q), ‖r‖) — three global syncs on a mesh and three
    latency-floor stages through the relay. This variant computes all
    scalars at ONE program point per iteration: γ=(r,u), δ=(w,u), ‖r‖²
    on the entry state, with α recovered from the recurrence
    α_k = γ_k / (δ_k − β_k γ_k / α_{k−1}) (verified via the residual
    M-orthogonality identity (u_k, A p_{k−1}) = −γ_k/α_{k−1}).
    Convergence is checked on the entry residual, so exit can lag standard
    PCG by one iteration; same solution to float tolerance.
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - spmv(a, x)
    bnorm = jnp.linalg.norm(b)
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    u = precond(r)
    w = spmv(a, u)
    hist = jnp.full((maxiter + 1,), jnp.nan,
                    b.dtype).at[0].set(jnp.linalg.norm(r))
    p = jnp.zeros_like(b)
    s = jnp.zeros_like(b)
    rn2 = jnp.vdot(r, r)

    def cond(state):
        k, x, r, u, w, p, s, g_prev, a_prev, rn2, hist = state
        return (jnp.sqrt(rn2) > tol * bnorm) & (k < maxiter)

    def body(state):
        k, x, r, u, w, p, s, g_prev, a_prev, rn2, hist = state
        # the ONE reduction point: γ, δ (and the next ‖r‖² is folded into
        # the same point of the NEXT iteration via the carried state)
        gamma = jnp.vdot(r, u)
        delta = jnp.vdot(w, u)
        beta = jnp.where(k == 0, 0.0, gamma / g_prev)
        alpha = gamma / (delta - beta * gamma / a_prev)
        p = u + beta * p
        s = w + beta * s
        x = x + alpha * p
        r = r - alpha * s
        u = precond(r)
        w = spmv(a, u)
        rn2 = jnp.vdot(r, r)
        hist = hist.at[k + 1].set(jnp.sqrt(rn2))
        return (k + 1, x, r, u, w, p, s, gamma, alpha, rn2, hist)

    state = (jnp.int32(0), x, r, u, w, p, s, jnp.asarray(1.0, b.dtype),
             jnp.asarray(1.0, b.dtype), rn2, hist)
    k, x, r, u, w, p, s, g, al, rn2, hist = jax.lax.while_loop(
        cond, body, state)
    return CGResult(x=x, iters=k, rel_residual=jnp.sqrt(rn2) / bnorm,
                    history=hist)


@partial(jax.jit, static_argnames=("maxiter", "variant"))
def amg_pcg(a, b, hier: Hierarchy, tol: float = 1e-8, maxiter: int = 500,
            x0=None, variant: str = "standard") -> CGResult:
    """PCG with M⁻¹ = one V-cycle of the given hierarchy (one jitted call).

    ``variant="pipelined"`` selects single-reduction CG (one scalar sync
    point per iteration instead of three — see :func:`pcg_pipelined`).
    ``tol`` is a *traced* scalar: callers that sweep tolerances (the
    adaptive IR outer loop) reuse one compiled graph.
    """
    fn = pcg_pipelined if variant == "pipelined" else pcg
    return fn(a, b, precond=lambda r: vcycle(hier, r), tol=tol,
              maxiter=maxiter, x0=x0)


@partial(jax.jit, static_argnames=("maxiter",))
def cg(a, b, tol: float = 1e-8, maxiter: int = 500, x0=None) -> CGResult:
    """Unpreconditioned CG (baseline/comparison path)."""
    return pcg(a, b, precond=lambda r: r, tol=tol, maxiter=maxiter, x0=x0)
