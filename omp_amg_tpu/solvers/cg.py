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


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def amg_pcg(a, b, hier: Hierarchy, tol: float = 1e-8, maxiter: int = 500,
            x0=None) -> CGResult:
    """PCG with M⁻¹ = one V-cycle of the given hierarchy (one jitted call)."""
    return pcg(a, b, precond=lambda r: vcycle(hier, r), tol=tol,
               maxiter=maxiter, x0=x0)


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def cg(a, b, tol: float = 1e-8, maxiter: int = 500, x0=None) -> CGResult:
    """Unpreconditioned CG (baseline/comparison path)."""
    return pcg(a, b, precond=lambda r: r, tol=tol, maxiter=maxiter, x0=x0)
