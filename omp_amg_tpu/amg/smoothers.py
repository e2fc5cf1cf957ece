"""Smoothers: weighted Jacobi and Chebyshev (SURVEY.md §2 #11–12, §3.6–3.7).

Matrix-free formulations fused by XLA: each sweep is one SpMV plus
elementwise ops (the BASELINE north-star's "matrix-free collectives" path —
under ``shard_map`` the same code runs sharded with halo exchanges inside
``spmv``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.spmv import spmv
from .pmis import hash01


def jacobi(a, dinv, x, b, omega: float, sweeps: int,
           const_scalar: bool = True):
    """Weighted-Jacobi sweeps x ← x + ω·dinv·(b − A x).

    ``const_scalar=False`` disables the ConstDia scalar fast path — needed
    when ``dinv`` is NOT constant even though the operator is (the l1-Jacobi
    smoother: row l1 sums vary near the boundary)."""
    from ..sparse.formats import ConstDia

    if (const_scalar and isinstance(a, ConstDia)
            and jax.default_backend() == "tpu"):
        # constant diagonal → ω·D⁻¹ is one scalar; the whole sweep fuses
        # into a single Pallas pass (x, b in / x' out — bitwise-identical
        # to the unfused sweep, ~2× less level traffic)
        from ..ops.pallas_const import jacobi_const

        s = omega * dinv[0]
        for _ in range(sweeps):
            x = jacobi_const(a, x, b, s)
        return x
    from ..sparse.routed import RoutedEll

    if isinstance(a, RoutedEll) and jax.default_backend() == "tpu":
        # fused sweep: one routed pass per sweep (PMIS-path analog of the
        # ConstDia fusion — halves the per-level stage count)
        from ..ops.pallas_routed import jacobi_routed

        sv = omega * dinv
        for _ in range(sweeps):
            x = jacobi_routed(a, x, b, sv)
        return x
    from ..sparse.formats import PlaneDia

    if isinstance(a, PlaneDia) and jax.default_backend() == "tpu":
        # fused sweep on the rolling-plane kernel (the PMIS fine level is
        # PlaneDia — this was its last unfused V-cycle stage)
        from ..ops.pallas_spmv import jacobi_plane_dia

        sv = omega * dinv
        done = True
        for _ in range(sweeps):
            xn = jacobi_plane_dia(a, x, b, sv)
            if xn is None:
                done = False
                break
            x = xn
        if done:
            return x
    for _ in range(sweeps):
        x = x + omega * dinv * (b - spmv(a, x))
    return x


def chebyshev(a, dinv, x, b, lmax, degree: int, ratio: float,
              x_is_zero: bool = False):
    """Chebyshev polynomial smoother on D⁻¹A over [1.1·lmax/ratio, 1.1·lmax].

    Classical three-term Chebyshev semi-iteration (Saad alg. 12.1 with
    hypre-style spectral bounds, SURVEY.md §3.7). ``degree`` = number of
    SpMV applications. A fixed polynomial in D⁻¹A, hence symmetric as a
    preconditioner component — preserves the SPD contract of §3.9.

    ``x_is_zero=True`` skips the initial residual SpMV exactly (A·0 ≡ 0):
    the V-cycle pre-smoother always starts from a zero guess, so this saves
    one SpMV per level per cycle at bitwise-identical results.
    """
    upper = 1.1 * lmax
    lower = upper / ratio
    theta = (upper + lower) / 2.0
    delta = (upper - lower) / 2.0
    sigma = theta / delta
    rho = 1.0 / sigma

    r = dinv * b if x_is_zero else dinv * (b - spmv(a, x))
    d = r / theta
    x = d if x_is_zero else x + d
    for _ in range(degree - 1):
        r = r - dinv * spmv(a, d)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = (rho_new * rho) * d + (2.0 * rho_new / delta) * r
        rho = rho_new
        x = x + d
    return x


def estimate_lmax(a, dinv, iters: int = 20):
    """Largest eigenvalue of D⁻¹A by power iteration (deterministic seed)."""
    n = a.shape[0]
    v = hash01(jnp.arange(n, dtype=jnp.int32)).astype(a.dtype) - 0.5

    def body(_, v):
        w = dinv * spmv(a, v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v / jnp.linalg.norm(v))
    w = dinv * spmv(a, v)
    return jnp.vdot(v, w) / jnp.vdot(v, v)
