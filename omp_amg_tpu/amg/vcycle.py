"""V-cycle multigrid solve (SURVEY.md §2 #13–14, §3.8, §4.4).

The hierarchy has static structure, so the recursion is Python-unrolled
inside one ``jit``: ~4 SpMVs + smoother SpMVs per level, a dense triangular
solve at the bottom. Zero initial guess + symmetric smoothing keep the cycle
a fixed SPD linear operator — the PCG preconditioner contract (§3.9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.spmv import residual, spmv
from .hierarchy import Hierarchy, Level
from .params import AMGParams
from .smoothers import chebyshev, jacobi


def _smooth(level: Level, params: AMGParams, x, b, sweeps: int):
    if sweeps == 0:
        return x
    if params.smoother in ("jacobi", "l1jacobi"):
        omega = (params.omega if params.omega is not None
                 else 4.0 / (3.0 * 1.1 * level.lmax))
        return jacobi(level.a, level.dinv, x, b, omega, sweeps,
                      const_scalar=params.smoother == "jacobi")
    if params.smoother == "chebyshev":
        for _ in range(sweeps):
            x = chebyshev(level.a, level.dinv, x, b, level.lmax,
                          params.cheby_degree, params.cheby_ratio)
        return x
    raise ValueError(f"unknown smoother {params.smoother!r}")


def _smooth_zero(level: Level, params: AMGParams, b, sweeps: int):
    """Smooth with a known-zero initial guess, skipping the first SpMV.

    ``A·0`` is exactly the zero vector (every format's products are
    ``value·0``), so the first weighted-Jacobi sweep collapses to
    ``ω·D⁻¹·b`` and the first Chebyshev residual to ``D⁻¹·b`` — one SpMV
    saved per level per V-cycle at bitwise-identical results.
    """
    if sweeps == 0:
        return jnp.zeros_like(b)
    if params.smoother in ("jacobi", "l1jacobi"):
        omega = (params.omega if params.omega is not None
                 else 4.0 / (3.0 * 1.1 * level.lmax))
        x = omega * level.dinv * b  # == 0 + ω·D⁻¹·(b − A·0), same assoc
        return jacobi(level.a, level.dinv, x, b, omega, sweeps - 1,
                      const_scalar=params.smoother == "jacobi")
    if params.smoother == "chebyshev":
        x = chebyshev(level.a, level.dinv, None, b, level.lmax,
                      params.cheby_degree, params.cheby_ratio, x_is_zero=True)
        for _ in range(sweeps - 1):
            x = chebyshev(level.a, level.dinv, x, b, level.lmax,
                          params.cheby_degree, params.cheby_ratio)
        return x
    raise ValueError(f"unknown smoother {params.smoother!r}")


def coarse_solve(hier: Hierarchy, b):
    """Dense direct solve at the coarsest level (factored at setup):
    Cholesky triangular solves, or one matmul with the precomputed inverse
    (params.coarse_solver == "inv" — one serialized stage instead of two)."""
    if hier.params.coarse_solver == "inv":
        return hier.coarse_chol @ b
    chol = hier.coarse_chol
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)


def _fused_v11_level(lv: Level, params: AMGParams) -> bool:
    """True when the level can run the fully fused ConstDia V(1,1) pair:
    r = b − s·A·b (pre-smooth+residual) and x = u + s·(b − A·u) with
    u = s·b + P·xc (correction+post-smooth) — 2 Pallas passes instead of 5
    XLA/Pallas stages over the level (the pre-smoothed iterate s·b never
    materializes)."""
    from ..sparse.formats import ConstDia

    return (isinstance(lv.a, ConstDia) and params.smoother == "jacobi"
            and params.nu_pre == 1 and params.nu_post == 1
            and jax.default_backend() == "tpu")


def vcycle(hier: Hierarchy, b):
    """One μ-cycle applied to b with zero initial guess → M⁻¹ b.

    ``params.cycle`` selects the recursion shape: "v" (one coarse visit per
    level), "w" (two — the second refines the first's result on its
    residual), "f" (an F-recursion followed by a V-recursion). All three
    keep the symmetric-smoothing / zero-initial-guess structure, so M stays
    a fixed SPD operator — the PCG preconditioner contract (§3.9).
    """
    params = hier.params
    levels = hier.levels

    def coarse_visit(l, bc, cyc):
        """Solve the level-l problem per the cycle type (l ≥ 1)."""
        if l == len(levels):
            return coarse_solve(hier, bc)
        # the cycle is Python-unrolled inside one jit: cap W-branching
        # depth so the graph stays ≤ 2^8 coarse visits
        if cyc == "v" or l > 8:
            return descend(l, bc, "v")
        x1 = descend(l, bc, cyc)
        # second visit refines x1 on its residual (W: same cycle type;
        # F: downgrade to V — the classical F-cycle recursion)
        r2 = residual(levels[l].a, x1, bc)
        return x1 + descend(l, r2, "v" if cyc == "f" else cyc)

    def descend(l, bl, cyc):
        if l == len(levels):
            return coarse_solve(hier, bl)
        lv = levels[l]
        if _fused_v11_level(lv, params):
            from ..ops.pallas_const import (
                correct_jacobi_const, presmooth_residual_const,
            )

            omega = (params.omega if params.omega is not None
                     else 4.0 / (3.0 * 1.1 * lv.lmax))
            s = omega * lv.dinv[0]
            r = presmooth_residual_const(lv.a, bl, s)
            xc = coarse_visit(l + 1, spmv(lv.r, r), cyc)
            return correct_jacobi_const(lv.a, bl, spmv(lv.p, xc), s)
        x = _smooth_zero(lv, params, bl, params.nu_pre)
        r = residual(lv.a, x, bl)
        xc = coarse_visit(l + 1, spmv(lv.r, r), cyc)
        from ..sparse.routed import RoutedEll

        if isinstance(lv.p, RoutedEll) and jax.default_backend() == "tpu":
            # x + P·xc fused into the prolongation pass (one fewer
            # serialized stage per level — the relay charges ~0.5 ms each)
            from ..ops.pallas_routed import correct_routed

            x = correct_routed(lv.p, xc, x)
        else:
            x = x + spmv(lv.p, xc)
        return _smooth(lv, params, x, bl, params.nu_post)

    return descend(0, b, params.cycle)


def vcycle_apply(hier: Hierarchy, x, b):
    """x ← x + M⁻¹(b − A x): V-cycle as an iteration (standalone AMG solve)."""
    r = residual(hier.levels[0].a, x, b) if hier.levels else b
    return x + vcycle(hier, r)
