"""High-level solver facade — the one-stop user API.

Wraps setup + solve + mixed-precision refinement behind the interface a
user of the reference CLI would expect programmatically:

    import omp_amg_tpu as amg

    solver = amg.AMGSolver(A)            # A: Dia/Ell/scipy CSR (+ grid=...)
    x = solver.solve(b, tol=1e-8)        # f64-certified by default
    print(solver.last_info)

The facade owns the hierarchy, exposes its statistics, and re-uses compiled
solve graphs across calls with matching shapes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .amg.hierarchy import Hierarchy, amg_setup, hierarchy_stats
from .amg.params import AMGParams
from .amg.vcycle import vcycle
from .sparse.formats import Dia, Ell, dia_to_scipy, ell_to_scipy
from .solvers.cg import amg_pcg
from .solvers.ir import solve_ir


class AMGSolver:
    """AMG-preconditioned CG solver with amortized setup."""

    def __init__(self, a, params: AMGParams = AMGParams(), *, grid=None):
        self.a = a
        self.params = params
        self._a_sp = None
        self.hierarchy: Hierarchy = amg_setup(a, params, grid=grid)
        self.last_info: dict = {}

    @property
    def a_host(self):
        """scipy CSR of the fine operator (built lazily for f64 residuals)."""
        if self._a_sp is None:
            if isinstance(self.a, Dia):
                self._a_sp = dia_to_scipy(self.a)
            elif isinstance(self.a, Ell):
                self._a_sp = ell_to_scipy(self.a)
            else:
                import scipy.sparse as sp

                self._a_sp = sp.csr_matrix(self.a)
        return self._a_sp

    def stats(self) -> dict:
        return hierarchy_stats(self.hierarchy)

    def solve(self, b, tol: float = 1e-8, maxiter: int = 500,
              certify: bool = True):
        """Solve A x = b.

        ``certify=True`` (default) runs the f64 defect-correction outer loop
        so the returned residual is a true f64 ‖b−Ax‖/‖b‖ ≤ tol;
        ``certify=False`` returns the single-precision device solve.
        """
        if certify:
            res = solve_ir(self.a_host, np.asarray(b, np.float64), self.a,
                           self.hierarchy, tol=tol, maxiter=maxiter)
            self.last_info = {
                "iters": sum(res.inner_iters),
                "outer_iters": res.outer_iters,
                "rel_residual": res.rel_residual,
                "certified_f64": True,
            }
            return res.x
        res = amg_pcg(self.a, jnp.asarray(b, self.hierarchy.coarse_chol.dtype),
                      self.hierarchy, tol=tol, maxiter=maxiter)
        self.last_info = {
            "iters": int(res.iters),
            "rel_residual": float(res.rel_residual),
            "certified_f64": False,
        }
        return res.x

    def precondition(self, r):
        """Apply one V-cycle: z = M⁻¹ r (for use in external Krylov loops)."""
        return vcycle(self.hierarchy, r)
