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
    """AMG-preconditioned CG solver with amortized setup.

    Pass ``mesh`` (a 1D ``jax.sharding.Mesh`` over axis "rows") to build and
    solve distributed: structured problems run the fully sharded setup
    (:func:`~omp_amg_tpu.parallel.dist_setup.dist_structured_setup`),
    classical/PMIS problems the per-shard distributed setup
    (:func:`~omp_amg_tpu.parallel.dist_pmis_setup.dist_pmis_setup`); only
    on cap violations is a hierarchy built centrally and partitioned.
    Distributed solves certify through the sharded df64 refinement loop
    (:mod:`~omp_amg_tpu.parallel.dist_ir`) — device-resident (hi, lo)
    residuals, no host SpMV.
    """

    def __init__(self, a, params: AMGParams = AMGParams(), *, grid=None,
                 mesh=None, transport: str = "ppermute",
                 agg_rows_per_dev: int = 2048, flavor: str = "host",
                 refreshable: bool = False):
        self.a = a
        self.params = params
        self.mesh = mesh
        self._a_sp = None
        self._dist = None
        self._dist_vcycle = None
        self._cache = None
        self.last_info: dict = {}
        if mesh is None:
            if refreshable:
                # record the symbolic setup so refresh(a_new) re-fills
                # values only (amg/refresh.py; classical PMIS host setup)
                from .amg.refresh import SetupCache

                self._cache = SetupCache()
            self.hierarchy: Hierarchy = amg_setup(a, params, grid=grid,
                                                  flavor=flavor,
                                                  cache=self._cache)
            return
        from .parallel.dist_setup import dist_structured_setup
        from .parallel.partition import partition_hierarchy, place_hierarchy

        ndev = int(mesh.devices.size)
        dh = None
        if (grid is not None and isinstance(a, Dia)
                and params.coarsening in ("structured", "auto")):
            try:
                dh = dist_structured_setup(
                    a, grid, mesh, params, transport=transport,
                    agg_rows_per_dev=agg_rows_per_dev)
            except ValueError:
                dh = None
        use_pmis = params.coarsening == "pmis" or (
            params.coarsening == "auto"
            and (grid is None or not isinstance(a, Dia)))
        if dh is None and use_pmis:
            # classical (PMIS) family: the per-shard distributed setup —
            # strength/PMIS rounds with ghost exchanges, per-shard ext+i,
            # shard-local RAP (parallel/dist_pmis_setup.py). Falls back to
            # central build + partition on cap violations.
            from .parallel.dist_pmis_setup import (
                DistSetupCache, dist_pmis_setup,
            )

            dcache = DistSetupCache() if refreshable else None
            try:
                dh = dist_pmis_setup(a, ndev, params, mesh=mesh,
                                     agg_rows_per_dev=agg_rows_per_dev,
                                     transport=transport, cache=dcache)
                self._cache = dcache
            except ValueError:
                dh = None
        if dh is None:
            hier = amg_setup(a, params, grid=grid)
            dh = place_hierarchy(
                partition_hierarchy(hier, ndev, transport=transport,
                                    agg_rows_per_dev=agg_rows_per_dev), mesh)
        self.hierarchy = dh

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
        if self.mesh is not None:
            def rows(op):
                if hasattr(op, "n_rows"):
                    return int(op.n_rows)
                return int(op.col.shape[0])  # DistOp

            sizes = [rows(lv.a) for lv in self.hierarchy.levels]
            sizes.append(int(self.hierarchy.coarse_chol.shape[0]))
            return {"levels": len(sizes), "sizes": sizes,
                    "sharded": [bool(lv.sharded)
                                for lv in self.hierarchy.levels]}
        return hierarchy_stats(self.hierarchy)

    def solve(self, b, tol: float = 1e-8, maxiter: int = 500,
              certify: bool = True, residual: str = "auto",
              device_result: bool = False):
        """Solve A x = b.

        ``certify=True`` (default) runs the f64 defect-correction outer loop
        so the returned residual is a true f64 ‖r‖/‖b‖ ≤ tol;
        ``certify=False`` returns the single-precision device solve.
        ``residual`` picks where the certified outer residual is evaluated:
        "host" = scipy f64 SpMV, "device" = on-accelerator double-float32
        (no large host transfers; floor ≈1e-13), "auto" = device on TPU for
        Dia operators, else host.
        ``device_result=True`` (device-residual certified path only) skips
        the host pull of x and returns the ``(x_hi, x_lo)`` double-float32
        pair on device — the pull dominates the warm wall at 256³ through
        the axon relay (~9.5 s vs ~0.7 s of compute).
        """
        if self.mesh is not None:
            from .parallel.dist import make_dist_solver
            from .parallel.dist_ir import make_dist_ir_solver, supports_df64
            from .parallel.partition import pad_vector, unpad_vector

            n = np.asarray(b).shape[0]
            bp = pad_vector(b, self.hierarchy, int(self.mesh.devices.size))
            if certify and supports_df64(self.hierarchy):
                # distributed df64 iterative refinement: device-resident
                # (hi, lo) residuals inside shard_map, one psum'd norm per
                # outer — the true-f64 1e-8 contract without host SpMV
                key = ("ir", int(maxiter))
                if self._dist is None or self._dist[0] != key:
                    self._dist = (key, make_dist_ir_solver(
                        self.mesh, self.hierarchy, tol=tol,
                        maxiter=maxiter))
                res = self._dist[1](self.hierarchy, np.asarray(bp,
                                                               np.float64))
                self.last_info = {"iters": sum(res.inner_iters),
                                  "outer_iters": res.outer_iters,
                                  "rel_residual": res.rel_residual,
                                  "certified_f64": True,
                                  "distributed": True}
                return unpad_vector(np.asarray(res.x), n)
            if certify:
                import warnings

                warnings.warn(
                    "distributed solve is f32-only for this fine-operator "
                    "type; returning the uncertified device residual — "
                    "pass certify=False to silence", stacklevel=2)
            key = (int(maxiter),)
            if self._dist is None or self._dist[0] != key:
                self._dist = (key, make_dist_solver(self.mesh, self.hierarchy,
                                                    tol=tol, maxiter=maxiter))
            x, iters, rel = self._dist[1](self.hierarchy, bp, tol)
            self.last_info = {"iters": int(iters),
                              "rel_residual": float(rel),
                              "certified_f64": False,
                              "distributed": True}
            return unpad_vector(x, n)
        if certify:
            use_device = (residual == "device"
                          or (residual == "auto" and isinstance(self.a, Dia)
                              and jax.default_backend() == "tpu"))
            if use_device and isinstance(self.a, Dia):
                from .solvers.ir import solve_ir_device

                # the operator IS its f32 values here, so a_lo=None is exact
                res = solve_ir_device(self.a, b, self.hierarchy, tol=tol,
                                      maxiter=maxiter,
                                      to_host=not device_result)
            else:
                res = solve_ir(self.a_host, np.asarray(b, np.float64),
                               self.a, self.hierarchy, tol=tol,
                               maxiter=maxiter)
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

    def refresh(self, a_new, *, stream_dtype: str = "auto"):
        """Value-only re-setup: same sparsity, new operator values.

        Reuses every symbolic decision and device plan geometry of the
        original setup (requires ``refreshable=True`` at construction);
        falls back to a full fresh setup — with a warning — when the new
        values change a strength/interpolation/Galerkin pattern.

        ``stream_dtype="auto"`` (default) ships the routed value streams
        in bfloat16 above ~30 M fine-operator elements — half the
        host→device bytes on the transfer-floor-bound relay path, with a
        measured refreshed-solve iteration delta of ZERO vs f32 streams
        (see :func:`omp_amg_tpu.amg.refresh.amg_refresh`); the f64
        certified solve is unaffected either way. ``"f32"`` forces exact
        streams (refreshed == fresh to f32 roundoff) at any size.
        (Single-device path only; the distributed PMIS refresh rebuilds
        its device partition from refreshed host values.)
        """
        if self._cache is None:
            raise ValueError("construct AMGSolver(..., refreshable=True) "
                             "to enable refresh"
                             + (" (distributed refresh covers the PMIS "
                                "family)" if self.mesh is not None else ""))
        from .amg.refresh import PatternChangedError

        if self.mesh is not None:
            # distributed (per-shard PMIS) value-only refresh
            from .parallel.dist_pmis_setup import (
                DistSetupCache, dist_pmis_refresh, dist_pmis_setup,
            )

            try:
                self.hierarchy = dist_pmis_refresh(a_new, self._cache)
            except PatternChangedError as e:
                import warnings

                warnings.warn(f"refresh pattern guard tripped ({e}); "
                              "running a full re-setup", stacklevel=2)
                old_kw = self._cache.part_kw or {}
                self._cache = DistSetupCache()
                self.hierarchy = dist_pmis_setup(
                    a_new, int(self.mesh.devices.size), self.params,
                    mesh=self.mesh, cache=self._cache, **old_kw)
            self._dist = None
            self._dist_vcycle = None
            self.a = a_new
            self._a_sp = None
            return self
        from .amg.refresh import amg_refresh

        try:
            # drop our reference first: at headline sizes two value sets
            # cannot coexist in HBM (amg_refresh also releases the cached
            # hierarchy's value buffers once the guards pass)
            self.hierarchy = None
            self.hierarchy = amg_refresh(a_new, self._cache,
                                         stream_dtype=stream_dtype,
                                         release_old_values=True)
        except PatternChangedError as e:
            import warnings

            warnings.warn(f"refresh pattern guard tripped ({e}); running "
                          "a full re-setup", stacklevel=2)
            from .amg.refresh import SetupCache

            self._cache = SetupCache()
            self.hierarchy = amg_setup(a_new, self.params,
                                       cache=self._cache)
        self.a = a_new
        self._a_sp = None
        return self

    def precondition(self, r):
        """Apply one V-cycle: z = M⁻¹ r (for use in external Krylov loops)."""
        if self.mesh is not None:
            from .parallel.dist import make_dist_vcycle
            from .parallel.partition import pad_vector, unpad_vector

            if self._dist_vcycle is None:  # cache: one jitted apply, reused
                self._dist_vcycle = make_dist_vcycle(self.mesh,
                                                     self.hierarchy)
            n = np.asarray(r).shape[0]
            rp = pad_vector(r, self.hierarchy, int(self.mesh.devices.size))
            return unpad_vector(self._dist_vcycle(self.hierarchy, rp), n)
        return vcycle(self.hierarchy, r)
