"""Command-line driver (reference's main(), SURVEY.md §2 #18, §4.1).

Mirrors the reference CLI's experiment axes: problem, size, θ, smoother,
sweeps, tolerance, level caps — and reports phase timings, iteration counts,
residuals, and nnz/s in both human-readable and JSON form.

Example:
    python -m omp_amg_tpu.cli --problem 3d7pt --n 64 --tol 1e-8 --json
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="omp_amg_tpu",
                                description="TPU-native AMG solver")
    p.add_argument("--problem", default="3d7pt",
                   choices=["2d5pt", "3d7pt", "3d27pt", "aniso9pt"],
                   help="test problem (BASELINE.json configs)")
    p.add_argument("--n", type=int, default=64, help="grid points per side")
    p.add_argument("--eps", type=float, default=1e-3,
                   help="anisotropy strength (aniso9pt)")
    p.add_argument("--matrix", default=None,
                   help="MatrixMarket file instead of a generated problem")
    p.add_argument("--theta", type=float, default=0.25)
    p.add_argument("--coarsening", default="auto",
                   choices=["auto", "pmis", "structured"],
                   help="auto = structured (all-banded, TPU fast path) for "
                        "generated grid problems, PMIS for general matrices")
    p.add_argument("--smoother", default="jacobi",
                   choices=["jacobi", "chebyshev", "l1jacobi"])
    p.add_argument("--cycle", default="v", choices=["v", "w", "f"],
                   help="multigrid cycle shape (V / W / F)")
    p.add_argument("--pcg", default="standard",
                   choices=["standard", "pipelined"],
                   help="PCG variant (pipelined = single-reduction CG)")
    p.add_argument("--rap", default="auto",
                   choices=["auto", "host", "probe"],
                   help="PMIS Galerkin numeric engine: auto (device probe "
                        "on the banded fine level, host elsewhere), host "
                        "OpenMP Gustavson, or probe (force the "
                        "colored-probing device RAP on every level)")
    p.add_argument("--interp", default="extpi",
                   choices=["direct", "standard", "extpi"],
                   help="PMIS-path interpolation variant")
    p.add_argument("--setup-flavor", default="host",
                   choices=["host", "device"],
                   help="setup kernels: host numpy (default) or "
                        "accelerator-resident (device RAP/λmax; structured "
                        "mode runs the factored MXU Galerkin product)")
    p.add_argument("--omega", type=float, default=None,
                   help="Jacobi damping; default: per-level 4/(3*1.1*lmax)")
    p.add_argument("--nu", type=int, default=1, help="pre/post sweeps")
    p.add_argument("--cheby-degree", type=int, default=3)
    p.add_argument("--coarse-size", type=int, default=100)
    p.add_argument("--coarse-solver", default="chol",
                   choices=["chol", "inv"],
                   help="coarsest-level direct solve: Cholesky triangular "
                        "solves or one matmul with the precomputed inverse "
                        "(one serialized device stage instead of two)")
    p.add_argument("--max-levels", type=int, default=25)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--maxiter", type=int, default=500)
    p.add_argument("--rhs", default="random", choices=["random", "ones"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-ir", action="store_true",
                   help="single-precision PCG only (skip f64 refinement)")
    p.add_argument("--ir-residual", default="auto",
                   choices=["auto", "host", "device"],
                   help="where the f64 IR residual is computed: host = "
                        "native OpenMP f64 SpMV; device = on-accelerator "
                        "double-float32 (no large host transfers); auto = "
                        "device on TPU for generated problems, else host")
    p.add_argument("--save-hierarchy", default=None)
    p.add_argument("--load-hierarchy", default=None)
    p.add_argument("--json", action="store_true", help="print JSON summary")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of the solve phase "
                        "(XLA/Pallas timeline; view with tensorboard/xprof)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    # multi-controller entry (SURVEY §5.8): env-gated, no-op single-process
    from .parallel.multihost import maybe_initialize

    maybe_initialize()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from .amg.hierarchy import amg_setup, hierarchy_stats
    from .amg.params import AMGParams
    from .ops.spmv import spmv
    from .problems.poisson import PROBLEMS, default_rhs
    from .solvers.cg import amg_pcg
    from .solvers.ir import solve_ir
    from .utils.timers import PhaseTimers, gnnz_per_s, timeit

    timers = PhaseTimers()
    with timers.phase("build"):
        grid = None
        a_host = None
        if args.matrix:
            from .utils.io import read_matrix_market
            a_dev, a_sp = read_matrix_market(args.matrix)
            a_host = a_sp
        else:
            gen = PROBLEMS[args.problem]
            kw = {"eps": args.eps} if args.problem == "aniso9pt" else {}
            ndim = 3 if args.problem.startswith("3d") else 2
            grid = (args.n,) * ndim
            a_sp = None  # not needed: IR + truth use the native DIA apply
            # device-resident fast path: when the stencil values are
            # f32-exact (checked on a tiny host instance) and both setup
            # and the IR residual run on device, the operator never
            # touches the host — at 256³ that skips ~0.5 GB of relay
            # ingest AND the host f64 build.
            tiny = gen(4, backend="numpy", **kw)
            f32_exact = float(np.abs(
                np.asarray(tiny.data, np.float64)
                - np.asarray(tiny.data, np.float64).astype(np.float32)
            ).max()) == 0.0
            device_only = (f32_exact and args.setup_flavor == "device"
                           and not args.no_ir
                           and args.ir_residual in ("auto", "device"))
            if device_only:
                a_dev = gen(args.n, backend="device", **kw)
                a_host = None
            else:
                a_np = gen(args.n, backend="numpy", **kw)
                import jax.numpy as _jnp
                a_dev = a_np.__class__(
                    data=_jnp.asarray(a_np.data, _jnp.float32),
                    offsets=a_np.offsets, dims=a_np.dims)
                a_host = (list(a_np.offsets),
                          np.asarray(a_np.data, np.float64))
        b = (default_rhs(a_dev, args.rhs, args.seed)
             if not args.matrix else jnp.asarray(
                 np.random.default_rng(args.seed).standard_normal(a_sp.shape[0]),
                 jnp.float32))

    params = AMGParams(theta=args.theta, smoother=args.smoother,
                       cycle=args.cycle,
                       omega=args.omega, nu_pre=args.nu, nu_post=args.nu,
                       cheby_degree=args.cheby_degree,
                       coarsening=args.coarsening, interp=args.interp,
                       coarse_size=args.coarse_size,
                       coarse_solver=args.coarse_solver,
                       max_levels=args.max_levels, rap=args.rap)

    host_ops = None
    # per-level scipy only when cheap; device flavor keeps no host operators
    keep_host = (a_dev.shape[0] <= (1 << 20)
                 and args.setup_flavor != "device")
    if args.load_hierarchy:
        from .utils.io import load_hierarchy
        with timers.phase("setup"):
            hier = load_hierarchy(args.load_hierarchy)
    else:
        with timers.phase("setup"):
            out = amg_setup(a_dev, params, keep_host=keep_host, grid=grid,
                            flavor=args.setup_flavor)
            hier, host_ops = out if keep_host else (out, None)
    if args.save_hierarchy:
        from .utils.io import save_hierarchy
        save_hierarchy(args.save_hierarchy, hier)

    stats = hierarchy_stats(hier, host_ops)

    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        import jax

        profile_ctx = jax.profiler.trace(args.profile)

    with profile_ctx, timers.phase("solve"):
        if args.no_ir:
            res = amg_pcg(a_dev, b, hier, tol=args.tol,
                          maxiter=args.maxiter, variant=args.pcg)
            import jax
            jax.block_until_ready(res.x)
            iters = int(res.iters)
            rel = float(res.rel_residual)
            b64 = np.asarray(b, np.float64)
            if isinstance(a_host, tuple):
                from .native import dia_apply
                ax = dia_apply(a_host[0], a_host[1],
                               np.asarray(res.x, np.float64))
            else:
                ax = a_host @ np.asarray(res.x, np.float64)
            true_rel = float(np.linalg.norm(b64 - ax) / np.linalg.norm(b64))
        else:
            from .sparse.formats import Dia
            use_device_ir = (args.ir_residual == "device"
                             or a_host is None
                             or (args.ir_residual == "auto"
                                 and jax.devices()[0].platform == "tpu"
                                 and isinstance(a_dev, Dia)))
            if use_device_ir and isinstance(a_dev, Dia):
                a_lo = None
                if isinstance(a_host, tuple):
                    # f32 truncation-error planes (None when f32-exact)
                    d64 = np.asarray(a_host[1], np.float64)
                    lo = (d64 - d64.astype(np.float32).astype(np.float64)
                          ).astype(np.float32)
                    if np.abs(lo).max() > 0:
                        a_lo = lo
                from .solvers.ir import solve_ir_device
                res = solve_ir_device(a_dev, b, hier, tol=args.tol,
                                      maxiter=args.maxiter, variant=args.pcg,
                                      a_lo=a_lo)
            else:
                res = solve_ir(a_host, np.asarray(b, np.float64), a_dev,
                               hier, tol=args.tol, maxiter=args.maxiter,
                               variant=args.pcg)
            iters = sum(res.inner_iters)
            rel = res.rel_residual
            true_rel = res.rel_residual

    # SpMV throughput on the fine operator
    import jax
    if a_sp is not None:
        nnz = int(a_sp.nnz)
    elif a_host is not None:
        nnz = int(np.count_nonzero(a_host[1]))
    else:  # device-only build: count on device
        nnz = int(jax.jit(lambda d: (d != 0).sum())(a_dev.data))
    spmv_j = jax.jit(spmv)
    t_spmv = timeit(spmv_j, a_dev, b, warmup=2, iters=10)
    spmv_gnnz = gnnz_per_s(nnz, t_spmv)

    summary = {
        "problem": args.problem if not args.matrix else args.matrix,
        "n_rows": int(a_dev.shape[0]),
        "nnz": nnz,
        "levels": stats["levels"],
        "sizes": stats["sizes"],
        "operator_complexity": stats.get("operator_complexity"),
        "theta": args.theta,
        "coarsening": args.coarsening,
        "smoother": args.smoother,
        "tol": args.tol,
        "iters": iters,
        "rel_residual": rel,
        "true_rel_residual": true_rel,
        "timers_s": timers.report(),
        "spmv_seconds": t_spmv,
        "spmv_gnnz_per_s": spmv_gnnz,
        "backend": jax.devices()[0].platform,
    }
    if args.json:
        print(json.dumps(summary))
    else:
        for k, v in summary.items():
            print(f"{k:>22}: {v}")
    # success: converged in f64 truth, or (single-precision mode) the
    # recursive residual met the tolerance
    ok = true_rel <= args.tol * 10 or (args.no_ir and rel <= args.tol)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
