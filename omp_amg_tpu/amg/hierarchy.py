"""AMG hierarchy container and setup driver (SURVEY.md §2 #10, §4.2).

Setup is host-orchestrated, device-executed (SURVEY.md §7 "hard parts"):
the data-dependent decisions (level count, coarse sizes, ELL widths) happen
in Python during the amortized setup phase, while each structural step
(strength, PMIS rounds, interpolation values) is a jitted device computation.
The Galerkin product runs through :mod:`omp_amg_tpu.ops.rap` (host symbolic /
device-capable numeric, f64 for setup accuracy).

The resulting ``Hierarchy`` is a static-shaped pytree: the V-cycle jits once
per hierarchy and unrolls over levels.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.formats import (
    Dia, Ell, dia_to_ell, dia_to_scipy, ell_from_scipy, ell_to_scipy,
    transpose_ell, diagonal,
)
from .interp import direct_interpolation
from .params import AMGParams
from .pmis import coarse_map, pmis
from .smoothers import estimate_lmax
from .strength import strength_mask


def _static(**kw):
    return field(metadata=dict(static=True), **kw)


class _SetupTrace:
    """Opt-in per-phase setup timing (OMP_AMG_SETUP_TIMERS=1): the analog of
    the reference's per-phase ``omp_get_wtime`` setup report. ``mark`` takes
    an optional device value to sync on (scalar-pull — the only true barrier
    through the axon relay, see utils/timers). The most recent enabled
    trace is kept in ``last_setup_trace()`` so benchmark harnesses can
    record the per-phase breakdown (bench_details.json)."""

    def __init__(self):
        import os

        self.enabled = os.environ.get("OMP_AMG_SETUP_TIMERS") == "1"
        if self.enabled:
            import time

            global _LAST_TRACE
            self.records = []
            _LAST_TRACE = self.records
            self.t = time.perf_counter()

    def mark(self, label: str, sync=None):
        if not self.enabled:
            return
        import sys
        import time

        if sync is not None:
            from ..utils.timers import _sync

            _sync(sync)
        now = time.perf_counter()
        self.records.append((label, now - self.t))
        print(f"[setup] {label}: {now - self.t:.3f}s", file=sys.stderr,
              flush=True)
        self.t = now


_LAST_TRACE: list = []


def last_setup_trace():
    """Per-phase (label, seconds) records of the most recent traced setup."""
    return list(_LAST_TRACE)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Level:
    a: object          # Dia | Ell — the level operator
    dinv: jax.Array    # (n,) inverse diagonal
    p: Ell             # prolongation to this level from level l+1  (n_l × n_{l+1})
    r: Ell             # restriction = P^T, materialized as ELL
    lmax: jax.Array    # scalar: largest eigenvalue of D⁻¹A (Chebyshev bounds)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Hierarchy:
    levels: Tuple[Level, ...]
    coarse_chol: jax.Array        # dense coarse-solve data: Cholesky factor
                                  # (lower), or A⁻¹ when params.coarse_solver
                                  # == "inv" (one matmul per application)
    coarse_a: jax.Array           # dense coarsest operator (for diagnostics)
    params: AMGParams = _static()

    @property
    def n_levels(self) -> int:
        return len(self.levels) + 1


def _to_ell(a) -> Ell:
    if isinstance(a, Ell):
        return a
    if isinstance(a, Dia):
        return dia_to_ell(a)
    raise TypeError(type(a))


def _to_scipy(a):
    if isinstance(a, Ell):
        return ell_to_scipy(a)
    if isinstance(a, Dia):
        return dia_to_scipy(a)
    raise TypeError(type(a))


def _coarse_factor(dense: np.ndarray, params: AMGParams) -> np.ndarray:
    """Coarse-solve data from the densified coarsest operator (f64 host).

    "chol": lower Cholesky factor (two triangular solves per application).
    "inv": explicit symmetrized inverse — one matmul per application, i.e.
    one serialized device stage instead of two (the relay's ~0.5 ms
    per-stage latency floor makes that the faster coarse solve; at the
    ≤ coarse_size sizes involved the inverse is numerically benign for a
    preconditioner).
    """
    chol = np.linalg.cholesky(dense)  # also validates SPD in both modes
    if params.coarse_solver == "inv":
        inv = np.linalg.inv(dense)
        return 0.5 * (inv + inv.T)  # exact symmetry keeps the V-cycle SPD
    return chol


def _estimate_lmax_host(a_sp, dinv: np.ndarray, iters: int | None = None
                        ) -> float:
    """Power iteration on D⁻¹A with the same deterministic seed as the
    device version (smoothers.estimate_lmax). The matvec runs the native
    threaded CSR kernel when available (same per-row accumulation order as
    scipy's csr_matvec); norms/dots stay in numpy so fresh setup and
    value-only refresh agree bit-for-bit with each other.

    ``iters=None`` adapts to the level size: 20 power sweeps below 2²²
    rows (the historical default — small-level behavior and every pinned
    iteration count unchanged); at or above 2²² rows a 12-step Lanczos on
    the symmetrized D^{-1/2}·A·D^{-1/2} (same spectrum) replaces it — 12
    matvecs instead of 21 (the L0/L1 power iterations cost 18 s of the
    256³ setup wall) with a CLOSER estimate than power-20
    (tests/test_amg_setup.py pins Lanczos-12 ≥ power-20 on a
    representative operator; both converge to λmax from below)."""
    from ..native import CsrMatvec
    from .host_setup import hash01_np

    if isinstance(a_sp, CsrMatvec):
        apply_a, n = a_sp, a_sp.n
    else:
        apply_a = CsrMatvec(a_sp.indptr, a_sp.indices, a_sp.data,
                            n_cols=a_sp.shape[1])
        n = a_sp.shape[0]
    if iters is None and n >= (1 << 22):
        return _lanczos_lmax_host(apply_a, dinv, n)
    if iters is None:
        iters = 20
    v = hash01_np(np.arange(n)).astype(np.float64) - 0.5
    v /= np.linalg.norm(v)
    for _ in range(iters):
        w = dinv * apply_a(v)
        v = w / np.linalg.norm(w)
    w = dinv * apply_a(v)
    return float(v @ w / (v @ v))


def _lanczos_lmax_host(apply_a, dinv: np.ndarray, n: int, k: int = 12
                       ) -> float:
    """Largest Ritz value of D^{-1/2}·A·D^{-1/2} from a plain 3-term
    Lanczos recurrence (no reorthogonalization — extreme-eigenvalue
    estimates at k ≤ 12 are unaffected by the gradual orthogonality loss
    on these smooth SPD spectra). Deterministic start vector shared with
    the power iteration; used for levels ≥ 2²² rows (see
    _estimate_lmax_host)."""
    from .host_setup import hash01_np

    dsq = np.sqrt(dinv)

    # NOTE: pre-scaling the matrix by D^{-1/2} (one nnz pass) measured
    # SLOWER on chip than the two n-length vector multiplies per sweep:
    # the ~3 GB of fresh scaled-data/temp allocations fault pages at this
    # host's ~150–200 MB/s cold-touch rate (256³ L0 lmax 11 → 28 s),
    # while the per-sweep vector temps recycle numpy's free-listed
    # buffers after the first iteration.
    def op(v):
        return dsq * apply_a(dsq * v)
    v = hash01_np(np.arange(n)).astype(np.float64) - 0.5
    v /= np.linalg.norm(v)
    alphas: list = []
    betas: list = []
    v_prev = np.zeros_like(v)
    beta = 0.0
    for _ in range(k):
        w = op(v)
        alpha = float(v @ w)
        w -= alpha * v + beta * v_prev
        alphas.append(alpha)
        beta = float(np.linalg.norm(w))
        if beta == 0.0:   # exact invariant subspace
            break
        betas.append(beta)
        v_prev, v = v, w / beta
    m = len(alphas)
    t = np.diag(alphas)
    if m > 1:
        off = np.asarray(betas[:m - 1])
        t += np.diag(off, 1) + np.diag(off, -1)
    return float(np.linalg.eigvalsh(t).max())


def amg_setup(a, params: AMGParams = AMGParams(), *, keep_host: bool = False,
              flavor: str = "host", grid=None, cache=None):
    """Build the AMG hierarchy for operator ``a`` (Dia, Ell, or scipy CSR).

    ``flavor`` selects the setup-kernel implementation (equivalent results):
    "host" = vectorized numpy (no XLA compiles in the setup loop — fast and
    the default), "device" = jitted jnp kernels (accelerator-resident path).

    ``grid`` (tuple of extents, C order) enables the *structured* coarsening
    mode for tensor-grid stencil operators: strength-driven semicoarsening
    with grid transfers and DIA operators at every level (see
    :mod:`omp_amg_tpu.amg.structured`) — the TPU fast path. Selection
    follows ``params.coarsening`` ("auto" = structured iff ``grid`` given
    and the operator is banded).

    ``cache`` (a :class:`omp_amg_tpu.amg.refresh.SetupCache`) records the
    setup's symbolic decisions (strength mask, C/F split, patterns, plan
    scatter maps) so :func:`omp_amg_tpu.amg.refresh.amg_refresh` can
    rebuild the hierarchy VALUES for a same-sparsity operator without
    re-running pattern discovery (host PMIS flavor only).

    Returns ``Hierarchy`` (and with ``keep_host=True`` also the per-level
    host scipy operators, used by tests and the mixed-precision outer loop).
    """
    import scipy.sparse as sp

    from ..ops.rap import galerkin_product
    from ..sparse.formats import (
        ell_planes_from_dia, ell_planes_from_scipy, ell_planes_to_scipy,
    )
    from ..utils.memtune import tune_malloc
    from . import host_setup as hs

    tune_malloc()   # setup temporaries recycle heap pages (see memtune)

    if isinstance(a, (Dia, Ell)):
        a_dev: object = a
        a_sp = None  # built lazily (dia_to_scipy on huge grids is costly)
    else:
        a_sp = sp.csr_matrix(a)
        a_dev = ell_from_scipy(a_sp)

    dtype = a_dev.dtype
    if jnp.dtype(dtype) == np.float64 and not jax.config.jax_enable_x64:
        # device arrays are f32 under default JAX config; setup accuracy is
        # carried by the numpy f64 host planes regardless. Make the device
        # dtype explicit instead of letting jnp.asarray truncate with a
        # warning per level (VERDICT r1 #8).
        dtype = jnp.float32

    structured = (
        params.coarsening == "structured"
        or (params.coarsening == "auto" and grid is not None
            and isinstance(a_dev, Dia))
    )
    if cache is not None and (structured or flavor != "host"):
        raise ValueError(
            "setup cache records the host-flavor classical (PMIS) setup "
            "only — structured hierarchies refresh by re-running their "
            "already-cheap setup")
    if structured:
        if grid is None or int(np.prod(grid)) != a_dev.shape[0]:
            raise ValueError("structured coarsening requires a matching grid")
        if flavor == "device":
            return _amg_setup_structured_device(
                a_dev, tuple(int(g) for g in grid), params, dtype)
        if keep_host and a_sp is None:
            a_sp = _to_scipy(a_dev)
        return _amg_setup_structured(a_dev, a_sp, tuple(int(g) for g in grid),
                                     params, keep_host, dtype)
    cur_planes = None  # (col, val) reused between host-flavor iterations
    if a_sp is None:
        if (isinstance(a_dev, Dia) and isinstance(a_dev.data, np.ndarray)
                and flavor == "host"):
            # fast path: ELL planes + CSR straight from the diagonals —
            # index math instead of scipy's dia→csr conversion plus the
            # fancy-index ELL fill (~14 s of the 27-pt 128³ setup). The
            # f64 planes keep host_ops/Galerkin numerically identical to
            # the dia_to_scipy route (tested).
            c0, v64, _ = ell_planes_from_dia(a_dev, dtype=np.float64)
            a_sp = ell_planes_to_scipy(c0, v64, a_dev.n_rows)
            cur_planes = (c0, v64.astype(np.float32))
            del v64
            if cache is not None:
                # the L0 mask/interp will be computed on DIA-layout planes
                # (padding interleaved, slot = diagonal index); the refresh
                # must reconstruct the SAME layout or its strength/pattern
                # guards compare against mismatched slot positions
                cache.l0_dia = True
        else:
            a_sp = _to_scipy(a_dev)

    from ..utils.pack import DeferredUpload

    batch = DeferredUpload()   # one relay transfer per dtype for ALL level
    np_dt = np.dtype(jnp.dtype(dtype).name)  # arrays (see utils/pack.py)
    levels = []
    host_ops = [a_sp]
    trace = _SetupTrace()
    while (
        a_sp.shape[0] > params.coarse_size
        and len(levels) < params.max_levels - 1
    ):
        n = a_sp.shape[0]
        if flavor == "device":
            # device flavor implements direct interpolation only (standard/
            # ext+i need setup-phase sparse products — host path)
            if params.interp != "direct" and not levels:
                import warnings

                warnings.warn(
                    f"flavor='device' PMIS setup uses direct interpolation; "
                    f"params.interp={params.interp!r} is host-flavor only",
                    stacklevel=2)
            a_ell = _to_ell(a_dev)
            mask = strength_mask(a_ell, params.theta)
            state = pmis(a_ell, mask, max_rounds=params.max_coarsen_rounds)
            cmap, nc = coarse_map(state)
            if nc == 0 or n / max(nc, 1) < params.min_coarsen_factor:
                break
            p = direct_interpolation(a_ell, mask, state, cmap, nc)
            p_sp = ell_to_scipy(p)
        else:
            if cur_planes is None:
                cur_planes = ell_planes_from_scipy(a_sp, dtype=np.float32)[:2]
            col, val = cur_planes
            mask = hs.strength_mask_host(col, val, params.theta)
            trace.mark(f"L{len(levels)} n={n} strength")
            state = hs.pmis_host(col, mask,
                                 max_rounds=params.max_coarsen_rounds)
            trace.mark(f"L{len(levels)} pmis")
            is_c = (state == hs.CPOINT)
            cmap = np.cumsum(is_c.astype(np.int64)) - 1
            nc = int(is_c.sum())
            if nc == 0 or n / max(nc, 1) < params.min_coarsen_factor:
                break
            if cache is not None:
                cache.levels.append(dict(mask=mask, state=state, cmap=cmap,
                                         nc=nc))
            if params.interp == "standard":
                p_col, p_val = hs.standard_interpolation_np(
                    col, val, mask, state, cmap, nc,
                    max_elements=params.interp_max_elements)
            elif params.interp == "extpi":
                p_col, p_val = hs.extpi_interpolation(
                    col, val, mask, state, cmap, nc,
                    max_elements=params.interp_max_elements)
            else:
                p_col, p_val = hs.direct_interpolation_np(col, val, mask,
                                                          state, cmap, nc)
            p_sp = ell_planes_to_scipy(p_col, p_val, nc)
            p = None   # host flavor: device P form chosen at level build
            if cache is not None:
                cache.levels[-1]["p_col"] = p_col.copy()
                cache.levels[-1]["p_valid"] = p_val != 0
        trace.mark(f"L{len(levels)} interp")
        pt_sp = p_sp.T.tocsr()
        trace.mark(f"L{len(levels)} transpose")
        pat_out = {} if cache is not None else None
        ac_sp = galerkin_product(host_ops[-1], p_sp, pt_sp=pt_sp,
                                 patterns_out=pat_out)
        if cache is not None:
            import scipy.sparse as _sp

            lc = cache.levels[-1]
            lc["ac_indptr"] = ac_sp.indptr.copy()
            lc["ac_indices"] = ac_sp.indices.copy()
            # structural A·P / Pᵀ(AP) patterns: the cold refresh's numeric
            # dataflow needs exactly these — recording them here saves its
            # full structural-SpGEMM re-derivation (~150 s at 256³)
            lc.update({k + "_pat": v for k, v in pat_out.items()})
            # p-CSR → pᵀ-CSR data permutation (refresh derives R values
            # from P values without a per-refresh transpose)
            tag = _sp.csr_matrix(
                (np.arange(p_sp.nnz, dtype=np.int64), p_sp.indices,
                 p_sp.indptr), shape=p_sp.shape)
            lc["pt_perm"] = tag.T.tocsr().data.copy()
        # "auto": device probe where it pays — the fine (banded/stencil)
        # level, whose A-side runs the shift-fma dia path with NO panel
        # plan to build (the numpy panel planner costs ~7 s at 96³;
        # non-banded levels would spend more planning than the whole
        # host Gustavson product) and whose size amortizes the device
        # stage floors. Through the AXON RELAY the probe's one-shot XLA
        # compile is relay-side and uncacheable across processes
        # (BASELINE.md) — measured +55 s per fresh setup — so auto
        # resolves to host there; directly-attached TPUs take the device
        # engine. params.rap == "probe" always forces it.
        import os as _os

        on_relay = bool(_os.environ.get("PALLAS_AXON_POOL_IPS"))
        use_probe = params.rap == "probe" or (
            params.rap == "auto" and jax.default_backend() == "tpu"
            and not on_relay
            and len(levels) == 0 and host_ops[-1].nnz >= 1_000_000)
        if use_probe:
            # TPU-resident numeric phase (BASELINE north-star "two-phase
            # symbolic+numeric SpGEMM"): the coarse-operator VALUES come
            # from the colored-probing device RAP (ops/probe_rap.py); the
            # host product above provides the symbolic pattern (and the
            # fallback when a plan cap is exceeded). "auto" limits the
            # device phase to levels whose size amortizes its per-call
            # stage floors (~1 ms each through the relay).
            from ..ops.probe_rap import build_rap_probe, rap_probe_numeric

            rap_probe, _ = build_rap_probe(host_ops[-1], p_sp, ac_sp=ac_sp)
            if rap_probe is not None:
                vals = np.asarray(rap_probe_numeric(rap_probe))
                lengths = np.diff(ac_sp.indptr)
                pos = np.arange(ac_sp.nnz) - np.repeat(
                    ac_sp.indptr[:-1].astype(np.int64), lengths)
                rr = np.repeat(np.arange(ac_sp.shape[0], dtype=np.int64),
                               lengths)
                ac_sp = ac_sp.copy()
                ac_sp.data = vals[rr, pos].astype(np.float64)
        trace.mark(f"L{len(levels)} RAP")
        r = ell_from_scipy(pt_sp, dtype=dtype) if flavor == "device" else None
        if params.smoother == "l1jacobi":
            # l1 smoother: D = diag(Σ_j |a_ij|); host row sums (setup is
            # host-orchestrated here and a_sp is already materialized)
            dinv_np = 1.0 / np.asarray(np.abs(a_sp).sum(axis=1)).ravel()
            dinv = batch.add(dinv_np, np_dt)
            lmax = batch.add(np.asarray(_estimate_lmax_host(a_sp, dinv_np),
                                        np_dt))
        elif flavor == "device":
            dinv = 1.0 / diagonal(a_dev)
            lmax = estimate_lmax(a_dev, dinv)
            dinv = dinv.astype(dtype)
            lmax = lmax.astype(dtype)
        else:
            dinv_np = 1.0 / a_sp.diagonal()
            lmax = batch.add(np.asarray(_estimate_lmax_host(a_sp, dinv_np),
                                        np_dt))
            dinv = batch.add(dinv_np, np_dt)
        trace.mark(f"L{len(levels)} lmax")
        # operator forms: decide BEFORE any device upload so every array
        # crosses the (slow) host→device boundary exactly once
        use_routed = params.routed == "force" or (
            params.routed == "auto" and jax.default_backend() == "tpu")
        a_lvl = a_dev
        if isinstance(a_dev, Dia) and jax.default_backend() == "tpu":
            # banded fine operator: the plane-major DIA kernel is ~80× the
            # routed format on stencils — never trade it away. Route
            # through HOST planes when the device operator's data lives on
            # the accelerator: the device to_plane_dia branch compiles a
            # transpose+bf16-check program relay-side (~50 s at 27-pt
            # 128³, uncacheable), while the host branch is the native
            # plane packer (0.14 s) and ships the packed (often bf16)
            # planes through the ONE batched upload.
            from ..sparse.formats import dia_planes_from_csr, to_plane_dia

            a_for_pm = a_dev
            if not isinstance(a_dev.data, np.ndarray) and a_sp is not None:
                offs_h, data_h = dia_planes_from_csr(a_sp)
                if tuple(offs_h) == tuple(a_dev.offsets):
                    a_for_pm = Dia(data=data_h, offsets=a_dev.offsets,
                                   dims=a_dev.dims)
            a_pm = to_plane_dia(a_for_pm, dtype="auto", put=batch.add)
            if a_pm is not None:
                a_lvl = a_pm
            trace.mark(f"L{len(levels)} a-planes")
        p_lvl, r_lvl = p, r
        if use_routed:
            # routed-ELL views: the TPU-fast general-sparsity SpMV format
            # (XLA gather ≈ 0.1 Gelem/s on chip — see sparse/routed.py).
            # Only replaces ELL (gather-path) operators; DIA stays banded.
            from ..sparse.routed import routed_from_scipy

            def _mo(key):
                if cache is None:
                    return None
                return cache.levels[-1].setdefault(key, {})

            def _split_routed(m, dt):
                # cap-overflow fallback (VERDICT r3 #8): column-split
                # composition of routed plans — keeps TPU-kernel SpMV for
                # operators a single plan cannot cover (span/chunk caps)
                from ..sparse.routed import routed_split_from_scipy

                return routed_split_from_scipy(m, dtype=dt, put=batch.add)

            def _warn_unrouted(what, m):
                # VERDICT r3 #8: the XLA-ELL gather fallback runs at
                # ~0.1 Gelem/s on this chip — effectively unusable. Never
                # fall there silently.
                if (params.routed != "force"
                        and jax.default_backend() != "tpu"):
                    return
                import warnings

                warnings.warn(
                    f"L{len(levels)} {what} (n={m.shape[0]}, nnz={m.nnz}) "
                    "exceeds the routed-ELL plan caps (sparse/routed.py "
                    "NB/S/NC) even after column splitting and falls back "
                    "to the XLA gather path — ~100× slower on TPU. "
                    "Consider reordering/partitioning the operator.",
                    stacklevel=3)

            if a_lvl is None or isinstance(a_lvl, Ell):
                # huge coarse A operators store bf16 values like P/R
                # (OMP_AMG_A_BF16: 1 = always, 0 = never, auto = n ≥ 2²²):
                # halves the A[1] plan's HBM/upload/SpMV-stream bytes at
                # 256³ — and is what lets a refreshed value set fit next
                # to the shared plan geometry in 16 GB. The smoother sees
                # ~3 fewer decimal digits in A[1]; the f64 IR certifies
                # the end result regardless (round-5 measurement:
                # certified iterations unchanged at 256³).
                import os as _os3

                _a_gate = _os3.environ.get("OMP_AMG_A_BF16", "auto")
                a_dt = dtype
                if _a_gate == "1" or (_a_gate == "auto" and n >= (1 << 22)):
                    a_dt = jnp.bfloat16
                rt = routed_from_scipy(a_sp, dtype=a_dt, put=batch.add,
                                       map_out=_mo("a_map"))
                if rt is None:
                    rt = _split_routed(a_sp, a_dt)
                if rt is not None:
                    a_lvl = rt
                else:
                    _warn_unrouted("A", a_sp)
                trace.mark(f"L{len(levels)} a-plan")
            # transfer operators at headline scale store bf16 values: P/R
            # weights tolerate half precision (the preconditioner changes
            # by ~1e-3 relative; the f64 IR outer certifies the solution
            # regardless) and the full-f32 256³ plan set exceeds HBM.
            # OMP_AMG_PR_BF16: 1 = always, 0 = never, auto = n ≥ 2^22.
            import os as _os2

            _pr_gate = _os2.environ.get("OMP_AMG_PR_BF16", "auto")
            pr_dt = dtype
            if _pr_gate == "1" or (_pr_gate == "auto" and n >= (1 << 22)):
                pr_dt = jnp.bfloat16
            rt = routed_from_scipy(p_sp, dtype=pr_dt, put=batch.add,
                                   map_out=_mo("p_map"))
            if rt is None:
                rt = _split_routed(p_sp, pr_dt)
            if rt is not None:
                p_lvl = rt
            else:
                _warn_unrouted("P", p_sp)
            trace.mark(f"L{len(levels)} p-plan")
            rt = routed_from_scipy(pt_sp, dtype=pr_dt, put=batch.add,
                                   map_out=_mo("r_map"))
            if rt is None:
                rt = _split_routed(pt_sp, pr_dt)
            if rt is not None:
                r_lvl = rt
            else:
                _warn_unrouted("R", pt_sp)
        if isinstance(a_lvl, Dia) and isinstance(a_lvl.data, np.ndarray):
            # host-built banded operator that stayed plain DIA (2D grids
            # have no plane-major form): ship it through the one batched
            # upload — a numpy leaf in the hierarchy would re-transfer on
            # every jitted solve call
            a_lvl = Dia(data=batch.add(np.ascontiguousarray(a_lvl.data,
                                                            np_dt)),
                        offsets=a_lvl.offsets, dims=a_lvl.dims)
        if a_lvl is None:  # deferred host-flavor ELL upload (no routed)
            a_lvl = Ell(col=batch.add(cur_planes[0]),
                        val=batch.add(cur_planes[1], np_dt), n_cols=n)
        if p_lvl is None:
            p_lvl = Ell(col=batch.add(p_col),
                        val=batch.add(p_val, np_dt), n_cols=nc)
        if r_lvl is None:
            r_lvl = ell_from_scipy(pt_sp, dtype=dtype, put=batch.add)
        trace.mark(f"L{len(levels)} operator form")
        levels.append(Level(a=a_lvl, dinv=dinv, p=p_lvl, r=r_lvl, lmax=lmax))
        if cache is not None:
            lc = cache.levels[-1]
            lc["a_kind"] = type(a_lvl).__name__
            lc["p_kind"] = type(p_lvl).__name__
            lc["r_kind"] = type(r_lvl).__name__
        a_sp = ac_sp
        if flavor == "device":
            a_dev = ell_from_scipy(ac_sp, dtype=dtype)
        else:
            # next level's device form is chosen (routed vs ELL) at ITS
            # level build — keep host planes only, upload nothing here
            cur_planes = ell_planes_from_scipy(ac_sp, dtype=np.float32)[:2]
            a_dev = None
            trace.mark(f"L{len(levels)} next-planes")
        host_ops.append(a_sp)

    dense = np.asarray(a_sp.toarray(), dtype=np.float64)
    fac = _coarse_factor(dense, params)
    hier = batch.resolve(Hierarchy(
        levels=tuple(levels),
        coarse_chol=batch.add(fac, np_dt),
        coarse_a=batch.add(dense, np_dt),
        params=params,
    ))
    if cache is not None:
        cache.finish(hier, params, dtype)
    if keep_host:
        return hier, host_ops
    return hier


def _estimate_lmax_apply(apply_fn, dinv: np.ndarray, n: int,
                         iters: int = 20, dtype=np.float64) -> float:
    from .host_setup import hash01_np

    dinv = np.asarray(dinv, dtype)
    v = hash01_np(np.arange(n)).astype(dtype) - np.dtype(dtype).type(0.5)
    v /= np.linalg.norm(v)
    for _ in range(iters):
        w = dinv * apply_fn(v)
        v = w / np.linalg.norm(w)
    w = dinv * apply_fn(v)
    return float(v @ w / (v @ v))


def _dia_apply_np(offsets, data: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Banded matvec via numpy slices (no per-call native/OMP spawn
    overhead — measured faster than the OpenMP kernel at every level size
    on this 2-core box when ``data`` is f32)."""
    y = np.zeros_like(v)
    n = v.shape[0]
    for k, off in enumerate(offsets):
        i0, i1 = max(0, -off), min(n, n - off)
        if i1 > i0:
            y[i0:i1] += data[k, i0:i1] * v[i0 + off:i1 + off]
    return y


def _amg_setup_structured(a_dev, a_sp, dims, params: AMGParams,
                          keep_host: bool, dtype):
    """Structured-mode setup: semicoarsen strong axes, grid transfers, RAP.

    The Galerkin product uses lattice-comb probing (:mod:`comb_rap`) on f64
    numpy DIA planes — no sparse matrix products anywhere in the loop; the
    scipy SpGEMM remains only as the fallback when the probe detects an
    operator outside the radius-1 contract.
    """
    from ..sparse.formats import Dia, dia_planes_from_scipy, dia_to_scipy
    from . import comb_rap as cr
    from .structured import GridProlong, GridRestrict, strong_axes

    # f64 host planes of the current level
    if isinstance(a_dev, Dia):
        offsets = list(a_dev.offsets)
        data = None
        import os

        synth_min = float(os.environ.get("OMP_AMG_CONST_SYNTH_MIN_MB",
                                         "150")) * 1e6
        if (params.const_stencil != "off"
                and not isinstance(a_dev.data, np.ndarray)
                and a_dev.data.size * a_dev.data.dtype.itemsize >= synth_min):
            # large accelerator-resident fine operator: when it is a
            # masked-constant stencil (the Poisson/BASELINE family), the
            # host f64 planes are index math — synthesizing them skips the
            # device→host pull of the whole operator (~13 MB/s through the
            # axon relay). The on-device equality check costs one cold XLA
            # compile (~30–60 s via the relay), so this only pays above a
            # size threshold; below it the plain pull is cheaper.
            from ..sparse.formats import to_const_dia

            cd = to_const_dia(a_dev)
            if cd is not None:
                # box-fill synthesis: each tap's valid region is a box, so
                # the f64 planes are one zeros alloc + interior fills (the
                # mask formulation stacked 3^d full-length temporaries —
                # measured 3.8 s at 27-pt 128³, now ~0.2 s)
                nz0, ny0, nx0 = (int(d) for d in a_dev.dims)
                data = np.zeros((len(cd.coeffs), nz0 * ny0 * nx0),
                                np.float64)
                v3 = data.reshape(-1, nz0, ny0, nx0)
                for k, ((dz, dy, dx), c) in enumerate(zip(cd.taps,
                                                          cd.coeffs)):
                    v3[k, max(0, -dz):nz0 - max(0, dz),
                       max(0, -dy):ny0 - max(0, dy),
                       max(0, -dx):nx0 - max(0, dx)] = c
        if data is None:
            data = np.asarray(a_dev.data, dtype=np.float64)
    else:
        offsets, data = dia_planes_from_scipy(a_sp)  # f64 numpy end-to-end

    from ..utils.pack import DeferredUpload

    batch = DeferredUpload()
    np_dt = np.dtype(jnp.dtype(dtype).name)
    levels = []
    host_ops = [a_sp] if keep_host else None
    trace = _SetupTrace()
    n = int(np.prod(dims))
    while n > params.coarse_size and len(levels) < params.max_levels - 1:
        axes = strong_axes((offsets, data), dims, params.theta)
        trace.mark(f"L{len(levels)} n={n} strength/axes")
        if not any(axes):
            break
        coarse_dims = tuple((d + 1) // 2 if c else d
                            for d, c in zip(dims, axes))
        p = GridProlong(fine_shape=dims, coarse_shape=coarse_dims,
                        coarsened=axes)
        r = GridRestrict(fine_shape=dims, coarse_shape=coarse_dims,
                         coarsened=axes)
        try:
            import os

            if (os.environ.get("OMP_AMG_DEVICE_RAP") == "1"
                    and jax.default_backend() == "tpu" and n >= (1 << 20)):
                # accelerator-resident RAP (one jitted comb graph per level)
                offs_c, data_dev = cr.comb_rap_device(
                    offsets, jnp.asarray(data, jnp.float32), dims,
                    coarse_dims, axes)
                data_c = np.asarray(data_dev, np.float64)
            else:
                offs_c, data_c = cr.structured_rap(offsets, data, dims,
                                                   coarse_dims, axes)
        except ValueError:
            # operator outside the radius-1 contract → exact sparse product
            from ..ops.rap import galerkin_product
            from .structured import prolong_to_scipy

            cur_sp = dia_to_scipy(Dia(data=data, offsets=tuple(offsets)))
            ac_sp = galerkin_product(cur_sp, prolong_to_scipy(p))
            offs_c, data_c = dia_planes_from_scipy(ac_sp)

        trace.mark(f"L{len(levels)} RAP")
        if params.smoother == "l1jacobi":
            # DIA invariant: out-of-range taps are stored as exact zeros,
            # so the row l1 sum is a plane-wise |·| reduction
            dinv_np = 1.0 / np.abs(data).sum(axis=0)
        else:
            dinv_np = 1.0 / data[offsets.index(0)]
        data_f = np.ascontiguousarray(
            data, np.dtype(jnp.dtype(dtype).name))  # one pass, reused below
        from .. import native

        if data_f.dtype == np.float32 and n >= (1 << 18) \
                and native.available():
            apply_fn = lambda v: native.dia_apply(offsets, data_f, v)
        else:   # small levels: per-call OMP spawn outweighs the kernel
            apply_fn = lambda v: _dia_apply_np(offsets, data_f, v)
        lmax = _estimate_lmax_apply(apply_fn, dinv_np, n,
                                    dtype=data_f.dtype)
        trace.mark(f"L{len(levels)} lmax")
        # operator form decided AND PACKED on host: no eager Dia upload
        # (the old order shipped the full planes to the device, then threw
        # them away whenever const/plane detection replaced the form), no
        # per-level device-compile for the plane-major layout
        a_lvl = None
        host_dia = Dia(data=data_f, offsets=tuple(offsets), dims=dims)
        if params.const_stencil != "off":
            # detect masked-constant stencils on the host f32 planes (no
            # device traffic); typically hits the finest level only —
            # Galerkin coarse operators have boundary-modified values
            from ..sparse.formats import to_const_dia

            a_lvl = to_const_dia(host_dia, put=batch.add)
            # matrix-free: streams x/y only (~2.8× PlaneDia)
        if a_lvl is None and jax.default_backend() == "tpu":
            from ..sparse.formats import to_plane_dia

            a_lvl = to_plane_dia(host_dia, dtype="auto", put=batch.add)
            # plane-major: 2× SpMV bandwidth on chip
        if a_lvl is None:
            a_lvl = Dia(data=batch.add(data_f), offsets=tuple(offsets),
                        dims=dims)
        trace.mark(f"L{len(levels)} operator form ({type(a_lvl).__name__})")
        levels.append(Level(a=a_lvl, dinv=batch.add(dinv_np, np_dt),
                            p=p, r=r,
                            lmax=batch.add(np.asarray(lmax, np_dt))))
        offsets, data, dims = offs_c, np.asarray(data_c), coarse_dims
        n = int(np.prod(dims))
        if keep_host:
            host_ops.append(dia_to_scipy(Dia(data=data,
                                             offsets=tuple(offsets))))

    # densify the coarsest level directly from its diagonals
    dense = np.zeros((n, n), dtype=np.float64)
    for k, off in enumerate(offsets):
        i0, i1 = max(0, -off), min(n, n - off)
        if i1 > i0:
            idx = np.arange(i0, i1)
            dense[idx, idx + off] = data[k, i0:i1]
    fac = _coarse_factor(dense, params)
    hier = batch.resolve(Hierarchy(
        levels=tuple(levels),
        coarse_chol=batch.add(fac, np_dt),
        coarse_a=batch.add(dense, np_dt),
        params=params,
    ))
    if keep_host:
        return hier, host_ops
    return hier


@jax.jit
def _diag_stats(data):
    """(per-diagonal nonzero-mean, count) — the only per-level host pulls of
    the device-resident setup."""
    counts = jnp.sum(data != 0, axis=1)
    sums = jnp.sum(data, axis=1)
    return sums / jnp.maximum(counts, 1), counts


def _amg_setup_structured_device(a_dev, dims, params: AMGParams, dtype):
    """Accelerator-resident structured setup (SURVEY.md L2 contract).

    Every level's operator stays on device: Galerkin RAP via the jitted
    lattice-comb graph, λmax by on-device power iteration, diagonals by
    slicing. Only O(ndiag) scalars (axis statistics, validation residual)
    and the tiny coarsest matrix cross the host boundary. First run pays
    one XLA compile per level shape (amortized by the persistent cache).
    """
    from ..sparse.formats import Dia, to_plane_dia
    from . import comb_rap as cr
    from .structured import (
        GridProlong, GridRestrict, strong_axes_from_values,
    )

    if not isinstance(a_dev, Dia):
        raise TypeError("device structured setup needs a Dia operator")
    trace = _SetupTrace()
    offsets = list(a_dev.offsets)
    data = jnp.asarray(a_dev.data, dtype)
    levels = []
    n = int(np.prod(dims))
    while n > params.coarse_size and len(levels) < params.max_levels - 1:
        means, _ = _diag_stats(data)
        axes = strong_axes_from_values(offsets, np.asarray(means), dims,
                                       params.theta)
        trace.mark(f"L{len(levels)} n={n} strength/axes")
        if not any(axes):
            break
        coarse_dims = tuple((d + 1) // 2 if c else d
                            for d, c in zip(dims, axes))
        p = GridProlong(fine_shape=dims, coarse_shape=coarse_dims,
                        coarsened=axes)
        r = GridRestrict(fine_shape=dims, coarse_shape=coarse_dims,
                         coarsened=axes)
        # device RAP auto-selects the per-axis-factored engine (MXU matmul
        # parity extraction; 10-35× faster than comb probing on chip, zero
        # strided slices) with comb as the general fallback — see comb_rap.
        offs_c, data_c = cr.comb_rap_device(offsets, data, dims, coarse_dims,
                                            axes)
        trace.mark(f"L{len(levels)} RAP", sync=data_c)
        if params.smoother == "l1jacobi":
            dinv = 1.0 / jnp.sum(jnp.abs(data), axis=0)
        else:
            dinv = 1.0 / data[offsets.index(0)]
        cur = Dia(data=data, offsets=tuple(offsets), dims=dims)
        lmax = jax.jit(estimate_lmax)(cur, dinv).astype(dtype)
        trace.mark(f"L{len(levels)} lmax", sync=lmax)
        a_lvl = None
        if params.const_stencil != "off":
            from ..sparse.formats import to_const_dia

            a_lvl = to_const_dia(cur)  # O(1) host traffic (scalars + bool)
        if a_lvl is None:
            a_lvl = to_plane_dia(cur, dtype="auto")
        if a_lvl is None:
            a_lvl = cur
        trace.mark(f"L{len(levels)} operator form "
                   f"({type(a_lvl).__name__})")
        levels.append(Level(a=a_lvl, dinv=dinv.astype(dtype), p=p, r=r,
                            lmax=lmax))
        offsets, data, dims = offs_c, jnp.asarray(data_c, dtype), coarse_dims
        n = int(np.prod(dims))

    data_np = np.asarray(data, np.float64)
    dense = np.zeros((n, n), dtype=np.float64)
    for k, off in enumerate(offsets):
        i0, i1 = max(0, -off), min(n, n - off)
        if i1 > i0:
            idx = np.arange(i0, i1)
            dense[idx, idx + off] = data_np[k, i0:i1]
    fac = _coarse_factor(dense, params)
    return Hierarchy(levels=tuple(levels),
                     coarse_chol=jnp.asarray(fac, dtype=dtype),
                     coarse_a=jnp.asarray(dense, dtype=dtype), params=params)


def hierarchy_stats(hier: Hierarchy, host_ops=None) -> dict:
    """Grid/operator complexities and per-level sizes (reference metrics)."""
    sizes = [lv.a.shape[0] for lv in hier.levels] + [hier.coarse_a.shape[0]]
    out = {"levels": len(sizes), "sizes": sizes}
    if host_ops is not None:
        nnzs = [int(op.nnz) for op in host_ops]
        out["nnz"] = nnzs
        out["operator_complexity"] = float(sum(nnzs) / nnzs[0])
        out["grid_complexity"] = float(sum(sizes) / sizes[0])
    return out
