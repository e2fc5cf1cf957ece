"""Value-only hierarchy refresh (two-phase symbolic+numeric setup).

Parity: the reference's amortized two-phase SpGEMM contract (SURVEY.md §2
#3 [B] "two-phase symbolic+numeric"; VERDICT r3 #4): time-dependent
coefficients re-solve on the SAME sparsity, so the symbolic work —
strength graph, PMIS C/F split, interpolation pattern, Galerkin pattern,
routed-ELL plan geometry, device plan uploads — is paid once by
``amg_setup(..., cache=SetupCache())`` and every subsequent
``amg_refresh(a_new, cache)`` recomputes VALUES only.

The FIRST refresh additionally freezes the numeric dataflow (cold phase):
per level it records the CSR patterns of A, P, Pᵀ, A·P and Pᵀ·(A·P), the
value maps between storage forms (DIA→CSR selection, CSR→ELL slot
positions, P-ELL→CSR positions, diagonal positions), and val4-sorted
scatter orders for the routed device plans. Warm refreshes then run pure
numeric kernels:

- strength/PMIS rounds: skipped (cached mask/state/cmap); ``verify_mask``
  re-checks the strength mask from the new values (native kernel);
- interpolation: numeric re-run on the cached pattern (native ext+i) with
  a pattern-equality guard — value changes that flip the strength or
  truncation decisions raise :class:`PatternChangedError` (callers fall
  back to a fresh setup);
- Galerkin products: numeric-only native SpGEMM into the cached A·P and
  Pᵀ·(A·P) patterns (csrc ``spgemm_numeric``: one FMA per term, no
  symbolic pass, no sorts); entries the fresh setup eliminated as exact
  zeros are guarded — a resurrected entry raises ``PatternChangedError``;
- λmax: the same power iteration as fresh setup, with the matvec on the
  native threaded CSR kernel (shared helper — fresh and refreshed
  hierarchies agree bit-for-bit);
- routed-ELL device plans: GEOMETRY (lidx/soff/cbase/kch/sbase) is reused
  from the cached hierarchy — only the CSR value streams cross the
  host→device boundary (4 B/nnz instead of the full ~16 B/nnz plan
  re-upload), pre-sorted host-side into val4 order so the device refill is
  a sorted unique scatter;
- R values are never shipped: R = Pᵀ shares P's uploaded stream, and its
  scatter positions are composed with the cached transpose permutation at
  cold time.

The refreshed hierarchy matches a fresh setup exactly in structure and to
f32-roundoff in values (tests pin both).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.formats import Dia
from .params import AMGParams


class PatternChangedError(RuntimeError):
    """The new values changed a symbolic decision (strength, interpolation
    truncation, or Galerkin pattern); the cache cannot be applied."""


def cache_nbytes(cache) -> int:
    """Host-memory footprint of a setup cache's numpy state in bytes
    (per-level patterns, masks, scatter maps — the price of the two-phase
    amortization; reported by the refresh benches)."""
    seen: set = set()
    total = 0

    def walk(o):
        nonlocal total
        if isinstance(o, np.ndarray):
            if id(o) not in seen:
                seen.add(id(o))
                total += o.nbytes
        elif isinstance(o, dict):
            for v in o.values():
                walk(v)
        elif isinstance(o, (list, tuple)):
            for v in o:
                walk(v)

    walk(getattr(cache, "levels", []))
    return total


class SetupCache:
    """Symbolic record of a host-flavor PMIS setup (see amg_setup(cache=))."""

    def __init__(self):
        self.levels: List[dict] = []
        self.hier = None
        self.params: Optional[AMGParams] = None
        self.dtype = None

    def finish(self, hier, params, dtype):
        self.hier = hier
        self.params = params
        self.dtype = dtype


@functools.lru_cache(maxsize=32)
def _scatter_all_fn(specs):
    """ONE jitted program scattering every routed operator's value stream
    into its val4 geometry — a single relay-side compile per hierarchy
    shape set instead of one per operator (the per-op jits cost ~90 s of
    cold-refresh relay compiles). ``specs[i] = (size, dtype, sorted)`` —
    streams are host-sorted into val4 order where possible so the scatter
    lowers with indices_are_sorted (R reuses P's stream through a composed
    permutation, so its positions are unique but unsorted). The value
    STREAMS are donated (≈2 GB at 256³ — without this the refill held
    streams + new val4 simultaneously and OOM'd); the position arrays are
    cached across refreshes and must NOT be."""

    def run(poss, vals_in):
        out = []
        for (shape, dt, srt, vi), pos in zip(specs, poss):
            size = 1
            for s in shape:
                size *= s
            filled = jnp.zeros((size,), dt).at[pos].set(
                vals_in[vi].astype(dt), indices_are_sorted=srt,
                unique_indices=True)
            # reshape INSIDE the program: as a standalone dispatch it
            # copies (another val4-sized buffer per op — OOM'd at 256³)
            out.append(filled.reshape(shape))
        return tuple(out)

    return jax.jit(run, donate_argnums=(1,))


def _refill_routed_all(jobs):
    """jobs: list of (old_op, mp, stream_dev) → list of refreshed ops.

    Streams are deduplicated before the jitted scatter (R rides P's
    uploaded stream — it must appear once in the donated operand list)."""
    specs = []
    poss = []
    vals = []
    vidx: dict = {}
    for old, mp, stream in jobs:
        shape = mp["val4_shape"]
        size = int(np.prod(shape))
        if "pos_dev" not in mp:
            assert size < (1 << 31)
            mp["pos_dev"] = jnp.asarray(mp["pos"].astype(np.int32))
        vi = vidx.get(id(stream))
        if vi is None:
            vi = vidx[id(stream)] = len(vals)
            vals.append(stream)
        specs.append((tuple(int(s) for s in shape),
                      jnp.dtype(old.val4.dtype).name,
                      bool(mp.get("sorted", False)), vi))
        poss.append(mp["pos_dev"])
    out = _scatter_all_fn(tuple(specs))(poss, vals)
    return [dataclasses.replace(old, val4=v4)
            for (old, mp, _), v4 in zip(jobs, out)]



def _i32(a):
    """Cache maps as int32 when values fit (they index arrays < 2³¹ —
    asserted); halves the multi-GB host cache at 256³. Falls back to
    int64 only for the rare oversized map."""
    a = np.asarray(a)
    if a.size and int(a.max()) >= (1 << 31):
        return np.ascontiguousarray(a, np.int64)
    return np.ascontiguousarray(a, np.int32)

def _pat(indptr, indices, n_cols):
    """Contiguous (indptr int64, indices int32, n_cols) pattern triple."""
    return (np.ascontiguousarray(indptr, np.int64),
            np.ascontiguousarray(indices, np.int32), int(n_cols))


def _csr_of(pat, data):
    import scipy.sparse as sp

    indptr, indices, n_cols = pat
    m = sp.csr_matrix((data, indices, indptr),
                      shape=(len(indptr) - 1, n_cols))
    m.has_sorted_indices = True   # cached patterns are canonical
    return m


def _ell_pos(indptr, k):
    """Flat (row*k + slot) position of each CSR entry in its ELL plane."""
    lengths = np.diff(indptr)
    pos = np.arange(indptr[-1], dtype=np.int64) - np.repeat(
        np.asarray(indptr[:-1], np.int64), lengths)
    rows = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    return pos + rows * k


def _build_level_num(c, a_pat, p_sp, host_dia0):
    """Freeze the level's numeric dataflow (cold refresh, once)."""
    import scipy.sparse as sp

    from .. import native

    num: dict = {"a_pat": a_pat}
    indptr, indices, n_cols = a_pat
    nnz = int(indptr[-1])
    n = len(indptr) - 1

    if host_dia0 is not None:
        # DIA flat → CSR data order selection (scipy's dia→csr drops
        # exact zeros, so tag the *currently nonzero* entries — the
        # refresh contract keeps the nonzero set fixed)
        from ..sparse.formats import dia_to_scipy

        flat = np.asarray(host_dia0.data, np.float64).ravel()
        base = np.flatnonzero(flat)
        tags = np.zeros_like(flat)
        tags[base] = base + 1.0
        tag_dia = Dia(data=tags.reshape(np.asarray(host_dia0.data).shape),
                      offsets=host_dia0.offsets, dims=host_dia0.dims)
        tag_csr = sp.csr_matrix(dia_to_scipy(tag_dia))
        tag_csr.sort_indices()
        if tag_csr.nnz != nnz:
            raise PatternChangedError("L0: DIA nonzero set changed")
        num["dia_sel"] = _i32(tag_csr.data.astype(np.int64) - 1)
        num["dia_size"] = flat.size

    # CSR → ELL value positions + cached col planes (strength/interp run
    # on ELL planes)
    k = int(c["mask"].shape[1])
    num["ell_k"] = k
    num["ell_pos"] = _i32(_ell_pos(indptr, k))
    col = np.zeros((n, k), np.int32)
    col.ravel()[num["ell_pos"]] = indices
    num["col_planes"] = col

    # diagonal positions (dinv)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    dpos = np.flatnonzero(indices.astype(np.int64) == rows)
    num["diag_pos"] = dpos if len(dpos) == n else None

    # P: ELL → CSR value positions (valid slots reordered to the
    # canonical row/column-sorted CSR order — ext+i emits sorted rows
    # already, standard/direct may not), P/Pᵀ patterns
    p_valid = c["p_valid"]
    valid_flat = np.flatnonzero(p_valid.ravel())
    me = p_valid.shape[1]
    v_rows = valid_flat // me
    v_cols = c["p_col"].ravel()[valid_flat].astype(np.int64)
    order = np.argsort(v_rows * int(p_sp.shape[1]) + v_cols, kind="stable")
    num["p_pos"] = _i32(valid_flat[order])
    num["p_pat"] = _pat(p_sp.indptr, p_sp.indices, p_sp.shape[1])
    pt_sp = p_sp.T.tocsr()
    pt_sp.sort_indices()
    num["pt_pat"] = _pat(pt_sp.indptr, pt_sp.indices, pt_sp.shape[1])
    num["pt_perm"] = _i32(c["pt_perm"])

    # Galerkin patterns: structural A·P and Pᵀ·(A·P) (native two-phase
    # SpGEMM keeps exact-zero products; the hierarchy's cached ac pattern
    # eliminated them, so map structural → kept positions). The setup
    # records both patterns when caching (galerkin_product patterns_out)
    # — the Gustavson pattern is value-independent, so they equal the
    # ones-product this block otherwise re-derives (~150 s at 256³).
    if "ap_pat" in c and "acs_pat" in c:
        num["ap_pat"] = _pat(*c["ap_pat"])
        num["acs_pat"] = _pat(*c["acs_pat"])
    else:
        a64 = _csr_of(a_pat, np.ones(nnz))
        ap = native.spgemm(a64, _csr_of(num["p_pat"], np.ones(p_sp.nnz)))
        acs = native.spgemm(_csr_of(num["pt_pat"], np.ones(pt_sp.nnz)), ap)
        num["ap_pat"] = _pat(ap.indptr, ap.indices, ap.shape[1])
        num["acs_pat"] = _pat(acs.indptr, acs.indices, acs.shape[1])
        del ap, acs
    acs_indptr, acs_indices, ncc = num["acs_pat"]
    acs_rows = np.repeat(np.arange(len(acs_indptr) - 1, dtype=np.int64),
                         np.diff(acs_indptr))
    acs_keys = acs_rows * ncc + acs_indices.astype(np.int64)
    ac_rows = np.repeat(np.arange(len(c["ac_indptr"]) - 1, dtype=np.int64),
                        np.diff(c["ac_indptr"]))
    ac_keys = ac_rows * ncc + c["ac_indices"].astype(np.int64)
    keep = np.searchsorted(acs_keys, ac_keys)
    if (keep >= len(acs_keys)).any() or not np.array_equal(
            acs_keys[keep], ac_keys):
        raise PatternChangedError("Galerkin structural pattern mismatch")
    num["keep"] = _i32(keep)
    mask = np.ones(len(acs_keys), bool)
    mask[keep] = False
    num["dropped"] = _i32(np.flatnonzero(mask))
    return num


def _rap_numeric(num, a_data, p_data):
    """ac values on the cached pattern: numeric-only Pᵀ·(A·P)."""
    from .. import native

    ap_val = native.spgemm_numeric(num["a_pat"], a_data, num["p_pat"],
                                   p_data, num["ap_pat"])
    pt_val = native.perm_gather(num["pt_perm"], p_data)
    acs_val = native.spgemm_numeric(num["pt_pat"], pt_val, num["ap_pat"],
                                    ap_val, num["acs_pat"])
    dropped = num["dropped"]
    if len(dropped):
        scale = np.abs(acs_val).max() if len(acs_val) else 1.0
        # tolerance is f32-roundoff-sized, not f64: the interpolation
        # values flow through f32 ELL planes, so ANY non-dyadic value
        # change leaves ~1e-8·scale residue on entries that cancelled
        # exactly at setup (measured: a ×1.7 scaling at 24³ leaves
        # 1.4e-8 vs 0.0 for ×2.0). Residue at f32-noise level is
        # numerically irrelevant (the entry is dropped from the cached
        # pattern either way and the f64 IR certifies the solve);
        # anything larger is a genuine pattern change and still raises.
        if np.abs(acs_val[dropped]).max() > 1e-6 * max(scale, 1e-300):
            raise PatternChangedError(
                "Galerkin entry eliminated at setup became nonzero")
    return native.perm_gather(num["keep"], acs_val)


def _release_value_buffers(hier):
    """Free the device VALUE buffers of a hierarchy; plan GEOMETRY arrays
    (lidx/soff/cbase/… and ELL column planes) stay alive — they are all a
    later refresh needs. At 256³ the hierarchy holds ~13 of the chip's
    16 GB, roughly half of it values: without this, the refreshed values
    would have to coexist with the stale ones and the refill OOMs
    (measured round 5). Idempotent; already-deleted buffers are skipped."""
    import jax as _jax

    released = 0

    def _del(arr):
        nonlocal released
        if isinstance(arr, _jax.Array):
            try:
                nb = arr.nbytes
                arr.delete()
                released += nb
            except Exception:
                pass

    for lv in hier.levels:
        for op in (lv.a, lv.p, lv.r):
            for name in ("val4", "val", "data"):
                _del(getattr(op, name, None))
            for part in getattr(op, "parts", ()):   # SplitRoutedEll
                _del(getattr(part, "val4", None))
        _del(lv.dinv)
    _del(hier.coarse_chol)
    _del(hier.coarse_a)
    import os as _os

    if _os.environ.get("OMP_AMG_SETUP_TIMERS") == "1":
        import sys as _sys

        try:
            ms = _jax.devices()[0].memory_stats() or {}
            inuse = ms.get("bytes_in_use", -1) / 1e9
        except Exception:
            inuse = -1
        print(f"[refresh] released {released/1e9:.2f} GB of stale values; "
              f"HBM in use {inuse:.2f} GB", file=_sys.stderr, flush=True)


def _resolve_stream_dtype(stream_dtype: str, fine_elems: int) -> str:
    """Resolve ``stream_dtype="auto"`` to a concrete dtype.

    "auto" ships bf16 streams once the fine operator carries more than
    OMP_AMG_STREAM_BF16_NNZ elements (default 30e6 — the 27-pt 128³ /
    7-pt 256³ class where the warm refresh is transfer-floor-bound on
    the relay and the measured refreshed-solve iteration delta vs f32
    streams is ZERO, BASELINE.md round-5), and exact f32 below it. The
    estimate uses only the fine operator's element count so cold and
    warm refreshes of the same cache resolve identically (a dtype flip
    between refreshes would recompile the device scatter program).
    """
    if stream_dtype != "auto":
        return stream_dtype
    thresh = int(float(os.environ.get("OMP_AMG_STREAM_BF16_NNZ", "3e7")))
    return "bf16" if fine_elems >= thresh else "f32"


def amg_refresh(a_new, cache: SetupCache, *, verify_mask: bool = True,
                stream_dtype: str = "auto", release_old_values: bool = False):
    """Rebuild the cached hierarchy's VALUES for a same-sparsity operator.

    ``a_new``: Dia (same offsets/dims as the cached setup's fine operator)
    or scipy CSR with the same sparsity pattern. Returns a new
    ``Hierarchy`` sharing plan geometry with the cached one.

    ``verify_mask=True`` recomputes the strength mask per level and
    compares with the cache (catches silent strength drift at the cost of
    the native strength pass); the interpolation-pattern and
    Galerkin-pattern guards are always on.

    ``stream_dtype="bf16"`` ships the routed value streams in bfloat16 —
    HALF the host→device bytes. The warm refresh is transfer-floor-bound
    through the axon relay (BASELINE.md: ~26–52 MB/s regardless of
    batching), so this trades ~3 decimal digits in the PRECONDITIONER's
    values (the f64 IR outer still certifies the final residual; measured
    refreshed-solve iteration delta vs f32 streams: ZERO at 96³ and 256³,
    BASELINE.md round-5) for roughly halving the refresh wall.
    ``"auto"`` (the default) picks bf16 above ~30 M fine-operator elements
    (`OMP_AMG_STREAM_BF16_NNZ`) and exact f32 streams below (refreshed ==
    fresh to f32 roundoff); ``"f32"`` forces exactness at any size.

    ``release_old_values=True`` frees the cached hierarchy's device VALUE
    buffers once every pattern guard has passed (plan geometry stays — it
    is shared with the refreshed hierarchy). Required at sizes where
    hierarchy values are a large fraction of HBM (256³: the refill OOMs
    without it); it makes the PREVIOUS hierarchy object unusable, so only
    enable when the caller owns it (the AMGSolver facade does this).
    """
    import scipy.sparse as sp

    from ..native import CsrMatvec
    from ..sparse.formats import (
        dia_to_scipy, ell_planes_from_scipy, to_const_dia, to_plane_dia,
    )
    from ..utils.memtune import tune_malloc
    from ..utils.pack import DeferredUpload

    tune_malloc()
    from . import host_setup as hs
    from .hierarchy import (
        Hierarchy, Level, _SetupTrace, _coarse_factor, _estimate_lmax_host,
    )

    trace = _SetupTrace()

    if cache.hier is None:
        raise ValueError("cache was not finished by amg_setup")
    params = cache.params
    dtype = cache.dtype
    np_dt = np.dtype(jnp.dtype(dtype).name)

    fine_elems = (int(a_new.data.size) if isinstance(a_new, Dia)
                  else int(a_new.nnz))
    stream_dtype = _resolve_stream_dtype(stream_dtype, fine_elems)
    if stream_dtype not in ("f32", "bf16"):
        raise ValueError(f"stream_dtype must be f32, bf16 or auto, got "
                         f"{stream_dtype!r}")
    if stream_dtype == "bf16":
        import ml_dtypes

        st_dt = ml_dtypes.bfloat16
    else:
        st_dt = np.float32

    cold = any("num" not in c for c in cache.levels)
    host_dia0 = None
    if isinstance(a_new, Dia):
        host_dia0 = Dia(data=np.ascontiguousarray(a_new.data, np_dt),
                        offsets=tuple(a_new.offsets), dims=a_new.dims)
        if cold:
            a_sp = sp.csr_matrix(dia_to_scipy(a_new))
            a_sp.sort_indices()
    else:
        a_sp = sp.csr_matrix(a_new)
        if not a_sp.has_sorted_indices:
            a_sp = a_sp.copy()
            a_sp.sort_indices()

    batch = DeferredUpload()
    # (build-op, args...) thunks resolved after the ONE batched upload
    new_levels: List[dict] = []
    a_data = None    # current level's CSR values (f64, cached pattern)
    for li, c in enumerate(cache.levels):
        old = cache.hier.levels[li]
        mask, state, cmap, nc = c["mask"], c["state"], c["cmap"], c["nc"]
        num = c.get("num")
        l0_dia = (li == 0 and host_dia0 is not None
                  and getattr(cache, "l0_dia", False))
        if num is None:
            # ---- cold: symbolic re-derivation + freeze the dataflow ----
            if l0_dia:
                # the setup's Dia fast path computed the L0 mask/interp on
                # DIA-LAYOUT planes (slot = diagonal index, padding
                # interleaved); reconstruct the same layout — CSR-compacted
                # planes put the same entries at different slots and the
                # strength/pattern guards would spuriously trip
                from ..sparse.formats import ell_planes_from_dia

                col, val, _ = ell_planes_from_dia(host_dia0,
                                                  dtype=np.float32)
            else:
                cur = ell_planes_from_scipy(a_sp, dtype=np.float32)
                col, val = cur[0], cur[1]
            if col.shape != mask.shape:
                raise PatternChangedError(f"L{li}: ELL width changed")
            a_pat = _pat(a_sp.indptr, a_sp.indices, a_sp.shape[1])
            a_data = np.ascontiguousarray(a_sp.data, np.float64)
        else:
            # ---- warm: values only ----
            if li == 0:
                if host_dia0 is not None:
                    flat = np.asarray(host_dia0.data, np.float64).ravel()
                    if flat.size != num["dia_size"]:
                        raise PatternChangedError("L0: DIA shape changed")
                    from .. import native as _nat

                    a_data = _nat.perm_gather(num["dia_sel"], flat)
                    if len(a_data) and (a_data == 0).any():
                        raise PatternChangedError(
                            "L0: a stored DIA entry became exactly zero")
                    if np.count_nonzero(flat) != len(a_data):
                        raise PatternChangedError(
                            "L0: DIA nonzero set changed")
                else:
                    ip, ix, ncl = num["a_pat"]
                    # indptr must match too: identical concatenated column
                    # indices with different row boundaries (an entry
                    # moving across a row boundary) would otherwise pass
                    # and silently mis-apply values (ADVICE r4)
                    if (a_sp.shape != (len(ip) - 1, ncl)
                            or a_sp.nnz != len(ix)
                            or not np.array_equal(a_sp.indices, ix)
                            or not np.array_equal(a_sp.indptr, ip)):
                        raise PatternChangedError("L0: CSR pattern changed")
                    a_data = np.ascontiguousarray(a_sp.data, np.float64)
            a_pat = num["a_pat"]
            if l0_dia:
                from ..sparse.formats import ell_planes_from_dia

                col, val, _ = ell_planes_from_dia(host_dia0,
                                                  dtype=np.float32)
            else:
                col = num["col_planes"]
                val = np.zeros(col.shape, np.float32)
                val.ravel()[num["ell_pos"]] = a_data
        trace.mark(f"L{li} planes")
        if verify_mask:
            m2 = hs.strength_mask_host(col, val, params.theta)
            if not np.array_equal(m2, mask):
                raise PatternChangedError(f"L{li}: strength mask changed")
        trace.mark(f"L{li} strength-verify")
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
        if not np.array_equal(p_col, c["p_col"]):
            if params.interp != "extpi":
                raise PatternChangedError(f"L{li}: interpolation pattern "
                                          "changed")
            # near-tie truncation flips: recompute JUST those rows with
            # the selection pinned to the cached pattern (the refresh
            # contract is "cached pattern, new values")
            bad = np.flatnonzero((p_col != c["p_col"]).any(axis=1)
                                 | ((p_val != 0) != c["p_valid"]).any(
                                     axis=1))
            try:
                pv_rows = hs.extpi_pinned_rows(
                    col, val, mask, state, cmap, nc, bad, c["p_col"],
                    c["p_valid"])
            except ValueError as e:
                raise PatternChangedError(f"L{li}: {e}") from e
            p_col = c["p_col"]
            p_val = p_val.copy()
            p_val[bad] = pv_rows
            p_val[~c["p_valid"]] = 0
        trace.mark(f"L{li} interp")
        if num is None:
            from ..sparse.formats import ell_planes_to_scipy

            p_sp = ell_planes_to_scipy(p_col, p_val, nc)
            num = _build_level_num(c, a_pat, p_sp, host_dia0 if li == 0
                                   else None)
            c["num"] = num
            p_data = np.ascontiguousarray(p_sp.data, np.float64)
        else:
            # NOTE: a kept interpolation weight that cancels to exactly
            # zero stays in P's pattern as an explicit zero (fresh setup
            # would drop it) — documented refresh contract
            p_data = np.ascontiguousarray(
                p_val.ravel()[num["p_pos"]], np.float64)
        ac_data = _rap_numeric(num, a_data, p_data)
        if "ac_pat" not in num:
            num["ac_pat"] = _pat(c["ac_indptr"], c["ac_indices"], nc)
        ac_pat = num["ac_pat"]
        trace.mark(f"L{li} RAP")

        if params.smoother == "l1jacobi":
            lens = np.diff(num["a_pat"][0])
            if lens.min(initial=1) > 0:
                rowsum = np.add.reduceat(np.abs(a_data), num["a_pat"][0][:-1])
            else:
                rowsum = np.asarray(
                    np.abs(_csr_of(num["a_pat"], a_data)).sum(axis=1)).ravel()
            dinv_np = 1.0 / rowsum
        elif num["diag_pos"] is not None:
            dinv_np = 1.0 / a_data[num["diag_pos"]]
        else:
            dinv_np = 1.0 / _csr_of(num["a_pat"], a_data).diagonal()
        mv = CsrMatvec(num["a_pat"][0], num["a_pat"][1], a_data,
                       n_cols=num["a_pat"][2])
        lmax = batch.add(np.asarray(_estimate_lmax_host(mv, dinv_np), np_dt))
        dinv = batch.add(dinv_np, np_dt)
        trace.mark(f"L{li} lmax/dinv")

        lv: dict = dict(dinv=dinv, lmax=lmax)

        def _guard_stream(stream, mp, what):
            # scatter maps are positional in CSR order: an nnz drift would
            # silently misalign every later value
            if len(stream) != len(mp["pos"]):
                raise PatternChangedError(
                    f"L{li}: {what} nnz changed "
                    f"({len(stream)} vs {len(mp['pos'])})")

        def _stream_dt(old_op):
            # a stream feeding a bfloat16 val4 always ships bf16: the
            # device scatter casts to the val4 dtype anyway, so the wider
            # stream buys nothing but transfer bytes (~0.5 GB at 256³)
            if jnp.dtype(old_op.val4.dtype) == jnp.bfloat16:
                import ml_dtypes

                return ml_dtypes.bfloat16
            return st_dt

        def _cast_stream(arr_f64, dt):
            # bf16 goes f64→f32→native round-pack: the two-step rounding
            # matches the FRESH setup's value path bitwise (the planner
            # stores f32 values and round-packs to bf16 at put time) — a
            # direct f64→bf16 cast can differ by one bf16 ulp on
            # double-rounding edges, breaking refreshed≡fresh equality
            if np.dtype(dt) == np.float32:
                return arr_f64.astype(np.float32)
            if getattr(np.dtype(dt), "num", 0) >= 100:   # ml_dtypes bf16
                from .. import native as _nat2

                f32 = arr_f64.astype(np.float32)
                packed = _nat2.bf16_round_pack(f32)
                if packed is not None:
                    return packed
            return arr_f64.astype(dt)

        def _sort_map(mp):
            # one-time: sort scatter positions into val4 order so the
            # device refill is a sorted unique scatter; the host stream is
            # permuted to match at add time
            if "order" not in mp:
                order = np.argsort(mp["pos"], kind="stable")
                mp["order"] = _i32(order)
                mp["pos"] = _i32(mp["pos"][order])
                mp["sorted"] = True
                mp.pop("pos_dev", None)
            return mp

        # A-operator values
        a_kind = c["a_kind"]
        if a_kind in ("PlaneDia", "ConstDia", "Dia"):
            hd = host_dia0 if li == 0 else None
            if hd is None:
                raise PatternChangedError(
                    f"L{li}: cached {a_kind} operator without Dia input")
            a_built = None
            if a_kind == "ConstDia":
                a_built = to_const_dia(hd, put=batch.add)
            elif a_kind == "PlaneDia":
                a_built = to_plane_dia(hd, dtype="auto", put=batch.add)
            if a_built is None and a_kind != "Dia":
                raise PatternChangedError(
                    f"L{li}: operator no longer {a_kind}-eligible")
            if a_built is None:
                a_built = Dia(data=batch.add(np.asarray(hd.data, np_dt)),
                              offsets=hd.offsets, dims=hd.dims)
            lv["a"] = ("done", a_built)
        elif a_kind == "RoutedEll":
            mp = _sort_map(c["a_map"])
            stream = _cast_stream(a_data[mp["order"]], _stream_dt(old.a))
            _guard_stream(stream, mp, "A")
            lv["a"] = ("routed", mp, batch.add(stream), old.a)
        elif a_kind == "Ell":
            lv["a"] = ("ell", batch.add(val, np_dt), old.a)
        else:   # SplitRoutedEll etc.: no refresh map — full setup instead
            raise PatternChangedError(
                f"L{li}: value refresh unsupported for {a_kind} operators")

        if c["p_kind"] not in ("RoutedEll", "Ell") or \
                c["r_kind"] not in ("RoutedEll", "Ell"):
            raise PatternChangedError(
                f"L{li}: value refresh unsupported for "
                f"{c['p_kind']}/{c['r_kind']} transfer operators")
        if c["p_kind"] == "RoutedEll":
            mp = _sort_map(c["p_map"])
            p_stream = _cast_stream(p_data[mp["order"]], _stream_dt(old.p))
            _guard_stream(p_stream, mp, "P")
            p_handle = batch.add(p_stream)
            lv["p"] = ("routed", mp, p_handle, old.p)
        else:
            lv["p"] = ("ell", batch.add(p_val.astype(np_dt)), old.p)
            p_handle = None
        if c["r_kind"] == "RoutedEll":
            rmp = c["r_map"]
            if p_handle is not None:
                # R = Pᵀ: reuse P's uploaded stream — compose the cached
                # transpose permutation and P's sort order into R's
                # scatter positions (cold, once); saves the whole R
                # stream transfer
                if "_shared" not in rmp:
                    inv = np.empty_like(num["pt_perm"])
                    inv[num["pt_perm"]] = np.arange(len(inv))
                    q = rmp["pos"][inv]          # p-CSR-order positions
                    rmp["_shared"] = {
                        "pos": np.ascontiguousarray(
                            q[c["p_map"]["order"]]),
                        "val4_shape": rmp["val4_shape"],
                        "sorted": False,
                    }
                rmp2 = rmp["_shared"]
                _guard_stream(p_stream, rmp2, "R")
                lv["r"] = ("routed", rmp2, p_handle, old.r)
            else:
                from .. import native as _nat

                r_stream = _cast_stream(
                    _nat.perm_gather(num["pt_perm"], p_data),
                    _stream_dt(old.r))
                _guard_stream(r_stream, rmp, "R")
                lv["r"] = ("routed", rmp, batch.add(r_stream), old.r)
        else:
            pt_val = np.zeros(old.r.val.shape, np_dt)
            if "r_ell_pos" not in num:
                num["r_ell_pos"] = _i32(_ell_pos(num["pt_pat"][0],
                                                 pt_val.shape[1]))
            from .. import native as _nat

            pt_data = _nat.perm_gather(num["pt_perm"], p_data)
            pt_val.ravel()[num["r_ell_pos"]] = pt_data
            lv["r"] = ("ell", batch.add(pt_val), old.r)
        trace.mark(f"L{li} streams")
        new_levels.append(lv)
        a_data = ac_data
        if num is not None and li + 1 < len(cache.levels) and \
                "num" not in cache.levels[li + 1]:
            a_sp = _csr_of(ac_pat, ac_data)

    trace.mark("coarse planes")
    last_pat = (np.ascontiguousarray(cache.levels[-1]["ac_indptr"], np.int64),
                np.ascontiguousarray(cache.levels[-1]["ac_indices"],
                                     np.int32),
                cache.levels[-1]["nc"])
    dense = np.asarray(_csr_of(last_pat, a_data).toarray(), dtype=np.float64)
    fac = _coarse_factor(dense, params)
    coarse_chol = batch.add(fac, np_dt)
    coarse_a = batch.add(dense, np_dt)
    trace.mark("coarse factor")

    # every pattern guard has passed; the old hierarchy's device VALUES
    # are no longer needed (jobs only reference geometry + shapes)
    if release_old_values:
        _release_value_buffers(cache.hier)

    # resolve the ONE upload, then run the geometry-reusing refills
    tree = batch.resolve((new_levels, coarse_chol, coarse_a))
    new_levels, coarse_chol, coarse_a = tree
    # sync on a resolved leaf: pack+upload then reads as the TRUE
    # transfer+unpack completion and scatter/build as pure refill cost
    trace.mark("pack+upload", sync=coarse_chol)

    # batch every routed scatter into ONE jitted program (one compile)
    jobs = []
    for lv in new_levels:
        for key in ("a", "p", "r"):
            spec = lv[key]
            if spec[0] == "routed":
                _, mp, stream, old_op = spec
                jobs.append((old_op, mp, stream))
    refilled = iter(_refill_routed_all(jobs) if jobs else ())

    def build(spec):
        kind = spec[0]
        if kind == "done":
            return spec[1]
        if kind == "routed":
            return next(refilled)
        _, valp, old_op = spec
        return dataclasses.replace(old_op, val=valp)

    levels = tuple(
        Level(a=build(lv["a"]), dinv=lv["dinv"], p=build(lv["p"]),
              r=build(lv["r"]), lmax=lv["lmax"])
        for lv in new_levels)
    trace.mark("scatter/build", sync=levels[0].dinv)
    return Hierarchy(levels=levels, coarse_chol=coarse_chol,
                     coarse_a=coarse_a, params=params)
