"""ctypes binding for the native OpenMP setup kernels (csrc/native.cc).

Auto-builds ``csrc/libamgnative.so`` on first use (a few seconds of g++,
cached on disk); every entry point degrades gracefully to the numpy/scipy
implementation when the toolchain or library is unavailable, so the pure-
Python framework keeps working anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent / "csrc"
_LIB_PATH = _CSRC / "libamgnative.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("OMP_AMG_NO_NATIVE") == "1":
        return None
    try:
        if not _LIB_PATH.exists() or (
            _LIB_PATH.stat().st_mtime < (_CSRC / "native.cc").stat().st_mtime
        ):
            subprocess.run(["make", "-C", str(_CSRC)], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        lib.dia_apply_f64.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                      f64p, f64p, f64p]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        lib.dia_apply_f32.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                      f32p, f32p, f32p]
        lib.prolong_last_f64.argtypes = [ctypes.c_int64] * 3 + [f64p, f64p]
        lib.restrict_last_f64.argtypes = [ctypes.c_int64] * 3 + [f64p, f64p]
        lib.transpose2d_f64.argtypes = [ctypes.c_int64, ctypes.c_int64, f64p,
                                        f64p]
        lib.dia_apply_block_f64.argtypes = [ctypes.c_int64] * 3 + [i64p, f64p,
                                                                   f64p, f64p]
        lib.prolong_mid_f64.argtypes = [ctypes.c_int64] * 4 + [f64p, f64p]
        lib.restrict_mid_f64.argtypes = [ctypes.c_int64] * 4 + [f64p, f64p]
        lib.rap_stencil_f64.argtypes = [ctypes.c_int64, i64p, i64p, i64p,
                                        ctypes.c_int64, i64p, i64p, f64p,
                                        f64p]
        lib.spgemm_row_nnz.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                       i32p, i64p, i32p, i64p]
        lib.spgemm_fill.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                    i32p, f64p, i64p, i32p, f64p, i64p, i32p,
                                    f64p]
        lib.spgemm_numeric.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                       i32p, f64p, i64p, i32p, f64p, i64p,
                                       i32p, f64p]
        lib.perm_gather_f64.argtypes = [ctypes.c_int64, i64p, f64p, f64p]
        lib.perm_gather_f64_i32.argtypes = [ctypes.c_int64, i32p, f64p,
                                            f64p]
        lib.csr_matvec_f64.argtypes = [ctypes.c_int64, i64p, i32p, f64p,
                                       f64p, f64p]
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
        u16p_ = np.ctypeslib.ndpointer(np.uint16, flags="C")
        lib.sparse_encode_w4.argtypes = [u32p, ctypes.c_int64,
                                         ctypes.c_int, i32p, u32p]
        lib.sparse_encode_w4.restype = ctypes.c_int64
        lib.sparse_encode_w2.argtypes = [u16p_, ctypes.c_int64, i32p, u16p_]
        lib.sparse_encode_w2.restype = ctypes.c_int64
        lib.routed_lanes_at.argtypes = [u32p, i32p, ctypes.c_int64,
                                        ctypes.c_int64,
                                        np.ctypeslib.ndpointer(
                                            np.uint8, flags="C")]
        lib.delta_encode_u8.argtypes = [i32p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int64,
                                        np.ctypeslib.ndpointer(
                                            np.uint8, flags="C"),
                                        i32p, i32p, ctypes.c_int64]
        lib.delta_encode_u8.restype = ctypes.c_int64
        _u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        lib.sparse_encode_routed_w4.argtypes = [
            u32p, ctypes.c_int64, ctypes.c_int, u32p, ctypes.c_int64,
            i32p, u32p, _u8p]
        lib.sparse_encode_routed_w4.restype = ctypes.c_int64
        lib.sparse_encode_routed_w2.argtypes = [
            u16p_, ctypes.c_int64, u32p, ctypes.c_int64, i32p, u16p_, _u8p]
        lib.sparse_encode_routed_w2.restype = ctypes.c_int64
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C")
        lib.extpi_interp_f64.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p, f64p, u8p,
            i8p, i64p, ctypes.c_int64, i32p, f64p]
        lib.extpi_interp_f32v.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p, f32p, u8p,
            i8p, i64p, ctypes.c_int64, i32p, f64p]
        lib.d2_color_greedy.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                        i32p, i64p, i32p, i32p]
        lib.d2_color_greedy.restype = ctypes.c_int64
        lib.routed_plan_demand.argtypes = [ctypes.c_int64, i64p, i32p,
                                           ctypes.c_int64, ctypes.c_int64,
                                           ctypes.c_int64, i32p, i32p]
        lib.routed_plan_demand.restype = ctypes.c_int64
        lib.routed_plan_fill.argtypes = [ctypes.c_int64, i64p, i32p, f64p,
                                         i32p, i32p, ctypes.c_int64, f32p,
                                         i32p, i32p]
        lib.routed_plan_fill_map.argtypes = [ctypes.c_int64, i64p, i32p,
                                             f64p, i32p, i32p,
                                             ctypes.c_int64, f32p, i32p,
                                             i32p, i64p]
        lib.strength_mask_f32.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                          i32p, f32p, ctypes.c_double, u8p]
        lib.pmis_f32.argtypes = [ctypes.c_int64, ctypes.c_int64, i32p, u8p,
                                 ctypes.c_int64, i32p]
        lib.pmis_f32.restype = ctypes.c_int64
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C")
        lib.plane_pack_f32.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, f64p, f32p]
        lib.bf16_lossless_f32.argtypes = [f32p, ctypes.c_int64]
        lib.bf16_lossless_f32.restype = ctypes.c_int
        lib.bf16_pack_f32.argtypes = [f32p, ctypes.c_int64, u16p]
        lib.bf16_round_pack_f32.argtypes = [f32p, ctypes.c_int64, u16p]
        lib.ell_fill_f32.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                     i32p, f64p, i32p, f32p]
        lib.dia_mark_offsets.argtypes = [ctypes.c_int64, i64p, i32p, u8p]
        lib.dia_fill_planes.argtypes = [ctypes.c_int64, i64p, i32p, f64p,
                                        i32p, f64p]
        lib.native_num_threads.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def dia_apply(offsets, data: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Banded matvec; f32 operands stay f32 (half the operator stream)."""
    lib = _load()
    n = x.shape[0]
    if lib is None:
        from .amg.comb_rap import dia_apply as np_apply

        return np_apply(list(offsets), data, x, np)
    offs = np.ascontiguousarray(offsets, np.int64)
    if data.dtype == np.float32:
        y = np.empty(n, np.float32)
        lib.dia_apply_f32(n, len(offsets), offs,
                          np.ascontiguousarray(data, np.float32),
                          np.ascontiguousarray(x, np.float32), y)
        return y
    y = np.empty(n, np.float64)
    lib.dia_apply_f64(n, len(offsets), offs,
                      np.ascontiguousarray(data, np.float64),
                      np.ascontiguousarray(x, np.float64), y)
    return y


def _apply_axis(x: np.ndarray, axis: int, fn, n_out: int) -> np.ndarray:
    """Apply a last-axis kernel along ``axis`` of a C-order ndarray."""
    lib = _load()
    moved = np.ascontiguousarray(np.moveaxis(x, axis, -1), np.float64)
    rows = int(np.prod(moved.shape[:-1], dtype=np.int64))
    n_in = moved.shape[-1]
    out = np.empty(moved.shape[:-1] + (n_out,), np.float64)
    fn(rows, n_in, n_out, moved.reshape(rows, n_in), out.reshape(rows, n_out))
    return np.moveaxis(out, -1, axis)


def prolong(xc: np.ndarray, fine_shape, coarse_shape, coarsened) -> np.ndarray:
    lib = _load()
    if lib is None:
        from .amg.comb_rap import prolong as np_prolong

        return np_prolong(xc, fine_shape, coarse_shape, coarsened, np)
    x = xc.reshape(coarse_shape)
    for ax, c in enumerate(coarsened):
        if c:
            x = _apply_axis(x, ax, lib.prolong_last_f64, fine_shape[ax])
    return x.reshape(-1)


def restrict(xf: np.ndarray, fine_shape, coarse_shape, coarsened) -> np.ndarray:
    lib = _load()
    if lib is None:
        from .amg.comb_rap import restrict as np_restrict

        return np_restrict(xf, fine_shape, coarse_shape, coarsened, np)
    x = xf.reshape(fine_shape)
    for ax, c in enumerate(coarsened):
        if c:
            x = _apply_axis(x, ax, lib.restrict_last_f64, coarse_shape[ax])
    return x.reshape(-1)


def _block_transfer(x2: np.ndarray, from_shape, to_shape, coarsened,
                    kernel) -> np.ndarray:
    """Apply a mid-axis transfer kernel along every coarsened axis of a
    (n, nvec) multi-vector array laid out on ``from_shape``."""
    lib = _load()
    nvec = x2.shape[1]
    dims = list(from_shape)
    arr = np.ascontiguousarray(x2, np.float64)
    for ax in range(len(coarsened)):
        if not coarsened[ax]:
            continue
        rows = int(np.prod(dims[:ax], dtype=np.int64))
        mid = dims[ax]
        tail = int(np.prod(dims[ax + 1:], dtype=np.int64)) * nvec
        out = np.empty((rows * to_shape[ax] * tail,), np.float64)
        kernel(rows, mid, to_shape[ax], tail, arr.reshape(-1), out)
        dims[ax] = to_shape[ax]
        arr = out
    return arr.reshape(-1, nvec)


def prolong_block(x2: np.ndarray, fine_shape, coarse_shape, coarsened):
    return _block_transfer(x2, coarse_shape, fine_shape, coarsened,
                           _load().prolong_mid_f64)


def restrict_block(x2: np.ndarray, fine_shape, coarse_shape, coarsened):
    return _block_transfer(x2, fine_shape, coarse_shape, coarsened,
                           _load().restrict_mid_f64)


def dia_apply_block(offsets, data: np.ndarray, x2: np.ndarray) -> np.ndarray:
    lib = _load()
    n, nvec = x2.shape
    y = np.empty_like(x2)
    lib.dia_apply_block_f64(n, len(offsets), nvec,
                            np.ascontiguousarray(offsets, np.int64),
                            np.ascontiguousarray(data, np.float64),
                            np.ascontiguousarray(x2, np.float64), y)
    return y


def rap_stencil(offsets, data: np.ndarray, dims, coarse_dims, coarsened):
    """Fused direct Galerkin RAP (see csrc rap_stencil_f64). Returns
    (offsets_c sorted, data_c (k, nc)) with all-zero taps dropped, or None
    when the native library is unavailable."""
    from itertools import product as iproduct

    lib = _load()
    if lib is None:
        return None
    d = len(dims)
    nc = int(np.prod(coarse_dims, dtype=np.int64))
    strides = [1] * d
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * dims[k + 1]
    # balanced per-axis decomposition of each scalar offset (valid because
    # the masked-zero invariant keeps every stored tap non-wrapping)
    deltas = np.zeros((len(offsets), d), np.int64)
    for ki, off in enumerate(offsets):
        rem = int(off)
        for ax in range(d):
            q = int(round(rem / strides[ax]))
            deltas[ki, ax] = q
            rem -= q * strides[ax]
        if rem != 0:
            return None  # offset not decomposable on this grid
    out = np.zeros((3 ** d) * nc, np.float64)
    lib.rap_stencil_f64(
        d, np.ascontiguousarray(dims, np.int64),
        np.ascontiguousarray(coarse_dims, np.int64),
        np.ascontiguousarray([1 if c else 0 for c in coarsened], np.int64),
        len(offsets), np.ascontiguousarray(offsets, np.int64),
        np.ascontiguousarray(deltas.ravel(), np.int64),
        np.ascontiguousarray(data, np.float64), out)
    out = out.reshape(3 ** d, nc)
    cstrides = [1] * d
    for k in range(d - 2, -1, -1):
        cstrides[k] = cstrides[k + 1] * coarse_dims[k + 1]
    entries = []
    for ti, delta in enumerate(iproduct((-1, 0, 1), repeat=d)):
        if any(abs(dl) >= cd for dl, cd in zip(delta, coarse_dims)):
            continue
        if not np.any(out[ti]):
            continue
        off = sum(dl * st for dl, st in zip(delta, cstrides))
        entries.append((off, out[ti]))
    entries.sort(key=lambda e: e[0])
    offs_c = [e[0] for e in entries]
    data_c = np.stack([e[1] for e in entries]) if entries else out[:0]
    return offs_c, data_c


def extpi_interp(col, val, mask, state, cmap, n_coarse,
                 max_elements: int = 6):
    """Native OpenMP extended+i interpolation over padded ELL planes.

    Returns (p_col i32, p_val f64) planes of width ``max_elements``, or
    None when the native library is unavailable (caller falls back to
    ``host_setup.extpi_interpolation_np``).
    """
    lib = _load()
    if lib is None:
        return None
    n, k = col.shape
    p_col = np.zeros((n, max_elements), np.int32)
    p_val = np.zeros((n, max_elements), np.float64)
    args = (n, k, int(n_coarse),
            np.ascontiguousarray(col, np.int32))
    tail = (np.ascontiguousarray(mask, np.uint8),
            np.ascontiguousarray(state, np.int8),
            np.ascontiguousarray(cmap, np.int64),
            int(max_elements), p_col, p_val)
    if np.asarray(val).dtype == np.float32:
        # f32-plane entry: no (n, k) float64 conversion temp (~1.7 GB at
        # 256³ L1); every term converts exactly inside the kernel, so the
        # result is identical to the f64 path on upcast planes
        lib.extpi_interp_f32v(*args, np.ascontiguousarray(val, np.float32),
                              *tail)
    else:
        lib.extpi_interp_f64(*args, np.ascontiguousarray(val, np.float64),
                             *tail)
    return p_col, p_val


def d2_color(m):
    """Distance-2 greedy column coloring of a scipy sparse matrix.

    Returns (colors i32 array over columns, n_colors), or None when the
    native library is unavailable or >256 colors would be needed.
    """
    import scipy.sparse as sp

    lib = _load()
    if lib is None:
        return None
    csr = sp.csr_matrix(m)
    csr.sort_indices()
    csc = csr.tocsc()
    colors = np.empty(csr.shape[1], np.int32)
    nc = lib.d2_color_greedy(
        csr.shape[0], csr.shape[1],
        np.ascontiguousarray(csr.indptr, np.int64),
        np.ascontiguousarray(csr.indices, np.int32),
        np.ascontiguousarray(csc.indptr, np.int64),
        np.ascontiguousarray(csc.indices, np.int32), colors)
    if nc < 0:
        return None
    return colors, int(nc)


def spgemm(a, b):
    """C = A @ B for scipy CSR matrices via the native Gustavson kernels."""
    import scipy.sparse as sp

    lib = _load()
    if lib is None:
        return (sp.csr_matrix(a) @ sp.csr_matrix(b)).tocsr()
    a = sp.csr_matrix(a)
    b = sp.csr_matrix(b)
    n, m = a.shape[0], b.shape[1]
    a_indptr = np.ascontiguousarray(a.indptr, np.int64)
    b_indptr = np.ascontiguousarray(b.indptr, np.int64)
    a_idx = np.ascontiguousarray(a.indices, np.int32)
    b_idx = np.ascontiguousarray(b.indices, np.int32)
    a_val = np.ascontiguousarray(a.data, np.float64)
    b_val = np.ascontiguousarray(b.data, np.float64)
    row_nnz = np.empty(n, np.int64)
    lib.spgemm_row_nnz(n, m, a_indptr, a_idx, b_indptr, b_idx, row_nnz)
    c_indptr = np.zeros(n + 1, np.int64)
    np.cumsum(row_nnz, out=c_indptr[1:])
    nnz = int(c_indptr[-1])
    c_idx = np.empty(nnz, np.int32)
    c_val = np.empty(nnz, np.float64)
    lib.spgemm_fill(n, m, a_indptr, a_idx, a_val, b_indptr, b_idx, b_val,
                    c_indptr, c_idx, c_val)
    return sp.csr_matrix((c_val, c_idx, c_indptr), shape=(n, m))


def _check_spgemm_containment(a_pat, b_pat, c_pat):
    """Debug-mode guard for spgemm_numeric's containment precondition:
    the structural pattern of A·B must be a subset of c_pat (flat row-major
    keys; both patterns row/col sorted)."""
    import scipy.sparse as sp

    a_indptr, a_idx, _ = a_pat
    b_indptr, b_idx, b_ncols = b_pat
    c_indptr, c_idx, _ = c_pat
    n = len(a_indptr) - 1
    a = sp.csr_matrix((np.ones(len(a_idx)), a_idx, a_indptr),
                      shape=(n, len(b_indptr) - 1))
    b = sp.csr_matrix((np.ones(len(b_idx)), b_idx, b_indptr),
                      shape=(len(b_indptr) - 1, b_ncols))
    s = (a @ b).tocsr()
    s.sort_indices()
    keys_s = s.indices.astype(np.int64) + np.repeat(
        np.arange(n, dtype=np.int64), np.diff(s.indptr)) * b_ncols
    keys_c = np.asarray(c_idx, np.int64) + np.repeat(
        np.arange(n, dtype=np.int64), np.diff(c_indptr)) * b_ncols
    pos = np.searchsorted(keys_c, keys_s)
    if (pos >= len(keys_c)).any() or not np.array_equal(keys_c[pos], keys_s):
        raise ValueError(
            "spgemm_numeric: structural A@B pattern is not contained in "
            "the cached output pattern — values would be silently wrong")


def spgemm_numeric(a_pat, a_data, b_pat, b_data, c_pat):
    """Numeric-only C = A @ B into a cached output pattern.

    ``*_pat`` are (indptr int64, indices int32, n_cols) tuples whose
    sparsity matches the one the pattern was built from; returns C.data
    (f64). Falls back to a numpy masked Gustavson via scipy when the
    native library is unavailable.

    PRECONDITION (caller responsibility — NOT checked in the native fast
    path): every structural product term A[i,k]·B[k,j] must land inside
    ``c_pat``, i.e. ``c_pat`` contains the full structural pattern of
    A·B for the given A/B patterns. The native kernel zeroes its dense
    accumulator only at the cached output positions; an uncovered column
    would leak its partial sum into every later row handled by that
    thread — silently wrong values, not an error. Set
    ``OMP_AMG_DEBUG_SPGEMM=1`` to verify containment per call (one
    structural two-phase product — slow; for tests/debugging).
    """
    import os

    if os.environ.get("OMP_AMG_DEBUG_SPGEMM"):
        _check_spgemm_containment(a_pat, b_pat, c_pat)
    a_indptr, a_idx, _ = a_pat
    b_indptr, b_idx, b_ncols = b_pat
    c_indptr, c_idx, _ = c_pat
    n = len(a_indptr) - 1
    a_data = np.ascontiguousarray(a_data, np.float64)
    b_data = np.ascontiguousarray(b_data, np.float64)
    lib = _load()
    c_val = np.empty(len(c_idx), np.float64)
    if lib is None:
        import scipy.sparse as sp

        a = sp.csr_matrix((a_data, a_idx, a_indptr),
                          shape=(n, len(b_indptr) - 1))
        b = sp.csr_matrix((b_data, b_idx, b_indptr),
                          shape=(len(b_indptr) - 1, b_ncols))
        c = (a @ b).tocsr()
        c.sort_indices()
        # scatter the structural product into the cached pattern (the
        # cached pattern is a superset position-for-position only when
        # patterns match; mirror the native semantics via a dense row)
        cs = sp.csr_matrix((c.data, c.indices, c.indptr),
                           shape=(n, b_ncols))
        out = sp.csr_matrix((np.ones(len(c_idx)), c_idx, c_indptr),
                            shape=(n, b_ncols))
        out.data[:] = 0.0
        # rows are sorted in both; use searchsorted per-row via flat keys
        keys_c = c.indices.astype(np.int64) + np.repeat(
            np.arange(n, dtype=np.int64), np.diff(c.indptr)) * b_ncols
        keys_o = np.asarray(c_idx, np.int64) + np.repeat(
            np.arange(n, dtype=np.int64), np.diff(c_indptr)) * b_ncols
        pos = np.searchsorted(keys_o, keys_c)
        out.data[pos] = c.data
        return out.data
    lib.spgemm_numeric(n, b_ncols,
                       np.ascontiguousarray(a_indptr, np.int64),
                       np.ascontiguousarray(a_idx, np.int32), a_data,
                       np.ascontiguousarray(b_indptr, np.int64),
                       np.ascontiguousarray(b_idx, np.int32), b_data,
                       np.ascontiguousarray(c_indptr, np.int64),
                       np.ascontiguousarray(c_idx, np.int32), c_val)
    return c_val


class CsrMatvec:
    """Reusable threaded f64 CSR matvec (native; scipy fallback).

    Caches the contiguous int64/int32 pattern copies across calls so the
    λmax power iteration's 20 sweeps pay the ctypes marshalling once.
    """

    def __init__(self, indptr, indices, data, n_cols=None):
        self.lib = _load()
        self.n = len(indptr) - 1
        self.data = np.ascontiguousarray(data, np.float64)
        if self.lib is None:
            import scipy.sparse as sp

            self.sp = sp.csr_matrix(
                (self.data, indices, indptr),
                shape=(self.n, n_cols if n_cols is not None else self.n))
        else:
            self.indptr = np.ascontiguousarray(indptr, np.int64)
            self.indices = np.ascontiguousarray(indices, np.int32)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        if self.lib is None:
            return self.sp @ x
        y = np.empty(self.n, np.float64)
        self.lib.csr_matvec_f64(self.n, self.indptr, self.indices,
                                self.data, np.ascontiguousarray(x), y)
        return y


def sparse_encode(flat: np.ndarray):
    """(idx int32, vals) of the nonzero elements of a 1-D array, or None.

    One threaded pass replacing numpy's flatnonzero + fancy-gather chain
    in the batched-upload pack (~4 s over the ~620 MB of plan arrays at
    27-pt 128³). Matches the numpy probes' semantics exactly: f32 compares
    by VALUE (−0.0 is zero), 4-byte ints and all 2-byte dtypes (bfloat16
    via its uint16 view) compare by BIT PATTERN."""
    lib = _load()
    if lib is None or flat.size >= (1 << 31) or not flat.flags.c_contiguous:
        return None
    n = flat.size
    if flat.dtype.itemsize == 4:
        as_float = int(flat.dtype == np.float32)
        idx = np.empty(n, np.int32)
        val = np.empty(n, np.uint32)
        cnt = lib.sparse_encode_w4(flat.view(np.uint32), n, as_float, idx,
                                   val)
        return idx[:cnt], val[:cnt].view(flat.dtype)
    if flat.dtype.itemsize == 2 and flat.dtype.num >= 100:
        # ml_dtypes only (bfloat16): bit-pattern probe, like pack.py's
        # uint16 view (np.float16 would need a value compare — not used)
        idx = np.empty(n, np.int32)
        val = np.empty(n, np.uint16)
        cnt = lib.sparse_encode_w2(flat.view(np.uint16), n, idx, val)
        return idx[:cnt], val[:cnt].view(flat.dtype)
    return None


def delta_encode_parts(parts):
    """Fused-group delta encoding (utils/pack.py): ``parts`` is a list of
    (idx int32 sorted-unique, global_offset); returns (du8, exc_pos,
    exc_gap) for the concatenated offset-shifted stream WITHOUT
    materializing it (native one-pass per part), or None when the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    total = sum(len(idx) for idx, _ in parts)
    du8 = np.empty(total, np.uint8)
    exc_chunks = []
    prev = -1          # global position before the stream (gap = idx0 + 1)
    pos0 = 0
    for idx, off in parts:
        idx = np.ascontiguousarray(idx, np.int32)
        n = len(idx)
        cap = n // 32 + 1024
        while True:
            exc_pos = np.empty(cap, np.int32)
            exc_gap = np.empty(cap, np.int32)
            ne = lib.delta_encode_u8(idx, n, prev - off, pos0,
                                     du8[pos0:pos0 + n], exc_pos, exc_gap,
                                     cap)
            if ne >= 0:
                break
            cap = n + 1     # worst case: every gap is an exception
        if ne:
            exc_chunks.append((exc_pos[:ne], exc_gap[:ne]))
        if n:
            prev = off + int(idx[-1])
        pos0 += n
    if exc_chunks:
        exc_pos = np.concatenate([c[0] for c in exc_chunks])
        exc_gap = np.concatenate([c[1] for c in exc_chunks])
    else:
        exc_pos = np.zeros(0, np.int32)
        exc_gap = np.zeros(0, np.int32)
    return du8, exc_pos, exc_gap


def sparse_encode_routed(flat: np.ndarray, lidxp: np.ndarray, kc: int):
    """(idx int32, vals, lanes u8) of a routed plan's nonzero val4 entries
    in ONE native pass (sparse_encode + routed_lanes_at fused), or None.
    Probe semantics match sparse_encode (f32 by value, bf16 by bit
    pattern)."""
    lib = _load()
    if lib is None or flat.size >= (1 << 31) or not flat.flags.c_contiguous:
        return None
    n = flat.size
    lw = np.ascontiguousarray(lidxp).view(np.uint32)
    if flat.dtype.itemsize == 4:
        as_float = int(flat.dtype == np.float32)
        idx = np.empty(n, np.int32)
        val = np.empty(n, np.uint32)
        lanes = np.empty(n, np.uint8)
        cnt = lib.sparse_encode_routed_w4(flat.view(np.uint32), n, as_float,
                                          lw, int(kc), idx, val, lanes)
        return idx[:cnt], val[:cnt].view(flat.dtype), lanes[:cnt]
    if flat.dtype.itemsize == 2 and flat.dtype.num >= 100:
        idx = np.empty(n, np.int32)
        val = np.empty(n, np.uint16)
        lanes = np.empty(n, np.uint8)
        cnt = lib.sparse_encode_routed_w2(flat.view(np.uint16), n, lw,
                                          int(kc), idx, val, lanes)
        return idx[:cnt], val[:cnt].view(flat.dtype), lanes[:cnt]
    return None


def routed_lanes_at(lidxp: np.ndarray, idx: np.ndarray, kc: int):
    """u8 lane stream of val4 flat positions ``idx`` from the packed lidx
    words (see csrc routed_lanes_at / utils.pack.add_routed), or None."""
    lib = _load()
    if lib is None:
        return None
    idx = np.ascontiguousarray(idx, np.int32)
    lanes = np.empty(len(idx), np.uint8)
    lib.routed_lanes_at(np.ascontiguousarray(lidxp).view(np.uint32),
                        idx, len(idx), int(kc), lanes)
    return lanes


def perm_gather(perm: np.ndarray, x: np.ndarray) -> np.ndarray:
    """out[i] = x[perm[i]] (f64), threaded; numpy fancy-index fallback.

    int32 permutations dispatch to the i32 kernel (the refresh caches
    store their multi-hundred-Melem maps as int32 — widening per call
    would cost a 2 GB temp per gather at 256³)."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float64)
    if lib is None:
        return x[perm]
    out = np.empty(len(perm), np.float64)
    if perm.dtype == np.int32 and hasattr(lib, "perm_gather_f64_i32"):
        lib.perm_gather_f64_i32(len(perm),
                                np.ascontiguousarray(perm, np.int32), x, out)
    else:
        lib.perm_gather_f64(len(perm),
                            np.ascontiguousarray(perm, np.int64), x, out)
    return out


def routed_plan(a_csr, s_min: int = 0, s_cap: int = 2048, ws: int = 1):
    """Native two-pass routed-ELL planner (compact-chunk layout).

    Returns ``(sbase, bk, span)`` demand info and a ``fill(cbase) ->
    (val4_f32, lidx_packed, soff)`` closure, or None when the native lib is
    unavailable or a block overflows ``s_cap`` (caller uses the numpy
    planner / XLA fallback). ``ws`` pads every (group, chunk) slot run to a
    ws multiple (window-share packing). Output is bit-identical to the
    numpy planner (tests/test_routed.py pins it).
    """
    lib = _load()
    if lib is None:
        return None
    n_rows = a_csr.shape[0]
    nb = max(1, -(-n_rows // 1024))
    indptr = np.ascontiguousarray(a_csr.indptr, np.int64)
    indices = np.ascontiguousarray(a_csr.indices, np.int32)
    data = np.ascontiguousarray(a_csr.data, np.float64)
    sbase = np.zeros(nb, np.int32)
    bk = np.zeros(nb, np.int32)
    span = int(lib.routed_plan_demand(n_rows, indptr, indices, int(s_min),
                                      int(s_cap), int(ws), sbase, bk))
    if span < 0:
        return "overflow"

    def fill(cbase: np.ndarray, n_chunks: int, want_map: bool = False):
        val4 = np.zeros((n_chunks, 16, 8, 128), np.float32)
        lidxp = np.zeros((n_chunks, 4, 8, 128), np.int32)
        soff = np.zeros((n_chunks, 128), np.int32)
        cb = np.ascontiguousarray(cbase, np.int32)
        if want_map:
            pos = np.empty(int(a_csr.nnz), np.int64)
            lib.routed_plan_fill_map(n_rows, indptr, indices, data, sbase,
                                     cb, int(ws), val4.reshape(-1),
                                     lidxp.reshape(-1), soff.reshape(-1),
                                     pos)
            return val4, lidxp, soff, pos
        lib.routed_plan_fill(n_rows, indptr, indices, data, sbase, cb,
                             int(ws), val4.reshape(-1), lidxp.reshape(-1),
                             soff.reshape(-1))
        return val4, lidxp, soff

    return sbase, bk, span, fill


def strength_mask(col: np.ndarray, val: np.ndarray, theta: float):
    """Native strength-of-connection mask; None when the lib is missing."""
    lib = _load()
    if lib is None:
        return None
    n, k = col.shape
    mask = np.empty((n, k), np.uint8)
    lib.strength_mask_f32(n, k, np.ascontiguousarray(col, np.int32),
                          np.ascontiguousarray(val, np.float32),
                          float(theta), mask.reshape(-1))
    return mask.astype(bool)


def pmis(col: np.ndarray, mask: np.ndarray, max_rounds: int = 64):
    """Native PMIS C/F split (bit-identical to host_setup.pmis_np);
    None when the lib is missing."""
    lib = _load()
    if lib is None:
        return None
    n, k = col.shape
    state = np.empty(n, np.int32)
    rounds = lib.pmis_f32(n, k, np.ascontiguousarray(col, np.int32),
                          np.ascontiguousarray(mask, np.uint8),
                          int(max_rounds), state)
    if rounds < 0:
        raise RuntimeError("PMIS did not terminate")
    return state


def plane_pack(data: np.ndarray, nz: int, pr: int):
    """(ndiag, nz·pr·128) f64 diagonals → (nz, ndiag, pr, 128) f32 planes
    via the native packer; None when the lib is missing."""
    lib = _load()
    if lib is None:
        return None
    ndiag = data.shape[0]
    out = np.empty((nz, ndiag, pr, 128), np.float32)
    lib.plane_pack_f32(ndiag, nz, pr,
                       np.ascontiguousarray(data, np.float64),
                       out.reshape(-1))
    return out


def bf16_lossless(x: np.ndarray):
    """True iff every f32 is exactly bf16-representable (low mantissa bits
    zero); None when the lib is missing."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    return bool(lib.bf16_lossless_f32(x.reshape(-1), x.size))


def bf16_pack(x: np.ndarray) -> np.ndarray:
    import ml_dtypes

    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.uint16)
    lib.bf16_pack_f32(x.reshape(-1), x.size, out.reshape(-1))
    return out.view(ml_dtypes.bfloat16)


def ell_fill(a_csr, k: int):
    """CSR → zero-padded (col int32, val f32) ELL planes via the parallel
    native fill; None when the lib is missing (numpy fallback)."""
    lib = _load()
    if lib is None:
        return None
    n = a_csr.shape[0]
    col = np.zeros((n, max(k, 1)), np.int32)
    val = np.zeros((n, max(k, 1)), np.float32)
    lib.ell_fill_f32(n, max(k, 1),
                     np.ascontiguousarray(a_csr.indptr, np.int64),
                     np.ascontiguousarray(a_csr.indices, np.int32),
                     np.ascontiguousarray(a_csr.data, np.float64),
                     col.reshape(-1), val.reshape(-1))
    return col, val


def bf16_round_pack(x: np.ndarray):
    """Round-to-nearest bf16 repack (None when the lib is missing)."""
    import ml_dtypes

    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.uint16)
    lib.bf16_round_pack_f32(x.reshape(-1), x.size, out.reshape(-1))
    return out.view(ml_dtypes.bfloat16)


def dia_planes(a_csr):
    """(offsets_sorted, f64 planes) from CSR via the native two-pass
    extractor; None when the lib is missing."""
    lib = _load()
    if lib is None:
        return None
    if a_csr.shape[0] != a_csr.shape[1]:
        # the native offset table is sized 2n-1 from rows only; a wider
        # matrix would write past it (ADVICE r3 medium) — numpy fallback
        return None
    n = a_csr.shape[0]
    indptr = np.ascontiguousarray(a_csr.indptr, np.int64)
    indices = np.ascontiguousarray(a_csr.indices, np.int32)
    data = np.ascontiguousarray(a_csr.data, np.float64)
    seen = np.zeros(2 * n - 1, np.uint8)
    lib.dia_mark_offsets(n, indptr, indices, seen)
    offs = np.flatnonzero(seen).astype(np.int64) - (n - 1)
    lookup = np.zeros(2 * n - 1, np.int32)
    lookup[offs + (n - 1)] = np.arange(len(offs), dtype=np.int32)
    out = np.zeros((len(offs), n), np.float64)
    lib.dia_fill_planes(n, indptr, indices, data, lookup, out.reshape(-1))
    return [int(o) for o in offs], out
