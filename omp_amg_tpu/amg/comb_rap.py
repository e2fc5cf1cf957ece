"""Galerkin RAP for structured hierarchies via lattice-comb probing.

Computes A_c = R A P exactly without any sparse matrix product: with linear
tensor-product transfers and an operator of per-axis stencil radius ≤ 1, the
coarse operator also has radius ≤ 1 per axis, so probing with the 3^d
period-3 lattice combs

    v_t[c] = 1  iff  c_ax ≡ t_ax (mod 3) ∀ax

separates every coarse row's couplings: the response w_t = R(A(P v_t))
satisfies w_t[i] = A_c[i, i+δ] for the unique δ ∈ {-1,0,1}^d with
(i+δ) ≡ t (mod 3) — including exact zeros for taps that cross the boundary.

Array-module-generic (``xp`` = numpy for the host setup path, jax.numpy for
a device-resident setup): everything is reshape/slice/add — no gathers, no
sparse products, and the output is directly in DIA layout. Replaces the
scipy CSR SpGEMM (the dominant structured-setup cost) and is the basis for
the on-device RAP ("two-phase symbolic+numeric SpGEMM" slot of SURVEY.md §2
#9 — here the symbolic phase is closed-form).

Safety: ``comb_rap`` validates its radius assumption with a random probe
(‖A_c x − R A P x‖); callers fall back to the scipy product on mismatch.
"""

from __future__ import annotations

from itertools import product as iproduct
from typing import Sequence, Tuple

import numpy as np


def dia_apply(offsets: Sequence[int], data, x, xp=np):
    """y = A x for DIA planes (data[k, i] multiplies x[i+off])."""
    n = x.shape[0]
    if xp is np:
        y = np.zeros_like(x)
        for k, off in enumerate(offsets):
            i0, i1 = max(0, -off), min(n, n - off)
            if i1 > i0:
                y[i0:i1] += data[k, i0:i1] * x[i0 + off : i1 + off]
        return y
    # device path: pad + static slices (fusable streaming; the scatter-add
    # formulation exceeds TPU scoped-VMEM limits in big fusions)
    import jax.lax as lax

    lo = max(0, -min(offsets)) if offsets else 0
    hi = max(0, max(offsets)) if offsets else 0
    xpad = xp.pad(x, (lo, hi))
    y = xp.zeros_like(x)
    for k, off in enumerate(offsets):
        y = y + data[k] * lax.dynamic_slice(xpad, (off + lo,), (n,))
    return y


def _prolong_axis(x, axis: int, n_f: int, xp=np):
    nc = x.shape[axis]
    xm = xp.moveaxis(x, axis, -1)
    right = xp.concatenate([xm[..., 1:], xp.zeros_like(xm[..., :1])], axis=-1)
    odd = 0.5 * (xm + right)
    inter = xp.stack([xm, odd], axis=-1).reshape(*xm.shape[:-1], 2 * nc)
    return xp.moveaxis(inter[..., :n_f], -1, axis)


def _restrict_axis(x, axis: int, nc: int, xp=np):
    xm = xp.moveaxis(x, axis, -1)
    pad = xp.zeros_like(xm[..., :1])
    xxp = xp.concatenate([pad, xm, pad, pad], axis=-1)
    ext = 2 * nc
    even = xxp[..., 1 : 1 + ext : 2][..., :nc]
    lft = xxp[..., 0:ext:2][..., :nc]
    rgt = xxp[..., 2 : 2 + ext : 2][..., :nc]
    return xp.moveaxis(even + 0.5 * (lft + rgt), -1, axis)


def prolong(xc, fine_shape, coarse_shape, coarsened, xp=np):
    x = xc.reshape(coarse_shape)
    for ax, c in enumerate(coarsened):
        if c:
            x = _prolong_axis(x, ax, fine_shape[ax], xp)
    return x.reshape(-1)


def restrict(xf, fine_shape, coarse_shape, coarsened, xp=np):
    x = xf.reshape(fine_shape)
    for ax, c in enumerate(coarsened):
        if c:
            x = _restrict_axis(x, ax, coarse_shape[ax], xp)
    return x.reshape(-1)


def comb_rap(offsets: Sequence[int], data, dims: Sequence[int],
             coarse_dims: Sequence[int], coarsened: Sequence[bool],
             xp=np, validate: bool = True):
    """(offsets_c, data_c) of A_c = R A P in DIA layout. f64 recommended."""
    d = len(dims)
    nc = int(np.prod(coarse_dims))
    strides_c = [1] * d
    for k in range(d - 2, -1, -1):
        strides_c[k] = strides_c[k + 1] * coarse_dims[k + 1]

    coords = np.indices(coarse_dims)  # (d, *coarse_dims) host-only ints
    mod3 = coords % 3

    if xp is np:
        from .. import native

        use_native = native.available()
    else:
        use_native = False

    def chain(v):
        if use_native:
            return native.restrict(
                native.dia_apply(offsets, data,
                                 native.prolong(v, dims, coarse_dims,
                                                coarsened)),
                dims, coarse_dims, coarsened)
        return restrict(
            dia_apply(offsets, data, prolong(v, dims, coarse_dims, coarsened, xp), xp),
            dims, coarse_dims, coarsened, xp)

    # 3^d comb responses; with the native library, all combs go through ONE
    # blocked pass so the operator data streams from memory exactly once
    w = {}
    dtype = data.dtype
    tlist = list(iproduct(range(3), repeat=d))
    if use_native:
        from .. import native

        v_block = np.zeros((nc, len(tlist)), np.float64)
        for ti, t in enumerate(tlist):
            mask = np.ones(coarse_dims, bool)
            for ax in range(d):
                mask &= mod3[ax] == t[ax]
            v_block[mask.ravel(), ti] = 1.0
        x_block = native.prolong_block(v_block, dims, coarse_dims, coarsened)
        y_block = native.dia_apply_block(offsets, data, x_block)
        w_block = native.restrict_block(y_block, dims, coarse_dims, coarsened)
        for ti, t in enumerate(tlist):
            w[t] = np.ascontiguousarray(w_block[:, ti])
    elif xp is np:
        for t in tlist:
            mask = np.ones(coarse_dims, bool)
            for ax in range(d):
                mask &= mod3[ax] == t[ax]
            v = xp.asarray(mask.ravel().astype(dtype))
            w[t] = chain(v)
    else:
        # device path: build combs from on-device coordinates — shipping the
        # host masks would cost 3^d × nc of transfer through the relay
        mod3_dev = []
        for ax in range(d):
            stride = int(np.prod(coarse_dims[ax + 1:], dtype=np.int64))
            c = (xp.arange(nc, dtype=xp.int32) // stride) % coarse_dims[ax]
            mod3_dev.append(c % 3)
        for t in tlist:
            m = xp.ones((nc,), bool)
            for ax in range(d):
                m = m & (mod3_dev[ax] == t[ax])
            w[t] = chain(m.astype(dtype))

    # assemble each coarse diagonal from the responses
    wstack = xp.stack([w[t] for t in iproduct(range(3), repeat=d)])
    taps = [delta for delta in iproduct((-1, 0, 1), repeat=d)]
    offsets_c, rows = [], []
    for delta in taps:
        if any(abs(dl) >= cd for dl, cd in zip(delta, coarse_dims)):
            continue
        off = sum(dl * st for dl, st in zip(delta, strides_c))
        # t index of column i+delta, per coarse row i
        sel = np.zeros(coarse_dims, dtype=np.int64)
        for ax in range(d):
            sel = sel * 3 + (mod3[ax] + delta[ax]) % 3
        sel = sel.ravel()
        if xp is np:
            row = wstack[sel, np.arange(nc)]
        else:
            # gather-free select for device execution; selector built from
            # on-device coordinates (no host mask transfers)
            tsel = xp.zeros((nc,), xp.int32)
            for ax in range(d):
                stride = int(np.prod(coarse_dims[ax + 1:], dtype=np.int64))
                c = (xp.arange(nc, dtype=xp.int32) // stride) % coarse_dims[ax]
                tsel = tsel * 3 + (c % 3 + delta[ax]) % 3
            row = xp.zeros((nc,), dtype)
            for ti, t in enumerate(iproduct(range(3), repeat=d)):
                row = row + w[t] * (tsel == ti).astype(dtype)
        offsets_c.append(off)
        rows.append(row)

    # stable: duplicate flat offsets (aliased deltas on tiny coarse grids)
    # must pair rows identically everywhere (incl. the distributed setup)
    order = np.argsort(offsets_c, kind="stable")
    offsets_c = [offsets_c[i] for i in order]
    data_c = xp.stack([rows[i] for i in order])

    if validate:
        rng = np.random.default_rng(0)
        x = xp.asarray(rng.standard_normal(nc).astype(np.asarray(data).dtype
                                                      if xp is np else dtype))
        y1 = dia_apply(offsets_c, data_c, x, xp)
        y2 = chain(x)
        err = float(np.max(np.abs(np.asarray(y1 - y2))))
        scale = float(np.max(np.abs(np.asarray(y2)))) + 1e-30
        tol = 1e-8 if np.asarray(data_c).dtype == np.float64 else 2e-4
        if err > tol * scale:
            raise ValueError(f"comb_rap radius assumption violated: {err}")
    if xp is np:
        # drop all-zero diagonals (host path; device wrapper filters after)
        keep = [k for k in range(len(offsets_c))
                if float(np.max(np.abs(np.asarray(data_c[k])))) > 0.0]
        offsets_c = [offsets_c[k] for k in keep]
        data_c = xp.stack([data_c[k] for k in keep]) if keep else data_c[:0]
    return offsets_c, data_c


def _rap_terms(offsets, dims, coarse_dims, coarsened):
    """Static term table of the direct Galerkin convolution.

    With tensor-product linear transfers, A_c[I, I+δ] = Σ r(s)·r(t)·a_k[u]
    over fine taps k and per-axis stencil positions: u_ax = m·I_ax + s_ax
    (m = 2 on coarsened axes, else 1), t_ax = s_ax + dk_ax − m·δ_ax, with
    r = {0: 1, ±1: ½} on coarsened axes and {0: 1} otherwise. Returns
    ``{delta: [(k, s_vec, weight), ...]}`` — the closed-form symbolic phase
    of the "two-phase SpGEMM" slot (SURVEY.md §2 #9). Raises ValueError if
    any tap exceeds per-axis radius 1 (outside the structured contract).
    """
    from .structured import axis_deltas

    d = len(dims)
    dk_all = axis_deltas(offsets, dims)
    if np.abs(dk_all).max(initial=0) > 1:
        raise ValueError("operator outside the radius-1 structured contract")
    table = {}
    for k in range(len(offsets)):
        axis_combos = []
        for ax in range(d):
            dk = int(dk_all[k, ax])
            if coarsened[ax]:
                combos = []
                for s in (-1, 0, 1):
                    for dlt in (-1, 0, 1):
                        t = s + dk - 2 * dlt
                        if abs(t) <= 1:
                            w = (0.5 if s else 1.0) * (0.5 if t else 1.0)
                            combos.append((s, dlt, w))
            else:
                combos = [(0, dk, 1.0)]
            axis_combos.append(combos)
        for choice in iproduct(*axis_combos):
            delta = tuple(c[1] for c in choice)
            if any(abs(dl) >= cd for dl, cd in zip(delta, coarse_dims)):
                continue
            s_vec = tuple(c[0] for c in choice)
            w = float(np.prod([c[2] for c in choice]))
            table.setdefault(delta, []).append((k, s_vec, w))
    return table


def direct_rap(offsets, data, dims, coarse_dims, coarsened, xp=np):
    """(offsets_c, data_c) of A_c = R A P by direct stencil convolution.

    Each fine diagonal is read O(1) times via strided (parity) slices
    instead of the comb probe's 3^d full passes. **Host (numpy) formulation
    only**: measured 4× faster than comb on CPU at 7-pt 128³ (1.8 vs 7.3 s)
    — but 12× SLOWER than comb on TPU (647 vs 55 ms @128³): lane-stride-2
    slices lower to Mosaic relayouts at gather speed, which is exactly why
    the comb probe (no strided ops anywhere) is the device RAP. Tap
    ordering is bit-compatible with :func:`comb_rap` (full 3^d tap set,
    stable offset sort, zeros where nothing contributes, boundary-masked);
    same radius-1 contract (ValueError otherwise).
    """
    d = len(dims)
    table = _rap_terms(offsets, dims, coarse_dims, coarsened)
    strides_c = [1] * d
    for k in range(d - 2, -1, -1):
        strides_c[k] = strides_c[k + 1] * coarse_dims[k + 1]

    # zero-pad coarsened axes so every (s, parity) slice is exact
    pads = []
    for ax in range(d):
        if coarsened[ax]:
            pads.append((1, 1 + 2 * coarse_dims[ax] - dims[ax]))
        else:
            pads.append((0, 0))
    grids = {}

    def grid(k):
        if k not in grids:
            g = data[k].reshape(dims)
            if any(p != (0, 0) for p in pads):
                g = xp.pad(g, pads)
            grids[k] = g
        return grids[k]

    dtype = data.dtype
    nc = int(np.prod(coarse_dims))
    rows, offs = [], []
    for delta in iproduct((-1, 0, 1), repeat=d):
        if any(abs(dl) >= cd for dl, cd in zip(delta, coarse_dims)):
            continue
        offs.append(sum(dl * st for dl, st in zip(delta, strides_c)))
        terms = table.get(delta)
        if not terms:
            rows.append(xp.zeros((nc,), dtype))
            continue
        acc = None
        for k, s_vec, w in terms:
            g = grid(k)
            sl = tuple(
                slice(s + 1, s + 1 + 2 * cdim, 2) if c else slice(None)
                for s, c, cdim in zip(s_vec, coarsened, coarse_dims))
            term = w * g[sl]
            acc = term if acc is None else acc + term
        # masked-zero invariant: taps whose column I+δ crosses the coarse
        # boundary along any axis must be EXACT zeros (kernels rely on it)
        for ax, dl in enumerate(delta):
            if dl:
                m = np.ones((coarse_dims[ax],), np.float64)
                m[-1 if dl > 0 else 0] = 0.0
                shape = [1] * d
                shape[ax] = coarse_dims[ax]
                acc = acc * xp.asarray(m.reshape(shape), dtype=dtype)
        rows.append(acc.reshape(-1).astype(dtype))
    order = np.argsort(offs, kind="stable")
    offsets_c = [offs[i] for i in order]
    data_c = xp.stack([rows[i] for i in order])
    return offsets_c, data_c


def comb_rap_device(offsets, data_f32, dims, coarse_dims, coarsened,
                    engine: str = "auto"):
    """Device-resident Galerkin RAP: one jitted graph per shape set.

    ``engine="factored"`` (the default when the operator satisfies the
    radius-1 contract) evaluates the per-axis factorization of the Galerkin
    convolution as a cascade of small dense matmuls — MXU work, zero strided
    slices, each fine diagonal read once (see :func:`_device_factored_fn`).
    ``engine="comb"`` runs the 3^d probe chains (reads the operator 3^d
    times but makes no structural assumption beyond radius 1 and stays the
    fallback / cross-check engine). Both are gather-free; both are followed
    by host-side zero filtering and a random validation probe.
    """
    import jax
    import jax.numpy as jnp

    fn = None
    if engine in ("auto", "factored"):
        try:
            fn = _device_factored_fn(tuple(offsets), tuple(dims),
                                     tuple(coarse_dims),
                                     tuple(bool(c) for c in coarsened))
        except ValueError:
            if engine == "factored":
                raise
    if fn is None:
        fn = _device_comb_fn(tuple(offsets), tuple(dims), tuple(coarse_dims),
                             tuple(bool(c) for c in coarsened))
    offs_c, data_c = fn(data_f32)
    # host-side zero filtering + validation probe
    maxes = np.asarray(jnp.max(jnp.abs(data_c), axis=1))
    keep = [k for k in range(len(offs_c)) if maxes[k] > 0]
    offs_c = [offs_c[k] for k in keep]
    data_c = data_c[np.asarray(keep, np.int64)] if keep else data_c[:0]

    rng = np.random.default_rng(0)
    nc = int(np.prod(coarse_dims))
    x = jnp.asarray(rng.standard_normal(nc), data_f32.dtype)
    y1 = dia_apply(offs_c, data_c, x, jnp)
    y2 = restrict(dia_apply(offsets, data_f32,
                            prolong(x, dims, coarse_dims, coarsened, jnp),
                            jnp), dims, coarse_dims, coarsened, jnp)
    err = float(jnp.max(jnp.abs(y1 - y2)))
    scale = float(jnp.max(jnp.abs(y2))) + 1e-30
    if err > 2e-4 * scale:
        raise ValueError(f"comb_rap_device radius assumption violated: {err}")
    return offs_c, data_c


def _balanced_deltas(offsets, dims):
    """Flat offsets → per-axis delta vectors (balanced rounding; valid for
    non-wrapping taps). None if some offset is not decomposable."""
    d = len(dims)
    strides = [1] * d
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * dims[k + 1]
    deltas = np.zeros((len(offsets), d), np.int64)
    for ki, off in enumerate(offsets):
        rem = int(off)
        for ax in range(d):
            q = int(round(rem / strides[ax]))
            deltas[ki, ax] = q
            rem -= q * strides[ax]
        if rem != 0:
            return None
    return deltas


def _const_stencil_of(offsets, data, dims):
    """(deltas, coeffs) when ``data`` is a masked-constant radius-1 stencil
    on ``dims`` (exact slice-based check), else None."""
    d = len(dims)
    deltas = _balanced_deltas(offsets, dims)
    if deltas is None or np.abs(deltas).max(initial=0) > 1:
        return None
    mid_idx = tuple(dim // 2 for dim in dims)
    if any(not (0 <= mid_idx[ax] + dl < dims[ax])
           for row in deltas for ax, dl in enumerate(row)):
        return None
    mid = 0
    for ax in range(d):
        mid = mid * dims[ax] + mid_idx[ax]
    coeffs = np.asarray(data[:, mid], np.float64)
    for k in range(len(offsets)):
        v = np.asarray(data[k]).reshape(dims)
        box = v[tuple(slice(max(0, -int(dl)), dims[ax] - max(0, int(dl)))
                      for ax, dl in enumerate(deltas[k]))]
        c = v.dtype.type(coeffs[k])
        if not np.all(box == c):
            return None
        if np.count_nonzero(v) != (box.size if c != 0 else 0):
            return None
    return deltas, coeffs


def _const_rap_surrogate(deltas, coeffs, dims, coarse_dims, coarsened):
    """Exact RAP of a masked-constant stencil via a tiny same-parity
    surrogate grid.

    Every coarse value depends only on the per-axis boundary distance of
    its index, clamped at 2 (transfer window ±1 around 2I, stencil radius
    1 ⇒ fine support [2I−2, 2I+2]; Dirichlet masks only modify rows within
    distance 1 of a face), and — on the high side — on the fine-extent
    parity. A surrogate with matching parity and coarse extent ≥ 5 per
    axis therefore realizes every distance pattern; the full coarse planes
    are an outer-product index-map gather of the surrogate's. The caller's
    random-probe validation remains the runtime safety net.
    """
    d = len(dims)
    dims_s, maps = [], []
    for ax in range(d):
        dim, cdim = int(dims[ax]), int(coarse_dims[ax])
        if coarsened[ax]:
            if cdim != (dim + 1) // 2:
                return None
            fs = 11 if dim % 2 == 1 else 12
        else:
            if cdim != dim:
                return None
            fs = 6 if dim % 2 == 0 else 7
        cs = (fs + 1) // 2 if coarsened[ax] else fs
        if dim <= fs or cdim < 5:
            dims_s.append(dim)
            maps.append(np.arange(cdim, dtype=np.int64))
            continue
        dims_s.append(fs)
        m = np.full(cdim, 2, np.int64)
        m[0], m[1] = 0, 1
        m[-2], m[-1] = cs - 2, cs - 1
        maps.append(m)
    dims_s = tuple(dims_s)
    cdims_s = tuple((ds + 1) // 2 if c else ds
                    for ds, c in zip(dims_s, coarsened))

    # surrogate planes: box-fill of the same (delta, coeff) stencil
    ns = int(np.prod(dims_s))
    strides_s = [1] * d
    for k in range(d - 2, -1, -1):
        strides_s[k] = strides_s[k + 1] * dims_s[k + 1]
    offs_s = [int(sum(dl * st for dl, st in zip(row, strides_s)))
              for row in deltas]
    data_s = np.zeros((len(offs_s), ns), np.float64)
    v3 = data_s.reshape((-1,) + dims_s)
    for k, row in enumerate(deltas):
        v3[(k,) + tuple(slice(max(0, -int(dl)),
                              dims_s[ax] - max(0, int(dl)))
                        for ax, dl in enumerate(row))] = coeffs[k]

    from .. import native

    res = (native.rap_stencil(offs_s, data_s, dims_s, cdims_s, coarsened)
           if native.available() else None)
    if res is None:
        res = comb_rap(offs_s, data_s, dims_s, cdims_s, coarsened, xp=np)
    offs_cs, data_cs = res

    cdeltas = _balanced_deltas(offs_cs, cdims_s)
    if cdeltas is None or np.abs(cdeltas).max(initial=0) > 1:
        return None
    cstrides = [1] * d
    for k in range(d - 2, -1, -1):
        cstrides[k] = cstrides[k + 1] * coarse_dims[k + 1]
    nc = int(np.prod(coarse_dims))
    offs_c, rows = [], []
    for k, row in enumerate(cdeltas):
        offs_c.append(int(sum(dl * st for dl, st in zip(row, cstrides))))
        s3 = np.asarray(data_cs[k]).reshape(cdims_s)
        rows.append(s3[np.ix_(*maps)].reshape(nc))
    order = np.argsort(offs_c, kind="stable")
    return [offs_c[i] for i in order], np.stack([rows[i] for i in order])


def structured_rap(offsets, data, dims, coarse_dims, coarsened):
    """Preferred host entry: surrogate-grid RAP for masked-constant
    stencils (O(1) in grid size), then fused native RAP, numpy direct
    convolution, lattice-comb oracle — each probe-validated before use."""
    from .. import native

    cd = _const_stencil_of(offsets, data, dims)
    if cd is not None:
        res = _const_rap_surrogate(cd[0], cd[1], dims, coarse_dims,
                                   coarsened)
        if res is not None:
            offs_c, data_c = res
            rng = np.random.default_rng(0)
            nc = int(np.prod(coarse_dims))
            x = rng.standard_normal(nc)
            if native.available():
                # the probe is a full fine-grid RAP apply — run it through
                # the native f64 kernels (it was 4–5 s of numpy at 256³ L0)
                y1 = native.dia_apply(offs_c, np.asarray(data_c, np.float64),
                                      x)
                y2 = native.restrict(
                    native.dia_apply(offsets, np.asarray(data, np.float64),
                                     native.prolong(x, dims, coarse_dims,
                                                    coarsened)),
                    dims, coarse_dims, coarsened)
            else:
                y1 = dia_apply(offs_c, data_c, x, np)
                y2 = restrict(dia_apply(offsets, data,
                                        prolong(x, dims, coarse_dims,
                                                coarsened)),
                              dims, coarse_dims, coarsened)
            err = float(np.max(np.abs(y1 - y2)))
            scale = float(np.max(np.abs(y2))) + 1e-30
            if err <= 1e-8 * scale:
                keep = [k for k in range(len(offs_c))
                        if float(np.max(np.abs(data_c[k]))) > 0.0]
                return ([offs_c[k] for k in keep],
                        data_c[keep] if keep else data_c[:0])
    if native.available():
        res = native.rap_stencil(offsets, data, dims, coarse_dims, coarsened)
        if res is not None:
            offs_c, data_c = res
            rng = np.random.default_rng(0)
            nc = int(np.prod(coarse_dims))
            x = rng.standard_normal(nc)
            y1 = dia_apply(offs_c, data_c, x, np)
            y2 = native.restrict(
                native.dia_apply(offsets, data,
                                 native.prolong(x, dims, coarse_dims,
                                                coarsened)),
                dims, coarse_dims, coarsened)
            err = float(np.max(np.abs(y1 - y2)))
            scale = float(np.max(np.abs(y2))) + 1e-30
            if err <= 1e-8 * scale:
                return offs_c, data_c
    try:
        offs_c, data_c = direct_rap(offsets, data, dims, coarse_dims,
                                    coarsened, xp=np)
        rng = np.random.default_rng(0)
        nc = int(np.prod(coarse_dims))
        x = rng.standard_normal(nc)
        y1 = dia_apply(offs_c, data_c, x, np)
        y2 = restrict(dia_apply(offsets, data,
                                prolong(x, dims, coarse_dims, coarsened)),
                      dims, coarse_dims, coarsened)
        err = float(np.max(np.abs(y1 - y2)))
        scale = float(np.max(np.abs(y2))) + 1e-30
        if err <= 1e-8 * scale:
            keep = [k for k in range(len(offs_c))
                    if float(np.max(np.abs(data_c[k]))) > 0.0]
            return ([offs_c[k] for k in keep],
                    data_c[keep] if keep else data_c[:0])
    except ValueError:
        pass
    return comb_rap(offsets, data, dims, coarse_dims, coarsened, xp=np)


def coarse_offsets(coarse_dims):
    """Static tap offsets of the comb-assembled coarse operator (sorted)."""
    d = len(coarse_dims)
    strides = [1] * d
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * coarse_dims[k + 1]
    offs = []
    for delta in iproduct((-1, 0, 1), repeat=d):
        if any(abs(dl) >= cd for dl, cd in zip(delta, coarse_dims)):
            continue
        offs.append(sum(dl * st for dl, st in zip(delta, strides)))
    return sorted(offs)


@__import__("functools").lru_cache(maxsize=64)
def _device_comb_fn(offsets, dims, coarse_dims, coarsened):
    """One jitted comb-RAP graph per level shape — compile-light form.

    The naive form inlines all 3^d probe chains into one graph (≈25 min of
    remote XLA compiles per hierarchy on the relay'd chip). Here ONE chain
    body is compiled and `lax.scan`ned over the 3^d comb phase vectors, and
    the tap assembly selects responses with a `fori_loop` — the graph is
    ~3^d× smaller at the same (bandwidth-bound) runtime.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    offs_c = coarse_offsets(coarse_dims)
    d = len(dims)
    nc = int(np.prod(coarse_dims))
    ntaps = 3 ** d
    tlist = np.array(list(iproduct(range(3), repeat=d)), np.int32)  # (3^d, d)
    deltas = [delta for delta in iproduct((-1, 0, 1), repeat=d)
              if not any(abs(dl) >= cd for dl, cd in zip(delta, coarse_dims))]
    strides_c = [int(np.prod(coarse_dims[k + 1:], dtype=np.int64))
                 for k in range(d)]
    order = np.argsort([sum(dl * st for dl, st in zip(delta, strides_c))
                        for delta in deltas], kind="stable")

    def f(data):
        dtype = data.dtype
        coords = []
        for ax in range(d):
            stride = int(np.prod(coarse_dims[ax + 1:], dtype=np.int64))
            coords.append((jnp.arange(nc, dtype=jnp.int32) // stride)
                          % coarse_dims[ax])

        def chain_body(_, tvec):
            m = jnp.ones((nc,), bool)
            for ax in range(d):
                m = m & (coords[ax] % 3 == tvec[ax])
            v = m.astype(dtype)
            w = restrict(dia_apply(offsets, data,
                                   prolong(v, dims, coarse_dims, coarsened,
                                           jnp), jnp),
                         dims, coarse_dims, coarsened, jnp)
            return None, w

        _, ws = lax.scan(chain_body, None, jnp.asarray(tlist))  # (3^d, nc)

        rows = []
        for delta in deltas:
            tsel = jnp.zeros((nc,), jnp.int32)
            for ax in range(d):
                tsel = tsel * 3 + (coords[ax] + delta[ax]) % 3

            def body(i, row):
                return row + ws[i] * (tsel == i).astype(dtype)

            rows.append(lax.fori_loop(0, ntaps, body,
                                      jnp.zeros((nc,), dtype)))
        return jnp.stack([rows[int(k)] for k in order])

    jitted = jax.jit(f)
    return lambda data: (list(offs_c), jitted(data))


def _axis_factor_maps(nf: int, nc: int, coarsened_ax: bool):
    """The 9 per-axis factor matrices M[(dk, dlt)] of the Galerkin product.

    With tensor-product linear transfers the RAP convolution separates per
    axis: the contribution of fine diagonal k to coarse tap δ is
    (⊗_ax M[dk_ax, δ_ax]) g_k, where M[dk, dlt] ∈ R^{nc×nf} collects the
    per-axis weights of :func:`_rap_terms`, M[dk, dlt][I, 2I+s] = w(s, t)
    for t = s + dk − 2·dlt, |t| ≤ 1 (w = (½ if s else 1)·(½ if t else 1)).
    Boundary rows of taps that would cross the coarse boundary are zeroed
    here (row nc−1 for dlt=+1, row 0 for dlt=−1), which reproduces the
    masked-zero invariant of :func:`direct_rap` axis-by-axis.

    Returns ``{dk: {dlt: M | "id" | None}}`` ("id" on non-coarsened axes
    where the map is the identity and the contraction is skipped).
    """
    maps = {}
    for dk in (-1, 0, 1):
        maps[dk] = {}
        for dlt in (-1, 0, 1):
            if not coarsened_ax:
                maps[dk][dlt] = "id" if dlt == dk else None
                continue
            m = np.zeros((nc, nf), np.float64)
            rows = np.arange(nc)
            for s in (-1, 0, 1):
                t = s + dk - 2 * dlt
                if abs(t) > 1:
                    continue
                w = (0.5 if s else 1.0) * (0.5 if t else 1.0)
                j = 2 * rows + s
                ok = (j >= 0) & (j < nf)
                m[rows[ok], j[ok]] += w
            if dlt == 1:
                m[nc - 1, :] = 0.0
            elif dlt == -1:
                m[0, :] = 0.0
            maps[dk][dlt] = m if np.abs(m).max() > 0 else None
    return maps


@__import__("functools").lru_cache(maxsize=64)
def _device_factored_fn(offsets, dims, coarse_dims, coarsened):
    """Jitted per-axis-factored Galerkin RAP — the fast device engine.

    The comb probe reads the operator 3^d times and the direct convolution
    needs lane-stride-2 parity slices (measured 12× slower than comb on TPU:
    Mosaic lowers them to relayouts at gather speed). This engine instead
    applies the per-axis factor matrices of :func:`_axis_factor_maps` as
    DENSE matmuls — parity extraction happens on the MXU, where a one-hot
    banded (nc×nf) matrix is ~free — cascading axis contractions so each
    fine diagonal is streamed exactly once:

        for k:  H_x[dlt_x]      = einsum(M_x[dk_x, dlt_x], g_k)    (≤3)
                H_xy[dlt_y,...] = einsum(M_y[dk_y, dlt_y], H_x)    (≤9)
                A_c[δ]         += einsum(M_z[dk_z, dlt_z], H_xy)   (≤27)

    Same tap set / stable offset ordering / masked-zero invariant as
    :func:`comb_rap`. Raises ValueError outside the radius-1 contract.
    ``precision='highest'`` keeps the matmuls at true f32 (default TPU
    bf16 passes would cost ~4e-3 relative error — above the validation
    tolerance); the matrices are tiny so the extra passes are free.
    """
    import jax
    import jax.numpy as jnp

    from .structured import axis_deltas

    d = len(dims)
    dk_all = axis_deltas(list(offsets), tuple(dims))
    if np.abs(dk_all).max(initial=0) > 1:
        raise ValueError("operator outside the radius-1 structured contract")
    nc = int(np.prod(coarse_dims))
    strides_c = [int(np.prod(coarse_dims[k + 1:], dtype=np.int64))
                 for k in range(d)]
    deltas = [delta for delta in iproduct((-1, 0, 1), repeat=d)
              if not any(abs(dl) >= cd for dl, cd in zip(delta, coarse_dims))]
    order = np.argsort([sum(dl * st for dl, st in zip(delta, strides_c))
                        for delta in deltas], kind="stable")
    offs_sorted = [sum(dl * st for dl, st in zip(deltas[int(i)], strides_c))
                   for i in order]
    maps_np = [_axis_factor_maps(dims[ax], coarse_dims[ax], coarsened[ax])
               for ax in range(d)]
    letters = "abcdefgh"[:d]

    def f(data):
        dtype = data.dtype
        maps = [{dk: {dlt: (jnp.asarray(m, dtype)
                            if isinstance(m, np.ndarray) else m)
                      for dlt, m in mdk.items()}
                 for dk, mdk in maps_np[ax].items()}
                for ax in range(d)]
        fields = data.reshape((len(offsets),) + tuple(dims))
        acc = {}
        for k in range(len(offsets)):
            partial = {(): fields[k]}
            for ax in range(d - 1, -1, -1):  # minor (lane) axis first
                m_ax = maps[ax][int(dk_all[k, ax])]
                in_sub = letters
                m_sub = "Z" + letters[ax]
                out_sub = letters[:ax] + "Z" + letters[ax + 1:]
                nxt = {}
                for key, arr in partial.items():
                    for dlt in (-1, 0, 1):
                        m = m_ax[dlt]
                        if m is None:
                            continue
                        if isinstance(m, str):  # identity axis
                            res = arr
                        else:
                            res = jnp.einsum(f"{m_sub},{in_sub}->{out_sub}",
                                             m, arr, precision="highest")
                        nxt[(dlt,) + key] = res
                partial = nxt
            for delta, arr in partial.items():
                row = arr.reshape(-1)
                acc[delta] = row if delta not in acc else acc[delta] + row
        zero = jnp.zeros((nc,), dtype)
        rows = [acc.get(deltas[int(i)], zero) for i in order]
        return jnp.stack(rows)

    jitted = jax.jit(f)
    return lambda data: (list(offs_sorted), jitted(data))
