"""Test-problem generators (reference's poisson.c/problem.c, SURVEY.md §2 #16).

The four BASELINE.json config operators, built directly in banded (DIA) form:

1. 2D 5-point Poisson            (``poisson2d_5pt``)
2. 3D 7-point Poisson            (``poisson3d_7pt``)
3. 2D 9-point anisotropic diffusion, -eps*u_xx - u_yy, bilinear FEM (``aniso2d_9pt``)
4. 3D 27-point Poisson           (``poisson3d_27pt``)

All use Dirichlet boundary conditions with eliminated boundary rows (pure
interior unknowns), the canonical setup for classical-AMG convergence tests.
Generation is vectorized numpy → DIA device arrays; no scipy needed even at
256^3 (the multi-host benchmark size).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..sparse.formats import Dia


def stencil_to_dia(dims: Sequence[int], taps: Dict[Tuple[int, ...], float],
                   dtype=jnp.float32, backend: str = "jax") -> Dia:
    """Build a Dirichlet-masked constant-stencil operator as DIA.

    ``dims`` are grid extents in C order (slowest axis first); unknown
    ``i = sum_k idx[k] * stride[k]``. ``taps`` maps index-offset tuples to
    stencil values; taps reaching outside the grid are masked to zero
    (Dirichlet elimination).
    """
    dims = tuple(int(d) for d in dims)
    ndim = len(dims)
    strides = [1] * ndim
    for k in range(ndim - 2, -1, -1):
        strides[k] = strides[k + 1] * dims[k + 1]
    n = int(np.prod(dims))

    items = sorted(taps.items(), key=lambda kv: sum(d * s for d, s in zip(kv[0], strides)))
    offsets = [sum(d * s for d, s in zip(tap, strides)) for tap, _ in items]
    if backend == "device":
        # build the diagonal planes on the accelerator: pure iota/compare —
        # avoids shipping O(ndiag·n) data through the (slow) host→device path
        return Dia(data=_stencil_data_device(dims, tuple(strides),
                                             tuple(items), dtype),
                   offsets=tuple(offsets), dims=dims)
    data = np.zeros((len(items), n), dtype=np.float64)
    idx_grids = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    for k, (tap, value) in enumerate(items):
        mask = np.ones(dims, dtype=bool)
        for ax in range(ndim):
            shifted = idx_grids[ax] + tap[ax]
            mask &= (shifted >= 0) & (shifted < dims[ax])
        data[k] = value * mask.ravel()
    if backend == "numpy":
        return Dia(data=data, offsets=tuple(offsets), dims=dims)
    return Dia(data=jnp.asarray(data, dtype=dtype), offsets=tuple(offsets),
               dims=dims)


def _stencil_data_device(dims, strides, items, dtype):
    import jax

    @jax.jit
    def build():
        n = int(np.prod(dims))
        idx = jnp.arange(n, dtype=jnp.int32)
        planes = []
        for tap, value in items:
            mask = jnp.ones((n,), jnp.bool_)
            for ax, d in enumerate(dims):
                c = (idx // strides[ax]) % d
                s = c + tap[ax]
                mask = mask & (s >= 0) & (s < d)
            planes.append(jnp.where(mask, jnp.asarray(value, dtype),
                                    jnp.asarray(0, dtype)))
        return jnp.stack(planes)

    return build()


def poisson2d_5pt(nx: int, ny: int | None = None, dtype=jnp.float32,
                  backend: str = "jax") -> Dia:
    ny = nx if ny is None else ny
    taps = {(0, 0): 4.0, (0, 1): -1.0, (0, -1): -1.0, (1, 0): -1.0, (-1, 0): -1.0}
    return stencil_to_dia((ny, nx), taps, dtype=dtype, backend=backend)


def poisson3d_7pt(nx: int, ny: int | None = None, nz: int | None = None,
                  dtype=jnp.float32, backend: str = "jax") -> Dia:
    ny = nx if ny is None else ny
    nz = nx if nz is None else nz
    taps = {(0, 0, 0): 6.0}
    for ax in range(3):
        for s in (-1, 1):
            tap = [0, 0, 0]
            tap[ax] = s
            taps[tuple(tap)] = -1.0
    return stencil_to_dia((nz, ny, nx), taps, dtype=dtype, backend=backend)


def poisson3d_27pt(nx: int, ny: int | None = None, nz: int | None = None,
                   dtype=jnp.float32, backend: str = "jax") -> Dia:
    """27-point 3D Laplacian (all 26 neighbors -1, center 26)."""
    ny = nx if ny is None else ny
    nz = nx if nz is None else nz
    taps = {}
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dz == dy == dx == 0:
                    taps[(0, 0, 0)] = 26.0
                else:
                    taps[(dz, dy, dx)] = -1.0
    return stencil_to_dia((nz, ny, nx), taps, dtype=dtype, backend=backend)


def aniso2d_9pt(nx: int, ny: int | None = None, eps: float = 1e-3,
                dtype=jnp.float32, backend: str = "jax") -> Dia:
    """-eps*u_xx - u_yy with bilinear quad FEM → 9-point stencil.

    Tensor-product assembly: A = eps*(M_y ⊗ K_x) + (K_y ⊗ M_x) with 1D
    stiffness K = tridiag(-1, 2, -1)/h and mass M = tridiag(1, 4, 1)*h/6.
    At eps=1e-3 the strong couplings are essentially 1D in y — the
    strength-of-connection stress test (BASELINE.json config 3).
    """
    ny = nx if ny is None else ny
    h = 1.0 / (nx + 1)
    K1 = {0: 2.0 / h, 1: -1.0 / h, -1: -1.0 / h}
    M1 = {0: 4.0 * h / 6.0, 1: h / 6.0, -1: h / 6.0}
    taps = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            taps[(dy, dx)] = eps * M1[dy] * K1[dx] + K1[dy] * M1[dx]
    return stencil_to_dia((ny, nx), taps, dtype=dtype, backend=backend)


def default_rhs(a: Dia, kind: str = "random", seed: int = 0) -> jnp.ndarray:
    """Benchmark right-hand sides: reproducible random or all-ones."""
    n = a.n_rows
    if kind == "ones":
        return jnp.ones((n,), a.dtype)
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(n), dtype=a.dtype)


PROBLEMS = {
    "2d5pt": poisson2d_5pt,
    "3d7pt": poisson3d_7pt,
    "3d27pt": poisson3d_27pt,
    "aniso9pt": aniso2d_9pt,
}
