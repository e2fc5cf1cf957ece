"""Double-float32 ("df64") compensated arithmetic for on-device residuals.

TPU v5e has no f64 hardware, and at 256³ the f64 host round-trip of the
iterative-refinement residual (SURVEY.md §2 #15's 1e-8 target) costs more
than the entire f32 solve: ~0.5 GB of x/r traffic through the (slow) host
relay per outer iteration. This module removes that: each f64 quantity is
an unevaluated pair of f32s (hi, lo) with |lo| ≤ ulp(hi)/2, carried through
error-free transformations (Knuth two-sum, Dekker split two-product — no
FMA required), giving ~2⁻⁴⁸ relative accuracy per operation. That is the
standard double-double construction (Dekker 1971; Hida/Li/Bailey QD)
specialized to the few ops IR needs: DIA SpMV, axpy, subtraction, norm².

Everything here is pure jnp elementwise math — fuses under jit, streams at
HBM bandwidth, and vectorizes on the VPU. Cost vs plain f32 is ~6× FLOPs
on a memory-bound op ⇒ roughly 2× wall (hi+lo streams twice the bytes).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_SPLIT = np.float32(4097.0)  # 2^12 + 1: Dekker split constant for f32


def two_sum(a, b):
    """Error-free sum: a + b = s + e exactly (Knuth; no magnitude order)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| ≥ |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Dekker split: a = hi + lo with hi, lo having ≤ 12 significand bits."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: a·b = p + e exactly (Dekker, FMA-free)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_renorm(h, l):
    return fast_two_sum(h, l)


def df_add(xh, xl, yh, yl):
    """(xh,xl) + (yh,yl), "accurate" double-double addition."""
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return fast_two_sum(s, e)


def df_neg(xh, xl):
    return -xh, -xl


def df_mul_f32(xh, xl, c):
    """(xh,xl) · c for an f32 array/scalar c."""
    p, e = two_prod(xh, c)
    e = e + xl * c
    return fast_two_sum(p, e)


def df_mul(xh, xl, yh, yl):
    """Full double-double product (drops the xl·yl term: ≤ 2⁻⁴⁸ relative)."""
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return fast_two_sum(p, e)


def df_from_f64(v: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side exact split of an f64 array into (hi, lo) f32 pairs."""
    v = np.asarray(v, np.float64)
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def df_spmv(offsets: Sequence[int], data_h: jax.Array,
            data_l: Optional[jax.Array], xh: jax.Array, xl: jax.Array):
    """y = A·x in df64 for a DIA operator (data[k, i] multiplies x[i+off]).

    ``data_l`` may be None when the operator values are f32-exact (true for
    every generated stencil problem: ±1-style taps). Mirrors the padded
    static-slice formulation of comb_rap.dia_apply — gather-free, fusable.
    """
    n = xh.shape[0]
    offs = [int(o) for o in offsets]
    lo_pad = max(0, -min(offs)) if offs else 0
    hi_pad = max(0, max(offs)) if offs else 0
    xhp = jnp.pad(xh, (lo_pad, hi_pad))
    xlp = jnp.pad(xl, (lo_pad, hi_pad))
    yh = jnp.zeros_like(xh)
    yl = jnp.zeros_like(xh)
    for k, off in enumerate(offs):
        ah = data_h[k]
        xs_h = lax.dynamic_slice(xhp, (off + lo_pad,), (n,))
        xs_l = lax.dynamic_slice(xlp, (off + lo_pad,), (n,))
        p, e = two_prod(ah, xs_h)
        e = e + ah * xs_l
        if data_l is not None:
            e = e + data_l[k] * xs_h
        yh, yl = df_add(yh, yl, p, e)
    return yh, yl


def df_norm2(xh: jax.Array, xl: jax.Array):
    """‖x‖² as an f32 scalar (pairwise XLA reduction of hi²+2·hi·lo).

    The IR stopping test needs the norm to ~1e-3 relative, not 2⁻⁴⁸ —
    f32 pairwise summation of the df-squared terms is orders beyond that.
    """
    return jnp.sum(xh * xh + 2.0 * xh * xl)


@partial(jax.jit, static_argnames=("offsets",))
def _residual_step(offsets, data_h, data_l, bh, bl, xh, xl):
    """One IR refresh: r = b − A·x (df64), ‖r‖², and r_hi/‖r‖ for the
    f32 inner solve — a single device dispatch per outer iteration."""
    ah, al = df_spmv(offsets, data_h, data_l, xh, xl)
    rh, rl = df_add(bh, bl, -ah, -al)
    rn2 = df_norm2(rh, rl)
    rnorm = jnp.sqrt(rn2)
    safe = jnp.where(rnorm == 0, 1.0, rnorm)
    return rh / safe, rh, rl, rnorm


@jax.jit
def _accumulate_step(xh, xl, e_f32, scale_h, scale_l):
    """x ← x + scale·e in df64 (scale is the df64 split of the f64 scalar)."""
    ph, pl = df_mul_f32(scale_h, scale_l, e_f32)
    return df_add(xh, xl, ph, pl)
