"""Dense vector ops (reference's vec.c/blas.c layer, SURVEY.md §2 #5).

These are trivially ``jnp`` on TPU — they exist as named functions so the
solver code reads like the algorithm and so the distributed layer can swap in
``psum``-reducing variants (parallel/dist_ops.py) with the same signatures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.vdot(x, y)


def norm2(x: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.vdot(x, x))


def axpy(alpha, x: jax.Array, y: jax.Array) -> jax.Array:
    return alpha * x + y
