"""Shared parallel linear-recurrence machinery.

The block-parallel evaluation of  s[t] = A[t] s[t-1] + v[t]  as an
O(log T)-depth ``associative_scan`` over affine maps (A, v) is used by the
IIR engine (ops/iir.py, companion matrices), the steady-state Kalman
tracker (ops/kalman.py), and any future first-order-vector recurrence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["affine_combine", "affine_scan"]


def affine_combine(left, right, precision=None):
    """Compose affine maps: (A2, v2) ∘ (A1, v1) = (A2 A1, A2 v1 + v2)."""
    A1, v1 = left
    A2, v2 = right
    return (jnp.matmul(A2, A1, precision=precision),
            jnp.einsum("...ij,...j->...i", A2, v1) + v2)


def affine_scan(As, vs, precision=None):
    """Prefix evaluation of s[t] = A[t] s[t-1] + v[t] (s[-1] folded into
    v[0] by the caller).  As: (T, n, n), vs: (T, n) -> s: (T, n)."""
    def combine(left, right):
        return affine_combine(left, right, precision)

    _, s = jax.lax.associative_scan(combine, (As, vs))
    return s
