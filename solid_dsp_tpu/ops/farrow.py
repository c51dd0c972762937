"""Farrow arbitrary-ratio resampler (cubic Lagrange).

Completes the rate-conversion family (integer decimators/interpolators,
rational P/Q polyphase, CIC): resampling by ANY real ratio — the 48k ->
44.1k class of conversions and fine sample-clock tracking (timing loops
feed a slowly varying ratio).

TPU formulation: each output sample needs 4 input points around its
fractional position; the 4-point windows come from one monotonic gather
(small fan-out, unlike im2col) and the cubic Lagrange basis evaluates as
a (T_out, 4) einsum — no sequential dependency, the whole block is
parallel.  The output length per block depends on the carried fractional
phase, so it is computed host-side (one retrace when it changes by +-1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lagrange_coeffs", "FarrowResampler"]

from functools import partial


@jax.jit
def _farrow_block(tail, x, base, mu):
    """One resampler block as a single fused dispatch.

    base (int32) / mu (f32) arrive precomputed: output positions are
    host-computed in float64 because on-device f32 position accumulation
    (t0 + k*ratio) loses mu precision entirely for k in the millions
    (TPUs have no f64).  Rational ratios cycle through a small set of
    block phases, so the host arrays are cached per phase.
    """
    ext = jnp.concatenate([tail, x])
    new_tail = ext[-(tail.shape[-1]):]
    idx = base[:, None] + jnp.arange(4, dtype=jnp.int32)[None, :]
    windows = ext[idx]  # (T_out, 4) monotonic gather
    c = lagrange_coeffs(mu).astype(ext.dtype)
    return jnp.einsum("tk,tk->t", windows, c), new_tail


@jax.jit
def lagrange_coeffs(mu):
    """Cubic Lagrange basis at fractional offset mu in [0, 1), for the
    4-point stencil x[-1], x[0], x[1], x[2]:  (T, 4)."""
    m = jnp.asarray(mu)
    c_m1 = -m * (m - 1.0) * (m - 2.0) / 6.0
    c_0 = (m + 1.0) * (m - 1.0) * (m - 2.0) / 2.0
    c_1 = -(m + 1.0) * m * (m - 2.0) / 2.0
    c_2 = (m + 1.0) * m * (m - 1.0) / 6.0
    return jnp.stack([c_m1, c_0, c_1, c_2], axis=-1)


class FarrowResampler:
    """Streaming arbitrary-ratio resampler.

    ratio = input samples per output sample (e.g. 48000/44100 to go from
    48 kHz down to 44.1 kHz).  Cubic interpolation: > 60 dB image
    rejection for signals below ~0.1 of the input rate.
    """

    STENCIL = 4  # x[-1], x[0], x[1], x[2]

    def __init__(self, ratio: float, dtype=jnp.complex64):
        if ratio <= 0.0:
            raise ValueError("ratio must be positive")
        self.ratio = float(ratio)
        self._pos_cache: dict = {}
        self._tail = jnp.zeros(self.STENCIL - 1, dtype)
        # position of the next output, in input-sample units, measured
        # from index 1 of the CURRENT extended block (so a stencil point
        # at -1 is always available)
        self._t_next = 0.0

    def execute_block(self, x):
        x = jnp.asarray(x, self._tail.dtype)
        L = int(x.shape[-1]) + self.STENCIL - 1
        # valid output positions t (ext stencil coords: sample value at
        # position t+1+mu uses ext[floor(t) .. floor(t)+3]): need
        # floor(t)+3 <= L-1, i.e. strictly t < L-3.  n_out and the phase
        # update are pure host arithmetic (no device fetch); the block
        # itself is ONE jitted dispatch (eager per-op dispatch over the
        # axon tunnel measured 1000x slower).
        n_out = int(np.ceil((L - 3 - self._t_next) / self.ratio - 1e-12))
        n_out = max(n_out, 0)
        if n_out == 0:
            ext_tail = jnp.concatenate([self._tail, x])[-(self.STENCIL - 1):]
            self._tail = ext_tail
            self._t_next -= x.shape[-1]
            return x[:0]
        # pad the position arrays to a fixed per-L length: a shape that
        # wobbles by +-1 between blocks forces a fresh XLA compile of the
        # gather program every block (~30 s over the tunnel; measured
        # 1000x throughput loss), while the padded program compiles once.
        n_pad = int(np.ceil((L - 3) / self.ratio)) + 2
        key = (round(self._t_next, 9), n_pad)
        cached = self._pos_cache.get(key)
        if cached is None:
            t = self._t_next + self.ratio * np.arange(n_pad)
            base_np = np.minimum(np.floor(t), L - 4).astype(np.int32)
            rdt = np.zeros(0, self._tail.dtype).real.dtype
            mu_np = (t - np.floor(t)).astype(rdt)
            cached = (jnp.asarray(base_np), jnp.asarray(mu_np))
            if len(self._pos_cache) < 64:
                self._pos_cache[key] = cached
        base, mu = cached
        y_pad, self._tail = _farrow_block(self._tail, x, base, mu)
        y = y_pad[:n_out]
        t_end = self._t_next + self.ratio * n_out
        self._t_next = float(t_end - (L - 3))
        return y

    def reset(self):
        self._tail = jnp.zeros_like(self._tail)
        self._t_next = 0.0

    def __repr__(self):
        return f"FarrowResampler [ratio={self.ratio:.6f}]"
