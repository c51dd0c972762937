"""AutoCorrelator — windowed delay-conjugate-multiply correlator.

Parity: reference ``src/filter/auto_correlator/mod.rs`` — struct (:26-35),
push (:99-111), execute (:156-163), get_energy (:212-214).

Decoded reference semantics: with window size W and delay D, the output after
pushing x[n] is

    y[n] = sum_{k=0}^{W-1-D} x[n-k] * conj(x[n-D-k])

(the delayed window's last D slots are never written by Window::push, so they
stay zero — that bound is part of the reference's observable behavior, and
for D >= W the output is identically 0).  The running energy is a W-length
moving sum of |x|^2.

Block form: z[n] = x[n] conj(x[n-D]) followed by a moving sum — two
vectorized passes, no per-sample loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["autocorr_init", "autocorr_apply", "AutoCorrelator"]


def autocorr_init(window_size: int, delay: int, dtype=jnp.complex64,
                  batch_shape: tuple = ()):
    """State: x history of length W-1+D (enough for z and the moving sum)
    plus |x|^2 history of length W-1 for the energy sum."""
    from ..utils.transfer import zeros_device

    hist = max(window_size - 1 + delay, 0)
    rdtype = np.zeros(0, dtype=dtype).real.dtype
    return {
        "x_tail": zeros_device((*batch_shape, hist), dtype),
        "e_tail": zeros_device((*batch_shape, max(window_size - 1, 0)),
                               rdtype),
    }


@partial(jax.jit, static_argnames=("window_size", "delay"))
def autocorr_apply(state, x, window_size: int, delay: int):
    """Returns (y, energy, new_state); y[n] and energy[n] after pushing x[n]."""
    W, D = window_size, delay
    x_ext = jnp.concatenate([state["x_tail"], x], axis=-1)
    L = x.shape[-1]
    n0 = state["x_tail"].shape[-1]  # offset of x[0] within x_ext

    from .fir import conv1d_mxu

    terms = W - D  # number of valid correlation terms
    if terms <= 0:
        y = jnp.zeros(x.shape, dtype=x.dtype)
    else:
        # z[m] = x_ext[m+D] * conj(x_ext[m]); with a full-length tail every
        # index below is in range (min global index touched is exactly D)
        z = x_ext[..., D:] * jnp.conj(x_ext[..., : x_ext.shape[-1] - D]) if D > 0 \
            else x_ext * jnp.conj(x_ext)
        # y[n] = sum_{k=0}^{terms-1} z[n0 - D + n - k]: a `terms`-long moving
        # sum — one ones-kernel conv (O(L) HBM traffic, no (L, terms) im2col)
        ones = jnp.ones(terms, z.real.dtype)
        y = conv1d_mxu(z[..., D:], ones)

    e2_ext = jnp.concatenate(
        [state["e_tail"], jnp.real(x * jnp.conj(x))], axis=-1
    )
    energy = conv1d_mxu(e2_ext, jnp.ones(W, e2_ext.dtype))

    hist = state["x_tail"].shape[-1]
    new_state = {
        "x_tail": x_ext[..., -hist:] if hist else x_ext[..., :0],
        "e_tail": e2_ext[..., -(W - 1):] if W > 1 else e2_ext[..., :0],
    }
    return y, energy, new_state


class AutoCorrelator:
    """Stateful wrapper with the reference's API shape."""

    def __init__(self, window_size: int, delay: int, dtype=None):
        self.window_size = int(window_size)
        self.delay = int(delay)
        self._dtype = dtype or (jnp.complex128 if jax.config.jax_enable_x64
                                else jnp.complex64)
        self._st = autocorr_init(self.window_size, self.delay, self._dtype)
        self._energy = 0.0

    def reset(self) -> None:
        self._st = autocorr_init(self.window_size, self.delay, self._dtype)
        self._energy = 0.0

    def push(self, sample) -> None:
        self.execute_block(jnp.asarray([sample]))

    def write(self, samples) -> None:
        self.execute_block(jnp.asarray(samples))

    def execute_block(self, samples):
        samples = jnp.asarray(samples, dtype=self._dtype)
        y, energy, self._st = autocorr_apply(
            self._st, samples, self.window_size, self.delay
        )
        if energy.shape[-1]:
            self._energy = float(energy[..., -1])
        self._last = y
        return y

    def execute(self):
        """Correlation value at the current state, without pushing
        (ref execute :156-163) — computed from the stored tail."""
        W, D = self.window_size, self.delay
        tail = np.asarray(self._st["x_tail"])
        terms = W - D
        if terms <= 0 or tail.size == 0:
            return 0j
        acc = 0j
        for k in range(terms):
            a = tail[-1 - k] if k < tail.size else 0.0
            bidx = -1 - k - D
            b = tail[bidx] if -bidx <= tail.size else 0.0
            acc += a * np.conj(b)
        return acc

    def get_energy(self) -> float:
        return self._energy

    def __repr__(self) -> str:
        return (
            f"AutoCorrelator<{self._dtype}> [Size={self.window_size}] "
            f"[Delay={self.delay}] [Energy={self._energy}]"
        )
