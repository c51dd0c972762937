"""Adaptive FIR equalization: block LMS + gradient (optax) training.

New capability beyond the reference (it has no adaptive filtering); this is
the framework's "training" story: channel equalizers whose taps are learned
from data, either with the classic block-LMS update or with a genuine
optimizer step (optax) on a jitted loss — both pure block transforms that
shard over a ('channel', 'time') mesh like everything else.

* ``lms_step``: w <- w + mu * X^H e / T   (block least-mean-squares; the
  per-sample LMS recursion averaged over the block — the standard
  frequency-flat convergence behavior at block scale, all MXU work).
* ``make_equalizer_trainer``: optax SGD/Adam on 0.5*|y - d|^2 with the
  complex-gradient convention dL/dw* (jax native for complex leaves).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fir import conv1d_mxu
from ..streaming.framing import extend_with_tail, split_tail

__all__ = ["eq_init", "eq_apply", "lms_step", "make_equalizer_trainer",
           "LMSEqualizer"]


def eq_init(ntaps: int, dtype=jnp.complex64):
    """(taps, tail): center-spike initial taps, zero input history."""
    taps = jnp.zeros(ntaps, dtype=dtype).at[ntaps // 2].set(1.0)
    tail = jnp.zeros(max(ntaps - 1, 0), dtype=dtype)
    return taps, tail


@jax.jit
def eq_apply(taps, tail, x):
    """Filter a block: y[t] = sum_i taps[i] x_ext[t+i]; returns (y, tail)."""
    x_ext = extend_with_tail(tail, x)
    y = conv1d_mxu(x_ext, taps)
    return y, split_tail(x_ext, taps.shape[-1] - 1)


@jax.jit
def lms_step(taps, tail, x, desired, mu=0.05):
    """One block-LMS adaptation step.

    Returns (y, new_taps, new_tail); e = d - y, w += mu * mean_t(e[t] W[t]^*).
    """
    n = taps.shape[-1]
    x_ext = extend_with_tail(tail, x)
    y = conv1d_mxu(x_ext, taps)
    e = desired.astype(y.dtype) - y
    # grad[i] = mean_t e[t] conj(x_ext[t+i]) — a sliding correlation of the
    # error against the input: same conv kernel, no (T, n) materialization
    grad = conv1d_mxu(jnp.conj(x_ext), e)[..., :n] / x.shape[-1]
    new_taps = taps + mu * grad.astype(taps.dtype)
    return y, new_taps, split_tail(x_ext, n - 1)


def make_equalizer_trainer(ntaps: int, optimizer=None, dtype=jnp.complex64):
    """Gradient-descent equalizer training: returns (init, train_step).

    ``train_step(taps, opt_state, tail, x, d) ->
    (y, taps, opt_state, tail, loss)`` — one jitted optimizer step on the
    block loss  L = mean |y - d|^2  (optax handles complex leaves natively).
    """
    import optax

    opt = optimizer or optax.adam(3e-2)

    def init():
        taps, tail = eq_init(ntaps, dtype)
        return taps, opt.init(taps), tail

    @jax.jit
    def train_step(taps, opt_state, tail, x, d):
        x_ext = extend_with_tail(tail, x)

        def loss_fn(w):
            y = conv1d_mxu(x_ext, w)
            r = y - d.astype(y.dtype)
            return jnp.mean(jnp.real(r * jnp.conj(r))), y

        (loss, y), g = jax.value_and_grad(loss_fn, has_aux=True)(taps)
        g = jnp.conj(g)  # dL/dw* convention for complex descent
        updates, opt_state = opt.update(g, opt_state, taps)
        taps = optax.apply_updates(taps, updates)
        return y, taps, opt_state, split_tail(x_ext, ntaps - 1), loss

    return init, train_step


class LMSEqualizer:
    """Stateful block-LMS equalizer with the framework's streaming API."""

    def __init__(self, ntaps: int, mu: float = 0.05, dtype=jnp.complex64):
        self.ntaps = int(ntaps)
        self.mu = float(mu)
        self._taps, self._tail = eq_init(self.ntaps, dtype)

    @property
    def taps(self) -> np.ndarray:
        return np.asarray(self._taps)

    def execute_block(self, x, desired=None):
        """Filter a block; adapts taps when ``desired`` is given."""
        x = jnp.asarray(x, self._taps.dtype)
        if desired is None:
            y, self._tail = eq_apply(self._taps, self._tail, x)
            return y
        y, self._taps, self._tail = lms_step(
            self._taps, self._tail, x, jnp.asarray(desired, self._taps.dtype),
            self.mu,
        )
        return y

    def reset(self):
        self._taps, self._tail = eq_init(self.ntaps, self._taps.dtype)

    def __repr__(self):
        return f"LMSEqualizer [ntaps={self.ntaps}] [mu={self.mu}]"
