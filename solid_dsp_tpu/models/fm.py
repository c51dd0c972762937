"""FM modulation / demodulation (phase-difference discriminator).

New capability (the reference's modulation layer is an empty stub —
src/modulation/am/mod.rs is 0 bytes); semantics follow the classic analog
conventions: baseband complex FM with modulation index kf (radians per
sample per unit message amplitude).

Both directions are pure block ops:
* modulate: phase integration is a cumulative sum (parallel prefix — O(log n)
  depth on TPU), carried across blocks by a phase scalar;
* demodulate: y[n] = angle(x[n] conj(x[n-1])) / (2 pi kf), carried by one
  previous sample.  No sequential scan anywhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["fm_modulate", "fm_demodulate", "fm_demod_init"]


@partial(jax.jit, static_argnames=())
def fm_modulate(msg: jnp.ndarray, kf: float, phase0=0.0):
    """Complex-baseband FM: out[n] = exp(j (phase0 + 2 pi kf cumsum(msg))).

    Returns (iq, phase_end) for block streaming.
    """
    dphase = 2.0 * jnp.pi * kf * msg
    phase = phase0 + jnp.cumsum(dphase, axis=-1)
    iq = jnp.exp(1j * phase)
    return iq, phase[..., -1] % (2.0 * jnp.pi)


def fm_demod_init(dtype=jnp.complex64, batch_shape: tuple = ()):
    """Carry: the previous sample (1 + 0j so the first output is 0)."""
    return jnp.ones((*batch_shape,), dtype=dtype)


@partial(jax.jit, static_argnames=())
def fm_demodulate(state, x: jnp.ndarray, kf: float):
    """Phase-difference discriminator.

    y[n] = arg(x[n] conj(x[n-1])) / (2 pi kf); returns (y, new_state).
    """
    prev = jnp.concatenate([state[..., None], x[..., :-1]], axis=-1)
    d = x * jnp.conj(prev)
    y = jnp.angle(d) / (2.0 * jnp.pi * kf)
    return y, x[..., -1]
