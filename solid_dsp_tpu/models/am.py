"""AM modulation / demodulation (envelope + coherent DSB/SSB variants).

Completes the reference's intended-but-empty AM modem
(src/modulation/am/mod.rs — declared in src/modulation/mod.rs, never
implemented, not exported; SURVEY §2 #33).

Envelope demodulation is |x| followed by a one-pole DC blocker whose state is
a single scalar — expressed as an exact exponential-moving-average recurrence
computed in closed form per block (no scan: the EMA of a block is a
geometric-weighted cumulative sum, done with exp/log in f32-safe form).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "am_modulate",
    "am_demodulate_envelope",
    "am_demodulate_coherent",
    "dc_blocker_init",
    "dc_blocker_apply",
    "hilbert_init",
    "analytic_block",
    "ssb_modulate",
    "ssb_demodulate",
]


@partial(jax.jit, static_argnames=())
def am_modulate(msg: jnp.ndarray, modulation_index: float = 1.0,
                carrier_level: float = 1.0):
    """DSB-LC (large carrier) AM at complex baseband:
    out = (carrier_level + modulation_index * msg) as a real envelope."""
    return (carrier_level + modulation_index * msg).astype(
        jnp.result_type(msg.dtype, jnp.complex64)
    )


def dc_blocker_init(dtype=jnp.float32, batch_shape: tuple = ()):
    return jnp.zeros(batch_shape, dtype=dtype)


@jax.jit
def dc_blocker_apply(state, x: jnp.ndarray, alpha: float = 0.01):
    """One-pole DC tracker: m[n] = (1-alpha) m[n-1] + alpha x[n]; y = x - m.

    The EMA is a linear recurrence with *constant* coefficient, so the whole
    block is closed form:  m[n] = (1-a)^(n+1) m0 + a sum_k (1-a)^(n-k) x[k].
    Computed via a first-order associative scan (log-depth), exact.
    """
    a = alpha
    T = x.shape[-1]

    def combine(l, r):
        # pairs (c, v): m = c * m_prev + v
        c1, v1 = l
        c2, v2 = r
        return c1 * c2, c2 * v1 + v2

    cs = jnp.full(x.shape, 1.0 - a, dtype=x.dtype)
    vs = a * x
    c_acc, v_acc = jax.lax.associative_scan(combine, (cs, vs), axis=-1)
    m = c_acc * state[..., None] + v_acc
    return x - m, m[..., -1]


def am_demodulate_envelope(state, x: jnp.ndarray, alpha: float = 0.01):
    """Envelope detector: |x| -> DC blocker.  Returns (y, new_state)."""
    env = jnp.abs(x)
    return dc_blocker_apply(state, env, alpha)


@jax.jit
def am_demodulate_coherent(x: jnp.ndarray):
    """Coherent DSB demod at baseband: take the in-phase rail."""
    return jnp.real(x)


# ---------------------------------------------------------------------------
# SSB (single sideband) via FIR Hilbert analytic signal
# ---------------------------------------------------------------------------

def hilbert_init(ntaps: int = 63, dtype=jnp.float32):
    """(taps, tail) for the streaming analytic-signal transformer."""
    import numpy as np

    from ..design.firdes import firdes_hilbert

    taps = np.asarray(firdes_hilbert(ntaps), dtype=dtype)
    tail = jnp.zeros(ntaps - 1, dtype=dtype)
    return taps, tail


def analytic_block(taps, tail, x):
    """Streaming analytic signal: returns (a, new_tail) where
    a[n] = x[n - (N-1)/2] + j * H{x}[n] — the real rail is delayed to match
    the Hilbert FIR's group delay."""
    from ..ops.fir import conv1d_mxu
    from ..streaming.framing import extend_with_tail, split_tail

    n = taps.shape[-1]
    c = (n - 1) // 2
    x_ext = extend_with_tail(tail, x)
    # conv1d_mxu is a correlation; the Hilbert kernel is antisymmetric, so
    # correlation applies -h — negate to get the true convolution H{x}
    q = conv1d_mxu(x_ext, -jnp.asarray(taps))          # imaginary rail
    i = x_ext[..., c: c + x.shape[-1]]                  # matched delay
    return jax.lax.complex(i, q), split_tail(x_ext, n - 1)


def ssb_modulate(taps, tail, msg, sideband: str = "upper"):
    """SSB at complex baseband: upper = analytic(msg) (positive freqs only),
    lower = conj of the analytic spectrum (negative freqs only).
    Returns (iq, new_tail)."""
    a, tail = analytic_block(taps, tail, msg)
    if sideband == "lower":
        a = jnp.conj(a)
    elif sideband != "upper":
        raise ValueError("sideband must be 'upper' or 'lower'")
    return a, tail


@jax.jit
def ssb_demodulate(x):
    """Coherent SSB demod at baseband: the real rail carries the message."""
    return jnp.real(x)
