"""Group delay for FIR and IIR filters.

Parity: reference ``src/group_delay/mod.rs`` — fir_group_delay (:51-79),
iir_group_delay (:82-129).  Both use the reference's positive-exponent
rotation e^{+j 2 pi f i}; the IIR variant builds
c = corr(conj(a_reversed), b) and subtracts (len(a) - 1).
Host-side float64 (analysis is setup-time, not per-sample).
"""

from __future__ import annotations

import numpy as np

__all__ = ["fir_group_delay", "iir_group_delay", "fir_group_delay_band"]

_TOLERANCE = 1e-11


def _check_freq(frequency: float):
    if frequency < -0.5 or frequency > 0.5:
        raise ValueError("frequency out of bounds [-0.5, 0.5]")


def fir_group_delay(coefficients, frequency: float) -> float:
    """Group delay (samples) of an FIR filter at normalized frequency.

    Parity: ref group_delay/mod.rs:51-79.  Note: callers that hold taps in
    the reference's *reversed* storage order (FIRFilter.coefficients()) get
    the same values the reference reports.
    """
    c = np.asarray(coefficients, dtype=np.complex128)
    if c.size == 0:
        raise ValueError("empty coefficients")
    _check_freq(frequency)
    i = np.arange(c.size, dtype=np.float64)
    rot = np.exp(2j * np.pi * frequency * i)
    t0 = np.sum(c * rot * i)
    t1 = np.sum(c * rot)
    return float((t0 / t1).real)


def iir_group_delay(numerator, denominator, frequency: float) -> float:
    """Group delay (samples) of an IIR filter at normalized frequency.

    Parity: ref group_delay/mod.rs:82-129.
    """
    b = np.asarray(numerator, dtype=np.complex128)
    a = np.asarray(denominator, dtype=np.complex128)
    if b.size == 0 or a.size == 0:
        raise ValueError("empty coefficients")
    _check_freq(frequency)

    coefs = np.zeros(b.size + a.size - 1, dtype=np.complex128)
    for i in range(a.size):
        for j in range(b.size):
            coefs[i + j] += np.conj(a[a.size - i - 1]) * b[j]

    i = np.arange(coefs.size, dtype=np.float64)
    c0 = coefs * np.exp(2j * np.pi * frequency * i)
    t0 = np.sum(c0 * i)
    t1 = np.sum(c0)
    if np.hypot(t1.real, t1.imag) <= _TOLERANCE:
        raise ZeroDivisionError("denominator coefficients divide numerator by zero")
    return float((t0 / t1).real) - (a.size - 1)


def fir_group_delay_band(coefficients, frequencies) -> np.ndarray:
    """Vectorized FIR group delay over a frequency grid."""
    c = np.asarray(coefficients, dtype=np.complex128)
    f = np.atleast_1d(np.asarray(frequencies, dtype=np.float64))
    i = np.arange(c.size, dtype=np.float64)
    E = np.exp(2j * np.pi * np.outer(f, i))
    t0 = E @ (c * i)
    t1 = E @ c
    return (t0 / t1).real
