"""Complex frequency response probes.

Parity: reference ``Filter::frequency_response`` implementations
(src/filter/fir/mod.rs:263-273, src/filter/iir/mod.rs:336-372) which probe
the DTFT with the *positive* exponent e^{+j 2 pi f i}.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fir_frequency_response", "iir_frequency_response",
           "frequency_response_band", "iir_frequency_response_band"]


def _dtft_pos(coefs, frequency: float) -> complex:
    c = np.asarray(coefs, dtype=np.complex128)
    i = np.arange(c.size, dtype=np.float64)
    return complex(np.sum(c * np.exp(2j * np.pi * frequency * i)))


def fir_frequency_response(coefficients, frequency: float, scale=1.0) -> complex:
    """scale * sum_i c[i] e^{+j 2 pi f i}.  Parity: ref fir/mod.rs:263-273."""
    return complex(scale) * _dtft_pos(coefficients, frequency)


def iir_frequency_response(numerator, denominator, frequency: float) -> complex:
    """B(f)/A(f) with positive-exponent probes.

    Parity: ref iir/mod.rs:336-372 (Normal form).  Note the reference's
    Normal-form probe omits a0 from the denominator sum because it stores
    a[1:]; pass the coefficient slices you want probed.
    """
    return _dtft_pos(numerator, frequency) / _dtft_pos(denominator, frequency)


def frequency_response_band(coefficients, frequencies, scale=1.0) -> np.ndarray:
    """Vectorized DTFT probe over a frequency grid (plot/analysis helper).

    Returns complex128 H[f] = scale * sum_i c[i] e^{+j 2 pi f i} for every
    f in ``frequencies`` — one outer-product matmul instead of a per-
    frequency loop.
    """
    c = np.asarray(coefficients, dtype=np.complex128)
    f = np.atleast_1d(np.asarray(frequencies, dtype=np.float64))
    i = np.arange(c.size, dtype=np.float64)
    E = np.exp(2j * np.pi * np.outer(f, i))
    return complex(scale) * (E @ c)


def iir_frequency_response_band(numerator, denominator,
                                frequencies) -> np.ndarray:
    """Vectorized B(f)/A(f) over a frequency grid."""
    return (frequency_response_band(numerator, frequencies)
            / frequency_response_band(denominator, frequencies))
