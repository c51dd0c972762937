"""Complex frequency response probes.

Parity: reference ``Filter::frequency_response`` implementations
(src/filter/fir/mod.rs:263-273, src/filter/iir/mod.rs:336-372) which probe
the DTFT with the *positive* exponent e^{+j 2 pi f i}.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fir_frequency_response", "iir_frequency_response"]


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
