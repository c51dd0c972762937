"""IIR filter design: bilinear transform machinery, stability, PLL loop filters.

Parity: reference ``src/filter/iirdes/mod.rs`` — frequency_pre_warp (:63-81),
bilinear_analog_to_digital (:109-137), bilinear_numerator_denominator
(:164-212), digital_filter_flip_pass (:235-250), digital_filter_shift
(:274-301), stable (:328-348); and ``src/filter/iirdes/pll/mod.rs`` —
active_lag (:24-52), active_proportional_integral (:71-99).

Design-time NumPy float64; outputs feed ``solid_dsp_tpu.ops.iir``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import polymath

__all__ = [
    "BandType",
    "ZerosAndPoles",
    "frequency_pre_warp",
    "bilinear_analog_to_digital",
    "bilinear_numerator_denominator",
    "digital_filter_flip_pass",
    "digital_filter_shift",
    "stable",
    "pll_active_lag",
    "pll_active_proportional_integral",
]


class BandType:
    LOWPASS = "lowpass"
    HIGHPASS = "highpass"
    BANDPASS = "bandpass"
    BANDSTOP = "bandstop"


@dataclass
class ZerosAndPoles:
    zeros: np.ndarray
    poles: np.ndarray


def frequency_pre_warp(cutoff: float, center_frequency: float, bandtype: str) -> float:
    """Bilinear pre-warp factor.  Parity: ref iirdes/mod.rs:63-81."""
    if bandtype == BandType.LOWPASS:
        return abs(np.tan(np.pi * cutoff))
    if bandtype == BandType.HIGHPASS:
        base = np.pi * cutoff
        return abs(-np.cos(base) / np.sin(base))
    if bandtype == BandType.BANDPASS:
        base = 2.0 * np.pi * cutoff
        center = 2.0 * np.pi * center_frequency
        return abs((np.cos(base) - np.cos(center)) / np.sin(base))
    if bandtype == BandType.BANDSTOP:
        base = 2.0 * np.pi * cutoff
        center = 2.0 * np.pi * center_frequency
        return abs(np.sin(base) / (np.cos(base) - np.cos(center)))
    raise ValueError(f"unknown band type {bandtype!r}")


def bilinear_analog_to_digital(analog_zeros, analog_poles, nominal_gain, pre_warp):
    """Bilinear z-transform in pole-zero form.

    Parity: ref iirdes/mod.rs:109-137 — zeros beyond the analog zero list map
    to z=-1; gain accumulates (1-p)/(1-z) per pole.
    Returns (digital_zeros, digital_poles, digital_gain).
    """
    analog_zeros = np.asarray(analog_zeros, dtype=np.complex128)
    analog_poles = np.asarray(analog_poles, dtype=np.complex128)
    digital_zeros = []
    digital_poles = []
    digital_gain = complex(nominal_gain)
    for i, pole in enumerate(analog_poles):
        if i < analog_zeros.size:
            zm = analog_zeros[i] * pre_warp
            z = (1.0 + zm) / (1.0 - zm)
        else:
            z = complex(-1.0, 0.0)
        digital_zeros.append(z)
        pm = pole * pre_warp
        p = (1.0 + pm) / (1.0 - pm)
        digital_poles.append(p)
        digital_gain *= (1.0 - p) / (1.0 - z)
    return (
        np.array(digital_zeros, dtype=np.complex128),
        np.array(digital_poles, dtype=np.complex128),
        digital_gain,
    )


def bilinear_numerator_denominator(numerators, denominators, warp) -> ZerosAndPoles:
    """Bilinear z-transform from transfer-function coefficients.

    Parity: ref iirdes/mod.rs:164-212 — including the reference's in-place
    overwrite semantics (each order-k term *overwrites* rather than
    accumulates, so only the highest-order analog coefficient and the final
    warp power survive; reproduced for parity with the reference doctest).
    """
    numerators = np.asarray(numerators, dtype=np.complex128)
    denominators = np.asarray(denominators, dtype=np.complex128)
    if numerators.size == 0 or denominators.size == 0:
        raise ValueError("invalid order")
    numerator_order = numerators.size - 1
    denominator_order = denominators.size - 1
    if numerator_order > denominator_order:
        raise ValueError("numerator order exceeds denominator order")

    num_out = np.zeros(numerator_order, dtype=np.complex128)
    den_out = np.zeros(denominator_order, dtype=np.complex128)

    poly_1pz = polymath.expand_binomial_pm(denominator_order, denominator_order - 1)

    mk = 1.0
    for d in denominators[:denominator_order]:
        for j in range(denominator_order):
            den_out[j] = d * mk * poly_1pz[j]
        mk *= warp

    mk = 1.0
    for nmr in numerators[:numerator_order]:
        for j in range(numerator_order):
            num_out[j] = nmr * mk * poly_1pz[j]
        mk *= warp

    inv_d0 = 1.0 / den_out[0]
    den_out *= inv_d0
    num_out[:denominator_order] *= inv_d0
    return ZerosAndPoles(zeros=num_out, poles=den_out)


def digital_filter_flip_pass(zeros, poles) -> ZerosAndPoles:
    """LP<->HP flip (negate all zeros/poles).  Parity: ref iirdes/mod.rs:235-250."""
    zeros = np.asarray(zeros, dtype=np.complex128)
    poles = np.asarray(poles, dtype=np.complex128)
    if zeros.size != poles.size:
        raise ValueError("invalid order")
    return ZerosAndPoles(zeros=-zeros, poles=-poles)


def digital_filter_shift(zeros, poles, shift: float) -> ZerosAndPoles:
    """Low-pass to band-pass frequency shift (doubles the order).

    Parity: ref iirdes/mod.rs:274-301.
    """
    zeros = np.asarray(zeros, dtype=np.complex128)
    poles = np.asarray(poles, dtype=np.complex128)
    if zeros.size != poles.size:
        raise ValueError("invalid order")
    c = np.cos(2.0 * np.pi * shift)
    out_z = np.zeros(zeros.size * 2, dtype=np.complex128)
    out_p = np.zeros(poles.size * 2, dtype=np.complex128)
    for i in range(zeros.size):
        t = zeros[i] + 1.0
        s = np.sqrt(c * c * t * t - 4.0 * zeros[i])
        out_z[2 * i] = 0.5 * (c * t + s)
        out_z[2 * i + 1] = 0.5 * (c * t - s)
        t = poles[i] + 1.0
        s = np.sqrt(c * c * t * t - 4.0 * poles[i])
        out_p[2 * i] = 0.5 * (c * t + s)
        out_p[2 * i + 1] = 0.5 * (c * t - s)
    return ZerosAndPoles(zeros=out_z, poles=out_p)


def stable(feed_forward, feed_back) -> bool:
    """True iff every root of the reversed feed-back polynomial has |z| <= 1.

    Parity: ref iirdes/mod.rs:328-348 (roots via Bairstow on reversed a).
    """
    feed_back = np.asarray(feed_back, dtype=np.float64)
    if feed_back.size < 2:
        return False
    a_hat = feed_back[::-1]
    roots = polymath.find_roots(a_hat)
    return bool(np.all(np.abs(roots) <= 1.0))


def _pll_common(bandwidth: float, damping_factor: float, loop_gain: float):
    if bandwidth <= 0.0:
        raise ValueError("invalid bandwidth")
    if damping_factor <= 0.0:
        raise ValueError("invalid damping factor")
    if loop_gain <= 0.0:
        raise ValueError("invalid loop gain")
    t1 = loop_gain / (bandwidth * bandwidth)
    t2 = 2.0 * damping_factor / bandwidth - 1.0 / loop_gain
    num = np.array(
        [
            2.0 * loop_gain * (1.0 + t2 / 2.0),
            2.0 * loop_gain * 2.0,
            2.0 * loop_gain * (1.0 - t2 / 2.0),
        ]
    )
    return t1, num


def pll_active_lag(bandwidth: float, damping_factor: float, loop_gain: float):
    """2nd-order PLL active-lag loop filter (num, den).

    Parity: ref iirdes/pll/mod.rs:24-52.
    """
    t1, num = _pll_common(bandwidth, damping_factor, loop_gain)
    den = np.array([1.0 + t1 / 2.0, -t1, -1.0 + t1 / 2.0])
    return num, den


def pll_active_proportional_integral(
    bandwidth: float, damping_factor: float, loop_gain: float
):
    """2nd-order PLL active-PI loop filter (num, den).

    Parity: ref iirdes/pll/mod.rs:71-99.
    """
    t1, num = _pll_common(bandwidth, damping_factor, loop_gain)
    den = np.array([t1 / 2.0, -t1, t1 / 2.0])
    return num, den
