"""Cyclostationary analysis: feature locations, coherence bounds, search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.analysis.cyclo import (
    cycle_profile,
    cyclic_spectrum,
    detect_cyclic_features,
    estimate_symbol_rate,
)


def _bpsk(rng, n, sps, snr_amp=0.5):
    sym = 1.0 - 2.0 * rng.integers(0, 2, n // sps)
    x = np.repeat(sym, sps).astype(np.complex64)
    w = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) / np.sqrt(2)
    return x + snr_amp * w.astype(np.complex64)


def test_symbol_rate_feature_at_exact_alpha():
    rng = np.random.default_rng(0)
    x = _bpsk(rng, 1 << 15, 8)
    prof = np.asarray(cycle_profile(
        x, np.array([0.125, 0.125 + 16 / (1 << 15), 0.109], np.float32)))
    assert prof[0] > 0.8            # exact cycle frequency
    assert prof[1] < 0.35           # a few 1/N off -> gone
    assert prof[2] < 0.35


def test_alpha_zero_is_unit_coherence():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(1 << 13)
         + 1j * rng.standard_normal(1 << 13)).astype(np.complex64)
    _, coh = cyclic_spectrum(x, np.array([0.0], np.float32))
    # alpha=0 degenerates to PSD/PSD = 1 for ANY signal
    np.testing.assert_allclose(np.asarray(coh), 1.0, atol=1e-3)


def test_coherence_bounded_and_noise_low():
    rng = np.random.default_rng(2)
    w = (rng.standard_normal(1 << 15)
         + 1j * rng.standard_normal(1 << 15)).astype(np.complex64)
    alphas = np.linspace(0.03, 0.45, 64).astype(np.float32)
    _, coh = cyclic_spectrum(w, alphas)
    c = np.asarray(coh)
    assert float(c.max()) <= 1.0 + 1e-6
    assert float(np.median(np.max(c, axis=-1))) < 0.25


def test_conjugate_feature_at_doubled_carrier():
    rng = np.random.default_rng(3)
    n, f0 = 1 << 15, 0.07
    x = _bpsk(rng, n, 8)
    xc = (x * np.exp(2j * np.pi * f0 * np.arange(n))).astype(np.complex64)
    alphas = np.array([2 * f0, 2 * f0 + 0.01], np.float32)
    prof_c = np.asarray(cycle_profile(xc, alphas, conjugate=True))
    assert prof_c[0] > 0.8 and prof_c[1] < 0.4
    # the NON-conjugate SCF does not see the carrier feature
    prof_n = np.asarray(cycle_profile(xc, alphas[:1]))
    assert prof_n[0] < 0.4


def test_estimate_symbol_rate_rect_and_rrc():
    rng = np.random.default_rng(4)
    x = _bpsk(rng, 1 << 15, 8, snr_amp=0.7)
    r = estimate_symbol_rate(x, 0.05, 0.3)
    assert abs(r["alpha_hat"] - 0.125) < 2e-4
    assert r["detected"].any()

    from solid_dsp_tpu.models import linear_mod as lm
    n, sps = 1 << 15, 6
    sy = np.asarray(lm.constellation("psk", 4))[
        rng.integers(0, 4, n // sps + 24)]
    xs = np.asarray(lm.pulse_shape(jnp.asarray(sy.astype(np.complex64)),
                                   sps))[:n]
    xs = xs + 0.5 * (rng.standard_normal(n)
                     + 1j * rng.standard_normal(n)).astype(np.complex64)
    r2 = estimate_symbol_rate(xs, 0.05, 0.3)
    assert abs(r2["alpha_hat"] - 1 / 6) < 2e-4


def test_noise_only_not_detected():
    rng = np.random.default_rng(5)
    w = (rng.standard_normal(1 << 15)
         + 1j * rng.standard_normal(1 << 15)).astype(np.complex64)
    r = estimate_symbol_rate(w, 0.05, 0.3)
    assert np.isnan(r["alpha_hat"]) or r["peak"] < r["threshold"] * 1.01
    d = detect_cyclic_features(
        w, np.linspace(0.03, 0.4, 48).astype(np.float32))
    assert not d["detected"].any()


def test_segmented_averaging_widens_tolerance():
    rng = np.random.default_rng(6)
    x = _bpsk(rng, 1 << 15, 8)
    off = 0.125 + 1e-3          # ~33/N away: coherent misses it entirely
    a = np.array([off], np.float32)
    full = float(np.asarray(cycle_profile(x, a))[0])
    seg = float(np.asarray(cycle_profile(x, a, coherent_frames=4))[0])
    assert seg > 2 * full
    assert seg > 0.3
