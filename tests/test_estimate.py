"""Estimation primitives: tone frequency/phase/amplitude, GCC-PHAT TDOA."""

import jax
import numpy as np

from solid_dsp_tpu.analysis.estimate import (
    tdoa_gcc_phat,
    tone_amplitude,
    tone_freq_fft,
    tone_freq_kay,
    tone_phase,
)


def _tone(n, f, phase=0.0, amp=1.0):
    return (amp * np.exp(2j * np.pi * f * np.arange(n) + 1j * phase)
            ).astype(np.complex64)


def test_kay_noiseless_exact():
    for f in (0.01, 0.1234567, -0.3, 0.49):
        x = _tone(512, f)
        assert abs(float(tone_freq_kay(x)) - f) < 1e-4, f


def test_fft_interp_between_bins():
    # worst case: half-bin offsets of the PADDED grid; the Newton
    # refinement must hit them to ~1e-8 cycles/sample, not just the
    # half-padded-bin floor of the raw argmax (~5e-4)
    n, pad = 256, 4
    for f in (0.1 + 0.5 / (pad * n), -0.27 + 0.3 / (pad * n)):
        x = _tone(n, f)
        assert abs(float(tone_freq_fft(x, pad)) - f) < 1e-7, f


def test_noisy_accuracy_and_crlb_scaling():
    rng = np.random.default_rng(0)
    n, f0 = 1024, 0.2231
    snr = 10 ** (15 / 10)
    sigma = np.sqrt(1 / (2 * snr))
    errs = []
    for _ in range(12):
        x = _tone(n, f0) + sigma * (
            rng.standard_normal(n) + 1j * rng.standard_normal(n))
        errs.append(float(tone_freq_kay(x.astype(np.complex64))) - f0)
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    # CRLB for frequency: sqrt(6 / ((2pi)^2 SNR N (N^2-1)))
    crlb = np.sqrt(6 / ((2 * np.pi) ** 2 * snr * n * (n * n - 1)))
    assert rmse < 5 * crlb, (rmse, crlb)


def test_phase_amplitude_ml():
    x = _tone(512, 0.123, phase=1.1, amp=2.5)
    assert abs(float(tone_phase(x, 0.123)) - 1.1) < 1e-3
    assert abs(float(tone_amplitude(x, 0.123)) - 2.5) < 1e-3


def test_tone_estimators_batch_with_vmap():
    fs = np.array([0.05, -0.2, 0.4], np.float32)
    xs = np.stack([_tone(256, f) for f in fs])
    est = np.asarray(jax.vmap(tone_freq_fft)(xs))
    np.testing.assert_allclose(est, fs, atol=1e-3)


def test_gcc_phat_integer_and_fractional():
    rng = np.random.default_rng(1)
    m = 4096
    s = rng.standard_normal(m)
    S = np.fft.rfft(s)
    S[int(0.4 * len(S)):] = 0  # bandlimit so fractional delay is defined
    s = np.fft.irfft(S, m)
    freqs = np.fft.rfftfreq(m)
    for true in (5.0, -11.0, 7.3):
        y = np.fft.irfft(np.fft.rfft(s) * np.exp(-2j * np.pi * freqs * true),
                         m)
        x2 = (s + 0.05 * rng.standard_normal(m)).astype(np.float32)
        y2 = (y + 0.05 * rng.standard_normal(m)).astype(np.float32)
        tau, c = tdoa_gcc_phat(x2, y2, 32)
        assert abs(float(tau) - true) < 0.25, true
        assert c.shape == (65,)


def test_gcc_phat_complex_input():
    rng = np.random.default_rng(2)
    m = 2048
    s = (rng.standard_normal(m) + 1j * rng.standard_normal(m)
         ).astype(np.complex64)
    y = np.roll(s, 9)
    tau, _ = tdoa_gcc_phat(s, y, 20)
    assert abs(float(tau) - 9.0) < 0.2
