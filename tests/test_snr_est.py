"""Signal-quality estimators vs known synthetic ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.analysis.snr import evm, noise_floor, snr_m2m4, tone_snr


def _qpsk(n, seed=0):
    rng = np.random.default_rng(seed)
    return ((rng.integers(0, 2, n) * 2 - 1)
            + 1j * (rng.integers(0, 2, n) * 2 - 1)) / np.sqrt(2)


def _awgn(n, power, seed):
    rng = np.random.default_rng(seed)
    return np.sqrt(power / 2) * (rng.standard_normal(n)
                                 + 1j * rng.standard_normal(n))


@pytest.mark.parametrize("snr_db", [0.0, 5.0, 10.0, 20.0])
def test_m2m4_psk(snr_db):
    n = 200_000
    s = _qpsk(n)
    x = (s + _awgn(n, 10 ** (-snr_db / 10), seed=1)).astype(np.complex64)
    est = 10 * np.log10(float(snr_m2m4(jnp.asarray(x))))
    assert abs(est - snr_db) < 0.5, (snr_db, est)


def test_m2m4_16qam_kurtosis():
    from solid_dsp_tpu.models.linear_mod import qam_constellation
    rng = np.random.default_rng(3)
    pts = np.asarray(qam_constellation(16))
    pts = pts / np.sqrt(np.mean(np.abs(pts) ** 2))
    ka = float(np.mean(np.abs(pts) ** 4) / np.mean(np.abs(pts) ** 2) ** 2)
    s = pts[rng.integers(0, 16, 200_000)]
    snr_db = 15.0
    x = (s + _awgn(len(s), 10 ** (-snr_db / 10), seed=4)).astype(np.complex64)
    est = 10 * np.log10(float(snr_m2m4(jnp.asarray(x), kurtosis=ka)))
    assert abs(est - snr_db) < 1.0, est
    # Gaussian-kurtosis rejection
    with pytest.raises(ValueError, match="kurtosis"):
        snr_m2m4(jnp.asarray(x), kurtosis=2.0)


@pytest.mark.parametrize("snr_db", [10.0, 20.0, 30.0])
def test_evm_matches_awgn_theory(snr_db):
    n = 100_000
    ref = _qpsk(n, seed=5)
    y = (ref + _awgn(n, 10 ** (-snr_db / 10), seed=6)).astype(np.complex64)
    e = float(evm(jnp.asarray(y), jnp.asarray(ref.astype(np.complex64))))
    expect = 10 ** (-snr_db / 20)
    assert abs(e - expect) / expect < 0.03


def test_noise_floor_white():
    from solid_dsp_tpu.analysis.spectral import welch_psd
    sigma2 = 0.25
    x = _awgn(1 << 18, sigma2, seed=7).astype(np.complex64)
    psd = welch_psd(jnp.asarray(x), nfft=1024, hop=512)
    nf = float(noise_floor(psd))
    # PSD integrates to total power: flat floor level = sigma2 / fs (fs=1)
    assert abs(nf - sigma2) / sigma2 < 0.05


def test_noise_floor_single_periodogram_bias():
    """One periodogram: exponential bins, median = ln2 * mean; the
    averages=1 correction recovers the true level."""
    sigma2 = 0.5
    x = _awgn(4096, sigma2, seed=9).astype(np.complex64)
    p = np.abs(np.fft.fft(x)) ** 2 / len(x)          # periodogram, fs=1
    nf = float(noise_floor(jnp.asarray(p), averages=1))
    assert abs(nf - sigma2) / sigma2 < 0.08
    # uncorrected median is ~ln2 low
    nf0 = float(noise_floor(jnp.asarray(p)))
    assert abs(nf0 / sigma2 - np.log(2)) < 0.08


def test_noise_floor_robust_to_narrowband_signal():
    """A strong tone occupying a few bins must not move the floor."""
    sigma2 = 0.25
    from solid_dsp_tpu.analysis.spectral import welch_psd
    n = 1 << 18
    t = np.arange(n)
    x = (_awgn(n, sigma2, seed=10)
         + 3.0 * np.exp(2j * np.pi * 0.1 * t)).astype(np.complex64)
    psd = welch_psd(jnp.asarray(x), nfft=1024, hop=512)
    nf = float(noise_floor(psd))
    assert abs(nf - sigma2) / sigma2 < 0.05


def test_tone_snr_synthetic():
    n = 1 << 14
    k_true = 1234
    f = k_true / n
    sigma2 = 1e-2
    t = np.arange(n)
    x = (0.5 * np.exp(2j * np.pi * f * t)
         + _awgn(n, sigma2, seed=8)).astype(np.complex64)
    snr, fhat = tone_snr(jnp.asarray(x))
    true_snr = 0.25 / sigma2
    est_db, true_db = 10 * np.log10(float(snr)), 10 * np.log10(true_snr)
    assert abs(est_db - true_db) < 1.0, (est_db, true_db)
    assert abs(float(fhat) - f) < 1e-4
