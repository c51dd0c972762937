"""Radar kit: compression gain, CFAR Pfa calibration, range-Doppler."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.radar import (
    cfar_ca,
    cfar_threshold_factor,
    lfm_chirp,
    pulse_compress,
    range_doppler_map,
)


def test_chirp_properties():
    p = lfm_chirp(128, 0.8)
    np.testing.assert_allclose(np.abs(p), 1.0, atol=1e-6)
    # instantaneous frequency sweeps ~bandwidth
    f = np.diff(np.unwrap(np.angle(p))) / (2 * np.pi)
    assert abs((f[-1] - f[0]) - 0.8) < 0.05


def test_pulse_compression_gain():
    """Matched filter gain on a chirp ~ 10 log10 N."""
    rng = np.random.default_rng(0)
    Np, N = 128, 4096
    p = lfm_chirp(Np, 0.8)
    x = np.zeros(N, np.complex64)
    d0 = 1000
    x[d0: d0 + Np] = 0.5 * p               # SNR_in ~ -6 dB per sample
    x += (rng.standard_normal(N) + 1j * rng.standard_normal(N)
          ).astype(np.complex64) / np.sqrt(2)
    y = np.abs(np.asarray(pulse_compress(jnp.asarray(x), jnp.asarray(p))))
    assert int(np.argmax(y)) == d0          # range bin recovered
    peak = y[d0] ** 2
    noise = np.median(y ** 2) / np.log(2)
    gain_db = 10 * np.log10(peak / noise)
    # compression adds 10log10(128) ~ 21 dB over the -6 dB input
    assert gain_db > 12.0, gain_db


def test_cfar_false_alarm_rate_calibrated():
    """Measured Pfa on pure exponential noise within 3x of design Pfa."""
    rng = np.random.default_rng(1)
    pfa = 1e-3
    P = rng.exponential(1.0, (64, 4096)).astype(np.float32)
    det, thr = cfar_ca(jnp.asarray(P), guard=2, train=16, pfa=pfa)
    measured = float(np.mean(np.asarray(det)))
    assert measured < 3 * pfa and measured > pfa / 3, measured


def test_cfar_detects_target_and_adapts_to_noise_floor():
    rng = np.random.default_rng(2)
    P = rng.exponential(1.0, 4096).astype(np.float32)
    P[1024:] *= 100.0                        # noise-floor step (clutter edge)
    P[500] = 300.0                           # target in the quiet region
    P[3000] = 30000.0                        # target in the loud region
    det, _ = cfar_ca(jnp.asarray(P), guard=2, train=16, pfa=1e-5)
    det = np.asarray(det)
    assert det[500] and det[3000]
    # a 300-power cell in the LOUD region must NOT fire (adaptive floor)
    P2 = P.copy()
    P2[3000] = 300.0
    det2, _ = cfar_ca(jnp.asarray(P2), guard=2, train=16, pfa=1e-5)
    assert not np.asarray(det2)[3000]


def test_cfar_threshold_factor_formula():
    assert abs(cfar_threshold_factor(1e-4, 32)
               - 32 * (1e-4 ** (-1 / 32) - 1)) < 1e-12


def test_range_doppler_peak_at_target():
    """Moving target: peak lands at the expected (doppler, range) cell."""
    rng = np.random.default_rng(3)
    n_pulses, N, Np = 64, 1024, 64
    p = lfm_chirp(Np, 0.8)
    d0 = 300
    fd = 10 / n_pulses                      # 10 doppler bins
    X = np.zeros((n_pulses, N), np.complex64)
    for m in range(n_pulses):
        X[m, d0: d0 + Np] = 0.5 * p * np.exp(2j * np.pi * fd * m)
    X += 0.05 * (rng.standard_normal(X.shape)
                 + 1j * rng.standard_normal(X.shape))
    Y = pulse_compress(jnp.asarray(X), jnp.asarray(p))
    RD = np.asarray(range_doppler_map(Y))
    dop, rng_bin = np.unravel_index(np.argmax(RD), RD.shape)
    assert rng_bin == d0
    assert dop == n_pulses // 2 + 10        # fftshifted doppler axis
