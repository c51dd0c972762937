"""FHSS tests.

Golden truth: exact hop/dehop transparency, near-uniform channel
occupancy of the m-sequence schedule, spectral spreading, and the
system-level claim — with coding across hops, the link survives a
partial-band jammer 30 dB above the signal that destroys a
fixed-frequency carrier.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models import fec
from solid_dsp_tpu.models.fhss import FHSS, hop_schedule


def test_hop_dehop_transparent_and_batched():
    rng = np.random.default_rng(0)
    fh = FHSS(16, 128)
    x = (rng.standard_normal((3, 128 * 20))
         + 1j * rng.standard_normal((3, 128 * 20))).astype(np.complex64)
    back = np.asarray(fh.dehop(fh.hop(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_schedule_uniform_and_deterministic():
    s1 = hop_schedule(16, 4000, seed=1)
    s2 = hop_schedule(16, 4000, seed=1)
    np.testing.assert_array_equal(s1, s2)
    cnt = np.bincount(s1, minlength=16)
    assert cnt.min() > 0.8 * 4000 / 16 and cnt.max() < 1.2 * 4000 / 16
    assert not np.array_equal(s1, hop_schedule(16, 4000, seed=2))


def test_energy_spreads_across_band():
    rng = np.random.default_rng(1)
    fh = FHSS(16, 256, bandwidth=0.9)
    x = np.ones(256 * 64, np.complex64)      # DC-only baseband
    X = np.abs(np.fft.fft(np.asarray(fh.hop(jnp.asarray(x))))) ** 2
    # occupied sub-bands: at least half the channels visibly lit
    nfft = len(X)
    band_power = X.reshape(16, nfft // 16).sum(axis=1)
    assert (band_power > 0.01 * band_power.max()).sum() >= 8


def test_partial_band_jammer_survival():
    rng = np.random.default_rng(2)
    sps, dwell, n_ch = 16, 256, 16
    n_bits = 2042                             # coded length 4096 = 256x16
    bits = rng.integers(0, 2, n_bits)
    coded = np.asarray(fec.conv_encode(jnp.asarray(bits)))
    n_sym = len(coded)
    # interleave across hops: a jammed dwell erases 16 CONSECUTIVE
    # symbols — beyond the K=7 code's burst tolerance — so spread
    # adjacent coded bits ~256 symbols (16 dwells) apart
    inter = np.asarray(fec.interleave(jnp.asarray(coded), 256, 16))
    sym = (1.0 - 2.0 * inter).astype(np.complex64)
    bb = np.repeat(sym, sps)                  # narrowband BPSK, bw ~1/16
    pad = (-len(bb)) % dwell
    bb = np.concatenate([bb, np.zeros(pad, np.complex64)])

    # jammer: 3 fixed channels, 30 dB above the signal.  bandwidth=1.0
    # makes the channel spacing 1/16 line up with the length-16 boxcar
    # matched filter's nulls, so an OFF-channel jammer is rejected
    # exactly — the orthogonal (OFDM-like) channel plan
    bw = 1.0
    jam_ch = np.array([2, 7, 11])
    t = np.arange(len(bb))
    jam = sum(np.sqrt(1000.0)
              * np.exp(2j * np.pi * ((c / n_ch - 0.5) * bw) * t)
              for c in jam_ch).astype(np.complex64)
    noise = 0.05 * (rng.standard_normal(len(bb))
                    + 1j * rng.standard_normal(len(bb)))

    def demod_llrs(y):
        s_hat = y[: n_sym * sps].reshape(n_sym, sps).mean(axis=1)
        # per-dwell power normalization (the receiver's jammer gate):
        # a jammed dwell has huge power -> its LLRs are down-weighted
        d_idx = (np.arange(n_sym) * sps) // dwell
        pw = np.abs(s_hat) ** 2
        p_dwell = np.bincount(d_idx, weights=pw) / np.bincount(d_idx)
        w = 1.0 / np.maximum(p_dwell[d_idx], 1e-9)
        llr = (s_hat.real * w).astype(np.float32)
        return np.asarray(fec.deinterleave(jnp.asarray(llr), 256, 16))

    # fixed-frequency carrier parked on a jammed channel: destroyed
    f_fix = (jam_ch[0] / n_ch - 0.5) * bw
    rx_fix = bb * np.exp(2j * np.pi * f_fix * t) + jam + noise
    y_fix = rx_fix * np.exp(-2j * np.pi * f_fix * t)
    dec_fix = np.asarray(fec.viterbi_decode(
        jnp.asarray(demod_llrs(y_fix)), soft=True))
    ber_fix = np.mean(dec_fix != bits)

    # FHSS link through the same jammer
    fh = FHSS(n_ch, dwell, bandwidth=bw, seed=3)
    rx = np.asarray(fh.hop(jnp.asarray(bb))) + jam + noise
    y = np.asarray(fh.dehop(jnp.asarray(rx)))
    dec = np.asarray(fec.viterbi_decode(
        jnp.asarray(demod_llrs(y)), soft=True))
    ber = np.mean(dec != bits)

    assert ber_fix > 0.2, ber_fix           # parked carrier is gone
    assert ber == 0.0, ber                  # hopped+coded link survives


def test_validation():
    with pytest.raises(ValueError):
        FHSS(n_channels=12)
    with pytest.raises(ValueError):
        FHSS(dwell=0)
    with pytest.raises(ValueError):
        FHSS(bandwidth=1.5)
    with pytest.raises(ValueError):
        FHSS(16, 128).hop(np.ones(100, np.complex64))
    with pytest.raises(ValueError):
        hop_schedule(10, 5)
