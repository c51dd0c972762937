"""Crest-factor reduction: PAPR drop, bounded EVM, OOB containment."""

import jax.numpy as jnp
import numpy as np

from solid_dsp_tpu.models.cfr import band_mask, cfr_icf, clip_envelope, papr_db


def _ofdm_like(n, occupied=0.25, seed=0, rms=1.0):
    rng = np.random.default_rng(seed)
    X = np.zeros(n, np.complex128)
    half = int(n * occupied / 2)
    idx = np.r_[np.arange(1, half), np.arange(n - half, n)]
    X[idx] = np.exp(2j * np.pi * rng.random(len(idx)))
    x = np.fft.ifft(X) * np.sqrt(n / len(idx))
    return (rms * x / np.sqrt(np.mean(np.abs(x) ** 2))).astype(np.complex64)


def test_papr_db():
    x = np.ones(64, np.complex64)
    assert abs(float(papr_db(jnp.asarray(x)))) < 1e-5
    x[0] = 4.0
    assert abs(float(papr_db(jnp.asarray(x))) - 10 * np.log10(16 / 1.234375)
               ) < 1e-4


def test_clip_envelope():
    x = jnp.asarray(np.array([0.5, 2.0 * 1j, -3.0], np.complex64))
    y = np.asarray(clip_envelope(x, 1.0))
    np.testing.assert_allclose(np.abs(y), [0.5, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.angle(y), np.angle(np.asarray(x)),
                               atol=1e-6)


def test_icf_reduces_papr_with_bounded_evm():
    n, occ = 1 << 14, 0.25
    x = _ofdm_like(n, occ, seed=1)
    p0 = float(papr_db(jnp.asarray(x)))
    assert p0 > 9.0                                  # OFDM-like PAPR
    thr = 10 ** (5.0 / 20)                           # target ~5 dB PAPR
    y = cfr_icf(jnp.asarray(x), thr, jnp.asarray(band_mask(n, occ + 0.02)),
                iters=6)
    p1 = float(papr_db(y))
    assert p1 < 6.5, (p0, p1)                        # >= ~4 dB reduction
    evm = float(np.sqrt(np.mean(np.abs(np.asarray(y) - x) ** 2)
                        / np.mean(np.abs(x) ** 2)))
    assert evm < 0.12                                # bounded distortion


def test_icf_contains_out_of_band():
    """Clipping alone splatters OOB; ICF keeps OOB at the original level."""
    from solid_dsp_tpu.analysis.spectral import welch_psd
    n, occ = 1 << 15, 0.25
    x = _ofdm_like(n, occ, seed=2)
    thr = 10 ** (5.0 / 20)
    y_clip = clip_envelope(jnp.asarray(x), thr)
    y_icf = cfr_icf(jnp.asarray(x), thr, jnp.asarray(band_mask(n, occ + 0.02)),
                    iters=6)

    def oob(sig):
        p = np.fft.fftshift(np.asarray(welch_psd(sig, nfft=1024, hop=512)))
        m = np.fft.fftshift(band_mask(1024, occ + 0.06)) > 0
        return float(np.sum(p[~m]))

    base = oob(jnp.asarray(x))
    assert oob(y_clip) > 30 * base            # hard clip splatters
    assert oob(y_icf) < 3 * base              # ICF stays near the floor


def test_icf_enables_dpd_at_higher_drive():
    """End-to-end tx story: CFR then DPD lets the PA run at a drive where
    the raw waveform's peaks would exceed the invertible range."""
    from solid_dsp_tpu.models.dpd import dpd_learn, mp_apply, saleh_pa
    n, occ = 1 << 14, 0.25
    # Saleh linearizability bound: peak_in * g <= max PA output envelope
    # (alpha_a / (2 sqrt(beta_a)) ~= 1.006), i.e. peak_in <= 0.466.
    rms = 0.24                                # raw peaks ~0.73 (too hot)
    x = _ofdm_like(n, occ, seed=3, rms=rms)
    assert float(np.max(np.abs(x))) > 0.55
    thr = rms * 10 ** (5.0 / 20)              # ~5 dB PAPR -> peak ~0.43
    xc = cfr_icf(jnp.asarray(x), thr, jnp.asarray(band_mask(n, occ + 0.02)),
                 iters=6)
    assert float(np.max(np.abs(np.asarray(xc)))) < 0.466
    coefs, g = dpd_learn(saleh_pa, xc, order=7, memory=1, iters=3)
    y = np.asarray(saleh_pa(mp_apply(coefs, xc, 7, 1)))
    ref = np.asarray(xc)
    gg = np.vdot(ref, y) / np.vdot(ref, ref)
    evm_db = 10 * np.log10(np.real(np.vdot(y - gg * ref, y - gg * ref)
                                   / np.vdot(gg * ref, gg * ref)))
    assert evm_db < -35.0, evm_db
