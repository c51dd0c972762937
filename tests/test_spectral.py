"""Spectral estimation vs independent numpy models (loop framing + direct
DFT sums — a different mechanism from the reshape/batched-FFT paths)."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.analysis import spectral
from solid_dsp_tpu.analysis.spectral import istft, stft, stft_denoise


def _frames_loop(x, nfft, hop):
    F = (len(x) - nfft) // hop + 1
    return np.stack([x[f * hop: f * hop + nfft] for f in range(F)])


@pytest.mark.parametrize("nfft,hop", [(64, 64), (64, 32), (128, 16)])
def test_frame_signal_matches_loop(nfft, hop):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000)
    got = np.asarray(spectral.frame_signal(x, nfft, hop))
    want = _frames_loop(x, nfft, hop)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_frame_signal_rejects_non_dividing_hop():
    with pytest.raises(ValueError, match="divide"):
        spectral.frame_signal(np.zeros(256), 64, 48)


@pytest.mark.parametrize("window", ["hann", "hamming", "rect"])
def test_stft_matches_direct_dft(window):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(512) + 1j * rng.standard_normal(512)
    nfft, hop = 64, 32
    S = np.asarray(spectral.stft(x, nfft, hop, window))
    w = spectral._window_taps(window, nfft)
    frames = _frames_loop(x, nfft, hop) * w
    # direct O(N^2) DFT sums
    n = np.arange(nfft)
    W = np.exp(-2j * np.pi * np.outer(n, n) / nfft)
    want = frames @ W.T
    np.testing.assert_allclose(S, want, rtol=1e-9, atol=1e-9)


def test_welch_psd_tone_and_parseval():
    """A unit tone concentrates power at its bin; total PSD integrates to
    the signal power (Parseval, rect window, non-overlapping frames)."""
    nfft = 256
    k = np.arange(16 * nfft)
    f0 = 16 / nfft  # bin-centered
    x = np.exp(2j * np.pi * f0 * k)
    p = np.asarray(spectral.welch_psd(x, nfft, nfft, "rect"))
    assert p.argmax() == 16
    # Parseval: sum(psd) * (fs/nfft) == mean |x|^2 == 1
    np.testing.assert_allclose(p.sum() / nfft, 1.0, rtol=1e-5)


def test_welch_psd_onesided_folding():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(4096)
    nfft = 128
    p2 = np.asarray(spectral.welch_psd(x, nfft, 64, "hann"))
    p1 = np.asarray(spectral.welch_psd(x, nfft, 64, "hann", onesided=True))
    assert p1.shape == (nfft // 2 + 1,)
    # power conservation: onesided total == twosided total
    np.testing.assert_allclose(p1[0] + p1[-1] + p1[1:-1].sum() / 2 * 2,
                               p2.sum(), rtol=1e-5)


def test_spectrogram_db_peak():
    nfft = 128
    k = np.arange(8 * nfft)
    x = np.exp(2j * np.pi * (24 / nfft) * k)
    sg = np.asarray(spectral.spectrogram(x, nfft, nfft, "hann"))
    assert sg.shape[0] == 8
    assert (sg.argmax(axis=-1) == 24).all()


def test_goertzel_bank_vs_direct():
    """Off-bin probe frequencies vs per-sample Goertzel-style direct sums."""
    rng = np.random.default_rng(3)
    N, F = 200, 5
    freqs = (0.1, 0.123, 0.37)
    x = rng.standard_normal(N * F)
    got = np.asarray(spectral.goertzel_bank(x, freqs, N))
    assert got.shape == (F, len(freqs))
    n = np.arange(N)
    for fi, f0 in enumerate(freqs):
        probe = np.exp(-2j * np.pi * f0 * n) * (2.0 / N)
        for fr in range(F):
            want = np.sum(x[fr * N:(fr + 1) * N] * probe)
            np.testing.assert_allclose(got[fr, fi], want, rtol=1e-5,
                                       atol=1e-6)


def test_goertzel_bank_tone_amplitude():
    """Unit tone at a probe frequency reads ~1.0 (the 2/N scaling)."""
    N = 256
    k = np.arange(4 * N)
    f0 = 0.19
    x = np.cos(2 * np.pi * f0 * k)
    got = np.asarray(spectral.goertzel_bank(x, (f0,), N))
    np.testing.assert_allclose(np.abs(got), 1.0, rtol=1e-2)


# --------------------------------------------- r2: csd / coherence / cepstrum


def test_csd_self_equals_welch_psd():
    from solid_dsp_tpu.analysis.spectral import csd, welch_psd, istft, stft_denoise
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)).astype(
        np.complex64)
    p1 = np.asarray(welch_psd(jnp.asarray(x), nfft=512, hop=256))
    p2 = np.asarray(csd(jnp.asarray(x), jnp.asarray(x), nfft=512, hop=256))
    np.testing.assert_allclose(np.real(p2), p1, rtol=1e-5, atol=1e-9)
    assert float(np.max(np.abs(np.imag(p2)))) < 1e-6 * float(np.max(p1))


def test_csd_phase_slope_measures_delay():
    from solid_dsp_tpu.analysis.spectral import csd
    rng = np.random.default_rng(1)
    d = 5
    x = rng.standard_normal(16384).astype(np.float32)
    y = np.roll(x, d)  # y[n] = x[n-d]
    P = np.asarray(csd(jnp.asarray(x), jnp.asarray(y), nfft=256, hop=128))
    # angle(P_xy(f_k)) = +2 pi k d / nfft for small k
    for k in (1, 2, 3, 5, 8):
        expect = 2 * np.pi * k * d / 256
        got = np.angle(P[k])
        assert abs((got - expect + np.pi) % (2 * np.pi) - np.pi) < 0.05, k


def test_coherence_lti_vs_independent():
    from solid_dsp_tpu.analysis.spectral import coherence
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(65536) + 1j * rng.standard_normal(65536)
         ).astype(np.complex64)
    h = np.array([1.0, -0.4 + 0.2j, 0.1], np.complex64)
    y_lti = np.convolve(x, h)[: len(x)].astype(np.complex64)
    z = (rng.standard_normal(65536) + 1j * rng.standard_normal(65536)
         ).astype(np.complex64)

    c_lti = np.asarray(coherence(jnp.asarray(x), jnp.asarray(y_lti),
                                 nfft=256, hop=128))
    c_ind = np.asarray(coherence(jnp.asarray(x), jnp.asarray(z),
                                 nfft=256, hop=128))
    assert float(np.median(c_lti)) > 0.98
    assert float(np.median(c_ind)) < 0.05
    assert np.all(c_lti <= 1.0 + 1e-6) and np.all(c_ind >= 0.0)


def test_cepstrum_echo_peak():
    from solid_dsp_tpu.analysis.spectral import cepstrum
    N, D, a = 1024, 37, 0.4
    x = np.zeros(N, np.float32)
    x[0] = 1.0
    x[D] = a
    c = np.asarray(cepstrum(jnp.asarray(x), kind="real"))
    q = int(np.argmax(c[1: N // 2])) + 1
    assert q == D
    # series coefficient for log|X| at quefrency D is a/2
    assert abs(c[D] - a / 2) < 0.1 * (a / 2)
    cp = np.asarray(cepstrum(jnp.asarray(x), kind="power"))
    assert int(np.argmax(cp[1: N // 2])) + 1 == D


# -------------------------------------------------- r2: analytic signal


def test_analytic_signal_of_cosine_is_phasor():
    n = np.arange(1024)
    f = 72 / 1024            # bin-centered: exact under periodic semantics
    x = np.cos(2 * np.pi * f * n).astype(np.float32)
    z = np.asarray(spectral.analytic_signal(jnp.asarray(x)))
    expect = np.exp(2j * np.pi * f * n)
    np.testing.assert_allclose(z, expect, atol=1e-4)


def test_envelope_of_am():
    n = np.arange(4096)
    env_true = 1.0 + 0.5 * np.sin(2 * np.pi * 0.001 * n)
    x = (env_true * np.cos(2 * np.pi * 0.1 * n)).astype(np.float32)
    env = np.asarray(spectral.envelope(jnp.asarray(x)))
    # interior samples (block edges carry FFT periodicity artifacts)
    np.testing.assert_allclose(env[100:-100], env_true[100:-100], atol=0.02)


def test_instantaneous_frequency_of_chirp():
    n = np.arange(8192)
    f0, f1 = 0.05, 0.15
    phase = 2 * np.pi * (f0 * n + (f1 - f0) * n * n / (2 * len(n)))
    x = np.cos(phase).astype(np.float32)
    fi = np.asarray(spectral.instantaneous_frequency(jnp.asarray(x)))
    f_true = f0 + (f1 - f0) * n[:-1] / len(n)
    np.testing.assert_allclose(fi[200:-200], f_true[200:-200], atol=0.002)


class TestISTFTAndDenoise:
    def test_istft_perfect_reconstruction_hamming(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(4000) + 1j * rng.standard_normal(4000)
        S = stft(jnp.asarray(x), 256, 64, "hamming")
        xr = np.asarray(istft(S, 256, 64, "hamming"))
        u = (S.shape[0] - 1) * 64 + 256
        np.testing.assert_allclose(xr, x[:u], atol=1e-12)

    def test_istft_hann_exact_except_zero_window_endpoints(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(4000) + 1j * rng.standard_normal(4000)
        S = stft(jnp.asarray(x), 512, 128, "hann")
        xr = np.asarray(istft(S, 512, 128, "hann"))
        u = (S.shape[0] - 1) * 128 + 512
        d = np.abs(xr[:u] - x[:u])
        assert set(np.where(d > 1e-9)[0]) <= {0, u - 1}
        assert xr[0] == 0  # w[0] == 0: sample not representable

    def test_istft_batched_and_length(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((3, 2000))
        S = stft(jnp.asarray(x), 256, 128, "hamming")
        xr = np.asarray(istft(S, 256, 128, "hamming", length=1000))
        assert xr.shape == (3, 1000)
        np.testing.assert_allclose(xr, x[:, :1000], atol=1e-12)

    def test_denoise_bursty_signal_blind(self):
        rng = np.random.default_rng(3)
        n = 32000
        k = np.arange(n)
        gate = ((k // 2000) % 3 == 0).astype(float)
        sig = gate * np.exp(2j * np.pi * 0.1 * k)
        noise = (rng.standard_normal(n)
                 + 1j * rng.standard_normal(n)) * 0.3

        def osnr(v):
            a = np.vdot(sig, v) / np.vdot(sig, sig).real
            e = v - a * sig
            return 10 * np.log10(np.abs(a) ** 2
                                 * np.vdot(sig, sig).real
                                 / np.vdot(e, e).real)

        y = np.asarray(stft_denoise(jnp.asarray(sig + noise), 512, 128))
        assert len(y) == n
        assert osnr(y) > osnr(sig + noise) + 2.0
        assert np.abs(y).max() < 3.0  # no WOLA edge spikes

    def test_denoise_with_known_noise_psd(self):
        rng = np.random.default_rng(4)
        n = 32000
        sig = np.exp(2j * np.pi * 0.1 * np.arange(n))
        noise = (rng.standard_normal(n)
                 + 1j * rng.standard_normal(n)) * 0.3
        Sn = np.asarray(stft(jnp.asarray(noise), 512, 128))
        npsd = np.mean(np.abs(Sn) ** 2, axis=0)
        y = np.asarray(stft_denoise(jnp.asarray(sig + noise), 512, 128,
                                    noise_psd=jnp.asarray(npsd)))
        a = np.vdot(sig, y) / n
        e = y - a * sig
        out_snr = 10 * np.log10(np.abs(a) ** 2 * n
                                / np.vdot(e, e).real)
        assert out_snr > 15.0  # input was ~7.4 dB

    def test_denoise_rules_and_validation(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal(3001).astype(np.float32)  # ragged length
        y = np.asarray(stft_denoise(jnp.asarray(x), 256, 64,
                                    rule="subtract"))
        assert y.shape == (3001,) and y.dtype.kind == "f"
        import pytest
        with pytest.raises(ValueError):
            stft_denoise(jnp.asarray(x), 256, 64, rule="bogus")
        with pytest.raises(ValueError):
            stft_denoise(jnp.asarray(x[:100]), 256, 64)


def test_istft_inverts_padded_stft():
    # regression: pad_to zero-pads each frame in TIME; istft must invert
    # the full padded spectrum then truncate the frame, not slice bins
    rng = np.random.default_rng(6)
    x = rng.standard_normal(2000) + 1j * rng.standard_normal(2000)
    S = stft(jnp.asarray(x), 256, 64, "hamming", pad_to=512)
    xr = np.asarray(istft(S, 256, 64, "hamming"))
    u = (S.shape[0] - 1) * 64 + 256
    np.testing.assert_allclose(xr, x[:u], atol=1e-10)
