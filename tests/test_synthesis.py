"""Synthesis filter bank tests (transmit-side channelizer)."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.channelizer import (
    PolyphaseChannelizer, PolyphaseSynthesizer)


@pytest.mark.parametrize("m", [0, 1, 5, 12, 15])
def test_single_channel_tone_lands_at_center(m):
    """DC in channel m synthesizes a wideband tone at +m/M."""
    M, K, T = 16, 8, 256
    Y = np.zeros((T, M), np.complex128)
    Y[:, m] = 1.0
    syn = PolyphaseSynthesizer(M, K, dtype=jnp.complex128)
    x = np.asarray(syn.execute_block(Y))
    assert x.shape == (T * M,)
    X = np.fft.fft(x[len(x) // 2:])  # steady state
    f_peak = np.argmax(np.abs(X)) / len(X)
    assert abs(((f_peak - m / M) + 0.5) % 1.0 - 0.5) < 1e-2, (f_peak, m / M)


def test_synthesis_analysis_roundtrip():
    """synthesize M random channel streams -> analyze -> recover them."""
    M, K, T = 16, 8, 512
    rng = np.random.default_rng(0)
    # band-limit each channel stream (the bank's channel filters overlap
    # at band edges; in-band content round-trips cleanly)
    Y = (rng.standard_normal((T, M)) + 1j * rng.standard_normal((T, M)))
    h = np.hamming(9)
    h = h / h.sum()
    for m in range(M):
        Y[:, m] = np.convolve(Y[:, m], h, mode="same")

    syn = PolyphaseSynthesizer(M, K, dtype=jnp.complex128)
    x = np.asarray(syn.execute_block(Y))
    ana = PolyphaseChannelizer(M, K, dtype=jnp.complex128)
    Y2 = np.asarray(ana.execute_block(x))

    # composite per-channel response = prototype*prototype: flat in band,
    # with a K-1-step group delay; find the per-channel delay+gain by
    # correlation and demand high SNR in steady state
    d_best, snr_best = None, -1
    for d in range(0, 2 * K):
        a = Y[: T - d]
        b = Y2[d:]
        n = min(len(a), len(b))
        seg = slice(n // 4, 3 * n // 4)
        g = np.vdot(b[seg], a[seg]) / (np.vdot(b[seg], b[seg]).real + 1e-30)
        err = a[seg] - g * b[seg]
        snr = 10 * np.log10(np.mean(np.abs(a[seg]) ** 2)
                            / (np.mean(np.abs(err) ** 2) + 1e-30))
        if snr > snr_best:
            snr_best, d_best = snr, d
    assert snr_best > 30.0, (snr_best, d_best)


def test_synthesis_streaming_continuity():
    M, K = 8, 8
    rng = np.random.default_rng(1)
    Y = (rng.standard_normal((128, M)) + 1j * rng.standard_normal((128, M)))
    s1 = PolyphaseSynthesizer(M, K, dtype=jnp.complex128)
    full = np.asarray(s1.execute_block(Y))
    s2 = PolyphaseSynthesizer(M, K, dtype=jnp.complex128)
    a = np.asarray(s2.execute_block(Y[:50]))
    b = np.asarray(s2.execute_block(Y[50:]))
    np.testing.assert_allclose(np.concatenate([a, b]), full, atol=1e-10)
