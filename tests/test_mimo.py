"""MIMO detection / Alamouti STBC tests.

Golden truth: closed-form detector algebra on noiseless channels,
detector ORDERING on Rayleigh-faded ensembles (ML <= MMSE <= ZF
symbol error rate), and the exact Alamouti orthogonality identity
s_hat = (|h0|^2 + |h1|^2) s.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.mimo import (
    alamouti_decode, alamouti_encode, mimo_capacity, ml_detect,
    mmse_detect, slice_nearest, zf_detect)

QPSK = (np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j]) / np.sqrt(2))


def _rayleigh(rng, n, r, t):
    return ((rng.standard_normal((n, r, t))
             + 1j * rng.standard_normal((n, r, t))) / np.sqrt(2))


def test_zf_exact_on_noiseless_channel():
    rng = np.random.default_rng(0)
    H = _rayleigh(rng, 500, 3, 2)
    s = QPSK[rng.integers(0, 4, (500, 2))]
    y = np.einsum("nrt,nt->nr", H, s)
    np.testing.assert_allclose(np.asarray(zf_detect(H, y)), s, atol=1e-8)
    # mmse with zero noise == zf
    np.testing.assert_allclose(np.asarray(mmse_detect(H, y, 0.0)), s,
                               atol=1e-8)


def test_detector_ordering_on_rayleigh():
    rng = np.random.default_rng(1)
    N, snr_db = 20000, 12.0
    H = _rayleigh(rng, N, 2, 2)
    si = rng.integers(0, 4, (N, 2))
    s = QPSK[si]
    nv = 10 ** (-snr_db / 10) * 2
    y = (np.einsum("nrt,nt->nr", H, s)
         + (rng.standard_normal((N, 2))
            + 1j * rng.standard_normal((N, 2))) * np.sqrt(nv / 2))

    def ser(idx):
        return float(np.mean(np.asarray(idx) != si))

    e_zf = ser(slice_nearest(zf_detect(H, y), QPSK)[0])
    e_mmse = ser(slice_nearest(mmse_detect(H, y, nv), QPSK)[0])
    e_ml = ser(ml_detect(H, y, jnp.asarray(QPSK))[0])
    assert e_ml < e_mmse < e_zf, (e_ml, e_mmse, e_zf)
    assert e_ml < 0.05


def test_ml_is_exhaustive_argmin():
    rng = np.random.default_rng(2)
    H = _rayleigh(rng, 64, 2, 2)
    y = (rng.standard_normal((64, 2)) + 1j * rng.standard_normal((64, 2)))
    idx, pts = ml_detect(H, y, jnp.asarray(QPSK))
    idx = np.asarray(idx)
    # brute force in numpy
    for n in range(0, 64, 7):
        best, bd = None, np.inf
        for a in range(4):
            for b in range(4):
                s = np.array([QPSK[a], QPSK[b]])
                d = np.sum(np.abs(y[n] - H[n] @ s) ** 2)
                if d < bd:
                    bd, best = d, (a, b)
        assert tuple(idx[n]) == best


def test_alamouti_orthogonality_identity():
    rng = np.random.default_rng(3)
    N = 2000
    s = QPSK[rng.integers(0, 4, N)]
    tx = np.asarray(alamouti_encode(s))
    assert tx.shape == (N, 2)
    h = ((rng.standard_normal((N // 2, 2))
          + 1j * rng.standard_normal((N // 2, 2))) / np.sqrt(2))
    hr = np.repeat(h, 2, axis=0)
    y = np.sum(tx * hr, axis=-1)           # noiseless 2x1 channel
    sh, g = alamouti_decode(y, jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(sh), np.asarray(g) * s,
                               atol=1e-10)
    # constant-channel form (h as a plain pair)
    hc = np.array([0.7 + 0.2j, -0.3 + 0.9j])
    y2 = np.sum(np.asarray(alamouti_encode(s)) * hc, axis=-1)
    sh2, g2 = alamouti_decode(y2, jnp.asarray(hc))
    np.testing.assert_allclose(np.asarray(sh2),
                               np.asarray(g2) * s, atol=1e-10)


def test_alamouti_diversity_gain():
    # 2x1 Alamouti at the same TOTAL tx power beats 1x1 in Rayleigh
    rng = np.random.default_rng(4)
    N, snr_db = 200_000, 10.0
    si = rng.integers(0, 4, N)
    s = QPSK[si]
    nv = 10 ** (-snr_db / 10)
    noise = ((rng.standard_normal(N) + 1j * rng.standard_normal(N))
             * np.sqrt(nv / 2))
    # alamouti (power split across antennas)
    tx = np.asarray(alamouti_encode(s)) / np.sqrt(2)
    h = ((rng.standard_normal((N // 2, 2))
          + 1j * rng.standard_normal((N // 2, 2))) / np.sqrt(2))
    y = np.sum(tx * np.repeat(h, 2, axis=0), axis=-1) + noise
    sh, g = alamouti_decode(y, jnp.asarray(h))
    soft = np.asarray(sh) / np.maximum(np.asarray(g), 1e-30) * np.sqrt(2)
    e_ala = np.mean(np.asarray(slice_nearest(soft, QPSK)[0]) != si)
    # siso
    h1 = ((rng.standard_normal(N) + 1j * rng.standard_normal(N))
          / np.sqrt(2))
    y1 = h1 * s + noise
    e_siso = np.mean(
        np.asarray(slice_nearest(y1 / h1, QPSK)[0]) != si)
    assert e_ala < 0.6 * e_siso, (e_ala, e_siso)


def test_capacity_properties():
    rng = np.random.default_rng(5)
    H = _rayleigh(rng, 1000, 2, 2)
    c2 = np.asarray(mimo_capacity(H, 10 ** (10 / 10)))
    assert c2.shape == (1000,)
    # 2x2 mean capacity exceeds the 1x1 mean at the same SNR
    h1 = H[:, :1, :1]
    c1 = np.asarray(mimo_capacity(h1, 10 ** (10 / 10)))
    assert c2.mean() > 1.5 * c1.mean()
    # identity channel, snr per stream: T*log2(1 + snr/T)
    I = np.broadcast_to(np.eye(2, dtype=complex), (4, 2, 2))
    got = np.asarray(mimo_capacity(I, 4.0))
    np.testing.assert_allclose(got, 2 * np.log2(1 + 2.0), rtol=1e-9)
