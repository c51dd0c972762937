"""Wavelets: perfect reconstruction, orthonormality, denoising gain."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.ops.wavelet import (
    denoise_soft,
    dwt,
    idwt,
    wavedec,
    waverec,
    wavelet_filters,
)


@pytest.mark.parametrize("name", ["haar", "db2", "db4"])
def test_filters_orthonormal_qmf(name):
    h, g, rl, rh = wavelet_filters(name)
    assert abs(np.sum(h) - np.sqrt(2)) < 1e-12          # lowpass DC gain
    assert abs(np.sum(g)) < 1e-12                       # highpass kills DC
    assert abs(np.dot(h, h) - 1.0) < 1e-12              # unit energy
    assert abs(np.dot(h, g)) < 1e-12                    # orthogonal pair
    for shift in range(2, len(h), 2):                   # even-shift orthо
        assert abs(np.dot(h[shift:], h[:-shift])) < 1e-12


@pytest.mark.parametrize("name", ["haar", "db2", "db4"])
def test_single_level_perfect_reconstruction(name):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(128).astype(np.float32)
    ca, cd = dwt(jnp.asarray(x), name)
    assert ca.shape == cd.shape == (64,)
    y = np.asarray(idwt(ca, cd, name))
    np.testing.assert_allclose(y, x, atol=1e-5)
    # Parseval: orthonormal analysis preserves energy
    e = float(jnp.sum(ca * ca) + jnp.sum(cd * cd))
    assert abs(e / float(np.sum(x * x)) - 1.0) < 1e-5


@pytest.mark.parametrize("name", ["haar", "db4"])
def test_multilevel_roundtrip(name):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 256)).astype(np.float32)   # batched
    coeffs = wavedec(jnp.asarray(x), name, levels=4)
    assert coeffs[0].shape == (3, 16)
    y = np.asarray(waverec(coeffs, name))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_haar_known_values():
    """Haar level-1 of [1,2,3,4]: approx = sums/sqrt2, detail = diffs."""
    ca, cd = dwt(jnp.asarray(np.array([1.0, 2, 3, 4], np.float64)), "haar")
    np.testing.assert_allclose(np.asarray(ca),
                               [3 / np.sqrt(2), 7 / np.sqrt(2)], atol=1e-12)
    np.testing.assert_allclose(np.abs(np.asarray(cd)),
                               [1 / np.sqrt(2), 1 / np.sqrt(2)], atol=1e-12)


def test_denoise_soft_improves_mse():
    rng = np.random.default_rng(2)
    t = np.linspace(0, 1, 1024)
    clean = (np.sin(2 * np.pi * 5 * t) + (t > 0.5)).astype(np.float32)
    noisy = clean + 0.3 * rng.standard_normal(1024).astype(np.float32)
    den = np.asarray(denoise_soft(jnp.asarray(noisy), "db4", levels=4))
    mse_in = float(np.mean((noisy - clean) ** 2))
    mse_out = float(np.mean((den - clean) ** 2))
    assert mse_out < mse_in / 3, (mse_in, mse_out)


def test_unknown_wavelet_rejected():
    with pytest.raises(ValueError, match="unknown wavelet"):
        wavelet_filters("sym8")


def test_denoise_soft_batched():
    rng = np.random.default_rng(3)
    clean = np.sin(2 * np.pi * 4 * np.linspace(0, 1, 512))
    noisy = (clean[None, :] + 0.3 * rng.standard_normal((3, 512))
             ).astype(np.float32)
    den = np.asarray(denoise_soft(jnp.asarray(noisy), "db4", levels=3))
    assert den.shape == (3, 512)
    for i in range(3):
        assert np.mean((den[i] - clean) ** 2) < np.mean(
            (noisy[i] - clean) ** 2) / 2
