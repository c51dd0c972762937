"""Matmul 4-step DFT (ops/matfft.py) vs numpy.fft golden references.

Accuracy gates follow the repo's SNR convention: c64 matmul path vs the
float64 numpy transform must clear 90 dB for direct/mid sizes (the driver
configs' >= 60 dB requirement with margin)."""

import numpy as np
import pytest

import jax.numpy as jnp

from solid_dsp_tpu.ops import matfft
from solid_dsp_tpu.ops.matfft import fft_mx, ifft_mx, dft_mx_planar


def _snr_db(ref, got):
    err = np.asarray(got, dtype=np.complex128) - ref
    p = np.sum(np.abs(ref) ** 2)
    e = np.sum(np.abs(err) ** 2)
    if e == 0:
        return np.inf
    return 10 * np.log10(p / e)


def _sig(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


# direct, composite 2-stage, recursive 3-stage, non-pow2 composite, prime
SIZES = [1, 2, 8, 13, 60, 64, 100, 128, 240, 256, 271, 1000, 1024,
         4096, 12288, 66049]  # 66049 = 257^2 exercises DIRECT_MAX+ splits


@pytest.mark.parametrize("n", SIZES)
def test_forward_matches_numpy(n):
    x = _sig(n)
    ref = np.fft.fft(x.astype(np.complex128))
    got = fft_mx(x)
    assert got.shape == (n,)
    assert _snr_db(ref, got) > 90


@pytest.mark.parametrize("n", [64, 100, 1009, 4096])
def test_inverse_unnormalized(n):
    """ifft_mx follows the reference's no-1/N convention (ops.fft.ifft)."""
    x = _sig(n, seed=1)
    ref = np.fft.ifft(x.astype(np.complex128)) * n
    got = ifft_mx(x)
    assert _snr_db(ref, got) > 90


@pytest.mark.parametrize("shape", [(3, 128), (2, 5, 1000), (7, 4096)])
def test_batched(shape):
    x = _sig(shape, seed=2)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    got = fft_mx(x)
    assert got.shape == shape
    assert _snr_db(ref, got) > 90


def test_planar_entry_point():
    x = _sig((4, 1024), seed=3)
    re, im = dft_mx_planar(jnp.asarray(x.real), jnp.asarray(x.imag))
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    got = np.asarray(re) + 1j * np.asarray(im)
    assert _snr_db(ref, got) > 90


def test_prime_bluestein_route():
    """Large primes route through the matmul Bluestein convolution."""
    n = 10007
    x = _sig(n, seed=4)
    ref = np.fft.fft(x.astype(np.complex128))
    assert _snr_db(ref, fft_mx(x)) > 80  # two extra transforms of slack


def test_nfft_pad_and_truncate():
    x = _sig(100, seed=5)
    ref = np.fft.fft(x.astype(np.complex128), n=128)
    assert _snr_db(ref, fft_mx(x, nfft=128)) > 90
    ref_t = np.fft.fft(x.astype(np.complex128)[:64])
    assert _snr_db(ref_t, fft_mx(x, nfft=64)) > 90


def test_roundtrip():
    x = _sig((2, 4096), seed=6)
    y = ifft_mx(fft_mx(x)) / 4096
    assert _snr_db(x.astype(np.complex128), y) > 85


def test_split_is_balanced_divisor():
    for n in [1024, 4096, 1000, 12288, 65536]:
        n1 = matfft._split(n)
        assert n % n1 == 0 and 1 < n1 <= matfft.DIRECT_MAX
    assert matfft._split(10007) == 1  # prime: no split
    assert matfft._split(66049) == 1  # 257^2: no divisor <= DIRECT_MAX


def test_c128_golden_precision():
    """x64 path: float64 banks give near-machine-precision transforms."""
    x = _sig(1024, seed=7).astype(np.complex128)
    ref = np.fft.fft(x)
    got = fft_mx(x)
    assert np.asarray(got).dtype == np.complex128
    assert _snr_db(ref, got) > 200
