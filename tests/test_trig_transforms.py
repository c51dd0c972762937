"""DCT/DST/MDCT tests — the transforms the reference declared but never
implemented (fft/mod.rs:23-37 REDFT/RODFT/MDCT enum variants).

Golden truth: direct O(N^2) sums of the FFTW definitions (unnormalized).
"""

import numpy as np
import pytest

from solid_dsp_tpu.ops.trig_transforms import dct, dst, imdct, mdct, mdct_window


def _direct_dct(x, type_):
    n = len(x)
    y = np.zeros(n)
    for k in range(n):
        if type_ == 1:
            y[k] = (x[0] + ((-1.0) ** k) * x[-1]
                    + 2 * sum(x[j] * np.cos(np.pi * j * k / (n - 1))
                              for j in range(1, n - 1)))
        elif type_ == 2:
            y[k] = 2 * sum(x[j] * np.cos(np.pi * (j + 0.5) * k / n)
                           for j in range(n))
        elif type_ == 3:
            y[k] = x[0] + 2 * sum(x[j] * np.cos(np.pi * j * (k + 0.5) / n)
                                  for j in range(1, n))
        elif type_ == 4:
            y[k] = 2 * sum(x[j] * np.cos(np.pi * (j + 0.5) * (k + 0.5) / n)
                           for j in range(n))
    return y


def _direct_dst(x, type_):
    n = len(x)
    y = np.zeros(n)
    for k in range(n):
        if type_ == 1:
            y[k] = 2 * sum(x[j] * np.sin(np.pi * (j + 1) * (k + 1) / (n + 1))
                           for j in range(n))
        elif type_ == 2:
            y[k] = 2 * sum(x[j] * np.sin(np.pi * (j + 0.5) * (k + 1) / n)
                           for j in range(n))
        elif type_ == 3:
            y[k] = (((-1.0) ** k) * x[-1]
                    + 2 * sum(x[j] * np.sin(np.pi * (j + 1) * (k + 0.5) / n)
                              for j in range(n - 1)))
        elif type_ == 4:
            y[k] = 2 * sum(x[j] * np.sin(np.pi * (j + 0.5) * (k + 0.5) / n)
                           for j in range(n))
    return y


@pytest.mark.parametrize("type_", [1, 2, 3, 4])
@pytest.mark.parametrize("n", [8, 16, 33])
def test_dct_vs_direct(type_, n):
    rng = np.random.default_rng(type_ * 100 + n)
    x = rng.standard_normal(n)
    y = np.asarray(dct(x, type=type_))
    np.testing.assert_allclose(y, _direct_dct(x, type_), atol=1e-9)


@pytest.mark.parametrize("type_", [1, 2, 3, 4])
@pytest.mark.parametrize("n", [8, 16, 33])
def test_dst_vs_direct(type_, n):
    rng = np.random.default_rng(type_ * 200 + n)
    x = rng.standard_normal(n)
    y = np.asarray(dst(x, type=type_))
    np.testing.assert_allclose(y, _direct_dst(x, type_), atol=1e-9)


@pytest.mark.parametrize("type_", [1, 2])
def test_fft_fastpath_matches_matmul(type_):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((5, 64))
    np.testing.assert_allclose(
        np.asarray(dct(x, type=type_)),
        np.asarray(dct(x, type=type_, backend="matmul")), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(dst(x, type=1)),
        np.asarray(dst(x, type=1, backend="matmul")), atol=1e-9)


def test_dct2_dct3_inverse_pair():
    # FFTW: REDFT01(REDFT10(x)) == 2N x
    rng = np.random.default_rng(9)
    n = 32
    x = rng.standard_normal(n)
    y = np.asarray(dct(dct(x, 2), 3))
    np.testing.assert_allclose(y, 2 * n * x, atol=1e-8)


def test_mdct_tdac_perfect_reconstruction():
    """Sine-window MDCT/IMDCT with 50% overlap-add reconstructs exactly."""
    n = 64  # half-frame
    rng = np.random.default_rng(11)
    frames = 6
    x = rng.standard_normal(n * (frames + 1))
    w = mdct_window(n)

    out = np.zeros_like(x)
    for f in range(frames):
        seg = x[f * n: f * n + 2 * n]
        X = np.asarray(mdct(seg, window=w))
        y = np.asarray(imdct(X, window=w))
        out[f * n: f * n + 2 * n] += y
    # interior samples (fully overlapped) reconstruct exactly
    np.testing.assert_allclose(out[n: frames * n], x[n: frames * n],
                               atol=1e-8)
