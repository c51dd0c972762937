"""Chirp-Z transform / zoom FFT tests.

Golden truth: direct O(N*M) evaluation of the CZT sum, plus
scipy.signal.czt / zoom_fft cross-checks on the stable contour regime
(see the numerical-envelope note in ops/czt.py — strongly off-circle
contours are unstable for EVERY Bluestein implementation including
scipy's, verified side by side during development).
"""

import numpy as np
import pytest
import scipy.signal as sps

from solid_dsp_tpu.ops.czt import CZT, czt, zoom_fft


def _direct_czt(x, m, w, a):
    n = len(x)
    nn = np.arange(n)
    return (x * np.asarray(a, complex) ** (-nn)) @ (
        np.asarray(w, complex) ** np.outer(nn, np.arange(m)))


def _cplx(rng, n):
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)
            ).astype(np.complex128)


@pytest.mark.parametrize("n", [1, 2, 16, 127, 128, 1000])
def test_default_contour_is_fft(n):
    x = _cplx(np.random.default_rng(n), n)
    np.testing.assert_allclose(np.asarray(czt(x)), np.fft.fft(x),
                               rtol=1e-9, atol=1e-9 * np.sqrt(n))


@pytest.mark.parametrize("n,m", [(64, 80), (100, 37), (37, 100), (1, 5)])
def test_general_contour_vs_direct(n, m):
    rng = np.random.default_rng(n * 1000 + m)
    x = _cplx(rng, n)
    w = 0.9995 * np.exp(-2j * np.pi * 0.013)
    a = 1.002 * np.exp(0.3j)
    got = np.asarray(czt(x, m, w, a))
    want = _direct_czt(x, m, w, a)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_scipy_parity_unit_and_mild_spiral():
    rng = np.random.default_rng(7)
    x = _cplx(rng, 129)
    for w, a in [(np.exp(-2j * np.pi / 200), 1.0),
                 (np.exp(-2j * np.pi / 200), np.exp(0.25j)),
                 (0.9998 * np.exp(-2j * np.pi / 200), 1.001)]:
        got = np.asarray(czt(x, 200, w, a))
        want = sps.czt(x, 200, w, a)
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-7)


def test_zoom_fft_vs_direct_dtft():
    rng = np.random.default_rng(3)
    x = _cplx(rng, 1000)
    m = 128
    z = np.asarray(zoom_fft(x, 0.25, 0.30, m, fs=1.0))
    f = 0.25 + (0.30 - 0.25) * np.arange(m) / m
    direct = np.exp(-2j * np.pi * np.outer(f, np.arange(1000))) @ x
    np.testing.assert_allclose(z, direct, rtol=1e-8,
                               atol=1e-8 * np.abs(direct).max())


def test_zoom_fft_scipy_parity_and_endpoint():
    rng = np.random.default_rng(4)
    x = _cplx(rng, 500)
    got = np.asarray(zoom_fft(x, 0.5, 0.6, 64, fs=2.0))
    want = sps.zoom_fft(x, [0.5, 0.6], 64, fs=2.0, endpoint=False)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)
    # endpoint=True hits f2 exactly on the last bin
    ze = np.asarray(zoom_fft(x, 0.0, 1.0, 5, fs=1.0, endpoint=True))
    nn = np.arange(500)
    last = np.sum(x * np.exp(-2j * np.pi * 1.0 * nn))
    np.testing.assert_allclose(ze[-1], last, rtol=1e-8)
    # scalar f1 means the band [0, f1]
    z1 = np.asarray(zoom_fft(x, 1.0, m=500, fs=2.0))
    direct = np.exp(-2j * np.pi * np.outer(np.arange(500) / 1000, nn)) @ x
    np.testing.assert_allclose(z1, direct, rtol=1e-7, atol=1e-6)


def test_zoom_fft_full_band_equals_fft():
    rng = np.random.default_rng(5)
    x = _cplx(rng, 384)
    z = np.asarray(zoom_fft(x, 0.0, 1.0, 384, fs=1.0))
    np.testing.assert_allclose(z, np.fft.fft(x), rtol=1e-8, atol=1e-8)


def test_batched_and_real_input():
    rng = np.random.default_rng(6)
    xb = rng.standard_normal((3, 4, 96))
    got = np.asarray(czt(xb, 50))
    for i in range(3):
        for j in range(4):
            np.testing.assert_allclose(
                got[i, j], _direct_czt(xb[i, j].astype(complex), 50,
                                       np.exp(-2j * np.pi / 50), 1.0),
                rtol=1e-8, atol=1e-8)


def test_large_n_phase_precision():
    # quadratic chirp phases reduced mod 2*pi host-side: first bins of a
    # 2^18-point DFT must stay accurate through the w_angle path
    rng = np.random.default_rng(8)
    n = 2 ** 18
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    p = CZT(n, 32, w_angle=-2 * np.pi / n)
    got = np.asarray(p.execute(x))
    want = np.fft.fft(x)[:32]
    np.testing.assert_allclose(got, want, rtol=1e-6,
                               atol=1e-6 * np.abs(want).max())


def test_plan_reuse_and_validation():
    p = CZT(64, 10)
    x = np.ones(64)
    y1 = np.asarray(p.execute(x))
    y2 = np.asarray(p.execute(2 * x))
    np.testing.assert_allclose(2 * y1, y2, rtol=1e-9)
    assert "n=64" in repr(p)
    with pytest.raises(ValueError):
        p.execute(np.ones(65))
    with pytest.raises(ValueError):
        czt(x, m=0)
    with pytest.raises(ValueError):
        czt(x, 10, w=0.0)
    with pytest.raises(ValueError):
        czt(x, 10, w=1.0, w_angle=0.1)
    with pytest.raises(ValueError):
        CZT(64, 10, w=1.0, w_angle=0.1)
    with pytest.raises(ValueError):
        zoom_fft(x, 0.1, 0.2, m=0)
