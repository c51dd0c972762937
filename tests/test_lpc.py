"""Linear prediction tests.

Golden truth: scipy.linalg.solve_toeplitz on the Yule-Walker normal
equations, scipy.signal.lfilter for the lattice structures, and
synthetic AR processes with known poles.
"""

import numpy as np
import pytest
import scipy.linalg as sla
import scipy.signal as sps

from solid_dsp_tpu.analysis.lpc import (
    acf, ar_psd, burg, lattice_fir, lattice_iir, levinson, lpc,
    reflection_to_poly)


def _ar4():
    return np.poly([0.95 * np.exp(0.4j * np.pi),
                    0.95 * np.exp(-0.4j * np.pi),
                    0.9 * np.exp(0.7j * np.pi),
                    0.9 * np.exp(-0.7j * np.pi)]).real


@pytest.mark.parametrize("cplx", [False, True])
@pytest.mark.parametrize("order", [1, 4, 12])
def test_levinson_matches_toeplitz_solve(cplx, order):
    rng = np.random.default_rng(order + 10 * cplx)
    x = rng.standard_normal(4096)
    if cplx:
        x = x + 1j * rng.standard_normal(4096)
    r = np.asarray(acf(x, order))
    a, k, e = levinson(r)
    a_ref = sla.solve_toeplitz((r[:order], np.conj(r[:order])),
                               -r[1:order + 1])
    np.testing.assert_allclose(np.asarray(a)[1:], a_ref,
                               rtol=1e-10, atol=1e-12)
    # error power is the quadratic form r[0] + a . conj(r[1:])
    e_ref = np.real(r[0] + np.dot(a_ref, np.conj(r[1:order + 1])))
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-9)
    # reflection coefficients are bounded by 1 for a valid ACF
    assert np.all(np.abs(np.asarray(k)) <= 1.0 + 1e-12)


def test_acf_definition_and_validation():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64) + 1j * rng.standard_normal(64)
    r = np.asarray(acf(x, 3))
    for kk in range(4):
        np.testing.assert_allclose(
            r[kk], np.sum(x[kk:] * np.conj(x[:64 - kk])) / 64, rtol=1e-12)
    with pytest.raises(ValueError):
        acf(x, 64)
    with pytest.raises(ValueError):
        burg(x, 64)


def test_ar4_recovery_autocorrelation_method():
    a_true = _ar4()
    rng = np.random.default_rng(1)
    x = sps.lfilter([1.0], a_true, rng.standard_normal(200000))
    a, k, e = lpc(x, 4)
    # biased-ACF windowing shrinks |poles|~0.95 slightly: ~1e-2 bias
    np.testing.assert_allclose(np.asarray(a), a_true, atol=1.5e-2)
    assert 0.9 < float(e) < 1.1  # unit innovation variance


def test_burg_beats_autocorr_on_short_records():
    a_true = _ar4()
    # burg's no-windowing advantage is a short-record effect: at N=96
    # the median max-coefficient errors are ~0.09 (burg) vs ~0.14
    # (autocorrelation); by N=512 they converge (measured sweep)
    rng = np.random.default_rng(2)
    err_b, err_a = [], []
    for _ in range(40):
        x = sps.lfilter([1.0], a_true, rng.standard_normal(224))[128:]
        ab, _, _ = burg(x, 4)
        aa, _, _ = lpc(x, 4)
        err_b.append(np.abs(np.asarray(ab) - a_true).max())
        err_a.append(np.abs(np.asarray(aa) - a_true).max())
    assert np.median(err_b) < np.median(err_a)
    assert np.median(err_b) < 0.15


def test_burg_poles_stay_stable():
    # |k| <= 1 by construction -> minimum-phase A(z)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(256) + 1j * rng.standard_normal(256)
    a, k, e = burg(x, 10)
    assert np.all(np.abs(np.asarray(k)) <= 1.0 + 1e-9)
    roots = np.roots(np.asarray(a))
    assert np.all(np.abs(roots) <= 1.0 + 1e-6)


def test_ar_psd_peaks_at_pole_frequencies():
    a_true = _ar4()
    rng = np.random.default_rng(4)
    x = sps.lfilter([1.0], a_true, rng.standard_normal(100000))
    a, _, e = lpc(x, 4)
    psd = np.asarray(ar_psd(a, e, 2048))
    half = psd[:1024]
    peak_f = np.argmax(half) / 2048
    assert abs(peak_f - 0.2) < 0.005  # 0.4*pi rad == 0.2 cycles/sample
    # symmetric for a real model
    np.testing.assert_allclose(psd[1:], psd[1:][::-1], rtol=1e-6)


def test_reflection_to_poly_matches_levinson():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(2048) + 1j * rng.standard_normal(2048)
    a, k, _ = lpc(x, 8)
    np.testing.assert_allclose(np.asarray(reflection_to_poly(k)),
                               np.asarray(a), rtol=1e-9, atol=1e-12)


def test_lattice_fir_equals_direct_form():
    rng = np.random.default_rng(6)
    x = rng.standard_normal(300) + 1j * rng.standard_normal(300)
    _, k, _ = lpc(x, 6)
    a = np.asarray(reflection_to_poly(k))
    y = np.asarray(lattice_fir(x, k))
    np.testing.assert_allclose(y, sps.lfilter(a, [1.0], x),
                               rtol=1e-9, atol=1e-12)


def test_lattice_iir_inverts_lattice_fir():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(200) + 1j * rng.standard_normal(200)
    _, k, _ = lpc(x, 5)
    y = lattice_fir(x, k)
    np.testing.assert_allclose(np.asarray(lattice_iir(y, k)), x,
                               rtol=1e-8, atol=1e-10)
    # and equals the scipy all-pole filter
    a = np.asarray(reflection_to_poly(k))
    rng2 = np.random.default_rng(8)
    w = rng2.standard_normal(200)
    np.testing.assert_allclose(np.asarray(lattice_iir(w.astype(complex),
                                                      k)),
                               sps.lfilter([1.0], a, w),
                               rtol=1e-8, atol=1e-10)


def test_batched_leading_axes():
    rng = np.random.default_rng(9)
    xb = rng.standard_normal((3, 5, 512))
    a, k, e = lpc(xb, 6)
    assert np.asarray(a).shape == (3, 5, 7)
    assert np.asarray(k).shape == (3, 5, 6)
    assert np.asarray(e).shape == (3, 5)
    a0, k0, e0 = lpc(xb[1, 2], 6)
    np.testing.assert_allclose(np.asarray(a)[1, 2], np.asarray(a0),
                               rtol=1e-10)
    ab, kb, eb = burg(xb, 4)
    ab0, _, _ = burg(xb[0, 0], 4)
    np.testing.assert_allclose(np.asarray(ab)[0, 0], np.asarray(ab0),
                               rtol=1e-10)
