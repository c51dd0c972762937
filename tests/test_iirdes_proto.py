"""Analog-prototype IIR designers vs scipy.signal (independent model) and
through ops.iir execution."""

import numpy as np
import pytest
import scipy.signal as ss

from solid_dsp_tpu.design import iirdes

DESIGNS = [
    ("butterworth", lambda N, Wn, bt: ss.butter(N, Wn, bt, output="sos")),
    ("chebyshev1", lambda N, Wn, bt: ss.cheby1(N, 1.0, Wn, bt, output="sos")),
    ("chebyshev2", lambda N, Wn, bt: ss.cheby2(N, 40.0, Wn, bt, output="sos")),
    ("elliptic", lambda N, Wn, bt: ss.ellip(N, 1.0, 40.0, Wn, bt,
                                            output="sos")),
]


def _mag_err(sos_a, sos_b, n=512):
    _, Ha = ss.sosfreqz(sos_a, worN=n)
    _, Hb = ss.sosfreqz(sos_b, worN=n)
    return float(np.max(np.abs(np.abs(Ha) - np.abs(Hb))))


@pytest.mark.parametrize("design,scipy_fn", DESIGNS)
@pytest.mark.parametrize("order", [1, 2, 3, 5, 8])
@pytest.mark.parametrize("bt,fc", [("lowpass", 0.1), ("highpass", 0.22)])
def test_single_band_matches_scipy(design, scipy_fn, order, bt, fc):
    mine = iirdes.iirdes_sos(design, order, fc, bandtype=bt)
    ref = scipy_fn(order, 2 * fc, bt)
    assert _mag_err(mine, ref) < 1e-9


@pytest.mark.parametrize("design,scipy_fn", DESIGNS)
@pytest.mark.parametrize("bt", ["bandpass", "bandstop"])
def test_band_designs_match_scipy(design, scipy_fn, bt):
    mine = iirdes.iirdes_sos(design, 4, 0.1, 0.2, bandtype=bt)
    ref = scipy_fn(4, [0.2, 0.4], bt)
    assert _mag_err(mine, ref) < 1e-9


def test_butterworth_minus3db_at_cutoff():
    sos = iirdes.iirdes_sos("butterworth", 6, 0.15)
    w, H = ss.sosfreqz(sos, worN=[2 * np.pi * 0.15])
    np.testing.assert_allclose(np.abs(H), np.sqrt(0.5), rtol=1e-6)


def test_chebyshev2_stopband_floor():
    sos = iirdes.iirdes_sos("chebyshev2", 6, 0.1, stopband_db=50.0)
    w, H = ss.sosfreqz(sos, worN=1024)
    stop = np.abs(H[w > 2 * np.pi * 0.12])
    assert 20 * np.log10(stop.max()) <= -50.0 + 1e-6


def test_all_designs_stable_and_run():
    """Every designed filter is stable and executes through ops.iir."""
    from solid_dsp_tpu.ops.iir import IIRFilter, IIRFilterType

    rng = np.random.default_rng(0)
    x = rng.standard_normal(256)
    for design in ("butterworth", "chebyshev1", "chebyshev2",
                   "elliptic"):
        sos = iirdes.iirdes_sos(design, 5, 0.12)
        for row in sos:
            assert iirdes.stable(row[:3], row[3:])
        ff, fb = iirdes.sos_to_iir_coeffs(sos)
        filt = IIRFilter(ff, fb, iirtype=IIRFilterType.SECOND_ORDER,
                         dtype=np.float64)
        y = np.asarray(filt.execute_block(x))
        want = ss.sosfilt(sos, x)
        np.testing.assert_allclose(y, want, rtol=1e-6, atol=1e-9)


def test_validation_errors():
    with pytest.raises(ValueError, match="unknown design"):
        iirdes.iirdes_sos("bessel", 4, 0.1)
    with pytest.raises(ValueError, match="cutoff"):
        iirdes.iirdes_sos("butterworth", 4, 0.6)
    with pytest.raises(ValueError, match="band design"):
        iirdes.iirdes_sos("butterworth", 4, 0.2, 0.1, bandtype="bandpass")
    with pytest.raises(ValueError, match="order"):
        iirdes.butterworth_zpk(0)


def test_elliptic_equiripple_bands():
    """Both bands equiripple: passband floor at -rp; stopband cap at -rs
    beyond the analytic stopband edge atan(tan(pi*fc)/k)/pi."""
    rp, rs, fc = 0.5, 50.0, 0.1
    sos = iirdes.iirdes_sos("elliptic", 5, fc, ripple_db=rp,
                            stopband_db=rs)
    w, H = ss.sosfreqz(sos, worN=8192)
    mag = 20 * np.log10(np.abs(H) + 1e-30)
    passband = mag[w <= 2 * np.pi * fc * 0.995]
    assert passband.min() >= -rp - 1e-3
    assert passband.max() <= 1e-3
    eps_p = np.sqrt(10 ** (rp / 10) - 1)
    eps_s = np.sqrt(10 ** (rs / 10) - 1)
    k = iirdes._ellipdeg(5, eps_p / eps_s)
    f_stop = np.arctan(np.tan(np.pi * fc) / k) / np.pi
    stop = mag[w >= 2 * np.pi * f_stop * 1.001]
    assert stop.max() <= -rs + 1e-3
