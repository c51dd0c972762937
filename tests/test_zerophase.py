"""Zero-phase filtfilt: scipy parity, zero-delay property, batching."""

import numpy as np
import pytest
from scipy import signal as sps

from solid_dsp_tpu.ops.zerophase import filtfilt_fir, filtfilt_iir, \
    filtfilt_sos


def test_fir_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(2048)
    h = sps.firwin(31, 0.2)
    mine = np.asarray(filtfilt_fir(h, x, pad=62))
    ref = sps.filtfilt(h, [1.0], x, padtype="odd", padlen=62)
    np.testing.assert_allclose(mine, ref, atol=1e-10)


def test_iir_matches_scipy_interior_and_edges():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(2048)
    b, a = sps.butter(4, 0.25)
    mine = np.asarray(filtfilt_iir(b, a, x, method="scan"))
    # interior: machine-precision agreement regardless of init scheme
    ref = sps.filtfilt(b, a, x, padtype="odd", padlen=120)
    np.testing.assert_allclose(mine[150:-150], ref[150:-150], atol=1e-12)
    # edges: the pole-decay-sized default pad keeps them tight too
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_sos_matches_scipy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(2048)
    sos = sps.butter(6, 0.2, output="sos")
    mine = np.asarray(filtfilt_sos(sos[:, :3], sos[:, 3:], x,
                                   method="scan"))
    ref = sps.sosfiltfilt(sos, x, padtype="odd", padlen=150)
    np.testing.assert_allclose(mine[150:-150], ref[150:-150], atol=1e-12)


def test_zero_delay_and_zero_phase():
    # a narrowband pulse comes out centered where it went in
    n = 1024
    t = np.arange(n)
    env = np.exp(-0.5 * ((t - 512) / 40.0) ** 2)
    x = env * np.cos(2 * np.pi * 0.1 * t)
    b, a = sps.butter(4, [0.05, 0.15], btype="band")
    y = np.asarray(filtfilt_iir(b, a, x, method="scan"))
    assert y.shape == x.shape
    assert abs(int(np.argmax(np.abs(sps.hilbert(y)))) - 512) <= 2
    # causal single-pass peak is visibly delayed by contrast
    y1 = sps.lfilter(b, a, x)
    assert int(np.argmax(np.abs(sps.hilbert(y1)))) > 516


def test_narrow_filter_auto_pad_scales():
    # a pole at r=0.999 needs thousands of samples of pad; the default
    # must pick that up rather than ring the edges
    b, a = sps.butter(2, 0.005)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(1 << 15) + 1.0
    y = np.asarray(filtfilt_iir(b, a, x, method="scan"))
    ref = sps.filtfilt(b, a, x, padtype="odd",
                       padlen=min(x.size - 1, 12000))
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_complex_input():
    rng = np.random.default_rng(4)
    x = (rng.standard_normal(1024)
         + 1j * rng.standard_normal(1024)).astype(np.complex64)
    h = sps.firwin(21, 0.3)
    y = np.asarray(filtfilt_fir(h, x))
    ref = sps.filtfilt(h, [1.0], x, padtype="odd", padlen=42)
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_short_signal_raises():
    with pytest.raises(ValueError):
        filtfilt_fir(np.ones(9) / 9.0, np.ones(10))
