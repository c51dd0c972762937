"""CVSD 1-bit voice codec tests.

Golden truth: a literal per-sample numpy mirror of the recursion, plus
the defining decoder property (decode reproduces the encoder's internal
reference trajectory exactly), in-band SNR at realistic oversampling,
and geometric recovery from channel bit errors (the property the
syllabic step filter exists for).
"""

import numpy as np
import pytest
import scipy.signal as sps

from solid_dsp_tpu.models.cvsd import CVSD, cvsd_decode, cvsd_encode


def _np_cvsd(x_or_bits, mode, c):
    ref, step = 0.0, c.delta_min
    hist = [0] * c.n_history
    bits, refs = [], []
    for v in x_or_bits:
        b = (1 if v >= ref else 0) if mode == "enc" else int(v)
        hist = hist[1:] + [b]
        agree = all(h == hist[0] for h in hist)
        step = np.clip(c.beta * step + (c.gamma if agree else 0.0),
                       c.delta_min, c.delta_max)
        ref = float(np.clip(c.leak * ref + (step if b else -step), -1, 1))
        bits.append(b)
        refs.append(ref)
    return np.array(bits), np.array(refs)


def _voice(fs=32000, n=16000):
    t = np.arange(n) / fs
    return (0.5 * np.sin(2 * np.pi * 300 * t)
            + 0.25 * np.sin(2 * np.pi * 800 * t)).astype(np.float32)


def test_matches_numpy_reference_bit_exact():
    x = _voice(n=2000)
    c = CVSD()
    bits = np.asarray(c.encode(x))
    ref_bits, ref_traj = _np_cvsd(x.astype(np.float64), "enc", c)
    np.testing.assert_array_equal(bits, ref_bits)
    # decoder output IS the encoder's reference trajectory
    y = np.asarray(c.decode(bits))
    np.testing.assert_allclose(y, ref_traj, atol=1e-5)


def test_inband_snr_at_4x_oversampling():
    fs = 32000
    x = _voice(fs)
    c = CVSD()
    y = np.asarray(c.decode(c.encode(x)))
    lp = sps.firwin(201, 1200, fs=fs)
    xf = sps.lfilter(lp, 1, x)[500:]
    yf = sps.lfilter(lp, 1, y)[500:]
    snr = 10 * np.log10(np.mean(xf ** 2) / np.mean((yf - xf) ** 2))
    assert snr > 20.0, snr


def test_bit_error_decays_geometrically():
    x = _voice(n=8000)
    c = CVSD()
    bits = np.asarray(c.encode(x))
    bad = bits.copy()
    bad[1000] ^= 1
    y0 = np.asarray(c.decode(bits))
    y1 = np.asarray(c.decode(bad))
    d = np.abs(y1 - y0)
    assert d[1000:1100].max() > 1e-3          # the flip does perturb...
    assert d[3000:].max() < 1e-6              # ...and fully heals


def test_batched_and_roundtrip_shapes():
    x = _voice(n=4000)
    c = CVSD()
    xb = np.stack([x, 0.3 * x])
    bits = np.asarray(c.encode(xb))
    y = np.asarray(c.decode(bits))
    assert bits.shape == (2, 4000) and y.shape == (2, 4000)
    assert set(np.unique(bits)) <= {0, 1}
    np.testing.assert_allclose(y[0],
                               np.asarray(c.decode(c.encode(x))),
                               atol=1e-6)


def test_functional_defaults_match_class():
    x = _voice(n=1000)
    np.testing.assert_array_equal(np.asarray(cvsd_encode(x)),
                                  np.asarray(CVSD().encode(x)))
    b = cvsd_encode(x)
    np.testing.assert_allclose(np.asarray(cvsd_decode(b)),
                               np.asarray(CVSD().decode(b)), atol=0)


def test_validation():
    with pytest.raises(ValueError):
        CVSD(beta=1.0)
    with pytest.raises(ValueError):
        CVSD(gamma=0.0)
    with pytest.raises(ValueError):
        CVSD(delta_min=0.5, delta_max=0.1)
    with pytest.raises(ValueError):
        CVSD(leak=0.0)


def test_n_history_validation():
    with pytest.raises(ValueError):
        CVSD(n_history=0)
    with pytest.raises(ValueError):
        cvsd_encode(np.zeros(8, np.float32), n_history=0)
    with pytest.raises(ValueError):
        cvsd_decode(np.zeros(8, np.int32), n_history=-1)
