"""RF bench measurements: ACPR / OBW / CCDF / SINAD / ENOB / SFDR."""

import numpy as np
import jax.numpy as jnp
import pytest

from solid_dsp_tpu.analysis.measurements import (
    acpr, channel_power, enob, occupied_bandwidth, papr_ccdf, sfdr_db,
    sinad_db)
from solid_dsp_tpu.design.firdes import firdes_kaiser
from solid_dsp_tpu.ops.fir import conv1d_mxu

RNG = np.random.default_rng(17)
FS = 1.0


def _bandlimited_noise(n, fc, ntaps=257, seed=0, atten=100.0):
    """Complex noise lowpassed to ±fc (two-sided width 2*fc)."""
    rng = np.random.default_rng(seed)
    w = (rng.normal(size=n + ntaps) + 1j * rng.normal(size=n + ntaps))
    h = firdes_kaiser(ntaps, fc, atten, 0.0)
    y = np.asarray(conv1d_mxu(jnp.asarray(w, jnp.complex128),
                              jnp.asarray(h, jnp.complex128)))
    return y[ntaps:]


def test_channel_power_parseval():
    x = RNG.normal(size=65536) + 1j * RNG.normal(size=65536)
    total = float(channel_power(x, FS, nfft=1024))
    assert total == pytest.approx(float(np.mean(np.abs(x) ** 2)), rel=0.05)
    # half-band holds ~half the power of white noise
    half = float(channel_power(x, FS, f_center=0.0, bw=0.5, nfft=1024))
    assert half == pytest.approx(total / 2, rel=0.1)
    with pytest.raises(ValueError):
        channel_power(x, FS, f_center=0.4, bw=1e-9, nfft=64)


def test_occupied_bandwidth_of_bandlimited_noise():
    x = _bandlimited_noise(1 << 17, fc=0.1)      # two-sided width 0.2
    obw = occupied_bandwidth(x, FS, fraction=0.99, nfft=4096)
    assert 0.17 < obw < 0.23
    with pytest.raises(ValueError):
        occupied_bandwidth(x, FS, fraction=1.5)


def test_acpr_clean_vs_clipped():
    # occupy ±0.035 inside a 0.1-wide channel: the filter skirt (100 dB
    # Kaiser, ~0.015 transition) dies out before the adjacent band edge
    x = _bandlimited_noise(1 << 17, fc=0.035, ntaps=513, seed=3)
    r = acpr(x, FS, bw=0.1, n_adjacent=2, nfft=4096)
    assert r["lower_db"].shape == (2,) and r["upper_db"].shape == (2,)
    assert (r["lower_db"] < -40).all() and (r["upper_db"] < -40).all()
    # hard clipping regrows the shoulders -> ACPR worsens by >15 dB
    mag = np.abs(x)
    lim = np.quantile(mag, 0.7)
    clipped = np.where(mag > lim, x / mag * lim, x)
    rc = acpr(clipped, FS, bw=0.1, n_adjacent=2, nfft=4096)
    assert rc["upper_db"][0] > r["upper_db"][0] + 15
    with pytest.raises(ValueError):
        acpr(x, FS, bw=0.4, n_adjacent=2)


def test_papr_ccdf_monotone_and_gaussian_tail():
    x = RNG.normal(size=1 << 18) + 1j * RNG.normal(size=1 << 18)
    th = np.array([0.0, 3.0, 6.0, 9.0])
    c = papr_ccdf(x, th)
    assert (np.diff(c) < 0).all()
    # complex Gaussian: P[|x|^2/mean > t] = exp(-t)
    np.testing.assert_allclose(
        c, np.exp(-(10 ** (th / 10))), rtol=0.2, atol=1e-4)


def test_sinad_enob_of_quantized_tone():
    n = 1 << 16
    t = np.arange(n)
    f0 = 1201.7 / n                     # non-coherent bin
    x = np.sin(2 * np.pi * f0 * t)
    for bits in (8, 12):
        q = np.round(x * (2 ** (bits - 1) - 1)) / (2 ** (bits - 1) - 1)
        e = enob(q, FS)
        assert abs(e - bits) < 1.2, (bits, e)
    assert sinad_db(x, FS) > 90       # unquantized f64 tone is very clean


def test_sfdr_detects_injected_spur():
    n = 1 << 16
    t = np.arange(n)
    x = np.exp(2j * np.pi * 0.12 * t) + 10 ** (-40 / 20) * np.exp(
        2j * np.pi * 0.31 * t)
    x += 1e-6 * (RNG.normal(size=n) + 1j * RNG.normal(size=n))
    s = sfdr_db(x, FS)
    assert abs(s - 40.0) < 1.5
