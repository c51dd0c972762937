"""Halfband / multistage decimator tests (ops/halfband.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.ops.halfband import (HalfbandDecimator, MultistageDecimator,
                                        firdes_halfband, halfband_decimate)
from solid_dsp_tpu.ops.fir import fir_init


def test_halfband_structure():
    for m in (2, 4, 8, 16):
        h = firdes_halfband(m, 60.0)
        assert h.shape == (4 * m - 1,)
        c = (len(h) - 1) // 2
        # unit-DC normalization: center approaches 0.5 as m grows
        assert abs(h[c] - 0.5) < (0.02 if m < 8 else 1e-3)
        assert np.all(h[c + 2:: 2] == 0.0)
        assert np.all(h[c - 2:: -2] == 0.0)
        assert abs(h.sum() - 1.0) < 1e-12
        np.testing.assert_allclose(h, h[::-1])


def test_halfband_frequency_response():
    """Stopband of the m=16 design is below -58 dB beyond 0.27."""
    h = firdes_halfband(16, 60.0)
    w = np.fft.rfftfreq(8192)
    H = np.abs(np.fft.rfft(h, 8192))
    stop = H[w > 0.27 + 0.028]
    assert 20 * np.log10(stop.max()) < -58.0
    passb = H[w < 0.25 - 0.028 - 0.02]
    np.testing.assert_allclose(passb, 1.0, atol=0.02)


def test_halfband_decimate_matches_dense_conv():
    """The phase-split kernel equals the dense stride-2 convolution."""
    rng = np.random.default_rng(0)
    h = firdes_halfband(8, 60.0)
    x = rng.normal(size=512) + 1j * rng.normal(size=512)
    tail = np.zeros(len(h) - 1, complex)
    y, _ = halfband_decimate(jnp.asarray(h), jnp.asarray(tail, jnp.complex128),
                             jnp.asarray(x))
    ext = np.concatenate([tail, x])
    ref = np.array([np.dot(h, ext[2 * k: 2 * k + len(h)])
                    for k in range(256)])
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-12)


def test_halfband_streaming_continuity():
    rng = np.random.default_rng(1)
    x = rng.normal(size=1024) + 1j * rng.normal(size=1024)
    d1 = HalfbandDecimator(8, 60.0, dtype=jnp.complex128)
    whole = np.asarray(d1.execute_block(jnp.asarray(x)))
    d2 = HalfbandDecimator(8, 60.0, dtype=jnp.complex128)
    a = np.asarray(d2.execute_block(jnp.asarray(x[:300 * 2])))
    b = np.asarray(d2.execute_block(jnp.asarray(x[600:])))
    np.testing.assert_allclose(np.concatenate([a, b]), whole, atol=1e-12)


def test_halfband_rejects_odd_block():
    d = HalfbandDecimator(4)
    with pytest.raises(ValueError):
        d.execute_block(jnp.zeros(11, jnp.complex64))


@pytest.mark.parametrize("R", [4, 8, 12])
def test_multistage_alias_suppression(R):
    """A stopband tone (aliasing band) is suppressed by ~As; a passband
    tone survives with unit gain."""
    m = MultistageDecimator(R, fpass=0.35, stop_band_attenuation=60.0,
                            dtype=jnp.complex128)
    L = 3 * 4 * 1024
    k = np.arange(L)
    # passband tone: 0.1 of the OUTPUT rate = 0.1/R of the input rate
    f_pass = 0.1 / R
    # alias tone: lands exactly on f_pass after folding (worst case):
    f_alias = 1.0 / R - f_pass
    xp = np.exp(2j * np.pi * f_pass * k)
    xa = np.exp(2j * np.pi * f_alias * k)
    yp = np.asarray(m.execute_block(jnp.asarray(xp)))
    m.reset()
    ya = np.asarray(m.execute_block(jnp.asarray(xa)))
    # steady-state power (skip the transient)
    s = len(yp) // 4
    p_pass = np.mean(np.abs(yp[s:]) ** 2)
    p_alias = np.mean(np.abs(ya[s:]) ** 2)
    assert p_pass > 0.9
    assert 10 * np.log10(p_alias / p_pass) < -55.0, 10 * np.log10(p_alias)


def test_multistage_cheaper_than_single_stage():
    """The cascade needs far fewer multiplies per input sample than an
    equivalent single-stage design at the input rate."""
    from solid_dsp_tpu.design.firdes import estimate_required_filter_length
    R, fpass, As = 8, 0.4, 60.0
    m = MultistageDecimator(R, fpass, As)
    # single-stage: transition (1 - 2 fpass)/R at the input rate
    n_single = estimate_required_filter_length((1 - 2 * fpass) / R, As)
    # cascade cost per input sample: stage s costs ~nonzero/2 per ITS input
    cost = 0.0
    rate = 1.0
    for st in m.stages:
        cost += np.count_nonzero(st.taps_np) * rate / 2
        rate /= 2
    assert cost < 0.25 * n_single


def test_multistage_output_length_and_reset():
    m = MultistageDecimator(8, 0.4, 60.0)
    x = jnp.ones(4096, jnp.complex64)
    y = m.execute_block(x)
    assert y.shape == (512,)
    m.reset()
    y2 = m.execute_block(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2))
