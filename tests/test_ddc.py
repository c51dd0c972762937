"""DDC (digital down-converter) composition tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.ddc import DDC, firdes_cic_compensation
from solid_dsp_tpu.ops.cic import cic_frequency_response


def _combined_response(f_out, comp, R, N):
    """|H_cic(f_out/R)| * |H_comp(f_out)| normalized to DC."""
    w = np.exp(-2j * np.pi * np.outer(f_out, np.arange(len(comp))))
    h_comp = np.abs(w @ comp)
    h_cic = cic_frequency_response(np.asarray(f_out) / R, R, N)
    h_cic = h_cic / cic_frequency_response(np.array([0.0]), R, N)[0]
    return h_cic * h_comp


def test_compensator_flattens_cic_droop():
    R, N = 8, 4
    comp = firdes_cic_compensation(65, R, N, cutoff=0.2)
    f = np.linspace(0.0, 0.16, 50)  # up to 0.8 x cutoff (the
    # windowed design transitions over the last ~20% of the passband)
    total = _combined_response(f, comp, R, N)
    raw = _combined_response(f, np.array([1.0]), R, N)
    # raw CIC droops several dB at the band edge; compensated is flat
    droop_raw = -20 * np.log10(raw[-1] / raw[0])
    droop_comp = np.max(np.abs(20 * np.log10(total / total[0])))
    assert droop_raw > 1.0
    assert droop_comp < 0.1, droop_comp


def test_ddc_tone_downconversion():
    """A tone at carrier+delta comes out as a clean tone at delta * D."""
    fc = 0.7  # rad/sample carrier
    delta = 0.0015  # cycles/sample offset
    n = 1 << 16
    k = np.arange(n)
    x = np.exp(1j * (fc * k + 2 * np.pi * delta * k))
    ddc = DDC(freq=fc, cic_rate=8, cic_stages=4, fir_decim=2,
              dtype=jnp.complex128)
    y = np.asarray(ddc.execute_block(jnp.asarray(x)))
    assert len(y) == n // 16
    steady = y[len(y) // 2:]
    # measured frequency at the decimated rate
    ph = np.unwrap(np.angle(steady))
    f_meas = np.mean(np.diff(ph)) / (2 * np.pi)
    assert abs(f_meas - delta * 16) < 1e-4
    # amplitude flat (compensated passband)
    assert np.std(np.abs(steady)) / np.mean(np.abs(steady)) < 0.01


def test_ddc_with_farrow_stage():
    ddc = DDC(freq=0.3, cic_rate=4, cic_stages=3, fir_decim=2,
              ratio=1.25, dtype=jnp.complex128)
    n = 1 << 14
    x = np.exp(1j * 0.3 * np.arange(n))
    y = np.asarray(ddc.execute_block(jnp.asarray(x)))
    assert abs(len(y) - n / 10.0) <= 3  # 4 * 2 * 1.25 = 10
    assert ddc.decimation == 10.0


def test_ddc_streaming_continuity():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192))
    d1 = DDC(freq=0.5, dtype=jnp.complex128)
    full = np.asarray(d1.execute_block(jnp.asarray(x)))
    d2 = DDC(freq=0.5, dtype=jnp.complex128)
    a = np.asarray(d2.execute_block(jnp.asarray(x[:4096])))
    b = np.asarray(d2.execute_block(jnp.asarray(x[4096:])))
    np.testing.assert_allclose(np.concatenate([a, b]), full, atol=1e-10)
