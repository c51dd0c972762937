"""Quantization / companding / ADC model tests.

Golden truth: the 6.02 dB/bit SQNR law, G.711 codec tables via the
stdlib ``audioop`` reference codec (byte-exact decode parity), and the
defining property encode(decode(c)) == c over all 256 codewords.
"""

import warnings

with warnings.catch_warnings():
    # stdlib reference codec; removed in py3.13 — this image has 3.12
    warnings.simplefilter("ignore", DeprecationWarning)
    import audioop

import jax
import numpy as np
import pytest

from solid_dsp_tpu.ops.quantize import (
    adc_model, alaw_compress, alaw_decode, alaw_encode, alaw_expand,
    mulaw_compress, mulaw_decode, mulaw_encode, mulaw_expand,
    quantize_uniform, sqnr)


@pytest.mark.parametrize("bits", [4, 8, 12])
def test_uniform_sqnr_law(bits):
    rng = np.random.default_rng(bits)
    u = rng.uniform(-1, 1, 200000)
    s = float(sqnr(u, np.asarray(quantize_uniform(u, bits))))
    assert abs(s - 6.02 * bits) < 0.25, s


def test_uniform_modes_and_saturation():
    x = np.array([-2.0, -1.0, 0.0, 1e-6, 0.3, 2.0])
    qr = np.asarray(quantize_uniform(x, 8))
    qt = np.asarray(quantize_uniform(x, 8, mode="midtread"))
    delta = 2.0 / 256
    assert qt[2] == 0.0                       # midtread keeps zero
    assert qr[2] == pytest.approx(delta / 2)  # midrise has no zero level
    assert qr[0] == pytest.approx(-1 + delta / 2)   # saturates
    assert qr[-1] == pytest.approx(1 - delta / 2)
    assert qt[-1] == pytest.approx(1 - delta)       # midtread asym rail
    with pytest.raises(ValueError):
        quantize_uniform(x, 0)
    with pytest.raises(ValueError):
        quantize_uniform(x, 8, mode="bogus")


def test_adc_model_complex_and_dither():
    rng = np.random.default_rng(0)
    x = (rng.uniform(-0.9, 0.9, 50000)
         + 1j * rng.uniform(-0.9, 0.9, 50000))
    q = np.asarray(adc_model(x, bits=10))
    s = float(sqnr(x, q))
    assert 55.0 < s < 65.0   # ~6.02*10 with loading factor
    qd = np.asarray(adc_model(x, bits=10, dither=True,
                              key=jax.random.PRNGKey(0)))
    sd = float(sqnr(x, qd))
    assert abs(sd - s) < 1.5  # SUBTRACTIVE dither: ~no SNR cost
    # ...but it decorrelates the error from the signal: a ramp hitting
    # every code identically gives a periodic (signal-locked) error
    # undithered, which subtractive dither whitens
    ramp = np.linspace(-0.99, 0.99, 4096)
    e_plain = np.asarray(adc_model(ramp, bits=6)) - ramp
    e_dith = np.asarray(adc_model(ramp, bits=6, dither=True,
                                  key=jax.random.PRNGKey(1))) - ramp
    corr = lambda e: np.abs(np.corrcoef(e[:-1], e[1:])[0, 1])
    assert corr(e_dith) < corr(e_plain)
    with pytest.raises(ValueError):
        adc_model(x, bits=10, dither=True)
    # real input stays real
    qr = np.asarray(adc_model(x.real, bits=10))
    assert qr.dtype.kind == "f"


def test_compander_custom_parameters():
    # mu/A are static jit args: explicit values must work, not crash
    x = np.linspace(-1, 1, 101)
    np.testing.assert_allclose(
        np.asarray(mulaw_expand(mulaw_compress(x, 100.0), 100.0)), x,
        atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(alaw_expand(alaw_compress(x, 50.0), 50.0)), x,
        atol=1e-12)
    # smaller mu compresses less
    assert float(mulaw_compress(np.array(0.01), 10.0)) < float(
        mulaw_compress(np.array(0.01), 255.0))


@pytest.mark.parametrize("comp,exp", [(mulaw_compress, mulaw_expand),
                                      (alaw_compress, alaw_expand)])
def test_compander_roundtrip_and_endpoints(comp, exp):
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, 10000)
    np.testing.assert_allclose(np.asarray(exp(comp(x))), x, atol=1e-12)
    assert float(comp(np.array(1.0))) == pytest.approx(1.0)
    assert float(comp(np.array(-1.0))) == pytest.approx(-1.0)
    y = np.asarray(comp(x))
    assert np.all(np.abs(y) <= 1.0 + 1e-12)
    # compression: small inputs gain magnitude
    assert float(comp(np.array(0.01))) > 0.05


def test_g711_decode_tables_match_audioop():
    codes = np.arange(256, dtype=np.uint8)
    ref_mu = np.frombuffer(audioop.ulaw2lin(bytes(range(256)), 2),
                           "<i2").astype(np.float64)
    # audioop mu-law decodes onto the 14-bit (8159) scale << 2
    np.testing.assert_allclose(np.asarray(mulaw_decode(codes)),
                               ref_mu / 4.0 / 8159.0, atol=1e-7)
    ref_a = np.frombuffer(audioop.alaw2lin(bytes(range(256)), 2),
                          "<i2").astype(np.float64)
    # audioop a-law decodes onto the 13-bit (4096) scale << 3
    np.testing.assert_allclose(np.asarray(alaw_decode(codes)),
                               ref_a / 32768.0, atol=1e-12)


def test_g711_encode_decode_consistency():
    codes = np.arange(256, dtype=np.uint8)
    got_mu = np.asarray(mulaw_encode(mulaw_decode(codes)))
    # 0x7F is minus-zero: float cannot carry the sign, encoder emits +0
    keep = codes != 0x7F
    np.testing.assert_array_equal(got_mu[keep], codes[keep])
    assert got_mu[~keep][0] == 0xFF
    got_a = np.asarray(alaw_encode(alaw_decode(codes)))
    np.testing.assert_array_equal(got_a, codes)


def test_g711_codec_sqnr_and_dynamic_range():
    rng = np.random.default_rng(2)
    x = np.clip(rng.standard_normal(100000) * 0.3, -1, 1)
    s_mu = float(sqnr(x, np.asarray(mulaw_decode(mulaw_encode(x)))))
    s_a = float(sqnr(x, np.asarray(alaw_decode(alaw_encode(x)))))
    assert s_mu > 35.0 and s_a > 35.0
    # companding's point: SQNR nearly flat over a 30 dB input range,
    # where a uniform 8-bit quantizer loses ~1 dB per dB of drive
    x_quiet = x * 10 ** (-30 / 20)
    s_mu_q = float(sqnr(x_quiet,
                        np.asarray(mulaw_decode(mulaw_encode(x_quiet)))))
    s_u = float(sqnr(x, np.asarray(quantize_uniform(x, 8))))
    s_u_q = float(sqnr(x_quiet, np.asarray(quantize_uniform(x_quiet, 8))))
    assert s_mu - s_mu_q < 8.0      # mu-law: nearly flat
    assert s_u - s_u_q > 20.0       # uniform: collapses


def test_batched_shapes():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (3, 4, 100))
    assert np.asarray(quantize_uniform(x, 8)).shape == (3, 4, 100)
    assert np.asarray(mulaw_encode(x)).shape == (3, 4, 100)
    assert np.asarray(sqnr(x, x * 0.99)).shape == (3, 4)
