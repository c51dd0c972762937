"""ADS-B / Mode S: CRC-24 vs bit-serial reference, PPM round trip,
preamble detection in noise."""

import jax.numpy as jnp
import numpy as np

from solid_dsp_tpu.models.adsb import (
    MODE_S_GENERATOR,
    crc24_remainder,
    decode,
    detect_preambles,
    encode_df17,
    ppm_demod_frame,
    ppm_modulate,
)


def _crc24_bitserial(bits):
    """Independent bit-serial long division (wire order)."""
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    v <<= 24
    deg = len(bits) - 1 + 24
    for d in range(deg, 23, -1):
        if v >> d & 1:
            v ^= MODE_S_GENERATOR << (d - 24)
    return v


def test_crc_matrix_matches_bitserial():
    rng = np.random.default_rng(0)
    for _ in range(10):
        data = rng.integers(0, 2, 88)
        ref = _crc24_bitserial(data)
        from solid_dsp_tpu.models.adsb import _R88
        par = data @ _R88 % 2
        got = int(par @ (1 << np.arange(23, -1, -1, dtype=np.int64)))
        assert got == ref


def test_encoded_frame_has_zero_remainder():
    rng = np.random.default_rng(1)
    for seed in range(5):
        me = rng.integers(0, 2, 56)
        f = encode_df17(0xABC123 + seed, me)
        rem = np.asarray(crc24_remainder(jnp.asarray(f)))
        assert not rem.any()
        # flip any bit -> nonzero remainder
        bad = f.copy()
        bad[rng.integers(0, 112)] ^= 1
        assert np.asarray(crc24_remainder(jnp.asarray(bad))).any()


def test_ppm_roundtrip_clean():
    rng = np.random.default_rng(2)
    f = encode_df17(0x4840D6, rng.integers(0, 2, 56))
    env = ppm_modulate(f, sps=2)
    data = env[16 * 2:]
    bits, conf = ppm_demod_frame(jnp.asarray(data ** 2), sps=2)
    np.testing.assert_array_equal(np.asarray(bits), f)
    assert float(conf) > 0.99


def test_decode_stream_with_noise_and_multiple_frames():
    rng = np.random.default_rng(3)
    sps = 2
    stream = 0.05 * rng.random(20000).astype(np.float32)   # noise floor
    icaos = [0x4840D6, 0x3C6444, 0xA1B2C3]
    starts = [1500, 6000, 12000]
    for icao, s in zip(icaos, starts):
        f = encode_df17(icao, rng.integers(0, 2, 56))
        env = ppm_modulate(f, sps)
        stream[s: s + len(env)] += env
    power = stream ** 2
    frames = decode(power, sps=sps, threshold=0.6)
    ok = [fr for fr in frames if fr["crc_ok"]]
    assert len(ok) == 3
    assert sorted(fr["icao"] for fr in ok) == sorted(icaos)
    assert all(fr["df"] == 17 for fr in ok)
    for fr, s in zip(sorted(ok, key=lambda d: d["start"]), starts):
        assert abs(fr["start"] - s) <= 1


def test_decode_complex_iq_input():
    rng = np.random.default_rng(4)
    f = encode_df17(0x123456, rng.integers(0, 2, 56))
    env = ppm_modulate(f, 2)
    x = np.zeros(2000, np.complex64)
    x[300: 300 + len(env)] = env * np.exp(1j * 0.7)   # arbitrary phase
    x += 0.02 * (rng.standard_normal(2000)
                 + 1j * rng.standard_normal(2000))
    frames = decode(x, sps=2, threshold=0.6)
    assert any(fr["crc_ok"] and fr["icao"] == 0x123456 for fr in frames)


def test_truncated_capture_does_not_crash():
    """A stronger preamble candidate near the buffer end must not oust an
    in-bounds start (regression: reshape crash on short final slice)."""
    rng = np.random.default_rng(6)
    f = encode_df17(0x4840D6, rng.integers(0, 2, 56))
    env = ppm_modulate(f, 2)
    n = len(env) + 100
    x = 0.02 * rng.random(n).astype(np.float32)
    x[50: 50 + len(env)] += env                 # full frame, in bounds
    # fake strong "preamble" right near the end (frame would overrun)
    tail = ppm_modulate(f, 2)[: 16 * 2]
    x[n - 40: n - 40 + 32] += 5.0 * tail[:32]
    frames = decode(x, sps=2, threshold=0.6)
    assert any(fr["crc_ok"] and fr["icao"] == 0x4840D6 for fr in frames)
