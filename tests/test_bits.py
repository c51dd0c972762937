"""GF(2) bit utilities: scramblers + CRC vs stdlib/known vectors."""

import binascii

import numpy as np
import pytest

from solid_dsp_tpu.utils import bits as B


# ------------------------------------------------------------ scramblers

def test_additive_scramble_roundtrip_and_whitening():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2, 5000)
    y = np.asarray(B.additive_scramble(x))
    z = np.asarray(B.additive_scramble(y))
    np.testing.assert_array_equal(z, x)          # self-inverse
    assert np.any(y != x)
    # whitening: an all-zeros input comes out balanced
    w = np.asarray(B.additive_scramble(np.zeros(5000, np.int32)))
    assert 0.45 < np.mean(w) < 0.55


def test_multiplicative_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2, 2000)
    v, final = B.multiplicative_scramble(x)
    b = np.asarray(B.multiplicative_descramble(np.asarray(v)))
    np.testing.assert_array_equal(b, x)


def test_multiplicative_self_synchronizing():
    """Descrambling with the WRONG seed corrupts at most the first nbits
    outputs — the self-sync property that motivates the structure."""
    rng = np.random.default_rng(2)
    x = rng.integers(0, 2, 500)
    v, _ = B.multiplicative_scramble(x, state=0x55)
    b = np.asarray(B.multiplicative_descramble(np.asarray(v), state=0x7F))
    assert np.array_equal(b[7:], x[7:])
    assert not np.array_equal(b[:7], x[:7])      # seed actually differed


def test_multiplicative_streaming_state_carry():
    """Scrambling two half-blocks with the carried register equals one
    whole-block call (the framework's block-boundary contract)."""
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2, 400)
    v_all, _ = B.multiplicative_scramble(x)
    v1, s1 = B.multiplicative_scramble(x[:150])
    v2, _ = B.multiplicative_scramble(x[150:], state=int(s1))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(v1), np.asarray(v2)]), np.asarray(v_all))


def test_scramble_validates_taps():
    with pytest.raises(ValueError):
        B.multiplicative_scramble(np.zeros(8, np.int32), nbits=7, taps=(9,))


# ------------------------------------------------------------------ CRC

@pytest.mark.parametrize("n", [0, 1, 3, 9, 32, 57, 200])
def test_crc32_matches_binascii(n):
    rng = np.random.default_rng(n)
    data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
    assert B.crc32(data) == binascii.crc32(data)


def test_crc16_ccitt_check_value():
    # the canonical CRC-16/CCITT-FALSE check: "123456789" -> 0x29B1
    assert B.crc16_ccitt(b"123456789") == 0x29B1


def test_crc_bit_input_equals_byte_input():
    data = b"solid-dsp-tpu"
    bits = B._bytes_to_bits_lsb_first(data)
    assert B.crc32(bits) == B.crc32(data)
    bits16 = B._bytes_to_bits_msb_first(data)
    assert B.crc16_ccitt(bits16) == B.crc16_ccitt(data)


@pytest.mark.parametrize("chunk", [1, 8, 32, 61])
def test_crc_chunking_invariant(chunk):
    """The matrix-fold result is independent of the chunk width."""
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 123).astype(np.int8)
    v = int(B.crc_compute(bits, poly=0xEDB88320, width=32,
                          init=0xFFFFFFFF, xorout=0xFFFFFFFF,
                          reflected=True, chunk=chunk))
    want = int(B.crc_compute(bits, poly=0xEDB88320, width=32,
                             init=0xFFFFFFFF, xorout=0xFFFFFFFF,
                             reflected=True, chunk=32))
    assert v == want


def test_crc_check_roundtrip():
    rng = np.random.default_rng(8)
    payload = rng.integers(0, 2, 303).astype(np.int8)
    c = B.crc32(payload)
    tail = ((c >> np.arange(32)) & 1).astype(np.int8)   # LSB-first wire
    frame = np.concatenate([payload, tail])
    assert B.crc_check(frame, width=32)
    bad = frame.copy()
    bad[40] ^= 1
    assert not B.crc_check(bad, width=32)
