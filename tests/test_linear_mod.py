"""Generic M-PSK / M-QAM modem tests (the modem family the reference
stubbed, SURVEY §2 #33)."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models import linear_mod as lm


@pytest.mark.parametrize("m", [2, 4, 8, 16])
def test_psk_constellation_properties(m):
    c = lm.psk_constellation(m)
    np.testing.assert_allclose(np.abs(c), 1.0, atol=1e-12)
    assert len(set(np.round(c, 9))) == m
    # gray property: adjacent phase slots differ in exactly one bit
    order = np.argsort(np.angle(c) % (2 * np.pi))
    for i in range(m):
        a, b = order[i], order[(i + 1) % m]
        assert bin(a ^ b).count("1") == 1


@pytest.mark.parametrize("m", [4, 16, 64, 256])
def test_qam_constellation_properties(m):
    c = lm.qam_constellation(m)
    np.testing.assert_allclose(np.mean(np.abs(c) ** 2), 1.0, atol=1e-12)
    assert len(set(np.round(c, 9))) == m
    # gray property along each axis: nearest horizontal/vertical neighbors
    # differ in exactly one bit
    side = int(np.sqrt(m))
    d = 2.0 / np.sqrt(np.mean((2 * np.arange(side) - (side - 1)) ** 2
                              ).repeat(1))  # spacing after normalization
    d = np.min([abs(a - b) for i, a in enumerate(np.unique(c.real))
                for b in np.unique(c.real)[i + 1:]])
    for i, ci in enumerate(c):
        for j, cj in enumerate(c):
            if abs(abs(ci - cj) - d) < 1e-9:
                assert bin(i ^ j).count("1") == 1, (i, j)


def test_bits_symbols_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 600)
    for k in (1, 2, 4, 6):
        n = (len(bits) // k) * k
        syms = lm.bits_to_symbols(bits[:n], k)
        back = lm.symbols_to_bits(syms, k)
        np.testing.assert_array_equal(np.asarray(back), bits[:n])


@pytest.mark.parametrize("scheme,m", [("psk", 4), ("psk", 8),
                                      ("qam", 16), ("qam", 64)])
def test_slice_symbols_clean(scheme, m):
    pts = lm.constellation(scheme, m)
    syms = np.arange(m)
    y = pts[syms]
    got = lm.slice_symbols(jnp.asarray(y), pts)
    np.testing.assert_array_equal(np.asarray(got), syms)


def test_slice_symbols_noisy_qam16():
    rng = np.random.default_rng(1)
    pts = lm.qam_constellation(16)
    syms = rng.integers(0, 16, 4096)
    y = pts[syms] + 0.05 * (rng.standard_normal(4096)
                            + 1j * rng.standard_normal(4096))
    got = np.asarray(lm.slice_symbols(jnp.asarray(y), pts))
    assert np.mean(got != syms) < 1e-3


@pytest.mark.parametrize("scheme,m", [("psk", 2), ("psk", 4), ("psk", 8),
                                      ("qam", 16), ("qam", 64)])
def test_modem_loopback_noiseless(scheme, m):
    rng = np.random.default_rng(m)
    modem = lm.LinearModem(scheme=scheme, m=m, sps=4,
                           dtype=jnp.complex128)
    k = modem.k
    bits = rng.integers(0, 2, 200 * k)
    iq = modem.modulate(bits)
    assert iq.shape[-1] == 200 * 4
    got_bits, got_syms = modem.demodulate(iq)
    n = min(len(got_syms), 200)
    want = np.asarray(lm.bits_to_symbols(bits, k))
    # ignore the tail symbols lost to filter delay
    np.testing.assert_array_equal(np.asarray(got_syms)[: n - 13],
                                  want[: n - 13])


def test_modem_loopback_awgn_qam16_ser():
    rng = np.random.default_rng(5)
    modem = lm.LinearModem(scheme="qam", m=16, sps=4, dtype=jnp.complex128)
    bits = rng.integers(0, 2, 4000)
    iq = np.asarray(modem.modulate(bits))
    noisy = iq + 0.02 * (rng.standard_normal(iq.shape)
                         + 1j * rng.standard_normal(iq.shape))
    got_bits, got_syms = modem.demodulate(noisy)
    want = np.asarray(lm.bits_to_symbols(bits, 4))
    n = min(len(got_syms), len(want)) - 13
    ser = np.mean(np.asarray(got_syms)[:n] != want[:n])
    assert ser < 0.01
