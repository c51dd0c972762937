"""Chirp-spread-spectrum modem tests.

Golden truth: the chirp phase law checked directly, exact noncoherent
loopback under rotation, and the processing-gain claim (error-free
demodulation below the per-chip noise floor at SF9).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.css import (
    CSSModem, css_base_chirp, css_demodulate, css_modulate)


def test_base_chirp_phase_law_and_sweep():
    sf = 7
    N = 1 << sf
    c = css_base_chirp(sf)
    assert np.allclose(np.abs(c), 1.0)
    # instantaneous frequency sweeps one full cycle across the symbol
    f_inst = np.angle(c[1:] * np.conj(c[:-1])) / (2 * np.pi)
    assert f_inst[0] < -0.4 and f_inst[-1] > 0.4
    assert np.all(np.diff(f_inst) > 0)         # monotonic sweep
    # downchirp is the conjugate
    np.testing.assert_allclose(css_base_chirp(sf, down=True), np.conj(c))


def test_shift_demodulates_to_symbol():
    # symbol s dechirps to a pure tone in FFT bin s (pre-gray)
    sf = 8
    N = 1 << sf
    down = css_base_chirp(sf, down=True)
    up = css_base_chirp(sf)
    for s in (0, 1, 37, N - 1):
        shifted = np.roll(up, -s)
        bins = np.abs(np.fft.fft(shifted * down))
        assert int(np.argmax(bins)) == s


@pytest.mark.parametrize("sf", [7, 9, 11])
def test_loopback_rotation_invariant(sf):
    rng = np.random.default_rng(sf)
    m = CSSModem(sf)
    bits = rng.integers(0, 2, 40 * sf)
    tx = np.asarray(m.modulate(bits))
    np.testing.assert_allclose(np.abs(tx), 1.0, atol=1e-5)  # PA-friendly
    got = np.asarray(m.demodulate(jnp.asarray(tx * np.exp(1.1j))))
    np.testing.assert_array_equal(got, bits)


def test_below_noise_floor_operation():
    # SF9: N=512 chips/symbol -> ~27 dB processing gain; at -10 dB
    # per-chip SNR the symbol decision is still error-free
    rng = np.random.default_rng(2)
    m = CSSModem(9)
    bits = rng.integers(0, 2, 60 * 9)
    tx = np.asarray(m.modulate(bits))
    sigma = np.sqrt(1 / (2 * 10 ** (-10 / 10)))
    rx = tx + sigma * (rng.standard_normal(len(tx))
                       + 1j * rng.standard_normal(len(tx)))
    got = np.asarray(m.demodulate(jnp.asarray(rx)))
    assert np.mean(got != bits) == 0.0


def test_gray_coding_limits_adjacent_bin_cost():
    # force a +-1 bin error by hand: gray coding must flip exactly 1 bit
    sf = 8
    N = 1 << sf
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, sf)
    tx = np.asarray(css_modulate(jnp.asarray(bits), sf))
    # shift the whole symbol by one chip == +1 bin after dechirp
    got = np.asarray(css_demodulate(jnp.asarray(np.roll(tx, -1)), sf))
    assert int(np.sum(got != bits)) == 1


def test_validation():
    with pytest.raises(ValueError):
        CSSModem(1)
    with pytest.raises(ValueError):
        css_base_chirp(20)
    with pytest.raises(ValueError):
        CSSModem(8).modulate(np.zeros(9, int))
