"""DSSS tests: spread/despread identity, processing gain, acquisition, RAKE."""

import jax
import jax.numpy as jnp
import numpy as np

from solid_dsp_tpu.models import dsss
from solid_dsp_tpu.models.channel import awgn
from solid_dsp_tpu.models.linear_mod import (constellation, bits_to_symbols,
                                             modulate_symbols, slice_symbols)
from solid_dsp_tpu.utils.sequences import gold_codes, m_sequence

N = 31


def _qpsk_symbols(rng, T):
    bits = rng.integers(0, 2, 2 * T)
    pts = constellation("psk", 4)
    return modulate_symbols(bits_to_symbols(jnp.asarray(bits), 2), pts), bits, pts


def test_spread_despread_identity():
    rng = np.random.default_rng(0)
    code = gold_codes(5)[3]  # (31,) +-1
    syms, _, _ = _qpsk_symbols(rng, 64)
    chips = dsss.dsss_spread(syms, code)
    assert chips.shape == (64 * N,)
    back = dsss.dsss_despread(chips, code)
    np.testing.assert_allclose(np.asarray(back), np.asarray(syms), atol=1e-6)


def test_processing_gain():
    """Chip-level SNR of -5 dB, N=31 spreading (~15 dB gain) -> clean QPSK."""
    rng = np.random.default_rng(1)
    code = gold_codes(5)[1]
    syms, bits, pts = _qpsk_symbols(rng, 2000)
    chips = dsss.dsss_spread(syms, code)
    y = awgn(jax.random.PRNGKey(2), chips, -5.0)
    back = dsss.dsss_despread(y, code)
    idx = np.asarray(slice_symbols(back, pts))
    tx = np.asarray(slice_symbols(syms, pts))
    ser = np.mean(idx != tx)
    assert ser < 1e-2, ser


def test_acquisition_finds_offset():
    rng = np.random.default_rng(3)
    code = m_sequence(6)  # (63,)
    syms, _, _ = _qpsk_symbols(rng, 100)
    chips = np.asarray(dsss.dsss_spread(syms, code))
    for off in (0, 7, 41):
        x = np.concatenate([np.zeros(off, complex), chips])
        k, metric = dsss.dsss_acquire(jnp.asarray(x, jnp.complex64), code, 63)
        assert int(k) == off, (off, int(k))
        m = np.asarray(metric)
        assert m[off] > 2 * np.median(m)


def test_acquisition_under_noise():
    rng = np.random.default_rng(4)
    code = m_sequence(6)
    syms, _, _ = _qpsk_symbols(rng, 200)
    chips = dsss.dsss_spread(syms, code)
    x = jnp.concatenate([jnp.zeros(17, chips.dtype), chips])
    y = awgn(jax.random.PRNGKey(5), x, -5.0)
    k, _ = dsss.dsss_acquire(y, code, 63)
    assert int(k) == 17


def test_rake_two_path():
    """Two resolved paths; RAKE MRC recovers symbols better than the
    strongest single finger."""
    rng = np.random.default_rng(6)
    code = gold_codes(5)[0]
    syms, _, pts = _qpsk_symbols(rng, 500)
    chips = np.asarray(dsss.dsss_spread(syms, code))
    g0, g1, d1 = 1.0, 0.6j, 7
    x = g0 * chips + g1 * np.concatenate([np.zeros(d1, complex), chips[:-d1]])
    y = np.asarray(awgn(jax.random.PRNGKey(7), jnp.asarray(x, jnp.complex64), 0.0))
    pilots = np.asarray(syms)[:16]
    gains = np.asarray(dsss.rake_finger_gains(
        jnp.asarray(y), code, jnp.asarray(pilots, np.complex64), [0, d1]))
    # estimated gains close to the true path gains
    np.testing.assert_allclose(gains, [g0, g1], atol=0.15)
    comb = np.asarray(dsss.rake_despread(jnp.asarray(y), code, [0, d1], gains))
    single = np.asarray(dsss.dsss_despread(jnp.asarray(y), code))
    tx = np.asarray(syms)
    mse_comb = np.mean(np.abs(comb[:500] - tx) ** 2)
    mse_single = np.mean(np.abs(single[:500] / g0 - tx) ** 2)
    assert mse_comb < mse_single
    idx = np.asarray(slice_symbols(jnp.asarray(comb[:500]), pts))
    assert np.mean(idx != np.asarray(slice_symbols(syms, pts))) < 5e-3
