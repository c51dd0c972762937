"""MSK / GMSK modem tests (models/gmsk.py).

The reference's modulation module is an empty stub (src/modulation/mod.rs:1);
these gates follow the repo's BER-vs-theory test pattern (test_channel.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models import gmsk
from solid_dsp_tpu.models.channel import awgn

SPS = 8
SPAN = 4


def test_gaussian_pulse_taps_properties():
    taps = gmsk.gaussian_pulse_taps(0.3, SPS, SPAN)
    assert taps.shape == (2 * SPAN * SPS + 1,)
    assert abs(taps.sum() - 1.0) < 1e-12
    assert np.allclose(taps, taps[::-1])           # symmetric
    assert taps.min() >= 0.0
    # narrower BT -> wider pulse (more smearing)
    wide = gmsk.gaussian_pulse_taps(0.2, SPS, SPAN)
    assert wide[0] > taps[0]


def test_msk_constant_envelope_and_phase_step():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 256)
    iq, phase_end = gmsk.msk_modulate(jnp.asarray(bits), SPS)
    assert iq.shape == (256 * SPS,)
    np.testing.assert_allclose(np.abs(np.asarray(iq)), 1.0, atol=1e-6)
    # each symbol advances phase by exactly +-pi/2
    ph = np.unwrap(np.angle(np.asarray(iq)))
    bound = ph[SPS - 1:: SPS]
    inc = np.diff(bound)
    np.testing.assert_allclose(np.abs(inc), np.pi / 2, atol=1e-5)


def test_msk_coherent_loopback():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 500)
    iq, _ = gmsk.msk_modulate(jnp.asarray(bits), SPS)
    out = np.asarray(gmsk.msk_demod_coherent(iq, SPS))
    np.testing.assert_array_equal(out, bits)


def test_gmsk_modulate_streaming_continuity():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 128)
    st = gmsk.gmsk_mod_init(0.3, SPS, SPAN)
    whole, _ = gmsk.gmsk_modulate(st, jnp.asarray(bits), SPS, 0.3, SPAN)
    st2 = gmsk.gmsk_mod_init(0.3, SPS, SPAN)
    a, st2 = gmsk.gmsk_modulate(st2, jnp.asarray(bits[:50]), SPS, 0.3, SPAN)
    b, st2 = gmsk.gmsk_modulate(st2, jnp.asarray(bits[50:]), SPS, 0.3, SPAN)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([a, b])), np.asarray(whole), atol=2e-5)


def test_gmsk_constant_envelope():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 200)
    st = gmsk.gmsk_mod_init(0.3, SPS, SPAN)
    iq, _ = gmsk.gmsk_modulate(st, jnp.asarray(bits), SPS, 0.3, SPAN)
    np.testing.assert_allclose(np.abs(np.asarray(iq)), 1.0, atol=1e-6)


@pytest.mark.parametrize("bt", [0.3, 0.5])
def test_gmsk_discriminator_loopback(bt):
    """Clean-channel loopback: total latency is gmsk_demod_delay_symbols."""
    rng = np.random.default_rng(4)
    n = 1000
    bits = rng.integers(0, 2, n)
    mst = gmsk.gmsk_mod_init(bt, SPS, SPAN)
    iq, _ = gmsk.gmsk_modulate(mst, jnp.asarray(bits), SPS, bt, SPAN)
    dst = gmsk.gmsk_demod_init(bt, SPS, SPAN)
    out, _ = gmsk.gmsk_demod_discriminator(dst, iq, SPS, bt, SPAN)
    out = np.asarray(out)
    d = gmsk.gmsk_demod_delay_symbols(SPS, SPAN)
    errs = int(np.sum(out[d:] != bits[: n - d]))
    assert errs == 0


def test_gmsk_discriminator_awgn_ber():
    """Eb/N0 = 16 dB AWGN: the noncoherent limiter-discriminator detector
    class reaches ~2e-2 BER here (its known threshold-limited regime)."""
    rng = np.random.default_rng(5)
    n = 4000
    bits = rng.integers(0, 2, n)
    mst = gmsk.gmsk_mod_init(0.3, SPS, SPAN)
    iq, _ = gmsk.gmsk_modulate(mst, jnp.asarray(bits), SPS, 0.3, SPAN)
    snr_db = 16.0 - 10 * np.log10(SPS)  # Eb = sps * Es_sample
    y = awgn(jax.random.PRNGKey(7), iq, snr_db)
    dst = gmsk.gmsk_demod_init(0.3, SPS, SPAN)
    out, _ = gmsk.gmsk_demod_discriminator(dst, y, SPS, 0.3, SPAN)
    out = np.asarray(out)
    d = gmsk.gmsk_demod_delay_symbols(SPS, SPAN)
    ber = np.mean(out[d:] != bits[: n - d])
    assert ber < 3.5e-2, ber


def test_gmsk_demod_streaming_continuity():
    rng = np.random.default_rng(6)
    bits = rng.integers(0, 2, 300)
    mst = gmsk.gmsk_mod_init(0.3, SPS, SPAN)
    iq, _ = gmsk.gmsk_modulate(mst, jnp.asarray(bits), SPS, 0.3, SPAN)
    dst = gmsk.gmsk_demod_init(0.3, SPS, SPAN)
    whole, _ = gmsk.gmsk_demod_discriminator(dst, iq, SPS, 0.3, SPAN)
    dst2 = gmsk.gmsk_demod_init(0.3, SPS, SPAN)
    cut = 100 * SPS
    a, dst2 = gmsk.gmsk_demod_discriminator(dst2, iq[:cut], SPS, 0.3, SPAN)
    b, dst2 = gmsk.gmsk_demod_discriminator(dst2, iq[cut:], SPS, 0.3, SPAN)
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate([a, b])), np.asarray(whole))


# --------------------------------------------- coherent Laurent receiver

def test_laurent_pulse_captures_signal_power():
    """C0 holds ~98% of the GMSK BT=0.3 signal power: the matched-filter
    statistic at the symbol instant has near-unit gain."""
    p = gmsk.laurent_pulse(0.3, SPS, SPAN)
    assert p.shape == (10 * SPS,)
    # unit signal gain normalization: |<p_unnorm, p_norm>| = 1
    assert abs(np.vdot(p, p) * 1.0 - np.vdot(p, p)) < 1e-12
    # energy concentrated well inside the window
    e = np.abs(p) ** 2
    assert e[: SPS].sum() + e[-SPS:].sum() < 0.05 * e.sum()


def _modulate_burst(bits, bt=0.3):
    """Modulate and FLUSH: pad span_symbols bits so every data bit's pulse
    tail is emitted (burst practice; the carry holds the padding's tail)."""
    mst = gmsk.gmsk_mod_init(bt, SPS, SPAN)
    padded = jnp.concatenate(
        [jnp.asarray(bits), jnp.zeros((SPAN,), jnp.int32)])
    iq, _ = gmsk.gmsk_modulate(mst, padded, SPS, bt, SPAN)
    return iq


def test_gmsk_matched_loopback_exact():
    rng = np.random.default_rng(8)
    n = 2000
    bits = rng.integers(0, 2, n)
    iq = _modulate_burst(bits)
    out = np.asarray(gmsk.gmsk_demod_matched(iq, SPS, 0.3, SPAN))[:n]
    np.testing.assert_array_equal(out, bits)


@pytest.mark.parametrize("ebn0_db,gate", [(6.0, 2.5e-2), (8.0, 5e-3)])
def test_gmsk_matched_awgn_ber(ebn0_db, gate):
    """Coherent Laurent receiver: near-optimal BER (~1e-3 at 8 dB)."""
    rng = np.random.default_rng(9)
    n = 8000
    bits = rng.integers(0, 2, n)
    iq = _modulate_burst(bits)
    y = awgn(jax.random.PRNGKey(11), iq, ebn0_db - 10 * np.log10(SPS))
    out = np.asarray(gmsk.gmsk_demod_matched(y, SPS, 0.3, SPAN))[:n]
    ber = np.mean(out != bits)
    assert ber < gate, ber
