"""CW keyer/decoder tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.cw import MORSE, cw_decode, cw_keyer, \
    text_to_morse


def test_text_to_morse_table():
    assert text_to_morse("SOS") == "... --- ..."
    assert text_to_morse("CQ DX") == "-.-. --.- / -.. -..-"
    assert len(MORSE) >= 42                  # letters+digits+punctuation


def test_keyer_timing_structure():
    x = np.asarray(cw_keyer("EE", dit_samples=10))
    # E = dit: on 10, off 10 (element) + 20 (letter) -> second E at 40
    env = np.abs(x) > 0.5
    assert env[:10].all() and not env[10:40].any() and env[40:50].all()


def test_clean_and_noisy_roundtrip():
    msg = "CQ CQ DE SOLID DSP K"
    x = np.asarray(cw_keyer(msg, dit_samples=64))
    assert cw_decode(jnp.asarray(x)) == msg
    rng = np.random.default_rng(0)
    y = 0.8 * x + 0.15 * (rng.standard_normal(len(x))
                          + 1j * rng.standard_normal(len(x)))
    assert cw_decode(jnp.asarray(y.astype(np.complex64))) == msg


def test_blind_speed_estimation():
    # decoder estimates the dit period itself: resampled (13% faster)
    # keying still decodes with no WPM prior
    from solid_dsp_tpu.ops.resample import PfbArbitraryResampler

    msg = "PARIS PARIS"
    x = np.asarray(cw_keyer(msg, dit_samples=64))
    r = PfbArbitraryResampler(1 / 1.13, dtype=jnp.complex64)
    z = np.asarray(r.execute_block(jnp.asarray(x)))
    assert cw_decode(jnp.asarray(z)) == msg


def test_noise_only_squelched():
    rng = np.random.default_rng(1)
    q = 0.1 * (rng.standard_normal(5000) + 1j * rng.standard_normal(5000))
    assert cw_decode(jnp.asarray(q.astype(np.complex64))) == ""
    assert cw_decode(jnp.zeros(1000, jnp.complex64)) == ""


def test_validation():
    with pytest.raises(ValueError):
        cw_keyer("SOS", dit_samples=2)


def test_dot_free_message_and_explicit_dit():
    # "TOM" has no dots: the blind estimate must use inter-element gaps
    x = np.asarray(cw_keyer("TOM TOM", dit_samples=64))
    assert cw_decode(jnp.asarray(x)) == "TOM TOM"
    # explicit dit_samples bypasses the blind squelch for fast keying
    y = np.asarray(cw_keyer("SOS", dit_samples=16))
    assert cw_decode(jnp.asarray(y), dit_samples=16) == "SOS"


def test_noise_spike_does_not_poison_estimate():
    x = np.asarray(cw_keyer("PARIS", dit_samples=64))
    x = x.copy()
    x[10:13] += 3.0          # 3-sample impulse well above threshold
    assert cw_decode(jnp.asarray(x)) == "PARIS"
