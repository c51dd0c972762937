"""Channel sounder tests: ground-truth CIR recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.sounder import estimate_cir, sound


def test_recovers_known_sparse_channel():
    rng = np.random.default_rng(0)
    tx = np.asarray(sound(255, 7, 64, repeats=4))
    np.testing.assert_allclose(np.abs(tx), 1.0, atol=1e-6)  # CAZAC
    h = np.zeros(30, np.complex64)
    h[0], h[7], h[22] = 1.0, 0.4 - 0.3j, 0.2j
    rx = np.convolve(tx, h)[: len(tx)]
    rx = rx + 0.05 * (rng.standard_normal(len(rx))
                      + 1j * rng.standard_normal(len(rx)))
    cir, info = estimate_cir(jnp.asarray(rx.astype(np.complex64)),
                             255, 7, 64, repeats=4, max_delay=30)
    assert np.nonzero(info["significant"])[0].tolist() == [0, 7, 22]
    np.testing.assert_allclose(cir[[0, 7, 22]], h[[0, 7, 22]], atol=0.05)
    assert info["snr_db"] > 25.0


def test_coherent_averaging_gain():
    rng = np.random.default_rng(1)
    h = np.zeros(10, np.complex64)
    h[0] = 1.0

    def run(reps):
        tx = np.asarray(sound(255, 7, 32, repeats=reps))
        rx = np.convolve(tx, h)[: len(tx)]
        rx = rx + 0.5 * (rng.standard_normal(len(rx))
                         + 1j * rng.standard_normal(len(rx)))
        _, info = estimate_cir(jnp.asarray(rx.astype(np.complex64)),
                               255, 7, 32, repeats=reps, max_delay=10)
        return info["snr_db"]

    # 8x averaging buys ~9 dB over 1x (allow statistical slack)
    assert run(8) > run(1) + 5.0


def test_measures_tdl_profile():
    # sound through a 3GPP EPA realization and check the recovered
    # taps sit at the profile's quantized delays
    from solid_dsp_tpu.models.channel import tdl_fading_channel, tdl_taps

    tx = np.asarray(sound(255, 7, 64, repeats=4))
    y, gains = tdl_fading_channel(jax.random.PRNGKey(3),
                                  jnp.asarray(tx), "epa", 20e6,
                                  doppler=1e-5)
    rng = np.random.default_rng(3)
    y = np.asarray(y) + 0.01 * (rng.standard_normal(len(tx))
                                + 1j * rng.standard_normal(len(tx)))
    cir, info = estimate_cir(jnp.asarray(y.astype(np.complex64)),
                             255, 7, 64, repeats=4, max_delay=20)
    delays, _ = tdl_taps("epa", 20e6)
    found = set(np.nonzero(info["significant"])[0].tolist())
    # the strong (first few) profile taps must all be detected
    assert set(delays[:3].tolist()) <= found
    # and nothing far off the profile support
    assert all(d <= delays[-1] + 1 for d in found)


def test_validation():
    with pytest.raises(ValueError):
        sound(256)                       # even length
    with pytest.raises(ValueError):
        sound(255, cp=255)
    with pytest.raises(ValueError):
        estimate_cir(np.zeros(10, np.complex64), 255, 7, 64)
    with pytest.raises(ValueError):
        estimate_cir(np.zeros(1000, np.complex64), 255, 7, 64,
                     max_delay=200)


def test_defaults_and_dtype_guards():
    # matched default call pattern works even for cp > length//2
    tx = np.asarray(sound(255, 7, 150))
    h = np.zeros(5, np.complex64)
    h[0] = 1.0
    rx = np.convolve(tx, h)[: len(tx)].astype(np.complex64)
    cir, info = estimate_cir(jnp.asarray(rx), 255, 7, 150)
    assert len(cir) == 255 // 2
    assert info["significant"][0]
    # real input is promoted to complex (CAZAC needs both quadratures)
    cir2, _ = estimate_cir(jnp.asarray(rx.real), 255, 7, 150)
    assert np.iscomplexobj(np.asarray(cir2))
    with pytest.raises(ValueError):
        estimate_cir(rx, 255, 7, 64, repeats=0)
