"""Adaptive equalizer: LMS convergence + optax training step."""

import jax.numpy as jnp
import numpy as np

from solid_dsp_tpu.models.equalizer import (
    LMSEqualizer,
    eq_apply,
    eq_init,
    make_equalizer_trainer,
)


def _channel(x, h):
    """Apply a multipath channel h (causal FIR) to x."""
    return np.convolve(x, h)[: len(x)]


def _qpsk_syms(n, seed=0):
    rng = np.random.default_rng(seed)
    return ((rng.integers(0, 2, n) * 2 - 1)
            + 1j * (rng.integers(0, 2, n) * 2 - 1)) / np.sqrt(2)


def test_lms_converges_on_multipath():
    h = np.array([1.0, 0.0, 0.35 - 0.2j, 0.0, -0.1j])
    tx = _qpsk_syms(20000)
    rx = _channel(tx, h).astype(np.complex64)

    eq = LMSEqualizer(ntaps=11, mu=0.1)
    B = 1000
    delay = 11 // 2
    mse = []
    for b in range(len(tx) // B):
        x = rx[b * B: (b + 1) * B]
        # training reference: transmitted symbols aligned to the equalizer
        # delay (decision-directed would work the same once open-eyed)
        d = np.roll(tx, delay)[b * B: (b + 1) * B]
        y = np.asarray(eq.execute_block(x, d))
        mse.append(float(np.mean(np.abs(y - d) ** 2)))
    assert mse[-1] < 0.01
    assert mse[-1] < mse[0] / 10


def test_eq_apply_streaming_continuity():
    taps, tail = eq_init(7)
    taps = taps.at[2].set(0.5 - 0.25j)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)).astype(
        np.complex64)
    ya, tail2 = eq_apply(taps, tail, jnp.asarray(x[:128]))
    yb, _ = eq_apply(taps, tail2, jnp.asarray(x[128:]))
    yfull, _ = eq_apply(taps, jnp.zeros_like(tail), jnp.asarray(x))
    np.testing.assert_allclose(
        np.concatenate([np.asarray(ya), np.asarray(yb)]),
        np.asarray(yfull), atol=1e-6)


def test_optax_trainer_reduces_loss():
    h = np.array([1.0, 0.3 + 0.1j, -0.15])
    tx = _qpsk_syms(8000, seed=5)
    rx = _channel(tx, h).astype(np.complex64)

    init, train_step = make_equalizer_trainer(9)
    taps, opt_state, tail = init()
    B = 500
    delay = 9 // 2
    losses = []
    for b in range(len(tx) // B):
        x = jnp.asarray(rx[b * B: (b + 1) * B])
        d = jnp.asarray(np.roll(tx, delay)[b * B: (b + 1) * B],
                        jnp.complex64)
        y, taps, opt_state, tail, loss = train_step(taps, opt_state, tail,
                                                    x, d)
        losses.append(float(loss))
    assert losses[-1] < losses[0] / 5
    assert losses[-1] < 0.05
