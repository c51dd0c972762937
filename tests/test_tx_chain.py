"""TxChain tests incl. the full-duplex Tx -> Rx loopback."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.rx_chain import RxChain, RxChainConfig
from solid_dsp_tpu.models.tx_chain import TxChain, TxChainConfig


def test_tx_passthrough_upconversion():
    """modulation='none': output == interpolated input rotated by fc."""
    n = 2048
    bb = np.exp(2j * np.pi * 0.01 * np.arange(n)).astype(np.complex128)
    tx = TxChain(TxChainConfig(modulation="none", carrier_freq=0.5,
                               interpolation=4, dtype=jnp.complex128))
    iq = np.asarray(tx.execute_block(bb))
    assert iq.shape == (4 * n,)
    # spectral peak at carrier + baseband_freq/4 (interpolated rate)
    X = np.fft.fft(iq)
    f_peak = np.argmax(np.abs(X)) / len(X)
    f_want = (0.5 / (2 * np.pi) + 0.01 / 4) % 1.0
    assert abs(f_peak - f_want) < 1e-3


def test_tx_rx_fm_loopback():
    """Full duplex: TxChain FM at fc -> RxChain recovers the message."""
    fs_msg = 1 << 14
    msg = np.sin(2 * np.pi * 0.002 * np.arange(fs_msg))
    tx = TxChain(TxChainConfig(modulation="fm", carrier_freq=0.2,
                               interpolation=4, fm_kf=0.02,
                               dtype=jnp.complex128))
    iq = np.asarray(tx.execute_block(msg))

    rx = RxChain(RxChainConfig(carrier_freq=0.2, decimation=4,
                               agc_mode="parallel", demod="fm",
                               fm_kf=0.02 / 4,  # kf scales with the rate
                               dtype=jnp.complex128))
    audio = np.asarray(rx.execute_block(iq)).real
    # correlate recovered audio vs message (allow transient + delay)
    a = audio[512:]
    best = max(abs(np.corrcoef(a, msg[512 - l: 512 - l + len(a)])[0, 1])
               for l in range(0, 40))
    assert best > 0.95, best


def test_tx_qam_spectrum_centered_on_carrier():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 4096)
    tx = TxChain(TxChainConfig(modulation="qam", order=16, carrier_freq=1.0,
                               interpolation=2, dtype=jnp.complex128))
    iq = np.asarray(tx.execute_block(bits))
    X = np.abs(np.fft.fft(iq))
    f = np.fft.fftfreq(len(X))
    fc = 1.0 / (2 * np.pi)
    inband = np.abs((f - fc + 0.5) % 1.0 - 0.5) < 0.1
    assert np.sum(X[inband] ** 2) / np.sum(X ** 2) > 0.95


def test_tx_streaming_continuity():
    rng = np.random.default_rng(2)
    msg = rng.standard_normal(4096)
    t1 = TxChain(TxChainConfig(modulation="fm", dtype=jnp.complex128))
    full = np.asarray(t1.execute_block(msg))
    t2 = TxChain(TxChainConfig(modulation="fm", dtype=jnp.complex128))
    a = np.asarray(t2.execute_block(msg[:1500]))
    b = np.asarray(t2.execute_block(msg[1500:]))
    np.testing.assert_allclose(np.concatenate([a, b]), full, atol=1e-10)


def test_tx_rejects_unknown_modulation():
    with pytest.raises(ValueError):
        TxChain(TxChainConfig(modulation="chirp"))


def test_tx_passes_full_message_band():
    """Review-r3 regression: tones across the message band (up to ~0.8 of
    the message Nyquist) must pass with near-unit power."""
    n = 4096
    for f_msg in (0.05, 0.2, 0.3, 0.38):
        bb = np.exp(2j * np.pi * f_msg * np.arange(n)).astype(np.complex128)
        tx = TxChain(TxChainConfig(modulation="none", carrier_freq=0.0,
                                   interpolation=4, dtype=jnp.complex128))
        iq = np.asarray(tx.execute_block(bb))
        p = np.mean(np.abs(iq[512:]) ** 2)
        assert abs(p - 1.0) < 0.1, (f_msg, p)
