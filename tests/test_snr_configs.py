"""SNR acceptance tests for the 5 driver configs (BASELINE.md §A).

The acceptance bound is >= 60 dB output SNR vs reference semantics.  The
float64/complex128 paths in this framework ARE reference semantics (they
reproduce the Rust doctest constants exactly — see golden tests); here the
production complex64 TPU path is measured against the complex128 path on
each driver config and must clear 60 dB with margin.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.design import firdes
from solid_dsp_tpu.models.channelizer import PolyphaseChannelizer
from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain
from solid_dsp_tpu.ops import fir as fir_ops
from solid_dsp_tpu.ops.fft import windowed_fft


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    ref = np.asarray(ref, dtype=np.complex128)
    test = np.asarray(test, dtype=np.complex128)
    err = ref - test
    p_sig = float(np.mean(np.abs(ref) ** 2))
    p_err = float(np.mean(np.abs(err) ** 2))
    if p_err == 0.0:
        return np.inf
    return 10.0 * np.log10(p_sig / p_err)


def _tone(n, f, amp=0.5, seed=0):
    rng = np.random.default_rng(seed)
    k = np.arange(n)
    return amp * np.exp(2j * np.pi * f * k) + 0.01 * (
        rng.standard_normal(n) + 1j * rng.standard_normal(n))


def test_config1_fir_64tap_1m_tone():
    """64-tap complex FIR on a 1M-sample tone: c64 vs c128 >= 60 dB."""
    n = 1 << 20
    taps = firdes.firdes_kaiser(64, 0.1, 60.0, 0.0)
    x = _tone(n, 0.03)

    y64, _ = fir_ops.fir_apply(jnp.asarray(taps, jnp.complex64),
                               fir_ops.fir_init(64, jnp.complex64),
                               jnp.asarray(x, jnp.complex64))
    y128, _ = fir_ops.fir_apply(jnp.asarray(taps, jnp.complex128),
                                fir_ops.fir_init(64, jnp.complex128),
                                jnp.asarray(x, jnp.complex128))
    assert snr_db(np.asarray(y128), np.asarray(y64)) >= 60.0


def test_config1_fft_vs_matmul_methods():
    """FIR method cross-check: fft overlap-save vs conv path, c128."""
    taps = firdes.firdes_kaiser(64, 0.1, 60.0, 0.0)
    x = _tone(1 << 16, 0.03)
    ya, _ = fir_ops.fir_apply(jnp.asarray(taps, jnp.complex128),
                              fir_ops.fir_init(64, jnp.complex128),
                              jnp.asarray(x), method="fft")
    yb, _ = fir_ops.fir_apply(jnp.asarray(taps, jnp.complex128),
                              fir_ops.fir_init(64, jnp.complex128),
                              jnp.asarray(x), method="matmul")
    assert snr_db(np.asarray(ya), np.asarray(yb)) >= 100.0


@pytest.mark.parametrize("window", ["hamming", "blackman_harris"])
def test_config2_windowed_fft_chirp(window):
    """4096-pt windowed FFT on a chirp: c64 vs c128 >= 60 dB."""
    n = 4096
    k = np.arange(n)
    chirp = np.exp(1j * np.pi * 0.4 * k * k / n)
    X64 = windowed_fft(jnp.asarray(chirp, jnp.complex64), window=window)
    X128 = windowed_fft(jnp.asarray(chirp, jnp.complex128), window=window)
    assert snr_db(np.asarray(X128), np.asarray(X64)) >= 60.0


@pytest.mark.parametrize("P,Q", [(3, 2), (1, 8)])
def test_config3_rational_resampler(P, Q):
    """Polyphase rational resampler 3/2 and 1/8: c64 vs c128 >= 60 dB."""
    taps = firdes.firdes_kaiser(48 * max(P, 1), 0.4 / max(P, Q), 60.0, 0.0)
    x = _tone(1 << 15, 0.01)

    def run(dtype):
        rs = fir_ops.RationalResampler(taps, P, Q, dtype=dtype)
        return np.asarray(rs.execute_block(jnp.asarray(x, dtype)))

    y64 = run(jnp.complex64)
    y128 = run(jnp.complex128)
    assert snr_db(y128, y64) >= 60.0


def test_config4_full_rx_chain():
    """NCO -> FIR -> AGC -> FM chain: c64 vs c128 >= 60 dB on demod out."""
    n = 1 << 16
    from solid_dsp_tpu.models.fm import fm_modulate

    msg = np.sin(2 * np.pi * 0.002 * np.arange(n))
    iq, _ = fm_modulate(jnp.asarray(msg, jnp.float64), 0.1)
    x = (np.asarray(iq) * 0.5
         * np.exp(2j * np.pi * (0.2 / (2 * np.pi)) * np.arange(n)))

    def run(dtype):
        cfg = RxChainConfig(dtype=dtype, nco_mode="exact", agc_mode="block",
                            demod="fm")
        init, apply = make_rx_chain(cfg)
        out, _ = apply(init(), jnp.asarray(x, dtype))
        return np.asarray(out)

    y64 = run(jnp.complex64)
    y128 = run(jnp.complex128)
    assert snr_db(y128, y64) >= 60.0


def test_config4_fast_nco_mode_snr():
    """The 'fast' factorized NCO keeps the chain above 60 dB too."""
    n = 1 << 16
    x = _tone(n, 0.2 / (2 * np.pi) + 0.001, amp=0.1)

    def run(mode, dtype):
        cfg = RxChainConfig(dtype=dtype, nco_mode=mode, agc_mode="block",
                            demod="none")
        init, apply = make_rx_chain(cfg)
        out, _ = apply(init(), jnp.asarray(x, dtype))
        return np.asarray(out)

    y_ref = run("exact", jnp.complex128)
    y_fast = run("fast", jnp.complex64)
    assert snr_db(y_ref, y_fast) >= 60.0


def test_config5_channelizer_256():
    """256-channel polyphase channelizer: c64 vs c128 >= 60 dB."""
    M = 256
    L = M * 64
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(L) + 1j * rng.standard_normal(L))

    c64 = PolyphaseChannelizer(M, 8, dtype=jnp.complex64)
    c128 = PolyphaseChannelizer(M, 8, dtype=jnp.complex128)
    Y64 = np.asarray(c64.execute_block(jnp.asarray(x, jnp.complex64)))
    Y128 = np.asarray(c128.execute_block(jnp.asarray(x, jnp.complex128)))
    assert snr_db(Y128, Y64) >= 60.0
