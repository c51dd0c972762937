"""Pallas channelizer front-end: parity vs the XLA einsum formulation.

Runs in interpret mode on CPU (no TPU needed); the same kernel compiles
for TPU via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.channelizer import (
    PolyphaseChannelizer,
    channelizer_taps,
)
from solid_dsp_tpu.ops.pallas_kernels import (
    channelizer_apply_pallas,
    pfb_frontend_taps,
)


@pytest.mark.parametrize("M,K", [(16, 8), (64, 4), (8, 7)])
def test_pallas_channelizer_parity(M, K):
    taps = channelizer_taps(M, K)
    h_il = pfb_frontend_taps(taps, M)
    assert h_il.shape == (K + 1, 2 * M)

    rng = np.random.default_rng(0)
    L = M * 300
    x = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(
        np.complex64)

    tail = jnp.zeros((K, M), jnp.complex64)
    Y1, tail1 = channelizer_apply_pallas(
        h_il, tail, jnp.asarray(x), M, K, interpret=True)

    ref = PolyphaseChannelizer(M, K, dtype=jnp.complex64)
    Yref = ref.execute_block(jnp.asarray(x))

    scale = np.abs(np.asarray(Yref)).max()
    np.testing.assert_allclose(np.asarray(Y1), np.asarray(Yref),
                               atol=2e-5 * scale, rtol=0)


def test_pallas_channelizer_streaming():
    """Two blocks through the pallas path == one long block."""
    M, K = 16, 8
    taps = channelizer_taps(M, K)
    h_il = pfb_frontend_taps(taps, M)
    rng = np.random.default_rng(1)
    L = M * 128
    x = (rng.standard_normal(2 * L) + 1j * rng.standard_normal(2 * L)).astype(
        np.complex64)

    tail = jnp.zeros((K, M), jnp.complex64)
    Ya, tail = channelizer_apply_pallas(h_il, tail, jnp.asarray(x[:L]),
                                        M, K, interpret=True)
    Yb, _ = channelizer_apply_pallas(h_il, tail, jnp.asarray(x[L:]),
                                     M, K, interpret=True)
    Y2 = np.concatenate([np.asarray(Ya), np.asarray(Yb)], axis=0)

    tail0 = jnp.zeros((K, M), jnp.complex64)
    Yfull, _ = channelizer_apply_pallas(h_il, tail0, jnp.asarray(x),
                                        M, K, interpret=True)
    scale = np.abs(np.asarray(Yfull)).max()
    np.testing.assert_allclose(Y2, np.asarray(Yfull), atol=2e-5 * scale,
                               rtol=0)


def test_tone_lands_in_right_channel():
    """A +c/M tone must appear in channel c of the pallas channelizer."""
    M, K = 32, 8
    taps = channelizer_taps(M, K)
    h_il = pfb_frontend_taps(taps, M)
    c = 5
    L = M * 200
    x = np.exp(2j * np.pi * (c / M) * np.arange(L)).astype(np.complex64)
    tail = jnp.zeros((K, M), jnp.complex64)
    Y, _ = channelizer_apply_pallas(h_il, tail, jnp.asarray(x), M, K,
                                    interpret=True)
    power = np.mean(np.abs(np.asarray(Y))[K * 2:], axis=0)  # skip transient
    assert power.argmax() == c
    others = np.delete(power, c)
    assert power[c] > 20 * others.max()


# ---------------------------------------------------------------------------
# multi-channel IIR bank
# ---------------------------------------------------------------------------

def _np_sos_ref(sos, x):
    """Direct-form II cascade, per channel, in numpy (the kernel's spec)."""
    S = sos.shape[0]
    T, C = x.shape
    w1 = np.zeros((S, C), np.complex128)
    w2 = np.zeros((S, C), np.complex128)
    y = np.empty_like(x, dtype=np.complex128)
    for t in range(T):
        v = x[t].astype(np.complex128)
        for s in range(S):
            b0, b1, b2, a1, a2 = sos[s]
            w0 = v - a1 * w1[s] - a2 * w2[s]
            v = b0 * w0 + b1 * w1[s] + b2 * w2[s]
            w2[s] = w1[s]
            w1[s] = w0
        y[t] = v
    return y


def _butter_sos():
    """A stable 2-section lowpass (hand-computed biquads)."""
    return np.array([
        [0.0675, 0.1349, 0.0675, -1.1430, 0.4128],
        [0.25, 0.5, 0.25, -0.9, 0.3],
    ], dtype=np.float32)


def test_iir_bank_matches_numpy():
    from solid_dsp_tpu.ops.pallas_kernels import iir_bank_apply, iir_bank_init

    sos = _butter_sos()
    rng = np.random.default_rng(3)
    T, C = 300, 16
    x = (rng.standard_normal((T, C)) + 1j * rng.standard_normal((T, C))
         ).astype(np.complex64)

    st = iir_bank_init(sos.shape[0], C)
    y, st2 = iir_bank_apply(jnp.asarray(sos), st, jnp.asarray(x),
                            tile_rows=64, interpret=True)
    y_ref = _np_sos_ref(sos, x)
    np.testing.assert_allclose(np.asarray(y), y_ref.astype(np.complex64),
                               atol=2e-5, rtol=0)


def test_iir_bank_streaming_and_partial_tiles():
    from solid_dsp_tpu.ops.pallas_kernels import iir_bank_apply, iir_bank_init

    sos = _butter_sos()
    rng = np.random.default_rng(4)
    T, C = 250, 8  # 250 % 64 != 0 -> exercises the partial-tile mask
    x = (rng.standard_normal((2 * T, C)) + 1j * rng.standard_normal((2 * T, C))
         ).astype(np.complex64)

    st = iir_bank_init(sos.shape[0], C)
    ya, st = iir_bank_apply(jnp.asarray(sos), st, jnp.asarray(x[:T]),
                            tile_rows=64, interpret=True)
    yb, _ = iir_bank_apply(jnp.asarray(sos), st, jnp.asarray(x[T:]),
                           tile_rows=64, interpret=True)
    y2 = np.concatenate([np.asarray(ya), np.asarray(yb)], axis=0)
    y_ref = _np_sos_ref(sos, x)
    np.testing.assert_allclose(y2, y_ref.astype(np.complex64),
                               atol=3e-5, rtol=0)


def test_iir_bank_matches_iirfilter():
    """Same transfer function as ops.iir.IIRFilter (NORMAL form) per channel."""
    from solid_dsp_tpu.ops.iir import IIRFilter
    from solid_dsp_tpu.ops.pallas_kernels import iir_bank_apply, iir_bank_init

    sos = _butter_sos()[:1]  # single biquad == single NORMAL IIR
    b = sos[0, :3].astype(np.float64)
    a = np.array([1.0, sos[0, 3], sos[0, 4]], dtype=np.float64)

    rng = np.random.default_rng(5)
    T = 200
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(
        np.complex64)

    st = iir_bank_init(1, 1)
    y, _ = iir_bank_apply(jnp.asarray(sos), st, jnp.asarray(x[:, None]),
                          tile_rows=64, interpret=True)

    f = IIRFilter(b, a, dtype=jnp.complex128)
    y_ref = np.asarray(f.execute_block(jnp.asarray(x, jnp.complex128)))
    np.testing.assert_allclose(np.asarray(y)[:, 0],
                               y_ref.astype(np.complex64), atol=2e-5)


def test_iir_bank_per_channel_coefficients():
    """(S, 5, C) per-channel cascades match per-channel numpy references."""
    from solid_dsp_tpu.ops.pallas_kernels import iir_bank_apply, iir_bank_init

    rng = np.random.default_rng(6)
    S, C, T = 2, 8, 200
    # distinct stable biquads per channel: random cutoffs
    from solid_dsp_tpu.models.channel_bank import design_channel_sos

    sos_pc = np.stack(
        [design_channel_sos(0.1 + 0.03 * c) for c in range(C)], axis=-1
    )  # (S, 5, C)
    x = (rng.standard_normal((T, C)) + 1j * rng.standard_normal((T, C))
         ).astype(np.complex64)

    st = iir_bank_init(S, C)
    y, _ = iir_bank_apply(jnp.asarray(sos_pc), st, jnp.asarray(x),
                          tile_rows=64, interpret=True)

    for c in range(C):
        y_ref = _np_sos_ref(sos_pc[:, :, c], x[:, c: c + 1])
        np.testing.assert_allclose(np.asarray(y)[:, c], y_ref[:, 0].astype(
            np.complex64), atol=3e-5, err_msg=f"channel {c}")
