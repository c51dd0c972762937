"""2x-oversampled WOLA channelizer: mapping, edge headroom, invariance."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.analysis.estimate import tone_freq_fft
from solid_dsp_tpu.models.channelizer import (
    OversampledChannelizer,
    PolyphaseChannelizer,
    os_channelizer_apply,
    os_channelizer_init,
)

M, K, N = 16, 8, 16 * 512
SKIP = 2 * K  # transient output steps


def _tone(f):
    return np.exp(2j * np.pi * f * np.arange(N)).astype(np.complex64)


def test_center_tone_mapping_matches_critical_bank():
    x = _tone(3 / M)
    osc = OversampledChannelizer(M, K)
    Y = np.asarray(osc.execute_block(jnp.asarray(x)))
    assert Y.shape == (2 * N // M, M)
    ch3 = Y[SKIP:, 3]
    # same channel index and same gain convention (amp = M) as the
    # critically-sampled bank, at twice the output rate
    pc = PolyphaseChannelizer(M, K)
    Yc = np.asarray(pc.execute_block(jnp.asarray(x)))
    assert abs(np.mean(np.abs(ch3)) - np.mean(np.abs(Yc[SKIP:, 3]))) < 0.05
    assert np.std(np.abs(ch3)) < 1e-3                    # flat envelope
    assert abs(float(tone_freq_fft(jnp.asarray(ch3)))) < 1e-4
    pw = np.mean(np.abs(Y[SKIP:]) ** 2, axis=0)
    others = np.delete(pw, 3)
    assert 10 * np.log10(others.max() / pw[3]) < -35.0


def test_edge_tone_resolved_not_aliased():
    # a tone exactly between channels 3 and 4: the critically-sampled
    # bank folds it onto each channel's Nyquist edge; the oversampled
    # bank keeps it at +/-1/4 of the (doubled) channel rate
    x = _tone(3.5 / M)
    osc = OversampledChannelizer(M, K)
    Y = np.asarray(osc.execute_block(jnp.asarray(x)))
    f3 = float(tone_freq_fft(jnp.asarray(Y[SKIP:, 3])))
    f4 = float(tone_freq_fft(jnp.asarray(Y[SKIP:, 4])))
    assert abs(f3 - 0.25) < 1e-3
    assert abs(f4 + 0.25) < 1e-3
    # crossover point: both channels carry it ~6 dB down
    a = np.mean(np.abs(Y[SKIP:, 3])), np.mean(np.abs(Y[SKIP:, 4]))
    assert abs(a[0] / a[1] - 1.0) < 0.02
    assert abs(a[0] / M - 0.5) < 0.05


def test_block_size_invariance_including_parity():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(N) + 1j * rng.standard_normal(N)
         ).astype(np.complex64)
    osc = OversampledChannelizer(M, K)
    Y = np.asarray(osc.execute_block(jnp.asarray(x)))
    osc.reset()
    # odd number of M-sized chunks per block exercises the parity carry
    cuts = [0, 3 * M, 3 * M + 5 * M, N]
    parts = [np.asarray(osc.execute_block(jnp.asarray(x[a:b])))
             for a, b in zip(cuts[:-1], cuts[1:])]
    np.testing.assert_allclose(np.concatenate(parts), Y, atol=1e-5)


def test_rrc_prototype_near_perfect_reconstruction():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(N) + 1j * rng.standard_normal(N)
         ).astype(np.complex64)
    osc = OversampledChannelizer(M, 16, prototype="rrc", rolloff=1.0)
    Y = osc.execute_block(jnp.asarray(x))
    xh = np.asarray(osc.synthesize(Y))
    assert xh.shape == x.shape
    core = slice(2 * 16 * M, N - 2 * 16 * M)
    err = xh[core] - x[core]          # aligned, no shift compensation
    snr = 10 * np.log10(np.mean(np.abs(x[core]) ** 2)
                        / np.mean(np.abs(err) ** 2))
    assert snr > 60.0, snr


def test_kaiser_prototype_reconstruction_documented_poor():
    # the Kaiser analysis prototype does NOT tile |H|^2 — reconstruction
    # is intentionally poor (the docstring directs PR users to "rrc")
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(N) + 1j * rng.standard_normal(N)
         ).astype(np.complex64)
    osc = OversampledChannelizer(M, K)
    xh = np.asarray(osc.synthesize(osc.execute_block(jnp.asarray(x))))
    core = slice(2 * K * M, N - 2 * K * M)
    err = xh[core] - x[core]
    snr = 10 * np.log10(np.mean(np.abs(x[core]) ** 2)
                        / np.mean(np.abs(err) ** 2))
    assert 5.0 < snr < 30.0, snr
    with pytest.raises(ValueError):
        OversampledChannelizer(M, K, prototype="hann")


def test_functional_api_and_validation():
    taps = jnp.asarray(np.ones(M * K, np.complex64))
    st = os_channelizer_init(M, K)
    Y, st2 = os_channelizer_apply(
        taps, st, jnp.zeros(4 * M, jnp.complex64), M)
    assert Y.shape == (8, M) and st2[0].shape == st[0].shape
    with pytest.raises(ValueError):
        os_channelizer_apply(taps, st, jnp.zeros(M + 1, jnp.complex64), M)
    with pytest.raises(ValueError):
        os_channelizer_apply(jnp.ones(15 * K, jnp.complex64),
                             os_channelizer_init(15, K),
                             jnp.zeros(30, jnp.complex64), 15)
