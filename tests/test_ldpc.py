"""LDPC encode/decode tests: validity, correction, coding gain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models import channel as ch
from solid_dsp_tpu.models import ldpc


@pytest.fixture(scope="module")
def code():
    return ldpc.wifi_ldpc_648()


def test_code_dimensions(code):
    assert (code.n, code.k) == (648, 324)
    assert abs(code.rate - 0.5) < 1e-12
    assert code.H.shape == (324, 648)


def test_encode_satisfies_parity(code):
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (5, code.k))
    cw = np.asarray(code.encode(info))
    assert cw.shape == (5, code.n)
    syndrome = (code.H @ cw.T) % 2
    assert not syndrome.any()
    # systematic: info bits recoverable without decoding
    back = np.asarray(ldpc.ldpc_extract_info(cw, code.H))
    np.testing.assert_array_equal(back, info)


def test_decode_clean_channel(code):
    rng = np.random.default_rng(1)
    info = rng.integers(0, 2, code.k)
    cw = np.asarray(code.encode(info))
    llr = (1.0 - 2.0 * cw) * 8.0          # strong correct beliefs
    got, ok = code.decode(jnp.asarray(llr))
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(got), info)


def test_decode_corrects_flipped_bits(code):
    rng = np.random.default_rng(2)
    info = rng.integers(0, 2, code.k)
    cw = np.asarray(code.encode(info))
    llr = (1.0 - 2.0 * cw) * 6.0
    flip = rng.choice(code.n, 25, replace=False)
    llr[flip] *= -1.0                      # 25 confident wrong bits
    got, ok = code.decode(jnp.asarray(llr))
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(got), info)


def test_syndrome_flags_undecodable(code):
    rng = np.random.default_rng(3)
    llr = rng.normal(size=code.n)          # pure noise beliefs
    _, ok = code.decode(jnp.asarray(llr), n_iters=10)
    assert not bool(ok)


def test_batched_decode_matches_single(code):
    rng = np.random.default_rng(4)
    info = rng.integers(0, 2, (3, code.k))
    cw = np.asarray(code.encode(info)).astype(float)
    llr = (1.0 - 2.0 * cw) * 4.0 + 0.8 * rng.normal(size=cw.shape)
    got_b, ok_b = code.decode(jnp.asarray(llr))
    for i in range(3):
        got_i, ok_i = code.decode(jnp.asarray(llr[i]))
        np.testing.assert_array_equal(np.asarray(got_b)[i],
                                      np.asarray(got_i))
        assert bool(ok_b[i]) == bool(ok_i)


def test_ldpc_coding_gain_over_awgn(code):
    """At 2.5 dB Eb/N0 (BPSK), uncoded BER ~ 2.3e-2; the rate-1/2 LDPC
    must decode essentially error-free — the waterfall-region gate."""
    rng = np.random.default_rng(5)
    n_frames = 20
    info = rng.integers(0, 2, (n_frames, code.k))
    cw = np.asarray(code.encode(info))
    tx = 1.0 - 2.0 * cw.astype(float)      # BPSK
    ebn0_db = 2.5
    nv = ch.ebn0_to_noise_var(ebn0_db, 1, code_rate=code.rate)
    # real channel: per-dimension noise variance nv/2
    sigma = np.sqrt(nv / 2.0)
    rx = tx + sigma * rng.normal(size=tx.shape)
    llr = 4.0 * rx / nv                    # exact BPSK LLR (positive = 0)
    got, ok = code.decode(jnp.asarray(llr), n_iters=40)
    ber = float(np.mean(np.asarray(got) != info))
    uncoded = float(np.mean((rx < 0) != cw))
    assert uncoded > 5e-3                  # the channel is genuinely noisy
    assert ber < 1e-4, (ber, uncoded)
    assert np.mean(np.asarray(ok)) > 0.9


def test_custom_h_matrix_roundtrip():
    """A small hand-built code exercises the generic rref encoder."""
    H = np.array([
        [1, 1, 0, 1, 1, 0, 0],
        [1, 0, 1, 1, 0, 1, 0],
        [0, 1, 1, 1, 0, 0, 1],
    ], np.int8)                            # (7,4) Hamming-style
    c = ldpc.LDPCCode(H)
    assert (c.n, c.k) == (7, 4)
    info = np.array([[0, 1, 1, 0], [1, 1, 1, 1], [0, 0, 0, 1]])
    cw = np.asarray(c.encode(info))
    assert not ((H @ cw.T) % 2).any()
    got, ok = c.decode(jnp.asarray((1.0 - 2.0 * cw) * 5.0))
    np.testing.assert_array_equal(np.asarray(got), info)
    assert bool(np.all(np.asarray(ok)))


def test_rank_deficient_h_rejected():
    H = np.array([[1, 1, 0, 0], [1, 1, 0, 0]], np.int8)
    with pytest.raises(ValueError):
        ldpc.LDPCCode(H)
