"""Polar codes: encoder vs recursive reference, BP decode performance."""

import jax.numpy as jnp
import numpy as np
import pytest

from solid_dsp_tpu.models.polar import (
    PolarCode,
    polar_construct,
    polar_encode,
)


def _ref_encode(u):
    """Independent recursive reference: x = (enc(u1) ^ enc(u2), enc(u2))."""
    n = len(u)
    if n == 1:
        return u.copy()
    half = n // 2
    a = _ref_encode(u[:half])
    b = _ref_encode(u[half:])
    return np.concatenate([a ^ b, b])


def test_encoder_matches_recursive_reference():
    rng = np.random.default_rng(0)
    for N in (2, 4, 8, 64, 256):
        code = PolarCode(N, N)  # all-info: encoder is plain F^{(x)n}
        u = rng.integers(0, 2, N).astype(np.int32)
        x = np.asarray(code.encode(jnp.asarray(u)))
        # recursive reference pairs (i, i + N/2) at the OUTER level; the
        # iterative butterfly pairs (i, i+1) first — same transform
        np.testing.assert_array_equal(x, _ref_encode(u), err_msg=f"N={N}")


def test_construction_properties():
    info = polar_construct(256, 128, 2.0)
    assert len(info) == 128 and len(set(info.tolist())) == 128
    # the most reliable index (all-plus branch) is always N-1; the least
    # reliable (all-minus) is 0
    assert 255 in info
    assert 0 not in info
    with pytest.raises(ValueError):
        polar_construct(100, 50)


def test_noiseless_roundtrip():
    rng = np.random.default_rng(1)
    code = PolarCode(256, 128)
    bits = rng.integers(0, 2, 128).astype(np.int32)
    x = np.asarray(code.encode(jnp.asarray(bits)))
    llr = (1.0 - 2.0 * x) * 8.0  # strong LLRs, bit0 -> +8
    u_hat, ok = code.decode(jnp.asarray(llr.astype(np.float32)))
    np.testing.assert_array_equal(np.asarray(u_hat), bits)
    assert bool(np.all(np.asarray(ok)))
    # re-encoded codeword via the functional API
    from solid_dsp_tpu.models.polar import polar_decode_bp
    _, x_hat, _ = polar_decode_bp(jnp.asarray(llr.astype(np.float32)),
                                  jnp.asarray(code.frozen_mask))
    np.testing.assert_array_equal(np.asarray(x_hat), x)


def test_bp_corrects_awgn_errors():
    """(256,128) at Eb/N0 = 3 dB: BP BER far below uncoded BER."""
    rng = np.random.default_rng(2)
    code = PolarCode(256, 128, design_snr_db=2.0)
    n_blocks = 40
    bits = rng.integers(0, 2, (n_blocks, 128)).astype(np.int32)
    x = np.asarray(code.encode(jnp.asarray(bits)))
    ebn0 = 10 ** (3.0 / 10)
    rate = 0.5
    sigma2 = 1.0 / (2 * rate * ebn0)
    s = 1.0 - 2.0 * x
    y = s + np.sqrt(sigma2) * rng.standard_normal(s.shape)
    llr = (2.0 / sigma2) * y
    u_hat, _ = code.decode(jnp.asarray(llr.astype(np.float32)))
    ber = float(np.mean(np.asarray(u_hat) != bits))
    ber_uncoded = float(np.mean((y < 0) != (x > 0)))
    assert ber < ber_uncoded / 10, (ber, ber_uncoded)
    assert ber < 0.01, ber


def test_batched_decode():
    rng = np.random.default_rng(3)
    code = PolarCode(64, 32)
    bits = rng.integers(0, 2, (8, 32)).astype(np.int32)
    x = np.asarray(code.encode(jnp.asarray(bits)))
    llr = (1.0 - 2.0 * x) * 6.0 + 0.5 * rng.standard_normal(x.shape)
    u_hat, ok = code.decode(jnp.asarray(llr.astype(np.float32)))
    assert u_hat.shape == (8, 32) and ok.shape == (8,)
    np.testing.assert_array_equal(np.asarray(u_hat), bits)


def _sc_decode(llr, frozen):
    """Independent numpy successive-cancellation decoder (recursive,
    min-sum f/g) — a completely different mechanism from the BP lattice."""
    N = len(llr)
    if N == 1:
        u = 0 if frozen[0] else int(llr[0] < 0)
        return np.array([u]), np.array([u])
    h = N // 2
    l1, l2 = llr[:h], llr[h:]
    f = np.sign(l1) * np.sign(l2) * np.minimum(np.abs(l1), np.abs(l2))
    u1, A = _sc_decode(f, frozen[:h])
    g = l2 + (1 - 2 * A) * l1
    u2, B = _sc_decode(g, frozen[h:])
    return np.concatenate([u1, u2]), np.concatenate([A ^ B, B])


def test_bp_comparable_to_independent_sc():
    """BP matches (or beats) an independent SC decoder at 3 dB."""
    rng = np.random.default_rng(7)
    code = PolarCode(256, 128, design_snr_db=2.0)
    frozen = code.frozen_mask.astype(bool)
    nb = 30
    bits = rng.integers(0, 2, (nb, 128)).astype(np.int32)
    x = np.asarray(code.encode(jnp.asarray(bits)))
    sigma2 = 1.0 / (2 * 0.5 * 10 ** (3.0 / 10))
    y = (1 - 2.0 * x) + np.sqrt(sigma2) * rng.standard_normal(x.shape)
    llr = (2 / sigma2) * y
    sc_errs = sum(
        int(np.sum(_sc_decode(llr[b], frozen)[0][~frozen] != bits[b]))
        for b in range(nb))
    u_hat, _ = code.decode(jnp.asarray(llr.astype(np.float32)))
    bp_errs = int(np.sum(np.asarray(u_hat) != bits))
    assert bp_errs <= max(2 * sc_errs, 20), (bp_errs, sc_errs)
    assert bp_errs / (nb * 128) < 0.01


def test_decode_health_flag_tracks_block_errors():
    """ok=False concentrates on erroneous blocks at low SNR; clean blocks
    at high SNR are all ok=True (the flag ignores the frozen prior)."""
    rng = np.random.default_rng(11)
    code = PolarCode(128, 64, design_snr_db=2.0)
    bits = rng.integers(0, 2, (200, 64)).astype(np.int32)
    x = np.asarray(code.encode(jnp.asarray(bits)))
    sigma2 = 1.0 / (2 * 0.5 * 10 ** (1.0 / 10))     # harsh: 1 dB
    y = (1 - 2.0 * x) + np.sqrt(sigma2) * rng.standard_normal(x.shape)
    u_hat, ok = code.decode(jnp.asarray(((2 / sigma2) * y).astype(np.float32)))
    blk_err = np.any(np.asarray(u_hat) != bits, axis=-1)
    ok = np.asarray(ok)
    assert blk_err.any() and (~blk_err).any()        # harsh but not hopeless
    # flag quality: error rate among ok-flagged blocks is much lower
    p_err_given_ok = float(np.mean(blk_err[ok])) if ok.any() else 0.0
    p_err_given_bad = float(np.mean(blk_err[~ok])) if (~ok).any() else 1.0
    assert p_err_given_bad > 2 * p_err_given_ok + 0.05
